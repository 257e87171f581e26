"""Worker for tests/test_sharding.py::test_multiprocess_shard_host_local_batch.

Run as: python tests/_distributed_worker.py <pid> <nproc> <port>
Each process owns 2 virtual CPU devices; together they form one global
4-device mesh.  Exercises the ``process_count > 1`` branch of
``shard_host_local_batch`` (parallel/mesh.py) — each process contributes
its disjoint rows of the global batch and a jitted global reduction must
see all of them.
"""

import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    "--xla_cpu_parallel_codegen_split_count=1 "
    "--xla_force_host_platform_device_count=2"
)
os.environ.pop("PYTHONPATH", None)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.distributed.initialize(
    coordinator_address=f"localhost:{port}", num_processes=nproc, process_id=pid
)

import numpy as np  # noqa: E402

from controlnet_tpu.parallel.mesh import make_mesh, shard_host_local_batch  # noqa: E402

assert jax.process_count() == nproc, jax.process_count()
assert len(jax.devices()) == 2 * nproc, jax.devices()
assert len(jax.local_devices()) == 2

mesh = make_mesh()  # global ("data": 2*nproc, "model": 1)

rows_per_proc = 4
global_batch = np.arange(float(rows_per_proc * nproc * 2)).reshape(-1, 2)
local = global_batch[pid * rows_per_proc:(pid + 1) * rows_per_proc]
g = shard_host_local_batch(local, mesh)
assert g.shape == global_batch.shape, g.shape

total = jax.jit(lambda x: x.sum())(g)  # SPMD global reduction
expected = float(global_batch.sum())
assert float(total) == expected, (float(total), expected)
print(f"WORKER_OK {pid}", flush=True)
