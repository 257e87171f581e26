"""Test harness config.

* Forces the CPU backend with 8 virtual devices BEFORE jax import, so
  multi-chip sharding tests run without TPU hardware (the standard JAX
  substitute for a real mesh — SURVEY.md §4).
* Persistent compilation cache: this host has 1 CPU core and slow XLA
  compiles; the cache makes re-runs fast.
* All model configs here are tiny (8x8 images, 8-16 channels) — the suite
  checks math/shape/property correctness, not throughput.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: tests never touch real chips

import jax  # noqa: E402

# If a sitecustomize already imported jax (e.g. the axon TPU plugin), the
# env var above came too late — force the config directly as well.
try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
# XLA CPU's default conv/dot precision is reduced (bf16-level error); tests
# check math parity, so force true float32 accumulation.
jax.config.update("jax_default_matmul_precision", "float32")

import pytest  # noqa: E402


TINY_MODEL_CONFIG = dict(
    im_channels=1,
    im_size=8,
    hint_channels=3,
    down_channels=[8, 16, 16],
    mid_channels=[16, 16],
    down_sample=[True, False],
    time_emb_dim=8,
    num_down_layers=1,
    num_mid_layers=1,
    num_up_layers=1,
    num_heads=2,
    sigma_min=0.002,
    sigma_max=80.0,
    sigma_data=0.5,
)

TINY_VAE_CONFIG = dict(
    z_channels=2,
    down_channels=[8, 16],
    mid_channels=[16],
    down_sample=[True],
    attn_down=[False],
    norm_channels=4,
    num_heads=2,
    num_down_layers=1,
    num_mid_layers=1,
    num_up_layers=1,
)


@pytest.fixture(scope="session")
def tiny_model_config():
    return dict(TINY_MODEL_CONFIG)


@pytest.fixture(scope="session")
def tiny_vae_config():
    return dict(TINY_VAE_CONFIG)


@pytest.fixture(autouse=True)
def _reset_tp_dispatch_guard():
    """tp_shard_params flips a process-global attention-dispatch guard;
    don't let one test's TP leak into another's dispatch expectations."""
    yield
    from controlnet_tpu.ops import attention

    attention.set_tp_model_axis(1)
