"""Cross-stack training-numerics equivalence, as a permanent regression test.

Tiny-scale smoke of scripts/fidelity_sharedrng.py: both stacks run the
reference's consistency-distillation step
(/root/reference/models/consistency_controlnet_distilled.py:295-365 ->
EMA -> Adam) with every stochastic input pinned to one shared numpy
stream, from a shared torch init and a shared exported teacher.  The
full-scale run (fidelity_ws/fidelity_cd_sharedrng_results.json) showed
the loss trajectories agree to ~1e-6; this test pins that property so a
numerics regression in the layers, the losses, the optimizer wiring, or
the import/export shims (io/torch_import, io/torch_export — both
exercised end-to-end here) cannot land silently.

Stages run in subprocesses because the ref stages put /root/reference on
sys.path, which shadows this repo's ``tools`` package.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.e2e  # slow tool-pipeline tier; fast tier = -m 'not e2e'

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "fidelity_sharedrng.py")

TINY_ENV = {
    "SHAREDRNG_PER_CLASS": "8",       # 32 train images
    "SHAREDRNG_TEST_PER_CLASS": "4",  # 16 held-out hints
    "SHAREDRNG_N_SAMPLES": "16",
    "SHAREDRNG_BATCH": "8",           # -> 4 steps/epoch
    "SHAREDRNG_CD_EPOCHS": "1",
}


def _run(stage: str, ws: str):
    env = dict(os.environ, SHAREDRNG_WS=ws, **TINY_ENV,
               SHAREDRNG_BACKEND="cpu",  # shield from a leftover =tpu in the shell
               PYTHONPATH="", JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_cpu_parallel_codegen_split_count=1")
    r = subprocess.run([sys.executable, SCRIPT, stage], env=env,
                       capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, f"stage {stage} failed:\n{r.stdout}\n{r.stderr}"


@pytest.mark.timeout(1800)
def test_sharedrng_training_numerics_match(tmp_path):
    ws = str(tmp_path / "sr_ws")
    os.makedirs(ws)

    # Teacher: a random-init ControlNet exported through the torch shim.
    # Teacher QUALITY is irrelevant to numerics equivalence (the full-scale
    # cross-teacher control measured teacher lineage at FFD 0.23); what
    # matters is that both sides load the same bits.
    import jax
    import torch

    from controlnet_tpu.io.torch_export import export_controlnet
    from controlnet_tpu.models.controlnet import ControlNet

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import fidelity_sharedrng as sr

    cn = ControlNet(1, sr.MODEL_PARAMS)
    params = cn.init(jax.random.PRNGKey(11))
    sd = export_controlnet(jax.tree.map(np.asarray, params), cn)
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
               os.path.join(ws, "teacher_torch.pth"))

    for stage in ("data", "streams", "init", "ref_train", "ours_train"):
        _run(stage, ws)

    ref_l = np.array(json.load(open(os.path.join(ws, "ref_losses.json"))))
    ours_l = np.array(json.load(open(os.path.join(ws, "ours_losses.json"))))
    assert ref_l.shape == ours_l.shape == (4,)
    np.testing.assert_allclose(ours_l, ref_l, atol=5e-5, rtol=5e-4)

    # the 1-step samples from the shared x_T must agree pixelwise
    from PIL import Image

    def load(d):
        files = sorted(os.listdir(os.path.join(ws, d)))
        return np.stack([np.asarray(Image.open(os.path.join(ws, d, f)), dtype=np.float32)
                         for f in files]) / 255.0

    ref_s, ours_s = load("ref_sr_samples"), load("ours_sr_samples")
    assert ref_s.shape == ours_s.shape
    assert float(np.mean(np.abs(ref_s - ours_s))) < 1e-2  # 8-bit png quantization
