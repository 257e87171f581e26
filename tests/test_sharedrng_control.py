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


def test_fullconfig_sharedrng_artifact_pins_parity():
    """Evidence pin for the FULL-CONFIG shared-RNG replay (VERDICT r4
    next-round #1): the committed artifact from running the protocol at
    the real mnist.yaml architecture (28x28, down [32,64,128,256],
    T=1000; scripts/fidelity_sharedrng.py SHAREDRNG_FULLCFG=1, 256 steps)
    must record float-tolerance agreement between the torch reference
    replay and this stack.  Re-measuring takes ~3 h of 1-core torch CPU,
    so the runtime property is pinned at tiny scale by the tests above;
    this test pins the recorded full-scale evidence so it cannot be
    silently edited or dropped."""
    path = os.path.join(REPO, "fidelity_ws",
                        "fidelity_cd_sharedrng_full_results.json")
    assert os.path.exists(path), "full-config shared-RNG artifact missing"
    rows = json.load(open(path))

    # the run really was the real architecture, for a few hundred steps
    assert rows["fullcfg"] is True and rows["im_size"] == 28
    assert rows["model_params"]["down_channels"] == [32, 64, 128, 256]
    assert rows["model_params"]["mid_channels"] == [256, 256, 128]
    assert rows["total_steps"] >= 200

    # loss trajectories: float-accumulation-level agreement
    assert rows["loss_mean_reldiff"] < 1e-4
    assert rows["loss_final_step_absdiff"] < 1e-4
    # parameter space: ours-final vs ref-final at float tolerance,
    # and tiny relative to how far training moved the weights
    assert rows["param_rel_l2_ours_vs_ref"] < 1e-3
    assert rows["param_divergence_over_training_movement"] < 0.02
    # paired 1-step samples from the shared x_T: FFD collapses far below
    # both half-vs-half noise floors
    assert rows["ffd_sr_below_floors"] is True
    assert rows["ffd_sr_ours_vs_ref"] < 0.01 * min(
        rows["ffd_sr_noise_floor_ref_halves"],
        rows["ffd_sr_noise_floor_ours_halves"])
    # TPU leg (same streams on the real chip): below the floors too
    if "ffd_sr_tpu_vs_ref" in rows:
        assert rows["ffd_sr_tpu_below_floors"] is True
        assert rows["tpu_loss_mean_reldiff"] < 0.01
