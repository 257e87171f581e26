"""Import reference PyTorch checkpoints into this framework's param trees.

The reference saves torch ``state_dict``s (tools/train_*.py) with module
paths like ``downs.0.resnet_conv_first.1.2.weight``.  This shim converts
them to our pytrees so (a) models trained with the reference can be
sampled/evaluated here for parity studies, and (b) tests can verify
numerical equivalence layer-for-layer (tests/test_torch_parity.py).

Weight layout conversions:
  * Conv2d:           OIHW -> HWIO
  * ConvTranspose2d:  torch stores (in, out, kh, kw) and computes a true
                      transposed conv; jax.lax.conv_transpose(transpose_
                      kernel=False) correlates the stride-dilated input, so
                      the kernel is moved to HWIO AND spatially flipped.
  * Linear:           (out, in) -> (in, out)
  * MultiheadAttention: fused in_proj (3D, D) split into wq/wk/wv (+bias);
                      out_proj transposed.
  * GroupNorm/BatchNorm: weight->scale, bias->bias.

Covers the base UNet (models/unet_base.py), the conditional/LDM UNet
(models/unet_cond_base.py — same prefix grammar with per-level attn flags),
the VAE, and both ControlNets (prefix-aware, like the reference's own
checkpoint surgery, controlnet.py:31-138).
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np

Params = Any


def _np(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t, np.float32)


def conv(sd: Mapping, prefix: str) -> dict:
    p = {"w": _np(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0)}
    if f"{prefix}.bias" in sd:
        p["b"] = _np(sd[f"{prefix}.bias"])
    return p


def conv_transpose(sd: Mapping, prefix: str) -> dict:
    w = _np(sd[f"{prefix}.weight"])  # (in, out, kh, kw)
    w = w.transpose(2, 3, 0, 1)[::-1, ::-1].copy()  # HWIO, flipped
    return {"w": w, "b": _np(sd[f"{prefix}.bias"])}


def linear(sd: Mapping, prefix: str) -> dict:
    p = {"w": _np(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        p["b"] = _np(sd[f"{prefix}.bias"])
    return p


def norm(sd: Mapping, prefix: str) -> dict:
    return {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}


def attention(sd: Mapping, prefix: str) -> dict:
    in_w = _np(sd[f"{prefix}.in_proj_weight"])  # (3D, D)
    in_b = _np(sd[f"{prefix}.in_proj_bias"])
    d = in_w.shape[1]
    return {
        "wq": in_w[:d].T, "bq": in_b[:d],
        "wk": in_w[d : 2 * d].T, "bk": in_b[d : 2 * d],
        "wv": in_w[2 * d :].T, "bv": in_b[2 * d :],
        "wo": _np(sd[f"{prefix}.out_proj.weight"]).T,
        "bo": _np(sd[f"{prefix}.out_proj.bias"]),
    }


def _resnet_layer(sd: Mapping, base: str, j: int, has_temb: bool) -> dict:
    p = {
        "norm1": norm(sd, f"{base}.resnet_conv_first.{j}.0"),
        "conv1": conv(sd, f"{base}.resnet_conv_first.{j}.2"),
        "norm2": norm(sd, f"{base}.resnet_conv_second.{j}.0"),
        "conv2": conv(sd, f"{base}.resnet_conv_second.{j}.2"),
        "skip": conv(sd, f"{base}.residual_input_conv.{j}"),
    }
    if has_temb:
        p["t_proj"] = linear(sd, f"{base}.t_emb_layers.{j}.1")
    return p


def _attn_layer(sd: Mapping, base: str, j: int, cross: bool = False) -> dict:
    pre = "cross_attention" if cross else "attention"
    p = {
        "norm": norm(sd, f"{base}.{pre}_norms.{j}"),
        "attn": attention(sd, f"{base}.{pre}s.{j}" if not cross else f"{base}.cross_attentions.{j}"),
    }
    if cross:
        p["ctx_proj"] = linear(sd, f"{base}.context_proj.{j}")
    return p


def _down_block(sd: Mapping, base: str, blk) -> dict:
    n = blk.num_layers
    has_temb = blk.resnets[0].t_emb_dim is not None
    p: dict = {"resnets": [_resnet_layer(sd, base, j, has_temb) for j in range(n)]}
    if blk.attn:
        p["attns"] = [_attn_layer(sd, base, j) for j in range(n)]
    if blk.cross_attn:
        p["xattns"] = [_attn_layer(sd, base, j, cross=True) for j in range(n)]
    p["down"] = conv(sd, f"{base}.down_sample_conv") if f"{base}.down_sample_conv.weight" in sd else {}
    return p


def _mid_block(sd: Mapping, base: str, blk) -> dict:
    n = blk.num_layers
    has_temb = blk.resnets[0].t_emb_dim is not None
    p: dict = {
        "resnets": [_resnet_layer(sd, base, j, has_temb) for j in range(n + 1)],
        "attns": [_attn_layer(sd, base, j) for j in range(n)],
    }
    if blk.cross_attn:
        p["xattns"] = [_attn_layer(sd, base, j, cross=True) for j in range(n)]
    return p


def _up_block(sd: Mapping, base: str, blk) -> dict:
    n = blk.num_layers
    has_temb = blk.resnets[0].t_emb_dim is not None
    p: dict = {
        "up": conv_transpose(sd, f"{base}.up_sample_conv")
        if f"{base}.up_sample_conv.weight" in sd else {},
        "resnets": [_resnet_layer(sd, base, j, has_temb) for j in range(n)],
    }
    if blk.attn:
        p["attns"] = [_attn_layer(sd, base, j) for j in range(n)]
    if blk.cross_attn:
        p["xattns"] = [_attn_layer(sd, base, j, cross=True) for j in range(n)]
    return p


def import_unet(sd: Mapping, unet, prefix: str = "") -> Params:
    """Reference Unet state_dict (unet_base.py or unet_cond_base.py) ->
    our UNet param tree."""
    pf = prefix
    p: dict = {
        "conv_in": conv(sd, f"{pf}conv_in"),
        "t_proj1": linear(sd, f"{pf}t_proj.0"),
        "t_proj2": linear(sd, f"{pf}t_proj.2"),
        "downs": [_down_block(sd, f"{pf}downs.{i}", b) for i, b in enumerate(unet.downs)],
        "mids": [_mid_block(sd, f"{pf}mids.{i}", b) for i, b in enumerate(unet.mids)],
    }
    if getattr(unet, "class_cond", False):
        p["class_emb"] = _np(sd[f"{pf}class_emb.weight"])
    if getattr(unet, "image_cond", False):
        p["cond_conv_in"] = conv(sd, f"{pf}cond_conv_in")
    if unet.use_up:
        p["ups"] = [_up_block(sd, f"{pf}ups.{i}", b) for i, b in enumerate(unet.ups)]
        p["norm_out"] = norm(sd, f"{pf}norm_out")
        p["conv_out"] = conv(sd, f"{pf}conv_out")
    return p


def _sequential_convs(sd: Mapping, prefix: str, seq) -> Params:
    """Import a torch Sequential of convs/activations into our Sequential
    params.  The reference hint blocks are flat Sequentials for DDPM
    (controlnet.py:69-89) but NESTED Sequential-of-Sequentials for LDM
    (controlnet_ldm.py:47-79) — so convs are matched by scanning the
    state-dict keys under ``prefix`` in index order."""
    import re

    pat = re.compile(re.escape(prefix) + r"\.((?:\d+\.)*\d+)\.weight$")
    conv_prefixes = sorted(
        (tuple(int(x) for x in m.group(1).split(".")), k[: -len(".weight")])
        for k in sd
        if (m := pat.match(k))
    )
    n_model = sum(1 for s in seq.steps if not isinstance(s, str))
    if len(conv_prefixes) != n_model:
        raise ValueError(
            f"hint-block conv count mismatch under {prefix!r}: checkpoint has "
            f"{len(conv_prefixes)} convs, model expects {n_model} — the "
            "checkpoint was likely trained with a different down_sample_factor")
    convs = iter(pref for _, pref in conv_prefixes)
    params = []
    for step in seq.steps:
        params.append({} if isinstance(step, str) else conv(sd, next(convs)))
    return {"layers": params}


def import_controlnet(sd: Mapping, cn) -> Params:
    """Full reference ControlNet checkpoint -> our ControlNet tree.

    Handles the reference's prefix conventions (controlnet.py:32-65:
    trained_unet.*, control_copy_unet.*, control_copy_unet_hint_block.*,
    control_copy_unet_down_zero_convs.*, control_copy_unet_mid_zero_convs.*
    — the LDM variant drops the "copy_" infix)."""
    infix = "control_copy_unet" if any(k.startswith("control_copy_unet.") for k in sd) else "control_unet"
    p = {
        "trained_unet": import_unet(sd, cn.unet, "trained_unet."),
        "control_unet": import_unet(sd, cn.control_unet, f"{infix}."),
        "hint_block": _sequential_convs(sd, f"{infix}_hint_block", cn.hint_block),
        "down_zero": [conv(sd, f"{infix}_down_zero_convs.{i}") for i in range(len(cn.down_zero))],
        "mid_zero": [conv(sd, f"{infix}_mid_zero_convs.{i}") for i in range(len(cn.mid_zero))],
    }
    return p


def import_vae(sd: Mapping, vae) -> Params:
    """Reference VAE state_dict (models/vae.py) -> our VAE tree."""
    p = {
        "encoder_conv_in": conv(sd, "encoder_conv_in"),
        "encoder_layers": [
            _down_block(sd, f"encoder_layers.{i}", b) for i, b in enumerate(vae.encoder_layers)
        ],
        "encoder_mids": [
            _mid_block(sd, f"encoder_mids.{i}", b) for i, b in enumerate(vae.encoder_mids)
        ],
        "encoder_norm_out": norm(sd, "encoder_norm_out"),
        "encoder_conv_out": conv(sd, "encoder_conv_out"),
        "pre_quant_conv": conv(sd, "pre_quant_conv"),
        "post_quant_conv": conv(sd, "post_quant_conv"),
        "decoder_conv_in": conv(sd, "decoder_conv_in"),
        "decoder_mids": [
            _mid_block(sd, f"decoder_mids.{i}", b) for i, b in enumerate(vae.decoder_mids)
        ],
        "decoder_layers": [
            _up_block(sd, f"decoder_layers.{i}", b) for i, b in enumerate(vae.decoder_layers)
        ],
        "decoder_norm_out": norm(sd, "decoder_norm_out"),
        "decoder_conv_out": conv(sd, "decoder_conv_out"),
    }
    return p


def import_distilled_student(sd: Mapping, student) -> Params:
    """Reference distilled-student state_dict -> our tree.

    Covers both ConsistencyControlNet (consistency_controlnet_distilled.py:
    10-38) and DistributionMatchingControlNet (distribution_matching_
    controlnet.py:89-118): ``unet.*`` + flat ``hint_block.*`` Sequential +
    ``t_proj.1`` Linear (their t_proj is Sequential(SiLU, Linear)).
    Accepts raw student dicts or full wrapper dicts with ``student.``
    prefixes."""
    prefix = "student." if any(k.startswith("student.") for k in sd) else ""
    return {
        "unet": import_unet(sd, student.unet, f"{prefix}unet."),
        "hint_block": _sequential_convs(sd, f"{prefix}hint_block", student.hint_block),
        "t_proj": linear(sd, f"{prefix}t_proj.1"),
    }


def load_torch_state_dict(path: str) -> dict:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if not isinstance(sd, dict):
        raise ValueError(f"unsupported checkpoint format in {path}")
    # unwrap nested trainer formats (compare_all_controlnet_models.py:23-49)
    for key in ("model_state_dict", "state_dict"):
        if key in sd and isinstance(sd[key], dict):
            return sd[key]
    return sd
