"""Export this framework's param trees as reference PyTorch state_dicts.

The exact inverse of io/torch_import.py: produces ``state_dict``s with the
reference's module paths (e.g. ``downs.0.resnet_conv_first.1.2.weight``,
models/unet_base.py / models/unet_cond_base.py / models/vae.py /
models/controlnet.py:32-65 prefix grammar) so checkpoints trained with this
stack can be loaded into the reference with ``strict=True`` and evaluated by
its tooling — closing the parity loop in both directions.

Weight layout conversions (inverse of torch_import):
  * Conv2d:           HWIO -> OIHW
  * ConvTranspose2d:  our HWIO-and-flipped kernel -> torch (in, out, kh, kw)
  * Linear:           (in, out) -> (out, in)
  * MultiheadAttention: wq/wk/wv re-fused into in_proj (3D, D); out_proj
                      transposed.
  * GroupNorm:        scale->weight, bias->bias.

Values are numpy float32 arrays; ``save_torch_checkpoint`` converts to torch
tensors at the file boundary (tools/export_torch_checkpoint.py CLI).
"""

from __future__ import annotations

from typing import Any

import numpy as np

Params = Any


def _np(x) -> np.ndarray:
    return np.asarray(x, np.float32)


def conv(p: Params, prefix: str, out: dict) -> None:
    out[f"{prefix}.weight"] = _np(p["w"]).transpose(3, 2, 0, 1)
    if "b" in p:
        out[f"{prefix}.bias"] = _np(p["b"])


def conv_transpose(p: Params, prefix: str, out: dict) -> None:
    w = _np(p["w"])[::-1, ::-1]  # un-flip -> plain HWIO
    out[f"{prefix}.weight"] = w.transpose(2, 3, 0, 1)  # -> (in, out, kh, kw)
    out[f"{prefix}.bias"] = _np(p["b"])


def linear(p: Params, prefix: str, out: dict) -> None:
    out[f"{prefix}.weight"] = _np(p["w"]).T
    if "b" in p:
        out[f"{prefix}.bias"] = _np(p["b"])


def norm(p: Params, prefix: str, out: dict) -> None:
    out[f"{prefix}.weight"] = _np(p["scale"])
    out[f"{prefix}.bias"] = _np(p["bias"])


def attention(p: Params, prefix: str, out: dict) -> None:
    out[f"{prefix}.in_proj_weight"] = np.concatenate(
        [_np(p["wq"]).T, _np(p["wk"]).T, _np(p["wv"]).T], axis=0)
    out[f"{prefix}.in_proj_bias"] = np.concatenate(
        [_np(p["bq"]), _np(p["bk"]), _np(p["bv"])])
    out[f"{prefix}.out_proj.weight"] = _np(p["wo"]).T
    out[f"{prefix}.out_proj.bias"] = _np(p["bo"])


def _resnet_layer(p: Params, base: str, j: int, out: dict) -> None:
    norm(p["norm1"], f"{base}.resnet_conv_first.{j}.0", out)
    conv(p["conv1"], f"{base}.resnet_conv_first.{j}.2", out)
    norm(p["norm2"], f"{base}.resnet_conv_second.{j}.0", out)
    conv(p["conv2"], f"{base}.resnet_conv_second.{j}.2", out)
    conv(p["skip"], f"{base}.residual_input_conv.{j}", out)
    if "t_proj" in p:
        linear(p["t_proj"], f"{base}.t_emb_layers.{j}.1", out)


def _attn_layer(p: Params, base: str, j: int, out: dict, cross: bool = False) -> None:
    pre = "cross_attention" if cross else "attention"
    norm(p["norm"], f"{base}.{pre}_norms.{j}", out)
    attention(p["attn"], f"{base}.{pre}s.{j}", out)
    if cross:
        linear(p["ctx_proj"], f"{base}.context_proj.{j}", out)


def _block(p: Params, base: str, out: dict) -> None:
    """Down/mid/up block params -> reference keys (grammar shared by all
    three block families: resnets + attns + xattns + up/down convs)."""
    for j, rp in enumerate(p["resnets"]):
        _resnet_layer(rp, base, j, out)
    for j, ap in enumerate(p.get("attns", [])):
        _attn_layer(ap, base, j, out)
    for j, ap in enumerate(p.get("xattns", [])):
        _attn_layer(ap, base, j, out, cross=True)
    if p.get("down"):
        conv(p["down"], f"{base}.down_sample_conv", out)
    if p.get("up"):
        conv_transpose(p["up"], f"{base}.up_sample_conv", out)


def export_unet(p: Params, prefix: str = "", out: dict | None = None) -> dict:
    """Our UNet param tree -> reference Unet state_dict (unet_base.py /
    unet_cond_base.py)."""
    sd = out if out is not None else {}
    conv(p["conv_in"], f"{prefix}conv_in", sd)
    linear(p["t_proj1"], f"{prefix}t_proj.0", sd)
    linear(p["t_proj2"], f"{prefix}t_proj.2", sd)
    for i, bp in enumerate(p["downs"]):
        _block(bp, f"{prefix}downs.{i}", sd)
    for i, bp in enumerate(p["mids"]):
        _block(bp, f"{prefix}mids.{i}", sd)
    if "class_emb" in p:
        sd[f"{prefix}class_emb.weight"] = _np(p["class_emb"])
    if "cond_conv_in" in p:
        conv(p["cond_conv_in"], f"{prefix}cond_conv_in", sd)
    if "ups" in p:
        for i, bp in enumerate(p["ups"]):
            _block(bp, f"{prefix}ups.{i}", sd)
        norm(p["norm_out"], f"{prefix}norm_out", sd)
        conv(p["conv_out"], f"{prefix}conv_out", sd)
    return sd


def _export_hint_block(p: Params, seq, prefix: str, nested: bool, out: dict) -> None:
    """Our Sequential hint-block params -> reference key paths.

    * flat (DDPM controlnet.py:69-89 and both distilled students): torch
      index == position in the steps list (SiLUs hold their slot);
    * nested (LDM controlnet_ldm.py:47-79): Sequential-of-Sequentials —
      stage 0 is (conv, silu), middle stages (conv, silu, conv), final
      stage (conv, silu, zero conv)."""
    layers = p["layers"]
    if not nested:
        for i, (step, lp) in enumerate(zip(seq.steps, layers)):
            if not isinstance(step, str):
                conv(lp, f"{prefix}.{i}", out)
        return
    convs = [lp for step, lp in zip(seq.steps, layers) if not isinstance(step, str)]
    n_stages = (len(convs) - 1) // 2  # 1 head conv + 2 per remaining stage
    conv(convs[0], f"{prefix}.0.0", out)
    k = 1
    for stage in range(1, n_stages):
        conv(convs[k], f"{prefix}.{stage}.0", out)
        conv(convs[k + 1], f"{prefix}.{stage}.2", out)
        k += 2
    conv(convs[k], f"{prefix}.{n_stages}.0", out)
    conv(convs[k + 1], f"{prefix}.{n_stages}.2", out)


def export_controlnet(p: Params, cn) -> dict:
    """Our ControlNet tree -> full reference ControlNet state_dict.

    DDPM variant uses the ``control_copy_unet`` infix and a flat hint block
    (controlnet.py:69-107); the LDM variant (``down_sample_factor`` set)
    uses ``control_unet`` and the nested hint block (controlnet_ldm.py)."""
    ldm = getattr(cn, "down_sample_factor", None) is not None
    infix = "control_unet" if ldm else "control_copy_unet"
    sd: dict = {}
    export_unet(p["trained_unet"], "trained_unet.", sd)
    export_unet(p["control_unet"], f"{infix}.", sd)
    _export_hint_block(p["hint_block"], cn.hint_block, f"{infix}_hint_block", ldm, sd)
    for i, zp in enumerate(p["down_zero"]):
        conv(zp, f"{infix}_down_zero_convs.{i}", sd)
    for i, zp in enumerate(p["mid_zero"]):
        conv(zp, f"{infix}_mid_zero_convs.{i}", sd)
    return sd


def export_vae(p: Params) -> dict:
    """Our VAE tree -> reference VAE state_dict (models/vae.py)."""
    sd: dict = {}
    conv(p["encoder_conv_in"], "encoder_conv_in", sd)
    for i, bp in enumerate(p["encoder_layers"]):
        _block(bp, f"encoder_layers.{i}", sd)
    for i, bp in enumerate(p["encoder_mids"]):
        _block(bp, f"encoder_mids.{i}", sd)
    norm(p["encoder_norm_out"], "encoder_norm_out", sd)
    conv(p["encoder_conv_out"], "encoder_conv_out", sd)
    conv(p["pre_quant_conv"], "pre_quant_conv", sd)
    conv(p["post_quant_conv"], "post_quant_conv", sd)
    conv(p["decoder_conv_in"], "decoder_conv_in", sd)
    for i, bp in enumerate(p["decoder_mids"]):
        _block(bp, f"decoder_mids.{i}", sd)
    for i, bp in enumerate(p["decoder_layers"]):
        _block(bp, f"decoder_layers.{i}", sd)
    norm(p["decoder_norm_out"], "decoder_norm_out", sd)
    conv(p["decoder_conv_out"], "decoder_conv_out", sd)
    return sd


def export_distilled_student(p: Params, student, prefix: str = "") -> dict:
    """Our consistency/DMD student tree -> reference student state_dict
    (consistency_controlnet_distilled.py:10-38 / distribution_matching_
    controlnet.py:89-118): ``unet.*`` + flat ``hint_block.*`` + ``t_proj.1``
    (their t_proj is Sequential(SiLU, Linear))."""
    sd: dict = {}
    export_unet(p["unet"], f"{prefix}unet.", sd)
    _export_hint_block(p["hint_block"], student.hint_block,
                       f"{prefix}hint_block", nested=False, out=sd)
    linear(p["t_proj"], f"{prefix}t_proj.1", sd)
    return sd


def save_torch_checkpoint(sd: dict, path: str) -> None:
    """numpy state_dict (possibly nested in a reference dict-checkpoint
    wrapper, e.g. {'epoch', 'model_state_dict', ...}) -> torch .pth
    (torch import deferred so TPU-only hosts never need it on the hot
    path)."""
    import torch

    def convert(v):
        if isinstance(v, dict):
            return {k: convert(x) for k, x in v.items()}
        if isinstance(v, np.ndarray):
            return torch.from_numpy(np.ascontiguousarray(v))
        return v

    torch.save(convert(sd), path)
