"""ControlNet: frozen trained UNet + trainable encoder copy + zero convs.

Covers both reference variants with one class:

* DDPM ControlNet (models/controlnet.py:13-225): fixed hint encoder
  hint_ch -> 64 -> 128 -> C0 (conv3x3 + SiLU) ending in a zero conv.
* LDM ControlNet (models/controlnet_ldm.py:13-179): pass
  ``down_sample_factor`` (canny hint resolution / latent resolution) and the
  hint encoder is built dynamically — strided conv stack halving spatial
  dims and doubling channels from 16 until the factor is consumed.

Forward (controlnet.py:158-225): the frozen trunk's down path runs under
stop_gradient (the reference uses torch.no_grad()); the control branch gets
conv_in(x) + hint_block(hint); zero-conv'd control skips are added to the
frozen skips feeding the frozen decoder; zero-conv'd control mids are added
to the frozen mid outputs.  At init every zero conv outputs 0, so
ControlNet(x, t, hint) == base UNet(x, t) exactly — the defining property,
checked in tests/test_models.py (zero-conv identity test).

Parameter layout (one tree):
    {"trained_unet": ..., "control_unet": ..., "hint_block": ...,
     "down_zero": [...], "mid_zero": [...]}
``split_params``/``merge_params`` give the trainable/frozen partition
(the JAX analogue of reference get_params, controlnet.py:140-156):
gradients are simply never taken w.r.t. the frozen subtree.
"""

from __future__ import annotations

import copy
from typing import Any, Mapping

import jax
import jax.numpy as jnp

from controlnet_tpu.models.unet import UNet
from controlnet_tpu.nn.layers import Conv2d, Sequential

Params = Any


def _fixed_hint_block(hint_channels: int, c0: int) -> Sequential:
    """DDPM hint encoder (controlnet.py:69-89)."""
    return Sequential([
        Conv2d(hint_channels, 64, 3), "silu",
        Conv2d(64, 128, 3), "silu",
        Conv2d(128, c0, 3), "silu",
        Conv2d(c0, c0, 1, zero_init=True),
    ])


def _dynamic_hint_block(hint_channels: int, c0: int, down_sample_factor: int) -> Sequential:
    """LDM hint encoder (controlnet_ldm.py:45-79): stride-2 stages until the
    hint resolution matches the latent resolution."""
    if down_sample_factor < 1 or down_sample_factor & (down_sample_factor - 1):
        raise ValueError(
            f"down_sample_factor must be a power of two, got {down_sample_factor} "
            "(each hint-encoder stage downsamples by exactly 2; a non-power-of-two "
            "factor would leave the hint features misaligned with the latents)")
    steps: list = [Conv2d(hint_channels, 16, 3), "silu"]
    base = 16
    factor = down_sample_factor
    while factor > 1:
        steps += [Conv2d(base, base * 2, 3, stride=2, padding=1), "silu", Conv2d(base * 2, base * 2, 3)]
        base *= 2
        factor //= 2
    steps += [Conv2d(base, c0, 3), "silu", Conv2d(c0, c0, 1, zero_init=True)]
    return Sequential(steps)


class ControlNet:
    def __init__(
        self,
        im_channels: int,
        model_config: Mapping[str, Any],
        model_locked: bool = True,
        down_sample_factor: int | None = None,
    ):
        self.model_locked = model_locked
        self.down_sample_factor = down_sample_factor
        self._hint_feat_jit = None  # lazy jit cache for hint_features_chunked
        self.unet = UNet(im_channels, model_config)  # frozen trunk (full)
        self.control_unet = UNet(im_channels, model_config, use_up=False)
        dc = self.unet.down_channels
        mc = self.unet.mid_channels
        if down_sample_factor is None:
            self.hint_block = _fixed_hint_block(model_config["hint_channels"], dc[0])
        else:
            self.hint_block = _dynamic_hint_block(model_config["hint_channels"], dc[0], down_sample_factor)
        # One zero conv per down block input (controlnet.py:92-98) and per
        # mid-block output channel width (controlnet.py:101-107).
        self.down_zero = [Conv2d(dc[i], dc[i], 1, zero_init=True) for i in range(len(dc) - 1)]
        self.mid_zero = [Conv2d(mc[i], mc[i], 1, zero_init=True) for i in range(1, len(mc))]

    # ------------------------------------------------------------------
    def init(self, key: jax.Array, trained_unet_params: Params | None = None) -> Params:
        """Initialize. If ``trained_unet_params`` is given (a trained base
        UNet tree), both the frozen trunk and the control copy start from it
        (the reference loads the same checkpoint into both,
        controlnet.py:27-65)."""
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        if trained_unet_params is not None:
            trained = jax.tree.map(jnp.asarray, trained_unet_params)
            control = {
                k: copy.deepcopy(v)
                for k, v in trained.items()
                if k not in self._DECODER_KEYS
            }
        else:
            trained = self.unet.init(k1)
            control = self.control_unet.init(k2)
        dzk = jax.random.split(k4, max(len(self.down_zero), 1))
        mzk = jax.random.split(k5, max(len(self.mid_zero), 1))
        return {
            "trained_unet": trained,
            "control_unet": control,
            "hint_block": self.hint_block.init(k3),
            "down_zero": [z.init(dzk[i]) for i, z in enumerate(self.down_zero)],
            "mid_zero": [z.init(mzk[i]) for i, z in enumerate(self.mid_zero)],
        }

    # ------------------------------------------------------------------
    # trainable/frozen partition (analogue of get_params, controlnet.py:140-156)
    # ------------------------------------------------------------------
    _CONTROL_KEYS = ("control_unet", "hint_block", "down_zero", "mid_zero")
    _DECODER_KEYS = ("ups", "norm_out", "conv_out")

    def split_params(self, p: Params) -> tuple[Params, Params]:
        """Returns (trainable, frozen) trees. merge_params() inverts."""
        trainable = {k: p[k] for k in self._CONTROL_KEYS}
        if self.model_locked:
            frozen = {"trained_unet": p["trained_unet"]}
        else:
            trainable["trained_unet"] = {
                k: v for k, v in p["trained_unet"].items() if k in self._DECODER_KEYS
            }
            frozen = {
                "trained_unet": {
                    k: v for k, v in p["trained_unet"].items() if k not in self._DECODER_KEYS
                }
            }
        return trainable, frozen

    def merge_params(self, trainable: Params, frozen: Params) -> Params:
        p = {k: trainable[k] for k in self._CONTROL_KEYS}
        if self.model_locked:
            p["trained_unet"] = frozen["trained_unet"]
        else:
            p["trained_unet"] = {**frozen["trained_unet"], **trainable["trained_unet"]}
        return p

    # ------------------------------------------------------------------
    def hint_features(self, p: Params, hint: jax.Array) -> jax.Array:
        """Hint-encoder features (conv_in-resolution).  The hint is constant
        across a sampling loop, so samplers precompute this ONCE and pass it
        via ``hint_features`` — for CelebHQ this removes a 1024^2-input conv
        stack from every one of the 1000 denoising steps.

        The dynamic (LDM) encoder runs in transposed layout (C, B, L): its
        low-channel full-res stages (16 @ 1024^2 for CelebHQ) lane-pad 8x in
        NHWC — 16 GB of HBM padding at training batch 16, a hard OOM on a
        16 GB v5e chip.  TL keeps them pad-free (ops/tl_conv.py).  Numerics
        match the NHWC path to float tolerance (tests/test_tl_parity.py)."""
        from controlnet_tpu import tuning
        from controlnet_tpu.ops import tl_conv

        if self.down_sample_factor is not None and tuning.get("tl_hint"):
            out, out_hw = self.hint_block.tl(
                p["hint_block"], tl_conv.to_tl(hint), hint.shape[1:3])
            return tl_conv.from_tl(out, out_hw)
        return self.hint_block(p["hint_block"], hint)

    def hint_features_chunked(self, p: Params, hint: jax.Array,
                              chunk: int = 16) -> jax.Array:
        """``hint_features`` in batch chunks, each its own jitted executable.

        The full-res encoder's working set is batch-linear: at (64, 1024²,
        3) it exceeds one v5e's 16 GB HBM at compile time
        (docs/artifacts/tpu_batch_sweep_r4.json).  Chunking bounds live
        intermediates to ``chunk`` samples; since the encoding is a one-time
        precompute outside the sampling scan, the extra per-chunk dispatches
        cost nothing measurable.  Output is bit-identical to the unchunked
        path (pure per-sample conv stack — no cross-batch ops)."""
        if self._hint_feat_jit is None:
            self._hint_feat_jit = jax.jit(self.hint_features)
        n = hint.shape[0]
        if n <= chunk:
            return self._hint_feat_jit(p, hint)
        feats = [self._hint_feat_jit(p, hint[i:i + chunk])
                 for i in range(0, n, chunk)]
        return jnp.concatenate(feats, axis=0)

    def __call__(self, p: Params, x: jax.Array, t: jax.Array, hint: jax.Array | None = None,
                 hint_features: jax.Array | None = None) -> jax.Array:
        unet, ctrl = self.unet, self.control_unet

        # Frozen trunk down path — stop_gradient mirrors torch.no_grad()
        # (controlnet.py:166-170) and lets XLA skip the backward graph.
        fp = jax.lax.stop_gradient(p["trained_unet"])
        f_t_emb = unet.time_embed(fp, t)
        f_out = unet.stem(fp, x)
        f_out, f_down_outs = unet.encode(fp, f_out, f_t_emb)

        # Control branch (trainable).
        c_t_emb = ctrl.time_embed(p["control_unet"], t)
        if hint_features is None:
            assert hint is not None, "pass hint or precomputed hint_features"
            hint_features = self.hint_features(p, hint)
        c_out = ctrl.stem(p["control_unet"], x) + hint_features

        c_down_outs = []
        for i, (blk, bp) in enumerate(zip(ctrl.downs, p["control_unet"]["downs"])):
            c_down_outs.append(self.down_zero[i](p["down_zero"][i], c_out))
            c_out = blk(bp, c_out, c_t_emb)

        # Mids: control mid output injected into frozen mid stream through a
        # zero conv (controlnet.py:195-207).  Frozen mid params come from the
        # un-stop_gradient'd tree so grads can flow *through* them to the
        # control branch (reference runs them outside no_grad).
        m_out = f_out
        for i in range(len(unet.mids)):
            c_out = ctrl.mid_stage(p["control_unet"], i, c_out, c_t_emb)
            m_out = unet.mid_stage(p["trained_unet"], i, m_out, f_t_emb)
            m_out = m_out + self.mid_zero[i](p["mid_zero"][i], c_out)

        # Frozen decoder with summed skips (controlnet.py:210-218).
        skips = [f + c for f, c in zip(f_down_outs, c_down_outs)]
        return unet.decode(p["trained_unet"], m_out, skips, f_t_emb)

    def forward_fused(self, p: Params, x: jax.Array, t: jax.Array,
                      hint: jax.Array | None = None,
                      hint_features: jax.Array | None = None) -> jax.Array:
        """Sampling-mode forward with the frozen and control down/mid trunks
        STACKED on a leading axis of 2 and run through ``jax.vmap``.

        Same math as ``__call__`` (the vmap applies each trunk's own weights
        to its own stream — parity proven in tests/test_models.py); XLA
        lowers each vmapped conv pair to one batch-grouped convolution, so
        the dual trunk costs one kernel launch per layer instead of two.

        Measured (round 2, v5e, LDM ControlNet 1000-step sampling): batch 4
        5.44 ms/step vs 5.40 for ``__call__``; batch 8 9.06 vs 8.69 —
        batch-grouped convs do NOT beat two sequential full-batch convs on
        this part, so samplers keep ``__call__``.  Retained as a tested
        alternative path (useful on hardware where grouped-conv lowering is
        stronger, and as the record of the experiment).
        """
        unet, ctrl = self.unet, self.control_unet
        fp_sg = jax.lax.stop_gradient(p["trained_unet"])
        cp = p["control_unet"]

        f_t_emb = unet.time_embed(fp_sg, t)
        c_t_emb = ctrl.time_embed(cp, t)
        t2 = jnp.stack([f_t_emb, c_t_emb])  # (2, B, D)

        if hint_features is None:
            assert hint is not None, "pass hint or precomputed hint_features"
            hint_features = self.hint_features(p, hint)

        def stack2(a, b):
            return jax.tree.map(lambda u, v: jnp.stack([u, v]), a, b)

        conv_in2 = stack2(fp_sg["conv_in"], cp["conv_in"])
        downs2 = stack2(fp_sg["downs"], cp["downs"])
        # Frozen mids stay differentiable (reference runs them outside
        # no_grad, controlnet.py:195-207) — match __call__.
        mids2 = stack2(p["trained_unet"]["mids"], cp["mids"])

        out2 = jax.vmap(unet.conv_in, in_axes=(0, None))(conv_in2, x)
        out2 = out2.at[1].add(hint_features)

        skips = []
        for i, blk in enumerate(ctrl.downs):
            skips.append(out2[0] + self.down_zero[i](p["down_zero"][i], out2[1]))
            out2 = jax.vmap(lambda bp, xx, te, blk=blk: blk(bp, xx, te))(
                downs2[i], out2, t2)

        m, c = out2[0], out2[1]
        for i in range(len(unet.mids)):
            pair = jnp.stack([m, c])
            pair = jax.vmap(lambda bp, xx, te, blk=unet.mids[i]: blk(bp, xx, te))(
                mids2[i], pair, t2)
            c = pair[1]
            m = pair[0] + self.mid_zero[i](p["mid_zero"][i], c)

        return unet.decode(p["trained_unet"], m, skips, f_t_emb)

    def forward_paired(self, p: Params, x: jax.Array, t: jax.Array,
                       hint: jax.Array | None = None,
                       hint_features: jax.Array | None = None) -> jax.Array:
        """Sampling-mode forward with the frozen and control trunks advanced
        block-by-block in LOCKSTEP so each layer's two self-attention cores
        batch into ONE fused-kernel invocation at 2x the (batch*head)
        occupancy (nn/blocks .pair / nn/layers MultiheadAttention.pair —
        VERDICT r3 next #2b).  Convs stay per-trunk full-batch calls: the
        batch-grouped-conv variant lost its round-2 A/B (``forward_fused``
        docstring), and attention amortization is the only lever left.

        Math identical to ``__call__`` (attention is independent per
        (batch, head) slice; parity test in tests/test_models.py).
        Self-attention configs only (every reference ControlNet variant)."""
        unet, ctrl = self.unet, self.control_unet
        fp = jax.lax.stop_gradient(p["trained_unet"])
        cp = p["control_unet"]

        f_t_emb = unet.time_embed(fp, t)
        c_t_emb = ctrl.time_embed(cp, t)
        if hint_features is None:
            assert hint is not None, "pass hint or precomputed hint_features"
            hint_features = self.hint_features(p, hint)
        f_out = unet.stem(fp, x)
        c_out = ctrl.stem(cp, x) + hint_features

        f_down_outs, c_down_outs = [], []
        for i, blk in enumerate(unet.downs):
            f_down_outs.append(f_out)
            c_down_outs.append(self.down_zero[i](p["down_zero"][i], c_out))
            f_out, c_out = blk.pair(fp["downs"][i], cp["downs"][i],
                                    f_out, c_out, f_t_emb, c_t_emb)

        # Frozen mids differentiable, as in __call__ (reference runs them
        # outside no_grad, controlnet.py:195-207).
        m_out = f_out
        for i in range(len(unet.mids)):
            m_out, c_out = unet.mids[i].pair(
                p["trained_unet"]["mids"][i], cp["mids"][i],
                m_out, c_out, f_t_emb, c_t_emb)
            m_out = m_out + self.mid_zero[i](p["mid_zero"][i], c_out)

        skips = [f + c for f, c in zip(f_down_outs, c_down_outs)]
        return unet.decode(p["trained_unet"], m_out, skips, f_t_emb)

    def forward_tl(self, p: Params, x: jax.Array, t: jax.Array,
                   hint: jax.Array | None = None,
                   hint_features: jax.Array | None = None) -> jax.Array:
        """Transposed-layout forward (same math as __call__; see UNet TL
        docs).  The hint encoder stays NHWC — it runs once per sampling loop
        (hoisted via ``hint_features``), not per step."""
        from controlnet_tpu.ops.tl_conv import conv1x1_tl, to_tl

        unet, ctrl = self.unet, self.control_unet

        fp = jax.lax.stop_gradient(p["trained_unet"])
        f_t_emb = unet.time_embed(fp, t)
        f_out, hw0 = unet.stem_tl(fp, x)
        f_out, f_down_outs, hws, hw = unet.encode_tl(fp, f_out, f_t_emb, hw0)

        c_t_emb = ctrl.time_embed(p["control_unet"], t)
        if hint_features is None:
            assert hint is not None, "pass hint or precomputed hint_features"
            hint_features = self.hint_features(p, hint)
        c_out, _ = ctrl.stem_tl(p["control_unet"], x)
        c_out = c_out + to_tl(hint_features)

        c_down_outs = []
        c_hw = hw0
        for i, (blk, bp) in enumerate(zip(ctrl.downs, p["control_unet"]["downs"])):
            zp = p["down_zero"][i]
            c_down_outs.append(conv1x1_tl(zp["w"], zp.get("b"), c_out))
            c_out = blk.tl(bp, c_out, c_t_emb, hw=c_hw)
            if unet.down_sample[i]:
                c_hw = (c_hw[0] // 2, c_hw[1] // 2)

        m_out = f_out
        for i in range(len(unet.mids)):
            c_out = ctrl.mid_stage_tl(p["control_unet"], i, c_out, c_t_emb, c_hw)
            m_out = unet.mid_stage_tl(p["trained_unet"], i, m_out, f_t_emb, hw)
            zp = p["mid_zero"][i]
            m_out = m_out + conv1x1_tl(zp["w"], zp.get("b"), c_out)

        skips = [f + c for f, c in zip(f_down_outs, c_down_outs)]
        return unet.decode_tl(p["trained_unet"], m_out, skips, hws, f_t_emb, hw)
