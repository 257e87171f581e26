"""Pallas fused-attention kernel vs the XLA reference path, via the Pallas
interpreter (no TPU needed)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from controlnet_tpu.ops.attention import _split_heads, _xla_attention
from controlnet_tpu.ops.pallas_attention import fused_attention


@pytest.mark.parametrize("b,h,l,d", [(1, 2, 16, 8), (2, 2, 49, 16)])
def test_fused_attention_matches_xla(b, h, l, d):
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(kq, (b, h, l, d), jnp.float32)
    k = jax.random.normal(kk, (b, h, l, d), jnp.float32)
    v = jax.random.normal(kv, (b, h, l, d), jnp.float32)
    ref = _xla_attention(q, k, v)
    out = fused_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_attention_cross_lengths():
    """Cross-attention shape: Lq != Lk (text conditioning path)."""
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(kq, (1, 2, 49, 8), jnp.float32)
    k = jax.random.normal(kk, (1, 2, 7, 8), jnp.float32)
    v = jax.random.normal(kv, (1, 2, 7, 8), jnp.float32)
    ref = _xla_attention(q, k, v)
    out = fused_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_attention_gradients_match_xla():
    """Custom-VJP backward kernel vs autodiff through the XLA path."""
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(2), 3)
    q = jax.random.normal(kq, (1, 2, 16, 8), jnp.float32)
    k = jax.random.normal(kk, (1, 2, 16, 8), jnp.float32)
    v = jax.random.normal(kv, (1, 2, 16, 8), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(3), (1, 2, 16, 8), jnp.float32)

    def loss_pallas(q, k, v):
        return jnp.sum(fused_attention(q, k, v, True) * w)

    def loss_xla(q, k, v):
        return jnp.sum(_xla_attention(q, k, v) * w)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)


def test_fused_attention_extreme_scores_no_nan():
    """Regression: with Lk padding, strongly negative valid scores used to
    cancel the pad-corrected softmax denominator to exactly 0 -> inf/NaN
    (f32 sum rounds to n_pad*exp(-m)); the clamp must keep output finite and
    still match XLA (the valid rows' softmax is unaffected by the clamp
    except exactly at the degenerate point)."""
    b, h, l, d = 1, 2, 49, 8  # l=49 -> Lk padded to 128 (79 pad columns)
    kq, kk = jax.random.split(jax.random.PRNGKey(7))
    # q·k scaled so every valid score is ~ -40: exp(score - m) with m=0
    # underflows the f32 sum below the pad correction
    q = jnp.ones((b, h, l, d), jnp.float32) * 5.0
    k = -jnp.ones((b, h, l, d), jnp.float32) * 5.0
    v = jax.random.normal(kk, (b, h, l, d), jnp.float32)
    out = fused_attention(q, k, v, interpret=True)
    assert bool(jnp.all(jnp.isfinite(out)))
    ref = _xla_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    # gradients through the backward kernel must be finite too
    g = jax.grad(lambda q, k, v: jnp.sum(fused_attention(q, k, v, True)),
                 argnums=(0, 1, 2))(q, k, v)
    for a in g:
        assert bool(jnp.all(jnp.isfinite(a)))


def test_fused_attention_chunked_backward_matches_xla(monkeypatch):
    """The query-chunked backward (used at LDM shapes, L=1024, where the
    unchunked pipeline blew the 16MB scoped-VMEM stack) must produce the
    same gradients as the unchunked path / XLA autodiff.  Forced at small
    shapes by monkeypatching the chunk picker."""
    import controlnet_tpu.ops.pallas_attention as pa

    monkeypatch.setattr(pa, "_pick_chunk", lambda lq_p, lk_p: 64)
    b, h, l, d = 2, 4, 49, 8  # lq padded to 128 -> 2 chunks of 64
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(11), 3)
    q = jax.random.normal(kq, (b, h, l, d), jnp.float32)
    k = jax.random.normal(kk, (b, h, l, d), jnp.float32)
    v = jax.random.normal(kv, (b, h, l, d), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(12), (b, h, l, d), jnp.float32)

    gx = jax.grad(lambda q, k, v: jnp.sum(_xla_attention(q, k, v) * w),
                  argnums=(0, 1, 2))(q, k, v)
    for pipe in ("1", "0"):
        monkeypatch.setenv("CONTROLNET_TPU_ATTN_PIPE", pipe)
        gp = jax.grad(
            lambda q, k, v: jnp.sum(fused_attention(q, k, v, True) * w),
            argnums=(0, 1, 2))(q, k, v)
        for a, bb in zip(gp, gx):
            np.testing.assert_allclose(np.asarray(a), np.asarray(bb), atol=3e-5)


def test_pick_chunk_policy():
    """MNIST shapes (L<=896) stay unchunked (the proven round-2 config);
    LDM L=1024 chunks to 512 rows (2MB f32 score chunk)."""
    from controlnet_tpu.ops.pallas_attention import _pick_chunk

    assert _pick_chunk(896, 896) == 896
    assert _pick_chunk(128, 128) == 128
    assert _pick_chunk(1024, 1024) == 512


def test_fused_attention_pipelined_path_matches_xla(monkeypatch):
    """The software-pipelined (group>1, unrolled) kernel body is a pure
    dataflow reordering — must match the XLA path exactly."""
    import controlnet_tpu.ops.pallas_attention as pa

    monkeypatch.setenv("CONTROLNET_TPU_ATTN_PIPE", "1")
    # force a multi-slice group for these tiny shapes
    monkeypatch.setenv("CONTROLNET_TPU_ATTN_VMEM", str(64 * 1024 * 1024))
    b, h, l, d = 2, 4, 49, 8  # bh=8 -> group > 1 under a large budget
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(5), 3)
    q = jax.random.normal(kq, (b, h, l, d), jnp.float32)
    k = jax.random.normal(kk, (b, h, l, d), jnp.float32)
    v = jax.random.normal(kv, (b, h, l, d), jnp.float32)
    assert pa._pick_group(b * h, 128, 128, 16, n_bufs=2) > 1
    ref = _xla_attention(q, k, v)
    out = fused_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_pallas_fallback_warns_once_and_counts(monkeypatch):
    """A kernel dispatch failure must not be silent: first failure warns,
    every failure increments the profiling counter, and the XLA fallback
    output stays correct (VERDICT r3 weak #4)."""
    import warnings

    import controlnet_tpu.ops.attention as attn
    import controlnet_tpu.ops.pallas_attention as pa

    def boom(*a, **k):
        raise RuntimeError("synthetic kernel failure")

    monkeypatch.setattr(attn, "_use_pallas", lambda: True)
    monkeypatch.setattr(attn, "_fits_vmem", lambda *a, **k: True)
    monkeypatch.setattr(pa, "fused_attention", boom)
    monkeypatch.setattr(attn, "_fallback_counts", {"mha": 0, "mha_t": 0})
    monkeypatch.setattr(attn, "_fallback_warned", set())

    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 8), jnp.float32)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        out1 = attn.multi_head_attention(x, x, x, num_heads=2)
        out2 = attn.multi_head_attention(x, x, x, num_heads=2)
    msgs = [str(w.message) for w in caught if "Pallas" in str(w.message)]
    assert len(msgs) == 1  # warn-once
    assert attn.fallback_count()["mha"] == 2  # but every failure counted

    qh = attn._split_heads(x, 2)
    ref = attn._merge_heads(attn._xla_attention(qh, qh, qh))
    np.testing.assert_allclose(np.asarray(out1), np.asarray(ref), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref), atol=1e-6)


@pytest.mark.parametrize("dtype,atol", [(jnp.float32, 3e-5), (jnp.bfloat16, 0.03)])
@pytest.mark.parametrize("b,heads,l,c", [(2, 2, 49, 16), (1, 4, 64, 32)])
def test_fused_projection_attention_matches_composed(b, heads, l, c, dtype, atol):
    """The fused qkv-projection + attention + out-projection kernel
    (round 4) vs the composed reference: project, attend (XLA path),
    project back.  The bf16 case exercises the narrow-dtype memory policy
    (weights/bias/qkv/out slices resident in x.dtype — the variant that
    fits scoped VMEM on v5e); reference math runs in f32 with a bf16-level
    tolerance."""
    from controlnet_tpu.ops.pallas_attention import fused_attention_proj

    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    x = jax.random.normal(ks[0], (b, l, c), jnp.float32)
    wqkv = jax.random.normal(ks[1], (c, 3 * c), jnp.float32) * 0.1
    bqkv = jax.random.normal(ks[2], (3 * c,), jnp.float32) * 0.1
    wo = jax.random.normal(ks[3], (c, c), jnp.float32) * 0.1
    bo = jax.random.normal(ks[4], (c,), jnp.float32) * 0.1

    q = x @ wqkv[:, :c] + bqkv[:c]
    k = x @ wqkv[:, c:2 * c] + bqkv[c:2 * c]
    v = x @ wqkv[:, 2 * c:] + bqkv[2 * c:]

    def split(t):
        return t.reshape(b, l, heads, c // heads).transpose(0, 2, 1, 3)

    attn = _xla_attention(split(q), split(k), split(v))
    attn = attn.transpose(0, 2, 1, 3).reshape(b, l, c)
    ref = attn @ wo + bo

    out = fused_attention_proj(x.astype(dtype), wqkv, bqkv, wo, bo, heads,
                               interpret=True)
    assert out.dtype == dtype
    np.testing.assert_allclose(np.asarray(out.astype(jnp.float32)),
                               np.asarray(ref), atol=atol)


def test_fused_proj_footprint_guard():
    """fused_proj_fits (round 4): the L=1024, C=384 north-star layer
    measured 16.4-17.5M scoped-VMEM on v5e (over the 16M limit) across
    every dtype policy, so the guard must route it to the split path,
    while every other attention layer in the shipped configs fits."""
    from controlnet_tpu.ops.pallas_attention import fused_proj_fits

    # the oversized layer (celebhq LDM down block 0: 32x32 tokens, C=384)
    assert not fused_proj_fits(1024, 384, 384, itemsize=2)
    # remaining celebhq layers: 16x16@512, 8x8@768, mid 4x4@768
    assert fused_proj_fits(256, 512, 512, itemsize=2)
    assert fused_proj_fits(64, 768, 768, itemsize=2)
    assert fused_proj_fits(16, 768, 768, itemsize=2)
    # MNIST/CIFAR shapes (28^2=784 tokens at small C) fit
    assert fused_proj_fits(784, 128, 128, itemsize=2)
    assert fused_proj_fits(1024, 128, 128, itemsize=2)


def test_tuning_knobs_reach_kernel_planners(monkeypatch):
    """The YAML tpu_params surface must actually steer the kernel planning
    code — a registry nothing reads is how knobs silently die.  Checks the
    attention group picker (attn_group_cap / attn_vmem_bytes) and the TL
    conv applicability gate (disable_pallas_conv) end-to-end through
    tuning.apply_config, with env cleared so YAML values are live."""
    from controlnet_tpu import tuning
    from controlnet_tpu.ops import pallas_attention as pa
    from controlnet_tpu.ops.pallas_conv import pallas_conv3x3_applicable

    for knob in tuning._KNOBS.values():
        monkeypatch.delenv(knob.env, raising=False)
    saved = dict(tuning._yaml_values)
    try:
        tuning.apply_config({"tpu_params": {}})
        baseline = pa._pick_group(8, 128, 128, 16, n_bufs=2)
        assert baseline == 4  # default cap

        tuning.apply_config({"tpu_params": {"attn_group_cap": 2}})
        assert pa._pick_group(8, 128, 128, 16, n_bufs=2) == 2

        # a starved VMEM budget forces group 1 regardless of the cap
        tuning.apply_config({"tpu_params": {"attn_vmem_bytes": 1}})
        assert pa._pick_group(8, 128, 128, 16, n_bufs=2) == 1

        # disable_pallas_conv gates the TL conv kernel off (shape/backend
        # checks come later in the function, so False is decisive here)
        x = jnp.zeros((16, 2, 64), jnp.float32)  # (C, B, L)
        tuning.apply_config({"tpu_params": {"disable_pallas_conv": True}})
        assert pallas_conv3x3_applicable(x, 16, 16, (8, 8)) is False
    finally:
        tuning._yaml_values.clear()
        tuning._yaml_values.update(saved)
