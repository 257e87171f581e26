"""Micro-bench: single ops, NHWC vs TL-XLA vs TL-Pallas, at the flagship
MNIST UNet's real shapes (B=64).  One process, one claim."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.expanduser("~"), ".cache", "controlnet_tpu_xla"),
)

from controlnet_tpu.nn.layers import Conv2d, ConvTranspose2d, GroupNorm, MultiheadAttention
from controlnet_tpu.ops import tl_conv
from controlnet_tpu.ops.pallas_conv import pallas_conv3x3_applicable, pallas_conv3x3_tl

B = 64
REPS = 50


def timeit(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(REPS):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / REPS * 1e6  # us


def conv_case(h, w, cin, cout):
    layer = Conv2d(cin, cout, 3)
    p = layer.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (B, h, w, cin))
    xt = tl_conv.to_tl(x)
    us_nhwc = timeit(jax.jit(lambda pp, xx: layer(pp, xx)), p, x)
    us_xla = timeit(jax.jit(lambda pp, xx: tl_conv.conv3x3_tl(pp["w"], pp["b"], xx, (h, w), use_pallas=False)), p, xt)
    us_pl = None
    if pallas_conv3x3_applicable(xt, cin, cout, (h, w)):
        us_pl = timeit(jax.jit(lambda pp, xx: pallas_conv3x3_tl(pp["w"], pp["b"], xx, (h, w))), p, xt)
    print(json.dumps({"op": f"conv3x3 {h}x{w} {cin}->{cout}",
                      "nhwc_us": round(us_nhwc, 1),
                      "tl_xla_us": round(us_xla, 1),
                      "tl_pallas_us": round(us_pl, 1) if us_pl else None}), flush=True)


def gn_case(h, w, c):
    layer = GroupNorm(8, c)
    p = layer.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (B, h, w, c))
    xt = tl_conv.to_tl(x)
    us_nhwc = timeit(jax.jit(lambda pp, xx: layer(pp, xx)), p, x)
    us_tl = timeit(jax.jit(lambda pp, xx: layer.tl(pp, xx)), p, xt)
    print(json.dumps({"op": f"groupnorm {h}x{w} C{c}",
                      "nhwc_us": round(us_nhwc, 1), "tl_us": round(us_tl, 1)}), flush=True)


def attn_case(h, w, c, heads=4):
    layer = MultiheadAttention(c, heads)
    p = layer.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (B, h * w, c))
    xt = jax.random.normal(jax.random.PRNGKey(1), (c, B, h * w))
    us_nhwc = timeit(jax.jit(lambda pp, xx: layer(pp, xx)), p, x)
    us_tl = timeit(jax.jit(lambda pp, xx: layer.tl(pp, xx)), p, xt)
    print(json.dumps({"op": f"attention L{h*w} C{c}",
                      "nhwc_us": round(us_nhwc, 1), "tl_us": round(us_tl, 1)}), flush=True)


def resample_case(h, w, c):
    down = Conv2d(c, c, 4, stride=2, padding=1)
    up = ConvTranspose2d(c, c, 4, 2, 1)
    pd, pu = down.init(jax.random.PRNGKey(0)), up.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (B, h, w, c))
    xt = tl_conv.to_tl(x)
    print(json.dumps({
        "op": f"down4 {h}x{w} C{c}",
        "nhwc_us": round(timeit(jax.jit(lambda pp, xx: down(pp, xx)), pd, x), 1),
        "tl_us": round(timeit(jax.jit(lambda pp, xx: down.tl(pp, xx, (h, w))), pd, xt), 1),
    }), flush=True)
    print(json.dumps({
        "op": f"upT4 {h}x{w} C{c}",
        "nhwc_us": round(timeit(jax.jit(lambda pp, xx: up(pp, xx)), pu, x), 1),
        "tl_us": round(timeit(jax.jit(lambda pp, xx: up.tl(pp, xx, (h, w))), pu, xt), 1),
    }), flush=True)


def main():
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}), flush=True)
    conv_case(28, 28, 32, 32)
    conv_case(28, 28, 32, 64)
    conv_case(14, 14, 64, 128)
    conv_case(14, 14, 128, 128)
    conv_case(7, 7, 128, 256)
    conv_case(7, 7, 256, 256)
    gn_case(28, 28, 32)
    gn_case(7, 7, 256)
    attn_case(28, 28, 64)
    attn_case(7, 7, 256)
    resample_case(28, 28, 64)
    resample_case(14, 14, 128)


if __name__ == "__main__":
    main()
