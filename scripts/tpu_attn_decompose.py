"""Decompose the attention cost at the flagship model's exact shapes.

Times (a) the fused Pallas kernel, (b) XLA batched attention, and (c) the
raw ingredients (batched scores einsum at K=dh, exp over the score tensor)
for each (L, C, dh) the MNIST UNet actually runs.  One claim, serialized.
"""

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

from controlnet_tpu.ops.pallas_attention import fused_attention_t

B = 64
REPS = 30


def timeit(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(REPS):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / REPS * 1e6


def case(l, heads, dh):
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, heads, dh, l), jnp.float32)
    k = jax.random.normal(key, (B, heads, dh, l), jnp.float32)
    v = jax.random.normal(key, (B, heads, dh, l), jnp.float32)

    us_pl = timeit(jax.jit(lambda a, b_, c: fused_attention_t(a, b_, c)), q, k, v)

    def xla(a, b_, c):
        s = jnp.einsum("bhdq,bhdk->bhqk", a, b_, preferred_element_type=jnp.float32)
        p = jax.nn.softmax(s / (dh ** 0.5), axis=-1)
        return jnp.einsum("bhdk,bhqk->bhdq", c, p, preferred_element_type=jnp.float32)

    us_xla = timeit(jax.jit(xla), q, k, v)

    us_scores = timeit(jax.jit(lambda a, b_: jnp.einsum(
        "bhdq,bhdk->bhqk", a, b_, preferred_element_type=jnp.float32)), q, k)
    s = jax.random.normal(key, (B, heads, l, l), jnp.float32)
    us_exp = timeit(jax.jit(lambda x: jnp.exp(x)), s)
    us_softmax = timeit(jax.jit(lambda x: jax.nn.softmax(x, axis=-1)), s)

    print(json.dumps({
        "shape": f"L{l} H{heads} dh{dh} B{B}",
        "pallas_us": round(us_pl, 1), "xla_attn_us": round(us_xla, 1),
        "scores_einsum_us": round(us_scores, 1), "exp_us": round(us_exp, 1),
        "softmax_us": round(us_softmax, 1),
    }), flush=True)


def main():
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}), flush=True)
    case(784, 4, 16)   # down level 0 (C=64)
    case(784, 4, 4)    # up level 0 (C=16)
    case(196, 4, 32)   # level 1 (C=128)
    case(49, 4, 64)    # level 2 / mids (C=256)


if __name__ == "__main__":
    main()
