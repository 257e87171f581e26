"""Attention microbench + MNIST step re-measure with the transposed kernel."""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.expanduser("~"), ".cache", "controlnet_tpu_xla"))
from controlnet_tpu.ops.attention import _split_heads, _merge_heads, _xla_attention
from controlnet_tpu.ops.pallas_attention import fused_attention

def timeit(f, *a, iters=20):
    jax.block_until_ready(f(*a))
    t0 = time.time()
    outs = [f(*a) for _ in range(iters)]
    jax.block_until_ready(outs[-1])
    return (time.time() - t0) / iters * 1e3

B, H, L, D = 64, 4, 784, 16
kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
q = jax.random.normal(kq, (B, H, L, D))
k = jax.random.normal(kk, (B, H, L, D))
v = jax.random.normal(kv, (B, H, L, D))
f_pallas = jax.jit(lambda q, k, v: fused_attention(q, k, v))
f_xla = jax.jit(_xla_attention)
err = float(jnp.abs(f_pallas(q, k, v) - f_xla(q, k, v)).max())
print(json.dumps({"exp": "attn_784x16", "pallas_ms": round(timeit(f_pallas, q, k, v), 3),
                  "xla_ms": round(timeit(f_xla, q, k, v), 3), "max_err": err}), flush=True)

# MNIST sampler step re-measure
from controlnet_tpu.models.unet import UNet
from controlnet_tpu.sample.ddpm import make_ddpm_sampler
from controlnet_tpu.schedules.linear import make_linear_schedule
MP = dict(im_channels=1, im_size=28, hint_channels=3,
          down_channels=[32, 64, 128, 256], mid_channels=[256, 256, 128],
          down_sample=[True, True, False], time_emb_dim=128,
          num_down_layers=2, num_mid_layers=2, num_up_layers=2, num_heads=4)
unet = UNet(1, MP)
p = unet.init(jax.random.PRNGKey(0))
sched = make_linear_schedule(1000, 1e-4, 0.02)
sampler = make_ddpm_sampler(lambda p, x, t: unet(p, x, t), sched, (64, 28, 28, 1),
                            record_every=1000)
jax.block_until_ready(sampler(p, jax.random.PRNGKey(1))[0])
t0 = time.time()
x0, _ = sampler(p, jax.random.PRNGKey(2))
jax.block_until_ready(x0)
dt = time.time() - t0
print(json.dumps({"exp": "mnist_f32_pallas_v2", "samples_per_sec": round(64 / dt, 3),
                  "ms_per_step": round(dt, 3)}), flush=True)
