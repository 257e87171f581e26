"""Diagnose the MNIST per-step floor: forward alone vs scan variants."""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.expanduser("~"), ".cache", "controlnet_tpu_xla"))
from controlnet_tpu.models.unet import UNet
from controlnet_tpu.schedules.linear import make_linear_schedule, sample_prev_timestep

MP = dict(im_channels=1, im_size=28, hint_channels=3,
          down_channels=[32, 64, 128, 256], mid_channels=[256, 256, 128],
          down_sample=[True, True, False], time_emb_dim=128,
          num_down_layers=2, num_mid_layers=2, num_up_layers=2, num_heads=4)
B = 64
unet = UNet(1, MP)
p = unet.init(jax.random.PRNGKey(0))
x = jnp.zeros((B, 28, 28, 1)); t = jnp.zeros((B,), jnp.int32)

def timeit(f, *a, iters=20):
    jax.block_until_ready(f(*a))
    t0 = time.time()
    for _ in range(iters):
        out = f(*a)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters * 1e3

fwd = jax.jit(lambda p, x, t: unet(p, x, t))
print(json.dumps({"exp": "fwd_only_ms", "ms": round(timeit(fwd, p, x, t), 3)}), flush=True)

sched = make_linear_schedule(100, 1e-4, 0.02)

@jax.jit
def scan_no_traj(p, key):
    x0 = jax.random.normal(key, (B, 28, 28, 1))
    def body(carry, i):
        xt, key = carry
        key, k = jax.random.split(key)
        tb = jnp.full((B,), 100 - 1 - i, jnp.int32)
        eps = unet(p, xt, tb)
        xt, _ = sample_prev_timestep(sched, xt, eps, 100 - 1 - i, k)
        return (xt, key), None
    (xt, _), _ = jax.lax.scan(body, (x0, key), jnp.arange(100))
    return xt

jax.block_until_ready(scan_no_traj(p, jax.random.PRNGKey(0)))
t0 = time.time(); jax.block_until_ready(scan_no_traj(p, jax.random.PRNGKey(1)))
print(json.dumps({"exp": "scan100_no_traj_ms_per_step", "ms": round((time.time()-t0)/100*1e3, 3)}), flush=True)

@jax.jit
def scan_with_traj(p, key):
    x0 = jax.random.normal(key, (B, 28, 28, 1))
    def body(carry, i):
        xt, key = carry
        key, k = jax.random.split(key)
        tb = jnp.full((B,), 100 - 1 - i, jnp.int32)
        eps = unet(p, xt, tb)
        xt, _ = sample_prev_timestep(sched, xt, eps, 100 - 1 - i, k)
        return (xt, key), jnp.clip(xt, -1, 1)
    (xt, _), traj = jax.lax.scan(body, (x0, key), jnp.arange(100))
    return xt, traj

jax.block_until_ready(scan_with_traj(p, jax.random.PRNGKey(0))[0])
t0 = time.time(); jax.block_until_ready(scan_with_traj(p, jax.random.PRNGKey(1))[0])
print(json.dumps({"exp": "scan100_traj_ms_per_step", "ms": round((time.time()-t0)/100*1e3, 3)}), flush=True)

# bigger batch scaling
for BB in (128, 256):
    xb = jnp.zeros((BB, 28, 28, 1)); tb = jnp.zeros((BB,), jnp.int32)
    ms = timeit(fwd, p, xb, tb, iters=10)
    print(json.dumps({"exp": f"fwd_only_b{BB}_ms", "ms": round(ms, 3),
                      "ms_per_64": round(ms * 64 / BB, 3)}), flush=True)
