"""1-step distilled sampler latency (north star: <50 ms/image)."""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.expanduser("~"), ".cache", "controlnet_tpu_xla"))
from controlnet_tpu.models.consistency import ConsistencyDistilled
from controlnet_tpu.models.dmd import DistributionMatchingControlNet

MP = dict(im_channels=1, im_size=28, hint_channels=3,
          down_channels=[32, 64, 128, 256], mid_channels=[256, 256, 128],
          down_sample=[True, True, False], time_emb_dim=128,
          num_down_layers=2, num_mid_layers=2, num_up_layers=2, num_heads=4,
          sigma_min=0.002, sigma_max=80.0, sigma_data=0.5)

def lat(f, *a, iters=50):
    jax.block_until_ready(f(*a))
    t0 = time.time()
    for _ in range(iters):
        out = f(*a)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters * 1e3

for b in (1, 16):
    model = ConsistencyDistilled(1, MP, use_ddpm_teacher=False)
    p = model.init(jax.random.PRNGKey(0))
    hint = jnp.zeros((b, 28, 28, 3))
    gen = jax.jit(lambda sp, k: model.generate({"student": sp}, hint, (b, 28, 28, 1), k, 1))
    ms = lat(gen, p["student"], jax.random.PRNGKey(1))
    print(json.dumps({"exp": f"consistency_1step_b{b}", "ms_per_call": round(ms, 3),
                      "ms_per_image": round(ms / b, 3)}), flush=True)

    dmd = DistributionMatchingControlNet(1, MP)
    dp = dmd.init(jax.random.PRNGKey(0))
    one = jax.jit(lambda p, k: dmd(p, jax.random.normal(k, (b, 28, 28, 1)),
                                   jnp.full((b,), 999, jnp.int32), hint))
    ms = lat(one, dp, jax.random.PRNGKey(1))
    print(json.dumps({"exp": f"dmd_1step_b{b}", "ms_per_call": round(ms, 3),
                      "ms_per_image": round(ms / b, 3)}), flush=True)
