"""Final round-1 measurement sweep in one claim."""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, optax
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.expanduser("~"), ".cache", "controlnet_tpu_xla"))
from controlnet_tpu.models.unet import UNet
from controlnet_tpu.models.controlnet import ControlNet
from controlnet_tpu.sample.ddpm import make_ddpm_sampler
from controlnet_tpu.schedules.linear import make_linear_schedule
from controlnet_tpu.train.loops import make_controlnet_train_step, make_ddpm_train_step
from controlnet_tpu.train.state import create_train_state

MP = dict(im_channels=1, im_size=28, hint_channels=3,
          down_channels=[32, 64, 128, 256], mid_channels=[256, 256, 128],
          down_sample=[True, True, False], time_emb_dim=128,
          num_down_layers=2, num_mid_layers=2, num_up_layers=2, num_heads=4)
LDM_MP = dict(hint_channels=3, down_channels=[256, 384, 512, 768], mid_channels=[768, 512],
              down_sample=[True, True, True], attn_down=[True, True, True],
              time_emb_dim=512, norm_channels=32, num_heads=16, conv_out_channels=128,
              num_down_layers=2, num_mid_layers=2, num_up_layers=2)
B = 64

# 1. MNIST sampler
sched = make_linear_schedule(1000, 1e-4, 0.02)
unet = UNet(1, MP)
p = unet.init(jax.random.PRNGKey(0))
sampler = make_ddpm_sampler(lambda p, x, t: unet(p, x, t), sched, (B, 28, 28, 1),
                            record_every=1000)
jax.block_until_ready(sampler(p, jax.random.PRNGKey(1))[0])
t0 = time.time(); jax.block_until_ready(sampler(p, jax.random.PRNGKey(2))[0])
dt = time.time() - t0
print(json.dumps({"exp": "mnist_sampler", "samples_per_sec": round(B/dt, 2),
                  "ms_per_step": round(dt, 2)}), flush=True)

# 2. training steps
tx = optax.adam(1e-4)
images = jax.random.uniform(jax.random.PRNGKey(3), (B, 28, 28, 1), minval=-1, maxval=1)
hints = jnp.zeros((B, 28, 28, 3))
state = create_train_state(unet.init(jax.random.PRNGKey(0)), tx)
step = make_ddpm_train_step(lambda p, x, t: unet(p, x, t), sched, tx)
state, loss = step(state, images, jax.random.PRNGKey(1)); jax.block_until_ready(loss)
t0 = time.time()
for i in range(30):
    state, loss = step(state, images, jax.random.PRNGKey(i))
jax.block_until_ready(loss)
print(json.dumps({"exp": "ddpm_train", "img_per_sec": round(B/((time.time()-t0)/30), 1)}), flush=True)

cn = ControlNet(1, MP)
trainable, frozen = cn.split_params(cn.init(jax.random.PRNGKey(0)))
cstate = create_train_state(trainable, tx)
cstep = make_controlnet_train_step(cn, sched, tx)
cstate, loss = cstep(cstate, frozen, images, hints, jax.random.PRNGKey(1)); jax.block_until_ready(loss)
t0 = time.time()
for i in range(30):
    cstate, loss = cstep(cstate, frozen, images, hints, jax.random.PRNGKey(i))
jax.block_until_ready(loss)
print(json.dumps({"exp": "controlnet_train", "img_per_sec": round(B/((time.time()-t0)/30), 1)}), flush=True)

# 3. LDM ControlNet north-star sampling
lsched = make_linear_schedule(1000, 0.0015, 0.0195, ldm_scheduler=True)
lcn = ControlNet(4, LDM_MP, model_locked=True, down_sample_factor=32)
lp = lcn.init(jax.random.PRNGKey(0))
hint = jnp.zeros((4, 1024, 1024, 3))
feats = jax.jit(lcn.hint_features)(lp, hint)
lsampler = make_ddpm_sampler(lambda p, x, t, f: lcn(p, x, t, hint_features=f),
                             lsched, (4, 32, 32, 4), record_every=1000,
                             compute_dtype=jnp.bfloat16)
jax.block_until_ready(lsampler(lp, jax.random.PRNGKey(1), feats)[0])
t0 = time.time(); jax.block_until_ready(lsampler(lp, jax.random.PRNGKey(2), feats)[0])
dt = time.time() - t0
print(json.dumps({"exp": "ldm_controlnet_sampling", "samples_per_sec": round(4/dt, 3),
                  "ms_per_step": round(dt, 3)}), flush=True)
