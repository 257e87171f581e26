"""Training-step throughput on the real chip: DDPM + ControlNet (MNIST cfg)."""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, optax
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.expanduser("~"), ".cache", "controlnet_tpu_xla"))
from controlnet_tpu.models.unet import UNet
from controlnet_tpu.models.controlnet import ControlNet
from controlnet_tpu.schedules.linear import make_linear_schedule
from controlnet_tpu.train.loops import make_controlnet_train_step, make_ddpm_train_step
from controlnet_tpu.train.state import create_train_state

MP = dict(im_channels=1, im_size=28, hint_channels=3,
          down_channels=[32, 64, 128, 256], mid_channels=[256, 256, 128],
          down_sample=[True, True, False], time_emb_dim=128,
          num_down_layers=2, num_mid_layers=2, num_up_layers=2, num_heads=4)
B = 64
sched = make_linear_schedule(1000, 1e-4, 0.02)
key = jax.random.PRNGKey(0)
images = jax.random.uniform(key, (B, 28, 28, 1), minval=-1, maxval=1)
hints = jnp.zeros((B, 28, 28, 3))

def run(step, state, args, tag, iters=30):
    state, loss = step(state, *args, jax.random.PRNGKey(1))
    jax.block_until_ready(loss)
    t0 = time.time()
    for i in range(iters):
        state, loss = step(state, *args, jax.random.PRNGKey(i))
    jax.block_until_ready(loss)
    dt = (time.time() - t0) / iters
    print(json.dumps({"exp": tag, "ms_per_step": round(dt * 1e3, 2),
                      "images_per_sec": round(B / dt, 1)}), flush=True)

tx = optax.adam(1e-4)
unet = UNet(1, MP)
state = create_train_state(unet.init(jax.random.PRNGKey(0)), tx)
step = make_ddpm_train_step(lambda p, x, t: unet(p, x, t), sched, tx)
run(step, state, (images,), "ddpm_train_b64")

cn = ControlNet(1, MP)
trainable, frozen = cn.split_params(cn.init(jax.random.PRNGKey(0)))
cstate = create_train_state(trainable, tx)
cstep = make_controlnet_train_step(cn, sched, tx)

def cstep2(state, images, key):
    return cstep(state, frozen, images, hints, key)
run(cstep2, cstate, (images,), "controlnet_train_b64")
