import os, sys, glob, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.expanduser("~"), ".cache", "controlnet_tpu_xla"))
from controlnet_tpu.models.unet import UNet
MP = dict(im_channels=1, im_size=28, hint_channels=3,
          down_channels=[32, 64, 128, 256], mid_channels=[256, 256, 128],
          down_sample=[True, True, False], time_emb_dim=128,
          num_down_layers=2, num_mid_layers=2, num_up_layers=2, num_heads=4)
B = 64
unet = UNet(1, MP)
p = unet.init(jax.random.PRNGKey(0))
x = jax.random.normal(jax.random.PRNGKey(1), (B, 28, 28, 1))
t = jnp.zeros((B,), jnp.int32)
fwd = jax.jit(lambda p, x, t: unet(p, x, t))
jax.block_until_ready(fwd(p, x, t))
logdir = "/tmp/tpu_trace"
jax.profiler.start_trace(logdir)
for i in range(5):
    out = fwd(p, x, t)
jax.block_until_ready(out)
jax.profiler.stop_trace()
print("trace files:", glob.glob(logdir + "/**/*", recursive=True)[-5:])
