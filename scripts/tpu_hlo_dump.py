import os, sys, re, collections
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from controlnet_tpu.models.unet import UNet
MP = dict(im_channels=1, im_size=28, hint_channels=3,
          down_channels=[32, 64, 128, 256], mid_channels=[256, 256, 128],
          down_sample=[True, True, False], time_emb_dim=128,
          num_down_layers=2, num_mid_layers=2, num_up_layers=2, num_heads=4)
B = 64
unet = UNet(1, MP)
p = unet.init(jax.random.PRNGKey(0))
x = jnp.zeros((B, 28, 28, 1)); t = jnp.zeros((B,), jnp.int32)
comp = jax.jit(lambda p, x, t: unet(p, x, t)).lower(p, x, t).compile()
txt = comp.as_text()
open("/tmp/unet_tpu_hlo.txt", "w").write(txt)
print("HLO chars:", len(txt))
kinds = collections.Counter(re.findall(r" = \S+ (\w+)\(", txt))
print("top ops:", kinds.most_common(15))
try:
    ca = comp.cost_analysis()
    print("flops:", ca.get("flops"), "bytes:", ca.get("bytes accessed"))
except Exception as e:
    print("cost_analysis err", e)
# memory analysis
try:
    ma = comp.memory_analysis()
    print("memory:", ma)
except Exception as e:
    print("mem err", e)
