"""Learning-dynamics smoke test: the jitted DDPM train step must actually
reduce the eps-prediction loss on a fixed tiny dataset — catches silent
gradient/optimizer wiring bugs that shape tests cannot."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from controlnet_tpu.models.unet import UNet
from controlnet_tpu.schedules.linear import make_linear_schedule
from controlnet_tpu.train.loops import make_ddpm_train_step
from controlnet_tpu.train.state import create_train_state


def test_ddpm_loss_decreases(tiny_model_config):
    sched = make_linear_schedule(16, 1e-4, 0.02)
    u = UNet(1, tiny_model_config)
    tx = optax.adam(2e-3)
    state = create_train_state(u.init(jax.random.PRNGKey(0)), tx)
    step = make_ddpm_train_step(lambda p, x, t: u(p, x, t), sched, tx)

    # fixed batch of structured images
    key = jax.random.PRNGKey(1)
    images = jnp.tile(jnp.linspace(-1, 1, 8)[None, :, None, None], (8, 1, 8, 1))

    losses = []
    for i in range(60):
        key, k = jax.random.split(key)
        state, loss = step(state, images, k)
        losses.append(float(loss))

    first = np.mean(losses[:10])
    last = np.mean(losses[-10:])
    assert last < 0.7 * first, f"loss did not decrease: {first:.4f} -> {last:.4f}"
    assert all(np.isfinite(l) for l in losses)
