"""Consistency model + consistency distillation of the DDPM ControlNet.

Parity with reference models/consistency_controlnet_distilled.py:

* ``ConsistencyControlNet`` (:10-134): UNet student with EDM
  parameterization — c_skip/c_out/c_in/c_noise scalings (:45-74), boundary
  condition f(x, sigma<=sigma_min)=x (:81), hint encoder *without* zero-init
  final conv (:21-31 — deliberate difference from DMD, preserved), its own
  SiLU+Linear time projection (:35-38), output = c_skip*x + c_out*F_theta
  (:132).
* ``ConsistencyDistilled`` (:137-409): student + EMA teacher (tree-map EMA,
  decay 0.995) + optional frozen DDPM-ControlNet teacher; Karras rho=7 sigma
  ladder; sigma->timestep nearest-neighbor lookup against the teacher's
  alpha-bar schedule; consistency loss (EMA target at sigma_1 vs student at
  sigma_2, shared noise); distillation loss (alpha*recon + (1-alpha)*teacher
  MSE with progressive alpha); log-uniform sigma sampling; 1-step and
  multi-step generation.

One deliberate deviation: the reference's boundary condition checks
``torch.all(sigma <= sigma_min)`` globally (:81); here it is applied
per-sample via ``jnp.where`` (branchless, jittable) — identical whenever all
sigmas are on the same side of the boundary, and more correct otherwise.
"""

from __future__ import annotations

from typing import Any, Mapping

import jax
import jax.numpy as jnp

from controlnet_tpu.models.controlnet import ControlNet
from controlnet_tpu.models.unet import UNet
from controlnet_tpu.nn.layers import Conv2d, Linear, Sequential, get_time_embedding, silu
from controlnet_tpu.schedules.karras import (
    karras_sigmas,
    sample_log_uniform_sigmas,
    sigma_to_timestep,
)
from controlnet_tpu.schedules.linear import LinearSchedule, eps_to_x0, make_linear_schedule

Params = Any


class ConsistencyControlNet:
    def __init__(self, im_channels: int, model_config: Mapping[str, Any]):
        self.unet = UNet(im_channels, model_config)
        c0 = self.unet.down_channels[0]
        # NOTE: final conv deliberately NOT zero-init
        # (consistency_controlnet_distilled.py:21-31).
        self.hint_block = Sequential([
            Conv2d(model_config["hint_channels"], 64, 3), "silu",
            Conv2d(64, 128, 3), "silu",
            Conv2d(128, c0, 3), "silu",
            Conv2d(c0, c0, 1),
        ])
        self.t_emb_dim = model_config["time_emb_dim"]
        self.t_proj = Linear(self.t_emb_dim, self.t_emb_dim)  # SiLU -> Linear (:35-38)
        self.sigma_min = model_config.get("sigma_min", 0.002)
        self.sigma_max = model_config.get("sigma_max", 80.0)
        self.sigma_data = model_config.get("sigma_data", 0.5)

    # EDM scalings (:45-74)
    def c_skip(self, sigma):
        return self.sigma_data**2 / (sigma**2 + self.sigma_data**2)

    def c_out(self, sigma):
        return sigma * self.sigma_data / jnp.sqrt(sigma**2 + self.sigma_data**2)

    def c_in(self, sigma):
        return 1.0 / jnp.sqrt(sigma**2 + self.sigma_data**2)

    def c_noise(self, sigma):
        return 0.25 * jnp.log(jnp.clip(sigma, 1e-8, None))

    def init(self, key: jax.Array) -> Params:
        k1, k2, k3 = jax.random.split(key, 3)
        return {
            "unet": self.unet.init(k1),
            "hint_block": self.hint_block.init(k2),
            "t_proj": self.t_proj.init(k3),
        }

    def __call__(self, p: Params, x_t: jax.Array, sigma: jax.Array, hint: jax.Array) -> jax.Array:
        sigma = jnp.atleast_1d(jnp.asarray(sigma, jnp.float32))
        sig4 = sigma.reshape(-1, 1, 1, 1)

        x_scaled = self.c_in(sig4) * x_t

        # Noise-level conditioning through the sinusoidal table (:94-100).
        c_noise_val = self.c_noise(sigma)
        t_idx = jnp.clip((c_noise_val * 1000.0).astype(jnp.int32), 0, 999)
        t_emb = get_time_embedding(t_idx, self.t_emb_dim)
        t_emb = self.t_proj(p["t_proj"], silu(t_emb))

        hint_out = self.hint_block(p["hint_block"], hint)
        out = self.unet.stem(p["unet"], x_scaled) + hint_out
        out, down_outs = self.unet.encode(p["unet"], out, t_emb)
        for i in range(len(self.unet.mids)):
            out = self.unet.mid_stage(p["unet"], i, out, t_emb)
        f_theta = self.unet.decode(p["unet"], out, down_outs, t_emb)

        x0_pred = self.c_skip(sig4) * x_t + self.c_out(sig4) * f_theta
        # Boundary condition f(x, sigma<=sigma_min) = x (:81), per-sample.
        return jnp.where(sig4 <= self.sigma_min, x_t, x0_pred)


class ConsistencyDistilled:
    """Student + EMA teacher (+ optional frozen DDPM ControlNet teacher).

    Parameter tree: {"student": ..., "ema_teacher": ..., ["teacher": ...]}.
    Only ``student`` is optimized; ``ema_teacher`` is advanced with
    ``update_ema`` after each step; ``teacher`` is the frozen DDPM
    ControlNet tree.
    """

    def __init__(
        self,
        im_channels: int,
        model_config: Mapping[str, Any],
        use_ddpm_teacher: bool = True,
        num_timesteps: int = 1000,
        ema_decay: float = 0.995,
    ):
        self.student = ConsistencyControlNet(im_channels, model_config)
        self.use_ddpm_teacher = use_ddpm_teacher
        if use_ddpm_teacher:
            self.teacher = ControlNet(im_channels, model_config, model_locked=True)
            # Teacher schedule is the MNIST/CIFAR DDPM schedule
            # (consistency_controlnet_distilled.py:160-163).
            self.teacher_schedule: LinearSchedule = make_linear_schedule(num_timesteps, 0.0001, 0.02)
        self.sigma_min = model_config.get("sigma_min", 0.002)
        self.sigma_max = model_config.get("sigma_max", 80.0)
        self.num_timesteps = num_timesteps
        self.ema_decay = ema_decay

    def init(self, key: jax.Array, teacher_params: Params | None = None) -> Params:
        ks, kt = jax.random.split(key)
        student = self.student.init(ks)
        p = {"student": student, "ema_teacher": jax.tree.map(jnp.copy, student)}
        if self.use_ddpm_teacher:
            if teacher_params is None:
                teacher_params = self.teacher.init(kt)
            p["teacher"] = teacher_params
        return p

    # ------------------------------------------------------------------
    def update_ema(self, p: Params) -> Params:
        """EMA teacher <- decay*EMA + (1-decay)*student (:171-177)."""
        d = self.ema_decay
        new_ema = jax.tree.map(lambda e, s: d * e + (1.0 - d) * s, p["ema_teacher"], p["student"])
        return {**p, "ema_teacher": new_ema}

    def get_noise_schedule(self, num_steps: int) -> jax.Array:
        return karras_sigmas(num_steps, self.sigma_min, self.sigma_max, rho=7.0)

    def sample_sigmas(self, key: jax.Array, batch_size: int) -> jax.Array:
        return sample_log_uniform_sigmas(key, batch_size, self.sigma_min, self.sigma_max)

    def sigma_to_t(self, sigma: jax.Array) -> jax.Array:
        return sigma_to_timestep(sigma, self.teacher_schedule.alpha_cum_prod)

    def ddpm_teacher_prediction(self, p: Params, x_t, sigma, hint):
        """Frozen DDPM teacher eps-prediction converted to clamped x0
        (:201-228)."""
        tp = jax.lax.stop_gradient(p["teacher"])
        t = self.sigma_to_t(sigma)
        noise_pred = self.teacher(tp, x_t, t, hint)
        return eps_to_x0(self.teacher_schedule, x_t, noise_pred, t)

    # ------------------------------------------------------------------
    def consistency_training_loss(self, p: Params, x0, hint, sigma_1, sigma_2, key,
                                  compute_dtype=None, noise=None):
        """EMA target at the smaller sigma vs student at the larger, shared
        noise (:260-293).  ``compute_dtype`` runs the two network passes in
        reduced precision; noising and the MSE reduction stay f32.

        ``noise`` overrides the keyed draw with an explicit N(0,1) tensor —
        used by deterministic-replay harnesses (shared-RNG cross-stack
        controls) that must feed both frameworks identical draws."""
        s1 = jnp.minimum(sigma_1, sigma_2)
        s2 = jnp.maximum(sigma_1, sigma_2)
        if noise is None:
            noise = jax.random.normal(key, x0.shape, x0.dtype)
        cd = compute_dtype or x0.dtype
        x_s1 = (x0 + s1.reshape(-1, 1, 1, 1) * noise).astype(cd)
        x_s2 = (x0 + s2.reshape(-1, 1, 1, 1) * noise).astype(cd)
        hint_c = hint.astype(cd)
        target = jax.lax.stop_gradient(self.student(p["ema_teacher"], x_s1, s1, hint_c))
        pred = self.student(p["student"], x_s2, s2, hint_c)
        return jnp.mean((pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2)

    def distillation_loss(self, p: Params, x0, hint, sigma, key, alpha: float = 0.5,
                          epoch: int | None = None, total_epochs: int | None = None,
                          compute_dtype=None, noise=None):
        """alpha*MSE(student, x0) + (1-alpha)*MSE(student, teacher), with the
        progressive alpha ramp (:295-330). Returns (total, recon, distill).

        ``noise`` overrides the keyed draw (see consistency_training_loss)."""
        if noise is None:
            noise = jax.random.normal(key, x0.shape, x0.dtype)
        cd = compute_dtype or x0.dtype
        x_t = (x0 + sigma.reshape(-1, 1, 1, 1) * noise).astype(cd)
        hint_c = hint.astype(cd)
        x0_student = self.student(p["student"], x_t, sigma, hint_c).astype(jnp.float32)
        x0_teacher = self.ddpm_teacher_prediction(p, x_t, sigma, hint_c).astype(jnp.float32)
        recon = jnp.mean((x0_student - x0.astype(jnp.float32)) ** 2)
        distill = jnp.mean((x0_student - x0_teacher) ** 2)
        if epoch is not None and total_epochs is not None:
            progress = epoch / total_epochs
            alpha = max(alpha * (1 - progress) + 0.1 * progress, 0.1)
        total = alpha * recon + (1.0 - alpha) * distill
        return total, recon, distill

    # ------------------------------------------------------------------
    def generate(self, p: Params, hint, shape, key, num_steps: int = 1):
        """1-step (x_T at sigma_max -> x0) or multi-step consistency sampling
        (:375-409), entirely on device."""
        sp = p["student"]
        if num_steps == 1:
            x_t = jax.random.normal(key, shape)
            sigma = jnp.full((shape[0],), self.sigma_max, jnp.float32)
            return self.student(sp, x_t, sigma, hint)

        sigmas = self.get_noise_schedule(num_steps + 1)
        k0, key = jax.random.split(key)
        x = jax.random.normal(k0, shape)

        def body(i, carry):
            x, key = carry
            key, kn = jax.random.split(key)
            sigma = jnp.full((shape[0],), sigmas[i], jnp.float32)
            x0 = self.student(sp, x, sigma, hint)
            noise = jax.random.normal(kn, shape)
            x_next = jnp.where(i < num_steps - 1, x0 + sigmas[i + 1] * noise, x0)
            return (x_next, key)

        x, _ = jax.lax.fori_loop(0, num_steps, body, (x, key))
        return x
