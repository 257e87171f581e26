"""Distribution-matching distillation (DMD-style) of the DDPM ControlNet.

Parity with reference models/distribution_matching_controlnet.py:

* ``FeatureExtractor`` (:16-86): frozen 4-stage conv pyramid
  (conv-BN-ReLU x2 per stage, stride-2 between stages), Kaiming-normal
  init, 32 base channels for grayscale / 64 for RGB.
* ``DistributionMatchingControlNet`` (:89-159): UNet student predicting x0
  directly, zero-init hint encoder (:101-111 — unlike the consistency
  student), own SiLU+Linear time projection.
* ``DistributionMatchingDistilled`` (:162-357): frozen ControlNet teacher
  (eps -> clamped x0), feature-moment matching (mean/var + 0.1*skew),
  sorted-pixel Wasserstein-1 approximation, Gram-matrix loss, combined
  weights 1.0/0.5/0.3/0.1, total = alpha*teacher_MSE + (1-alpha)*dmd with
  alpha=0.3.
"""

from __future__ import annotations

import math
from typing import Any, Mapping

import jax
import jax.numpy as jnp

from controlnet_tpu.models.controlnet import ControlNet
from controlnet_tpu.models.unet import UNet
from controlnet_tpu.nn.layers import (
    BatchNorm,
    Conv2d,
    Linear,
    Sequential,
    get_time_embedding,
    silu,
)
from controlnet_tpu.schedules.linear import LinearSchedule, eps_to_x0, make_linear_schedule

Params = Any


def _kaiming_conv_init(key, in_ch, out_ch, k):
    """Kaiming-normal (fan_out, relu) like the reference feature extractor
    (:70-76)."""
    fan_out = out_ch * k * k
    std = math.sqrt(2.0 / fan_out)
    return {
        "w": jax.random.normal(key, (k, k, in_ch, out_ch), jnp.float32) * std,
        "b": jnp.zeros((out_ch,), jnp.float32),
    }


class FeatureExtractor:
    """Frozen multi-scale conv feature pyramid; returns 4 feature maps."""

    def __init__(self, in_channels: int = 1):
        base = 32 if in_channels == 1 else 64
        self.base = base
        chans = [
            (in_channels, base, 1),
            (base, base * 2, 2),
            (base * 2, base * 4, 2),
            (base * 4, base * 8, 2),
        ]
        self.stages = []
        for cin, cout, stride in chans:
            self.stages.append([
                Conv2d(cin, cout, 3, stride=stride, padding=1),
                BatchNorm(cout),
                Conv2d(cout, cout, 3),
                BatchNorm(cout),
            ])

    def init(self, key: jax.Array) -> Params:
        params = []
        for stage in self.stages:
            ks = jax.random.split(key, 3)
            key = ks[0]
            conv1, bn1, conv2, bn2 = stage
            params.append({
                "conv1": _kaiming_conv_init(ks[1], conv1.in_ch, conv1.out_ch, 3),
                "bn1": bn1.init(key),
                "conv2": _kaiming_conv_init(ks[2], conv2.in_ch, conv2.out_ch, 3),
                "bn2": bn2.init(key),
            })
        return {"stages": params}

    def __call__(self, p: Params, x: jax.Array) -> list[jax.Array]:
        feats = []
        out = x
        for stage, sp in zip(self.stages, p["stages"]):
            conv1, bn1, conv2, bn2 = stage
            out = jax.nn.relu(bn1(sp["bn1"], conv1(sp["conv1"], out)))
            out = jax.nn.relu(bn2(sp["bn2"], conv2(sp["conv2"], out)))
            feats.append(out)
        return feats


class DistributionMatchingControlNet:
    """x0-predicting student with zero-init hint encoder (:89-159)."""

    def __init__(self, im_channels: int, model_config: Mapping[str, Any]):
        self.unet = UNet(im_channels, model_config)
        c0 = self.unet.down_channels[0]
        self.hint_block = Sequential([
            Conv2d(model_config["hint_channels"], 64, 3), "silu",
            Conv2d(64, 128, 3), "silu",
            Conv2d(128, c0, 3), "silu",
            Conv2d(c0, c0, 1, zero_init=True),
        ])
        self.t_emb_dim = model_config["time_emb_dim"]
        self.t_proj = Linear(self.t_emb_dim, self.t_emb_dim)

    def init(self, key: jax.Array) -> Params:
        k1, k2, k3 = jax.random.split(key, 3)
        return {
            "unet": self.unet.init(k1),
            "hint_block": self.hint_block.init(k2),
            "t_proj": self.t_proj.init(k3),
        }

    def __call__(self, p: Params, x_t: jax.Array, t: jax.Array, hint: jax.Array) -> jax.Array:
        t_emb = get_time_embedding(jnp.asarray(t, jnp.int32), self.t_emb_dim)
        t_emb = self.t_proj(p["t_proj"], silu(t_emb))
        hint_out = self.hint_block(p["hint_block"], hint)
        out = self.unet.stem(p["unet"], x_t) + hint_out
        out, down_outs = self.unet.encode(p["unet"], out, t_emb)
        for i in range(len(self.unet.mids)):
            out = self.unet.mid_stage(p["unet"], i, out, t_emb)
        return self.unet.decode(p["unet"], out, down_outs, t_emb)


class DistributionMatchingDistilled:
    """Student + frozen ControlNet teacher + frozen feature extractor.

    Parameter tree: {"student": ..., "teacher": ..., "features": ...}.
    Only ``student`` is optimized.
    """

    def __init__(self, im_channels: int, model_config: Mapping[str, Any], num_timesteps: int = 1000):
        self.student = DistributionMatchingControlNet(im_channels, model_config)
        self.teacher = ControlNet(im_channels, model_config, model_locked=True)
        self.feature_extractor = FeatureExtractor(in_channels=im_channels)
        self.teacher_schedule: LinearSchedule = make_linear_schedule(num_timesteps, 0.0001, 0.02)

    def init(self, key: jax.Array, teacher_params: Params | None = None) -> Params:
        k1, k2, k3 = jax.random.split(key, 3)
        if teacher_params is None:
            teacher_params = self.teacher.init(k2)
        return {
            "student": self.student.init(k1),
            "teacher": teacher_params,
            "features": self.feature_extractor.init(k3),
        }

    # ------------------------------------------------------------------
    def teacher_prediction(self, p: Params, x_t, t, hint):
        """Frozen teacher eps -> clamped x0 (:191-216)."""
        tp = jax.lax.stop_gradient(p["teacher"])
        noise_pred = self.teacher(tp, x_t, t, hint)
        return eps_to_x0(self.teacher_schedule, x_t, noise_pred, t)

    @staticmethod
    def feature_distribution_matching_loss(pred_features, target_features):
        """Batch moment matching per feature level: mean + var + 0.1*skew
        (:218-254)."""
        total = 0.0
        for pf, tf in zip(pred_features, target_features):
            pflat = pf.reshape(pf.shape[0], -1)
            tflat = tf.reshape(tf.shape[0], -1)
            p_mean, t_mean = pflat.mean(axis=0), tflat.mean(axis=0)
            mean_loss = jnp.mean((p_mean - t_mean) ** 2)
            p_var = pflat.var(axis=0)
            t_var = tflat.var(axis=0)
            var_loss = jnp.mean((p_var - t_var) ** 2)
            p_skew = ((pflat - p_mean) ** 3).mean(axis=0)
            t_skew = ((tflat - t_mean) ** 3).mean(axis=0)
            skew_loss = jnp.mean((p_skew - t_skew) ** 2)
            total = total + mean_loss + var_loss + 0.1 * skew_loss
        return total / len(pred_features)

    @staticmethod
    def wasserstein_distance_loss(pred, target):
        """Sorted-pixel L1 (Wasserstein-1 approximation) (:256-271)."""
        p_sorted = jnp.sort(pred.reshape(pred.shape[0], -1), axis=1)
        t_sorted = jnp.sort(target.reshape(target.shape[0], -1), axis=1)
        return jnp.mean(jnp.abs(p_sorted - t_sorted))

    @staticmethod
    def gram_matrix_loss(pred_features, target_features):
        """Gram-matrix (channel covariance) matching (:273-298).  Features
        are NHWC; gram over channels."""
        total = 0.0
        for pf, tf in zip(pred_features, target_features):
            b, h, w, c = pf.shape
            pr = pf.reshape(b, h * w, c)
            tr = tf.reshape(b, h * w, c)
            p_gram = jnp.einsum("blc,bld->bcd", pr, pr) / (c * h * w)
            t_gram = jnp.einsum("blc,bld->bcd", tr, tr) / (c * h * w)
            total = total + jnp.mean((p_gram - t_gram) ** 2)
        return total / len(pred_features)

    def true_distribution_matching_loss(self, p: Params, x0_pred, x0_target):
        """1.0*feature moments + 0.5*wasserstein + 0.3*gram + 0.1*pixel MSE
        (:300-337). Returns (total, components dict)."""
        fp = jax.lax.stop_gradient(p["features"])
        x0_pred = jnp.clip(x0_pred, -1.0, 1.0)
        x0_target = jnp.clip(x0_target, -1.0, 1.0)
        pred_feats = self.feature_extractor(fp, x0_pred)
        target_feats = self.feature_extractor(fp, x0_target)
        feature_dist = self.feature_distribution_matching_loss(pred_feats, target_feats)
        wasserstein = self.wasserstein_distance_loss(x0_pred, x0_target)
        gram = self.gram_matrix_loss(pred_feats, target_feats)
        pixel = jnp.mean((x0_pred - x0_target) ** 2)
        total = 1.0 * feature_dist + 0.5 * wasserstein + 0.3 * gram + 0.1 * pixel
        return total, {
            "feature_dist": feature_dist,
            "wasserstein": wasserstein,
            "gram": gram,
            "pixel": pixel,
        }

    def distillation_loss(self, p: Params, x_t, t, hint, x0_target, alpha: float = 0.3,
                          compute_dtype=None):
        """total = alpha*teacher_MSE + (1-alpha)*dmd (:339-357).
        Returns (total, dmd_loss, teacher_loss, components).
        ``compute_dtype`` runs student/teacher networks in reduced precision;
        all loss reductions stay f32 (predictions cast back at the
        boundary)."""
        cd = compute_dtype or x_t.dtype
        x_tc, hint_c = x_t.astype(cd), hint.astype(cd)
        x0_student = self.student(p["student"], x_tc, t, hint_c).astype(jnp.float32)
        x0_teacher = self.teacher_prediction(p, x_tc, t, hint_c).astype(jnp.float32)
        dmd_loss, components = self.true_distribution_matching_loss(p, x0_student, x0_target)
        teacher_loss = jnp.mean((x0_student - x0_teacher) ** 2)
        total = alpha * teacher_loss + (1.0 - alpha) * dmd_loss
        return total, dmd_loss, teacher_loss, components
