"""controlnet_tpu — a TPU-native (JAX/XLA/Pallas/pjit) ControlNet distillation framework.

A from-scratch rebuild of the capabilities of henriChevreux/ControlNet-PyTorch
(reference mounted at /root/reference), designed TPU-first:

* NHWC layouts, bf16-friendly compute, MXU-sized matmuls/convs.
* The full denoising loop runs on-device (``lax.scan``/``fori_loop``) — no
  per-step host round-trips (unlike reference tools/sample_ddpm.py:27-42).
* Models are pure functions over parameter pytrees: frozen/trainable splits
  (ControlNet), EMA teachers, and two-optimizer GAN training are all plain
  tree operations.
* Data parallel scaling via ``jax.sharding.Mesh`` + NamedSharding (see
  ``controlnet_tpu.parallel``); collectives ride ICI.
* Pallas kernels for the hot ops live in ``controlnet_tpu.ops``.

Capability map (reference file -> here):
  scheduler/linear_noise_scheduler.py  -> schedules/linear.py
  scheduler/consistency_scheduler.py   -> schedules/karras.py
  models/blocks.py + unet_base.py      -> nn/blocks.py (one parameterized library)
  models/unet_base.py + unet_cond_base.py -> models/unet.py (one UNet)
  models/controlnet.py                 -> models/controlnet.py
  models/controlnet_ldm.py             -> models/controlnet.py (dynamic hint encoder)
  models/vae.py                        -> models/vae.py
  models/lpips.py                      -> models/lpips.py
  models/discriminator.py              -> models/discriminator.py
  models/consistency_controlnet_distilled.py -> models/consistency.py
  models/distribution_matching_controlnet.py -> models/dmd.py
  dataset/*                            -> data/*
  utils/*                              -> utils/*
  tools/*                              -> tools/* (same CLI names and flags)
"""

__version__ = "0.1.0"
