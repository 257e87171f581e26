from controlnet_tpu.sample.ddim import ddim_timesteps, make_ddim_sampler
from controlnet_tpu.sample.ddpm import make_ddpm_sampler, make_ldm_sampler

__all__ = ["ddim_timesteps", "make_ddim_sampler", "make_ddpm_sampler", "make_ldm_sampler"]
