from controlnet_tpu.sample.ddpm import make_ddpm_sampler, make_ldm_sampler

__all__ = ["make_ddpm_sampler", "make_ldm_sampler"]
