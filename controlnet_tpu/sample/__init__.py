from controlnet_tpu.sample.ddim import ddim_timesteps, make_ddim_sampler
from controlnet_tpu.sample.ddpm import make_ddpm_sampler, make_ldm_sampler
from controlnet_tpu.sample.dpm import make_dpm_sampler


def make_few_step_sampler(kind, eps_fn, sched, shape, num_steps, eta=0.0,
                          compute_dtype=None, mesh=None):
    """Few-step sampler factory shared by the sample tools: ``kind`` is the
    CLI ``--sampler`` value ("ddim" | "dpm").  Both samplers share the
    ``sampler(params, key[, hint]) -> (x0, traj)`` contract and expose the
    visited timestep ladder as ``sampler.timesteps``."""
    if kind == "ddim":
        return make_ddim_sampler(eps_fn, sched, shape, num_steps=num_steps,
                                 eta=eta, compute_dtype=compute_dtype, mesh=mesh)
    if kind == "dpm":
        if eta:  # fail fast: the ODE solver is deterministic by construction
            raise ValueError("--eta is a DDIM knob; the dpm solver is "
                             "deterministic (eta must be 0)")
        return make_dpm_sampler(eps_fn, sched, shape, num_steps=num_steps,
                                compute_dtype=compute_dtype, mesh=mesh)
    raise ValueError(f"unknown few-step sampler {kind!r} (ddim | dpm)")


__all__ = ["ddim_timesteps", "make_ddim_sampler", "make_ddpm_sampler",
           "make_dpm_sampler", "make_few_step_sampler", "make_ldm_sampler"]
