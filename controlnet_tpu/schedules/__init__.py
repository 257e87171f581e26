from controlnet_tpu.schedules.linear import (
    LinearSchedule,
    make_linear_schedule,
    add_noise,
    sample_prev_timestep,
    eps_to_x0,
)
from controlnet_tpu.schedules.karras import (
    geometric_sigmas,
    karras_sigmas,
    sigma_to_timestep,
    sample_log_uniform_sigmas,
    sigma_add_noise,
)

__all__ = [
    "LinearSchedule",
    "make_linear_schedule",
    "add_noise",
    "sample_prev_timestep",
    "eps_to_x0",
    "geometric_sigmas",
    "karras_sigmas",
    "sigma_to_timestep",
    "sample_log_uniform_sigmas",
    "sigma_add_noise",
]
