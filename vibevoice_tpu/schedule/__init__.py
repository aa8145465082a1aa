from .dpm_solver import (
    DPMSolverConfig,
    DPMSolverSchedule,
    add_noise,
    get_velocity,
    make_alphas_cumprod,
    make_betas,
    make_schedule,
    sample_with_solver,
    solver_step,
)
from .timestep_sampler import logit_normal_sample, uniform_sample

__all__ = [
    "DPMSolverConfig",
    "DPMSolverSchedule",
    "add_noise",
    "get_velocity",
    "make_alphas_cumprod",
    "make_betas",
    "make_schedule",
    "sample_with_solver",
    "solver_step",
    "logit_normal_sample",
    "uniform_sample",
]
