from difashion_tpu.diffusion.schedule import (
    DiffusionSchedule,
    leading_timesteps,
    make_betas,
)
from difashion_tpu.diffusion.pndm import (
    PNDMPlan,
    PNDMState,
    make_pndm_plan,
    pndm_init_state,
    pndm_step,
)
from difashion_tpu.diffusion.ddim import DDIMPlan, ddim_step, make_ddim_plan
from difashion_tpu.diffusion.dpmpp import (
    DPMppPlan,
    DPMppState,
    dpmpp_init_state,
    dpmpp_step,
    make_dpmpp_plan,
)

__all__ = [
    "DPMppPlan",
    "DPMppState",
    "dpmpp_init_state",
    "dpmpp_step",
    "make_dpmpp_plan",
    "DiffusionSchedule",
    "leading_timesteps",
    "make_betas",
    "PNDMPlan",
    "PNDMState",
    "make_pndm_plan",
    "pndm_init_state",
    "pndm_step",
    "DDIMPlan",
    "ddim_step",
    "make_ddim_plan",
]
