"""DDIM sampler as a host-precomputed plan + pure step function.

The reference's scheduler slot is PNDM, but DDIM is the second sampler the stack supports
(the graft baseline configs reference "20-step DDIM", and `fashion_generation` forwards a
DDIM-style `eta` when the scheduler accepts it — `/root/reference/DiFashion/models/
difashion.py:659-674`). Same design as `pndm.py`: everything static lives in the plan,
the step is pure arithmetic, stochasticity (eta > 0) takes an explicit noise argument.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from difashion_tpu.diffusion.schedule import DiffusionSchedule, leading_timesteps


@dataclass(frozen=True)
class DDIMPlan:
    t_unet: np.ndarray      # [n] int32, descending
    alpha_t: np.ndarray     # [n] f32
    alpha_prev: np.ndarray  # [n] f32
    num_inference_steps: int
    prediction_type: str
    eta: float = 0.0
    clip_sample: bool = False  # SD config: clip_sample=False
    init_noise_sigma: float = 1.0

    def __len__(self) -> int:
        return int(self.t_unet.shape[0])

    def rows(self):
        return {
            "t_unet": jnp.asarray(self.t_unet, jnp.int32),
            "alpha_t": jnp.asarray(self.alpha_t),
            "alpha_prev": jnp.asarray(self.alpha_prev),
        }


def make_ddim_plan(sched: DiffusionSchedule, num_inference_steps: int,
                   eta: float = 0.0) -> DDIMPlan:
    T = sched.num_train_timesteps
    step_ratio = T // num_inference_steps
    seq = leading_timesteps(T, num_inference_steps, sched.steps_offset)[::-1].copy()
    acp = sched.alphas_cumprod

    def acp_at(t: int) -> float:
        return float(acp[t]) if t >= 0 else sched.final_alpha_cumprod

    alpha_t = np.array([acp_at(int(t)) for t in seq], np.float32)
    alpha_prev = np.array([acp_at(int(t) - step_ratio) for t in seq], np.float32)
    return DDIMPlan(
        t_unet=seq.astype(np.int32),
        alpha_t=alpha_t,
        alpha_prev=alpha_prev,
        num_inference_steps=num_inference_steps,
        prediction_type=sched.prediction_type,
        eta=eta,
    )


def ddim_step(row: dict, model_output: jnp.ndarray, sample: jnp.ndarray,
              eta: float = 0.0, noise: jnp.ndarray | None = None,
              prediction_type: str = "epsilon", clip_sample: bool = False):
    """One DDIM update x_t -> x_{t_prev}. Pure function; pass `noise` iff eta > 0."""
    a_t = row["alpha_t"].astype(sample.dtype)
    a_prev = row["alpha_prev"].astype(sample.dtype)
    b_t = 1.0 - a_t

    if prediction_type == "epsilon":
        x0 = (sample - jnp.sqrt(b_t) * model_output) / jnp.sqrt(a_t)
        eps = model_output
    elif prediction_type == "v_prediction":
        x0 = jnp.sqrt(a_t) * sample - jnp.sqrt(b_t) * model_output
        eps = jnp.sqrt(a_t) * model_output + jnp.sqrt(b_t) * sample
    else:
        raise ValueError(f"unknown prediction type {prediction_type!r}")

    if clip_sample:
        x0 = jnp.clip(x0, -1.0, 1.0)
        eps = (sample - jnp.sqrt(a_t) * x0) / jnp.sqrt(b_t)

    variance = ((1.0 - a_prev) / b_t) * (1.0 - a_t / a_prev)
    std = eta * jnp.sqrt(variance)

    direction = jnp.sqrt(1.0 - a_prev - std ** 2) * eps
    prev_sample = jnp.sqrt(a_prev) * x0 + direction
    if eta > 0.0:
        if noise is None:
            raise ValueError("eta > 0 requires an explicit noise array")
        prev_sample = prev_sample + std * noise
    return prev_sample
