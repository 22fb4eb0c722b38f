"""Noise schedules and closed-form diffusion quantities as pure functions.

TPU-native replacement for the stateful diffusers `PNDMScheduler` surface the reference
uses for training (`/root/reference/DiFashion/models/difashion.py:64,158,241-247,635-657`):
`add_noise`, `get_velocity`, SNR, and the beta schedule, all as jit-friendly array math.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from difashion_tpu.core.config import SchedulerConfig


def make_betas(cfg: SchedulerConfig) -> np.ndarray:
    """Beta schedule. SD uses 'scaled_linear': linspace in sqrt-space then squared."""
    if cfg.beta_schedule == "scaled_linear":
        betas = (
            np.linspace(
                cfg.beta_start ** 0.5,
                cfg.beta_end ** 0.5,
                cfg.num_train_timesteps,
                dtype=np.float64,
            )
            ** 2
        )
    elif cfg.beta_schedule == "linear":
        betas = np.linspace(
            cfg.beta_start, cfg.beta_end, cfg.num_train_timesteps, dtype=np.float64
        )
    elif cfg.beta_schedule == "squaredcos_cap_v2":
        t = np.arange(cfg.num_train_timesteps, dtype=np.float64)
        f = lambda s: np.cos((s / cfg.num_train_timesteps + 0.008) / 1.008 * np.pi / 2) ** 2
        betas = np.clip(1.0 - f(t + 1) / f(t), 0.0, 0.999)
    else:
        raise ValueError(f"unknown beta schedule {cfg.beta_schedule!r}")
    return betas.astype(np.float32)


@dataclass(frozen=True)
class DiffusionSchedule:
    """Precomputed schedule tables (host numpy; become constants under jit)."""

    betas: np.ndarray
    alphas: np.ndarray
    alphas_cumprod: np.ndarray
    num_train_timesteps: int
    prediction_type: str
    steps_offset: int
    final_alpha_cumprod: float  # set_alpha_to_one=False -> alphas_cumprod[0]

    @staticmethod
    def create(cfg: SchedulerConfig) -> "DiffusionSchedule":
        betas = make_betas(cfg)
        alphas = 1.0 - betas
        acp = np.cumprod(alphas).astype(np.float32)
        final = 1.0 if cfg.set_alpha_to_one else float(acp[0])
        return DiffusionSchedule(
            betas=betas,
            alphas=alphas,
            alphas_cumprod=acp,
            num_train_timesteps=cfg.num_train_timesteps,
            prediction_type=cfg.prediction_type,
            steps_offset=cfg.steps_offset,
            final_alpha_cumprod=final,
        )

    # ---- training-side quantities -------------------------------------------

    def add_noise(self, latents, noise, timesteps):
        """q(x_t | x_0): sqrt(acp_t) x0 + sqrt(1-acp_t) eps.

        Matches scheduler.add_noise at `difashion.py:158`. `timesteps` indexes the
        trailing batch dim; broadcast over spatial/channel dims.
        """
        acp = jnp.asarray(self.alphas_cumprod)[timesteps]
        shape = (timesteps.shape[0],) + (1,) * (latents.ndim - 1)
        sqrt_acp = jnp.sqrt(acp).reshape(shape)
        sqrt_1macp = jnp.sqrt(1.0 - acp).reshape(shape)
        return sqrt_acp * latents + sqrt_1macp * noise

    def get_velocity(self, latents, noise, timesteps):
        """v-prediction target (arXiv:2202.00512 p.5; reference `difashion.py:244`)."""
        acp = jnp.asarray(self.alphas_cumprod)[timesteps]
        shape = (timesteps.shape[0],) + (1,) * (latents.ndim - 1)
        sqrt_acp = jnp.sqrt(acp).reshape(shape)
        sqrt_1macp = jnp.sqrt(1.0 - acp).reshape(shape)
        return sqrt_acp * noise - sqrt_1macp * latents

    def snr(self, timesteps):
        """Signal-to-noise ratio per timestep (reference `difashion.py:635-657`)."""
        acp = jnp.asarray(self.alphas_cumprod)[timesteps]
        return acp / (1.0 - acp)

    def min_snr_weights(self, timesteps, gamma: float, prediction_type: str = "epsilon"):
        """min-SNR-gamma MSE loss weights (reference `difashion.py:258-264`):
        min(snr, gamma)/snr for epsilon prediction."""
        snr = self.snr(timesteps)
        w = jnp.minimum(snr, gamma) / snr
        if prediction_type == "v_prediction":
            # standard min-SNR for v-pred: min(snr, gamma)/(snr+1); the reference only
            # implements the epsilon form, so keep that the default.
            w = jnp.minimum(snr, gamma) / (snr + 1.0)
        return w

    def pred_original_from_epsilon(self, timesteps, noisy, epsilon, clip: bool = True):
        """x0-hat = (x_t - sqrt(1-acp_t) eps)/sqrt(acp_t), clamped to [-1,1]
        (reference `difashion.py:269-275`)."""
        acp = jnp.asarray(self.alphas_cumprod)[timesteps]
        shape = (jnp.shape(timesteps)[0] if jnp.ndim(timesteps) else 1,) + (1,) * (
            noisy.ndim - 1
        )
        acp = acp.reshape(shape)
        x0 = (noisy - jnp.sqrt(1.0 - acp) * epsilon) / jnp.sqrt(acp)
        if clip:
            x0 = jnp.clip(x0, -1.0, 1.0)
        return x0


def leading_timesteps(num_train_timesteps: int, num_inference_steps: int,
                      steps_offset: int) -> np.ndarray:
    """'leading' timestep spacing used by SD PNDM/DDIM:
    (arange(n) * (T//n)).round() + steps_offset, ascending."""
    step_ratio = num_train_timesteps // num_inference_steps
    ts = (np.arange(0, num_inference_steps) * step_ratio).round().astype(np.int64)
    return ts + steps_offset
