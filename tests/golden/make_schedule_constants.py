"""Generate tests/golden/schedule_constants.npz — the PINNED schedule constants the
golden-parity oracles use instead of recomputing via production code (VERDICT r2 #8:
a bug in the production beta schedule or timestep grid must not be common-mode
invisible to the whole-loop tests).

Derivation is INDEPENDENT of difashion_tpu: the published SD2-base PNDMScheduler
config (num_train_timesteps=1000, beta_start=0.00085, beta_end=0.012,
beta_schedule="scaled_linear", steps_offset=1, set_alpha_to_one=False — reference
`/root/reference/DiFashion/models/difashion.py:64` loads exactly this from the hub)
and the published formulas:

  scaled_linear:  betas = linspace(sqrt(b0), sqrt(b1), T)^2            (fp64)
  alphas_cumprod = cumprod(1 - betas)
  leading grid:   t_k = round(k * (T // n)) + steps_offset, k = 0..n-1 (ascending)

Run once: `python tests/golden/make_schedule_constants.py` (idempotent).
"""
import os

import numpy as np

T = 1000
BETA_START = 0.00085
BETA_END = 0.012
STEPS_OFFSET = 1

betas = np.linspace(BETA_START ** 0.5, BETA_END ** 0.5, T, dtype=np.float64) ** 2
alphas_cumprod = np.cumprod(1.0 - betas)
final_alpha_cumprod = alphas_cumprod[0]  # set_alpha_to_one=False

grids = {}
for n in (5, 8, 12, 20, 50):
    ratio = T // n
    grids[f"leading_{n}"] = (
        (np.arange(n) * ratio).round().astype(np.int64) + STEPS_OFFSET
    )
    grids[f"linspace_{n}"] = np.linspace(0, T - 1, n).round().astype(np.int64)

out = os.path.join(os.path.dirname(__file__), "schedule_constants.npz")
np.savez(
    out,
    betas=betas,
    alphas_cumprod=alphas_cumprod,
    final_alpha_cumprod=np.float64(final_alpha_cumprod),
    num_train_timesteps=np.int64(T),
    steps_offset=np.int64(STEPS_OFFSET),
    **grids,
)
print(f"wrote {out}")
print("acp[0] =", alphas_cumprod[0], " acp[-1] =", alphas_cumprod[-1])
print("leading_50[:5] =", grids["leading_50"][:5])
