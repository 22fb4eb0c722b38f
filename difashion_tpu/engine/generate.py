"""Generation engine: the whole denoising loop as ONE jitted `lax.scan`.

This replaces the reference's Python-side sampling loop (`/root/reference/DiFashion/models/
difashion.py:456-571`), which per step builds CFG stacks with `torch.cat`, assembles the
mutual condition with Python loops over dynamic `fill_idx`/`gen_masks` and negative-index
pointer tricks (`:474-512`), and calls a stateful scheduler. Here:

  * CFG branches and fill slots are batch dims of a single UNet call per step
    ([n_branches * n_fill, h, w, C] — on TPU this is one big MXU-friendly batch).
  * The mutual condition is a masked dense gather: with `source[b, j]` = clean catalog
    latent for known slots or the current denoised latent for generated slots,
    `mutual_in[k] = sum_j source[outfit_k, j] - source[outfit_k, slot_k]` — the
    reference's unnormalized sum over co-items (`difashion.py:478-487`; note training
    uses the *mean*, generation the *sum*: weights are 1 with own slot zeroed).
  * The scheduler is the plan+carry PNDM/DDIM of `difashion_tpu.diffusion`.

The 4-branch guidance combine (`difashion.py:525-532`) and every degenerate 1/2/3-branch
form (`:533-566`) are encoded in a `GuidanceSpec` table built by `make_guidance_spec`.
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from difashion_tpu.diffusion import (
    ddim_step,
    dpmpp_init_state,
    dpmpp_step,
    make_ddim_plan,
    make_dpmpp_plan,
    make_pndm_plan,
    pndm_init_state,
    pndm_step,
)
from difashion_tpu.models.difashion import DiFashionModel


@dataclass(frozen=True)
class GuidanceSpec:
    """Per-branch condition selectors + combine weights.

    sel arrays: 1.0 = real condition, 0.0 = null condition. Branch order matches the
    reference's chunk order (e.g. full CFG: [allcond, cate_mutual, cate, uncond],
    `difashion.py:526`).
    """

    hist_sel: np.ndarray    # [nb]
    mutual_sel: np.ndarray  # [nb]
    text_sel: np.ndarray    # [nb]
    weights: np.ndarray     # [nb] combine coefficients (sum to 1)

    @property
    def num_branches(self) -> int:
        return int(self.hist_sel.shape[0])


def make_guidance_spec(
    category_scale: float,
    hist_scale: float,
    mutual_scale: float,
    use_history: bool = True,
    use_mutual: bool = True,
) -> GuidanceSpec:
    """Reproduce the reference's CFG mode selection exactly.

    Mode flags (`difashion.py:309-325`): a condition gets its own CFG branch only when
    its feature is enabled AND its scale > 1. When a condition is enabled but NOT CFG'd,
    its *real* value is fed to every branch (e.g. `difashion.py:396,502`); when the
    feature is disabled, the null value is fed everywhere.
    """
    H = use_history and hist_scale > 1.0
    M = use_mutual and mutual_scale > 1.0
    C = category_scale > 1.0
    # base (non-CFG) values: real if the feature is on, else null
    h = 1.0 if use_history else 0.0
    m = 1.0 if use_mutual else 0.0
    cs, hs, ms = category_scale, hist_scale, mutual_scale

    if C and H and M:           # full 4-branch (difashion.py:408-411,494-496,525-532)
        hist = [h, 0, 0, 0]
        mut = [m, m, 0, 0]
        txt = [1, 1, 1, 0]
        w = [hs, ms - hs, cs - ms, 1 - cs]
    elif C and H and not M:     # (:392-394,502,534-540)
        hist = [h, 0, 0]
        mut = [m, m, m]
        txt = [1, 1, 0]
        w = [hs, cs - hs, 1 - cs]
    elif C and M and not H:     # (:396,498-500,541-547)
        hist = [h, h, h]
        mut = [m, 0, 0]
        txt = [1, 1, 0]
        w = [ms, cs - ms, 1 - cs]
    elif C:                     # category only (:398,504,548-553)
        hist = [h, h]
        mut = [m, m]
        txt = [1, 0]
        w = [cs, 1 - cs]
    elif H:                     # hist branch leads; covers !C&H&M quirk (:400-402,506-510,555-560)
        hist = [h, 0]
        mut = [m, 0] if M else [m, m]
        txt = [1, 1]
        w = [hs, 1 - hs]
    elif M:                     # (:403-404,506-508,561-566)
        hist = [h, h]
        mut = [m, 0]
        txt = [1, 1]
        w = [ms, 1 - ms]
    else:                       # no guidance at all
        hist, mut, txt, w = [h], [m], [1], [1.0]

    return GuidanceSpec(
        hist_sel=np.asarray(hist, np.float32),
        mutual_sel=np.asarray(mut, np.float32),
        text_sel=np.asarray(txt, np.float32),
        weights=np.asarray(w, np.float32),
    )


def mutual_condition_input(latents, outfit_idx, known_latents, gen_mask, gen_index):
    """Dense mutual-condition assembly (replaces the reference's Python loop with
    negative-index pointers, difashion.py:474-487).

    source[b, j] = current latent if slot (b, j) is being generated else the clean
    catalog latent; returns, for each fill slot k,
    sum_{j != slot_k} source[outfit_k, j] (generation uses the unnormalized sum).
    """
    cur = latents[gen_index]                                   # [B, olen, h, w, C]
    source = jnp.where(gen_mask[..., None, None, None], cur, known_latents)
    totals = jnp.sum(source, axis=1)                           # [B, h, w, C]
    return totals[outfit_idx] - latents                        # subtract own slot


class GenerationInputs(NamedTuple):
    """Dense, host-prepared inputs. F = number of slots to generate (fill slots);
    B = number of outfits; olen = 4. All arrays NHWC latents unless noted."""

    init_latents: jnp.ndarray    # [F, h, w, C]   N(0,1) * init_noise_sigma
    outfit_idx: jnp.ndarray      # [F] int32      which outfit each fill slot belongs to
    known_latents: jnp.ndarray   # [B, olen, h, w, C] clean catalog latents (mode * sf)
    gen_mask: jnp.ndarray        # [B, olen] bool  True where the slot is generated
    gen_index: jnp.ndarray       # [B, olen] int32 index into F for generated slots (0 elsewhere)
    hist_latents: jnp.ndarray    # [F, h, w, C]   per-fill history mean latent (or null)
    cate_text: jnp.ndarray       # [F, 77, D]     encoded category prompts
    null_text: jnp.ndarray       # [77, D]        encoded empty prompt
    null_latent: jnp.ndarray     # [h, w, C]      VAE latent of the white null image


def build_sampler(
    model: DiFashionModel,
    *,
    num_inference_steps: int,
    spec: GuidanceSpec,
    eta: float,
    scheduler: str = "pndm",
    ddim_eta: float = 0.0,
    return_trajectory: bool = False,
):
    """Return a pure function (params, inputs [, rng]) -> final latents [F, h, w, C],
    suitable for jit / sharding. The full loop is one lax.scan.

    With `return_trajectory=True` the function instead returns
    (final_latents, trajectory [L, F, h, w, C]) — the latents after every scheduler
    iteration — used by the whole-loop golden-parity tests."""
    sched = model.schedule
    if scheduler == "pndm":
        plan = make_pndm_plan(sched, num_inference_steps)
    elif scheduler == "ddim":
        plan = make_ddim_plan(sched, num_inference_steps, eta=ddim_eta)
    elif scheduler == "dpmpp":
        # beyond-reference fast-serving mode: ~50-step-PNDM quality at 15-25
        # steps (difashion_tpu.diffusion.dpmpp)
        plan = make_dpmpp_plan(sched, num_inference_steps)
    else:
        raise ValueError(f"unknown scheduler {scheduler!r}")
    rows = plan.rows()
    nb = spec.num_branches
    hist_sel = jnp.asarray(spec.hist_sel)[:, None, None, None, None]
    mut_sel = jnp.asarray(spec.mutual_sel)[:, None, None, None, None]
    text_sel = jnp.asarray(spec.text_sel)[:, None, None, None]
    weights = jnp.asarray(spec.weights)[:, None, None, None, None]
    pred_type = sched.prediction_type

    def sample(params, inputs: GenerationInputs, rng: Optional[jax.Array] = None):
        F = inputs.init_latents.shape[0]
        null_lat = inputs.null_latent[None]                       # [1, h, w, C]

        # Branch-constant tensors (built once, reused every step):
        hist_b = (
            hist_sel * inputs.hist_latents[None]
            + (1.0 - hist_sel) * null_lat[None]
        )                                                          # [nb, F, h, w, C]
        text_b = (
            text_sel * inputs.cate_text[None]
            + (1.0 - text_sel) * inputs.null_text[None, None]
        )                                                          # [nb, F, 77, D]
        text_flat = text_b.reshape((nb * F,) + text_b.shape[2:])
        hist_flat = hist_b.reshape((nb * F,) + hist_b.shape[2:])

        def unet_eps(latents, t, mutual):
            """One guided epsilon: batch branches x fills through the UNet once."""
            mut_b = mut_sel * mutual[None] + (1.0 - mut_sel) * null_lat[None]
            lat_b = jnp.broadcast_to(latents[None], (nb,) + latents.shape)
            x = (1.0 - eta) * lat_b + eta * mut_b                  # [nb, F, h, w, C]
            x = x.reshape((nb * F,) + x.shape[2:])
            x = jnp.concatenate([x, hist_flat], axis=-1)           # 8 channels
            t_rep = jnp.full((nb * F,), t, jnp.int32)
            eps = model.apply_unet(params, x, t_rep, text_flat)
            eps = eps.reshape((nb, F) + eps.shape[1:]).astype(jnp.float32)
            return jnp.sum(weights * eps, axis=0)                  # guidance combine

        def mutual_input(latents):
            return mutual_condition_input(
                latents, inputs.outfit_idx, inputs.known_latents,
                inputs.gen_mask, inputs.gen_index,
            )

        def body(carry, xs):
            row, step_noise = xs
            latents, state = carry
            mutual = model.apply_mutual(params, mutual_input(latents))
            mutual = mutual.astype(latents.dtype)
            eps = unet_eps(latents, row["t_unet"], mutual)
            if scheduler == "pndm":
                state, latents = pndm_step(
                    state, row, eps, latents, prediction_type=pred_type
                )
            elif scheduler == "dpmpp":
                state, latents = dpmpp_step(
                    state, row, eps, latents, prediction_type=pred_type
                )
            else:
                latents = ddim_step(
                    row, eps, latents, eta=ddim_eta,
                    noise=step_noise, prediction_type=pred_type,
                )
            return (latents, state), (latents if return_trajectory else None)

        L = len(plan)
        if scheduler == "ddim" and ddim_eta > 0.0:
            if rng is None:
                raise ValueError("ddim_eta > 0 requires an rng key")
            step_noise = jax.random.normal(
                rng, (L,) + inputs.init_latents.shape, jnp.float32
            )
        else:
            # zero-size per-step noise placeholder keeps the scan signature uniform
            step_noise = jnp.zeros((L,) + (0,), jnp.float32)

        if scheduler == "dpmpp":
            init_state = dpmpp_init_state(inputs.init_latents.shape)
        else:
            init_state = pndm_init_state(inputs.init_latents.shape)
        # DIFASHION_SCAN_UNROLL=k replicates the scan body k times per loop
        # iteration — numerics-identical, trades compile time/code size for less
        # loop bookkeeping (an A/B knob for the on-device e2e-vs-per-step gap;
        # measured results in BASELINE.md).
        unroll = int(os.environ.get("DIFASHION_SCAN_UNROLL", "1"))
        (latents, _), traj = jax.lax.scan(
            body,
            (inputs.init_latents.astype(jnp.float32), init_state),
            (rows, step_noise),
            unroll=unroll,
        )
        if return_trajectory:
            return latents, traj
        return latents

    return sample


def pad_generation_inputs(inputs: GenerationInputs, n: int) -> GenerationInputs:
    """Pad the fill (F) and outfit (B) leading axes up to multiples of `n` with
    inert rows (gen_mask False, zero latents/text, outfit_idx 0) so per-device
    shards are even — the TPU-native answer to ragged FITB fill counts (XLA
    wants static, evenly sharded leading axes; the reference instead runs a
    ragged Python batch loop, `/root/reference/DiFashion/inf4eval.py:521-524`).

    Inert rows never feed back into real slots: the mutual gather reads only
    slots addressed by gen_mask/gen_index of REAL outfits, and padded outfits
    have gen_mask all-False. Sampler output rows >= the original F are padding —
    callers slice them off (`latents[:F]`)."""
    F = int(inputs.init_latents.shape[0])
    B = int(inputs.gen_mask.shape[0])
    Fp = -(-F // n) * n
    Bp = -(-B // n) * n
    if Fp == F and Bp == B:
        return inputs

    def pad(x, new):
        old = x.shape[0]
        return jnp.pad(x, ((0, new - old),) + ((0, 0),) * (x.ndim - 1))

    return inputs._replace(
        init_latents=pad(inputs.init_latents, Fp),
        outfit_idx=pad(inputs.outfit_idx, Fp),
        hist_latents=pad(inputs.hist_latents, Fp),
        cate_text=pad(inputs.cate_text, Fp),
        known_latents=pad(inputs.known_latents, Bp),
        gen_mask=pad(inputs.gen_mask, Bp),
        gen_index=pad(inputs.gen_index, Bp),
    )


def shard_generation_inputs(inputs: GenerationInputs, mesh) -> GenerationInputs:
    """Place generation inputs for multi-chip DP sampling: per-fill arrays sharded on
    'dp' along their leading axis, per-outfit arrays likewise, broadcast conditions
    replicated. Outfits are contiguous in the fill list, so the mutual-condition
    gather stays shard-local for GOR and XLA inserts the (tiny) collectives for
    mixed FITB batches. Ragged fill/outfit counts are padded to a mesh multiple
    with inert rows (see pad_generation_inputs) — slice the sampler output back
    to the original F. Params should be replicated by the caller.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    inputs = pad_generation_inputs(inputs, mesh.shape["dp"])
    dp = NamedSharding(mesh, P("dp"))
    repl = NamedSharding(mesh, P())
    return GenerationInputs(
        init_latents=jax.device_put(inputs.init_latents, dp),
        outfit_idx=jax.device_put(inputs.outfit_idx, dp),
        known_latents=jax.device_put(inputs.known_latents, dp),
        gen_mask=jax.device_put(inputs.gen_mask, dp),
        gen_index=jax.device_put(inputs.gen_index, dp),
        hist_latents=jax.device_put(inputs.hist_latents, dp),
        cate_text=jax.device_put(inputs.cate_text, dp),
        null_text=jax.device_put(inputs.null_text, repl),
        null_latent=jax.device_put(inputs.null_latent, repl),
    )


def decode_and_postprocess(model: DiFashionModel, params, latents) -> jnp.ndarray:
    """VAE decode + denormalize to [0, 1] (reference `difashion.py:579-592`:
    `image_processor.postprocess(..., do_denormalize=True)`)."""
    imgs = model.decode_latents(params, latents)
    return jnp.clip(imgs.astype(jnp.float32) / 2.0 + 0.5, 0.0, 1.0)


def decode_to_uint8(model: DiFashionModel, params, latents) -> jnp.ndarray:
    """`decode_and_postprocess` + the uint8 quantization ON DEVICE (bit-identical
    formula to `data.preprocessing.denormalize_to_uint8`: scale, +0.5, clip,
    truncate). Keeping the quantization in the same dispatch as the sampler scan
    shrinks the device->host image transfer 4x (uint8 instead of fp32) — part of
    the round-4 e2e-overhead harvest."""
    imgs = decode_and_postprocess(model, params, latents)
    return jnp.clip(imgs * 255.0 + 0.5, 0.0, 255.0).astype(jnp.uint8)
