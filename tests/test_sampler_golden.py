"""WHOLE-LOOP golden parity for the sampler.

Every piece of the generation path has its own parity test (guidance algebra, mutual
assembly, PLMS-vs-stateful, UNet-vs-torch), but none of them runs the *composed*
CFG + mutual + history + PNDM loop end to end — the one place a seam bug (branch-order
swap, corrector off-by-one interacting with the `prev_latents` mutual feedback,
reference `/root/reference/DiFashion/models/difashion.py:456-571`) could hide.

The oracle (tests/oracle_torch.py) is an independent torch transcription of the
reference loop's behavior: the full torch UNet replica loading our exported HF-style
state dict, a literal NCHW MutualEncoder, a *stateful* PLMS (published algorithm,
skip_prk_steps=True), 4-way and degenerate CFG stacking, Python-loop mutual assembly
with negative-index pointers, eta combine + history concat, guidance combines, and
the per-step `prev_latents` update. Its latent **trajectories** are cached as
committed fixtures (tests/golden/torch_oracles/*.npz) via golden_oracle.oracle, so
this parity assertion runs even in torch-free images (VERDICT r4 #3); regenerate
with DIFASHION_REGEN_GOLDEN=1 in any torch environment. Inputs are fully
deterministic (fixed PRNG keys/seeds). Covers FITB (1 fill/outfit) and GOR (all 4
slots) across the guidance-mode matrix at 20 and 50 steps.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from difashion_tpu.core.config import ModelConfig
from difashion_tpu.core.importer import export_params
from difashion_tpu.engine.generate import (
    GenerationInputs,
    build_sampler,
    make_guidance_spec,
)
from difashion_tpu.models.difashion import create_difashion

from golden_oracle import oracle
from golden_schedule import GOLDEN, GoldenSchedule  # noqa: F401  (re-export)


@pytest.fixture(scope="module")
def bundle():
    cfg = ModelConfig.tiny()
    model, params = create_difashion(cfg, jax.random.PRNGKey(7))
    return cfg, model, params


def _sds(params):
    """Exported HF-style state dicts (numpy) for the torch oracle."""
    return (
        export_params(params["unet"], "unet"),
        export_params(params["fashion_encoder"], "mutual"),
    )


def _problem(cfg, model, params, mode: str, B: int, seed: int):
    """Build matched problem inputs: GenerationInputs for our sampler + the raw
    numpy side handed to the torch oracle (fully deterministic in `seed`)."""
    olen = 4
    s = cfg.unet.sample_size
    C = cfg.vae.latent_channels
    rng = np.random.RandomState(seed)

    if mode == "fitb":
        olists = rng.randint(1, 100, size=(B, olen))
        for b in range(B):
            olists[b, rng.randint(olen)] = 0
    else:
        olists = np.zeros((B, olen), np.int64)
    gen_mask = olists == 0
    fills = [(b, j) for b in range(B) for j in range(olen) if gen_mask[b, j]]
    F = len(fills)
    gen_index = np.zeros((B, olen), np.int32)
    for k, (b, j) in enumerate(fills):
        gen_index[b, j] = k

    init = rng.randn(F, s, s, C).astype(np.float32)
    known = (rng.randn(B, olen, s, s, C) * 0.2).astype(np.float32)
    hist = (rng.randn(F, s, s, C) * 0.2).astype(np.float32)
    null_latent = (rng.randn(s, s, C) * 0.05).astype(np.float32)

    ids = rng.randint(0, cfg.text.vocab_size, size=(F, 77))
    cate_text = np.asarray(model.encode_text(params, jnp.asarray(ids)))
    null_text = np.asarray(
        model.encode_text(params, jnp.zeros((1, 77), jnp.int32))
    )[0]

    inputs = GenerationInputs(
        init_latents=jnp.asarray(init),
        outfit_idx=jnp.asarray([b for b, _ in fills], jnp.int32),
        known_latents=jnp.asarray(known),
        gen_mask=jnp.asarray(gen_mask),
        gen_index=jnp.asarray(gen_index),
        hist_latents=jnp.asarray(hist),
        cate_text=jnp.asarray(cate_text),
        null_text=jnp.asarray(null_text),
        null_latent=jnp.asarray(null_latent),
    )
    side = dict(
        init=init, olists=olists, known=known, hist=hist,
        cate_text=np.asarray(cate_text, np.float32), null_text=null_text,
        null_latent=null_latent,
    )
    return inputs, side


def _ref_traj(cfg, params, side, *, name, steps, cs, hs, ms, uh, um,
              scheduler="plms"):
    def compute():
        from oracle_torch import compute_sampler_traj

        unet_sd, mutual_sd = _sds(params)
        return compute_sampler_traj(
            cfg, unet_sd, mutual_sd, side, num_inference_steps=steps, eta=0.1,
            cs=cs, hs=hs, ms=ms, use_history=uh, use_mutual=um,
            scheduler=scheduler,
        )

    return oracle(name, compute)["traj"]


CASES = [
    # (mode, B, steps, cs, hs, ms, use_history, use_mutual)
    ("fitb", 2, 20, 12.0, 4.0, 5.0, True, True),    # full 4-branch, headline scales
    ("gor", 1, 20, 12.0, 4.0, 5.0, True, True),     # full 4-branch, all slots generated
    ("fitb", 2, 20, 12.0, 4.0, 1.0, True, True),    # C+H (mutual real, not CFG'd)
    ("fitb", 2, 20, 7.5, 1.0, 1.0, True, True),     # C only
    ("gor", 1, 20, 1.0, 1.0, 5.0, True, True),      # M only
]


@pytest.mark.parametrize("mode,B,steps,cs,hs,ms,uh,um", CASES)
def test_whole_loop_matches_torch_oracle(bundle, mode, B, steps, cs, hs, ms, uh, um):
    cfg, model, params = bundle
    # zlib.crc32, NOT hash(): str hashing is salted per process; fixture inputs
    # must be reconstructible in the (torch-free) process that loads the fixture.
    import zlib

    inputs, side = _problem(
        cfg, model, params, mode, B,
        seed=zlib.crc32(repr((mode, steps)).encode()) % 997)

    spec = make_guidance_spec(cs, hs, ms, use_history=uh, use_mutual=um)
    sampler = build_sampler(
        model, num_inference_steps=steps, spec=spec, eta=0.1,
        return_trajectory=True,
    )
    _, traj = jax.jit(sampler)(params, inputs)
    traj = np.asarray(traj)  # [L, F, h, w, C]

    name = f"sampler_{mode}_B{B}_s{steps}_cs{cs}_hs{hs}_ms{ms}_uh{uh}_um{um}"
    ref_traj = _ref_traj(cfg, params, side, name=name, steps=steps,
                         cs=cs, hs=hs, ms=ms, uh=uh, um=um)
    assert traj.shape[0] == ref_traj.shape[0] == steps + 1

    for i in range(ref_traj.shape[0]):
        # fp32 whole-loop accumulation: CFG scale 12 amplifies latents to
        # |x|~50-100, and XLA-CPU reduction order varies with thread count, so
        # 2e-4 rel occasionally flakes on single elements; 5e-4 is still a
        # trajectory-level match far below any behavioral difference.
        np.testing.assert_allclose(
            traj[i], ref_traj[i], rtol=5e-4, atol=2e-4,
            err_msg=f"trajectory diverged at iteration {i}/{ref_traj.shape[0]}",
        )


@pytest.mark.parametrize("mode,steps", [("fitb", 8), ("gor", 20)])
def test_whole_loop_dpmpp_matches_stateful_oracle(bundle, mode, steps):
    """Fast-serving path end to end: build_sampler(scheduler='dpmpp') with the
    full 4-branch CFG + mutual + history loop vs the same oracle loop driving
    the independent stateful DPM-Solver++(2M)."""
    cfg, model, params = bundle
    B = 2 if mode == "fitb" else 1
    inputs, side = _problem(cfg, model, params, mode, B, seed=53 + steps)

    spec = make_guidance_spec(12.0, 4.0, 5.0)
    sampler = build_sampler(
        model, num_inference_steps=steps, spec=spec, eta=0.1,
        scheduler="dpmpp", return_trajectory=True,
    )
    _, traj = jax.jit(sampler)(params, inputs)
    traj = np.asarray(traj)

    ref_traj = _ref_traj(cfg, params, side, name=f"sampler_dpmpp_{mode}_s{steps}",
                         steps=steps, cs=12.0, hs=4.0, ms=5.0, uh=True, um=True,
                         scheduler="dpmpp")
    assert traj.shape[0] == ref_traj.shape[0] == steps
    for i in range(ref_traj.shape[0]):
        np.testing.assert_allclose(
            traj[i], ref_traj[i], rtol=5e-4, atol=2e-4,
            err_msg=f"dpmpp trajectory diverged at iteration {i}/{ref_traj.shape[0]}",
        )


def test_whole_loop_50_steps_full_cfg(bundle):
    """The headline config at the reference's 50 steps (difashion.py:296, GOR)."""
    cfg, model, params = bundle
    inputs, side = _problem(cfg, model, params, "gor", 1, seed=31)

    spec = make_guidance_spec(12.0, 4.0, 5.0)
    sampler = build_sampler(
        model, num_inference_steps=50, spec=spec, eta=0.1, return_trajectory=True
    )
    _, traj = jax.jit(sampler)(params, inputs)
    traj = np.asarray(traj)

    ref_traj = _ref_traj(cfg, params, side, name="sampler_gor_s50_full_cfg",
                         steps=50, cs=12.0, hs=4.0, ms=5.0, uh=True, um=True)
    assert traj.shape[0] == ref_traj.shape[0] == 51
    for i in range(ref_traj.shape[0]):
        np.testing.assert_allclose(
            traj[i], ref_traj[i], rtol=5e-4, atol=2e-4,
            err_msg=f"trajectory diverged at iteration {i}/51",
        )
