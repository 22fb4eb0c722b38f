"""WHOLE-LOOP golden parity for the sampler.

Every piece of the generation path has its own parity test (guidance algebra, mutual
assembly, PLMS-vs-stateful, UNet-vs-torch), but none of them runs the *composed*
CFG + mutual + history + PNDM loop end to end — the one place a seam bug (branch-order
swap, corrector off-by-one interacting with the `prev_latents` mutual feedback,
reference `/root/reference/DiFashion/models/difashion.py:456-571`) could hide.

This test builds an independent torch oracle:
  * the full torch UNet replica from `test_unet_torch_parity` (loads our exported
    HF-style state dict),
  * a literal NCHW MutualEncoder (reference `difashion.py:21-46`),
  * a *stateful* PLMS scheduler (counter + rolling epsilon list + cur_sample, the
    published algorithm with skip_prk_steps=True),
  * a line-faithful transcription of the reference sampling loop's *behavior*:
    4-way (and degenerate) CFG stacking (difashion.py:388-427,456-469,494-512),
    Python-loop mutual assembly with negative-index pointers into `prev_latents`
    (:439-451,474-489), the eta combine + history channel concat (:514-515), the
    guidance combines (:525-566), and the per-step `prev_latents` update (:571),
and asserts our single-`lax.scan` sampler reproduces the oracle's **latent trajectory**
(after every scheduler iteration) in fp32, for FITB (1 fill/outfit) and GOR (all 4
slots), across the guidance-mode matrix, at 20 and 50 steps.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
nn_ = torch.nn

import jax
import jax.numpy as jnp

from difashion_tpu.core.config import ModelConfig
from difashion_tpu.core.importer import export_params
from difashion_tpu.diffusion.schedule import DiffusionSchedule, leading_timesteps
from difashion_tpu.engine.generate import (
    GenerationInputs,
    build_sampler,
    make_guidance_spec,
)
from difashion_tpu.models.difashion import create_difashion

from test_unet_torch_parity import TUNet, _load_from_sd


# ---------------------------------------------------------------------------
# Torch oracle components
# ---------------------------------------------------------------------------

class TMutual(nn_.Module):
    """Literal reference MutualEncoder (difashion.py:21-46): NCHW flatten order."""

    def __init__(self, channels: int, size: int, hid: int):
        super().__init__()
        flat = channels * size * size
        self.channels, self.size = channels, size
        self.mlp = nn_.Sequential(
            nn_.Linear(flat, hid),
            nn_.LeakyReLU(),
            nn_.Dropout(0.1),
            nn_.Linear(hid, flat),
            nn_.Tanh(),
        )

    def forward(self, x):  # [B, C, S, S]
        b = x.shape[0]
        h = self.mlp(x.reshape(b, -1))
        return h.view(b, self.channels, self.size, self.size)


class TorchPLMS:
    """Stateful PLMS (skip_prk_steps=True): the published algorithm driven exactly the
    way the reference drives diffusers' PNDMScheduler (difashion.py:356-357,569)."""

    def __init__(self, sched: DiffusionSchedule, n: int):
        self.s = sched
        self.ratio = sched.num_train_timesteps // n
        base = leading_timesteps(sched.num_train_timesteps, n, sched.steps_offset)
        self.timesteps = np.concatenate(
            [base[:-1], base[-2:-1], base[-1:]]
        )[::-1].copy()
        self.ets = []
        self.counter = 0
        self.cur_sample = None

    def _acp(self, t):
        return float(self.s.alphas_cumprod[t]) if t >= 0 else float(
            self.s.final_alpha_cumprod
        )

    def step(self, model_output, timestep, sample):
        t = int(timestep)
        prev_t = t - self.ratio
        if self.counter != 1:
            self.ets = self.ets[-3:]
            self.ets.append(model_output)
        else:
            prev_t = t
            t = t + self.ratio
        if len(self.ets) == 1 and self.counter == 0:
            mo = model_output
            self.cur_sample = sample
        elif len(self.ets) == 1 and self.counter == 1:
            mo = (model_output + self.ets[-1]) / 2
            sample = self.cur_sample
        elif len(self.ets) == 2:
            mo = (3 * self.ets[-1] - self.ets[-2]) / 2
        elif len(self.ets) == 3:
            mo = (23 * self.ets[-1] - 16 * self.ets[-2] + 5 * self.ets[-3]) / 12
        else:
            mo = (1 / 24) * (
                55 * self.ets[-1] - 59 * self.ets[-2]
                + 37 * self.ets[-3] - 9 * self.ets[-4]
            )
        a_t = self._acp(t)
        a_prev = self._acp(prev_t)
        coeff = (a_prev / a_t) ** 0.5
        denom = a_t * (1 - a_prev) ** 0.5 + (a_t * (1 - a_t) * a_prev) ** 0.5
        prev_sample = coeff * sample - (a_prev - a_t) * mo / denom
        self.counter += 1
        return prev_sample


def oracle_fashion_generation(
    *,
    unet: TUNet,
    fashion_encoder: TMutual,
    sched: DiffusionSchedule,
    num_inference_steps: int,
    init_latents,        # [F, C, h, w]
    olists,              # [B, olen] int, 0 = slot to generate
    all_latents,         # [B*olen, C, h, w] clean catalog latents (mode * sf)
    hist_latents_fill,   # [F, C, h, w] per-fill history latent (null where absent)
    category_prompts,    # [F, 77, D]
    null_prompt,         # [1, 77, D]
    null_latent,         # [C, h, w]
    eta: float,
    category_guidance_scale: float,
    hist_guidance_scale: float,
    mutual_guidance_scale: float,
    use_history: bool,
    use_mutual_guidance: bool,
    scheduler: str = "plms",
):
    """Behavioral transcription of difashion.py:277-571 at fp32, returning the latent
    trajectory (one entry per scheduler iteration). `scheduler="dpmpp"` swaps the
    stateful PLMS for the independent stateful DPM-Solver++(2M) transcription
    (test_diffusion.StatefulDPMpp2M) to certify the fast-serving path end to end."""
    do_h = use_history and hist_guidance_scale > 1.0
    do_m = use_mutual_guidance and mutual_guidance_scale > 1.0
    do_c = category_guidance_scale > 1.0
    do_full = do_h and do_m and do_c

    bsz, olen = olists.shape
    fill_idx = torch.nonzero(olists == 0)
    fill_num = fill_idx.shape[0]

    if scheduler == "plms":
        plms = TorchPLMS(sched, num_inference_steps)
    else:
        from test_diffusion import StatefulDPMpp2M

        plms = StatefulDPMpp2M(sched, num_inference_steps)
    latents = init_latents.clone()

    # history stacking (difashion.py:388-406)
    hist = hist_latents_fill
    if not use_history:
        hist = torch.stack([null_latent] * fill_num)
    null_hist = torch.stack([null_latent] * fill_num)
    if do_full:
        hist_stack = torch.cat([hist, null_hist, null_hist, null_hist], dim=0)
    elif do_c:
        if do_h:
            hist_stack = torch.cat([hist, null_hist, null_hist], dim=0)
        elif do_m:
            hist_stack = torch.cat([hist] * 3, dim=0)
        else:
            hist_stack = torch.cat([hist] * 2, dim=0)
    else:
        if do_h:
            hist_stack = torch.cat([hist, null_hist], dim=0)
        elif do_m:
            hist_stack = torch.cat([hist] * 2, dim=0)
        else:
            hist_stack = hist

    # text stacking (difashion.py:408-427)
    null_prompts = torch.cat([null_prompt] * fill_num, dim=0)
    if do_full:
        ehs = torch.cat(
            [category_prompts, category_prompts, category_prompts, null_prompts], 0
        )
    elif do_c:
        if do_h or do_m:
            ehs = torch.cat([category_prompts, category_prompts, null_prompts], 0)
        else:
            ehs = torch.cat([category_prompts, null_prompts], 0)
    else:
        if do_h or do_m:
            ehs = torch.cat([category_prompts] * 2, 0)
        else:
            ehs = category_prompts

    # mutual index pointers (difashion.py:439-451)
    gen_masks = olists == 0
    mutual_indicies = []
    all_num = 0
    for i in range(bsz):
        gen_mask = gen_masks[i]
        gen_num = int(gen_mask.sum())
        indicies = torch.arange(olen) + i * olen
        indicies[gen_mask] = -torch.arange(all_num, all_num + gen_num) - 1
        mutual_indicies.append(indicies)
        all_num += gen_num
    mutual_indicies = torch.stack(mutual_indicies)
    assert all_num == fill_num

    prev_latents = latents.clone()
    trajectory = []

    for t in plms.timesteps:
        # CFG latent stacking (difashion.py:456-469)
        if do_full:
            lmi = torch.cat([latents] * 4)
        elif do_c:
            lmi = torch.cat([latents] * (3 if (do_m or do_h) else 2))
        else:
            lmi = torch.cat([latents] * 2) if (do_m or do_h) else latents

        # scale_model_input is identity for PNDM

        # mutual assembly (difashion.py:474-492)
        if use_mutual_guidance:
            mutual_cond = []
            for j in range(fill_num):
                o_idx, i_idx = int(fill_idx[j, 0]), int(fill_idx[j, 1])
                weights = torch.ones(olen)
                weights[i_idx] = 0.0
                gen_mask = gen_masks[o_idx]
                mutual_latents = torch.zeros((olen,) + null_latent.shape)
                mutual_latents[~gen_mask] = all_latents[
                    mutual_indicies[o_idx][~gen_mask]
                ]
                mutual_latents[gen_mask] = prev_latents[
                    -mutual_indicies[o_idx][gen_mask] - 1
                ]
                weighted = sum(w * e for w, e in zip(weights, mutual_latents))
                mutual_cond.append(weighted)
            mutual_cond = torch.stack(mutual_cond)
            mutual_cond = fashion_encoder(mutual_cond)
        else:
            mutual_cond = torch.stack([null_latent] * fill_num)

        # mutual CFG stacking (difashion.py:494-512)
        null_mut = torch.stack([null_latent] * fill_num)
        if do_full:
            mutual_stack = torch.cat([mutual_cond, mutual_cond, null_mut, null_mut], 0)
        elif do_c:
            if do_m:
                mutual_stack = torch.cat([mutual_cond, null_mut, null_mut], 0)
            elif do_h:
                mutual_stack = torch.cat([mutual_cond] * 3, 0)
            else:
                mutual_stack = torch.cat([mutual_cond] * 2, 0)
        else:
            if do_m:
                mutual_stack = torch.cat([mutual_cond, null_mut], 0)
            elif do_h:
                mutual_stack = torch.cat([mutual_cond] * 2, 0)
            else:
                mutual_stack = mutual_cond

        # eta combine + history concat (difashion.py:514-515)
        x = (1 - eta) * lmi + eta * mutual_stack
        x = torch.cat([x, hist_stack], dim=1)

        tt = torch.full((x.shape[0],), int(t), dtype=torch.int64)
        noise_pred = unet(x, tt, ehs)

        # guidance combine (difashion.py:525-566)
        cs, hs, ms = (
            category_guidance_scale, hist_guidance_scale, mutual_guidance_scale
        )
        if do_full:
            e_all, e_cm, e_c, e_u = noise_pred.chunk(4)
            noise_pred = e_u + hs * (e_all - e_cm) + ms * (e_cm - e_c) + cs * (e_c - e_u)
        elif do_c:
            if do_h:
                e_ch, e_c, e_u = noise_pred.chunk(3)
                noise_pred = e_u + hs * (e_ch - e_c) + cs * (e_c - e_u)
            elif do_m:
                e_cm, e_c, e_u = noise_pred.chunk(3)
                noise_pred = e_u + ms * (e_cm - e_c) + cs * (e_c - e_u)
            else:
                e_c, e_u = noise_pred.chunk(2)
                noise_pred = e_u + cs * (e_c - e_u)
        else:
            if do_h:
                e_h, e_u = noise_pred.chunk(2)
                noise_pred = e_u + hs * (e_h - e_u)
            elif do_m:
                e_m, e_u = noise_pred.chunk(2)
                noise_pred = e_u + ms * (e_m - e_u)

        latents = plms.step(noise_pred, int(t), latents).to(torch.float32)
        prev_latents = latents
        trajectory.append(latents.clone())

    return trajectory


# ---------------------------------------------------------------------------
# Harness
# ---------------------------------------------------------------------------

def _nchw(x):
    return torch.from_numpy(np.ascontiguousarray(np.moveaxis(np.asarray(x), -1, -3)))


@pytest.fixture(scope="module")
def bundle():
    cfg = ModelConfig.tiny()
    model, params = create_difashion(cfg, jax.random.PRNGKey(7))

    tunet = TUNet(cfg.unet)
    _load_from_sd(tunet, export_params(params["unet"], "unet"), cfg.unet)
    tunet.eval()

    mcfg = cfg.mutual
    tmut = TMutual(mcfg.latent_channels, mcfg.latent_size, mcfg.hid_dim)
    msd = export_params(params["fashion_encoder"], "mutual")
    with torch.no_grad():
        tmut.mlp[0].weight.copy_(torch.from_numpy(msd["mlp.0.weight"]))
        tmut.mlp[0].bias.copy_(torch.from_numpy(msd["mlp.0.bias"]))
        tmut.mlp[3].weight.copy_(torch.from_numpy(msd["mlp.3.weight"]))
        tmut.mlp[3].bias.copy_(torch.from_numpy(msd["mlp.3.bias"]))
    tmut.eval()
    return cfg, model, params, tunet, tmut


def _problem(cfg, model, params, mode: str, B: int, seed: int):
    """Build matched problem inputs for both implementations."""
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
    torch_side = dict(
        init_latents=_nchw(init),
        olists=torch.from_numpy(olists),
        all_latents=_nchw(known.reshape(B * olen, s, s, C)),
        hist_latents_fill=_nchw(hist),
        category_prompts=torch.from_numpy(cate_text),
        null_prompt=torch.from_numpy(null_text[None]),
        null_latent=_nchw(null_latent),
    )
    return inputs, torch_side


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
    cfg, model, params, tunet, tmut = bundle
    inputs, tside = _problem(cfg, model, params, mode, B, seed=hash((mode, steps)) % 997)

    spec = make_guidance_spec(cs, hs, ms, use_history=uh, use_mutual=um)
    sampler = build_sampler(
        model, num_inference_steps=steps, spec=spec, eta=0.1,
        return_trajectory=True,
    )
    _, traj = jax.jit(sampler)(params, inputs)
    traj = np.asarray(traj)  # [L, F, h, w, C]

    with torch.no_grad():
        ref_traj = oracle_fashion_generation(
            unet=tunet, fashion_encoder=tmut, sched=model.schedule,
            num_inference_steps=steps, eta=0.1,
            category_guidance_scale=cs, hist_guidance_scale=hs,
            mutual_guidance_scale=ms, use_history=uh, use_mutual_guidance=um,
            **tside,
        )
    assert traj.shape[0] == len(ref_traj) == steps + 1

    for i, ref in enumerate(ref_traj):
        ref_np = np.moveaxis(ref.numpy(), 1, -1)  # NCHW -> NHWC
        # fp32 whole-loop accumulation: CFG scale 12 amplifies latents to
        # |x|~50-100, and XLA-CPU reduction order varies with thread count, so
        # 2e-4 rel occasionally flakes on single elements; 5e-4 is still a
        # trajectory-level match far below any behavioral difference.
        np.testing.assert_allclose(
            traj[i], ref_np, rtol=5e-4, atol=2e-4,
            err_msg=f"trajectory diverged at iteration {i}/{len(ref_traj)}",
        )


@pytest.mark.parametrize("mode,steps", [("fitb", 8), ("gor", 20)])
def test_whole_loop_dpmpp_matches_stateful_oracle(bundle, mode, steps):
    """Fast-serving path end to end: build_sampler(scheduler='dpmpp') with the
    full 4-branch CFG + mutual + history loop vs the same oracle loop driving
    the independent stateful DPM-Solver++(2M)."""
    cfg, model, params, tunet, tmut = bundle
    B = 2 if mode == "fitb" else 1
    inputs, tside = _problem(cfg, model, params, mode, B, seed=53 + steps)

    spec = make_guidance_spec(12.0, 4.0, 5.0)
    sampler = build_sampler(
        model, num_inference_steps=steps, spec=spec, eta=0.1,
        scheduler="dpmpp", return_trajectory=True,
    )
    _, traj = jax.jit(sampler)(params, inputs)
    traj = np.asarray(traj)

    with torch.no_grad():
        ref_traj = oracle_fashion_generation(
            unet=tunet, fashion_encoder=tmut, sched=model.schedule,
            num_inference_steps=steps, eta=0.1, scheduler="dpmpp",
            category_guidance_scale=12.0, hist_guidance_scale=4.0,
            mutual_guidance_scale=5.0, use_history=True,
            use_mutual_guidance=True, **tside,
        )
    assert traj.shape[0] == len(ref_traj) == steps
    for i, ref in enumerate(ref_traj):
        ref_np = np.moveaxis(ref.numpy(), 1, -1)
        np.testing.assert_allclose(
            traj[i], ref_np, rtol=5e-4, atol=2e-4,
            err_msg=f"dpmpp trajectory diverged at iteration {i}/{len(ref_traj)}",
        )


def test_whole_loop_50_steps_full_cfg(bundle):
    """The headline config at the reference's 50 steps (difashion.py:296, GOR)."""
    cfg, model, params, tunet, tmut = bundle
    inputs, tside = _problem(cfg, model, params, "gor", 1, seed=31)

    spec = make_guidance_spec(12.0, 4.0, 5.0)
    sampler = build_sampler(
        model, num_inference_steps=50, spec=spec, eta=0.1, return_trajectory=True
    )
    _, traj = jax.jit(sampler)(params, inputs)
    traj = np.asarray(traj)

    with torch.no_grad():
        ref_traj = oracle_fashion_generation(
            unet=tunet, fashion_encoder=tmut, sched=model.schedule,
            num_inference_steps=50, eta=0.1,
            category_guidance_scale=12.0, hist_guidance_scale=4.0,
            mutual_guidance_scale=5.0, use_history=True, use_mutual_guidance=True,
            **tside,
        )
    assert traj.shape[0] == len(ref_traj) == 51
    for i, ref in enumerate(ref_traj):
        ref_np = np.moveaxis(ref.numpy(), 1, -1)
        np.testing.assert_allclose(
            traj[i], ref_np, rtol=5e-4, atol=2e-4,
            err_msg=f"trajectory diverged at iteration {i}/51",
        )
