"""COMPOSED training-loss golden parity (VERDICT r2 #3).

The training forward is verified piecewise elsewhere (dropout-window statistics,
min-SNR math, mutual-mean algebra, UNet parity), but — like the sampling loop before
round 2 — never as ONE composed torch-oracle comparison. A swapped dropout-window
bound, an eta-combine/concat ordering bug, or a target/weight mismatch would pass
every piecewise test. This file transcribes the reference training forward
(`/root/reference/DiFashion/models/difashion.py:122-267`) literally in torch (NCHW),
drives BOTH implementations with *injected* randomness (enc-noise, diffusion noise,
shared-per-outfit timesteps, both dropout draws), and asserts the scalar losses agree
across the {use_history} x {use_mutual} matrix for epsilon and v-prediction, with and
without min-SNR weighting.

Schedule constants come from the PINNED tests/golden/schedule_constants.npz, not from
production code (same discipline as test_sampler_golden).
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from difashion_tpu.core.config import ModelConfig, TrainConfig
from difashion_tpu.core.importer import export_params
from difashion_tpu.engine.train import TrainBatch, difashion_loss, split_params
from difashion_tpu.models.difashion import create_difashion

from test_sampler_golden import GOLDEN, TMutual, _nchw
from test_unet_torch_parity import TUNet, _load_from_sd


@pytest.fixture(scope="module")
def bundle():
    cfg = ModelConfig.tiny()
    model, params = create_difashion(cfg, jax.random.PRNGKey(11))

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


def oracle_training_loss(
    *,
    unet,
    fashion_encoder,
    latent_mean,      # [n, C, h, w] torch fp32 (unscaled VAE mean)
    latent_logvar,    # [n, C, h, w]
    enc_eps,          # [n, C, h, w] injected encoder-sampling draw
    noise,            # [n, C, h, w] injected diffusion noise
    t_outfit,         # [B] int64 injected shared-per-outfit timesteps
    p_mask,           # [n] injected joint-dropout draw
    p_cate,           # [n] injected prompt-dropout draw
    hist_latents,     # [n, C, h, w] (host already applied null fallback)
    text_emb,         # [n, 77, D]
    null_text,        # [77, D]
    null_latent,      # [C, h, w]
    olen: int,
    sf: float,
    eta: float,
    mask_ratio: float,
    coupling_mask_ratio: float,
    cate_mask_ratio: float,
    use_history: bool,
    use_mutual: bool,
    prediction_type: str,
    snr_gamma,
):
    """Literal NCHW transcription of difashion.py:122-267 with injected draws.

    Uses the PINNED schedule constants (GOLDEN.alphas_cumprod), so a production
    beta-schedule bug cannot be common-mode invisible.
    """
    n = latent_mean.shape[0]
    bsz = n // olen
    acp = torch.from_numpy(
        np.asarray(GOLDEN.alphas_cumprod, np.float32)
    )

    # vae latent_dist.sample() (difashion.py:144) from cached moments
    std = torch.exp(0.5 * torch.clamp(latent_logvar, -30.0, 20.0))
    latents = (latent_mean + std * enc_eps) * sf

    timesteps = t_outfit.repeat_interleave(olen)                  # shared t
    a = acp[timesteps].sqrt().view(n, 1, 1, 1)
    s = (1.0 - acp[timesteps]).sqrt().view(n, 1, 1, 1)
    noisy_latents = a * latents + s * noise                       # add_noise

    # mutual condition over *noisy* co-item latents (difashion.py:160-171)
    if use_mutual:
        mutual_cond = []
        for i, idx in enumerate(range(0, bsz * olen, olen)):
            weights = torch.ones(olen, olen).masked_fill(torch.eye(olen) > 0, 0.0)
            weights = weights / torch.sum(weights, dim=1)
            mutual_latents = noisy_latents[idx:idx + olen]
            for weight in weights:
                mutual_cond.append(
                    sum(w * emb for w, emb in zip(weight, mutual_latents))
                )
        mutual_cond = fashion_encoder(torch.stack(mutual_cond))
    else:
        mutual_cond = torch.stack([null_latent] * n)

    # history lookup skipped entirely when use_history is off (difashion.py:177-184)
    hist = hist_latents.clone() if use_history else torch.stack([null_latent] * n)

    # joint condition dropout windows (difashion.py:186-213)
    masked_mutual = mutual_cond.clone()
    if use_history and use_mutual:
        image_mask = p_mask < mask_ratio + coupling_mask_ratio
        hist[image_mask] = null_latent
        mutual_mask = (p_mask >= mask_ratio) & (
            p_mask < 2 * mask_ratio + coupling_mask_ratio
        )
        masked_mutual[mutual_mask] = null_latent
    elif use_history:
        hist[p_mask < mask_ratio] = null_latent
    elif use_mutual:
        masked_mutual[p_mask < mask_ratio] = null_latent

    x = (1 - eta) * noisy_latents + eta * masked_mutual
    x = torch.cat([x, hist], dim=1)                                # 8 channels

    ehs = text_emb.clone()
    ehs[p_cate < cate_mask_ratio] = null_text                      # prompt dropout

    if prediction_type == "epsilon":
        target = noise
    elif prediction_type == "v_prediction":
        target = a * noise - s * latents                           # get_velocity
    else:
        raise ValueError(prediction_type)

    pred = unet(x, timesteps, ehs)

    if snr_gamma is None:
        return torch.mean((pred.float() - target.float()) ** 2)
    snr = acp[timesteps] / (1.0 - acp[timesteps])
    w = torch.minimum(snr, torch.full_like(snr, snr_gamma)) / snr
    per = torch.mean((pred.float() - target.float()) ** 2, dim=(1, 2, 3))
    return torch.mean(per * w)


CASES = [
    # (use_history, use_mutual, prediction_type, snr_gamma)
    (True, True, "epsilon", 5.0),        # the recipe (run_eta0.1.sh)
    (True, True, "epsilon", None),
    (True, False, "epsilon", 5.0),
    (False, True, "epsilon", 5.0),
    (False, False, "epsilon", 5.0),
    (True, True, "v_prediction", None),  # v-pred; snr=None so both sides use the
                                         # reference-shaped plain-MSE loss
]


@pytest.mark.parametrize("uh,um,pred_type,gamma", CASES)
def test_composed_training_loss_matches_torch_oracle(bundle, uh, um, pred_type,
                                                     gamma):
    cfg, model, params, tunet, tmut = bundle
    B, olen = 2, 4
    n = B * olen
    h = cfg.unet.sample_size
    C = cfg.vae.latent_channels
    sf = cfg.vae.scaling_factor
    rng = np.random.RandomState(hash((uh, um, pred_type, bool(gamma))) % 9973)

    mean = rng.randn(B, olen, h, h, C).astype(np.float32) * 2.0
    logvar = rng.uniform(-8.0, -2.0, size=mean.shape).astype(np.float32)
    hist = (rng.randn(B, olen, h, h, C) * 0.3).astype(np.float32)
    null_latent = (rng.randn(h, h, C) * 0.05).astype(np.float32)
    ids = rng.randint(0, cfg.text.vocab_size, size=(B, olen, 77))

    # ---- injected randomness (identical on both sides) ----------------------
    enc_eps = rng.randn(n, h, h, C).astype(np.float32)
    noise = rng.randn(n, h, h, C).astype(np.float32)
    t_outfit = rng.randint(0, 1000, size=(B,))
    # p draws straddling every window boundary: ensures all four mask branches fire
    p_mask = rng.uniform(0.0, 1.0, size=(n,)).astype(np.float32)
    p_cate = rng.uniform(0.0, 1.0, size=(n,)).astype(np.float32)

    text = np.asarray(
        model.encode_text(params, jnp.asarray(ids.reshape(n, -1))), np.float32
    )
    null_text = np.asarray(
        model.encode_text(params, jnp.zeros((1, 77), jnp.int32)), np.float32
    )[0]

    tcfg = TrainConfig(
        use_history=uh, use_mutual_guidance=um, prediction_type=pred_type,
        snr_gamma=gamma,
    )
    batch = TrainBatch(
        images=None,
        latent_mean=jnp.asarray(mean),
        latent_logvar=jnp.asarray(logvar),
        input_ids=jnp.asarray(ids.astype(np.int32)),
        hist_latents=jnp.asarray(hist),
    )
    trainable, frozen = split_params(params)
    loss_jax, _ = jax.jit(
        lambda tr, fr, b, inj: difashion_loss(
            model, tr, fr, b, jnp.asarray(null_latent), jnp.asarray(null_text),
            jax.random.PRNGKey(0), tcfg, injected=inj,
        )
    )(trainable, frozen, batch, {
        "enc_eps": jnp.asarray(enc_eps),
        "noise": jnp.asarray(noise),
        "t_outfit": jnp.asarray(t_outfit, jnp.int32),
        "p_mask": jnp.asarray(p_mask),
        "p_cate": jnp.asarray(p_cate),
    })

    with torch.no_grad():
        loss_t = oracle_training_loss(
            unet=tunet, fashion_encoder=tmut,
            latent_mean=_nchw(mean.reshape(n, h, h, C)),
            latent_logvar=_nchw(logvar.reshape(n, h, h, C)),
            enc_eps=_nchw(enc_eps), noise=_nchw(noise),
            t_outfit=torch.from_numpy(t_outfit).long(),
            p_mask=torch.from_numpy(p_mask), p_cate=torch.from_numpy(p_cate),
            hist_latents=_nchw(hist.reshape(n, h, h, C)),
            text_emb=torch.from_numpy(text),
            null_text=torch.from_numpy(null_text),
            null_latent=_nchw(null_latent[None])[0],
            olen=olen, sf=sf, eta=tcfg.eta,
            mask_ratio=tcfg.mask_ratio,
            coupling_mask_ratio=tcfg.coupling_mask_ratio,
            cate_mask_ratio=tcfg.cate_mask_ratio,
            use_history=uh, use_mutual=um,
            prediction_type=pred_type, snr_gamma=gamma,
        )

    np.testing.assert_allclose(
        float(loss_jax), float(loss_t), rtol=1e-5, atol=1e-5,
        err_msg=f"composed loss diverged (uh={uh} um={um} {pred_type} γ={gamma})",
    )


def test_injected_draws_actually_drive_the_loss(bundle):
    """Guard the injection plumbing itself: changing an injected draw must change
    the loss (otherwise the oracle comparison would be vacuous)."""
    cfg, model, params, *_ = bundle
    B, olen, h, C = 1, 4, cfg.unet.sample_size, cfg.vae.latent_channels
    n = B * olen
    rng = np.random.RandomState(3)
    batch = TrainBatch(
        images=None,
        latent_mean=jnp.asarray(rng.randn(B, olen, h, h, C).astype(np.float32)),
        latent_logvar=jnp.asarray(np.full((B, olen, h, h, C), -6.0, np.float32)),
        input_ids=jnp.asarray(rng.randint(0, 100, size=(B, olen, 77)), jnp.int32),
        hist_latents=jnp.asarray(rng.randn(B, olen, h, h, C).astype(np.float32)),
    )
    null_lat = jnp.zeros((h, h, C))
    null_text = jnp.zeros((77, cfg.text.hidden_size))
    tcfg = TrainConfig()
    trainable, frozen = split_params(params)

    def loss_with(t0):
        inj = {
            "enc_eps": jnp.zeros((n, h, h, C)),
            "noise": jnp.asarray(rng.randn(n, h, h, C).astype(np.float32) * 0 + 0.5),
            "t_outfit": jnp.asarray([t0], jnp.int32),
            "p_mask": jnp.ones((n,)),   # no dropout
            "p_cate": jnp.ones((n,)),
        }
        l, _ = difashion_loss(model, trainable, frozen, batch, null_lat,
                              null_text, jax.random.PRNGKey(0), tcfg, injected=inj)
        return float(l)

    assert loss_with(10) != loss_with(900)
