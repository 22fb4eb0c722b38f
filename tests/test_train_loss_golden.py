"""COMPOSED training-loss golden parity (VERDICT r2 #3).

The training forward is verified piecewise elsewhere (dropout-window statistics,
min-SNR math, mutual-mean algebra, UNet parity), but — like the sampling loop before
round 2 — never as ONE composed torch-oracle comparison. A swapped dropout-window
bound, an eta-combine/concat ordering bug, or a target/weight mismatch would pass
every piecewise test. The oracle (tests/oracle_torch.py::oracle_training_loss)
transcribes the reference training forward
(`/root/reference/DiFashion/models/difashion.py:122-267`) literally in torch (NCHW);
BOTH implementations are driven with *injected* randomness (enc-noise, diffusion
noise, shared-per-outfit timesteps, both dropout draws) and the scalar losses must
agree across the {use_history} x {use_mutual} matrix for epsilon and v-prediction,
with and without min-SNR weighting.

Oracle losses are cached as committed fixtures (tests/golden/torch_oracles/*.npz)
via golden_oracle.oracle, so the assertion runs even in torch-free images
(VERDICT r4 #3). Schedule constants come from the PINNED
tests/golden/schedule_constants.npz, not from production code (same discipline as
test_sampler_golden).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from difashion_tpu.core.config import ModelConfig, TrainConfig
from difashion_tpu.core.importer import export_params
from difashion_tpu.engine.train import TrainBatch, difashion_loss, split_params
from difashion_tpu.models.difashion import create_difashion

from golden_oracle import oracle


@pytest.fixture(scope="module")
def bundle():
    cfg = ModelConfig.tiny()
    model, params = create_difashion(cfg, jax.random.PRNGKey(11))
    return cfg, model, params


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
    cfg, model, params = bundle
    B, olen = 2, 4
    n = B * olen
    h = cfg.unet.sample_size
    C = cfg.vae.latent_channels
    sf = cfg.vae.scaling_factor
    # zlib.crc32, NOT hash(): str hashing is salted per process, and the fixture
    # inputs must be reconstructible in a different process than the one that
    # computed the oracle (torch-free images load the committed fixture).
    import zlib

    rng = np.random.RandomState(
        zlib.crc32(repr((uh, um, pred_type, bool(gamma))).encode()) % 9973)

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

    def compute():
        from oracle_torch import compute_train_loss

        return compute_train_loss(
            cfg,
            export_params(params["unet"], "unet"),
            export_params(params["fashion_encoder"], "mutual"),
            dict(mean=mean, logvar=logvar, enc_eps=enc_eps, noise=noise,
                 t_outfit=t_outfit, p_mask=p_mask, p_cate=p_cate, hist=hist,
                 text=text, null_text=null_text, null_latent=null_latent),
            olen=olen, sf=sf, eta=tcfg.eta,
            mask_ratio=tcfg.mask_ratio,
            coupling_mask_ratio=tcfg.coupling_mask_ratio,
            cate_mask_ratio=tcfg.cate_mask_ratio,
            use_history=uh, use_mutual=um,
            prediction_type=pred_type, snr_gamma=gamma,
        )

    loss_t = float(oracle(
        f"train_loss_uh{uh}_um{um}_{pred_type}_g{gamma}", compute)["loss"])

    np.testing.assert_allclose(
        float(loss_jax), loss_t, rtol=1e-5, atol=1e-5,
        err_msg=f"composed loss diverged (uh={uh} um={um} {pred_type} γ={gamma})",
    )


def test_injected_draws_actually_drive_the_loss(bundle):
    """Guard the injection plumbing itself: changing an injected draw must change
    the loss (otherwise the oracle comparison would be vacuous)."""
    cfg, model, params = bundle
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
