"""FULL UNet/VAE forward parity against torch replicas of the SD architecture.

Per-block torch-parity tests can't catch wiring mistakes — above all the LIFO skip-
connection consumption across down/up blocks, which silently destroys pretrained-weight
quality. The oracle (tests/oracle_torch.py::TUNet and the VAE encoder replica) is a
complete clean-room torch model built from the published SD topology that loads OUR
exported HF-style state dict; the end-to-end forwards must agree to <= 1e-3 on the
tiny config.

Oracle outputs are cached as committed fixtures (tests/golden/torch_oracles/*.npz)
via golden_oracle.oracle, so parity asserts even in torch-free images (VERDICT r4
#3); regenerate with DIFASHION_REGEN_GOLDEN=1 in a torch environment.
"""
import jax
import jax.numpy as jnp
import numpy as np

from difashion_tpu.core.config import ModelConfig
from difashion_tpu.core.importer import export_params
from difashion_tpu.models.unet import init_unet

from golden_oracle import oracle


def test_full_unet_matches_torch_replica():
    cfg = ModelConfig.tiny().unet
    model, params = init_unet(cfg, jax.random.PRNGKey(0))

    rng = np.random.RandomState(0)
    x = rng.randn(2, cfg.sample_size, cfg.sample_size, cfg.in_channels).astype(
        np.float32
    )
    tvals = np.array([17, 503], np.int64)
    ctx = rng.randn(2, 77, cfg.cross_attention_dim).astype(np.float32)

    ours = np.asarray(
        model.apply({"params": params}, jnp.asarray(x), jnp.asarray(tvals),
                    jnp.asarray(ctx))
    )

    def compute():
        from oracle_torch import compute_unet_forward

        return compute_unet_forward(cfg, export_params(params, "unet"), x,
                                    tvals, ctx)

    ref = oracle("unet_tiny_forward", compute)["out"]
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-3)
    # tighter mean-level agreement
    assert np.abs(ours - ref).mean() < 1e-4


def test_full_vae_matches_torch_replica():
    from difashion_tpu.models.vae import AutoencoderKL as VK, init_vae

    cfg = ModelConfig.tiny().vae
    model, params = init_vae(cfg, jax.random.PRNGKey(1))

    rng = np.random.RandomState(2)
    x = rng.randn(1, cfg.sample_size, cfg.sample_size, 3).astype(np.float32) * 0.5

    def compute():
        from oracle_torch import compute_vae_encode

        return compute_vae_encode(cfg, export_params(params, "vae"), x)

    ref = oracle("vae_tiny_encode", compute)

    dist = model.apply({"params": params}, jnp.asarray(x), method=VK.encode)
    np.testing.assert_allclose(
        np.asarray(dist.mean), ref["mean"], rtol=1e-3, atol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(dist.logvar), ref["logvar"], rtol=1e-3, atol=1e-3,
    )
