"""Multi-chip (virtual 8-device) DP generation: sharded sampler == unsharded math."""
import jax
import jax.numpy as jnp
import numpy as np

from difashion_tpu.core.config import ModelConfig
from difashion_tpu.engine import (
    GenerationInputs,
    build_sampler,
    make_guidance_spec,
    make_mesh,
)
from difashion_tpu.engine.generate import shard_generation_inputs
from difashion_tpu.models import create_difashion
from jax.sharding import NamedSharding, PartitionSpec as P


def test_sharded_gor_matches_unsharded():
    cfg = ModelConfig.tiny()
    model, params = create_difashion(cfg, jax.random.PRNGKey(0))
    spec = make_guidance_spec(12.0, 4.0, 5.0)
    sampler = build_sampler(model, num_inference_steps=2, spec=spec, eta=0.1)

    B, olen = 8, 4   # one outfit per device
    F = B * olen
    s = cfg.unet.sample_size
    C = cfg.vae.latent_channels
    key = jax.random.PRNGKey(1)
    ks = jax.random.split(key, 3)
    inputs = GenerationInputs(
        init_latents=jax.random.normal(ks[0], (F, s, s, C)),
        outfit_idx=jnp.repeat(jnp.arange(B, dtype=jnp.int32), olen),
        known_latents=jnp.zeros((B, olen, s, s, C)),
        gen_mask=jnp.ones((B, olen), bool),
        gen_index=jnp.arange(F, dtype=jnp.int32).reshape(B, olen),
        hist_latents=jax.random.normal(ks[1], (F, s, s, C)) * 0.1,
        cate_text=jax.random.normal(ks[2], (F, 77, cfg.text.hidden_size)) * 0.1,
        null_text=jnp.zeros((77, cfg.text.hidden_size)),
        null_latent=jnp.zeros((s, s, C)),
    )

    ref = np.asarray(jax.jit(sampler)(params, inputs))

    mesh = make_mesh()
    assert mesh.devices.size == 8
    repl = NamedSharding(mesh, P())
    params_r = jax.tree_util.tree_map(lambda x: jax.device_put(x, repl), params)
    inputs_s = shard_generation_inputs(inputs, mesh)
    out = np.asarray(jax.jit(sampler)(params_r, inputs_s))

    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)


def test_sharded_mixed_fitb_matches_unsharded():
    """FITB mixed batch: some slots known, per-outfit fill counts uneven, total
    fill count NOT divisible by the mesh — the cross-shard mutual gather and the
    uneven leading-axis sharding must not change the math (engine/generate.py::
    shard_generation_inputs claims XLA inserts the tiny collectives; this is the
    equality proof; reference FITB shape `/root/reference/DiFashion/
    inf4eval.py:521-524`)."""
    cfg = ModelConfig.tiny()
    model, params = create_difashion(cfg, jax.random.PRNGKey(10))
    spec = make_guidance_spec(12.0, 4.0, 5.0)
    sampler = build_sampler(model, num_inference_steps=2, spec=spec, eta=0.1)

    B, olen = 8, 4
    s = cfg.unet.sample_size
    C = cfg.vae.latent_channels
    rng = np.random.RandomState(7)
    # outfit i generates (i % 3) + 1 of its 4 slots -> F = 15 (15 % 8 != 0),
    # and the generated-slot positions vary per outfit.
    gen_mask = np.zeros((B, olen), bool)
    for i in range(B):
        k = (i % 3) + 1
        gen_mask[i, rng.permutation(olen)[:k]] = True
    F = int(gen_mask.sum())
    assert F == 15 and F % 8 != 0
    gen_index = np.zeros((B, olen), np.int32)
    outfit_idx = np.zeros((F,), np.int32)
    f = 0
    for i in range(B):
        for j in range(olen):
            if gen_mask[i, j]:
                gen_index[i, j] = f
                outfit_idx[f] = i
                f += 1

    ks = jax.random.split(jax.random.PRNGKey(11), 4)
    inputs = GenerationInputs(
        init_latents=jax.random.normal(ks[0], (F, s, s, C)),
        outfit_idx=jnp.asarray(outfit_idx),
        known_latents=jax.random.normal(ks[3], (B, olen, s, s, C)) * 0.2,
        gen_mask=jnp.asarray(gen_mask),
        gen_index=jnp.asarray(gen_index),
        hist_latents=jax.random.normal(ks[1], (F, s, s, C)) * 0.1,
        cate_text=jax.random.normal(ks[2], (F, 77, cfg.text.hidden_size)) * 0.1,
        null_text=jnp.zeros((77, cfg.text.hidden_size)),
        null_latent=jnp.zeros((s, s, C)),
    )

    ref = np.asarray(jax.jit(sampler)(params, inputs))

    mesh = make_mesh()
    repl = NamedSharding(mesh, P())
    params_r = jax.tree_util.tree_map(lambda x: jax.device_put(x, repl), params)
    inputs_s = shard_generation_inputs(inputs, mesh)
    # F=15 is padded to 16 for even dp shards; rows >= F are inert padding
    assert inputs_s.init_latents.shape[0] == 16
    out = np.asarray(jax.jit(sampler)(params_r, inputs_s))[:F]

    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)
