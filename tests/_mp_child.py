"""Child worker for the 2-process jax.distributed validation test.

Run as: python tests/_mp_child.py <process_id> <num_processes> <port> <out.npz>
with XLA_FLAGS=--xla_force_host_platform_device_count=<local_devices>.

Builds the SAME tiny DiFashion step as the parent test (shared `run_one_step`),
but over a multi-process global mesh with the batch assembled from per-host
shards (`host_shard` + `make_global_batch`). Process 0 writes loss + updated
trainable params to `out.npz`.
"""
import os
import sys


def run_one_step(mesh):
    """One deterministic DP train step over `mesh` (any process layout).

    Returns (loss: float, flat: {keystr: np.ndarray} of updated trainable params).
    All inputs are pure functions of fixed seeds, so every process — and the
    single-process reference run — constructs identical global values.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from difashion_tpu.core.config import ModelConfig, TrainConfig
    from difashion_tpu.core.distributed import host_shard, make_global_batch
    from difashion_tpu.engine.train import (
        TrainBatch,
        build_train_step,
        split_params,
    )
    from difashion_tpu.models.difashion import create_difashion
    from jax.sharding import NamedSharding, PartitionSpec as P

    cfg = ModelConfig.tiny()
    model, params = create_difashion(cfg, jax.random.PRNGKey(0))
    tcfg = TrainConfig(learning_rate=1e-4)
    step_fn, init_fn = build_train_step(model, tcfg)
    state = init_fn(params)

    B, olen = 8, 4
    hdim, C = cfg.unet.sample_size, cfg.vae.latent_channels
    key = jax.random.PRNGKey(1)
    # host-side global batch: identical on every process (pure function of seed)
    rng = np.random.RandomState(11)
    global_batch = {
        "latent_mean": (rng.randn(B, olen, hdim, hdim, C) * 0.5).astype(np.float32),
        "latent_logvar": np.full((B, olen, hdim, hdim, C), -6.0, np.float32),
        "input_ids": rng.randint(0, cfg.text.vocab_size,
                                 size=(B, olen, 77)).astype(np.int32),
        "hist_latents": (rng.randn(B, olen, hdim, hdim, C) * 0.1
                         ).astype(np.float32),
    }
    local = host_shard(global_batch)
    placed = make_global_batch(local, mesh)
    batch = TrainBatch(images=None, **placed)

    repl = NamedSharding(mesh, P())
    state = jax.tree_util.tree_map(lambda x: jax.device_put(x, repl), state)
    null_lat = jax.device_put(jnp.zeros((hdim, hdim, C)), repl)
    null_text = jax.device_put(jnp.zeros((77, cfg.text.hidden_size)), repl)

    new_state, metrics = jax.jit(step_fn)(state, batch, null_lat, null_text,
                                          jax.random.PRNGKey(2))
    jax.block_until_ready(new_state.params)
    loss = float(metrics["loss"])
    trainable, _ = split_params(new_state.params)
    flat = {
        jax.tree_util.keystr(p): np.asarray(leaf)
        for p, leaf in jax.tree_util.tree_leaves_with_path(trainable)
    }
    return loss, flat


def run_one_generation(mesh):
    """One deterministic 5-step sharded generation over `mesh` (any process
    layout). Returns the full gathered latents [F, h, w, C] as np.ndarray —
    identical global inputs on every process (pure functions of fixed seeds),
    so the multi-process run must equal the single-process one."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from difashion_tpu.core.config import ModelConfig
    from difashion_tpu.engine.generate import (
        GenerationInputs,
        build_sampler,
        make_guidance_spec,
        shard_generation_inputs,
    )
    from difashion_tpu.models.difashion import create_difashion
    from jax.sharding import NamedSharding, PartitionSpec as P

    cfg = ModelConfig.tiny()
    model, params = create_difashion(cfg, jax.random.PRNGKey(0))
    B, olen = len(mesh.devices.flat), 4
    hdim, C = cfg.unet.sample_size, cfg.vae.latent_channels
    spec = make_guidance_spec(12.0, 4.0, 5.0)
    sampler = jax.jit(
        build_sampler(model, num_inference_steps=5, spec=spec, eta=0.1)
    )
    # Host numpy (not device arrays): device_put to a GLOBAL sharding requires
    # process-identical host data under multiprocess; jax.random draws are
    # deterministic, so every process materializes the same values.
    rng = np.random.RandomState(13)
    inputs = GenerationInputs(
        init_latents=rng.randn(B * olen, hdim, hdim, C).astype(np.float32),
        outfit_idx=np.repeat(np.arange(B, dtype=np.int32), olen),
        known_latents=(rng.randn(B, olen, hdim, hdim, C) * 0.1
                       ).astype(np.float32),
        gen_mask=np.ones((B, olen), bool),
        gen_index=np.arange(B * olen, dtype=np.int32).reshape(B, olen),
        hist_latents=(rng.randn(B * olen, hdim, hdim, C) * 0.1
                      ).astype(np.float32),
        cate_text=np.zeros((B * olen, 77, cfg.text.hidden_size), np.float32),
        null_text=np.zeros((77, cfg.text.hidden_size), np.float32),
        null_latent=np.zeros((hdim, hdim, C), np.float32),
    )
    repl = NamedSharding(mesh, P())
    params = jax.tree_util.tree_map(
        lambda x: jax.device_put(np.asarray(x), repl), params
    )
    lat = sampler(params, shard_generation_inputs(inputs, mesh))
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(lat, tiled=True))
    return np.asarray(lat)


def main():
    process_id, num_processes, port, out = (
        int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    )
    mode = sys.argv[5] if len(sys.argv) > 5 else "train"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=num_processes,
        process_id=process_id,
    )
    assert jax.process_count() == num_processes
    import numpy as np
    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()), ("dp",))
    if mode == "generate":
        lat = run_one_generation(mesh)
        if process_id == 0:
            np.savez(out, latents=lat)
    else:
        loss, flat = run_one_step(mesh)
        if process_id == 0:
            np.savez(out, __loss__=loss, **flat)
    jax.distributed.shutdown()


if __name__ == "__main__":
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
    main()
