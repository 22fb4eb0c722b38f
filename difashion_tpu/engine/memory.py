"""Analytic per-chip HBM accounting for the training state.

Makes the ZeRO-1 motivation concrete instead of hand-waved: the reference trains the
866M-param UNet single-GPU with full fp32 Adam state (`/root/reference/DiFashion/
train.py:572-593` — one device holds params + m + v + EMA). On a 16 GB v5e chip that
replicated-state layout does NOT fit at fp32; `place_state_zero1` (train.py in this
package) shards the optimizer moments + EMA across the dp axis so it does.

Everything here is computed with `jax.eval_shape` — full SD2-base-scale shapes, zero
bytes allocated — so it runs in tests and inside `dryrun_multichip` on any host.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp


def _tree_bytes(tree) -> int:
    return sum(
        x.size * jnp.dtype(x.dtype).itemsize
        for x in jax.tree_util.tree_leaves(tree)
        if hasattr(x, "size")
    )


def _tree_bytes_sharded(tree, ndev: int) -> int:
    """Per-chip bytes under the `place_state_zero1` rule (shared via
    `engine.train.zero1_shard_axis` so accounting can't drift from placement)."""
    from difashion_tpu.engine.train import zero1_shard_axis

    total = 0
    for x in jax.tree_util.tree_leaves(tree):
        if not hasattr(x, "size"):
            continue
        b = x.size * jnp.dtype(x.dtype).itemsize
        total += b // ndev if zero1_shard_axis(x.shape, ndev) is not None else b
    return total


def state_memory_accounting(model_cfg, train_cfg, n_devices: int,
                            param_dtype=jnp.float32) -> Dict[str, Any]:
    """Per-chip HBM bytes of TrainState under (a) pure-DP replication and (b) ZeRO-1
    moment/EMA sharding, at REAL model size via jax.eval_shape (no allocation).

    Returns a dict with byte counts per bucket and per scheme. `grads` is the
    transient gradient pytree live during the optimizer update (same shapes as the
    trainable params at fp32) — it exists in both schemes and is counted separately
    so callers can report state-only or peak-step numbers.
    """
    from difashion_tpu.engine.train import build_train_step, split_params
    from difashion_tpu.models.difashion import create_difashion

    def shapes(rng):
        model, params = create_difashion(model_cfg, rng, dtype=param_dtype)
        _, init_state = build_train_step(model, train_cfg)
        return init_state(params)

    state = jax.eval_shape(shapes, jax.random.PRNGKey(0))
    trainable, frozen = split_params(state.params)

    ndev = max(1, n_devices)
    buckets = {
        "params_trainable": _tree_bytes(trainable),
        "params_frozen": _tree_bytes(frozen),
        "opt_state": _tree_bytes(state.opt_state),
        "ema": _tree_bytes(state.ema.params) if state.ema is not None else 0,
        "grads_transient": sum(
            x.size * 4 for x in jax.tree_util.tree_leaves(trainable)
        ),
    }
    per_chip_dp = sum(buckets.values())
    per_chip_z1 = (
        buckets["params_trainable"]
        + buckets["params_frozen"]
        + buckets["grads_transient"]
        + _tree_bytes_sharded(state.opt_state, ndev)
        + (_tree_bytes_sharded(state.ema.params, ndev)
           if state.ema is not None else 0)
    )
    return {
        "n_devices": ndev,
        "buckets": buckets,
        "per_chip_bytes_dp": per_chip_dp,
        "per_chip_bytes_zero1": per_chip_z1,
        "param_count_trainable": sum(
            x.size for x in jax.tree_util.tree_leaves(trainable)
        ),
    }


def format_accounting(acc: Dict[str, Any], hbm_bytes: int = 16 * 2**30) -> str:
    gb = lambda b: f"{b / 2**30:.2f} GiB"
    lines = [
        f"training-state HBM accounting ({acc['param_count_trainable']/1e6:.0f}M "
        f"trainable params, {acc['n_devices']} devices, {gb(hbm_bytes)}/chip):",
    ]
    for k, v in acc["buckets"].items():
        lines.append(f"  {k:<18} {gb(v)}")
    dp, z1 = acc["per_chip_bytes_dp"], acc["per_chip_bytes_zero1"]
    lines.append(
        f"  per-chip DP (replicated state)  {gb(dp)}"
        f"  -> {'FITS' if dp <= hbm_bytes else 'EXCEEDS'} {gb(hbm_bytes)}"
    )
    lines.append(
        f"  per-chip ZeRO-1 (sharded m/v/EMA) {gb(z1)}"
        f"  -> {'FITS' if z1 <= hbm_bytes else 'EXCEEDS'} {gb(hbm_bytes)}"
    )
    return "\n".join(lines)
