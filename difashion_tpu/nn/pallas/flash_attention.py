"""Pallas TPU flash-attention kernel.

TPU-native replacement for the xformers memory-efficient attention the reference enables
on its UNet (`/root/reference/DiFashion/models/difashion.py:109-120`). The hot case is the
UNet's top-level self-attention: 4096 tokens (64x64 latents) x 64-dim heads; cross-attention
(77 text tokens) also routes through here with right-padded KV masked out.

Design: classic blocked flash attention. Grid = (batch*heads, Sq/block_q); each program
streams KV blocks through VMEM with an online-softmax running (max, denom) carried as
register values, accumulating the weighted values in fp32. No materialized [Sq, Skv]
matrix ever touches HBM.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, block_kv, kv_len, kv_padded):
    """One (batch*head, q-block) program: online softmax over KV blocks.

    MXU discipline: the two matmuls run in the INPUT dtype (bf16 on TPU) with fp32
    accumulation via preferred_element_type — upcasting operands first would force
    8x-slower fp32 MXU passes. Only the softmax statistics live in fp32.
    """
    q = (q_ref[0] * jnp.asarray(scale, q_ref.dtype))    # [block_q, d], input dtype
    block_q, d = q.shape
    num_kv_blocks = kv_padded // block_kv

    acc0 = jnp.zeros((block_q, d), jnp.float32)
    m0 = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)

    def body(i, carry):
        acc, m, l = carry
        k = k_ref[0, pl.ds(i * block_kv, block_kv), :]
        v = v_ref[0, pl.ds(i * block_kv, block_kv), :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )                                               # [block_q, block_kv] fp32
        if kv_len != kv_padded:
            col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 1)
            s = jnp.where(col + i * block_kv < kv_len, s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_new = alpha * acc + pv
        return acc_new, m_new, l_new

    acc, m, l = jax.lax.fori_loop(0, num_kv_blocks, body, (acc0, m0, l0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(
    jax.jit, static_argnames=("scale", "block_q", "block_kv", "interpret")
)
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float | None = None,
    block_q: int = 512,
    block_kv: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """Non-causal multi-head attention.

    Args:
      q: [B, H, Sq, D]
      k, v: [B, H, Skv, D]  (Skv may be ragged, e.g. 77 text tokens; padded internally)
    Returns: [B, H, Sq, D], dtype of q.
    """
    b, h, sq, d = q.shape
    skv = k.shape[2]
    if scale is None:
        scale = 1.0 / math.sqrt(d)

    block_q = min(block_q, _round_up(sq, 128))
    block_kv = min(block_kv, _round_up(skv, 128))
    sq_pad = _round_up(sq, block_q)
    skv_pad = _round_up(skv, block_kv)

    qf = q.reshape(b * h, sq, d)
    kf = k.reshape(b * h, skv, d)
    vf = v.reshape(b * h, skv, d)
    if sq_pad != sq:
        qf = jnp.pad(qf, [(0, 0), (0, sq_pad - sq), (0, 0)])
    if skv_pad != skv:
        kf = jnp.pad(kf, [(0, 0), (0, skv_pad - skv), (0, 0)])
        vf = jnp.pad(vf, [(0, 0), (0, skv_pad - skv), (0, 0)])

    grid = (b * h, sq_pad // block_q)
    kernel = functools.partial(
        _flash_kernel, scale=scale, block_kv=block_kv, kv_len=skv, kv_padded=skv_pad
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b * h, sq_pad, d), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, skv_pad, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, skv_pad, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(qf, kf, vf)

    out = out[:, :sq, :].reshape(b, h, sq, d)
    return out
