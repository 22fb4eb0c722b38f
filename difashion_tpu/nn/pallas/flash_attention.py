"""Pallas TPU flash attention — forward AND backward kernels (training-grade).

TPU-native replacement for the xformers memory-efficient attention the reference enables
on its UNet (`/root/reference/DiFashion/models/difashion.py:109-120`), used in both the
sampling loop and the training step (so it needs a VJP). The hot case is the UNet's
top-level self-attention: 4096 tokens (64x64 latents) x 64-dim heads; cross-attention
(77 text tokens) routes through the same kernels with right-padded KV masked out.

Design (FA2-style):
  * forward: grid (batch*heads, Sq/block_q); online softmax over KV blocks with the
    running (max, denom) carried as register values; emits O and the per-row
    logsumexp L as residuals. MXU dots run in the input dtype (bf16) with fp32
    accumulation — upcasting operands first would force 8x-slower fp32 MXU passes.
  * backward dQ: same grid; recomputes P = exp(S - L) per KV block,
    dQ += (P * (dO V^T - D)) K * scale, with D = rowsum(dO * O) precomputed in XLA.
  * backward dK/dV: grid (batch*heads, Skv/block_kv); loops Q blocks,
    dV += P^T dO and dK += (P * (dO V^T - D))^T Q * scale.
No [Sq, Skv] matrix ever touches HBM in either direction.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LOG2E = math.log2(math.e)

# Mosaic's default scoped-VMEM budget is 16 MB of the chip's 128 MB; the flash
# schedules want headroom for unrolled softmax pipelining + resident K/V. Both
# grid dims are embarrassingly parallel in every kernel here.
_COMPILER_PARAMS = pltpu.CompilerParams(
    dimension_semantics=("parallel", "parallel"),
    vmem_limit_bytes=100 * 1024 * 1024,
)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale, block_kv, kv_len,
                kv_padded):
    # scale folded together with log2(e): scores live in the base-2 domain, so the
    # softmax uses exp2 directly (exp(x) lowers to exp2(x*log2e) — pre-scaling q
    # removes that per-element multiply from the hot [block_q, block_kv] loop).
    q = q_ref[0] * jnp.asarray(scale * LOG2E, q_ref.dtype)   # [block_q, d]
    block_q, d = q.shape
    num_kv = kv_padded // block_kv

    acc0 = jnp.zeros((block_q, d), jnp.float32)
    m0 = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)

    def body(i, carry):
        acc, m, l = carry
        k = k_ref[0, pl.ds(i * block_kv, block_kv), :]
        v = v_ref[0, pl.ds(i * block_kv, block_kv), :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if kv_len != kv_padded:
            col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 1)
            s = jnp.where(col + i * block_kv < kv_len, s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp2(s - m_new)
        alpha = jnp.exp2(m - m_new)
        l_new = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return alpha * acc + pv, m_new, l_new

    # Static unroll lets Mosaic software-pipeline the VPU softmax of block i
    # against the MXU QK dot of block i+1 (a fori_loop body serializes them) —
    # but every unrolled iteration's live temporaries (fp32 scores + p + pv)
    # occupy scoped VMEM simultaneously, alongside the resident K/V. The
    # pallas_call raises Mosaic's scoped-VMEM budget to 100 MB (_COMPILER_PARAMS);
    # keep the static estimate comfortably inside it or fall back to the rolled
    # loop.
    iter_bytes = block_q * block_kv * 6 + block_q * d * 4
    kv_bytes = 2 * kv_padded * d * jnp.dtype(k_ref.dtype).itemsize
    if num_kv <= 16 and kv_bytes + num_kv * iter_bytes <= 48 * 1024 * 1024:
        carry = (acc0, m0, l0)
        for i in range(num_kv):
            carry = body(i, carry)
        acc, m, l = carry
    else:
        acc, m, l = jax.lax.fori_loop(0, num_kv, body, (acc0, m0, l0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)
    # lse is materialized as [8 sublanes, block_q] (TPU block shapes need the
    # second-to-last dim divisible by 8); all 8 rows carry the same values.
    # Emitted in the natural-log domain (m is base-2: divide back by log2e).
    lse = (m / LOG2E + jnp.log(l))[:, 0]
    lse_ref[0] = jnp.broadcast_to(lse[None, :], (8, lse.shape[0]))


def _forward(q, k, v, scale, block_q, block_kv, interpret, kv_len):
    """q [bh, sq_pad, d]; k, v [bh, skv_pad, d] -> (o, lse [bh, sq_pad] fp32)."""
    bh, sq_pad, d = q.shape
    skv_pad = k.shape[1]
    kernel = functools.partial(
        _fwd_kernel, scale=scale, block_kv=block_kv, kv_len=kv_len,
        kv_padded=skv_pad,
    )
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((bh, sq_pad, d), q.dtype),
            jax.ShapeDtypeStruct((bh, 8, sq_pad), jnp.float32),
        ),
        grid=(bh, sq_pad // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, skv_pad, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, skv_pad, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, block_q), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ),
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(q, k, v)


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------

def _dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, *,
               scale, block_kv, kv_len, kv_padded):
    q = q_ref[0]                                        # [block_q, d] input dtype
    do = do_ref[0]
    # base-2 domain (see _fwd_kernel): p = exp2(s2 - lse*log2e)
    lse = lse_ref[0, 0][:, None] * LOG2E                # [block_q, 1] fp32
    delta = delta_ref[0, 0][:, None]
    block_q, d = q.shape
    num_kv = kv_padded // block_kv
    qs = q * jnp.asarray(scale * LOG2E, q.dtype)

    def body(i, dq):
        k = k_ref[0, pl.ds(i * block_kv, block_kv), :]
        v = v_ref[0, pl.ds(i * block_kv, block_kv), :]
        s = jax.lax.dot_general(
            qs, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        p = jnp.exp2(s - lse)
        if kv_len != kv_padded:
            col = jax.lax.broadcasted_iota(jnp.int32, p.shape, 1)
            p = jnp.where(col + i * block_kv < kv_len, p, 0.0)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta)
        dq_inc = jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return dq + dq_inc

    # Static unroll for the same reason as _fwd_kernel: a fori_loop body
    # serializes the VPU exp2/mask work against the three MXU dots; unrolling
    # lets Mosaic software-pipeline them across KV blocks (the forward's 1.7x).
    iter_bytes = block_q * block_kv * 14 + block_q * d * 4
    kv_bytes = 2 * kv_padded * d * jnp.dtype(k_ref.dtype).itemsize
    dq0 = jnp.zeros((block_q, d), jnp.float32)
    if num_kv <= 16 and kv_bytes + num_kv * iter_bytes <= 48 * 1024 * 1024:
        dq = dq0
        for i in range(num_kv):
            dq = body(i, dq)
    else:
        dq = jax.lax.fori_loop(0, num_kv, body, dq0)
    dq_ref[0] = (dq * scale).astype(dq_ref.dtype)


def _dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref, *,
                scale, block_q, q_padded, kv_len, block_kv):
    k = k_ref[0]                                        # [block_kv, d]
    v = v_ref[0]
    num_q = q_padded // block_q
    kv_start = pl.program_id(1) * block_kv

    def body(i, carry):
        dk, dv = carry
        q = q_ref[0, pl.ds(i * block_q, block_q), :]
        do = do_ref[0, pl.ds(i * block_q, block_q), :]
        lse = lse_ref[0, 0, pl.ds(i * block_q, block_q)][:, None] * LOG2E
        delta = delta_ref[0, 0, pl.ds(i * block_q, block_q)][:, None]
        qs = q * jnp.asarray(scale * LOG2E, q.dtype)
        s = jax.lax.dot_general(
            qs, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )                                               # [block_q, block_kv]
        p = jnp.exp2(s - lse)
        if kv_len is not None:
            col = jax.lax.broadcasted_iota(jnp.int32, p.shape, 1)
            p = jnp.where(col + kv_start < kv_len, p, 0.0)
        dv_inc = jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                               # [block_kv, d]
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta)
        dk_inc = jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                               # [block_kv, d]
        return dk + dk_inc, dv + dv_inc

    z = jnp.zeros(k.shape, jnp.float32)
    # Static unroll (see _dq_kernel): pipeline the per-Q-block VPU work against
    # the four MXU dots. Resident q/do are [q_padded, d] here, so the budget
    # check counts them instead of K/V.
    d = k.shape[-1]
    iter_bytes = block_q * block_kv * 14 + block_kv * d * 8
    q_bytes = 2 * q_padded * d * jnp.dtype(q_ref.dtype).itemsize
    if num_q <= 16 and q_bytes + num_q * iter_bytes <= 48 * 1024 * 1024:
        dk, dv = z, z
        for i in range(num_q):
            dk, dv = body(i, (dk, dv))
    else:
        dk, dv = jax.lax.fori_loop(0, num_q, body, (z, z))
    dk_ref[0] = (dk * scale).astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _backward(q, k, v, o, lse, do, scale, block_q, block_kv, interpret, kv_len):
    bh, sq_pad, d = q.shape
    skv_pad = k.shape[1]
    # D = rowsum(dO * O): cheap elementwise, fused by XLA outside the kernels.
    # Padded q rows contribute p==0 via their lse; their delta values are unused.
    # Same (bh, 8, sq) sublane-broadcast layout as lse (TPU block-shape rule).
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
    delta = jnp.broadcast_to(delta[:, None, :], (bh, 8, sq_pad))

    dq = pl.pallas_call(
        functools.partial(
            _dq_kernel, scale=scale, block_kv=block_kv, kv_len=kv_len,
            kv_padded=skv_pad,
        ),
        out_shape=jax.ShapeDtypeStruct((bh, sq_pad, d), q.dtype),
        grid=(bh, sq_pad // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, skv_pad, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, skv_pad, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, block_q), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, block_q), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(q, k, v, do, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(
            _dkv_kernel, scale=scale, block_q=block_q, q_padded=sq_pad,
            kv_len=kv_len if kv_len != skv_pad else None, block_kv=block_kv,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, skv_pad, d), k.dtype),
            jax.ShapeDtypeStruct((bh, skv_pad, d), v.dtype),
        ),
        grid=(bh, skv_pad // block_kv),
        in_specs=[
            pl.BlockSpec((1, sq_pad, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_kv, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_kv, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sq_pad, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, sq_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, sq_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_kv, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_kv, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ),
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(q, k, v, do, lse, delta)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# custom-vjp core over padded [bh, S, d] arrays
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9))
def _flash_core(q, k, v, scale, block_q, block_kv, interpret, kv_len,
                bwd_block_q, bwd_block_kv):
    o, _ = _forward(q, k, v, scale, block_q, block_kv, interpret, kv_len)
    return o


def _flash_core_fwd(q, k, v, scale, block_q, block_kv, interpret, kv_len,
                    bwd_block_q, bwd_block_kv):
    o, lse = _forward(q, k, v, scale, block_q, block_kv, interpret, kv_len)
    return o, (q, k, v, o, lse)


def _flash_core_bwd(scale, block_q, block_kv, interpret, kv_len, bwd_block_q,
                    bwd_block_kv, res, do):
    q, k, v, o, lse = res
    return _backward(q, k, v, o, lse, do, scale, bwd_block_q, bwd_block_kv,
                     interpret, kv_len)


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)


import os as _os

# Autotuned block schedules, keyed on the query length (tools/bench_flash.py;
# sweep logs in tools/logs/):
#   * round 2 (16 MB default scoped VMEM): bq=512 x bkv=512 fastest at the
#     UNet's 4096-token level — the unrolled KV loop lets Mosaic overlap block
#     i's VPU softmax with block i+1's MXU QK dot; 1024-row blocks then
#     exceeded scoped VMEM.
#   * round 4 fwd re-sweep under the 100 MB vmem_limit_bytes every pallas_call
#     now sets (_COMPILER_PARAMS): 1024x1024 beats 512x512 by 3.1% STANDALONE
#     at 4096 tokens (5.978 vs 6.164 ms, B16 H5 D64) but loses IN CONTEXT —
#     0.8-1.0% in-sampler whether applied globally or only at sq>=4096, and
#     1.3% in the train step (0.3226 vs 0.3184 s) — so the forward keeps
#     512x512 everywhere (tools/logs/flash_e2e_ab_r4.log, all four leg pairs).
#   * round 4 bwd sweep (random-cotangent jax.vjp harness): at 4096 tokens the
#     512x512 dQ/dKV schedule stays best (19.49 ms; 1024x1024 = 20.17 ms); at
#     1024 tokens 1024x1024 wins 2% standalone (6.06 vs 6.18 ms) and the
#     recipe train step confirms in context: 0.332 -> 0.3184 s/step (-4.1%,
#     25.1 img/s/chip) with fwd pinned at 512.
# Env vars override the table when set (0/unset = auto).
_ENV_BLOCK_Q = int(_os.environ.get("DIFASHION_FLASH_BLOCK_Q", "0"))
_ENV_BLOCK_KV = int(_os.environ.get("DIFASHION_FLASH_BLOCK_KV", "0"))
_ENV_BWD_BLOCK_Q = int(_os.environ.get("DIFASHION_FLASH_BWD_BLOCK_Q", "0"))
_ENV_BWD_BLOCK_KV = int(_os.environ.get("DIFASHION_FLASH_BWD_BLOCK_KV", "0"))


def _pick_schedule(sq: int):
    """(fwd_block_q, fwd_block_kv), (bwd_block_q, bwd_block_kv) for this shape."""
    if sq >= 4096:
        fwd, bwd = (512, 512), (512, 512)
    else:
        fwd, bwd = (512, 512), (1024, 1024)
    fwd = (_ENV_BLOCK_Q or fwd[0], _ENV_BLOCK_KV or fwd[1])
    bwd = (_ENV_BWD_BLOCK_Q or bwd[0], _ENV_BWD_BLOCK_KV or bwd[1])
    return fwd, bwd


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float | None = None,
    block_q: int | None = None,
    block_kv: int | None = None,
    interpret: bool = False,
    bwd_block_q: int | None = None,
    bwd_block_kv: int | None = None,
) -> jnp.ndarray:
    """Non-causal multi-head attention with Pallas forward + backward.

    Args:
      q: [B, H, Sq, D]
      k, v: [B, H, Skv, D] (Skv may be ragged, e.g. 77 text tokens; padded + masked)
      block_q/block_kv, bwd_block_q/bwd_block_kv: schedule overrides (default:
        the measured per-shape table, `_pick_schedule`). Backward blocks must
        divide the forward's padded lengths; clamped if not.
    Returns: [B, H, Sq, D], dtype of q. Differentiable w.r.t. q/k/v.
    """
    b, h, sq, d = q.shape
    skv = k.shape[2]
    if scale is None:
        scale = 1.0 / math.sqrt(d)

    auto_fwd, auto_bwd = _pick_schedule(sq)
    if block_q is None:
        block_q = auto_fwd[0]
    if block_kv is None:
        block_kv = auto_fwd[1]

    # Wide heads (the VAE mid-attention's d=512) multiply every per-block
    # temporary by d/64; clamp the q block so q/o/acc tiles stay register-sized
    # (the 512x512 default schedule stack-OOMs the 16 MB scoped VMEM at d=512).
    if d >= 256:
        block_q = min(block_q, 256)
    block_q = min(block_q, _round_up(sq, 128))
    block_kv = min(block_kv, _round_up(skv, 128))
    sq_pad = _round_up(sq, block_q)
    skv_pad = _round_up(skv, block_kv)

    if bwd_block_q is None:
        bwd_block_q = auto_bwd[0]
    if bwd_block_kv is None:
        bwd_block_kv = auto_bwd[1]
    if d >= 256:
        bwd_block_q = min(bwd_block_q, 256)
    # bwd blocks must tile the fwd-padded lengths exactly
    while sq_pad % bwd_block_q:
        bwd_block_q //= 2
    while skv_pad % bwd_block_kv:
        bwd_block_kv //= 2

    qf = q.reshape(b * h, sq, d)
    kf = k.reshape(b * h, skv, d)
    vf = v.reshape(b * h, skv, d)
    if sq_pad != sq:
        qf = jnp.pad(qf, [(0, 0), (0, sq_pad - sq), (0, 0)])
    if skv_pad != skv:
        kf = jnp.pad(kf, [(0, 0), (0, skv_pad - skv), (0, 0)])
        vf = jnp.pad(vf, [(0, 0), (0, skv_pad - skv), (0, 0)])

    out = _flash_core(qf, kf, vf, scale, block_q, block_kv, interpret, skv,
                      bwd_block_q, bwd_block_kv)
    return out[:, :sq, :].reshape(b, h, sq, d)
