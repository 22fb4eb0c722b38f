"""Fused GroupNorm(+SiLU) Pallas kernel.

The UNet's ResNet blocks are GN -> SiLU -> conv twice per block (reference diffusers
ResnetBlock2D, used at every level of `difashion.py`'s UNet). Unfused, XLA's GN does a
stats pass + a normalize pass with fp32 materialization between them, and the SiLU is
another elementwise pass — 4-5 HBM round-trips over an activation that is read once by
the following conv. This kernel does ONE round-trip: load the block into VMEM in bf16,
compute per-(batch, group) statistics in fp32 via two small MXU matmuls against a
channel->group one-hot (no awkward sub-lane reshapes), then write silu(normalized) back
in bf16.

Shapes: x [B, S, C] (S = H*W flattened spatial), scale/bias [C]; per-batch block must
fit VMEM (all UNet levels do: 64x64x320 bf16 = 2.6 MB; the VAE's 512x512 levels fall
back to the XLA path).

Backward: custom VJP recomputes through the pure-jnp reference (`_gn_silu_ref`) — the
training step is not the throughput north-star, correctness is guaranteed by
construction, and the forward fusion still wins in the loss forward pass.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# per-batch VMEM budget for the single-block kernel (input + output + scratch)
_VMEM_BLOCK_LIMIT = 6 * 1024 * 1024


def _affine_in_dtype() -> bool:
    import os

    return os.environ.get("DIFASHION_GN_BF16_AFFINE") == "1"


def _gn_silu_kernel(x_ref, scale_ref, bias_ref, o_ref, *, groups: int, eps: float,
                    act: str):
    x = x_ref[0].astype(jnp.float32)                   # [S, C]
    S, C = x.shape
    cg = C // groups

    # channel -> group one-hot (built in-registers; [C, G] fp32)
    ch = jax.lax.broadcasted_iota(jnp.int32, (C, groups), 0)
    gr = jax.lax.broadcasted_iota(jnp.int32, (C, groups), 1)
    onehot = (ch // cg == gr).astype(jnp.float32)

    # group sums via MXU: [S, C] @ [C, G] -> [S, G] -> [1, G]
    n = jnp.float32(S * cg)
    gsum = jnp.sum(jnp.dot(x, onehot, preferred_element_type=jnp.float32),
                   axis=0, keepdims=True)              # [1, G]
    gsq = jnp.sum(jnp.dot(x * x, onehot, preferred_element_type=jnp.float32),
                  axis=0, keepdims=True)               # [1, G]
    mean = gsum / n
    var = gsq / n - mean * mean

    # broadcast group stats back to channels: [1, G] @ [G, C]
    rstd = jax.lax.rsqrt(var + eps)                    # [1, G]
    mean_c = jnp.dot(mean, onehot.T, preferred_element_type=jnp.float32)   # [1, C]
    rstd_c = jnp.dot(rstd, onehot.T, preferred_element_type=jnp.float32)   # [1, C]

    a = scale_ref[:] * rstd_c                          # [1, C]
    b = bias_ref[:] - mean_c * a
    y = x * a + b
    if act == "silu":
        y = y * jax.nn.sigmoid(y)
    o_ref[0] = y.astype(o_ref.dtype)


def _gn_silu_ref(x, scale, bias, groups: int, eps: float, act: str):
    """Pure-jnp reference (torch GroupNorm semantics: biased variance, fp32 stats).

    Layout-critical: the big [B, S, C] tensor is only ever reduced over S (the
    sublane dim) and multiplied by [B, 1, C] operands — the channel (lane) dim is
    never split. Reshaping C into [groups, C/groups] on the full activation
    (C/G = 4..40 sub-lane slivers) forces XLA relayouts that run at <100 GB/s;
    the group aggregation here happens on the tiny [B, C] moment arrays instead.
    Measured (tools/bench_vae.py, v5e): the VAE's 256x256x256 GN+SiLU drops
    ~4 ms -> ~0.9 ms with this form.
    """
    B, S, C = x.shape
    cg = C // groups
    n = jnp.float32(S * cg)
    # per-channel spatial moments, fp32 accumulation: [B, C]. The upcasts stay
    # inline (dtype= / per-use astype) so XLA fuses them into each traversal —
    # a shared x.astype(f32) variable gets CSE'd into a materialized fp32 copy
    # of the whole activation (profiler: 0.28 ms per 64x64 GN site).
    s1 = jnp.sum(x, axis=1, dtype=jnp.float32)
    s2 = jnp.sum(jnp.square(x.astype(jnp.float32)), axis=1)
    # channel -> group aggregation on the tiny [B, C] arrays
    g1 = s1.reshape(B, groups, cg).sum(-1)             # [B, G]
    g2 = s2.reshape(B, groups, cg).sum(-1)
    mean_g = g1 / n
    var_g = jnp.maximum(g2 / n - mean_g * mean_g, 0.0)
    rstd_g = jax.lax.rsqrt(var_g + eps)
    # back to per-channel affine: y = x * a + b with a,b [B, 1, C]
    mean_c = jnp.repeat(mean_g, cg, axis=-1)           # [B, C]
    rstd_c = jnp.repeat(rstd_g, cg, axis=-1)
    a = scale.astype(jnp.float32) * rstd_c
    b = bias.astype(jnp.float32) - mean_c * a
    if _affine_in_dtype() and x.dtype != jnp.float32:
        # Opt-in A/B (DIFASHION_GN_BF16_AFFINE=1): apply the affine in the
        # activation dtype. Stats/a/b stay fp32 (above); only the big [B,S,C]
        # traversal drops to bf16 — half the VPU/convert bytes of the
        # normalize pass, at the cost of one bf16 rounding of (x-mean)*rstd.
        y = x * a[:, None, :].astype(x.dtype) + b[:, None, :].astype(x.dtype)
    else:
        y = x.astype(jnp.float32) * a[:, None, :] + b[:, None, :]
        # cast BEFORE the activation: the activation then runs in the compute
        # dtype (bf16 on TPU) — half the VPU bytes, and exactly the unfused
        # GN->silu numerics
        y = y.astype(x.dtype)
    if act == "silu":
        y = jax.nn.silu(y)
    return y


def _pallas_gn_silu(x, scale, bias, groups: int, eps: float, act: str,
                    interpret: bool = False):
    B, S, C = x.shape
    kern = functools.partial(_gn_silu_kernel, groups=groups, eps=eps, act=act)
    return pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, S, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, S, C), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, S, C), x.dtype),
        interpret=interpret,
    )(x, scale.reshape(1, C).astype(jnp.float32),
      bias.reshape(1, C).astype(jnp.float32))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _gn_silu(x, scale, bias, groups, eps, act, interpret):
    return _pallas_gn_silu(x, scale, bias, groups, eps, act, interpret)


def _gn_silu_fwd(x, scale, bias, groups, eps, act, interpret):
    return _pallas_gn_silu(x, scale, bias, groups, eps, act, interpret), (
        x, scale, bias,
    )


def _gn_silu_bwd(groups, eps, act, interpret, res, g):
    x, scale, bias = res
    _, vjp = jax.vjp(
        lambda x_, s_, b_: _gn_silu_ref(x_, s_, b_, groups, eps, act),
        x, scale, bias,
    )
    return vjp(g)


_gn_silu.defvjp(_gn_silu_fwd, _gn_silu_bwd)


def group_norm_cat_act(
    parts,                        # tuple of [B, H, W, Cp] / [B, S, Cp] tensors
    scale: jnp.ndarray,           # [sum Cp]
    bias: jnp.ndarray,            # [sum Cp]
    groups: int = 32,
    eps: float = 1e-5,
    act: Optional[str] = None,
):
    """GroupNorm(+activation) over the virtual channel-concatenation of `parts`,
    returned as separate normalized parts (same shapes as the inputs).

    Numerically the group statistics are those of jnp.concatenate(parts, -1) —
    per-part per-channel moments are concatenated on the tiny [B, C] arrays, so
    the lane-misaligned concat of the full activations (the skip-connection
    hot path: C=320/640/1280, none a lane-tile multiple) never materializes.
    Group boundaries may straddle parts; the per-channel affine split handles
    any boundary."""
    shapes = [p.shape for p in parts]
    x3s = [p.reshape(p.shape[0], -1, p.shape[-1]) for p in parts]
    B = x3s[0].shape[0]
    S = x3s[0].shape[1]
    C = sum(p.shape[-1] for p in x3s)
    cg = C // groups
    n = jnp.float32(S * cg)

    s1 = jnp.concatenate(
        [jnp.sum(p.astype(jnp.float32), axis=1) for p in x3s], axis=-1)  # [B, C]
    s2 = jnp.concatenate(
        [jnp.sum(jnp.square(p.astype(jnp.float32)), axis=1) for p in x3s],
        axis=-1)
    g1 = s1.reshape(B, groups, cg).sum(-1)
    g2 = s2.reshape(B, groups, cg).sum(-1)
    mean_g = g1 / n
    var_g = jnp.maximum(g2 / n - mean_g * mean_g, 0.0)
    rstd_g = jax.lax.rsqrt(var_g + eps)
    mean_c = jnp.repeat(mean_g, cg, axis=-1)
    rstd_c = jnp.repeat(rstd_g, cg, axis=-1)
    a = scale.astype(jnp.float32) * rstd_c                               # [B, C]
    b = bias.astype(jnp.float32) - mean_c * a

    outs = []
    off = 0
    in_dtype = _affine_in_dtype()
    for p, shape in zip(x3s, shapes):
        cp = p.shape[-1]
        if in_dtype and p.dtype != jnp.float32:
            y = (p * a[:, None, off:off + cp].astype(p.dtype)
                 + b[:, None, off:off + cp].astype(p.dtype))
        else:
            y = (p.astype(jnp.float32) * a[:, None, off:off + cp]
                 + b[:, None, off:off + cp]).astype(p.dtype)
        if act == "silu":
            y = jax.nn.silu(y)
        outs.append(y.reshape(shape))
        off += cp
    return tuple(outs)


def group_norm_act(
    x: jnp.ndarray,               # [B, H, W, C] or [B, S, C]
    scale: jnp.ndarray,           # [C]
    bias: jnp.ndarray,            # [C]
    groups: int = 32,
    eps: float = 1e-5,
    act: Optional[str] = None,    # None | "silu"
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Fused GroupNorm(+activation). The Pallas kernel engages on TPU backends for
    blocks that fit VMEM; everywhere else (CPU tests, oversized VAE levels) the
    pure-jnp reference runs — identical numerics, XLA-fused. `interpret=True`
    forces the kernel through the Pallas interpreter (kernel unit tests only)."""
    shape = x.shape
    if x.ndim == 4:
        B, H, W, C = shape
        x3 = x.reshape(B, H * W, C)
    else:
        x3 = x
        B, _, C = shape
    act_name = act or "none"

    # MEASURED (tools/bench_phases.py, v5e): the standalone kernel ties XLA's fused
    # GN+SiLU (0.65 vs 0.58 ms at 16x4096x320 bf16) but the full UNet REGRESSES
    # 120 -> 144 ms with it — ~0.5 ms launch overhead x ~44 GN sites and lost XLA
    # fusion around the kernel boundary. XLA's own fusion is the fast path here, so
    # the kernel stays opt-in (DIFASHION_PALLAS_GN=1) / interpret-tested rather
    # than default. Honest negative result > speculative kernel.
    import os

    want_kernel = interpret or os.environ.get("DIFASHION_PALLAS_GN") == "1"
    block_bytes = x3.shape[1] * C * (2 * x3.dtype.itemsize + 4)
    use_kernel = want_kernel and C % groups == 0 and \
        block_bytes <= _VMEM_BLOCK_LIMIT and \
        (interpret or jax.default_backend() == "tpu")
    if use_kernel:
        out = _gn_silu(x3, scale, bias, groups, eps, act_name, bool(interpret))
    else:
        out = _gn_silu_ref(x3, scale, bias, groups, eps, act_name)
    return out.reshape(shape)
