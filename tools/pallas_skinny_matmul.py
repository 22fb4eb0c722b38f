"""Pallas matmul experiment for the UNet's skinny Dense layers — NEGATIVE RESULT.

XLA on this stack runs [M, 320] x [320, 320]-shaped dots (transformer qkv/out,
proj_in/proj_out, GEGLU down-projection — every Dense whose N is a few lane
tiles) at 7-25 TFLOP/s even standalone (tools/bench_dots.py), an order of
magnitude off the bandwidth bound. This kernel tiles M across the grid, keeps
the whole weight (and bias) resident in VMEM, and runs one MXU dot per tile —
the op should then be limited by streaming x/o through HBM.

Measured on the v5e (round 2): the kernel MATCHES XLA's time for these shapes
at every block size tried — the skinny-N floor is a chip/Mosaic property, not
an XLA scheduling bug, so the kernel is NOT wired into the model. Kept under
tools/ as the evidence behind BASELINE.md's practical-ceiling analysis.

Backward: custom VJP — dx reuses the same kernel with w^T (same skinny shape),
dw/db go through XLA (K-large reductions, which XLA handles well).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# engage for skinny outputs only; XLA is competitive once N is wide
_MAX_N = 1280
_MAX_W_BYTES = 8 * 1024 * 1024
_MIN_M = 2048
_BLOCK_M = 1024

_PARAMS = pltpu.CompilerParams(dimension_semantics=("parallel",))


def _mm_kernel(x_ref, w_ref, o_ref):
    o_ref[...] = jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def _mm_call(x, w, block_m, interpret):
    M, K = x.shape
    N = w.shape[1]
    return pl.pallas_call(
        _mm_kernel,
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        grid=(M // block_m,),
        in_specs=[
            pl.BlockSpec((block_m, K), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, N), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=_PARAMS,
        interpret=interpret,
    )(x, w)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _matmul(x, w, block_m, interpret):
    return _mm_call(x, w, block_m, interpret)


def _matmul_fwd(x, w, block_m, interpret):
    return _mm_call(x, w, block_m, interpret), (x, w)


def _matmul_bwd(block_m, interpret, res, g):
    x, w = res
    # dx = g @ w^T is skinny again -> same kernel; dw = x^T @ g has K = M
    # (huge contraction), which XLA does well.
    dx = _mm_call(g, w.T, block_m, interpret)
    dw = jax.lax.dot_general(
        x, g, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(w.dtype)
    return dx, dw


_matmul.defvjp(_matmul_fwd, _matmul_bwd)


def matmul_2d(x: jnp.ndarray, w: jnp.ndarray, *, block_m: int = _BLOCK_M,
              interpret: bool = False) -> jnp.ndarray:
    """[M, K] x [K, N] with the M axis padded to the block size as needed."""
    M = x.shape[0]
    block_m = min(block_m, max(512, M))
    pad = (-M) % block_m
    if pad:
        x = jnp.pad(x, [(0, pad), (0, 0)])
    out = _matmul(x, w, block_m, interpret)
    return out[:M] if pad else out


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _simple_dn(ndim_l: int, dimension_numbers) -> bool:
    (lc, rc), (lb, rb) = dimension_numbers
    return (tuple(lc), tuple(rc)) == ((ndim_l - 1,), (0,)) and not lb and not rb


def pallas_dense_dot(lhs, rhs, dimension_numbers, precision=None,
                     preferred_element_type=None):
    """Drop-in for `lax.dot_general` restricted to Dense's contraction pattern;
    pass as `nn.Dense(dot_general=pallas_dense_dot)`."""
    if (rhs.ndim == 2 and _simple_dn(lhs.ndim, dimension_numbers)
            and _on_tpu()
            and rhs.shape[1] <= _MAX_N
            and rhs.size * rhs.dtype.itemsize <= _MAX_W_BYTES
            and lhs.dtype == rhs.dtype):
        lead = lhs.shape[:-1]
        M = 1
        for d in lead:
            M *= d
        if M >= _MIN_M and M % 512 == 0:
            out = matmul_2d(lhs.reshape(M, lhs.shape[-1]), rhs)
            if preferred_element_type is not None:
                out = out.astype(preferred_element_type)
            return out.reshape(lead + (rhs.shape[1],))
    return jax.lax.dot_general(
        lhs, rhs, dimension_numbers, precision=precision,
        preferred_element_type=preferred_element_type,
    )
