"""A/B the attention data-layout strategies around the flash kernel on TPU.

Strategies for getting [B, S, C] activations into per-head attention and back:
  transpose: Dense qkv -> reshape -> transpose(0,2,1,3) -> flash3d -> transpose back
  einsum:    einsum('bsc,chd->bhsd') so XLA may fuse the transpose into the dot
             epilogue; output side einsum('bhsd,hdc->bsc') fuses untranspose+proj
  packed:    one merged [C, 3HD] dot then einsum-split

Prints ms per composite call (sandwiched between GroupNorm-ish elementwise ops so
layout effects on neighbors are visible). One JSON line per strategy.
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from difashion_tpu.nn.pallas.flash_attention import flash_attention

B, S, H, D, C = 16, 4096, 5, 64, 320
CTX = 77
DT = jnp.bfloat16


def sync(x):
    return float(jnp.asarray(x).reshape(-1)[0])


def make_params(key):
    ks = jax.random.split(key, 6)
    return dict(
        wq=jax.random.normal(ks[0], (C, H * D), DT) * 0.02,
        wk=jax.random.normal(ks[1], (C, H * D), DT) * 0.02,
        wv=jax.random.normal(ks[2], (C, H * D), DT) * 0.02,
        wo=jax.random.normal(ks[3], (H * D, C), DT) * 0.02,
        bo=jnp.zeros((C,), DT),
    )


def attn_transpose(p, x):
    q = (x @ p["wq"]).reshape(B, S, H, D).transpose(0, 2, 1, 3)
    k = (x @ p["wk"]).reshape(B, S, H, D).transpose(0, 2, 1, 3)
    v = (x @ p["wv"]).reshape(B, S, H, D).transpose(0, 2, 1, 3)
    o = flash_attention(q, k, v)
    o = o.transpose(0, 2, 1, 3).reshape(B, S, H * D)
    return o @ p["wo"] + p["bo"]


def attn_einsum(p, x):
    q = jnp.einsum("bsc,chd->bhsd", x, p["wq"].reshape(C, H, D))
    k = jnp.einsum("bsc,chd->bhsd", x, p["wk"].reshape(C, H, D))
    v = jnp.einsum("bsc,chd->bhsd", x, p["wv"].reshape(C, H, D))
    o = flash_attention(q, k, v)
    return jnp.einsum("bhsd,hdc->bsc", o, p["wo"].reshape(H, D, C)) + p["bo"]


def attn_packed(p, x):
    w = jnp.concatenate([p["wq"], p["wk"], p["wv"]], axis=1)  # [C, 3HD]
    qkv = jnp.einsum("bsc,chd->bhsd", x, w.reshape(C, 3 * H, D))
    q, k, v = qkv[:, :H], qkv[:, H:2 * H], qkv[:, 2 * H:]
    o = flash_attention(q, k, v)
    return jnp.einsum("bhsd,hdc->bsc", o, p["wo"].reshape(H, D, C)) + p["bo"]


def sandwich(attn, p, x):
    # mimic the Transformer2D context: elementwise pre/post in NHWC-ish form
    h = x * jax.nn.sigmoid(x)
    h = attn(p, h)
    return x + h


def bench(fn, p, x, iters=20):
    f = jax.jit(functools.partial(sandwich, fn))
    sync(f(p, x))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(p, x)
    sync(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    key = jax.random.PRNGKey(0)
    p = make_params(key)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, S, C), DT)
    for name, fn in [("transpose", attn_transpose), ("einsum", attn_einsum),
                     ("packed", attn_packed)]:
        ms = bench(fn, p, x)
        print(json.dumps({"strategy": name, "ms": round(ms, 3)}), flush=True)


if __name__ == "__main__":
    main()
