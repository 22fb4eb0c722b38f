"""Fused GroupNorm(+SiLU) Pallas kernel: numerics vs torch semantics, VJP, fallbacks."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from difashion_tpu.nn.pallas.groupnorm import (
    _VMEM_BLOCK_LIMIT,
    _gn_silu_ref,
    group_norm_act,
)


@pytest.mark.parametrize("shape,groups", [
    ((2, 8, 8, 320), 32),     # UNet 64x64-level channel count
    ((3, 4, 4, 64), 8),
    ((1, 16, 16, 96), 32),    # C/G = 3 (non-lane-aligned group width)
])
@pytest.mark.parametrize("act", [None, "silu"])
def test_kernel_matches_reference(shape, groups, act):
    rng = np.random.RandomState(0)
    C = shape[-1]
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    s = jnp.asarray(rng.randn(C).astype(np.float32))
    b = jnp.asarray(rng.randn(C).astype(np.float32))
    got = group_norm_act(x, s, b, groups=groups, eps=1e-5, act=act, interpret=True)
    ref = _gn_silu_ref(
        x.reshape(shape[0], -1, C), s, b, groups, 1e-5, act or "none"
    ).reshape(shape)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6, rtol=2e-6)


def test_kernel_matches_torch_groupnorm():
    from golden_oracle import oracle

    rng = np.random.RandomState(1)
    B, H, W, C, G = 2, 6, 6, 64, 8
    x = rng.randn(B, H, W, C).astype(np.float32)
    s = rng.randn(C).astype(np.float32)
    b = rng.randn(C).astype(np.float32)
    got = group_norm_act(jnp.asarray(x), jnp.asarray(s), jnp.asarray(b),
                         groups=G, eps=1e-5, act="silu", interpret=True)

    def compute():
        import torch

        gn = torch.nn.GroupNorm(G, C, eps=1e-5)
        with torch.no_grad():
            gn.weight.copy_(torch.from_numpy(s))
            gn.bias.copy_(torch.from_numpy(b))
            ref = torch.nn.functional.silu(
                gn(torch.from_numpy(np.moveaxis(x, -1, 1).copy()))
            ).numpy()
        return {"ref": np.moveaxis(ref, 1, -1)}

    ref = oracle("prim_pallas_gn_silu", compute)["ref"]
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5, rtol=1e-5)


def test_bf16_path_and_fp32_stats():
    """Stats run fp32 inside the kernel even for bf16 data: an offset that would
    catastrophically cancel in bf16 still normalizes correctly."""
    rng = np.random.RandomState(2)
    B, S, C, G = 1, 64, 128, 8
    base = rng.randn(B, S, C).astype(np.float32) + 100.0   # large common offset
    x = jnp.asarray(base).astype(jnp.bfloat16)
    s = jnp.ones(C, jnp.float32)
    b = jnp.zeros(C, jnp.float32)
    got = group_norm_act(x, s, b, groups=G, act=None, interpret=True)
    ref = _gn_silu_ref(x, s, b, G, 1e-5, "none")
    # kernel sums via MXU matmuls, ref via jnp reductions: different reduction
    # order can flip the final bf16 rounding of isolated elements (one ulp)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        atol=0.05, rtol=0.02,
    )
    # normalized output must be ~zero-mean despite the +100 offset
    assert abs(float(jnp.mean(got.astype(jnp.float32)))) < 0.05


def test_custom_vjp_matches_reference_grad():
    rng = np.random.RandomState(3)
    B, H, W, C, G = 2, 4, 4, 64, 8
    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    s = jnp.asarray(rng.randn(C).astype(np.float32))
    b = jnp.asarray(rng.randn(C).astype(np.float32))

    f = lambda x, s, b: jnp.sum(
        group_norm_act(x, s, b, groups=G, act="silu", interpret=True) ** 2
    )
    fr = lambda x, s, b: jnp.sum(
        _gn_silu_ref(x.reshape(B, H * W, C), s, b, G, 1e-5, "silu") ** 2
    )
    g = jax.grad(f, argnums=(0, 1, 2))(x, s, b)
    gr = jax.grad(fr, argnums=(0, 1, 2))(x, s, b)
    for a, r in zip(g, gr):
        np.testing.assert_allclose(
            np.asarray(a).reshape(np.asarray(r).shape), np.asarray(r),
            atol=1e-4, rtol=1e-4,
        )


def test_oversized_block_falls_back():
    """Blocks beyond the VMEM budget route to the jnp path (VAE 512px levels)."""
    C, G = 128, 32
    S = _VMEM_BLOCK_LIMIT // (C * 8) + 8
    x = jnp.ones((1, S, C), jnp.bfloat16)
    out = group_norm_act(x, jnp.ones(C), jnp.zeros(C), groups=G, act="silu",
                         interpret=True)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_module_param_tree_unchanged():
    """GroupNorm's param path must stay `.../GroupNorm_0/{scale,bias}` (checkpoint
    and HF-importer compatibility)."""
    from difashion_tpu.nn.layers import GroupNorm

    gn = GroupNorm(8, 1e-5, act="silu")
    params = gn.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 4, 64)))["params"]
    assert set(params) == {"GroupNorm_0"}
    assert set(params["GroupNorm_0"]) == {"scale", "bias"}
    assert params["GroupNorm_0"]["scale"].shape == (64,)
