"""FULL UNet forward parity against a torch replica of the SD architecture.

Per-block torch-parity tests can't catch wiring mistakes — above all the LIFO skip-
connection consumption across down/up blocks, which silently destroys pretrained-weight
quality. This test builds a complete torch UNet (clean-room from the published SD
topology) that loads OUR exported HF-style state dict, and checks the end-to-end forward
on the tiny config to <= 1e-3.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
nn_ = torch.nn
F_ = torch.nn.functional

from difashion_tpu.core.config import ModelConfig
from difashion_tpu.core.importer import export_params
from difashion_tpu.models.unet import init_unet


class TBasicTransformer(nn_.Module):
    def __init__(self, dim, heads, ctx):
        super().__init__()
        self.heads = heads
        self.norm1 = nn_.LayerNorm(dim)
        self.norm2 = nn_.LayerNorm(dim)
        self.norm3 = nn_.LayerNorm(dim)
        mk = lambda i, o, b: nn_.Linear(i, o, bias=b)
        self.q1, self.k1, self.v1 = mk(dim, dim, False), mk(dim, dim, False), mk(dim, dim, False)
        self.o1 = mk(dim, dim, True)
        self.q2 = mk(dim, dim, False)
        self.k2, self.v2 = mk(ctx, dim, False), mk(ctx, dim, False)
        self.o2 = mk(dim, dim, True)
        self.ff0 = mk(dim, dim * 8, True)
        self.ff2 = mk(dim * 4, dim, True)

    def attn(self, q, k, v):
        B, S, D = q.shape
        hd = D // self.heads
        sh = lambda t: t.view(B, -1, self.heads, hd).transpose(1, 2)
        o = F_.scaled_dot_product_attention(sh(q), sh(k), sh(v))
        return o.transpose(1, 2).reshape(B, S, D)

    def forward(self, x, ctx):
        h = self.norm1(x)
        x = x + self.o1(self.attn(self.q1(h), self.k1(h), self.v1(h)))
        h = self.norm2(x)
        x = x + self.o2(self.attn(self.q2(h), self.k2(ctx), self.v2(ctx)))
        h = self.norm3(x)
        h = self.ff0(h)
        a, g = h.chunk(2, dim=-1)
        x = x + self.ff2(a * F_.gelu(g))
        return x


class TSpatial(nn_.Module):
    def __init__(self, ch, heads, ctx, groups):
        super().__init__()
        self.norm = nn_.GroupNorm(groups, ch, eps=1e-6)
        self.proj_in = nn_.Linear(ch, ch)
        self.block = TBasicTransformer(ch, heads, ctx)
        self.proj_out = nn_.Linear(ch, ch)

    def forward(self, x, ctx):
        B, C, H, W = x.shape
        r = x
        h = self.norm(x).permute(0, 2, 3, 1).reshape(B, H * W, C)
        h = self.proj_in(h)
        h = self.block(h, ctx)
        h = self.proj_out(h)
        return h.reshape(B, H, W, C).permute(0, 3, 1, 2) + r


class TRes(nn_.Module):
    def __init__(self, cin, cout, tdim, groups):
        super().__init__()
        self.norm1 = nn_.GroupNorm(groups, cin, eps=1e-5)
        self.conv1 = nn_.Conv2d(cin, cout, 3, padding=1)
        self.temb = nn_.Linear(tdim, cout)
        self.norm2 = nn_.GroupNorm(groups, cout, eps=1e-5)
        self.conv2 = nn_.Conv2d(cout, cout, 3, padding=1)
        self.skip = nn_.Conv2d(cin, cout, 1) if cin != cout else None

    def forward(self, x, t):
        h = self.conv1(F_.silu(self.norm1(x)))
        h = h + self.temb(F_.silu(t))[:, :, None, None]
        h = self.conv2(F_.silu(self.norm2(h)))
        return (self.skip(x) if self.skip else x) + h


class TUNet(nn_.Module):
    """Tiny-config SD UNet replica (layers_per_block=1)."""

    def __init__(self, cfg):
        super().__init__()
        ch = cfg.block_out_channels
        g = cfg.norm_num_groups
        ctx = cfg.cross_attention_dim
        tdim = ch[0] * 4
        self.cfg = cfg
        self.conv_in = nn_.Conv2d(cfg.in_channels, ch[0], 3, padding=1)
        self.t1 = nn_.Linear(ch[0], tdim)
        self.t2 = nn_.Linear(tdim, tdim)
        self.down_res = nn_.ModuleList()
        self.down_attn = nn_.ModuleList()
        self.downs = nn_.ModuleList()
        prev = ch[0]
        for bi, bt in enumerate(cfg.down_block_types):
            res = TRes(prev, ch[bi], tdim, g)
            self.down_res.append(res)
            if bt == "CrossAttnDownBlock2D":
                heads = ch[bi] // cfg.attention_head_dim
                self.down_attn.append(TSpatial(ch[bi], heads, ctx, g))
            else:
                self.down_attn.append(None)
            prev = ch[bi]
            if bi < len(ch) - 1:
                self.downs.append(nn_.Conv2d(prev, prev, 3, stride=2))
            else:
                self.downs.append(None)
        mid = ch[-1]
        self.mid_r0 = TRes(mid, mid, tdim, g)
        self.mid_attn = TSpatial(mid, mid // cfg.attention_head_dim, ctx, g)
        self.mid_r1 = TRes(mid, mid, tdim, g)
        rev = list(reversed(ch))
        self.up_res = nn_.ModuleList()
        self.up_attn = nn_.ModuleList()
        self.ups = nn_.ModuleList()
        prev = mid
        # skip channels per up-block resnet: computed at forward time from the stack
        self.rev = rev
        for bi, bt in enumerate(cfg.up_block_types):
            blocks = nn_.ModuleList()
            attns = nn_.ModuleList()
            for li in range(cfg.layers_per_block + 1):
                # in-channels resolved lazily; placeholder, replaced in load
                blocks.append(None)
                attns.append(
                    TSpatial(rev[bi], rev[bi] // cfg.attention_head_dim, ctx, g)
                    if bt == "CrossAttnUpBlock2D" else None
                )
            self.up_res.append(blocks)
            self.up_attn.append(attns)
            self.ups.append(
                nn_.Conv2d(rev[bi], rev[bi], 3, padding=1)
                if bi < len(rev) - 1 else None
            )
        self.norm_out = nn_.GroupNorm(g, ch[0], eps=1e-5)
        self.conv_out = nn_.Conv2d(ch[0], cfg.out_channels, 3, padding=1)

    def forward(self, x, t, ctx):
        half = self.cfg.block_out_channels[0] // 2
        freqs = torch.exp(
            -math.log(10000) * torch.arange(half, dtype=torch.float32) / half
        )
        args = t.float()[:, None] * freqs[None]
        emb = torch.cat([torch.cos(args), torch.sin(args)], dim=-1)
        temb = self.t2(F_.silu(self.t1(emb)))

        h = self.conv_in(x)
        skips = [h]
        for bi in range(len(self.down_res)):
            h = self.down_res[bi](h, temb)
            if self.down_attn[bi] is not None:
                h = self.down_attn[bi](h, ctx)
            skips.append(h)
            if self.downs[bi] is not None:
                h = F_.pad(h, (0, 1, 0, 1))
                h = self.downs[bi](h)
                skips.append(h)
        h = self.mid_r0(h, temb)
        h = self.mid_attn(h, ctx)
        h = self.mid_r1(h, temb)
        for bi in range(len(self.up_res)):
            for li in range(len(self.up_res[bi])):
                s = skips.pop()
                h = torch.cat([h, s], dim=1)
                h = self.up_res[bi][li](h, temb)
                if self.up_attn[bi][li] is not None:
                    h = self.up_attn[bi][li](h, ctx)
            if self.ups[bi] is not None:
                h = F_.interpolate(h, scale_factor=2, mode="nearest")
                h = self.ups[bi](h)
        return self.conv_out(F_.silu(self.norm_out(h)))


def _load_from_sd(tm: TUNet, sd: dict, cfg):
    """Fill the torch replica from our exported HF-style state dict."""
    g = cfg.norm_num_groups
    tdim = cfg.block_out_channels[0] * 4
    t = lambda k: torch.from_numpy(np.asarray(sd[k]))

    def conv(mod, key):
        mod.weight.data.copy_(t(key + ".weight"))
        mod.bias.data.copy_(t(key + ".bias"))

    def lin(mod, key, bias=True):
        mod.weight.data.copy_(t(key + ".weight"))
        if bias:
            mod.bias.data.copy_(t(key + ".bias"))

    def norm(mod, key):
        mod.weight.data.copy_(t(key + ".weight"))
        mod.bias.data.copy_(t(key + ".bias"))

    def res(mod: TRes, p):
        norm(mod.norm1, p + ".norm1")
        conv(mod.conv1, p + ".conv1")
        lin(mod.temb, p + ".time_emb_proj")
        norm(mod.norm2, p + ".norm2")
        conv(mod.conv2, p + ".conv2")
        if mod.skip is not None:
            conv(mod.skip, p + ".conv_shortcut")

    def spatial(mod: TSpatial, p):
        norm(mod.norm, p + ".norm")
        lin(mod.proj_in, p + ".proj_in")
        lin(mod.proj_out, p + ".proj_out")
        b = mod.block
        q = p + ".transformer_blocks.0."
        norm(b.norm1, q + "norm1")
        norm(b.norm2, q + "norm2")
        norm(b.norm3, q + "norm3")
        lin(b.q1, q + "attn1.to_q", False)
        lin(b.k1, q + "attn1.to_k", False)
        lin(b.v1, q + "attn1.to_v", False)
        lin(b.o1, q + "attn1.to_out.0")
        lin(b.q2, q + "attn2.to_q", False)
        lin(b.k2, q + "attn2.to_k", False)
        lin(b.v2, q + "attn2.to_v", False)
        lin(b.o2, q + "attn2.to_out.0")
        lin(b.ff0, q + "ff.net.0.proj")
        lin(b.ff2, q + "ff.net.2")

    conv(tm.conv_in, "conv_in")
    lin(tm.t1, "time_embedding.linear_1")
    lin(tm.t2, "time_embedding.linear_2")
    for bi in range(len(tm.down_res)):
        res(tm.down_res[bi], f"down_blocks.{bi}.resnets.0")
        if tm.down_attn[bi] is not None:
            spatial(tm.down_attn[bi], f"down_blocks.{bi}.attentions.0")
        if tm.downs[bi] is not None:
            conv(tm.downs[bi], f"down_blocks.{bi}.downsamplers.0.conv")
    res(tm.mid_r0, "mid_block.resnets.0")
    spatial(tm.mid_attn, "mid_block.attentions.0")
    res(tm.mid_r1, "mid_block.resnets.1")
    for bi in range(len(tm.up_res)):
        for li in range(len(tm.up_res[bi])):
            p = f"up_blocks.{bi}.resnets.{li}"
            cin = np.asarray(sd[p + ".conv1.weight"]).shape[1]
            cout = np.asarray(sd[p + ".conv1.weight"]).shape[0]
            mod = TRes(cin, cout, tdim, g)
            res(mod, p)
            tm.up_res[bi][li] = mod
            if tm.up_attn[bi][li] is not None:
                spatial(tm.up_attn[bi][li], f"up_blocks.{bi}.attentions.{li}")
        if tm.ups[bi] is not None:
            conv(tm.ups[bi], f"up_blocks.{bi}.upsamplers.0.conv")
    norm(tm.norm_out, "conv_norm_out")
    conv(tm.conv_out, "conv_out")


def test_full_unet_matches_torch_replica():
    cfg = ModelConfig.tiny().unet
    model, params = init_unet(cfg, jax.random.PRNGKey(0))
    sd = export_params(params, "unet")

    tm = TUNet(cfg)
    _load_from_sd(tm, sd, cfg)
    tm.eval()

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
    with torch.no_grad():
        ref = tm(
            torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
            torch.from_numpy(tvals),
            torch.from_numpy(ctx),
        ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-3)
    # tighter mean-level agreement
    assert np.abs(ours - ref).mean() < 1e-4


class TVaeRes(nn_.Module):
    def __init__(self, cin, cout, g):
        super().__init__()
        self.norm1 = nn_.GroupNorm(g, cin, eps=1e-6)
        self.conv1 = nn_.Conv2d(cin, cout, 3, padding=1)
        self.norm2 = nn_.GroupNorm(g, cout, eps=1e-6)
        self.conv2 = nn_.Conv2d(cout, cout, 3, padding=1)
        self.skip = nn_.Conv2d(cin, cout, 1) if cin != cout else None

    def forward(self, x):
        h = self.conv1(F_.silu(self.norm1(x)))
        h = self.conv2(F_.silu(self.norm2(h)))
        return (self.skip(x) if self.skip else x) + h


class TVaeAttn(nn_.Module):
    def __init__(self, ch, g):
        super().__init__()
        self.norm = nn_.GroupNorm(g, ch, eps=1e-6)
        self.q = nn_.Linear(ch, ch)
        self.k = nn_.Linear(ch, ch)
        self.v = nn_.Linear(ch, ch)
        self.o = nn_.Linear(ch, ch)

    def forward(self, x):
        B, C, H, W = x.shape
        h = self.norm(x).permute(0, 2, 3, 1).reshape(B, H * W, C)
        o = F_.scaled_dot_product_attention(
            self.q(h)[:, None], self.k(h)[:, None], self.v(h)[:, None]
        )[:, 0]
        o = self.o(o)
        return o.reshape(B, H, W, C).permute(0, 3, 1, 2) + x


def test_full_vae_matches_torch_replica():
    from difashion_tpu.models.vae import AutoencoderKL, init_vae

    cfg = ModelConfig.tiny().vae
    model, params = init_vae(cfg, jax.random.PRNGKey(1))
    sd = export_params(params, "vae")
    t = lambda k: torch.from_numpy(np.asarray(sd[k]).copy())
    g = cfg.norm_num_groups
    ch = cfg.block_out_channels

    def conv(mod, key):
        mod.weight.data.copy_(t(key + ".weight"))
        mod.bias.data.copy_(t(key + ".bias"))

    def norm(mod, key):
        mod.weight.data.copy_(t(key + ".weight"))
        mod.bias.data.copy_(t(key + ".bias"))

    def lin(mod, key):
        mod.weight.data.copy_(t(key + ".weight"))
        mod.bias.data.copy_(t(key + ".bias"))

    def vres(mod, p):
        norm(mod.norm1, p + ".norm1")
        conv(mod.conv1, p + ".conv1")
        norm(mod.norm2, p + ".norm2")
        conv(mod.conv2, p + ".conv2")
        if mod.skip is not None:
            conv(mod.skip, p + ".conv_shortcut")

    def vattn(mod, p):
        norm(mod.norm, p + ".group_norm")
        lin(mod.q, p + ".to_q")
        lin(mod.k, p + ".to_k")
        lin(mod.v, p + ".to_v")
        lin(mod.o, p + ".to_out.0")

    # ---- torch encoder ----
    enc_in = nn_.Conv2d(3, ch[0], 3, padding=1)
    conv(enc_in, "encoder.conv_in")
    enc_res, enc_down = [], []
    prev = ch[0]
    for bi, c in enumerate(ch):
        r = TVaeRes(prev, c, g)
        vres(r, f"encoder.down_blocks.{bi}.resnets.0")
        enc_res.append(r)
        prev = c
        if bi < len(ch) - 1:
            d = nn_.Conv2d(c, c, 3, stride=2)
            conv(d, f"encoder.down_blocks.{bi}.downsamplers.0.conv")
            enc_down.append(d)
        else:
            enc_down.append(None)
    m0 = TVaeRes(ch[-1], ch[-1], g); vres(m0, "encoder.mid_block.resnets.0")
    ma = TVaeAttn(ch[-1], g); vattn(ma, "encoder.mid_block.attentions.0")
    m1 = TVaeRes(ch[-1], ch[-1], g); vres(m1, "encoder.mid_block.resnets.1")
    enc_norm = nn_.GroupNorm(g, ch[-1], eps=1e-6); norm(enc_norm, "encoder.conv_norm_out")
    enc_out = nn_.Conv2d(ch[-1], 2 * cfg.latent_channels, 3, padding=1)
    conv(enc_out, "encoder.conv_out")
    quant = nn_.Conv2d(2 * cfg.latent_channels, 2 * cfg.latent_channels, 1)
    conv(quant, "quant_conv")

    rng = np.random.RandomState(2)
    x = rng.randn(1, cfg.sample_size, cfg.sample_size, 3).astype(np.float32) * 0.5
    with torch.no_grad():
        h = enc_in(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
        for bi in range(len(ch)):
            h = enc_res[bi](h)
            if enc_down[bi] is not None:
                h = F_.pad(h, (0, 1, 0, 1))
                h = enc_down[bi](h)
        h = m1(ma(m0(h)))
        h = enc_out(F_.silu(enc_norm(h)))
        moments = quant(h)
        ref_mean, ref_logvar = moments.chunk(2, dim=1)

    from difashion_tpu.models.vae import AutoencoderKL as VK

    dist = model.apply({"params": params}, jnp.asarray(x), method=VK.encode)
    np.testing.assert_allclose(
        np.asarray(dist.mean),
        ref_mean.permute(0, 2, 3, 1).numpy(), rtol=1e-3, atol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(dist.logvar),
        ref_logvar.permute(0, 2, 3, 1).numpy(), rtol=1e-3, atol=1e-3,
    )
