"""Torch oracle implementations for the golden-parity tests (VERDICT r4 #3).

All torch code lives HERE, imported only from inside `golden_oracle.oracle(...)`
compute callbacks — the test modules themselves are torch-free and assert
against committed fixtures (tests/golden/torch_oracles/*.npz) when torch is
absent. Contents are the clean-room replicas previously defined inline in
test_unet_torch_parity.py / test_sampler_golden.py / test_train_loss_golden.py:

  * TUNet / _load_from_sd — full SD-topology UNet replica fed from our exported
    HF-style state dict (LIFO skip wiring);
  * TMutual — literal NCHW MutualEncoder (reference
    `/root/reference/DiFashion/models/difashion.py:21-46`);
  * TorchPLMS — stateful published PLMS (skip_prk_steps=True), driven the way
    the reference drives diffusers' PNDMScheduler (difashion.py:356-357,569);
  * oracle_fashion_generation — behavioral transcription of the reference
    sampling loop (difashion.py:277-571);
  * oracle_training_loss — literal transcription of the training forward
    (difashion.py:122-267) with injected randomness;
  * TVaeRes/TVaeAttn — VAE encoder replica blocks.

This module is numpy+torch only (no jax): the tests pass exported state dicts
and numpy inputs in, so fixture regeneration works in any torch environment.
"""
import math

import numpy as np
import torch

nn_ = torch.nn
F_ = torch.nn.functional

from golden_schedule import GOLDEN, GoldenSchedule


def _t(x):
    return torch.from_numpy(np.asarray(x))


def _nchw(x):
    return torch.from_numpy(np.ascontiguousarray(np.moveaxis(np.asarray(x), -1, -3)))


def build_tunet(unet_cfg, unet_sd):
    tm = TUNet(unet_cfg)
    _load_from_sd(tm, unet_sd, unet_cfg)
    tm.eval()
    return tm


def build_tmut(mcfg, msd):
    tmut = TMutual(mcfg.latent_channels, mcfg.latent_size, mcfg.hid_dim)
    with torch.no_grad():
        tmut.mlp[0].weight.copy_(torch.from_numpy(msd["mlp.0.weight"]))
        tmut.mlp[0].bias.copy_(torch.from_numpy(msd["mlp.0.bias"]))
        tmut.mlp[3].weight.copy_(torch.from_numpy(msd["mlp.3.weight"]))
        tmut.mlp[3].bias.copy_(torch.from_numpy(msd["mlp.3.bias"]))
    tmut.eval()
    return tmut

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

class TMutual(nn_.Module):
    """Literal reference MutualEncoder (difashion.py:21-46): NCHW flatten order."""

    def __init__(self, channels: int, size: int, hid: int):
        super().__init__()
        flat = channels * size * size
        self.channels, self.size = channels, size
        self.mlp = nn_.Sequential(
            nn_.Linear(flat, hid),
            nn_.LeakyReLU(),
            nn_.Dropout(0.1),
            nn_.Linear(hid, flat),
            nn_.Tanh(),
        )

    def forward(self, x):  # [B, C, S, S]
        b = x.shape[0]
        h = self.mlp(x.reshape(b, -1))
        return h.view(b, self.channels, self.size, self.size)

class TorchPLMS:
    """Stateful PLMS (skip_prk_steps=True): the published algorithm driven exactly the
    way the reference drives diffusers' PNDMScheduler (difashion.py:356-357,569)."""

    def __init__(self, sched: GoldenSchedule, n: int):
        self.s = sched
        self.ratio = sched.num_train_timesteps // n
        base = sched.leading_grid(n)   # pinned golden grid, not production code
        self.timesteps = np.concatenate(
            [base[:-1], base[-2:-1], base[-1:]]
        )[::-1].copy()
        self.ets = []
        self.counter = 0
        self.cur_sample = None

    def _acp(self, t):
        return float(self.s.alphas_cumprod[t]) if t >= 0 else float(
            self.s.final_alpha_cumprod
        )

    def step(self, model_output, timestep, sample):
        t = int(timestep)
        prev_t = t - self.ratio
        if self.counter != 1:
            self.ets = self.ets[-3:]
            self.ets.append(model_output)
        else:
            prev_t = t
            t = t + self.ratio
        if len(self.ets) == 1 and self.counter == 0:
            mo = model_output
            self.cur_sample = sample
        elif len(self.ets) == 1 and self.counter == 1:
            mo = (model_output + self.ets[-1]) / 2
            sample = self.cur_sample
        elif len(self.ets) == 2:
            mo = (3 * self.ets[-1] - self.ets[-2]) / 2
        elif len(self.ets) == 3:
            mo = (23 * self.ets[-1] - 16 * self.ets[-2] + 5 * self.ets[-3]) / 12
        else:
            mo = (1 / 24) * (
                55 * self.ets[-1] - 59 * self.ets[-2]
                + 37 * self.ets[-3] - 9 * self.ets[-4]
            )
        a_t = self._acp(t)
        a_prev = self._acp(prev_t)
        coeff = (a_prev / a_t) ** 0.5
        denom = a_t * (1 - a_prev) ** 0.5 + (a_t * (1 - a_t) * a_prev) ** 0.5
        prev_sample = coeff * sample - (a_prev - a_t) * mo / denom
        self.counter += 1
        return prev_sample

def oracle_fashion_generation(
    *,
    unet: TUNet,
    fashion_encoder: TMutual,
    sched: GoldenSchedule,
    num_inference_steps: int,
    init_latents,        # [F, C, h, w]
    olists,              # [B, olen] int, 0 = slot to generate
    all_latents,         # [B*olen, C, h, w] clean catalog latents (mode * sf)
    hist_latents_fill,   # [F, C, h, w] per-fill history latent (null where absent)
    category_prompts,    # [F, 77, D]
    null_prompt,         # [1, 77, D]
    null_latent,         # [C, h, w]
    eta: float,
    category_guidance_scale: float,
    hist_guidance_scale: float,
    mutual_guidance_scale: float,
    use_history: bool,
    use_mutual_guidance: bool,
    scheduler: str = "plms",
):
    """Behavioral transcription of difashion.py:277-571 at fp32, returning the latent
    trajectory (one entry per scheduler iteration). `scheduler="dpmpp"` swaps the
    stateful PLMS for the independent stateful DPM-Solver++(2M) transcription
    (test_diffusion.StatefulDPMpp2M) to certify the fast-serving path end to end."""
    do_h = use_history and hist_guidance_scale > 1.0
    do_m = use_mutual_guidance and mutual_guidance_scale > 1.0
    do_c = category_guidance_scale > 1.0
    do_full = do_h and do_m and do_c

    bsz, olen = olists.shape
    fill_idx = torch.nonzero(olists == 0)
    fill_num = fill_idx.shape[0]

    if scheduler == "plms":
        plms = TorchPLMS(sched, num_inference_steps)
    else:
        from test_diffusion import StatefulDPMpp2M

        plms = StatefulDPMpp2M(sched, num_inference_steps)
    latents = init_latents.clone()

    # history stacking (difashion.py:388-406)
    hist = hist_latents_fill
    if not use_history:
        hist = torch.stack([null_latent] * fill_num)
    null_hist = torch.stack([null_latent] * fill_num)
    if do_full:
        hist_stack = torch.cat([hist, null_hist, null_hist, null_hist], dim=0)
    elif do_c:
        if do_h:
            hist_stack = torch.cat([hist, null_hist, null_hist], dim=0)
        elif do_m:
            hist_stack = torch.cat([hist] * 3, dim=0)
        else:
            hist_stack = torch.cat([hist] * 2, dim=0)
    else:
        if do_h:
            hist_stack = torch.cat([hist, null_hist], dim=0)
        elif do_m:
            hist_stack = torch.cat([hist] * 2, dim=0)
        else:
            hist_stack = hist

    # text stacking (difashion.py:408-427)
    null_prompts = torch.cat([null_prompt] * fill_num, dim=0)
    if do_full:
        ehs = torch.cat(
            [category_prompts, category_prompts, category_prompts, null_prompts], 0
        )
    elif do_c:
        if do_h or do_m:
            ehs = torch.cat([category_prompts, category_prompts, null_prompts], 0)
        else:
            ehs = torch.cat([category_prompts, null_prompts], 0)
    else:
        if do_h or do_m:
            ehs = torch.cat([category_prompts] * 2, 0)
        else:
            ehs = category_prompts

    # mutual index pointers (difashion.py:439-451)
    gen_masks = olists == 0
    mutual_indicies = []
    all_num = 0
    for i in range(bsz):
        gen_mask = gen_masks[i]
        gen_num = int(gen_mask.sum())
        indicies = torch.arange(olen) + i * olen
        indicies[gen_mask] = -torch.arange(all_num, all_num + gen_num) - 1
        mutual_indicies.append(indicies)
        all_num += gen_num
    mutual_indicies = torch.stack(mutual_indicies)
    assert all_num == fill_num

    prev_latents = latents.clone()
    trajectory = []

    for t in plms.timesteps:
        # CFG latent stacking (difashion.py:456-469)
        if do_full:
            lmi = torch.cat([latents] * 4)
        elif do_c:
            lmi = torch.cat([latents] * (3 if (do_m or do_h) else 2))
        else:
            lmi = torch.cat([latents] * 2) if (do_m or do_h) else latents

        # scale_model_input is identity for PNDM

        # mutual assembly (difashion.py:474-492)
        if use_mutual_guidance:
            mutual_cond = []
            for j in range(fill_num):
                o_idx, i_idx = int(fill_idx[j, 0]), int(fill_idx[j, 1])
                weights = torch.ones(olen)
                weights[i_idx] = 0.0
                gen_mask = gen_masks[o_idx]
                mutual_latents = torch.zeros((olen,) + null_latent.shape)
                mutual_latents[~gen_mask] = all_latents[
                    mutual_indicies[o_idx][~gen_mask]
                ]
                mutual_latents[gen_mask] = prev_latents[
                    -mutual_indicies[o_idx][gen_mask] - 1
                ]
                weighted = sum(w * e for w, e in zip(weights, mutual_latents))
                mutual_cond.append(weighted)
            mutual_cond = torch.stack(mutual_cond)
            mutual_cond = fashion_encoder(mutual_cond)
        else:
            mutual_cond = torch.stack([null_latent] * fill_num)

        # mutual CFG stacking (difashion.py:494-512)
        null_mut = torch.stack([null_latent] * fill_num)
        if do_full:
            mutual_stack = torch.cat([mutual_cond, mutual_cond, null_mut, null_mut], 0)
        elif do_c:
            if do_m:
                mutual_stack = torch.cat([mutual_cond, null_mut, null_mut], 0)
            elif do_h:
                mutual_stack = torch.cat([mutual_cond] * 3, 0)
            else:
                mutual_stack = torch.cat([mutual_cond] * 2, 0)
        else:
            if do_m:
                mutual_stack = torch.cat([mutual_cond, null_mut], 0)
            elif do_h:
                mutual_stack = torch.cat([mutual_cond] * 2, 0)
            else:
                mutual_stack = mutual_cond

        # eta combine + history concat (difashion.py:514-515)
        x = (1 - eta) * lmi + eta * mutual_stack
        x = torch.cat([x, hist_stack], dim=1)

        tt = torch.full((x.shape[0],), int(t), dtype=torch.int64)
        noise_pred = unet(x, tt, ehs)

        # guidance combine (difashion.py:525-566)
        cs, hs, ms = (
            category_guidance_scale, hist_guidance_scale, mutual_guidance_scale
        )
        if do_full:
            e_all, e_cm, e_c, e_u = noise_pred.chunk(4)
            noise_pred = e_u + hs * (e_all - e_cm) + ms * (e_cm - e_c) + cs * (e_c - e_u)
        elif do_c:
            if do_h:
                e_ch, e_c, e_u = noise_pred.chunk(3)
                noise_pred = e_u + hs * (e_ch - e_c) + cs * (e_c - e_u)
            elif do_m:
                e_cm, e_c, e_u = noise_pred.chunk(3)
                noise_pred = e_u + ms * (e_cm - e_c) + cs * (e_c - e_u)
            else:
                e_c, e_u = noise_pred.chunk(2)
                noise_pred = e_u + cs * (e_c - e_u)
        else:
            if do_h:
                e_h, e_u = noise_pred.chunk(2)
                noise_pred = e_u + hs * (e_h - e_u)
            elif do_m:
                e_m, e_u = noise_pred.chunk(2)
                noise_pred = e_u + ms * (e_m - e_u)

        latents = plms.step(noise_pred, int(t), latents).to(torch.float32)
        prev_latents = latents
        trajectory.append(latents.clone())

    return trajectory

def oracle_training_loss(
    *,
    unet,
    fashion_encoder,
    latent_mean,      # [n, C, h, w] torch fp32 (unscaled VAE mean)
    latent_logvar,    # [n, C, h, w]
    enc_eps,          # [n, C, h, w] injected encoder-sampling draw
    noise,            # [n, C, h, w] injected diffusion noise
    t_outfit,         # [B] int64 injected shared-per-outfit timesteps
    p_mask,           # [n] injected joint-dropout draw
    p_cate,           # [n] injected prompt-dropout draw
    hist_latents,     # [n, C, h, w] (host already applied null fallback)
    text_emb,         # [n, 77, D]
    null_text,        # [77, D]
    null_latent,      # [C, h, w]
    olen: int,
    sf: float,
    eta: float,
    mask_ratio: float,
    coupling_mask_ratio: float,
    cate_mask_ratio: float,
    use_history: bool,
    use_mutual: bool,
    prediction_type: str,
    snr_gamma,
):
    """Literal NCHW transcription of difashion.py:122-267 with injected draws.

    Uses the PINNED schedule constants (GOLDEN.alphas_cumprod), so a production
    beta-schedule bug cannot be common-mode invisible.
    """
    n = latent_mean.shape[0]
    bsz = n // olen
    acp = torch.from_numpy(
        np.asarray(GOLDEN.alphas_cumprod, np.float32)
    )

    # vae latent_dist.sample() (difashion.py:144) from cached moments
    std = torch.exp(0.5 * torch.clamp(latent_logvar, -30.0, 20.0))
    latents = (latent_mean + std * enc_eps) * sf

    timesteps = t_outfit.repeat_interleave(olen)                  # shared t
    a = acp[timesteps].sqrt().view(n, 1, 1, 1)
    s = (1.0 - acp[timesteps]).sqrt().view(n, 1, 1, 1)
    noisy_latents = a * latents + s * noise                       # add_noise

    # mutual condition over *noisy* co-item latents (difashion.py:160-171)
    if use_mutual:
        mutual_cond = []
        for i, idx in enumerate(range(0, bsz * olen, olen)):
            weights = torch.ones(olen, olen).masked_fill(torch.eye(olen) > 0, 0.0)
            weights = weights / torch.sum(weights, dim=1)
            mutual_latents = noisy_latents[idx:idx + olen]
            for weight in weights:
                mutual_cond.append(
                    sum(w * emb for w, emb in zip(weight, mutual_latents))
                )
        mutual_cond = fashion_encoder(torch.stack(mutual_cond))
    else:
        mutual_cond = torch.stack([null_latent] * n)

    # history lookup skipped entirely when use_history is off (difashion.py:177-184)
    hist = hist_latents.clone() if use_history else torch.stack([null_latent] * n)

    # joint condition dropout windows (difashion.py:186-213)
    masked_mutual = mutual_cond.clone()
    if use_history and use_mutual:
        image_mask = p_mask < mask_ratio + coupling_mask_ratio
        hist[image_mask] = null_latent
        mutual_mask = (p_mask >= mask_ratio) & (
            p_mask < 2 * mask_ratio + coupling_mask_ratio
        )
        masked_mutual[mutual_mask] = null_latent
    elif use_history:
        hist[p_mask < mask_ratio] = null_latent
    elif use_mutual:
        masked_mutual[p_mask < mask_ratio] = null_latent

    x = (1 - eta) * noisy_latents + eta * masked_mutual
    x = torch.cat([x, hist], dim=1)                                # 8 channels

    ehs = text_emb.clone()
    ehs[p_cate < cate_mask_ratio] = null_text                      # prompt dropout

    if prediction_type == "epsilon":
        target = noise
    elif prediction_type == "v_prediction":
        target = a * noise - s * latents                           # get_velocity
    else:
        raise ValueError(prediction_type)

    pred = unet(x, timesteps, ehs)

    if snr_gamma is None:
        return torch.mean((pred.float() - target.float()) ** 2)
    snr = acp[timesteps] / (1.0 - acp[timesteps])
    w = torch.minimum(snr, torch.full_like(snr, snr_gamma)) / snr
    per = torch.mean((pred.float() - target.float()) ** 2, dim=(1, 2, 3))
    return torch.mean(per * w)


# ---------------------------------------------------------------------------
# Fixture compute entry points (called from golden_oracle.oracle callbacks)
# ---------------------------------------------------------------------------

def compute_unet_forward(unet_cfg, unet_sd, x, tvals, ctx):
    """Full-UNet forward on NHWC inputs; returns NHWC output."""
    tm = build_tunet(unet_cfg, unet_sd)
    with torch.no_grad():
        ref = tm(_nchw(x), torch.from_numpy(np.asarray(tvals)), _t(ctx))
    return {"out": ref.permute(0, 2, 3, 1).numpy()}


def compute_vae_encode(vae_cfg, vae_sd, x):
    """VAE encoder replica forward (moments); returns NHWC mean/logvar."""
    t = lambda k: torch.from_numpy(np.asarray(vae_sd[k]).copy())
    g = vae_cfg.norm_num_groups
    ch = vae_cfg.block_out_channels

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
    enc_norm = nn_.GroupNorm(g, ch[-1], eps=1e-6)
    norm(enc_norm, "encoder.conv_norm_out")
    enc_out = nn_.Conv2d(ch[-1], 2 * vae_cfg.latent_channels, 3, padding=1)
    conv(enc_out, "encoder.conv_out")
    quant = nn_.Conv2d(2 * vae_cfg.latent_channels, 2 * vae_cfg.latent_channels, 1)
    conv(quant, "quant_conv")

    with torch.no_grad():
        h = enc_in(_nchw(x))
        for bi in range(len(ch)):
            h = enc_res[bi](h)
            if enc_down[bi] is not None:
                h = F_.pad(h, (0, 1, 0, 1))
                h = enc_down[bi](h)
        h = m1(ma(m0(h)))
        h = enc_out(F_.silu(enc_norm(h)))
        moments = quant(h)
        ref_mean, ref_logvar = moments.chunk(2, dim=1)
    return {
        "mean": ref_mean.permute(0, 2, 3, 1).numpy(),
        "logvar": ref_logvar.permute(0, 2, 3, 1).numpy(),
    }


def compute_sampler_traj(cfg, unet_sd, mutual_sd, side, *, num_inference_steps,
                         eta, cs, hs, ms, use_history, use_mutual,
                         scheduler="plms"):
    """Whole-loop oracle trajectory; returns NHWC [L, F, h, w, C]."""
    tunet = build_tunet(cfg.unet, unet_sd)
    tmut = build_tmut(cfg.mutual, mutual_sd)
    known = np.asarray(side["known"])
    B, olen = known.shape[:2]
    with torch.no_grad():
        traj = oracle_fashion_generation(
            unet=tunet, fashion_encoder=tmut, sched=GOLDEN,
            num_inference_steps=num_inference_steps, eta=eta,
            category_guidance_scale=cs, hist_guidance_scale=hs,
            mutual_guidance_scale=ms, use_history=use_history,
            use_mutual_guidance=use_mutual, scheduler=scheduler,
            init_latents=_nchw(side["init"]),
            olists=torch.from_numpy(np.asarray(side["olists"])),
            all_latents=_nchw(known.reshape((B * olen,) + known.shape[2:])),
            hist_latents_fill=_nchw(side["hist"]),
            category_prompts=_t(side["cate_text"]),
            null_prompt=_t(np.asarray(side["null_text"])[None]),
            null_latent=_nchw(np.asarray(side["null_latent"])[None])[0],
        )
    return {"traj": np.stack([np.moveaxis(s.numpy(), 1, -1) for s in traj])}


def compute_train_loss(cfg, unet_sd, mutual_sd, side, *, olen, sf, eta,
                       mask_ratio, coupling_mask_ratio, cate_mask_ratio,
                       use_history, use_mutual, prediction_type, snr_gamma):
    """Composed training-loss oracle; returns the scalar loss."""
    tunet = build_tunet(cfg.unet, unet_sd)
    tmut = build_tmut(cfg.mutual, mutual_sd)
    n = side["enc_eps"].shape[0]
    h = side["enc_eps"].shape[1]
    C = side["enc_eps"].shape[-1]
    with torch.no_grad():
        loss_t = oracle_training_loss(
            unet=tunet, fashion_encoder=tmut,
            latent_mean=_nchw(np.asarray(side["mean"]).reshape(n, h, h, C)),
            latent_logvar=_nchw(np.asarray(side["logvar"]).reshape(n, h, h, C)),
            enc_eps=_nchw(side["enc_eps"]), noise=_nchw(side["noise"]),
            t_outfit=torch.from_numpy(np.asarray(side["t_outfit"])).long(),
            p_mask=torch.from_numpy(np.asarray(side["p_mask"])),
            p_cate=torch.from_numpy(np.asarray(side["p_cate"])),
            hist_latents=_nchw(np.asarray(side["hist"]).reshape(n, h, h, C)),
            text_emb=torch.from_numpy(np.asarray(side["text"])),
            null_text=torch.from_numpy(np.asarray(side["null_text"])),
            null_latent=_nchw(np.asarray(side["null_latent"])[None])[0],
            olen=olen, sf=sf, eta=eta,
            mask_ratio=mask_ratio,
            coupling_mask_ratio=coupling_mask_ratio,
            cate_mask_ratio=cate_mask_ratio,
            use_history=use_history, use_mutual=use_mutual,
            prediction_type=prediction_type, snr_gamma=snr_gamma,
        )
    return {"loss": np.float64(loss_t.item())}
