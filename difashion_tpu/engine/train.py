"""Training engine: the DiFashion loss and a jitted, mesh-sharded train step.

Behavior-parity with the reference's training forward (`/root/reference/DiFashion/models/
difashion.py:122-267`) and driver loop (`/root/reference/DiFashion/train.py:676-838`),
re-designed TPU-first:

  * The whole step — VAE encode, noising, mutual/history conditioning with the exact
    joint dropout windows, CLIP text encode with prompt dropout, UNet fwd/bwd, min-SNR
    loss, grad clip, AdamW, EMA — is ONE jitted function.
  * Data parallelism is jit + NamedSharding over a `Mesh(("dp",))`: batch sharded on dp,
    params replicated; XLA inserts the psum gradient reduction over ICI (the TPU-native
    equivalent of the reference's Accelerate/NCCL scaffolding, `train.py:379-384,695`).
  * EMA lives inside the optimizer state pytree (reference: diffusers EMAModel objects,
    `train.py:506-511,708-711`) with the same warmup decay min(0.9999, (1+s)/(10+s)).
  * Only {unet, fashion_encoder} receive gradients; {vae, text_encoder} are frozen
    (reference `difashion.py:106-107`).
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from difashion_tpu.core.config import TrainConfig
from difashion_tpu.models.difashion import DiFashionModel


class TrainBatch(NamedTuple):
    """Host-prepared dense batch. B outfits x olen(=4) items.

    The reference does PIL image loads *inside* the training step
    (`difashion.py:139-142`) — a host bottleneck. Here the host pipeline ships either
    raw images or (fast path) precomputed VAE moments; both keep `.sample()` semantics
    (`difashion.py:144`) because moments carry (mean, logvar).
    """

    images: Optional[jnp.ndarray]        # [B, olen, H, W, 3] in [-1,1], or None
    latent_mean: Optional[jnp.ndarray]   # [B, olen, h, w, C] VAE mean (unscaled), or None
    latent_logvar: Optional[jnp.ndarray] # [B, olen, h, w, C]
    input_ids: jnp.ndarray               # [B, olen, 77] int32
    hist_latents: jnp.ndarray            # [B, olen, h, w, C] scaled hist mean latents
                                         #   (host already applied null fallback)


class EMAState(NamedTuple):
    params: Any            # EMA copy of trainable params
    step: jnp.ndarray      # int32 EMA update count


class TrainState(NamedTuple):
    params: Any            # full params {unet, vae, text_encoder, fashion_encoder}
    opt_state: Any
    ema: Optional[EMAState]
    step: jnp.ndarray      # int32 optimizer step


def ema_decay_schedule(step, max_decay: float):
    """diffusers EMAModel default warmup: min(max_decay, (1+s)/(10+s))."""
    s = step.astype(jnp.float32)
    return jnp.minimum(max_decay, (1.0 + s) / (10.0 + s))


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    """grad-clip 1.0 -> AdamW(0.9, 0.999, eps 1e-8, wd 1e-2), lr per recipe
    (`train.py:572-607`; constant LR scheduler is the recipe default)."""
    if cfg.lr_scheduler == "constant":
        lr = cfg.learning_rate
    elif cfg.lr_scheduler == "constant_with_warmup":
        lr = optax.linear_schedule(0.0, cfg.learning_rate, cfg.lr_warmup_steps)
    elif cfg.lr_scheduler == "cosine":
        lr = optax.warmup_cosine_decay_schedule(
            0.0, cfg.learning_rate, cfg.lr_warmup_steps, cfg.max_train_steps
        )
    else:
        raise ValueError(f"unknown lr scheduler {cfg.lr_scheduler!r}")
    if cfg.scale_lr:
        # reference rule (train.py:567-570): lr *= accum * bsz * world_size
        world = max(1, jax.device_count() if cfg.dp_size <= 0 else cfg.dp_size)
        factor = cfg.gradient_accumulation_steps * cfg.train_batch_size * world
        lr = (lr * factor if not callable(lr)
              else (lambda s, _lr=lr, _f=factor: _lr(s) * _f))
    if cfg.use_8bit_adam:
        from difashion_tpu.engine.optim8bit import adamw8bit

        opt = adamw8bit(
            lr, b1=cfg.adam_beta1, b2=cfg.adam_beta2, eps=cfg.adam_epsilon,
            weight_decay=cfg.adam_weight_decay,
        )
    else:
        opt = optax.adamw(
            lr,
            b1=cfg.adam_beta1,
            b2=cfg.adam_beta2,
            eps=cfg.adam_epsilon,
            weight_decay=cfg.adam_weight_decay,
        )
    return optax.chain(optax.clip_by_global_norm(cfg.max_grad_norm), opt)


def split_params(params):
    trainable = {k: params[k] for k in ("unet", "fashion_encoder")}
    frozen = {k: params[k] for k in ("vae", "text_encoder")}
    return trainable, frozen


def merge_params(trainable, frozen):
    return {**trainable, **frozen}


def difashion_loss(
    model: DiFashionModel,
    trainable,
    frozen,
    batch: TrainBatch,
    null_latent: jnp.ndarray,     # [h, w, C] scaled latent of the white null image
    null_text: jnp.ndarray,       # [77, D] encoded empty prompt
    rng: jax.Array,
    cfg: TrainConfig,
    injected: Optional[Dict[str, jnp.ndarray]] = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """The DiFashion training loss (difashion.py:122-267), fully traced.

    `injected` (tests only) overrides the stochastic draws so an external oracle can
    be driven with identical randomness: keys `enc_eps` [n,h,w,C], `noise` [n,h,w,C],
    `t_outfit` [B], `p_mask` [n], `p_cate` [n]. When set, the MutualEncoder MLP
    dropout runs deterministically (its draw has no torch-matchable counterpart).
    """
    # empty dict == no overrides == production behavior everywhere (including
    # the MutualEncoder-dropout determinism switch below)
    injected = injected or None
    inj = injected or {}
    params = merge_params(trainable, frozen)
    sched = model.schedule
    r_enc, r_noise, r_offset, r_t, r_mask, r_cate, r_drop = jax.random.split(rng, 7)

    # ---- latents ------------------------------------------------------------
    if batch.latent_mean is not None:
        B, olen = batch.latent_mean.shape[:2]
        mean = batch.latent_mean.reshape((B * olen,) + batch.latent_mean.shape[2:])
        logvar = batch.latent_logvar.reshape(mean.shape)
        std = jnp.exp(0.5 * jnp.clip(logvar, -30.0, 20.0))
        enc_eps = inj.get("enc_eps")
        if enc_eps is None:
            enc_eps = jax.random.normal(r_enc, mean.shape, jnp.float32)
        z = mean + std * enc_eps
        latents = z * model.config.vae.scaling_factor
    else:
        assert not inj, "injected draws require the latent-moments batch path"
        B, olen = batch.images.shape[:2]
        imgs = batch.images.reshape((B * olen,) + batch.images.shape[2:])
        latents = model.encode_images(params, imgs, rng=r_enc, sample=True)
    latents = latents.astype(jnp.float32)
    n = B * olen

    # ---- noise + shared-per-outfit timestep ---------------------------------
    noise = inj.get("noise")
    if noise is None:
        noise = jax.random.normal(r_noise, latents.shape, jnp.float32)
        if cfg.noise_offset:
            noise = noise + cfg.noise_offset * jax.random.normal(
                r_offset, (n, 1, 1, latents.shape[-1]), jnp.float32
            )
    t_outfit = inj.get("t_outfit")
    if t_outfit is None:
        t_outfit = jax.random.randint(r_t, (B,), 0, sched.num_train_timesteps)
    timesteps = jnp.repeat(t_outfit, olen)                 # all items share one t
    noisy = sched.add_noise(latents, noise, timesteps)

    # ---- mutual condition: per-outfit mean over co-items (difashion.py:160-171;
    # training normalizes the off-diagonal weights to 1/(olen-1)) ------------
    if cfg.use_mutual_guidance:
        grp = noisy.reshape((B, olen) + noisy.shape[1:])
        totals = jnp.sum(grp, axis=1, keepdims=True)
        mutual_in = (totals - grp) / (olen - 1)
        mutual_in = mutual_in.reshape(noisy.shape)
        mutual = model.apply_mutual(
            params, mutual_in, deterministic=injected is not None, rng=r_drop
        ).astype(jnp.float32)
    else:
        mutual = jnp.broadcast_to(null_latent[None], noisy.shape)

    if cfg.use_history:
        hist = batch.hist_latents.reshape(noisy.shape).astype(jnp.float32)
    else:
        # reference difashion.py:177-184: with use_history off, EVERY item gets the
        # null latent in the history channel (the lookup is skipped entirely)
        hist = jnp.broadcast_to(null_latent[None], noisy.shape)

    # ---- joint condition dropout windows (difashion.py:186-213) ------------
    p = inj.get("p_mask")
    if p is None:
        p = jax.random.uniform(r_mask, (n,))
    null_b = jnp.broadcast_to(null_latent[None], noisy.shape)
    if cfg.use_history and cfg.use_mutual_guidance:
        hist_mask = p < (cfg.mask_ratio + cfg.coupling_mask_ratio)
        mut_mask = (p >= cfg.mask_ratio) & (
            p < 2 * cfg.mask_ratio + cfg.coupling_mask_ratio
        )
        hist = jnp.where(hist_mask[:, None, None, None], null_b, hist)
        mutual = jnp.where(mut_mask[:, None, None, None], null_b, mutual)
    elif cfg.use_history:
        hist = jnp.where((p < cfg.mask_ratio)[:, None, None, None], null_b, hist)
    elif cfg.use_mutual_guidance:
        mutual = jnp.where((p < cfg.mask_ratio)[:, None, None, None], null_b, mutual)

    unet_in = (1.0 - cfg.eta) * noisy + cfg.eta * mutual
    unet_in = jnp.concatenate([unet_in, hist], axis=-1)    # 8 channels

    # ---- text with prompt dropout (difashion.py:218-239) --------------------
    ids = batch.input_ids.reshape(n, -1)
    text = model.encode_text(params, ids).astype(jnp.float32)
    p2 = inj.get("p_cate")
    if p2 is None:
        p2 = jax.random.uniform(r_cate, (n,))
    text = jnp.where(
        (p2 < cfg.cate_mask_ratio)[:, None, None], null_text[None], text
    )

    # ---- target + UNet + min-SNR loss (difashion.py:241-265) ----------------
    pred_type = cfg.prediction_type or sched.prediction_type
    if pred_type == "epsilon":
        target = noise
    elif pred_type == "v_prediction":
        target = sched.get_velocity(latents, noise, timesteps)
    else:
        raise ValueError(f"unknown prediction type {pred_type!r}")

    pred = model.apply_unet(params, unet_in, timesteps, text).astype(jnp.float32)

    if cfg.snr_gamma is None:
        loss = jnp.mean((pred - target) ** 2)
    else:
        per = jnp.mean((pred - target) ** 2, axis=(1, 2, 3))
        w = sched.min_snr_weights(timesteps, cfg.snr_gamma, pred_type)
        loss = jnp.mean(per * w)
    return loss, {"loss": loss, "t_mean": jnp.mean(timesteps.astype(jnp.float32))}


def build_train_step(model: DiFashionModel, cfg: TrainConfig):
    """Return (train_step, init_state). train_step: (state, batch, null_latent,
    null_text, rng) -> (state, metrics). Pure; jit/shard outside or via
    `shard_train_step`."""
    tx = make_optimizer(cfg)

    def init_state(params) -> TrainState:
        trainable, _ = split_params(params)
        opt_state = tx.init(trainable)
        ema = None
        if cfg.use_ema or cfg.use_ema_fashion:
            ema = EMAState(
                params=jax.tree_util.tree_map(jnp.copy, trainable),
                step=jnp.zeros((), jnp.int32),
            )
        return TrainState(
            params=params, opt_state=opt_state, ema=ema,
            step=jnp.zeros((), jnp.int32),
        )

    def train_step(state: TrainState, batch: TrainBatch, null_latent, null_text,
                   rng: jax.Array):
        trainable, frozen = split_params(state.params)

        def loss_fn(tr):
            return difashion_loss(
                model, tr, frozen, batch, null_latent, null_text, rng, cfg
            )

        if cfg.gradient_accumulation_steps > 1:
            # microbatch scan over leading-dim splits of the batch
            k = cfg.gradient_accumulation_steps

            def micro(carry, xs):
                mb, idx = xs
                acc_g, acc_l = carry
                # fresh draws per microbatch: fold the microbatch index into the
                # step rng, otherwise all k microbatches share identical
                # noise/timesteps/dropout masks and accum=k is not a faithful
                # stand-in for batch size B
                mrng = jax.random.fold_in(rng, idx)
                (l, _), g = jax.value_and_grad(
                    lambda tr: difashion_loss(
                        model, tr, frozen, mb, null_latent, null_text, mrng, cfg
                    ),
                    has_aux=True,
                )(trainable)
                return (
                    jax.tree_util.tree_map(jnp.add, acc_g, g),
                    acc_l + l,
                ), None

            zero_g = jax.tree_util.tree_map(jnp.zeros_like, trainable)
            mbs = jax.tree_util.tree_map(
                lambda x: x.reshape((k, x.shape[0] // k) + x.shape[1:])
                if x is not None else None,
                batch,
            )
            (grads, loss_sum), _ = jax.lax.scan(
                micro, (zero_g, 0.0), (mbs, jnp.arange(k, dtype=jnp.uint32))
            )
            grads = jax.tree_util.tree_map(lambda g: g / k, grads)
            loss = loss_sum / k
            metrics = {"loss": loss}
        else:
            (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                trainable
            )

        grad_norm = optax.global_norm(grads)
        updates, new_opt_state = tx.update(grads, state.opt_state, trainable)
        new_trainable = optax.apply_updates(trainable, updates)

        if cfg.skip_nonfinite_updates:
            # failure guard (SURVEY.md §5): a NaN/Inf gradient step is dropped —
            # params and optimizer state hold, the skip is surfaced in metrics.
            ok = jnp.isfinite(grad_norm)
            pick = lambda new, old: jax.tree_util.tree_map(
                lambda a, b: jnp.where(ok, a, b), new, old
            )
            new_trainable = pick(new_trainable, trainable)
            new_opt_state = pick(new_opt_state, state.opt_state)
        else:
            ok = jnp.asarray(True)
        trainable, opt_state = new_trainable, new_opt_state

        ema = state.ema
        if ema is not None:
            d = ema_decay_schedule(ema.step, cfg.ema_decay)
            ema_params = jax.tree_util.tree_map(
                lambda e, q: d * e + (1.0 - d) * q, ema.params, trainable
            )
            ema = EMAState(params=ema_params, step=ema.step + ok.astype(jnp.int32))

        new_state = TrainState(
            params=merge_params(trainable, frozen),
            opt_state=opt_state,
            ema=ema,
            step=state.step + 1,
        )
        metrics = dict(metrics)
        metrics["grad_norm"] = grad_norm
        metrics["update_skipped"] = 1.0 - ok.astype(jnp.float32)
        return new_state, metrics

    return train_step, init_state


# ---------------------------------------------------------------------------
# Mesh / sharding (TPU-native DP; SURVEY.md §2c)
# ---------------------------------------------------------------------------

def make_mesh(dp_size: int = -1) -> Mesh:
    devices = np.array(jax.devices())
    if dp_size > 0:
        devices = devices[:dp_size]
    return Mesh(devices, ("dp",))


def shard_train_step(train_step, mesh: Mesh, donate_state: bool = False):
    """jit the train step once; DP comes from argument placement: batch sharded on
    'dp', state/conditions replicated (jit commits to input shardings, and XLA turns
    the global-mean loss gradient into a psum over ICI — the TPU-native replacement
    for DDP/NCCL allreduce).

    `donate_state=True` aliases the input TrainState buffers to the output state
    — REQUIRED at SD2-base scale: the full state (params + Adam moments + EMA,
    13.01 GiB per engine/memory.py) otherwise exists twice during the step and
    exceeds a 16 GiB v5e (measured: the 500-step soak OOM'd at step 1 without
    donation while tools/bench_train.py, which donates, fit). The production
    loop (`cli/train.py`: `state, m = jitted(state, ...)`) turns it on. It is
    OFF by default because donation composes badly with re-used placements:
    `place_replicated(x)` may ALIAS x's existing device buffer rather than
    copy, so donating the placed state can delete the caller's original pytree
    (measured: `Array has been deleted` in the ZeRO-1 equality test). Callers
    that replay the same state, or place several variants of one state, must
    keep it off.

    Returns (jitted_step, place_batch, place_replicated).
    """
    repl = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P("dp"))
    jitted = jax.jit(train_step, donate_argnums=(0,) if donate_state else ())

    def place_batch(batch: TrainBatch) -> TrainBatch:
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, batch_sh), batch
        )

    def place_replicated(tree):
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, repl), tree)

    return jitted, place_batch, place_replicated


def zero1_shard_axis(shape, ndev: int):
    """The ZeRO-1 sharding rule (single source of truth for `place_state_zero1`
    and `engine/memory.py`'s accounting): the LARGEST dim divisible by the dp
    size, or None when the leaf must stay replicated."""
    if not shape or 0 in shape:
        return None
    divisible = [(d, ax) for ax, d in enumerate(shape) if d % ndev == 0]
    if not divisible:
        return None
    return max(divisible)[1]


def place_state_zero1(state: TrainState, mesh: Mesh) -> TrainState:
    """ZeRO-1-style placement: params replicated, optimizer moments + EMA sharded over
    'dp' along each leaf's LARGEST dim divisible by the dp size (leaves with no such
    dim stay replicated). Sharding the largest divisible axis — not just the leading
    one — matters because conv-kernel moments are HWIO `[3,3,Cin,Cout]`: their leading
    dim is 3, but Cin/Cout are multiples of any realistic dp size, and convs carry
    roughly half the UNet's parameters.

    Under jit's global-view semantics XLA then computes each chip's slice of the
    optimizer update from its local moment shard and all-gathers the parameter delta —
    an ~8x optimizer-memory saving on a v5e-8 slice with no algorithm change. The
    reference has no analogue (single-GPU, full-state Adam); this is what makes the
    866M-param fp32-state recipe fit per-chip at scale (see `engine/memory.py` for
    the eval_shape-based accounting that pins the numbers).
    """
    ndev = mesh.devices.size
    repl = NamedSharding(mesh, P())

    def place(x):
        axis = zero1_shard_axis(getattr(x, "shape", ()), ndev)
        if axis is not None:
            spec = [None] * x.ndim
            spec[axis] = "dp"
            return jax.device_put(x, NamedSharding(mesh, P(*spec)))
        return jax.device_put(x, repl)

    params = jax.tree_util.tree_map(lambda x: jax.device_put(x, repl), state.params)
    opt_state = jax.tree_util.tree_map(place, state.opt_state)
    ema = state.ema
    if ema is not None:
        ema = EMAState(
            params=jax.tree_util.tree_map(place, ema.params),
            step=jax.device_put(ema.step, repl),
        )
    return TrainState(
        params=params, opt_state=opt_state, ema=ema,
        step=jax.device_put(state.step, repl),
    )
