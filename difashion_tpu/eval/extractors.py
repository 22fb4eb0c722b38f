"""Device-side feature extraction bundle for the evaluation drivers.

Wraps the eval backbones (OpenCLIP ViT-H image/text, FID-Inception, finetuned
50-class Inception, LPIPS) behind batched, jitted extract functions — the TPU-native
counterpart of the reference's per-metric model loads (`/root/reference/Evaluation/
eval_utils.py`). Weights import from local checkpoints when available
(`load_pretrained`); otherwise the backbones run with random init (throughput paths and
tests still work; quality numbers require real weights — documented in BASELINE.md).
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from difashion_tpu.eval.models.compat import (
    import_compat_params,
    init_fashion_evaluator,
)
from difashion_tpu.eval.models.inception import (
    import_inception_params,
    init_inception,
)
from difashion_tpu.eval.models.lpips import (
    LPIPS,
    import_lpips_lins,
    import_vgg_params,
    init_lpips,
)
from difashion_tpu.eval.models.open_clip_vit import (
    TextConfig,
    ViTConfig,
    import_openclip_params,
    init_clip_image,
    init_clip_text_tower,
    preprocess_clip_image,
)


def _batched(fn: Callable, batch_size: int):
    def run(x: np.ndarray) -> np.ndarray:
        outs = []
        n = len(x)
        for s in range(0, n, batch_size):
            chunk = x[s:s + batch_size]
            pad = 0
            if len(chunk) < batch_size and n > batch_size:
                pad = batch_size - len(chunk)
                chunk = np.concatenate([chunk, chunk[-1:].repeat(pad, 0)])
            out = np.asarray(fn(jnp.asarray(chunk)))
            outs.append(out[: len(out) - pad] if pad else out)
        return np.concatenate(outs, axis=0)

    return run


@dataclass
class Extractors:
    """All eval backbones + their params; built once per evaluation run."""

    clip_image_fn: Callable          # [N,224,224,3] CLIP-normalized -> [N,1024]
    clip_text_fn: Callable           # [N,77] ids -> [N,1024]
    fid_features_fn: Callable        # [N,299,299,3] in [-1,1] -> [N,2048]
    inception_probs_fn: Callable     # [N,299,299,3] in [-1,1] -> [N,50] softmax
    lpips_fn: Callable               # ([N,H,W,3], [N,H,W,3]) in [-1,1] -> [N]
    compat_fn: Callable              # [N,4,1024] -> [N] logits
    clip_tokenizer: object           # texts -> [N,77] ids
    batch_size: int = 32
    clip_size: int = 224
    random_towers: tuple = ()        # backbones left at random init (no weights found)
    # Preprocessing resolutions. Quality evaluation uses the reference values
    # (299 for both Inceptions, LPIPS at native resolution). tiny mode shrinks
    # them (75 / 64): the Inception and VGG towers have no reduced-architecture
    # variant, and full-res VGG16 over 512^2 batches costs ~56 s + ~8 GB of XLA
    # conv workspace per 16-image chunk on a 1-vCPU box — useless for plumbing
    # and streaming tests, which assert driver behavior, not metric values.
    fid_size: int = 299
    lpips_size: Optional[int] = None  # None = native resolution

    # ---- convenience wrappers (host numpy in/out, batched) -------------------

    def clip_image_embs(self, images01: np.ndarray) -> np.ndarray:
        """[N,H,W,3] in [0,1] -> [N,1024] (open_clip preprocessing applied)."""
        pre = preprocess_clip_image(images01, size=self.clip_size)
        return _batched(self.clip_image_fn, self.batch_size)(pre)

    def clip_text_embs(self, texts: Sequence[str]) -> np.ndarray:
        ids = self.clip_tokenizer(list(texts))
        return _batched(self.clip_text_fn, self.batch_size)(np.asarray(ids))

    def fid_features(self, images01: np.ndarray) -> np.ndarray:
        x = _resize_bilinear(images01, self.fid_size) * 2.0 - 1.0
        return _batched(self.fid_features_fn, self.batch_size)(x)

    def inception_probs(self, images01: np.ndarray) -> np.ndarray:
        x = _resize_bilinear(images01, self.fid_size) * 2.0 - 1.0
        return _batched(self.inception_probs_fn, self.batch_size)(x)

    def lpips(self, imgs0_01: np.ndarray, imgs1_01: np.ndarray) -> np.ndarray:
        if self.lpips_size:
            # each input resized on its own shape (_resize_bilinear no-ops when it
            # already matches) so mixed-resolution pairs can't skip one leg
            imgs0_01 = _resize_bilinear(imgs0_01, self.lpips_size)
            imgs1_01 = _resize_bilinear(imgs1_01, self.lpips_size)
        a = imgs0_01 * 2.0 - 1.0
        b = imgs1_01 * 2.0 - 1.0
        out = []
        for s in range(0, len(a), self.batch_size):
            out.append(np.asarray(
                self.lpips_fn(jnp.asarray(a[s:s + self.batch_size]),
                              jnp.asarray(b[s:s + self.batch_size]))
            ))
        return np.concatenate(out)

    def compat_scores(self, outfit_feats: np.ndarray) -> np.ndarray:
        """[N,4,1024] -> sigmoid scores [N] (`eval_utils.py:585-587`)."""
        logits = _batched(self.compat_fn, self.batch_size)(outfit_feats)
        return 1.0 / (1.0 + np.exp(-logits))


def _resize_bilinear(images01: np.ndarray, size: int) -> np.ndarray:
    """Bilinear resize to size x size, align_corners=False semantics
    (`eval_utils.py:263-267`; quality path uses size=299)."""
    x = jnp.asarray(images01, jnp.float32)
    n = x.shape[0]
    if x.shape[1] == size and x.shape[2] == size:
        return np.asarray(x)
    out = jax.image.resize(x, (n, size, size, 3), method="bilinear")
    return np.asarray(out)


def build_extractors(
    weights_dir: Optional[str] = None,
    num_classes: int = 50,
    batch_size: int = 32,
    dtype=jnp.float32,
    tiny: bool = False,
    rng: Optional[jax.Array] = None,
    allow_random: bool = True,
) -> Extractors:
    """Build all backbones. `weights_dir` may contain:
      open_clip_vit_h14.(safetensors|bin), fid_inception.(pth|bin),
      finetuned_inception.(pth|bin), vgg16.(pth|bin), lpips_vgg.(pth|bin),
      {ifashion|polyvore}_evaluator.pth
    Missing files leave the corresponding tower randomly initialized — fine for
    tests/throughput, catastrophic for quality numbers. `allow_random=False`
    (quality-facing CLIs) refuses instead; the returned `random_towers` tuple
    records any degradation either way."""
    from difashion_tpu.core.importer import load_state_dict
    from difashion_tpu.data.tokenizer import load_tokenizer

    rng = jax.random.PRNGKey(0) if rng is None else rng
    ks = jax.random.split(rng, 6)
    vcfg = ViTConfig.tiny() if tiny else ViTConfig.h14()
    tcfg = TextConfig.tiny() if tiny else TextConfig.h14()

    clip_img, clip_img_params = init_clip_image(vcfg, ks[0], dtype=dtype)
    clip_txt, clip_txt_params = init_clip_text_tower(tcfg, ks[1], dtype=dtype)
    fid_m, fid_vars = init_inception(ks[2], fid=True, dtype=dtype)
    cls_m, cls_vars = init_inception(
        ks[3], num_classes=num_classes, transform_input=True, dtype=dtype
    )
    lp_m, lp_params = init_lpips(ks[4], dtype=dtype)
    cp_m, cp_params = init_fashion_evaluator(vcfg.embed_dim, ks[5], dtype=dtype)

    def maybe(name):
        if weights_dir is None:
            return None
        for ext in (".safetensors", ".pth", ".bin", ".pt"):
            p = os.path.join(weights_dir, name + ext)
            if os.path.exists(p):
                return load_state_dict(p)
        return None

    random_towers = []
    sd = maybe("open_clip_vit_h14")
    if sd is not None:
        clip_img_params, clip_txt_params = import_openclip_params(
            clip_img_params, clip_txt_params, sd
        )
    else:
        random_towers.append("open_clip_vit_h14")
    sd = maybe("fid_inception")
    if sd is not None:
        fid_vars = import_inception_params(fid_vars, sd)
    else:
        random_towers.append("fid_inception")
    sd = maybe("finetuned_inception")
    if sd is not None:
        cls_vars = import_inception_params(cls_vars, sd, num_classes=num_classes)
    else:
        random_towers.append("finetuned_inception")
    sd = maybe("vgg16")
    if sd is not None:
        lp_params = dict(lp_params)
        lp_params["vgg"] = import_vgg_params(lp_params["vgg"], sd)
    else:
        random_towers.append("vgg16")
    sd = maybe("lpips_vgg")
    if sd is not None:
        lp_params = import_lpips_lins(dict(lp_params), sd)
    else:
        random_towers.append("lpips_vgg")
    for name in ("ifashion_evaluator", "polyvore_evaluator", "compat_evaluator"):
        sd = maybe(name)
        if sd is not None:
            cp_params = import_compat_params(cp_params, sd)
            break
    else:
        random_towers.append("compat_evaluator")

    if random_towers:
        import logging

        msg = (
            f"eval backbones WITHOUT real weights (random init): {random_towers} "
            f"(weights_dir={weights_dir!r}). Metric numbers from these towers are "
            "meaningless."
        )
        if not allow_random:
            raise FileNotFoundError(
                msg + " Refusing; pass --allow_random_weights to override."
            )
        logging.getLogger("difashion_tpu").warning("%s", msg)

    def _tower(model, variables):
        # params enter jit as ARGUMENTS, not closed-over constants: closing over
        # them bakes the weights into the lowered module (2.53 GB of captured
        # constants for the ViT-H tower — slow lowering, doubled memory) and,
        # as host numpy, would re-upload per call. device_put once instead.
        variables = jax.device_put(variables)
        jfn = jax.jit(lambda v, *xs: model.apply(v, *xs))
        return lambda *xs: jfn(variables, *xs)

    return Extractors(
        random_towers=tuple(random_towers),
        clip_image_fn=_tower(clip_img, {"params": clip_img_params}),
        clip_text_fn=_tower(clip_txt, {"params": clip_txt_params}),
        fid_features_fn=_tower(fid_m, fid_vars),
        inception_probs_fn=_tower(cls_m, cls_vars),
        lpips_fn=_tower(lp_m, {"params": lp_params}),
        compat_fn=_tower(cp_m, {"params": cp_params}),
        clip_tokenizer=load_tokenizer(
            weights_dir and os.path.join(weights_dir, "tokenizer"),
            vocab_size=tcfg.vocab_size,
        ),
        batch_size=batch_size,
        clip_size=vcfg.image_size,
        fid_size=75 if tiny else 299,
        lpips_size=64 if tiny else None,
    )
