"""Materialize a complete eval weights_dir on disk (the weights-arrival drill).

Builds every eval backbone (OpenCLIP ViT image+text, FID Inception, finetuned
50-class Inception, VGG16 + LPIPS heads, FashionEvaluator), exports each through
the torch-layout exporters (`eval/models/exporters.py`), and writes the files
`build_extractors` consumes — plus a CLIP-shaped `tokenizer/` (vocab.json +
merges.txt). The result is a weights_dir with the exact on-disk layout real
weights will arrive in, so the strict parity runbook
(`python -m difashion_tpu parity`, no `--allow_random_weights`) can be exercised
hands-free before any real weights exist.

Usage:
  python tools/export_eval_weights.py --out eval_weights/ [--tiny] [--seed 0]
"""
import argparse
import json
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
    jax.config.update("jax_platforms", "cpu")  # sitecustomize override (see export_hf.py)


def write_clip_vocab(tok_dir: str, n_merges: int = 200, seed: int = 0) -> None:
    """CLIP-shaped vocab: full byte alphabet + </w> variants + chained merges +
    the two special tokens (same shape as the real 49k asset, scaled down)."""
    from difashion_tpu.data.tokenizer import bytes_to_unicode

    rng = random.Random(seed)
    alphabet = list(bytes_to_unicode().values())
    vocab = alphabet + [c + "</w>" for c in alphabet]
    tokens = set(vocab)
    merges = []
    mergeable = list(vocab)
    while len(merges) < n_merges:
        a = rng.choice(mergeable)
        if a.endswith("</w>"):
            continue
        b = rng.choice(mergeable)
        new = a + b
        if new in tokens or len(new) > 14:
            continue
        merges.append((a, b))
        tokens.add(new)
        vocab.append(new)
        mergeable.append(new)
    vocab += ["<|startoftext|>", "<|endoftext|>"]
    os.makedirs(tok_dir, exist_ok=True)
    with open(os.path.join(tok_dir, "vocab.json"), "w") as f:
        json.dump({t: i for i, t in enumerate(vocab)}, f)
    with open(os.path.join(tok_dir, "merges.txt"), "w") as f:
        f.write("#version: 0.2\n" + "\n".join(f"{a} {b}" for a, b in merges))


def export_weights_dir(out: str, tiny: bool = True, seed: int = 0,
                       num_classes: int = 50, n_merges: int = 200) -> None:
    from safetensors.numpy import save_file

    from difashion_tpu.eval.models.compat import init_fashion_evaluator
    from difashion_tpu.eval.models.exporters import (
        export_compat_params,
        export_inception_params,
        export_lpips_lins,
        export_openclip_params,
        export_vgg_params,
    )
    from difashion_tpu.eval.models.inception import init_inception
    from difashion_tpu.eval.models.lpips import init_lpips
    from difashion_tpu.eval.models.open_clip_vit import (
        TextConfig,
        ViTConfig,
        init_clip_image,
        init_clip_text_tower,
    )

    os.makedirs(out, exist_ok=True)
    ks = jax.random.split(jax.random.PRNGKey(seed), 6)
    vcfg = ViTConfig.tiny() if tiny else ViTConfig.h14()
    tcfg = TextConfig.tiny() if tiny else TextConfig.h14()

    _, vis = init_clip_image(vcfg, ks[0])
    _, txt = init_clip_text_tower(tcfg, ks[1])
    _, fid_vars = init_inception(ks[2], fid=True)
    _, cls_vars = init_inception(ks[3], num_classes=num_classes,
                                 transform_input=True)
    _, lp = init_lpips(ks[4])
    _, cp = init_fashion_evaluator(vcfg.embed_dim, ks[5])

    files = {
        "open_clip_vit_h14": export_openclip_params(vis, txt),
        "fid_inception": export_inception_params(fid_vars),
        "finetuned_inception": export_inception_params(cls_vars),
        "vgg16": export_vgg_params(lp["vgg"]),
        "lpips_vgg": export_lpips_lins(lp),
        "ifashion_evaluator": export_compat_params(cp),
    }
    for name, sd in files.items():
        save_file(sd, os.path.join(out, name + ".safetensors"))
        print(f"wrote {name}.safetensors ({len(sd)} tensors)")
    write_clip_vocab(os.path.join(out, "tokenizer"), n_merges=n_merges, seed=seed)
    print(f"wrote tokenizer/ (vocab.json + merges.txt, {n_merges} merges)")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--num_classes", type=int, default=50)
    p.add_argument("--n_merges", type=int, default=200)
    args = p.parse_args()
    export_weights_dir(args.out, tiny=args.tiny, seed=args.seed,
                       num_classes=args.num_classes, n_merges=args.n_merges)


if __name__ == "__main__":
    main()
