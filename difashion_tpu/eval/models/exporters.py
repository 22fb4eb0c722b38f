"""Eval-backbone weight exporters: our param trees -> torch-layout state dicts.

Exact inverses of the importers in `open_clip_vit.py` / `inception.py` / `lpips.py`
/ `compat.py`, producing the key layouts the reference stack consumes
(open_clip ViT state dict, torchvision/pytorch_fid InceptionV3, torchvision vgg16,
lpips linear heads, `compatibility_net.FashionEvaluator` —
`/root/reference/Evaluation/eval_utils.py:93,197`,
`/root/reference/Evaluation/compatibility_evaluator/compatibility_net.py:14-81`).

Two uses:
  * interchange — users can take backbones OUT of this framework in a form torch
    tooling reads (mirror of `tools/export_hf.py` for the generation towers);
  * the weights-arrival drill — `tools/export_eval_weights.py` materializes a
    synthetic-but-complete weights_dir on disk, and the strict parity runbook is
    proven end to end without `--allow_random_weights` (tests/test_parity_cli.py).
"""
from __future__ import annotations

from typing import Dict

import numpy as np

from difashion_tpu.eval.models.compat import (
    _EMB_LINEAR,
    _EMB_LN,
    _EVAL_LINEAR,
    _EVAL_LN,
)


def _np(x) -> np.ndarray:
    return np.asarray(x, np.float32)


def _contig(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """safetensors serializes the raw buffer, so transposed views MUST be made
    contiguous as the final step (a .T view saved directly writes the
    pre-transpose bytes)."""
    return {k: np.ascontiguousarray(v) for k, v in sd.items()}


def export_openclip_params(visual_params, text_params) -> Dict[str, np.ndarray]:
    """(visual, text) param trees -> open_clip ViT state dict
    (inverse of `import_openclip_params`)."""
    sd: Dict[str, np.ndarray] = {}

    def dump_block(tree, prefix, i):
        b = tree[f"resblocks_{i}"]
        p = f"{prefix}transformer.resblocks.{i}."
        sd[p + "ln_1.weight"] = _np(b["ln_1"]["scale"])
        sd[p + "ln_1.bias"] = _np(b["ln_1"]["bias"])
        sd[p + "ln_2.weight"] = _np(b["ln_2"]["scale"])
        sd[p + "ln_2.bias"] = _np(b["ln_2"]["bias"])
        sd[p + "attn.in_proj_weight"] = _np(b["in_proj"]["kernel"]).T
        sd[p + "attn.in_proj_bias"] = _np(b["in_proj"]["bias"])
        sd[p + "attn.out_proj.weight"] = _np(b["out_proj"]["kernel"]).T
        sd[p + "attn.out_proj.bias"] = _np(b["out_proj"]["bias"])
        sd[p + "mlp.c_fc.weight"] = _np(b["c_fc"]["kernel"]).T
        sd[p + "mlp.c_fc.bias"] = _np(b["c_fc"]["bias"])
        sd[p + "mlp.c_proj.weight"] = _np(b["c_proj"]["kernel"]).T
        sd[p + "mlp.c_proj.bias"] = _np(b["c_proj"]["bias"])

    vis = visual_params
    sd["visual.conv1.weight"] = np.transpose(_np(vis["patch_embed"]["kernel"]),
                                             (3, 2, 0, 1))
    sd["visual.class_embedding"] = _np(vis["class_embedding"])
    sd["visual.positional_embedding"] = _np(vis["positional_embedding"])
    sd["visual.ln_pre.weight"] = _np(vis["ln_pre"]["scale"])
    sd["visual.ln_pre.bias"] = _np(vis["ln_pre"]["bias"])
    sd["visual.ln_post.weight"] = _np(vis["ln_post"]["scale"])
    sd["visual.ln_post.bias"] = _np(vis["ln_post"]["bias"])
    sd["visual.proj"] = _np(vis["proj"])
    for i in range(sum(1 for k in vis if k.startswith("resblocks_"))):
        dump_block(vis, "visual.", i)

    txt = text_params
    sd["token_embedding.weight"] = _np(txt["token_embedding"]["embedding"])
    sd["positional_embedding"] = _np(txt["positional_embedding"])
    sd["ln_final.weight"] = _np(txt["ln_final"]["scale"])
    sd["ln_final.bias"] = _np(txt["ln_final"]["bias"])
    sd["text_projection"] = _np(txt["text_projection"])
    for i in range(sum(1 for k in txt if k.startswith("resblocks_"))):
        dump_block(txt, "", i)
    return _contig(sd)


def export_inception_params(variables) -> Dict[str, np.ndarray]:
    """Our {params, batch_stats} variables -> torchvision InceptionV3 state dict
    (inverse of `import_inception_params`; covers conv/bn/fc leaves)."""
    sd: Dict[str, np.ndarray] = {}
    params = variables["params"]
    stats = variables.get("batch_stats", {})

    def walk(tree, stats_tree, prefix):
        for name, sub in tree.items():
            tkey = prefix + name if not prefix else prefix + "." + name
            if name == "conv" and "kernel" in sub:
                sd[tkey + ".weight"] = np.transpose(_np(sub["kernel"]), (3, 2, 0, 1))
            elif name == "bn" and "scale" in sub:
                sd[tkey + ".weight"] = _np(sub["scale"])
                sd[tkey + ".bias"] = _np(sub["bias"])
                st = stats_tree[name]
                sd[tkey + ".running_mean"] = _np(st["mean"])
                sd[tkey + ".running_var"] = _np(st["var"])
            elif name == "fc" and "kernel" in sub:
                sd["fc.weight"] = _np(sub["kernel"]).T
                sd["fc.bias"] = _np(sub["bias"])
            elif isinstance(sub, dict):
                walk(sub, stats_tree.get(name, {}), tkey)

    walk(params, stats, "")
    return _contig(sd)


def export_vgg_params(vgg_params) -> Dict[str, np.ndarray]:
    """conv_{i} HWIO -> torchvision vgg16 `features.{idx}` OIHW
    (inverse of `import_vgg_params`)."""
    tv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    sd: Dict[str, np.ndarray] = {}
    for i, ti in enumerate(tv_idx):
        sd[f"features.{ti}.weight"] = np.transpose(
            _np(vgg_params[f"conv_{i}"]["kernel"]), (3, 2, 0, 1)
        )
        sd[f"features.{ti}.bias"] = _np(vgg_params[f"conv_{i}"]["bias"])
    return _contig(sd)


def export_lpips_lins(lpips_params) -> Dict[str, np.ndarray]:
    """lin_{i} [C,1] -> lpips `lin{i}.model.1.weight` [1,C,1,1]
    (inverse of `import_lpips_lins`)."""
    sd: Dict[str, np.ndarray] = {}
    for i in range(5):
        w = _np(lpips_params[f"lin_{i}"])
        sd[f"lin{i}.model.1.weight"] = w.reshape(1, w.shape[0], 1, 1)
    return _contig(sd)


def export_compat_params(params) -> Dict[str, np.ndarray]:
    """Our FashionEvaluator tree -> torch `compatibility_net.FashionEvaluator`
    state dict (inverse of `import_compat_params`)."""
    sd: Dict[str, np.ndarray] = {}
    sd["feat_layer.weight"] = _np(params["feat_layer"]["kernel"]).T
    sd["feat_layer.bias"] = _np(params["feat_layer"]["bias"])
    for group, lin_map, ln_map in (("emb_layer", _EMB_LINEAR, _EMB_LN),
                                   ("eval_layer", _EVAL_LINEAR, _EVAL_LN)):
        for idx, name in lin_map.items():
            sd[f"{group}.{idx}.weight"] = _np(params[name]["kernel"]).T
            sd[f"{group}.{idx}.bias"] = _np(params[name]["bias"])
        for idx, name in ln_map.items():
            sd[f"{group}.{idx}.weight"] = _np(params[name]["scale"])
            sd[f"{group}.{idx}.bias"] = _np(params[name]["bias"])
    return _contig(sd)
