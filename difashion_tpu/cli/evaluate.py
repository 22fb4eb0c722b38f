"""Evaluation CLI: run the metric cascades over generated-run manifests.

Equivalent of the reference's four eval scripts + shell wrappers
(`/root/reference/Evaluation/evaluate_fitb.py`, `evaluate_gor.py`,
`evaluate_grounding_{fitb,gor}.py`, `run_eval_*.sh`): discovers run manifests under
`--gen_dir` ("all" behavior, `evaluate_fitb.py:124-130`), skips already-evaluated runs,
and prints the metric report.
"""
from __future__ import annotations

import argparse
import glob
import os

import numpy as np

from difashion_tpu.core.logging import setup_logging
from difashion_tpu.data.datasets import FashionData
from difashion_tpu.eval.drivers import (
    EvalContext,
    evaluate_fitb,
    evaluate_gor,
    evaluate_grounding_fitb,
    evaluate_grounding_gor,
)
from difashion_tpu.eval.extractors import build_extractors


def discover_runs(gen_dir: str, task: str):
    """Run manifests are `<run_name>.npy` next to `<run_name>/images/`."""
    out = []
    for p in sorted(glob.glob(os.path.join(gen_dir, f"{task}-*.npy"))):
        if p.endswith("_grd.npy"):
            continue
        out.append(p[:-len(".npy")])
    return out


def main(argv=None):
    p = argparse.ArgumentParser(description="DiFashion-TPU evaluation")
    p.add_argument("--data_path", required=True)
    p.add_argument("--gen_dir", required=True)
    p.add_argument("--task", choices=["FITB", "GOR"], default="FITB")
    p.add_argument("--mode", choices=["valid", "test"], default="test")
    p.add_argument("--grounding", action="store_true")
    p.add_argument("--weights_dir", default=None,
                   help="eval backbone checkpoints (see build_extractors)")
    p.add_argument("--img_folder_path", default=None)
    p.add_argument("--image_paths_npy", default=None,
                   help="all_item_image_paths.npy (iid -> relative path)")
    p.add_argument("--cnn_features_npy", default=None,
                   help="cnn_features_clip.npy (iid -> 1024-d CLIP emb)")
    p.add_argument("--hist_clipembs_npy", default=None)
    p.add_argument("--cid_to_label_npy", default=None,
                   help="finetuned-Inception {cid: class row} map "
                        "(reference Evaluation/finetuned_inception/cid_to_label.npy)")
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--allow_random_weights", action="store_true",
                   help="run even when eval backbones have no pretrained weights "
                        "(random init; metric numbers will be meaningless)")
    args = p.parse_args(argv)

    log = setup_logging()
    data = FashionData.load(args.data_path)

    # ---- upfront precondition checks: fail BEFORE the multi-GB backbone loads
    # and manifest-wide feature extraction, not hours into the cascade ----------
    if args.image_paths_npy is None or args.img_folder_path is None:
        raise SystemExit("--image_paths_npy AND --img_folder_path are required: "
                         "every cascade scores against ground-truth item images")
    if args.grounding:
        if args.cnn_features_npy is None:
            raise SystemExit("--grounding requires --cnn_features_npy (catalog "
                             "CLIP features are the retrieval index)")
        if args.task == "FITB" and data.retrieval_candidates.get(args.mode) is None:
            raise SystemExit(f"--grounding FITB requires retrieval candidates for "
                             f"mode={args.mode} in the dataset")
        if args.task == "GOR" and data.cate_iid_dict is None:
            raise SystemExit("--grounding GOR requires map/cate_iid_dict.npy "
                             "(per-category candidate pools)")

    X = build_extractors(args.weights_dir, batch_size=args.batch_size,
                         tiny=args.tiny,
                         allow_random=args.allow_random_weights)

    image_paths = (np.load(args.image_paths_npy, allow_pickle=True)
                   if args.image_paths_npy else None)
    cnn = (np.load(args.cnn_features_npy, allow_pickle=True)
           if args.cnn_features_npy else None)
    hist_embs = (np.load(args.hist_clipembs_npy, allow_pickle=True).item()
                 if args.hist_clipembs_npy else None)
    cid_to_label = (np.load(args.cid_to_label_npy, allow_pickle=True).item()
                    if args.cid_to_label_npy else None)

    def item_loader(iid: int):
        from difashion_tpu.eval.drivers import load_image01

        return load_image01(
            os.path.join(args.img_folder_path, str(image_paths[iid])), 512
        )

    ctx = EvalContext(
        extractors=X,
        id_cate_dict=data.id_cate_dict,
        item_image_loader=item_loader,
        cnn_features_clip=cnn,
        history_clipembs=hist_embs,
        retrieval_candidates=data.retrieval_candidates.get(args.mode),
        cate_iid_dict=data.cate_iid_dict,
        cid_to_label=cid_to_label,
    )
    grd = data.valid_grd if args.mode == "valid" else data.test_grd

    fn = {
        ("FITB", False): evaluate_fitb,
        ("GOR", False): evaluate_gor,
        ("FITB", True): evaluate_grounding_fitb,
        ("GOR", True): evaluate_grounding_gor,
    }[(args.task, args.grounding)]

    for run in discover_runs(args.gen_dir, args.task):
        # split-mismatch guard: run names don't encode --mode, and scoring a
        # valid-split manifest against test ground truth would KeyError deep in
        # the cascade (or worse, resume onto the other split's cached metrics)
        man = np.load(run + ".npy", allow_pickle=True).item()
        man_oids = {int(o) for by_oid in man.values() for o in by_oid}
        unknown = man_oids - {int(o) for o in grd}
        if unknown:
            raise SystemExit(
                f"{os.path.basename(run)}: {len(unknown)}/{len(man_oids)} outfit "
                f"ids not in the {args.mode} ground truth (e.g. "
                f"{sorted(unknown)[:3]}) — was this run generated with the other "
                f"--mode?"
            )
        log.info("evaluating %s ...", os.path.basename(run))
        res = fn(run, ctx, grd)
        log.info("== %s ==", os.path.basename(run))
        for k, v in res.items():
            log.info("  %s: %s", k, v)


if __name__ == "__main__":
    main()
