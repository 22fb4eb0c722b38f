"""Turnkey quality-parity runbook: import weights -> generate -> evaluate -> compare.

One command reproducing the reference's release verification flow
(train -> `checkpoint-15000` -> `inf4eval.py` -> `evaluate_fitb.py`,
`/root/reference/DiFashion/inf4eval.py:664`,
`/root/reference/Evaluation/evaluate_fitb.py:441-463`) and printing the
reference-vs-ours table with the north-star 2% gates on FID/LPIPS:

  python -m difashion_tpu parity \\
      --ckpt_dir ckpt/ --weights_dir eval_weights/ --tokenizer_dir tok/ \\
      --data_path datasets/ifashion --img_folder_path imgs/ \\
      --image_paths_npy all_item_image_paths.npy \\
      --reference_results ref_eval_results.npy --out_dir parity_run/

`--reference_results` accepts the reference's `eval_results.npy` (a dict
{run_name: {metric: value}} — the first/only run is used) or a flat JSON
{metric: value}. Without it, the table prints ours-only with gates marked
"no reference value".

This command is strict by design: it refuses to run with the hash-tokenizer
fallback or random-init eval backbones (that's the whole point of a parity run);
`--allow_random_weights` exists only so the e2e test can exercise the plumbing.
"""
from __future__ import annotations

import argparse
import json
import os
from typing import Dict, Optional

import numpy as np

from difashion_tpu.core.logging import setup_logging

# metrics gated at 2% (north-star: FID/LPIPS within 2% of the reference);
# the rest are reported with their relative delta, ungated.
GATED = ("fid", "lpips")
GATE_PCT = 2.0


def load_reference_results(path: Optional[str]) -> Dict[str, float]:
    if not path:
        return {}
    if path.endswith(".json"):
        with open(path) as f:
            return {k: float(v) for k, v in json.load(f).items()}
    obj = np.load(path, allow_pickle=True).item()
    # reference eval_results.npy: {run_name: {metric: value}}
    if obj and all(isinstance(v, dict) for v in obj.values()):
        obj = next(iter(obj.values()))
    out = {}
    for k, v in obj.items():
        try:
            out[k] = float(np.asarray(v).reshape(-1)[0])
        except (TypeError, ValueError):
            pass
    return out


def parity_table(ours: Dict[str, float], reference: Dict[str, float]) -> list:
    """Rows: (metric, ours, ref, delta_pct, gate_status). A GATED metric that the
    reference pins but we did not measure (or could not parse) is a FAIL — a
    parity run must never report success with the north-star metrics unchecked."""
    rows = []
    for k in sorted(set(ours) | set(reference)):
        o = ours.get(k)
        r = reference.get(k)
        o_f = None
        if o is not None:
            try:
                o_f = float(np.asarray(o).reshape(-1)[0])
            except (TypeError, ValueError):
                o_f = None
        if o_f is None or r is None:
            if k in GATED and r is not None:
                rows.append((k, o_f, r, None, "FAIL (gated metric not measured)"))
            else:
                rows.append((k, o_f, r, None,
                             "no reference value" if r is None else "not measured"))
            continue
        delta = abs(o_f - r) / max(abs(r), 1e-12) * 100.0
        if k in GATED:
            status = f"PASS (<= {GATE_PCT}%)" if delta <= GATE_PCT else \
                f"FAIL (> {GATE_PCT}%)"
        else:
            status = "reported"
        rows.append((k, o_f, r, delta, status))
    return rows


def print_table(rows: list, log) -> bool:
    log.info("%-22s %12s %12s %9s  %s", "metric", "ours", "reference", "delta%",
             "gate")
    ok = True
    for k, o, r, d, status in rows:
        log.info(
            "%-22s %12s %12s %9s  %s",
            k,
            f"{o:.5g}" if o is not None else "-",
            f"{r:.5g}" if r is not None else "-",
            f"{d:.2f}" if d is not None else "-",
            status,
        )
        if status.startswith("FAIL"):
            ok = False
    return ok


def main(argv=None):
    p = argparse.ArgumentParser(description="DiFashion-TPU quality-parity runbook")
    p.add_argument("--data_path", required=True)
    p.add_argument("--ckpt_dir", required=True)
    p.add_argument("--ckpt_step", type=int, default=None)
    p.add_argument("--weights_dir", required=True,
                   help="eval backbone checkpoints (build_extractors layout)")
    p.add_argument("--tokenizer_dir", default=None,
                   help="CLIP vocab.json + merges.txt (default: "
                        "<weights_dir>/tokenizer)")
    p.add_argument("--img_folder_path", required=True)
    p.add_argument("--image_paths_npy", required=True)
    p.add_argument("--cnn_features_npy", default=None)
    p.add_argument("--hist_clipembs_npy", default=None)
    p.add_argument("--cid_to_label_npy", default=None)
    p.add_argument("--reference_results", default=None)
    p.add_argument("--task", choices=["FITB", "GOR"], default="FITB")
    p.add_argument("--mode", choices=["valid", "test"], default="valid")
    p.add_argument("--out_dir", default="parity_run")
    p.add_argument("--max_batches", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--grounding", action="store_true",
                   help="also run the grounding driver")
    p.add_argument("--config", default=None,
                   help="model/generation config JSON (forwarded to generate — "
                        "REQUIRED for checkpoints not trained on a preset)")
    p.add_argument("--num_inference_steps", type=int, default=None)
    p.add_argument("--scheduler", choices=["pndm", "ddim", "dpmpp"], default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--allow_random_weights", action="store_true",
                   help="test plumbing only — NEVER a real parity run")
    p.add_argument("--table_out", default=None,
                   help="also write the delta table as JSON (default: "
                        "<out_dir>/parity_table.json)")
    args = p.parse_args(argv)

    log = setup_logging()
    tok_dir = args.tokenizer_dir or os.path.join(args.weights_dir, "tokenizer")

    # 1) generate on the requested split (refuses on hash-tokenizer fallback)
    from difashion_tpu.cli.generate import main as generate_main

    gen_argv = [
        "--data_path", args.data_path,
        "--ckpt_dir", args.ckpt_dir,
        "--task", args.task,
        "--mode", args.mode,
        "--output_dir", args.out_dir,
        "--tokenizer_dir", tok_dir,
    ]
    if args.ckpt_step is not None:
        gen_argv += ["--ckpt_step", str(args.ckpt_step)]
    if args.max_batches is not None:
        gen_argv += ["--max_batches", str(args.max_batches)]
    # generation settings must match how the checkpoint is meant to run
    for flag, val in (("--config", args.config),
                      ("--num_inference_steps", args.num_inference_steps),
                      ("--scheduler", args.scheduler),
                      ("--seed", args.seed)):
        if val is not None:
            gen_argv += [flag, str(val)]
    if args.tiny:
        gen_argv += ["--tiny"]
    if args.allow_random_weights:
        gen_argv += ["--allow_random_weights"]
    log.info("[parity 1/3] generation: %s %s", args.task, args.mode)
    run_dir = generate_main(gen_argv)
    this_run = os.path.basename(run_dir)

    # 2) all metric drivers over the fresh run (refuses on random backbones)
    from difashion_tpu.cli.evaluate import main as evaluate_main

    eval_argv = [
        "--data_path", args.data_path,
        "--gen_dir", args.out_dir,
        "--task", args.task,
        "--mode", args.mode,
        "--weights_dir", args.weights_dir,
        "--img_folder_path", args.img_folder_path,
        "--image_paths_npy", args.image_paths_npy,
        "--batch_size", str(args.batch_size),
    ]
    for flag, val in (("--cnn_features_npy", args.cnn_features_npy),
                      ("--hist_clipembs_npy", args.hist_clipembs_npy),
                      ("--cid_to_label_npy", args.cid_to_label_npy)):
        if val:
            eval_argv += [flag, val]
    if args.tiny:
        eval_argv += ["--tiny"]
    if args.allow_random_weights:
        eval_argv += ["--allow_random_weights"]
    log.info("[parity 2/3] evaluation drivers")
    evaluate_main(eval_argv)
    if args.grounding:
        evaluate_main(eval_argv + ["--grounding"])

    # 3) the comparison table with 2% gates — for THE RUN JUST GENERATED (the
    # results file accumulates every run ever evaluated into this out_dir)
    results_path = os.path.join(args.out_dir, "eval_results.npy")
    all_results = np.load(results_path, allow_pickle=True).item()
    if this_run not in all_results:
        raise SystemExit(f"run {this_run!r} missing from {results_path} "
                         f"(found: {sorted(all_results)[:3]})")
    ours = dict(all_results[this_run])
    if args.grounding:
        gpath = os.path.join(args.out_dir, "eval_results_grounding.npy")
        gres = np.load(gpath, allow_pickle=True).item().get(this_run, {})
        ours.update({f"grounding_{k}": v for k, v in gres.items()})
    reference = load_reference_results(args.reference_results)
    if args.reference_results and not reference:
        raise SystemExit(
            f"--reference_results {args.reference_results!r} yielded no usable "
            "metric values (wrong file or unexpected layout?) — refusing to "
            "report a gate-idle table as if no reference were given"
        )
    log.info("[parity 3/3] reference comparison for %s", this_run)
    rows = parity_table(ours, reference)
    ok = print_table(rows, log)
    # durable artifact: the machine-readable delta table for the judge/runbook
    table_out = args.table_out or os.path.join(args.out_dir, "parity_table.json")
    tmp = table_out + ".tmp"
    with open(tmp, "w") as f:
        json.dump({
            "run": this_run,
            "task": args.task,
            "mode": args.mode,
            "gated": list(GATED),
            "gate_pct": GATE_PCT,
            "rows": [
                {"metric": k, "ours": o, "reference": r, "delta_pct": d,
                 "gate": status}
                for k, o, r, d, status in rows
            ],
            "ok": ok,
        }, f, indent=1)
    os.replace(tmp, table_out)
    log.info("parity table written: %s", table_out)
    if reference and not ok:
        raise SystemExit("parity FAILED: gated metric outside the 2% window "
                         "or not measured")
    if not reference:
        log.info("(no --reference_results given: table is ours-only, gates idle)")
    log.info("parity run complete: %s", results_path)


if __name__ == "__main__":
    main()
