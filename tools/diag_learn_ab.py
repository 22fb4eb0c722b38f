"""Diagnose the mid-scale no-learning failure: train-only A/B at the learning
proof's exact config, toggling ONE variable per run via env/flags.

Background (round 5): tools/learning_proof_tpu.py trains 6000 steps at the mid
preset on TPU and the loss NEVER leaves the ~1.0 lottery floor — the resumed
second half replays the first half's loss series to ~3 decimals (same rng
sequence after resume + a model whose function did not move). The tiny CPU
test (tests/test_learning_e2e.py, XLA attention, same latent grid) memorizes
in 300 steps, and the full-scale soak (flash at 4096 tokens) learns — so the
suspects are the compiled flash kernel at SMALL sequence lengths (the proof
force-lowers DIFASHION_FLASH_MIN_SEQ to 64; only interpret-mode is
gradchecked there) and the optimization recipe.

Each invocation = ONE arm, one subprocess train run (the flash threshold is
read at import, so it must be set in a child process env):

  python tools/diag_learn_ab.py --flash on  --steps 1200   # reproduce arm
  python tools/diag_learn_ab.py --flash off --steps 1200   # XLA attention arm
  python tools/diag_learn_ab.py --flash off --lr 2e-3 ...  # lr arm

Prints one JSON line: first/last loss-window means + the verdict-relevant
`loss_fell` bool (same 0.6x rule as the proof).
"""
import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))
sys.path.insert(0, os.path.join(REPO, "tools"))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default="/tmp/diagab")
    p.add_argument("--steps", type=int, default=1200)
    p.add_argument("--img", type=int, default=64)
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--flash", choices=["on", "off"], default="on")
    p.add_argument("--tag", default="")
    args = p.parse_args()

    tag = args.tag or f"flash_{args.flash}_lr{args.lr:g}_img{args.img}"
    wd = os.path.join(args.workdir, tag)
    dpath, ckpt = os.path.join(wd, "data"), os.path.join(wd, "ckpt")
    os.makedirs(wd, exist_ok=True)

    from learning_proof_tpu import mid_config  # tools/ sibling

    from test_learning_e2e import _write_dataset

    cfg = mid_config(ckpt, args.img, args.steps, 50, lr=args.lr)
    _write_dataset(dpath, cfg)
    cfg_path = os.path.join(wd, "cfg.json")
    with open(cfg_path, "w") as f:
        f.write(cfg.to_json())

    env = dict(os.environ)
    seq0 = (args.img // 8) ** 2
    if args.flash == "on":
        env["DIFASHION_FLASH_MIN_SEQ"] = str(seq0)
        env["DIFASHION_FLASH_MIN_KV"] = str(min(seq0, 256))
    else:
        env["DIFASHION_FLASH_MIN_SEQ"] = "999999"
        env["DIFASHION_FLASH_MIN_KV"] = "999999"

    t0 = time.time()
    r = subprocess.run(
        [sys.executable, "-u", "-m", "difashion_tpu", "train",
         "--data_path", dpath, "--output_dir", ckpt, "--config", cfg_path],
        cwd=REPO, env=env,
    )
    wall = round(time.time() - t0, 1)

    losses = [json.loads(l)["loss"]
              for l in open(os.path.join(ckpt, "metrics.jsonl"))]
    k = max(1, min(5, len(losses) // 4))
    first, last = float(np.mean(losses[:k])), float(np.mean(losses[-k:]))
    print(json.dumps({
        "arm": tag, "steps": args.steps, "lr": args.lr, "flash": args.flash,
        "rc": r.returncode, "wall_s": wall,
        "loss_first": round(first, 4), "loss_last": round(last, 4),
        "loss_min_window": round(float(np.min(losses)), 4),
        "loss_fell": bool(last < 0.6 * first),
    }), flush=True)


if __name__ == "__main__":
    main()
