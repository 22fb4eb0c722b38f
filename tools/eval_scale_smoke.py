"""Dataset-scale evaluation smoke: prove the streamed metric cascades hold at
reference scale (iFashion test split: 1,988 outfit ids — `/root/reference/
Evaluation/evaluate_fitb.py:157-436` operates at this size) without pretrained
weights (zero-egress image): random-weight backbones, synthetic JPEGs, REAL
`python -m difashion_tpu evaluate` CLI.

Synthesizes a FashionData dir + a pipeline-contract manifest of --n_outfits
outfits (FITB: 1 generated image each; GOR: 4), runs the evaluate CLI as a
subprocess, and prints one JSON line with wall time + peak RSS — the number that
proves streaming: RSS must stay far below the ~12 GB the naive everything-in-
memory cascade would need at this scale.

Usage: python tools/eval_scale_smoke.py --out /tmp/evalscale [--task FITB]
       [--grounding] [--n_outfits 1988] [--n_items 4000] [--img 512] [--reuse]
"""
import argparse
import json
import os
import resource
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def synth(out: str, task: str, n_outfits: int, n_items: int, img: int,
          emb_dim: int = 1024) -> dict:
    """Build dataset dir + item images + generated-run tree. Returns paths."""
    from difashion_tpu.engine.pipeline import save_jpeg

    data_dir = os.path.join(out, "data")
    img_dir = os.path.join(out, "imgs")
    gen_dir = os.path.join(out, "gen")
    os.makedirs(data_dir, exist_ok=True)
    os.makedirs(os.path.join(data_dir, "map"), exist_ok=True)

    rng = np.random.RandomState(0)
    n_cates = 50

    # --- item catalog: JPEGs on disk + iid -> relpath table -------------------
    # item 0 is the null white image (reference convention)
    paths = []
    t0 = time.time()
    for iid in range(n_items):
        rel = os.path.join(str(iid % 97), f"{iid}.jpg")
        p = os.path.join(img_dir, rel)
        if not os.path.exists(p):
            if iid == 0:
                arr = np.full((img, img, 3), 255, np.uint8)
            else:
                # low-frequency random texture compresses ~like real photos
                base = rng.rand(8, 8, 3)
                arr = np.kron(base, np.ones((img // 8, img // 8, 1)))
                arr = (np.clip(arr + rng.rand(img, img, 3) * 0.15, 0, 1)
                       * 255).astype(np.uint8)
            save_jpeg(arr, p)
        paths.append(rel)
    print(f"catalog: {n_items} item JPEGs in {time.time()-t0:.1f}s", flush=True)
    np.save(os.path.join(out, "all_item_image_paths.npy"),
            np.array(paths, dtype=object))

    # catalog CLIP features (the precomputed cnn_features_clip.npy input)
    cnn = rng.randn(n_items, emb_dim).astype(np.float32)
    cnn /= np.linalg.norm(cnn, axis=-1, keepdims=True)
    np.save(os.path.join(out, "cnn_features_clip.npy"), cnn)

    # --- dataset dicts --------------------------------------------------------
    id_cate = {c: f"category-{c}" for c in range(1, n_cates + 1)}
    np.save(os.path.join(data_dir, "id_cate_dict.npy"),
            np.array(id_cate, dtype=object))
    cate_iid = {c: rng.randint(1, n_items, size=200).tolist()
                for c in range(1, n_cates + 1)}
    np.save(os.path.join(data_dir, "map", "cate_iid_dict.npy"),
            np.array(cate_iid, dtype=object))

    n_users = max(1, n_outfits // 4)
    test_grd, retrieval, history, hist_embs = {}, {}, {}, {}
    man, grd_man = {}, {}
    n_gen = 1 if task == "FITB" else 4
    run = os.path.join(gen_dir, f"{task}-scale-run")
    t0 = time.time()
    n_imgs = 0
    for i in range(n_outfits):
        uid = 1 + i % n_users
        oid = 10_000 + i
        outfits = rng.randint(1, n_items, size=4)
        cates = rng.randint(1, n_cates + 1, size=4)
        test_grd[oid] = {"outfits": outfits.tolist(),
                         "category": cates.tolist()}
        retrieval.setdefault(uid, {})[oid] = (
            [int(outfits[0])] + rng.randint(1, n_items, size=4).tolist()
        )
        hu = history.setdefault(uid, {})
        for c in cates[:2]:
            hu.setdefault(int(c), rng.randint(1, n_items, size=3).tolist())

        # generated images: reuse catalog textures shifted (distinct files)
        img_paths = []
        for j in range(n_gen):
            p = os.path.join(run, "images", str(uid), str(oid), f"{j}.jpg")
            if not os.path.exists(p):
                src = (i * n_gen + j) % (n_items - 1) + 1
                from PIL import Image

                with Image.open(os.path.join(img_dir, paths[src])) as im:
                    arr = np.asarray(im.convert("RGB"))
                from difashion_tpu.engine.pipeline import save_jpeg as sj

                sj(255 - arr, p)   # inverted: distinct distribution from grd
            img_paths.append(p)
            n_imgs += 1
        rec = outfits.copy()
        rec[:n_gen] = 0
        man.setdefault(uid, {})[oid] = {
            "cates": cates[:n_gen].tolist(),
            "full_cates": cates,
            "outfits": rec,
            "image_paths": img_paths,
        }
        grd_man[oid] = test_grd[oid]
    print(f"manifest: {n_outfits} outfits / {n_imgs} generated JPEGs "
          f"in {time.time()-t0:.1f}s", flush=True)
    np.save(run + ".npy", np.array(man, dtype=object))
    np.save(os.path.join(data_dir, "test_grd.npy"),
            np.array(test_grd, dtype=object))
    np.save(os.path.join(data_dir, "fitb_test_retrieval_candidates.npy"),
            np.array(retrieval, dtype=object))
    np.save(os.path.join(data_dir, "test_history.npy"),
            np.array(history, dtype=object))

    # per-(uid, cid) mean history CLIP embeddings (precompute contract)
    for uid, by_c in history.items():
        hist_embs[uid] = {c: cnn[np.asarray(v)].mean(0) for c, v in by_c.items()}
    np.save(os.path.join(out, "history_clipembs.npy"),
            np.array(hist_embs, dtype=object))

    return {"data": data_dir, "imgs": img_dir, "gen": gen_dir}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/evalscale")
    p.add_argument("--task", choices=["FITB", "GOR"], default="FITB")
    p.add_argument("--grounding", action="store_true")
    p.add_argument("--n_outfits", type=int, default=1988)
    p.add_argument("--n_items", type=int, default=4000)
    p.add_argument("--img", type=int, default=512)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--emb_dim", type=int, default=None,
                   help="catalog CLIP-feature dim (default: 1024, or 16 with --tiny)")
    p.add_argument("--tiny", action="store_true",
                   help="tiny backbones (CPU-feasible plumbing check)")
    p.add_argument("--artifact", default=None,
                   help="artifact JSONL path (default: tools/logs/"
                        "eval_scale_smoke.jsonl in the repo)")
    args = p.parse_args()

    emb_dim = args.emb_dim or (16 if args.tiny else 1024)
    dirs = synth(args.out, args.task, args.n_outfits, args.n_items,
                 args.img, emb_dim=emb_dim)

    cmd = [
        sys.executable, "-m", "difashion_tpu", "evaluate",
        "--data_path", dirs["data"],
        "--gen_dir", dirs["gen"],
        "--task", args.task,
        "--img_folder_path", dirs["imgs"],
        "--image_paths_npy", os.path.join(args.out, "all_item_image_paths.npy"),
        "--cnn_features_npy", os.path.join(args.out, "cnn_features_clip.npy"),
        "--hist_clipembs_npy", os.path.join(args.out, "history_clipembs.npy"),
        "--batch_size", str(args.batch_size),
        "--allow_random_weights",
    ]
    if args.grounding:
        cmd.append("--grounding")
    if args.tiny:
        cmd.append("--tiny")
    print("+", " ".join(cmd), flush=True)
    t0 = time.time()
    r = subprocess.run(cmd, cwd=os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    wall = time.time() - t0
    # peak RSS of the child (the evaluate process), in bytes (linux: KiB units)
    peak = resource.getrusage(resource.RUSAGE_CHILDREN).ru_maxrss * 1024
    line = {
        "metric": f"eval_scale_smoke_{args.task}"
                  f"{'_grounding' if args.grounding else ''}",
        "n_outfits": args.n_outfits,
        "n_items": args.n_items,
        "wall_s": round(wall, 1),
        "peak_rss_gib": round(peak / 2**30, 2),
        "returncode": r.returncode,
    }
    print(json.dumps(line), flush=True)
    if not args.tiny:
        # durable artifact: JSONL append (atomic-enough, race-tolerant across
        # concurrent FITB/GOR legs); persistence failures never change the
        # exit code of a finished eval run.
        try:
            repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
            art = args.artifact or os.path.join(
                repo, "tools", "logs", "eval_scale_smoke.jsonl")
            os.makedirs(os.path.dirname(art), exist_ok=True)
            with open(art, "a") as f:
                f.write(json.dumps(line) + "\n")
        except OSError as e:
            print(f"artifact append failed (ignored): {e}", file=sys.stderr)
    sys.exit(r.returncode)


if __name__ == "__main__":
    main()
