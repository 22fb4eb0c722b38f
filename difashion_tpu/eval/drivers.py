"""Evaluation drivers: FITB / GOR / grounding-FITB / grounding-GOR metric cascades.

Re-implements the reference's four driver scripts (`/root/reference/Evaluation/
evaluate_fitb.py:104-463`, `evaluate_gor.py`, `evaluate_grounding_fitb.py`,
`evaluate_grounding_gor.py`) over the manifests our pipeline writes:

  * gen manifest  {uid: {oid: {cates, full_cates, outfits, image_paths}}}
  * metrics are appended to `eval_results.npy` keyed by run name, np.save'd after EVERY
    metric (the reference's crash-safe incremental behavior, `evaluate_fitb.py:216-436`)
  * already-computed metrics are skipped on re-run (`evaluate_fitb.py:164-169`)

Quirks preserved: eval prompts drop "high quality" and use the larger special-cates list
(`evaluate_fitb.py:51,88-102`); retrieval ground truth is candidate index 0; compat
pointers use negative ids for generated items (`eval_utils.py:575-584`); the reference's
`clip_og_retrieval_given_data` / call-site `clip_gor_retrieval_given_data` name mismatch
(`eval_utils.py:725` vs `evaluate_grounding_gor.py:255`) is resolved to the evident
intent (one top-N retrieval routine).

Deliberate DIVERGENCES from the reference (each logged loudly when hit):

  * `EvalContext.hist_emb` falls back to the catalog-index-0 (white null image) CLIP
    embedding when a (uid, cid) history entry is missing; the reference would KeyError
    (`eval_utils.py:503-538` indexes precomputed dicts directly). Personalization scores
    on sparse-history users therefore come from the null embedding instead of crashing;
    every fallback is counted and WARNING-logged, and the count is recorded in the
    results dict as `personal_sim_null_fallbacks` so a skew is visible in the artifact.
  * drivers skip metrics whose required assets are absent (availability-aware want
    lists) instead of crashing on the reference's hard file loads.
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Callable, Dict, Optional, Sequence

import numpy as np

from difashion_tpu.data.prompts import eval_prompt
from difashion_tpu.engine.pipeline import merge_images_grid
from difashion_tpu.eval.extractors import Extractors
from difashion_tpu.eval.metrics import (
    clip_image_score,
    clip_score,
    fid_from_features,
    inception_metrics,
    personalization_sim,
    retrieval_accuracy,
    topn_recall_grouped,
)
from difashion_tpu.eval.models.compat import gather_outfit_feats


def load_image01(path: str, size: Optional[int] = None) -> np.ndarray:
    from PIL import Image

    img = Image.open(path).convert("RGB")
    if size is not None and img.size != (size, size):
        # polyvore grd images are 291px; reference resizes them to 512
        # (`evaluate_fitb.py:174-205`)
        img = img.resize((size, size), Image.BILINEAR)
    return np.asarray(img, np.float32) / 255.0


@dataclass
class EvalContext:
    """Everything the drivers need besides the manifests."""

    extractors: Extractors
    id_cate_dict: Dict[int, str]
    item_image_loader: Callable[[int], np.ndarray]       # iid -> [H,W,3] in [0,1]
    cnn_features_clip: Optional[np.ndarray] = None       # [n_items, 1024]
    history_clipembs: Optional[dict] = None              # {uid: {cid: [1024]}}
    retrieval_candidates: Optional[dict] = None          # {uid: {oid: [5 iids]}}
    cate_iid_dict: Optional[dict] = None                 # {cid: [iids]}
    cid_to_label: Optional[dict] = None                  # {cid: class row}
    img_size: int = 512
    hist_emb_fallbacks: int = 0   # null-embedding substitutions (divergence note)

    def label_of(self, cid: int) -> int:
        if self.cid_to_label is not None:
            return int(self.cid_to_label[cid])
        return sorted(self.id_cate_dict).index(cid)

    def hist_emb(self, uid: int, cid: int) -> np.ndarray:
        """Per-(user, category) mean history CLIP embedding.

        DIVERGENCE (see module header): a missing (uid, cid) entry falls back to
        the catalog-index-0 (white null image) embedding instead of the
        reference's KeyError (`eval_utils.py:503-538`). Counted in
        `self.hist_emb_fallbacks` and WARNING-logged so the skew is never silent.
        """
        h = (self.history_clipembs or {}).get(uid, {})
        if cid in h:
            return np.asarray(h[cid], np.float32)
        if self.cnn_features_clip is not None:
            self.hist_emb_fallbacks += 1
            import logging

            logging.getLogger("difashion_tpu").warning(
                "no history CLIP embedding for uid=%d cid=%d — using the null-"
                "image embedding (reference would KeyError); personal_sim for "
                "this item is against the null image", uid, cid,
            )
            return np.asarray(self.cnn_features_clip[0], np.float32)
        raise KeyError(f"no history embedding for uid={uid} cid={cid}")



def _put_personal_sim(sink, ctx: EvalContext, emb, uids, cates) -> None:
    """personal_sim + record how many rows used the null-embedding fallback
    (divergence note in the module header): `personal_sim_null_fallbacks`
    lands in eval_results.npy next to the score it can skew."""
    before = ctx.hist_emb_fallbacks
    hist = np.stack([ctx.hist_emb(u, c) for u, c in zip(uids, cates)])
    sink.put("personal_sim", personalization_sim(emb, hist))
    n = ctx.hist_emb_fallbacks - before
    if n:
        sink.put("personal_sim_null_fallbacks", int(n))


class _ResultSink:
    """Incremental metric accumulator -> eval_results.npy (crash-safe resume)."""

    def __init__(self, out_path: str, run_name: str):
        self.path = out_path
        self.run = run_name
        if os.path.exists(out_path):
            self.all = np.load(out_path, allow_pickle=True).item()
        else:
            self.all = {}
        self.all.setdefault(run_name, {})

    def has(self, metric: str) -> bool:
        return metric in self.all[self.run]

    def put(self, metric: str, value) -> None:
        self.all[self.run][metric] = value
        # atomic replace: a SIGKILL mid-np.save on the shared results file would
        # otherwise corrupt EVERY previously saved metric of every run
        tmp = self.path + ".tmp.npy"
        np.save(tmp, np.array(self.all, dtype=object))
        os.replace(tmp, self.path)

    def results(self) -> dict:
        return self.all[self.run]


def stream_image_features(
    X: Extractors,
    loader: Callable[[int], np.ndarray],
    n: int,
    want: Sequence[str],
    chunk: Optional[int] = None,
) -> Dict[str, np.ndarray]:
    """Bounded-memory feature extraction: load `chunk` images at a time via
    `loader(i) -> [H,W,3] in [0,1]`, push them through every requested backbone, and
    keep only the (small) per-image features. The reference streams evaluation
    through DataLoaders (`evaluate_fitb.py:174-205`); materializing a whole manifest
    (iFashion test = 1,988 oids) as fp32 host arrays would be many GB.

    `want` ⊆ {"fid", "probs", "clip"} -> {name: [n, ...] features}."""
    if not want:
        return {}   # fully-cached runs must not re-decode the manifest
    chunk = chunk or max(X.batch_size, 1)
    acc: Dict[str, list] = {k: [] for k in want}
    for s in range(0, n, chunk):
        imgs = np.stack([loader(i) for i in range(s, min(s + chunk, n))])
        if "fid" in acc:
            acc["fid"].append(X.fid_features(imgs))
        if "probs" in acc:
            acc["probs"].append(X.inception_probs(imgs))
        if "clip" in acc:
            acc["clip"].append(X.clip_image_embs(imgs))
    return {k: np.concatenate(v, axis=0) for k, v in acc.items()}


def stream_lpips(
    X: Extractors,
    loader_a: Callable[[int], np.ndarray],
    loader_b: Callable[[int], np.ndarray],
    n: int,
    chunk: Optional[int] = None,
) -> np.ndarray:
    """Pairwise LPIPS with bounded host memory (see `stream_image_features`)."""
    chunk = chunk or max(X.batch_size, 1)
    out = []
    for s in range(0, n, chunk):
        idx = range(s, min(s + chunk, n))
        a = np.stack([loader_a(i) for i in idx])
        b = np.stack([loader_b(i) for i in idx])
        out.append(X.lpips(a, b))
    return np.concatenate(out)


def _flatten_fitb_manifest(manifest: dict):
    """-> (uids, oids, cates, outfits_rows, image_paths) parallel lists, one per
    generated image."""
    uids, oids, cates, rows, paths = [], [], [], [], []
    for uid, by_oid in manifest.items():
        for oid, rec in by_oid.items():
            for c, p in zip(rec["cates"], rec["image_paths"]):
                uids.append(uid)
                oids.append(oid)
                cates.append(int(c))
                rows.append(np.asarray(rec["outfits"]))
                paths.append(p)
    return uids, oids, cates, rows, paths


def evaluate_fitb(
    run_path: str,
    ctx: EvalContext,
    grd_dict: Dict[int, dict],
    out_path: Optional[str] = None,
    run_name: Optional[str] = None,
) -> dict:
    """FITB metric cascade over one generation run (`evaluate_fitb.py:157-436`)."""
    manifest = np.load(run_path + ".npy", allow_pickle=True).item()
    run_name = run_name or os.path.basename(run_path)
    out_path = out_path or os.path.join(os.path.dirname(run_path), "eval_results.npy")
    sink = _ResultSink(out_path, run_name)
    X = ctx.extractors

    uids, oids, cates, outfit_rows, paths = _flatten_fitb_manifest(manifest)
    N = len(paths)
    gen_loader = lambda k: load_image01(paths[k], ctx.img_size)
    # ground-truth item per generated slot: the grd outfit's item of the same category
    grd_iids = []
    for oid, c in zip(oids, cates):
        g = grd_dict[oid]
        idx = int(np.where(np.asarray(g["category"]) == c)[0][0])
        grd_iids.append(int(np.asarray(g["outfits"])[idx]))
    grd_loader = lambda k: ctx.item_image_loader(grd_iids[k])

    # a metric is "needed" only if missing from the sink AND computable with the
    # inputs provided — otherwise the CLIP tower would re-run over the full
    # manifest on every re-invocation for a metric that can never be written
    can_retrieval = (ctx.retrieval_candidates is not None
                     and ctx.cnn_features_clip is not None)
    can_personal = ctx.history_clipembs is not None
    can_compat = ctx.cnn_features_clip is not None
    need_gen_clip = any(not sink.has(m) and ok for m, ok in (
        ("clip_score", True),
        ("clip_retrieval_acc", can_retrieval),
        ("clip_image_score", True),
        ("personal_sim", can_personal),
        ("compatibility", can_compat),
    ))
    gen_want = [w for w, need in (
        ("fid", not sink.has("fid")),
        ("probs", not sink.has("is")),
        ("clip", need_gen_clip),
    ) if need]
    grd_want = [w for w, need in (
        ("fid", not sink.has("fid")),
        ("clip", not sink.has("grd_clip_score") or not sink.has("clip_image_score")),
    ) if need]
    gf = stream_image_features(X, gen_loader, N, gen_want)
    rf = stream_image_features(X, grd_loader, N, grd_want)
    gen_emb = gf.get("clip")

    if not sink.has("fid"):
        sink.put("fid", fid_from_features(gf["fid"], rf["fid"]))
    if not sink.has("is"):
        labels = np.asarray([ctx.label_of(c) for c in cates])
        sink.put("is", inception_metrics(gf["probs"], labels))

    if not sink.has("clip_score") or not sink.has("grd_clip_score"):
        prompts = [eval_prompt(ctx.id_cate_dict[c]) for c in cates]
        txt_emb = X.clip_text_embs(prompts)
        if not sink.has("clip_score"):
            sink.put("clip_score", clip_score(gen_emb, txt_emb))
        if not sink.has("grd_clip_score"):
            sink.put("grd_clip_score", clip_score(rf["clip"], txt_emb))
    if not sink.has("clip_retrieval_acc") and can_retrieval:
        cand = np.stack([
            np.asarray(ctx.retrieval_candidates[u][o], np.int64)
            for u, o in zip(uids, oids)
        ])
        cand_embs = ctx.cnn_features_clip[cand]
        acc, _ = retrieval_accuracy(gen_emb, cand_embs)
        sink.put("clip_retrieval_acc", acc)
    if not sink.has("clip_image_score"):
        sink.put("clip_image_score", clip_image_score(gen_emb, rf["clip"]))
    if not sink.has("lpips"):
        sink.put("lpips", float(np.mean(stream_lpips(X, gen_loader, grd_loader, N))))
    if not sink.has("personal_sim") and can_personal:
        _put_personal_sim(sink, ctx, gen_emb, uids, cates)
    need_c = not sink.has("compatibility")
    need_g = not sink.has("grd_compatibility")
    if (need_c or need_g) and can_compat:
        # generated slot -> negative pointer into gen_emb (eval_utils.py:575-584).
        # One row per (uid, oid): each blank gets its OWN image's pointer (image
        # order within an outfit matches slot order in the manifest), so outfits
        # with several blanks — legal in our pipeline even though the reference's
        # FITB always has exactly one — score the full generated set instead of
        # one image duplicated across every blank.
        out_rows, grd_rows, k = [], [], 0
        for uid, by_oid in manifest.items():
            for oid, rec in by_oid.items():
                row = np.asarray(rec["outfits"]).copy()
                nblank = int((row == 0).sum())
                row[row == 0] = -np.arange(k, k + nblank, dtype=row.dtype)
                k += nblank
                out_rows.append(row)
                grd_rows.append(np.asarray(grd_dict[oid]["outfits"]))
        if need_c:
            feats = gather_outfit_feats(
                np.stack(out_rows), ctx.cnn_features_clip, gen_emb
            )
            sink.put("compatibility", float(np.mean(X.compat_scores(feats))))
        if need_g:
            grd_feats = gather_outfit_feats(
                np.stack(grd_rows), ctx.cnn_features_clip, None
            )
            sink.put("grd_compatibility", float(np.mean(X.compat_scores(grd_feats))))
    return sink.results()


def evaluate_gor(
    run_path: str,
    ctx: EvalContext,
    grd_dict: Dict[int, dict],
    out_path: Optional[str] = None,
    run_name: Optional[str] = None,
) -> dict:
    """GOR cascade: item-level FID/IS/CLIP-score + outfit-level merged-grid
    CLIP-image/LPIPS (`evaluate_gor.py:107-120,217-237`) + compat per outfit."""
    manifest = np.load(run_path + ".npy", allow_pickle=True).item()
    run_name = run_name or os.path.basename(run_path)
    out_path = out_path or os.path.join(os.path.dirname(run_path), "eval_results.npy")
    sink = _ResultSink(out_path, run_name)
    X = ctx.extractors

    uids, oids, cates, _, paths = _flatten_fitb_manifest(manifest)
    N = len(paths)
    gen_loader = lambda k: load_image01(paths[k], ctx.img_size)
    grd_item_iids = []
    for oid in dict.fromkeys(oids):   # unique, order-preserving
        grd_item_iids.extend(int(i) for i in grd_dict[oid]["outfits"])
    grd_loader = lambda k: ctx.item_image_loader(grd_item_iids[k])

    can_personal = ctx.history_clipembs is not None
    can_compat = ctx.cnn_features_clip is not None
    need_gen_clip = any(not sink.has(m) and ok for m, ok in (
        ("clip_score", True),
        ("personal_sim", can_personal),
        ("compatibility", can_compat),
    ))
    gen_want = [w for w, need in (
        ("fid", not sink.has("fid")),
        ("probs", not sink.has("is")),
        ("clip", need_gen_clip),
    ) if need]
    gf = stream_image_features(X, gen_loader, N, gen_want)
    gen_emb = gf.get("clip")

    if not sink.has("fid"):
        rf = stream_image_features(X, grd_loader, len(grd_item_iids), ("fid",))
        sink.put("fid", fid_from_features(gf["fid"], rf["fid"]))
    if not sink.has("is"):
        labels = np.asarray([ctx.label_of(c) for c in cates])
        sink.put("is", inception_metrics(gf["probs"], labels))

    if not sink.has("clip_score"):
        prompts = [eval_prompt(ctx.id_cate_dict[c]) for c in cates]
        sink.put("clip_score", clip_score(gen_emb, X.clip_text_embs(prompts)))

    # outfit-level merged grids (streamed: one grid pair resident per index)
    if not sink.has("clip_image_score") or not sink.has("lpips"):
        recs = [
            (rec["image_paths"], grd_dict[oid]["outfits"])
            for uid, by_oid in manifest.items() for oid, rec in by_oid.items()
        ]

        def to_grid(im):
            return merge_images_grid(
                (im * 255).astype(np.uint8)
            ).astype(np.float32) / 255.0

        def grid_gen_loader(k):
            return to_grid(np.stack([
                load_image01(p, ctx.img_size) for p in recs[k][0]
            ]))

        def grid_grd_loader(k):
            return to_grid(np.stack([
                ctx.item_image_loader(int(i)) for i in recs[k][1]
            ]))

        n_outfits = len(recs)
        if not sink.has("clip_image_score"):
            mg_emb = stream_image_features(
                X, grid_gen_loader, n_outfits, ("clip",)
            )["clip"]
            mr_emb = stream_image_features(
                X, grid_grd_loader, n_outfits, ("clip",)
            )["clip"]
            sink.put("clip_image_score", clip_image_score(mg_emb, mr_emb))
        if not sink.has("lpips"):
            sink.put("lpips", float(np.mean(
                stream_lpips(X, grid_gen_loader, grid_grd_loader, n_outfits)
            )))

    if not sink.has("personal_sim") and can_personal:
        _put_personal_sim(sink, ctx, gen_emb, uids, cates)

    need_c = not sink.has("compatibility")
    need_g = not sink.has("grd_compatibility")
    if (need_c or need_g) and can_compat:
        rows, grd_rows, k = [], [], 0
        for uid, by_oid in manifest.items():
            for oid, rec in by_oid.items():
                nimg = len(rec["image_paths"])
                rows.append(-np.arange(k, k + nimg, dtype=np.int64))
                k += nimg
                grd_rows.append(np.asarray(grd_dict[oid]["outfits"]))
        if need_c:
            feats = gather_outfit_feats(np.stack(rows), ctx.cnn_features_clip,
                                        gen_emb)
            sink.put("compatibility", float(np.mean(X.compat_scores(feats))))
        if need_g:
            grd_feats = gather_outfit_feats(
                np.stack(grd_rows), ctx.cnn_features_clip, None
            )
            sink.put("grd_compatibility", float(np.mean(X.compat_scores(grd_feats))))
    return sink.results()


def evaluate_grounding_fitb(
    run_path: str,
    ctx: EvalContext,
    grd_dict: Dict[int, dict],
    out_path: Optional[str] = None,
    run_name: Optional[str] = None,
) -> dict:
    """Grounded FITB: retrieve the nearest real candidate for each generated image,
    then score the retrieved REAL item (`evaluate_grounding_fitb.py:216-296`)."""
    manifest = np.load(run_path + ".npy", allow_pickle=True).item()
    run_name = run_name or os.path.basename(run_path)
    out_path = out_path or os.path.join(
        os.path.dirname(run_path), "eval_results_grounding.npy"
    )
    sink = _ResultSink(out_path, run_name)
    X = ctx.extractors

    metrics = ("retrieval_acc", "clip_score", "clip_image_score", "lpips",
               "personal_sim", "compatibility")
    if all(sink.has(m) for m in metrics):
        return sink.results()   # resume: nothing left, skip every stream

    uids, oids, cates, outfit_rows, paths = _flatten_fitb_manifest(manifest)
    N = len(paths)
    gen_loader = lambda k: load_image01(paths[k], ctx.img_size)
    gen_emb = stream_image_features(X, gen_loader, N, ("clip",))["clip"]

    cand = np.stack([
        np.asarray(ctx.retrieval_candidates[u][o], np.int64)
        for u, o in zip(uids, oids)
    ])
    cand_embs = ctx.cnn_features_clip[cand]
    acc, preds = retrieval_accuracy(gen_emb, cand_embs)
    retrieved = cand[np.arange(len(preds)), preds]
    if not sink.has("retrieval_acc"):
        sink.put("retrieval_acc", acc)

    ret_loader = lambda k: ctx.item_image_loader(int(retrieved[k]))
    need_ret_emb = any(not sink.has(m) for m in
                       ("clip_score", "clip_image_score", "personal_sim"))
    ret_emb = (stream_image_features(X, ret_loader, N, ("clip",))["clip"]
               if need_ret_emb else None)
    grd_iids = []
    for oid, c in zip(oids, cates):
        g = grd_dict[oid]
        idx = int(np.where(np.asarray(g["category"]) == c)[0][0])
        grd_iids.append(int(np.asarray(g["outfits"])[idx]))
    grd_loader = lambda k: ctx.item_image_loader(grd_iids[k])
    grd_emb = (stream_image_features(X, grd_loader, N, ("clip",))["clip"]
               if not sink.has("clip_image_score") else None)

    if not sink.has("clip_score"):
        prompts = [eval_prompt(ctx.id_cate_dict[c]) for c in cates]
        sink.put("clip_score", clip_score(ret_emb, X.clip_text_embs(prompts)))
    if not sink.has("clip_image_score"):
        sink.put("clip_image_score", clip_image_score(ret_emb, grd_emb))
    if not sink.has("lpips"):
        sink.put("lpips", float(np.mean(stream_lpips(X, ret_loader, grd_loader, N))))
    if not sink.has("personal_sim") and ctx.history_clipembs is not None:
        _put_personal_sim(sink, ctx, ret_emb, uids, cates)
    if not sink.has("compatibility"):
        # one row per (uid, oid); each blank gets its own image's retrieved item
        # (multi-blank outfits — see the evaluate_fitb compat note)
        rows, k = [], 0
        for uid, by_oid in manifest.items():
            for oid, rec in by_oid.items():
                row = np.asarray(rec["outfits"]).copy()
                nblank = int((row == 0).sum())
                row[row == 0] = retrieved[k:k + nblank]
                k += nblank
                rows.append(row)
        feats = gather_outfit_feats(np.stack(rows), ctx.cnn_features_clip, None)
        sink.put("compatibility", float(np.mean(X.compat_scores(feats))))
    return sink.results()


def evaluate_grounding_gor(
    run_path: str,
    ctx: EvalContext,
    grd_dict: Dict[int, dict],
    out_path: Optional[str] = None,
    run_name: Optional[str] = None,
    topN: Sequence[int] = (10, 20, 50, 100),
) -> dict:
    """Grounded GOR: candidates = the category's full item pool; top-N recall
    (`evaluate_grounding_gor.py:204-282`)."""
    manifest = np.load(run_path + ".npy", allow_pickle=True).item()
    run_name = run_name or os.path.basename(run_path)
    out_path = out_path or os.path.join(
        os.path.dirname(run_path), "eval_results_grounding.npy"
    )
    sink = _ResultSink(out_path, run_name)
    X = ctx.extractors

    metrics = tuple(f"recall@{N}" for N in topN) + (
        "clip_score", "personal_sim", "compatibility")
    if all(sink.has(m) for m in metrics):
        return sink.results()   # resume: nothing left, skip every stream

    uids, oids, cates, _, paths = _flatten_fitb_manifest(manifest)
    n = len(paths)
    gen_loader = lambda k: load_image01(paths[k], ctx.img_size)
    gen_emb = stream_image_features(X, gen_loader, n, ("clip",))["clip"]

    grd_iids = []
    for oid, c in zip(oids, cates):
        g = grd_dict[oid]
        idx = int(np.where(np.asarray(g["category"]) == c)[0][0])
        grd_iids.append(int(np.asarray(g["outfits"])[idx]))

    # rows grouped by category: one matmul per pool (vs the reference's per-row
    # Python loops over the full category item set, evaluate_grounding_gor.py:204-282)
    preds, recalls = topn_recall_grouped(
        gen_emb, cates, ctx.cate_iid_dict, ctx.cnn_features_clip, grd_iids, topN=topN
    )
    for N, r in recalls.items():
        if not sink.has(f"recall@{N}"):
            sink.put(f"recall@{N}", r)

    ret_loader = lambda k: ctx.item_image_loader(int(preds[k]))
    need_ret_emb = any(not sink.has(m) for m in ("clip_score", "personal_sim"))
    ret_emb = (stream_image_features(X, ret_loader, n, ("clip",))["clip"]
               if need_ret_emb else None)
    if not sink.has("clip_score"):
        prompts = [eval_prompt(ctx.id_cate_dict[c]) for c in cates]
        sink.put("clip_score", clip_score(ret_emb, X.clip_text_embs(prompts)))
    if not sink.has("personal_sim") and ctx.history_clipembs is not None:
        _put_personal_sim(sink, ctx, ret_emb, uids, cates)
    if not sink.has("compatibility"):
        rows, k = [], 0
        for uid, by_oid in manifest.items():
            for oid, rec in by_oid.items():
                nimg = len(rec["image_paths"])
                rows.append(preds[k:k + nimg])
                k += nimg
        feats = gather_outfit_feats(
            np.stack(rows).astype(np.int64), ctx.cnn_features_clip, None
        )
        sink.put("compatibility", float(np.mean(X.compat_scores(feats))))
    return sink.results()


# ---------------------------------------------------------------------------
# History CLIP-embedding extraction (extract_hist_embs.py equivalent)
# ---------------------------------------------------------------------------

def extract_catalog_clip_features(
    ctx_or_extractors,
    item_image_loader: Callable[[int], np.ndarray],
    num_items: int,
    batch_size: int = 200,
) -> np.ndarray:
    """Encode the whole catalog with the CLIP image tower -> [N, 1024]
    (`extract_hist_embs.py:81-103`, batches of 200)."""
    X = ctx_or_extractors if isinstance(ctx_or_extractors, Extractors) else (
        ctx_or_extractors.extractors
    )
    feats = []
    for s in range(0, num_items, batch_size):
        e = min(s + batch_size, num_items)
        imgs = np.stack([item_image_loader(i) for i in range(s, e)])
        feats.append(X.clip_image_embs(imgs))
    return np.concatenate(feats, axis=0)


def process_history_clip_embs(history: dict, cnn_features: np.ndarray) -> dict:
    """{uid: {cid: [iids]}} -> {uid: {cid: mean CLIP emb}}
    (`extract_hist_embs.py:105-117`)."""
    out = {}
    for uid, by_cate in history.items():
        out[uid] = {
            cid: cnn_features[np.asarray(iids, np.int64)].mean(axis=0)
            for cid, iids in by_cate.items()
        }
    return out
