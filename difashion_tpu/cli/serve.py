"""Serving entry point: a persistent generation service over HTTP.

Beyond the reference's batch-offline surface: holds the compiled sampler resident (no
per-request compile), serves FITB/GOR requests as JSON, returns base64 JPEGs. Built on
stdlib http.server — production deployments would front this with their own RPC layer;
the value here is the warm-model request path (one jitted scan per request batch).

  POST /generate  {"task": "FITB"|"GOR",
                   "uids": [..], "oids": [..],
                   "outfits": [[iid x4], ...],    # 0 = slot to generate
                   "category": [[cid x4], ...],
                   "seed": 123}
  -> {"images": {"<uid>/<oid>": ["<base64 jpeg>", ...]}, "latency_s": ...}

  GET /healthz -> {"status": "ok", "devices": N}
"""
from __future__ import annotations

import argparse
import base64
import io
import json
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import jax
import numpy as np


def apply_generation_overrides(cfg, scheduler=None, num_inference_steps=None):
    """Return cfg with generation fields overridden (None = keep).

    `--scheduler dpmpp --num_inference_steps 20` is the fast-serving recipe:
    ~2.5x generation throughput at comparable quality (BASELINE.md)."""
    import dataclasses

    overrides = {}
    if scheduler is not None:
        overrides["scheduler"] = scheduler
    if num_inference_steps is not None:
        overrides["num_inference_steps"] = num_inference_steps
    if not overrides:
        return cfg
    return dataclasses.replace(
        cfg, generation=dataclasses.replace(cfg.generation, **overrides)
    )


class GenerationService:
    """Warm-model request handler shared by the HTTP layer and tests.

    One device, one compiled sampler: requests are serialized through a lock so
    a burst of concurrent POSTs cannot stack device batches (each in-flight call
    would hold its own full-resolution output buffers) or skew each other's
    latency accounting."""

    def __init__(self, pipeline, max_batch: int = 16, checkpoint_step=None):
        import threading

        self.pipeline = pipeline
        self.max_batch = max_batch
        self.checkpoint_step = checkpoint_step
        self._lock = threading.Lock()

    def generate(self, req: dict) -> dict:
        task = req.get("task", "FITB")
        if task not in ("FITB", "GOR"):
            raise ValueError(f"task must be 'FITB' or 'GOR', got {task!r}")
        batch = {
            "uids": np.asarray(req["uids"], np.int64),
            "oids": np.asarray(req["oids"], np.int64),
            "outfits": np.asarray(req["outfits"], np.int64),
            "category": np.asarray(req["category"], np.int64),
        }
        if len(batch["uids"]) > self.max_batch:
            raise ValueError(f"batch too large (> {self.max_batch})")
        olen = batch["outfits"].shape[1]
        pad_to = self.max_batch * (olen if task == "GOR" else 1)
        # the compiled sampler's batch dim is the FILL count, not the outfit
        # count: multi-blank FITB outfits could otherwise exceed pad_to and
        # trigger a fresh XLA compile at an uncapped device batch
        n_fills = (int((batch["outfits"] == 0).sum()) if task == "FITB"
                   else len(batch["uids"]) * olen)
        if n_fills == 0:
            raise ValueError("no slots to generate (task FITB needs at least "
                             "one 0 in outfits)")
        if n_fills > pad_to:
            raise ValueError(
                f"{n_fills} fill slots exceed the service cap {pad_to} "
                f"(= max_batch {self.max_batch} x {pad_to // self.max_batch})"
            )
        t0 = time.perf_counter()
        rng = jax.random.PRNGKey(int(req.get("seed", 123)))
        with self._lock:
            prep = self.pipeline.prepare_batch(batch, task, rng, pad_to=pad_to)
            imgs = self.pipeline.generate_batch(prep)
        out: dict = {}
        from PIL import Image

        for k in range(len(imgs)):
            if not prep.valid[k]:
                continue
            key = f"{int(prep.fill_uids[k])}/{int(prep.fill_oids[k])}"
            buf = io.BytesIO()
            Image.fromarray(imgs[k]).save(buf, format="JPEG", quality=95)
            out.setdefault(key, []).append(
                base64.b64encode(buf.getvalue()).decode()
            )
        return {"images": out, "latency_s": round(time.perf_counter() - t0, 3)}


def make_handler(service: GenerationService):
    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, {"status": "ok",
                                 "devices": jax.device_count()})
            else:
                self._send(404, {"error": "not found"})

        MAX_BODY = 16 * 2**20   # request JSON is ids only; 16 MB is generous

        def do_POST(self):
            if self.path != "/generate":
                self._send(404, {"error": "not found"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                if n <= 0 or n > self.MAX_BODY:
                    self._send(400, {"error": f"Content-Length must be in "
                                              f"(0, {self.MAX_BODY}]"})
                    return
                req = json.loads(self.rfile.read(n))
            except Exception as e:  # malformed request
                self._send(400, {"error": f"bad request: {e}"})
                return
            try:
                result = service.generate(req)
            except (ValueError, KeyError) as e:   # client error
                self._send(400, {"error": str(e)})
                return
            except Exception as e:  # noqa: BLE001 — internal failure
                self._send(500, {"error": f"internal error: {type(e).__name__}"})
                return
            try:
                self._send(200, result)
            except (BrokenPipeError, ConnectionResetError):
                pass   # client went away after the work was done; nothing to do

        def log_message(self, fmt, *args):  # quiet
            pass

    return Handler


def build_service(args) -> "GenerationService":
    """Construct the warm-model service from parsed CLI args (split from main so the
    policy surface — tokenizer refusal, config overrides — is testable without
    binding a port)."""
    from difashion_tpu.cli.generate import load_model_for_inference
    from difashion_tpu.core.config import Config
    from difashion_tpu.data.datasets import FashionData, HistLatentStore
    from difashion_tpu.data.precompute import load_processed
    from difashion_tpu.data.tokenizer import load_tokenizer
    from difashion_tpu.engine.pipeline import GenerationPipeline

    cfg = (Config.from_json(open(args.config).read()) if args.config
           else (Config.preset_tiny() if args.tiny else Config.preset_eta01()))
    cfg = apply_generation_overrides(cfg, scheduler=args.scheduler,
                                     num_inference_steps=args.num_inference_steps)
    # same refusal policy as generate/evaluate (`cli/generate.py:109-110`): serving
    # real weights with the hash-tokenizer fallback would silently produce garbage
    # conditioning, so strict mode refuses unless explicitly overridden
    tokenizer = load_tokenizer(args.tokenizer_dir, cfg.model.text.vocab_size,
                               strict=not args.allow_random_weights)
    model, params, step = load_model_for_inference(cfg, args.ckpt_dir)
    data = FashionData.load(args.data_path)
    proc = load_processed(args.data_path, "all_item_moments")
    item_latents = (proc["mean"] * cfg.model.vae.scaling_factor
                    if proc is not None else None)
    hist_store = HistLatentStore.from_catalog(
        data.history.get("test", {}),
        item_latents if item_latents is not None else np.zeros(
            (1, cfg.model.unet.sample_size, cfg.model.unet.sample_size,
             cfg.model.vae.latent_channels), np.float32),
    )
    pipe = GenerationPipeline(
        model, params, cfg, data.id_cate_dict, tokenizer, hist_store,
        item_latents=item_latents,
    )
    return GenerationService(pipe, max_batch=args.max_batch,
                             checkpoint_step=step)


def main(argv=None):
    p = argparse.ArgumentParser(description="DiFashion-TPU generation service")
    p.add_argument("--data_path", required=True)
    p.add_argument("--ckpt_dir", required=True)
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--max_batch", type=int, default=16)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--config", default=None)
    p.add_argument("--scheduler", choices=["pndm", "ddim", "dpmpp"], default=None,
                   help="override the config's scheduler; dpmpp at ~20 steps is "
                        "the fast-serving mode (~2.5x throughput, comparable "
                        "quality)")
    p.add_argument("--num_inference_steps", type=int, default=None)
    p.add_argument("--tokenizer_dir", default=None,
                   help="CLIP tokenizer asset dir (vocab.json + merges.txt)")
    p.add_argument("--allow_random_weights", action="store_true",
                   help="permit the hash-tokenizer fallback (outputs will be "
                        "meaningless; tests/throughput only)")
    args = p.parse_args(argv)

    from difashion_tpu.core.logging import setup_logging

    log = setup_logging()
    service = build_service(args)
    log.info("serving checkpoint-%d on :%d", service.checkpoint_step, args.port)
    ThreadingHTTPServer(("0.0.0.0", args.port), make_handler(service)).serve_forever()


if __name__ == "__main__":
    main()
