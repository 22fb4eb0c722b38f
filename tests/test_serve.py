"""Serving layer: warm-model GenerationService + HTTP handler round-trip."""
import base64
import json
import threading
import urllib.error
import urllib.request
from http.server import ThreadingHTTPServer

import jax
import numpy as np
import pytest

from difashion_tpu.cli.serve import GenerationService, make_handler
from difashion_tpu.core.config import Config
from difashion_tpu.data import HashTokenizer, HistLatentStore
from difashion_tpu.engine.pipeline import GenerationPipeline
from difashion_tpu.models import create_difashion


@pytest.fixture(scope="module")
def service():
    import dataclasses

    cfg = Config.preset_tiny()
    cfg = dataclasses.replace(
        cfg, generation=dataclasses.replace(cfg.generation, num_inference_steps=2)
    )
    model, params = create_difashion(cfg.model, jax.random.PRNGKey(0))
    h = cfg.model.unet.sample_size
    C = cfg.model.vae.latent_channels
    lat = np.random.RandomState(0).randn(20, h, h, C).astype(np.float32) * 0.2
    pipe = GenerationPipeline(
        model, params, cfg, {c: f"cate{c}" for c in range(1, 6)},
        HashTokenizer(vocab_size=cfg.model.text.vocab_size),
        HistLatentStore.from_catalog({}, lat), item_latents=lat,
    )
    return GenerationService(pipe, max_batch=4)


def _req(n=2):
    rng = np.random.RandomState(1)
    outfits = rng.randint(1, 20, size=(n, 4))
    outfits[:, 0] = 0
    return {
        "task": "FITB",
        "uids": list(range(1, n + 1)),
        "oids": list(range(100, 100 + n)),
        "outfits": outfits.tolist(),
        "category": rng.randint(1, 6, size=(n, 4)).tolist(),
        "seed": 7,
    }


def test_service_generate(service):
    out = service.generate(_req(2))
    assert len(out["images"]) == 2
    for key, imgs in out["images"].items():
        assert len(imgs) == 1
        raw = base64.b64decode(imgs[0])
        assert raw[:2] == b"\xff\xd8"  # JPEG magic
    assert out["latency_s"] > 0


def test_service_rejects_oversized_batch(service):
    with pytest.raises(ValueError):
        service.generate(_req(9))


def test_http_roundtrip(service):
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(service))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz") as r:
            health = json.loads(r.read())
        assert health["status"] == "ok"

        data = json.dumps(_req(1)).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate", data=data,
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as r:
            out = json.loads(r.read())
        assert len(out["images"]) == 1

        # malformed request -> 400, not a crash
        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate", data=b"{}",
            headers={"Content-Type": "application/json"},
        )
        try:
            urllib.request.urlopen(bad)
            assert False, "expected HTTPError"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        server.shutdown()


def test_apply_generation_overrides():
    from difashion_tpu.cli.serve import apply_generation_overrides
    from difashion_tpu.core.config import Config

    cfg = Config.preset_tiny()
    assert apply_generation_overrides(cfg) is cfg
    out = apply_generation_overrides(cfg, scheduler="dpmpp",
                                     num_inference_steps=20)
    assert out.generation.scheduler == "dpmpp"
    assert out.generation.num_inference_steps == 20
    # untouched fields survive
    assert out.generation.category_guidance_scale == cfg.generation.category_guidance_scale
    assert cfg.generation.scheduler == "pndm"  # original frozen config unchanged


def test_service_generate_dpmpp_fast_mode():
    """The fast-serving recipe (dpmpp scheduler) end to end through the service."""
    import dataclasses

    from difashion_tpu.cli.serve import apply_generation_overrides

    cfg = apply_generation_overrides(
        Config.preset_tiny(), scheduler="dpmpp", num_inference_steps=3
    )
    model, params = create_difashion(cfg.model, jax.random.PRNGKey(0))
    h = cfg.model.unet.sample_size
    C = cfg.model.vae.latent_channels
    lat = np.random.RandomState(0).randn(20, h, h, C).astype(np.float32) * 0.2
    pipe = GenerationPipeline(
        model, params, cfg, {c: f"cate{c}" for c in range(1, 6)},
        HashTokenizer(vocab_size=cfg.model.text.vocab_size),
        HistLatentStore.from_catalog({}, lat), item_latents=lat,
    )
    out = GenerationService(pipe, max_batch=4).generate(_req(2))
    assert len(out["images"]) == 2
    for imgs in out["images"].values():
        assert base64.b64decode(imgs[0])[:2] == b"\xff\xd8"


def test_serve_cli_refuses_hash_tokenizer_without_override(tmp_path):
    """The serving surface enforces the same random-weights refusal policy as
    generate/evaluate (VERDICT r2): without a real tokenizer and without
    --allow_random_weights, build_service must refuse before loading anything."""
    import argparse

    from difashion_tpu.cli.serve import build_service

    args = argparse.Namespace(
        data_path=str(tmp_path), ckpt_dir=str(tmp_path / "nope"), config=None,
        tiny=True, scheduler=None, num_inference_steps=None, max_batch=4,
        tokenizer_dir=None, allow_random_weights=False,
    )
    with pytest.raises(FileNotFoundError, match="tokenizer"):
        build_service(args)


def test_service_validates_requests(service):
    # unknown task strings are rejected, not silently run as FITB
    bad = _req(2)
    bad["task"] = "gor"
    with pytest.raises(ValueError, match="task must be"):
        service.generate(bad)
    # zero fill slots: reject before any device work
    nofill = _req(2)
    nofill["outfits"] = [[1, 2, 3, 4], [5, 6, 7, 8]]
    with pytest.raises(ValueError, match="no slots to generate"):
        service.generate(nofill)
    # multi-blank outfits: the FILL count (not the outfit count) is capped, so
    # a request cannot force an uncapped device batch / fresh XLA compile
    multi = _req(4)                            # max_batch=4 outfits OK...
    multi["outfits"] = [[0, 0, 3, 4]] * 4      # ...but 8 fills > pad_to=4
    with pytest.raises(ValueError, match="fill slots exceed"):
        service.generate(multi)


def test_http_error_classification(service):
    handler = make_handler(service)
    srv = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        def post(body: bytes, headers=None):
            r = urllib.request.Request(
                f"http://127.0.0.1:{port}/generate", data=body,
                headers=headers or {"Content-Type": "application/json"},
            )
            try:
                with urllib.request.urlopen(r, timeout=30) as resp:
                    return resp.status, json.loads(resp.read())
            except urllib.error.HTTPError as e:
                return e.code, json.loads(e.read())

        # client errors are 400 with a message
        code, body = post(json.dumps({"task": "nope"}).encode())
        assert code == 400
        code, body = post(b"not json at all")
        assert code == 400 and "bad request" in body["error"]
        # oversized Content-Length is refused before the read
        code, body = post(b"{}", headers={
            "Content-Type": "application/json",
            "Content-Length": str(10**9),
        })
        assert code == 400

        # internal failures are 500, and the message is not a raw str(exception)
        real = service.pipeline.prepare_batch
        service.pipeline.prepare_batch = lambda *a, **k: (_ for _ in ()).throw(
            RuntimeError("device exploded"))
        try:
            code, body = post(json.dumps(_req(1)).encode())
            assert code == 500 and "RuntimeError" in body["error"]
            assert "device exploded" not in body["error"]
        finally:
            service.pipeline.prepare_batch = real
    finally:
        srv.shutdown()


def test_http_serve_smoke_with_mesh_sharded_params(service):
    """Round-4 dryrun leg (c): the WARM HTTP serve surface driven with params
    living replicated on an 8-device `jax.sharding.Mesh` — the layout a
    multi-chip serving deployment uses — must produce byte-identical JPEGs to
    the single-device service."""
    import copy

    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    base = service.generate(_req(2))

    mesh = Mesh(np.array(jax.devices()), ("dp",))
    repl = NamedSharding(mesh, P())
    sharded = copy.copy(service)
    sharded.pipeline = copy.copy(service.pipeline)
    sharded.pipeline.params = jax.tree_util.tree_map(
        lambda x: jax.device_put(np.asarray(x), repl), service.pipeline.params
    )

    httpd = ThreadingHTTPServer(("localhost", 0), make_handler(sharded))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        req = urllib.request.Request(
            f"http://localhost:{httpd.server_port}/generate",
            data=json.dumps(_req(2)).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=600) as r:
            out = json.loads(r.read())
    finally:
        httpd.shutdown()
    assert out["images"].keys() == base["images"].keys()
    for k in base["images"]:
        assert out["images"][k] == base["images"][k], (
            f"sharded-params serving diverged from single-device at {k}"
        )
