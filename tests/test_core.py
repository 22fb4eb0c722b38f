"""core/ tests: config serialization, HF importer round-trip (name mapping + transposes
+ conv_in 4->8 extension), checkpoint save/resume/retention."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from difashion_tpu.core.config import Config, ModelConfig, TrainConfig
from difashion_tpu.core.checkpoint import CheckpointStore
from difashion_tpu.core.importer import export_params, import_params
from difashion_tpu.models import (
    create_difashion,
    init_clip_text,
    init_mutual_encoder,
    init_unet,
    init_vae,
)


# ---------------------------------------------------------------------------
# Config
# ---------------------------------------------------------------------------

def test_config_roundtrip_json():
    cfg = Config.preset_eta01()
    s = cfg.to_json()
    cfg2 = Config.from_json(s)
    assert cfg2 == cfg
    # recipe values pinned (run_eta0.1.sh)
    assert cfg.train.learning_rate == 1e-5
    assert cfg.train.snr_gamma == 5.0
    assert cfg.train.eta == 0.1
    assert cfg.generation.category_guidance_scale == 12.0
    assert cfg.generation.hist_guidance_scale == 4.0
    assert cfg.generation.mutual_guidance_scale == 5.0
    assert cfg.train.seed == 123
    assert cfg.train.max_train_steps == 20000
    assert cfg.train.checkpointing_steps == 1000


def test_tiny_preset_topology():
    cfg = Config.preset_tiny()
    assert cfg.model.unet.in_channels == 8
    assert len(cfg.model.unet.block_out_channels) == 4
    assert cfg.model.vae.scale_factor == 8


# ---------------------------------------------------------------------------
# Importer round-trips (export -> import must be the identity)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def tiny():
    return ModelConfig.tiny()


@pytest.mark.parametrize("kind", ["unet", "vae", "text", "mutual"])
def test_importer_roundtrip(tiny, kind):
    rng = jax.random.PRNGKey(0)
    if kind == "unet":
        _, params = init_unet(tiny.unet, rng)
    elif kind == "vae":
        _, params = init_vae(tiny.vae, rng)
    elif kind == "text":
        _, params = init_clip_text(tiny.text, rng)
    else:
        _, params = init_mutual_encoder(tiny.mutual, rng)
    sd = export_params(params, kind)
    # HF-style keys: dotted, torch layouts
    assert all("." in k or k.endswith("weight") for k in sd)
    restored, missing = import_params(params, sd, kind)
    assert not missing
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(params)[0],
        jax.tree_util.tree_flatten_with_path(restored)[0],
    ):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_importer_unet_key_names(tiny):
    """Spot-check that exported keys match diffusers naming."""
    _, params = init_unet(tiny.unet, jax.random.PRNGKey(1))
    sd = export_params(params, "unet")
    assert "conv_in.weight" in sd
    assert "down_blocks.0.resnets.0.conv1.weight" in sd
    assert "down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q.weight" in sd
    assert "down_blocks.0.attentions.0.transformer_blocks.0.ff.net.0.proj.weight" in sd
    assert "down_blocks.0.attentions.0.transformer_blocks.0.attn2.to_out.0.bias" in sd
    assert "mid_block.attentions.0.proj_in.weight" in sd
    assert "up_blocks.1.attentions.0.norm.weight" in sd
    assert "down_blocks.0.downsamplers.0.conv.weight" in sd
    assert "up_blocks.0.upsamplers.0.conv.weight" in sd
    assert "time_embedding.linear_1.weight" in sd
    # torch conv layout on the HF side
    assert sd["conv_in.weight"].shape == (32, 8, 3, 3)


def test_importer_text_key_names(tiny):
    _, params = init_clip_text(tiny.text, jax.random.PRNGKey(2))
    sd = export_params(params, "text")
    assert "text_model.embeddings.token_embedding.weight" in sd
    assert "text_model.encoder.layers.0.self_attn.q_proj.weight" in sd
    assert "text_model.encoder.layers.1.mlp.fc1.bias" in sd
    assert "text_model.final_layer_norm.weight" in sd


def test_importer_conv_in_extension(tiny):
    """A 4-channel pretrained conv_in must import into our 8-channel model with the
    extra input channels zeroed (reference surgery, difashion.py:82-93)."""
    _, params = init_unet(tiny.unet, jax.random.PRNGKey(3))
    sd = export_params(params, "unet")
    w8 = sd["conv_in.weight"]                   # [O, 8, 3, 3]
    sd4 = dict(sd)
    sd4["conv_in.weight"] = w8[:, :4]           # pretend pretrained 4-ch checkpoint
    restored, _ = import_params(params, sd4, "unet")
    k = np.asarray(restored["conv_in"]["Conv_0"]["kernel"])  # HWIO
    np.testing.assert_array_equal(
        k[:, :, :4, :], np.transpose(w8[:, :4], (2, 3, 1, 0))
    )
    np.testing.assert_array_equal(k[:, :, 4:, :], 0.0)


def test_importer_vae_legacy_attention_names(tiny):
    """Old diffusers VAE checkpoints use query/key/value/proj_attn."""
    _, params = init_vae(tiny.vae, jax.random.PRNGKey(4))
    sd = export_params(params, "vae")
    legacy = {}
    for k, v in sd.items():
        for new, old in (("to_q", "query"), ("to_k", "key"),
                         ("to_v", "value"), ("to_out.0", "proj_attn")):
            if new in k:
                k = k.replace(new, old)
                break
        legacy[k] = v
    restored, missing = import_params(params, legacy, "vae")
    assert not missing
    a = jax.tree_util.tree_leaves(params)
    b = jax.tree_util.tree_leaves(restored)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_importer_missing_key_strict(tiny):
    _, params = init_mutual_encoder(tiny.mutual, jax.random.PRNGKey(5))
    sd = export_params(params, "mutual")
    assert "mlp.0.weight" in sd and "mlp.3.bias" in sd
    del sd["mlp.0.weight"]
    with pytest.raises(KeyError):
        import_params(params, sd, "mutual", strict=True)


# ---------------------------------------------------------------------------
# Checkpoint store
# ---------------------------------------------------------------------------

def test_checkpoint_save_resume_retention(tmp_path, tiny):
    from difashion_tpu.engine import build_train_step

    model, params = create_difashion(tiny, jax.random.PRNGKey(6))
    tcfg = TrainConfig(checkpoints_total_limit=2)
    _, init_fn = build_train_step(model, tcfg)
    state = init_fn(params)

    store = CheckpointStore(str(tmp_path), total_limit=2)
    store.save_frozen({k: params[k] for k in ("vae", "text_encoder")})
    assert store.has_frozen()

    import dataclasses

    for step in (1000, 2000, 3000):
        state = state._replace(step=np.asarray(step, np.int32))
        store.save(state, step)
    # retention pruned the oldest
    assert store.all_steps() == [2000, 3000]
    assert store.latest_step() == 3000

    template = init_fn(params)
    restored = store.load(template)
    assert int(restored.step) == 3000
    for x, y in zip(
        jax.tree_util.tree_leaves(state.params["unet"]),
        jax.tree_util.tree_leaves(restored.params["unet"]),
    ):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # frozen towers restorable
    frozen = store.load_frozen({k: params[k] for k in ("vae", "text_encoder")})
    for x, y in zip(
        jax.tree_util.tree_leaves(frozen["vae"]),
        jax.tree_util.tree_leaves(params["vae"]),
    ):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_checkpoint_latest_none(tmp_path):
    store = CheckpointStore(str(tmp_path))
    assert store.latest_step() is None
    with pytest.raises(FileNotFoundError):
        store.load(None)


def test_checkpoint_async_save(tmp_path, tiny):
    from difashion_tpu.engine import build_train_step

    model, params = create_difashion(tiny, jax.random.PRNGKey(7))
    _, init_fn = build_train_step(model, TrainConfig())
    state = init_fn(params)
    store = CheckpointStore(str(tmp_path))
    store.save_async(state, 500)
    store.wait()
    assert store.latest_step() == 500
    restored = store.load(init_fn(params), 500)
    a = jax.tree_util.tree_leaves(state.params["unet"])[0]
    b = jax.tree_util.tree_leaves(restored.params["unet"])[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # a second async save joins the first (no interleaved writes)
    store.save_async(state, 600)
    store.save_async(state, 700)
    store.wait()
    assert store.all_steps() == [500, 600, 700]


# ---------------------------------------------------------------------------
# TensorBoard event writer (reference tracker parity: train.py:289-297,715)
# ---------------------------------------------------------------------------

def test_tb_writer_roundtrip(tmp_path):
    from difashion_tpu.core.tensorboard import TBEventWriter, read_events

    w = TBEventWriter(str(tmp_path))
    w.add_scalar("train_loss", 0.25, step=1)
    w.add_scalars(2, {"train_loss": 0.125, "lr": 1e-5})
    w.close()

    events = list(read_events(w.path, verify_crc=True))
    assert events[0]["file_version"] == "brain.Event:2"
    assert events[1]["step"] == 1
    assert abs(events[1]["scalars"]["train_loss"] - 0.25) < 1e-7
    assert events[2]["step"] == 2
    assert set(events[2]["scalars"]) == {"train_loss", "lr"}
    assert abs(events[2]["scalars"]["lr"] - 1e-5) < 1e-10


def test_metric_logger_writes_tb_scalars(tmp_path):
    import glob

    from difashion_tpu.core.logging import MetricLogger
    from difashion_tpu.core.tensorboard import read_events

    ml = MetricLogger(str(tmp_path), tensorboard=True)
    ml.log(0, loss=1.5, lr=1e-5, note="text-is-skipped")
    ml.log(1, loss=1.25, lr=9e-6)
    ml.close()

    files = glob.glob(str(tmp_path / "tb" / "events.out.tfevents.*"))
    assert len(files) == 1
    evs = [e for e in read_events(files[0]) if e.get("scalars")]
    assert [e["step"] for e in evs] == [0, 1]
    assert abs(evs[1]["scalars"]["loss"] - 1.25) < 1e-7
    assert "note" not in evs[0]["scalars"]


def test_metric_logger_report_to_wandb_contract(tmp_path, monkeypatch):
    """The wandb tracker opt-in (reference --report_to wandb, train.py:289-297)
    forwards every float scalar with the step; proven against a fake wandb
    module (the real package is not installed in this image)."""
    import sys
    import types

    calls = []

    class FakeRun:
        def log(self, scalars, step=None):
            calls.append((step, dict(scalars)))

        def finish(self):
            calls.append(("finish", None))

    fake = types.ModuleType("wandb")
    init_kwargs = {}

    def fake_init(**kw):
        init_kwargs.update(kw)
        return FakeRun()

    fake.init = fake_init
    monkeypatch.setitem(sys.modules, "wandb", fake)

    from difashion_tpu.core.logging import MetricLogger

    ml = MetricLogger(str(tmp_path), report_to=("wandb",),
                      run_config={"learning_rate": 1e-5})
    assert ml.active_trackers == ["wandb"]
    assert init_kwargs["mode"] == "offline"          # zero-egress default
    assert init_kwargs["config"] == {"learning_rate": 1e-5}
    ml.log(3, loss=0.5, note="text-skipped")
    ml.close()
    assert calls[0][0] == 3 and abs(calls[0][1]["loss"] - 0.5) < 1e-9
    assert "note" not in calls[0][1]
    assert calls[-1] == ("finish", None)
    # the JSONL file is written regardless of tracker choice
    assert (tmp_path / "metrics.jsonl").exists()


def test_metric_logger_missing_tracker_skipped(tmp_path):
    """A requested tracker whose package is absent is skipped loudly, never
    fatally (comet_ml is not installed here)."""
    from difashion_tpu.core.logging import MetricLogger

    ml = MetricLogger(str(tmp_path), report_to=("comet_ml",))
    assert ml.active_trackers == []
    ml.log(0, loss=1.0)
    ml.close()
    assert (tmp_path / "metrics.jsonl").exists()


def test_enable_compile_cache(tmp_path):
    from difashion_tpu.core.logging import enable_compile_cache

    d = str(tmp_path / "jaxcache")
    got = enable_compile_cache(d)
    assert got == d
    import os as _os

    assert _os.path.isdir(d)
    import jax as _jax

    assert _jax.config.jax_compilation_cache_dir == d


def test_tensorboard_image_roundtrip(tmp_path):
    """Image summaries (Value field 4): PNG round-trips bit-exact through the
    TFRecord framing, and scalar events written to the same stream still parse."""
    import numpy as np
    from PIL import Image
    import io

    from difashion_tpu.core.tensorboard import TBEventWriter, read_events

    w = TBEventWriter(str(tmp_path))
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, size=(8, 12, 3), dtype=np.uint8)
    w.add_image("validation/sample", img, step=7)
    w.add_scalar("loss", 0.5, step=8)
    w.close()

    events = list(read_events(w.path, verify_crc=True))
    img_evs = [e for e in events if e.get("images")]
    assert len(img_evs) == 1 and img_evs[0]["step"] == 7
    rec = img_evs[0]["images"]["validation/sample"]
    assert (rec["height"], rec["width"], rec["colorspace"]) == (8, 12, 3)
    decoded = np.asarray(Image.open(io.BytesIO(rec["png"])))
    np.testing.assert_array_equal(decoded, img)
    scalar_evs = [e for e in events if e.get("scalars")]
    assert scalar_evs[-1]["scalars"]["loss"] == 0.5


def test_metric_logger_log_image(tmp_path):
    import numpy as np

    from difashion_tpu.core.logging import MetricLogger
    from difashion_tpu.core.tensorboard import read_events
    import glob
    import json

    ml = MetricLogger(str(tmp_path), tensorboard=True)
    ml.log(1, loss=1.0)
    ml.log_image(1, "samples/grid", np.zeros((4, 4, 3), np.uint8))
    ml.close()
    files = glob.glob(str(tmp_path / "tb" / "events.out.tfevents.*"))
    evs = [e for e in read_events(files[0]) if e.get("images")]
    assert evs and "samples/grid" in evs[0]["images"]
    # the JSONL records the event without pixels
    lines = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert any(l.get("image") == "samples/grid" for l in lines)


def test_conv_extension_only_for_unet_conv_in(tiny):
    """A channel-narrow conv kernel anywhere EXCEPT the UNet conv_in must raise,
    not silently zero-pad (wrong-checkpoint detection)."""
    from difashion_tpu.models.vae import init_vae as _init_vae

    _, vparams = init_vae(tiny.vae, jax.random.PRNGKey(6))
    sd = export_params(vparams, "vae")
    # narrow the VAE encoder conv_in's input channels in the state dict
    k = "encoder.conv_in.weight"
    assert k in sd and sd[k].ndim == 4
    sd[k] = sd[k][:, :-1]           # OIHW: drop one input channel
    with pytest.raises(ValueError, match="shape mismatch"):
        import_params(vparams, sd, "vae", strict=True)

    # ...while the UNet conv_in extension still works (4 -> in_channels)
    _, uparams = init_unet(tiny.unet, jax.random.PRNGKey(7))
    usd = export_params(uparams, "unet")
    uk = "conv_in.weight"
    narrow = tiny.unet.in_channels // 2
    usd[uk] = usd[uk][:, :narrow]
    restored, _ = import_params(uparams, usd, "unet", strict=True)
    got = np.asarray(restored["conv_in"]["Conv_0"]["kernel"])
    assert got.shape[2] == tiny.unet.in_channels
    assert (got[:, :, narrow:, :] == 0).all()


def test_mutual_dims_disambiguate_channel_count(tiny):
    """flat = C*S*S is ambiguous (16*4*4 == 4*8*8): explicit mutual_dims must
    round-trip exactly where the C=4 fallback would silently permute weights."""
    import dataclasses

    from difashion_tpu.core.config import MutualEncoderConfig

    mcfg = dataclasses.replace(tiny.mutual, latent_channels=16, latent_size=4)
    _, params = init_mutual_encoder(mcfg, jax.random.PRNGKey(8))
    dims = (mcfg.latent_channels, mcfg.latent_size)
    sd = export_params(params, "mutual", mutual_dims=dims)
    restored, _ = import_params(params, sd, "mutual", mutual_dims=dims)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the C=4 fallback accepts the flat dim but scrambles the order
    wrong, _ = import_params(params, sd, "mutual")
    k_true = np.asarray(restored["mlp_0"]["kernel"])
    k_wrong = np.asarray(wrong["mlp_0"]["kernel"])
    assert not np.array_equal(k_true, k_wrong)


def test_load_state_dict_sharded_and_wrapped(tmp_path, tiny):
    """Sharded safetensors (index.json) merge; torch {'state_dict': ...} wrappers
    and bf16 tensors load."""
    import json

    import torch
    from safetensors.numpy import save_file

    from difashion_tpu.core.importer import find_weights_file, load_state_dict

    d = tmp_path / "unet"
    os.makedirs(d)
    a = {"w1": np.ones((2, 2), np.float32)}
    b = {"w2": np.zeros((3,), np.float32)}
    save_file(a, str(d / "model-00001-of-00002.safetensors"))
    save_file(b, str(d / "model-00002-of-00002.safetensors"))
    idx = {"weight_map": {"w1": "model-00001-of-00002.safetensors",
                          "w2": "model-00002-of-00002.safetensors"}}
    json.dump(idx, open(d / "model.safetensors.index.json", "w"))
    p = find_weights_file(str(tmp_path), "unet")
    sd = load_state_dict(p)
    assert set(sd) == {"w1", "w2"}

    # torch wrapper + bf16
    tp = str(tmp_path / "wrapped.pt")
    torch.save({"state_dict": {"x": torch.ones(2, dtype=torch.bfloat16)},
                "epoch": 3}, tp)
    sd2 = load_state_dict(tp)
    assert set(sd2) == {"x"} and sd2["x"].dtype == np.float32


def test_checkpoint_async_failure_reraised(tmp_path, tiny):
    """A background save that fails must surface at wait() — never a silently
    missing checkpoint the log already announced."""
    from difashion_tpu.engine import build_train_step

    model, params = create_difashion(tiny, jax.random.PRNGKey(9))
    _, init_fn = build_train_step(model, TrainConfig())
    state = init_fn(params)
    store = CheckpointStore(str(tmp_path))

    def boom(*a, **k):
        raise OSError("disk full")

    store.save = boom
    store.save_async(state, 7)
    with pytest.raises(RuntimeError, match="async checkpoint write failed"):
        store.wait()
    # the store recovers: wait() again is a no-op
    store.wait()


def test_checkpoint_stale_tmp_not_committed(tmp_path, tiny):
    """Leftover files in a crashed writer's .tmp dir must not leak into the new
    checkpoint (e.g. a stale ema.msgpack from a previous EMA-enabled run)."""
    import os as _os

    from difashion_tpu.engine import build_train_step

    model, params = create_difashion(tiny, jax.random.PRNGKey(10))
    _, init_fn = build_train_step(
        model, TrainConfig(use_ema=False, use_ema_fashion=False)
    )
    state = init_fn(params)._replace(step=np.asarray(5, np.int32))
    store = CheckpointStore(str(tmp_path))
    tmp = store.ckpt_path(5) + ".tmp"
    _os.makedirs(tmp)
    open(_os.path.join(tmp, "ema.msgpack"), "wb").write(b"stale")
    store.save(state, 5)
    assert not _os.path.exists(_os.path.join(store.ckpt_path(5), "ema.msgpack"))
    assert not _os.path.exists(tmp)
    # re-save over an existing step leaves no .old residue
    store.save(state, 5)
    assert not _os.path.exists(store.ckpt_path(5) + ".old")


def test_checkpoint_resume_seeds_ema_when_newly_enabled(tmp_path, tiny, caplog):
    """Resuming an EMA-less checkpoint with EMA newly enabled seeds the average
    from the restored trainable weights instead of silently training EMA-free."""
    from difashion_tpu.engine import build_train_step

    model, params = create_difashion(tiny, jax.random.PRNGKey(11))
    _, init_off = build_train_step(
        model, TrainConfig(use_ema=False, use_ema_fashion=False)
    )
    state = init_off(params)._replace(step=np.asarray(3, np.int32))
    store = CheckpointStore(str(tmp_path))
    store.save(state, 3)

    _, init_on = build_train_step(
        model, TrainConfig(use_ema=True, use_ema_fashion=True)
    )
    template = init_on(params)
    import logging as _logging

    with caplog.at_level(_logging.WARNING, logger="difashion_tpu"):
        restored = store.load(template, 3)
    assert restored.ema is not None and int(restored.ema.step) == 0
    for a, b in zip(jax.tree_util.tree_leaves(restored.ema.params),
                    jax.tree_util.tree_leaves(
                        {k: restored.params[k]
                         for k in ("unet", "fashion_encoder")})):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert any("seeding EMA" in r.message for r in caplog.records)
