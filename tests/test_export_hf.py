"""Checkpoint -> diffusers-layout safetensors export round-trip."""
import os
import subprocess
import sys

import jax
import numpy as np
import pytest

from difashion_tpu.core.checkpoint import CheckpointStore
from difashion_tpu.core.config import Config, TrainConfig
from difashion_tpu.core.importer import import_params
from difashion_tpu.engine import build_train_step
from difashion_tpu.models import create_difashion


@pytest.mark.slow
def test_export_hf_roundtrip(tmp_path):
    cfg = Config.preset_tiny()
    model, params = create_difashion(cfg.model, jax.random.PRNGKey(0))
    _, init_fn = build_train_step(model, TrainConfig())
    state = init_fn(params)
    store = CheckpointStore(str(tmp_path / "ckpt"))
    store.save_frozen({k: params[k] for k in model.frozen_keys})
    store.save(state._replace(step=np.asarray(100, np.int32)), 100)

    out = subprocess.run(
        [sys.executable, "tools/export_hf.py", "--ckpt_dir", str(tmp_path / "ckpt"),
         "--out", str(tmp_path / "hf"), "--tiny", "--include_frozen"],
        capture_output=True, text=True, cwd="/root/repo",
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    unet_path = tmp_path / "hf" / "unet" / "diffusion_pytorch_model.safetensors"
    assert unet_path.exists()
    assert (tmp_path / "hf" / "text_encoder" / "model.safetensors").exists()

    # the exported file re-imports into an identical param tree
    from safetensors.numpy import load_file

    sd = load_file(str(unet_path))
    restored, missing = import_params(params["unet"], dict(sd), "unet")
    assert not missing
    for a, b in zip(jax.tree_util.tree_leaves(params["unet"]),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
