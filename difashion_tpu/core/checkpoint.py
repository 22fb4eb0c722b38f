"""Checkpoint store: step-accurate save/resume with retention.

Equivalent of the reference's `accelerator.save_state` flow (`/root/reference/DiFashion/
train.py:299-317,514-557,718-722`): checkpoints live in `<dir>/checkpoint-<step>/`,
"latest" resume scans those names, and `checkpoints_total_limit` prunes the oldest.
Contents keep the reference's logical layout — trainable towers + their EMAs + optimizer
state + step — in flax msgpack files:

  checkpoint-<step>/
    trainable.msgpack    {unet, fashion_encoder}
    ema.msgpack          EMA copy (if enabled)
    opt_state.msgpack
    meta.json            {step, ema_step}
  frozen.msgpack         {vae, text_encoder} saved once at the root (frozen towers)
"""
from __future__ import annotations

import json
import os
import re
import shutil
import threading
from typing import Optional

import jax
import numpy as np
from flax import serialization

_CKPT_RE = re.compile(r"^checkpoint-(\d+)$")


def _write(path: str, tree) -> None:
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(tree))


def _read(path: str, template):
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


class CheckpointStore:
    def __init__(self, directory: str, total_limit: Optional[int] = None):
        self.dir = directory
        self.total_limit = total_limit
        self._writer: Optional[threading.Thread] = None
        os.makedirs(directory, exist_ok=True)

    # ---- frozen towers (saved once) -----------------------------------------

    def save_frozen(self, frozen) -> None:
        _write(os.path.join(self.dir, "frozen.msgpack"), frozen)

    def load_frozen(self, template):
        return _read(os.path.join(self.dir, "frozen.msgpack"), template)

    def has_frozen(self) -> bool:
        return os.path.exists(os.path.join(self.dir, "frozen.msgpack"))

    # ---- per-step checkpoints ------------------------------------------------

    def ckpt_path(self, step: int) -> str:
        return os.path.join(self.dir, f"checkpoint-{step}")

    def all_steps(self):
        steps = []
        for name in os.listdir(self.dir):
            m = _CKPT_RE.match(name)
            if m:
                steps.append(int(m.group(1)))
        return sorted(steps)

    def latest_step(self) -> Optional[int]:
        steps = self.all_steps()
        return steps[-1] if steps else None

    def save_async(self, state, step: int) -> None:
        """Snapshot to host now, write files in a background thread (the train loop
        only blocks on the device->host transfer, not on disk IO). A later save —
        or wait() — joins any in-flight write first and RE-RAISES its failure:
        a checkpoint the log announced must either exist or crash the run."""
        self.wait()
        host_state = jax.device_get(state)

        def _run():
            try:
                self.save(host_state, step)
            except BaseException as e:   # surfaced by wait()
                self._writer_error = e

        self._writer_error: Optional[BaseException] = None
        self._writer = threading.Thread(target=_run, daemon=True)
        self._writer.start()

    def wait(self) -> None:
        if self._writer is not None:
            self._writer.join()
            self._writer = None
            err = getattr(self, "_writer_error", None)
            if err is not None:
                self._writer_error = None
                raise RuntimeError("async checkpoint write failed") from err

    def save(self, state, step: int) -> str:
        """state: engine.train.TrainState (host or device arrays)."""
        from difashion_tpu.engine.train import split_params

        state = jax.device_get(state)
        if int(state.step) != step:
            import logging

            logging.getLogger("difashion_tpu").warning(
                "checkpoint label %d != state.step %d — resume will use "
                "state.step", step, int(state.step),
            )
        path = self.ckpt_path(step)
        tmp = path + ".tmp"
        # never reuse a stale .tmp from a crashed writer: its leftover files
        # (e.g. an old ema.msgpack) would be committed into the new checkpoint
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp)
        trainable, _ = split_params(state.params)
        _write(os.path.join(tmp, "trainable.msgpack"), trainable)
        _write(os.path.join(tmp, "opt_state.msgpack"), state.opt_state)
        meta = {"step": int(state.step)}
        if state.ema is not None:
            _write(os.path.join(tmp, "ema.msgpack"), state.ema.params)
            meta["ema_step"] = int(state.ema.step)
        with open(os.path.join(tmp, "meta.json"), "w") as f:
            json.dump(meta, f)
        if os.path.exists(path):
            # move the old checkpoint aside BEFORE the replace (a directory
            # os.replace needs the target gone) but only delete it AFTER the new
            # one is committed — a crash mid-save leaves either old or new on
            # disk, never neither
            old = path + ".old"
            shutil.rmtree(old, ignore_errors=True)
            os.rename(path, old)
            os.replace(tmp, path)
            shutil.rmtree(old, ignore_errors=True)
        else:
            os.replace(tmp, path)
        self._prune()
        return path

    def load(self, state_template, step: Optional[int] = None):
        """Restore into a TrainState template (shapes/dtypes from a fresh init).
        step=None -> latest. Returns the restored TrainState."""
        from difashion_tpu.engine.train import EMAState, TrainState

        if step is None:
            step = self.latest_step()
            if step is None:
                raise FileNotFoundError(f"no checkpoints under {self.dir}")
        path = self.ckpt_path(step)
        from difashion_tpu.engine.train import split_params

        trainable_t, _ = split_params(state_template.params)
        trainable = _read(os.path.join(path, "trainable.msgpack"), trainable_t)
        opt_state = _read(
            os.path.join(path, "opt_state.msgpack"), state_template.opt_state
        )
        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
        ema = None
        has_ema_file = os.path.exists(os.path.join(path, "ema.msgpack"))
        if state_template.ema is not None and has_ema_file:
            ema_params = _read(
                os.path.join(path, "ema.msgpack"), state_template.ema.params
            )
            ema = EMAState(
                params=ema_params,
                step=np.asarray(meta.get("ema_step", meta["step"]), np.int32),
            )
        elif state_template.ema is not None and not has_ema_file:
            # resume with EMA newly enabled: seed the average from the restored
            # trainable weights (warmup decay restarts) instead of silently
            # training the rest of the run EMA-free
            import logging

            logging.getLogger("difashion_tpu").warning(
                "checkpoint-%d has no EMA but the config enables it — seeding "
                "EMA from the restored trainable params", step,
            )
            ema = EMAState(
                params=jax.tree_util.tree_map(np.copy, trainable),
                step=np.zeros((), np.int32),
            )
        elif state_template.ema is None and has_ema_file:
            import logging

            logging.getLogger("difashion_tpu").warning(
                "checkpoint-%d carries EMA weights but the config disables EMA "
                "— they will not be restored or updated", step,
            )
        params = dict(state_template.params)
        params.update(trainable)
        return TrainState(
            params=params,
            opt_state=opt_state,
            ema=ema,
            step=np.asarray(meta["step"], np.int32),
        )

    def _prune(self) -> None:
        if self.total_limit is None:
            return
        steps = self.all_steps()
        while len(steps) > self.total_limit:
            victim = steps.pop(0)
            shutil.rmtree(self.ckpt_path(victim), ignore_errors=True)
