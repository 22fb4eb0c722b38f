"""Structured metrics/logging + profiling hooks.

Replaces the reference's accelerate logging + tqdm + tracker stack
(`/root/reference/DiFashion/train.py:37,289-297,368-373,694-696,715,724-725`) with:
  * `MetricLogger` — console + append-only JSONL metrics file (step, loss, lr,
    images/sec/chip), the observability surface SURVEY.md §5 calls for;
  * `profile_trace` — `jax.profiler` trace context for TPU performance work;
  * `StepTimer` — wall-clock + throughput counters for the north-star metric.
"""
from __future__ import annotations

import json
import logging
import os
import time
from contextlib import contextmanager
from typing import Optional

logger = logging.getLogger("difashion_tpu")


def setup_logging(verbosity: str = "INFO") -> logging.Logger:
    if not logger.handlers:
        h = logging.StreamHandler()
        h.setFormatter(logging.Formatter(
            "%(asctime)s [%(levelname)s] %(name)s: %(message)s"
        ))
        logger.addHandler(h)
    logger.setLevel(getattr(logging, verbosity.upper(), logging.INFO))
    return logger


class MetricLogger:
    """Append-only JSONL metrics + periodic console lines + TensorBoard events.

    The TensorBoard stream matches the reference's default tracker
    (`accelerator.log({"train_loss": ...}, step=global_step)`, `train.py:289-297,715`):
    every float metric becomes a scalar tag readable by `tensorboard --logdir`."""

    def __init__(self, out_dir: str, name: str = "metrics",
                 console_every: int = 50, tensorboard: bool = True):
        os.makedirs(out_dir, exist_ok=True)
        self.path = os.path.join(out_dir, f"{name}.jsonl")
        self.console_every = console_every
        self._f = open(self.path, "a")
        self._tb = None
        if tensorboard:
            from difashion_tpu.core.tensorboard import TBEventWriter

            self._tb = TBEventWriter(os.path.join(out_dir, "tb"))

    def log(self, step: int, **metrics) -> None:
        rec = {"step": int(step), "time": time.time()}
        rec.update({
            k: (float(v) if hasattr(v, "__float__") else v)
            for k, v in metrics.items()
        })
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._tb is not None:
            scalars = {k: v for k, v in rec.items()
                       if isinstance(v, float) and k != "time"}
            if scalars:
                self._tb.add_scalars(step, scalars, wall_time=rec["time"])
                self._tb.flush()
        if step % self.console_every == 0:
            pretty = " ".join(
                f"{k}={v:.5g}" if isinstance(v, float) else f"{k}={v}"
                for k, v in rec.items() if k not in ("time",)
            )
            logger.info(pretty)

    def close(self) -> None:
        self._f.close()
        if self._tb is not None:
            self._tb.close()


class StepTimer:
    """Images/sec/chip throughput counter (north-star observability)."""

    def __init__(self, n_chips: int = 1):
        self.n_chips = max(1, n_chips)
        self._t0: Optional[float] = None
        self.last_dt = 0.0

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, n_images: int) -> dict:
        dt = time.perf_counter() - (self._t0 or time.perf_counter())
        self.last_dt = dt
        return {
            "step_time_s": dt,
            "images_per_sec_per_chip": n_images / dt / self.n_chips if dt > 0 else 0.0,
        }


@contextmanager
def profile_trace(log_dir: Optional[str]):
    """jax.profiler trace window (open with TensorBoard / xprof). No-op if dir None."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_compile_cache(cache_dir: Optional[str] = None) -> str:
    """Enable JAX's persistent compilation cache for all CLI entry points.

    The full 50-step sampler / train-step executables take tens of minutes to
    compile on TPU; with the cache a process restart (new serving replica,
    resumed training, re-run evaluation) reloads them in seconds. Not a
    reference feature (torch has no AOT executable to cache) — a TPU-production
    necessity. Override the location with $DIFASHION_CACHE_DIR; defaults to
    ~/.cache/difashion_tpu/jax.
    """
    import jax

    cache_dir = (cache_dir
                 or os.environ.get("DIFASHION_CACHE_DIR")
                 or os.path.join(os.path.expanduser("~"), ".cache",
                                 "difashion_tpu", "jax"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    return cache_dir
