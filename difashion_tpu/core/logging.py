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


class _WandbTracker:
    """Forward scalars to wandb (reference `--report_to wandb`, train.py:289-297).
    Honors WANDB_PROJECT / WANDB_MODE; defaults to offline so zero-egress
    environments record runs locally."""

    def __init__(self, out_dir: str, config: Optional[dict] = None):
        import wandb  # gated: raises ImportError if not installed

        self._run = wandb.init(
            project=os.environ.get("WANDB_PROJECT", "difashion-tpu"),
            dir=out_dir, config=config or {},
            mode=os.environ.get("WANDB_MODE", "offline"),
        )

    def add_scalars(self, step, scalars, wall_time=None):
        self._run.log(dict(scalars), step=int(step))

    def add_image(self, tag, image, step):
        import wandb

        self._run.log({tag: wandb.Image(image)}, step=int(step))

    def flush(self):
        pass

    def close(self):
        self._run.finish()


class _CometTracker:
    """Forward scalars to comet_ml (reference `--report_to comet_ml`)."""

    def __init__(self, out_dir: str, config: Optional[dict] = None):
        import comet_ml  # gated

        self._exp = comet_ml.Experiment(
            project_name=os.environ.get("COMET_PROJECT_NAME", "difashion-tpu"),
        )
        if config:
            self._exp.log_parameters(config)

    def add_scalars(self, step, scalars, wall_time=None):
        self._exp.log_metrics(dict(scalars), step=int(step))

    def add_image(self, tag, image, step):
        self._exp.log_image(image, name=tag, step=int(step))

    def flush(self):
        pass

    def close(self):
        self._exp.end()


def _build_tracker(name: str, out_dir: str, config: Optional[dict]):
    if name == "tensorboard":
        from difashion_tpu.core.tensorboard import TBEventWriter

        return TBEventWriter(os.path.join(out_dir, "tb"))
    if name == "wandb":
        return _WandbTracker(out_dir, config)
    if name == "comet_ml":
        return _CometTracker(out_dir, config)
    raise ValueError(f"unknown tracker {name!r} "
                     "(choose from tensorboard, wandb, comet_ml)")


class MetricLogger:
    """Append-only JSONL metrics + periodic console lines + tracker streams.

    `report_to` mirrors the reference's tracker opt-ins (`train.py:289-297`):
    "tensorboard" (default — clean-room event writer, `core/tensorboard.py`),
    "wandb", "comet_ml". A requested tracker whose package is missing is skipped
    with a loud warning (the JSONL file is always written, so no metrics are
    ever lost to a missing integration)."""

    def __init__(self, out_dir: str, name: str = "metrics",
                 console_every: int = 50, tensorboard: bool = True,
                 report_to: Optional[tuple] = None,
                 run_config: Optional[dict] = None):
        os.makedirs(out_dir, exist_ok=True)
        self.path = os.path.join(out_dir, f"{name}.jsonl")
        self.console_every = console_every
        self._f = open(self.path, "a")
        if report_to is None:
            report_to = ("tensorboard",) if tensorboard else ()
        self._trackers = []
        self.active_trackers = []
        for t in report_to:
            try:
                self._trackers.append(_build_tracker(t, out_dir, run_config))
                self.active_trackers.append(t)
            except ImportError as e:
                logger.warning(
                    "tracker %r requested but its package is unavailable (%s) — "
                    "skipping; metrics still recorded in %s", t, e, self.path,
                )

    def log(self, step: int, **metrics) -> None:
        rec = {"step": int(step), "time": time.time()}
        rec.update({
            k: (float(v) if hasattr(v, "__float__") else v)
            for k, v in metrics.items()
        })
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        scalars = {k: v for k, v in rec.items()
                   if isinstance(v, float) and k != "time"}
        if scalars:
            for t in self._trackers:
                t.add_scalars(step, scalars, wall_time=rec["time"])
                t.flush()
        if step % self.console_every == 0:
            pretty = " ".join(
                f"{k}={v:.5g}" if isinstance(v, float) else f"{k}={v}"
                for k, v in rec.items() if k not in ("time",)
            )
            logger.info(pretty)

    def log_image(self, step: int, tag: str, image) -> None:
        """Forward a uint8 [H, W, 3] sample image to trackers that accept images
        (the TB writer natively; wandb/comet adapters expose add_image where the
        package supports it). JSONL records the event, not the pixels."""
        self._f.write(json.dumps(
            {"step": int(step), "time": time.time(), "image": tag}
        ) + "\n")
        self._f.flush()
        for t in self._trackers:
            add = getattr(t, "add_image", None)
            if add is not None:
                add(tag, image, int(step))
                t.flush()

    def close(self) -> None:
        self._f.close()
        for t in self._trackers:
            t.close()


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
