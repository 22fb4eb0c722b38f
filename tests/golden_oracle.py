"""Torch-oracle fixture cache (VERDICT r4 #3).

The strongest parity evidence — composed sampler/training-loss/UNet torch
oracles — previously lived behind `pytest.importorskip("torch")`, so in a
torch-free image none of it ran. This helper makes the oracle outputs durable:

  * with a committed fixture (`tests/golden/torch_oracles/<name>.npz`): load it,
    no torch needed — the parity assertion runs in EVERY environment;
  * without a fixture but with torch: compute the oracle, SAVE the fixture
    (commit it), and assert;
  * without either: skip with an explicit reason (should never happen once the
    fixtures are committed).

Regenerate everything with `DIFASHION_REGEN_GOLDEN=1 python -m pytest tests/
-k "golden or parity"` in any torch-equipped environment. Fixture inputs are
fully deterministic (fixed jax PRNG keys + numpy seeds), so the cached oracle
outputs stay valid across machines.
"""
import os

import numpy as np

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden", "torch_oracles")


def have_torch() -> bool:
    try:
        import torch  # noqa: F401

        return True
    except Exception:
        return False


def oracle(name: str, compute):
    """Return the oracle output dict {key: np.ndarray} for `name`.

    `compute` is a zero-arg callable that builds the torch oracle and returns a
    dict of arrays; it is only invoked when no committed fixture exists (or when
    DIFASHION_REGEN_GOLDEN=1 forces regeneration).
    """
    path = os.path.join(GOLDEN_DIR, name + ".npz")
    regen = os.environ.get("DIFASHION_REGEN_GOLDEN") == "1"
    if os.path.exists(path) and not regen:
        with np.load(path) as z:
            return {k: z[k] for k in z.files}
    if not have_torch():
        import pytest

        pytest.skip(
            f"torch unavailable and no committed fixture {path} — regenerate "
            "with DIFASHION_REGEN_GOLDEN=1 in a torch-equipped environment"
        )
    out = {k: np.asarray(v) for k, v in compute().items()}
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    tmp = path + ".tmp.npz"
    np.savez_compressed(tmp, **out)
    os.replace(tmp, path)
    return out
