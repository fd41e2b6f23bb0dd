"""Regenerate the golden arrays for tests/test_golden.py (CPU backend,
same environment as the test suite). Run from the repo root:
    python tools/gen_golden.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import pathlib

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent / "tests"))
from test_golden import GOLDEN, compute_goldens  # noqa: E402

GOLDEN.parent.mkdir(parents=True, exist_ok=True)
np.savez_compressed(GOLDEN, **compute_goldens())
print(f"wrote {GOLDEN}")
