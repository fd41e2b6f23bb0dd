"""Test env: hermetic CPU backend with 8 fake devices.

Must run before jax is imported anywhere (SURVEY.md §4.3): distributed
tests exercise the real mesh/pjit code paths on 8 virtual devices;
Pallas kernels fall back to interpret mode off-TPU (see
partseg_tpu/partops/pallas/__init__.py).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # env presets JAX_PLATFORMS=axon; override
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Pytest plugins (jaxtyping) import jax BEFORE conftest runs, freezing the
# config defaults from the original env — override through the config API too.
import jax

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()
assert jax.device_count() == 8, jax.device_count()
