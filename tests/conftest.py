"""Test harness: run everything on a virtual 8-device CPU mesh
(SURVEY.md §4 "multi-device without a cluster"). Must set env before the
first jax import anywhere in the process."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
# The box env presets JAX_PLATFORMS=axon (the real TPU chip) and a
# sitecustomize imports jax at interpreter start, so jax's config has already
# captured that env var — override through jax.config, not os.environ.
_USE_TPU = os.environ.get("DPFX_TEST_TPU", "0") == "1"
os.environ["JAX_PLATFORMS"] = "axon" if _USE_TPU else "cpu"

import jax  # noqa: E402

if not _USE_TPU:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import pytest  # noqa: E402

# kept as a conftest re-export for backward compatibility; lives in
# tests/_helpers.py so test modules import it without re-importing this
# env-mutating file as a second module (ADVICE round 3)
from _helpers import require_mesh8  # noqa: E402, F401


@pytest.fixture(scope="session")
def devices():
    return jax.devices()
