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


@pytest.fixture(scope="session")
def devices():
    return jax.devices()


def require_mesh8(mesh) -> None:
    """Skip (not fail) sharded-vs-single tests off the 8-device CPU mesh —
    under DPFX_TEST_TPU=1 there is one real chip and a 1-device mesh
    trivially equals single-device, so the comparison proves nothing."""
    if mesh.devices.size != 8:
        pytest.skip(
            f"needs the 8-device virtual CPU mesh; have {mesh.devices.size} "
            "device(s) (DPFX_TEST_TPU runs see the one real chip)"
        )
