"""Shared test helpers, imported as a plain top-level module under pytest's
prepend mode (ADVICE round 3: importing ``tests.conftest`` re-executed its
env-mutating body as a second module instance)."""

import jax
import pytest


def require_mesh8(mesh) -> None:
    """Sharded-vs-single equivalence tests need the 8-device virtual CPU
    mesh. On a non-CPU backend (DPFX_TEST_TPU=1 runs see the one real chip)
    a 1-device mesh trivially equals single-device, so skip. On CPU the
    mesh MUST be 8 devices — a silent skip there would mean the virtual
    mesh setup broke (e.g. a pre-set xla_force_host_platform_device_count
    that conftest's substring guard won't override), and the equivalence
    suite would vanish instead of failing loudly (ADVICE round 3)."""
    if jax.default_backend() != "cpu":
        pytest.skip(
            f"needs the 8-device virtual CPU mesh; have {mesh.devices.size} "
            "device(s) on the real chip (DPFX_TEST_TPU=1)"
        )
    assert mesh.devices.size == 8, (
        f"CPU test run expected the 8-device virtual mesh but got "
        f"{mesh.devices.size} devices — the XLA_FLAGS setup in "
        f"tests/conftest.py did not take effect"
    )
