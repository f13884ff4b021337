"""Driver-contract tests for __graft_entry__ (task spec: entry() must be
jittable single-chip; dryrun_multichip(n) must pass even when the calling
process sees fewer than n devices — the driver invokes it under the box's
preset single-chip platform)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_bootstraps_from_single_device():
    """Invoke dryrun_multichip(8) the way the driver does: a fresh
    interpreter whose platform exposes ONE device (here: plain CPU with no
    host-device-count flag — same 'have 1, need 8' condition as the axon
    preset, without depending on the TPU tunnel). The entry must bootstrap
    a virtual 8-device mesh itself and exit 0."""
    env = os.environ.copy()
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = " ".join(
        f
        for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    )
    env.pop("DPFX_DRYRUN_BOOTSTRAPPED", None)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # no TPU dial in the CPU subprocess
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "assert len(jax.devices()) == 1, jax.devices()\n"
        "from __graft_entry__ import dryrun_multichip\n"
        "dryrun_multichip(8)\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        env=env,
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=1200,  # includes the 2-process pod leg (round 4)
    )
    assert proc.returncode == 0, (proc.stdout, proc.stderr)
    assert "dryrun_multichip(8) OK" in proc.stdout, (proc.stdout, proc.stderr)


def test_dryrun_multichip_direct_on_virtual_mesh(monkeypatch):
    """When the process already has >= n devices (the conftest 8-CPU mesh),
    the check runs inline with no subprocess. The 2-process pod leg is
    skipped here — tests/test_multiprocess.py covers it directly."""
    monkeypatch.setenv("DPFX_DRYRUN_MULTIPROC", "0")
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(4)
