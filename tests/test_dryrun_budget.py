"""Wall-time guard on the driver's multi-chip certificate (VERDICT r3 #1).

Round 3 extended ``dryrun_multichip`` without ever timing it; on this
1-core host the 8-virtual-device XLA compiles pushed it past the driver's
budget and the certificate regressed to an rc=124 timeout. This test runs
the EXACT child the driver's bootstrap spawns and fails if it exceeds the
budget, so the certificate can never silently regress again.
"""
import os
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# The driver kills dryruns that overrun its budget (r3 artifact: rc=124 at
# ~28 min). Budget here: 300 s clean; the hard timeout leaves headroom for
# host contention so the guard itself doesn't flake.
BUDGET_S = 300
HARD_TIMEOUT_S = 600


@pytest.mark.slow  # one full dryrun compile (~minutes); the guard runs in
# every slow-tier pass and any fast-tier run right before a round ends
def test_dryrun_multichip_within_budget():
    env = dict(os.environ)
    xla = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "host_platform_device_count" not in f
    )
    env["XLA_FLAGS"] = f"{xla} --xla_force_host_platform_device_count=8".strip()
    env["JAX_PLATFORMS"] = "cpu"

    import resource

    ru0 = resource.getrusage(resource.RUSAGE_CHILDREN)
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "__graft_entry__.py"),
         "--dryrun-child", "8"],
        env=env, capture_output=True, text=True, timeout=HARD_TIMEOUT_S,
    )
    wall = time.time() - t0
    ru1 = resource.getrusage(resource.RUSAGE_CHILDREN)
    # budget on the child's CPU seconds, not raw wall: on the 1-core host
    # they coincide for a clean run (the dryrun is compile/CPU-bound), but
    # CPU time doesn't inflate when another process shares the core, so the
    # guard flags real compile-cost growth instead of host contention
    cpu = (ru1.ru_utime - ru0.ru_utime) + (ru1.ru_stime - ru0.ru_stime)
    assert proc.returncode == 0, (
        f"dryrun child failed rc={proc.returncode}\n"
        f"stdout: {proc.stdout[-2000:]}\nstderr: {proc.stderr[-2000:]}"
    )
    assert "dryrun_multichip OK" in proc.stdout, proc.stdout[-2000:]
    assert "physics dp" in proc.stdout and "longseq probe" in proc.stdout, (
        "certificate content shrank: " + proc.stdout[-500:]
    )
    assert cpu < BUDGET_S, (
        f"dryrun cost {cpu:.0f} CPU-seconds (wall {wall:.0f}s) — over the "
        f"{BUDGET_S}s driver budget; per-piece timings:\n" +
        "\n".join(l for l in proc.stderr.splitlines() if "dryrun [" in l)
    )
