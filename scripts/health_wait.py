"""Block until the TPU tunnel answers a tiny matmul, or exit 2 on timeout.

Usage: python scripts/health_wait.py [budget_seconds]

Each probe is a subprocess with its own timeout because a dead tunnel
wedges jax.devices() itself (CLAUDE.md) — the parent must never touch the
backend. Exit 0 = healthy; exit 2 = budget expired (callers should loop,
not skip: a skipped stage is how round-2 lost its smoke run).
"""
import subprocess
import sys
import time


def _log(*a):
    # stderr: callers (bench.py) reserve stdout for their JSON contract
    print(*a, file=sys.stderr, flush=True)

PROBE = ("import jax, jax.numpy as jnp;"
         "d = jax.devices();"
         "x = (jnp.ones((8, 128)) @ jnp.ones((128, 8)));"
         "x.block_until_ready(); print('healthy', d[0].platform)")


def wait(budget=3600.0):
    t0 = time.time()
    while time.time() - t0 < budget:
        try:
            r = subprocess.run([sys.executable, "-c", PROBE], timeout=150,
                               capture_output=True, text=True)
            if r.returncode == 0 and "healthy" in r.stdout:
                _log(f"healthy after {time.time()-t0:.0f}s")
                return 0
        except subprocess.TimeoutExpired:
            pass
        _log(f"unhealthy ({time.time()-t0:.0f}/{budget:.0f}s)")
        time.sleep(10)
    return 2


if __name__ == "__main__":
    sys.exit(wait(float(sys.argv[1]) if len(sys.argv) > 1 else 3600.0))
