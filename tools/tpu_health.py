#!/usr/bin/env python3
"""Tunnel/TPU health probe: one tiny jit + device->host fetch, bounded.

Exit 0 = healthy (prints the measured latencies), exit 3 = timed out
(tunnel wedged — see docs/ROADMAP.md "tunnel-wedge observations": do NOT
stack more clients; serialize and wait).

Usage: python tools/tpu_health.py [timeout_s=120]

The probe runs in a SUBPROCESS so the caller can bound a hang that sits
inside jax backend initialization (uninterruptible futex wait from
Python's side).
"""

import subprocess
import sys
import time

BODY = r"""
import time
t0 = time.perf_counter()
import jax, jax.numpy as jnp, numpy as np
t_init = time.perf_counter()
x = jax.block_until_ready(jax.jit(lambda: jnp.arange(8.0).sum())())
t_exec = time.perf_counter()
v = float(np.asarray(x))
t_fetch = time.perf_counter()
assert v == 28.0, v
print(
    f"healthy: init {t_init - t0:.1f}s, compile+exec {t_exec - t_init:.1f}s, "
    f"first-fetch {t_fetch - t_exec:.1f}s, backend {jax.default_backend()}"
)
"""


def main() -> int:
    timeout_s = float(sys.argv[1]) if len(sys.argv) > 1 else 120.0
    t0 = time.perf_counter()
    try:
        proc = subprocess.run(
            [sys.executable, "-c", BODY],
            capture_output=True, text=True, timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        print(
            f"WEDGED: no response in {timeout_s:.0f}s "
            "(tunnel backend init blocked)", file=sys.stderr,
        )
        return 3
    out = (proc.stdout or "").strip().splitlines()
    for line in out:
        if "healthy" in line:
            print(line)
            return 0
    print(
        f"probe failed rc={proc.returncode} after "
        f"{time.perf_counter() - t0:.1f}s:\n"
        + "\n".join((proc.stderr or "").strip().splitlines()[-5:]),
        file=sys.stderr,
    )
    return 1


if __name__ == "__main__":
    sys.exit(main())
