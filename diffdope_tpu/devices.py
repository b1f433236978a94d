"""Device/backend helpers for remote (tunnel) TPU backends.

The axon backend tunnels every transfer through a remote service, and the
FIRST device->host read of a process pays a one-time data-channel
establishment cost with enormous jitter (measured 15-417s for a 32-byte
fetch; subsequent fetches ~0.1s).  Two consequences shape the code:

* jit CLOSURE constants must be HOST (numpy) arrays — lowering a
  device-resident constant calls back to host for its value
  (jax array._value) and stalls on that channel init.  See
  DiffDope._mesh_arrays.
* the unavoidable first fetch (loss scalars, result poses) should be
  warmed in the BACKGROUND while tracing/compilation proceeds, so the
  channel cost overlaps work instead of serializing after it.
"""

from __future__ import annotations

import threading
import time


def warm_transfers_async():
    """Start the first device->host fetch on a daemon thread.

    Returns a ``join(log_fn=None)`` callable that blocks until the channel
    is up and reports how long the init took.  Safe to call on any
    backend (a no-op 0.1s fetch on local CPU/TPU); never raises — a
    wedged tunnel surfaces in the caller's own first fetch instead.
    """
    state = {"dt": None, "err": None}

    # Backend/client initialization happens HERE, on the caller's thread:
    # racing it from the daemon thread against the caller's own first jax
    # call would serialize both on jax's init lock — with the caller
    # blocked on a futex for as long as the tunnel handshake takes.
    import jax

    jax.devices()

    def _warm():
        t0 = time.perf_counter()
        try:
            import jax.numpy as jnp
            import numpy as np

            np.asarray(jax.block_until_ready(jnp.zeros((8,), jnp.float32)))
            state["dt"] = time.perf_counter() - t0
        except Exception as e:  # noqa: BLE001 — diagnostics only
            state["err"] = e

    th = threading.Thread(target=_warm, daemon=True, name="dd-warm-d2h")
    th.start()

    def join(log_fn=None):
        th.join()
        if log_fn is not None:
            if state["err"] is not None:
                log_fn(f"device->host warmup failed: {state['err']!r}")
            elif state["dt"] is not None:
                log_fn(
                    f"device->host channel init: {state['dt']:.2f}s "
                    "(overlapped with compile)"
                )
        return state["dt"]

    return join
