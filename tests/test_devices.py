"""devices.warm_transfers_async: the background device->host channel warmup.

On the axon tunnel backend the FIRST device->host fetch of a process pays
a one-time channel-establishment cost (measured 15-417s); the warmup
overlaps it with compilation (diffdope_tpu/devices.py).  On CPU it is a
cheap no-op fetch — these tests pin the contract, not the timing.
"""

from diffdope_tpu.devices import warm_transfers_async


def test_warm_join_returns_duration():
    join = warm_transfers_async()
    logged = []
    dt = join(log_fn=logged.append)
    assert dt is not None and dt >= 0.0
    assert len(logged) == 1 and "channel init" in logged[0]


def test_warm_join_idempotent_and_quiet():
    join = warm_transfers_async()
    dt1 = join()  # no log_fn: silent
    dt2 = join()  # joining an already-finished thread is safe
    assert dt1 == dt2
