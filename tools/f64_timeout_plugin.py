"""Per-test wall-clock cap for the DSPTB_F64_DEVICE_IIR instrumentation
run: a reference test that cannot finish in TIMEOUT_S on the blocked
device-IIR path is counted as failing it (the measurement's question is
'could the host-scipy surface be dropped?' — a path that needs unbounded
recompilation time answers no just as loudly as a numerical mismatch)."""

import signal

TIMEOUT_S = 90


class _TestTimeout(Exception):
    pass


def _raise(signum, frame):
    raise _TestTimeout(f"device-IIR instrumentation cap ({TIMEOUT_S}s) hit")


def pytest_runtest_call(item):
    old = signal.signal(signal.SIGALRM, _raise)
    signal.alarm(TIMEOUT_S)
    try:
        item.runtest()
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)
