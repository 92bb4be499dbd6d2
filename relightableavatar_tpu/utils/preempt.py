"""Single-chip exclusivity between training runs and bench/entry drives.

The axon tunnel serves ONE TPU client at a time: a second process that
touches the device blocks forever (measured — a trivial matmul from a
second client never returns while train.py holds the chip).  That would
deadlock the driver's end-of-round ``bench.py`` run or the
``__graft_entry__`` compile check if a long e2e training run is still in
flight.

Contract:
- training launchers (``scripts/train_e2e.py``) run under ``setsid`` and
  record their process-group id in ``PGID_FILE``;
- exclusive consumers (``bench.py``, ``__graft_entry__``) call
  :func:`preempt_training` before first device use.

Preempting is safe: the trainer checkpoints every epoch and the e2e
launcher mirrors checkpoints/scalars into git-tracked ``results/<exp>/live``
every 10 minutes, so at most the current epoch is lost and a later session
resumes from the snapshot.
"""
from __future__ import annotations

import os
import signal
import time

PGID_FILE = '/tmp/ra_training.pgid'


def register_training_group() -> None:
    """Record the caller's process group for later preemption and arrange
    cleanup on exit.  Call from a ``setsid``-launched training wrapper (then
    the group contains exactly the wrapper and its train/run subprocesses)."""
    import atexit
    with open(PGID_FILE, 'w') as f:
        f.write(str(os.getpgrp()))

    def _cleanup():
        try:
            if int(open(PGID_FILE).read().strip()) == os.getpgrp():
                os.remove(PGID_FILE)
        except (FileNotFoundError, ValueError):
            pass

    atexit.register(_cleanup)


def preempt_training(grace_s: float = 20.0) -> bool:
    """Terminate a registered training process group (SIGTERM, then SIGKILL
    after ``grace_s``).  Returns True when something was preempted."""
    try:
        pgid = int(open(PGID_FILE).read().strip())
    except (FileNotFoundError, ValueError):
        return False
    if pgid == os.getpgrp():  # we ARE the training group; nothing to do
        return False
    try:
        os.killpg(pgid, signal.SIGTERM)
    except ProcessLookupError:
        _safe_remove()
        return False
    deadline = time.time() + grace_s
    while time.time() < deadline:
        try:
            os.killpg(pgid, 0)
        except ProcessLookupError:
            break
        time.sleep(0.5)
    else:
        try:
            os.killpg(pgid, signal.SIGKILL)
        except ProcessLookupError:
            pass
    _safe_remove()
    return True


def _safe_remove() -> None:
    try:
        os.remove(PGID_FILE)
    except FileNotFoundError:
        pass
