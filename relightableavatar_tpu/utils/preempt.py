"""Single-chip exclusivity between training runs and bench/entry drives.

The axon tunnel serves ONE TPU client at a time: a second process that
touches the device blocks forever (measured — a trivial matmul from a
second client never returns while train.py holds the chip).  That would
deadlock the driver's end-of-round ``bench.py`` run or the
``__graft_entry__`` compile check if a long e2e training run is still in
flight.

Contract:
- training launchers (``scripts/train_e2e.py``) run under ``setsid`` and
  record their process-group id + identity proof in ``PGID_FILE``;
- exclusive consumers (``bench.py``, ``__graft_entry__``) call
  :func:`preempt_training` before first device use.

Identity proof: PGIDs recycle, and the atexit cleanup never runs if the
trainer is OOM-killed (or the machine crashes with a persistent /tmp), so
the registration records ``pgid pid starttime`` where ``starttime`` is the
kernel's per-process start tick from ``/proc/<pid>/stat`` (field 22 —
unique per pid incarnation).  ``preempt_training`` only ever signals a
group whose recorded pid is still alive with the SAME start time and still
belongs to the recorded group; anything else is a stale file and is
removed without signalling.

Preempting is safe: the trainer checkpoints every epoch and the e2e
launcher mirrors checkpoints/scalars into git-tracked ``results/<exp>/live``
every 10 minutes, so at most the current epoch is lost and a later session
resumes from the snapshot.
"""
from __future__ import annotations

import os
import signal
import time

from relightableavatar_tpu.utils.log import log

PGID_FILE = '/tmp/ra_training.pgid'


def _proc_starttime(pid: int) -> str | None:
    """Kernel start tick of ``pid`` (/proc/<pid>/stat field 22), or None when
    the process does not exist.  Parsed after the last ')' so comm fields
    containing spaces/parens cannot shift the indices."""
    try:
        with open(f'/proc/{pid}/stat') as f:
            rest = f.read().rsplit(')', 1)[1].split()
        return rest[19]  # field 22, 1-indexed; fields 3.. start at rest[0]
    except (FileNotFoundError, ProcessLookupError, IndexError, OSError):
        return None


def register_training_group() -> bool:
    """Record the caller's process group (with pid + start-time identity
    proof) for later preemption and arrange cleanup on exit.

    Call from a ``setsid``-launched training wrapper — then the group
    contains exactly the wrapper and its train/run subprocesses.  REFUSES to
    register when the caller is not its own group leader: killing a shared
    group (e.g. an interactive shell's job group) from another process would
    take down user processes outside the training run.  Returns True when
    registered."""
    import atexit
    pid = os.getpid()
    if os.getpgrp() != pid:
        log('preempt: NOT registering — caller is not a process-group '
            'leader (launch the trainer via setsid so preemption only ever '
            'kills the training run)', 'red')
        return False
    start = _proc_starttime(pid)
    with open(PGID_FILE, 'w') as f:
        f.write(f'{os.getpgrp()} {pid} {start}')

    def _cleanup():
        try:
            rec = open(PGID_FILE).read().split()
            if rec and int(rec[0]) == os.getpgrp():
                os.remove(PGID_FILE)
        except (FileNotFoundError, ValueError, OSError):
            pass

    atexit.register(_cleanup)
    return True


def _read_registration():
    """Parse PGID_FILE -> (pgid, pid, starttime) or None.  Legacy one-field
    files (pre-identity-proof) are treated as unverifiable -> None."""
    try:
        rec = open(PGID_FILE).read().split()
        if len(rec) != 3:
            return None
        return int(rec[0]), int(rec[1]), rec[2]
    except (FileNotFoundError, ValueError):
        return None


def preempt_training(grace_s: float = 20.0) -> bool:
    """Terminate a registered, identity-verified training process group
    (SIGTERM, then SIGKILL after ``grace_s``).  Returns True when something
    was preempted; stale/unverifiable registrations are removed untouched."""
    if not os.path.exists(PGID_FILE):
        return False
    rec = _read_registration()
    if rec is None:
        _safe_remove()  # legacy/corrupt registration: never signal blindly
        return False
    pgid, pid, start = rec
    if pgid == os.getpgrp():  # we ARE the training group; nothing to do
        return False
    # identity proof: the recorded pid must still be the same incarnation
    # and still in the recorded group — otherwise the pgid may have been
    # recycled by unrelated processes.
    if _proc_starttime(pid) != start:
        _safe_remove()
        return False
    try:
        if os.getpgid(pid) != pgid:
            _safe_remove()
            return False
    except ProcessLookupError:
        _safe_remove()
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
