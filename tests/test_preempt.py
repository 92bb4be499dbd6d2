"""Single-chip exclusivity: bench/entry must be able to terminate a
registered training process group (utils/preempt.py) instead of
deadlocking on the one-client axon tunnel."""
import os
import subprocess
import sys
import time

from relightableavatar_tpu.utils import preempt


def test_preempt_kills_registered_group(tmp_path, monkeypatch):
    pgid_file = str(tmp_path / 'pgid')
    monkeypatch.setattr(preempt, 'PGID_FILE', pgid_file)
    # a throwaway process group: session leader that spawns a child sleeper
    p = subprocess.Popen([sys.executable, '-c',
                          'import subprocess,sys,time;'
                          'subprocess.Popen([sys.executable,"-c","import time;time.sleep(60)"]);'
                          'time.sleep(60)'],
                         start_new_session=True)
    with open(pgid_file, 'w') as f:
        f.write(str(p.pid))  # session leader: pgid == pid
    time.sleep(0.5)
    assert preempt.preempt_training(grace_s=5.0) is True
    assert p.wait(timeout=10) != 0
    assert not os.path.exists(pgid_file)
    # idempotent: nothing registered -> False
    assert preempt.preempt_training() is False


def test_preempt_never_kills_own_group(tmp_path, monkeypatch):
    pgid_file = str(tmp_path / 'pgid')
    monkeypatch.setattr(preempt, 'PGID_FILE', pgid_file)
    with open(pgid_file, 'w') as f:
        f.write(str(os.getpgrp()))
    assert preempt.preempt_training() is False  # we ARE the group
    os.remove(pgid_file)
