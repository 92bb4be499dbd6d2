"""Single-chip exclusivity: bench/entry must be able to terminate a
registered training process group (utils/preempt.py) instead of
deadlocking on the one-client axon tunnel — and must NEVER signal a
recycled/stale pgid (identity proof = pid + /proc start tick)."""
import os
import subprocess
import sys
import time

from relightableavatar_tpu.utils import preempt


def _register_for(pid, pgid_file):
    """Write a registration the way register_training_group does, for an
    arbitrary (session-leader) pid."""
    with open(pgid_file, 'w') as f:
        f.write(f'{pid} {pid} {preempt._proc_starttime(pid)}')


def _spawn_group():
    """A throwaway process group: session leader that spawns a child sleeper."""
    return subprocess.Popen(
        [sys.executable, '-c',
         'import subprocess,sys,time;'
         'subprocess.Popen([sys.executable,"-c","import time;time.sleep(60)"]);'
         'time.sleep(60)'],
        start_new_session=True)


def test_preempt_kills_registered_group(tmp_path, monkeypatch):
    pgid_file = str(tmp_path / 'pgid')
    monkeypatch.setattr(preempt, 'PGID_FILE', pgid_file)
    p = _spawn_group()
    time.sleep(0.5)
    _register_for(p.pid, pgid_file)  # session leader: pgid == pid
    assert preempt.preempt_training(grace_s=5.0) is True
    assert p.wait(timeout=10) != 0
    assert not os.path.exists(pgid_file)
    # idempotent: nothing registered -> False
    assert preempt.preempt_training() is False


def test_preempt_never_kills_own_group(tmp_path, monkeypatch):
    pgid_file = str(tmp_path / 'pgid')
    monkeypatch.setattr(preempt, 'PGID_FILE', pgid_file)
    # the own-group guard must win regardless of identity verification
    with open(pgid_file, 'w') as f:
        f.write(f'{os.getpgrp()} {os.getpid()} '
                f'{preempt._proc_starttime(os.getpid())}')
    assert preempt.preempt_training() is False  # we ARE the group
    os.remove(pgid_file)


def test_preempt_refuses_stale_identity(tmp_path, monkeypatch):
    """A dead/recycled pid (wrong start tick) must NOT be signalled; the
    stale file is removed instead (ADVICE r2: pgids recycle and the atexit
    cleanup never runs after OOM-kill)."""
    pgid_file = str(tmp_path / 'pgid')
    monkeypatch.setattr(preempt, 'PGID_FILE', pgid_file)
    p = _spawn_group()
    time.sleep(0.2)
    pid = p.pid
    with open(pgid_file, 'w') as f:
        f.write(f'{pid} {pid} 424242424242')  # wrong start tick
    assert preempt.preempt_training() is False
    assert not os.path.exists(pgid_file)
    assert p.poll() is None  # untouched
    os.killpg(pid, 9)
    p.wait(timeout=10)


def test_preempt_ignores_legacy_single_field(tmp_path, monkeypatch):
    """Old-format registrations (bare pgid, no identity proof) are
    unverifiable -> removed without signalling."""
    pgid_file = str(tmp_path / 'pgid')
    monkeypatch.setattr(preempt, 'PGID_FILE', pgid_file)
    p = _spawn_group()
    time.sleep(0.2)
    with open(pgid_file, 'w') as f:
        f.write(str(p.pid))
    assert preempt.preempt_training() is False
    assert not os.path.exists(pgid_file)
    assert p.poll() is None
    os.killpg(p.pid, 9)
    p.wait(timeout=10)


def test_register_refuses_non_leader(tmp_path, monkeypatch):
    """register_training_group must refuse when the caller is not its own
    group leader (killing a shared interactive-shell group from another
    process would take down unrelated user processes)."""
    pgid_file = str(tmp_path / 'pgid')
    # child process that is NOT a session/group leader (inherits our group)
    code = ('import os, sys; sys.path.insert(0, sys.argv[1]);'
            'from relightableavatar_tpu.utils import preempt;'
            f'preempt.PGID_FILE = {pgid_file!r};'
            'ok = preempt.register_training_group();'
            'os._exit(0 if ok == (sys.argv[2] == "expect_ok") else 1)')
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run([sys.executable, '-c', code, repo, 'expect_refuse'])
    assert r.returncode == 0
    assert not os.path.exists(pgid_file)

    # and accepts when the caller IS a session leader; os._exit skips the
    # atexit cleanup, simulating an OOM-killed trainer leaving a stale file
    r = subprocess.run([sys.executable, '-c', code, repo, 'expect_ok'],
                       start_new_session=True)
    assert r.returncode == 0
    assert os.path.exists(pgid_file)  # the file records a now-dead pid, so
    # a preempt attempt must treat it as stale
    monkeypatch.setattr(preempt, 'PGID_FILE', pgid_file)
    assert preempt.preempt_training() is False
    assert not os.path.exists(pgid_file)
