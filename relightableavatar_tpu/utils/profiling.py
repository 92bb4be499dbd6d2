"""Profiling: jax.profiler traces with the reference's cfg surface.

Mirrors ``lib/utils/prof_utils.py:26-47`` (skip/wait/warmup/active/repeat
schedule stepped per train iteration) on top of ``jax.profiler`` — traces are
written as xplane files viewable in TensorBoard or parseable offline.
"""
from __future__ import annotations

import os

import jax

from relightableavatar_tpu.utils.log import log


class Profiler:
    """Step-scheduled profiler: call .step() once per training iteration."""

    def __init__(self, cfg):
        node = cfg.profiling
        self.enabled = bool(node.enabled)
        self.record_dir = node.record_dir or os.path.join(cfg.record_dir, 'profile')
        self.skip_first = int(node.skip_first)
        self.wait = int(node.wait)
        self.warmup = int(node.warmup)
        self.active = int(node.active)
        self.repeat = int(node.repeat)
        self.i = 0
        self.tracing = False

    def _phase(self, i: int) -> str:
        if i < self.skip_first:
            return 'skip'
        j = (i - self.skip_first) % (self.wait + self.warmup + self.active)
        cycle = (i - self.skip_first) // (self.wait + self.warmup + self.active)
        if self.repeat and cycle >= self.repeat:
            return 'done'
        if j < self.wait:
            return 'wait'
        if j < self.wait + self.warmup:
            return 'warmup'
        return 'active'

    def step(self):
        if not self.enabled:
            return
        phase = self._phase(self.i)
        if phase == 'active' and not self.tracing:
            os.makedirs(self.record_dir, exist_ok=True)
            jax.profiler.start_trace(self.record_dir)
            self.tracing = True
            log(f'profiler: tracing -> {self.record_dir}', 'cyan')
        elif phase != 'active' and self.tracing:
            jax.profiler.stop_trace()
            self.tracing = False
            log('profiler: trace stopped', 'cyan')
        self.i += 1

    def close(self):
        if self.tracing:
            jax.profiler.stop_trace()
            self.tracing = False
