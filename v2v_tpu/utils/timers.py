"""Lightweight profiling timers (reference utils/timers.py).

`Timer` measures host wall time; `DeviceTimer` blocks on device work
first (the CudaTimer analog — on TPU that means block_until_ready on a
sentinel or relying on the context running synchronous code). Both
accumulate into module-level dicts; `print_timing_info` summarizes
(registered atexit only when a timer has been used, to avoid noise).

For deep profiles use `jax.profiler.trace` around the train loop — the
tracer captures per-op device timelines the reference never had.
"""
from __future__ import annotations

import atexit
import time
from collections import defaultdict
from contextlib import contextmanager

import numpy as np

timers = defaultdict(list)
device_timers = defaultdict(list)
_registered = False


def _register():
    global _registered
    if not _registered:
        _registered = True
        atexit.register(print_timing_info)


class Timer:
    def __init__(self, timer_name: str = ""):
        self.timer_name = timer_name

    def __enter__(self):
        _register()
        self.start = time.time()
        return self

    def __exit__(self, *args):
        self.interval = (time.time() - self.start) * 1000.0
        timers[self.timer_name].append(self.interval)


class DeviceTimer:
    """Times device work by synchronizing on `result` at exit:

        with DeviceTimer('step') as t:
            out = step(...)
            t.result = out
    """

    def __init__(self, timer_name: str = ""):
        self.timer_name = timer_name
        self.result = None

    def __enter__(self):
        _register()
        self.start = time.time()
        return self

    def __exit__(self, *args):
        if self.result is not None:
            # A host scalar fetch is the only reliable device sync on
            # the axon relay (block_until_ready returns immediately
            # there — see .claude/skills/verify/SKILL.md); fetching one
            # element forces completion on every backend.
            import jax
            leaves = [l for l in jax.tree.leaves(self.result)
                      if hasattr(l, "dtype")]
            if leaves:
                np.asarray(jax.device_get(leaves[0]))
        device_timers[self.timer_name].append(
            (time.time() - self.start) * 1000.0)


@contextmanager
def profile_trace(log_dir: str):
    """jax.profiler trace context (TensorBoard-viewable)."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def print_timing_info():
    print("== Timing statistics ==")
    for name, vals in [*device_timers.items(), *timers.items()]:
        mean = float(np.mean(vals))
        if mean < 1000.0:
            print(f"{name}: {mean:.2f} ms ({len(vals)} samples)")
        else:
            print(f"{name}: {mean / 1000.0:.2f} s ({len(vals)} samples)")
