"""Tracing / profiling / debug aids (SURVEY §5.1-5.2).

The reference has no profiling beyond datetime deltas around CV runs
(parameter.py:716,790-792) and no sanitizers (single-threaded torch). The
TPU-native equivalents:

  * trace(dir): jax.profiler trace context — view with TensorBoard or xprof.
  * StepTimer: wall-clock step timing that forces a device->host value fetch
    (on tunneled TPU backends block_until_ready alone can return before
    queued donated-buffer steps finish) and reports lists/s.
  * enable_debug_nans / disable_jit: jax's debug modes, the framework's
    answer to race detectors — every NaN faults at the op that made it.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace for the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def force(value) -> float:
    """Force completion of everything `value` depends on by fetching EVERY
    leaf (fetching only one would leave work behind sibling leaves from other
    executables untimed on tunneled backends)."""
    return float(sum(float(jnp.sum(leaf).astype(jnp.float32))
                     for leaf in jax.tree_util.tree_leaves(value)))


class StepTimer:
    """Counts steps/lists and reports throughput.

        timer = StepTimer()
        for batch in batches:
            ...
            timer.step(loss, lists=int(batch.mask.any(-1).sum()))
        print(timer.report())
    """

    def __init__(self):
        self.reset()

    def reset(self):
        self._t0: Optional[float] = None
        self.steps = 0
        self.lists = 0

    def step(self, value=None, lists: int = 0):
        if self._t0 is None:  # first step = warmup boundary
            if value is not None:
                force(value)
            self._t0 = time.perf_counter()
            return
        self.steps += 1
        self.lists += lists

    def report(self, value=None) -> dict:
        if value is not None:
            force(value)
        dt = time.perf_counter() - (self._t0 or time.perf_counter())
        return {
            "steps": self.steps,
            "seconds": dt,
            "steps_per_s": self.steps / dt if dt > 0 else 0.0,
            "lists_per_s": self.lists / dt if dt > 0 else 0.0,
        }


def enable_debug_nans(on: bool = True):
    """Fault at the op that produces the first NaN (jax_debug_nans)."""
    jax.config.update("jax_debug_nans", on)


def disable_jit(on: bool = True):
    """Run op-by-op for printf-style debugging (jax_disable_jit)."""
    jax.config.update("jax_disable_jit", on)
