"""Tests for the tracing/profiling/debug utilities (utils/profiling.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from ptranking_tpu.utils.profiling import (
    StepTimer,
    disable_jit,
    enable_debug_nans,
    force,
)


def test_step_timer_counts_and_reports():
    t = StepTimer()
    x = jnp.ones((4,))
    t.step(x)  # warmup boundary
    for _ in range(5):
        y = x * 2
        t.step(y, lists=8)
    rep = t.report(y)
    assert rep["steps"] == 5
    assert rep["lists_per_s"] > 0


def test_force_returns_float():
    assert isinstance(force({"a": jnp.arange(3.0)}), float)


def test_debug_nans_toggle():
    enable_debug_nans(True)
    try:
        # debug_nans instruments newly compiled executables only; clear the
        # cache so a prior test's identical computation can't shadow the probe
        jax.clear_caches()
        ok = False
        try:
            jnp.log(jnp.zeros(3) / jnp.zeros(3)).block_until_ready()
        except FloatingPointError:
            ok = True
        assert ok, "debug_nans should fault on NaN"
    finally:
        enable_debug_nans(False)


def test_disable_jit_toggle():
    disable_jit(True)
    try:
        calls = []

        @jax.jit
        def f(x):
            calls.append(1)
            return x + 1

        f(jnp.ones(2))
        f(jnp.ones(2))
        assert len(calls) == 2  # re-traces every call when jit is off
    finally:
        disable_jit(False)
