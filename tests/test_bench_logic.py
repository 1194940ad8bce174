"""Capture-logic tests for bench.py (no device work).

The bench is the round's one driver-captured artifact, so its recovery
plumbing is load-bearing: nested SIGALRM budgets must stay authoritative
(SIGALRM is one process-wide timer), and salvage retries must never
overwrite an already-measured number with a worse attempt or an error.
"""
import os
import sys
import time

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def test_merge_prefer_numeric():
    m = bench._merge_prefer_numeric
    # numeric leaves survive; markers are filled from the newer attempt
    assert m({"a": 1.0, "b": "timeout"},
             {"a": "error: x", "b": 2.0}) == {"a": 1.0, "b": 2.0}
    assert m("error: not run", {"a": 3}) == {"a": 3}
    assert m({"a": 1.0}, "error: y") == {"a": 1.0}
    assert m(None, "timeout") == "timeout"
    # keys present on only one side survive
    assert m({"a": 1.0}, {"a": "error", "b": 2.0}) == {"a": 1.0, "b": 2.0}


def test_nested_timeout_outer_bound_authoritative():
    """An inner _with_timeout with a LARGER budget must not extend the
    enclosing one."""
    def inner_sleeps():
        return bench._with_timeout(lambda: time.sleep(30), 30)

    t0 = time.monotonic()
    with pytest.raises(bench._Timeout):
        bench._with_timeout(inner_sleeps, 2)
    assert time.monotonic() - t0 < 10


def test_nested_timeout_rearms_enclosing():
    """After an inner call completes, the enclosing timer keeps running
    (the old implementation's finally: alarm(0) cancelled it)."""
    def quick_then_sleep():
        bench._with_timeout(lambda: None, 30)
        time.sleep(30)

    t0 = time.monotonic()
    with pytest.raises(bench._Timeout):
        bench._with_timeout(quick_then_sleep, 2)
    assert time.monotonic() - t0 < 10


def test_run_extra_retries_marker_rows_and_keeps_numerics():
    """Metrics that guard variants internally (bench_uniter_large) return
    marker strings instead of raising; _run_extra must retry those AND
    keep the numeric leaves already measured."""
    calls = []

    def flaky():
        calls.append(1)
        if len(calls) == 1:
            return {"x": 1.5, "y": "timeout"}
        return {"x": 9.9, "y": 2.5}

    out = bench._run_extra(flaky, 5, retries=1)
    assert out == {"x": 1.5, "y": 2.5}
    assert len(calls) == 2

    # non-timeout exception: no retry, prior numerics survive
    calls.clear()

    def explodes_second():
        calls.append(1)
        if len(calls) == 1:
            return {"x": 1.5, "y": "timeout"}
        raise ValueError("boom")

    out = bench._run_extra(explodes_second, 5, retries=3)
    assert out["x"] == 1.5 and out["y"] == "timeout"
    assert len(calls) == 2


def test_run_extra_returns_error_string_on_total_failure():
    def always_fails():
        raise ValueError("nope")

    out = bench._run_extra(always_fails, 5, retries=2)
    assert isinstance(out, str) and out.startswith("error: ValueError")


def test_run_headline_only_filter():
    """The salvage pass re-runs just the errored variant; `only` must
    restrict which shapes are measured."""
    ran = []

    def fake_headline(fuse):
        ran.append(fuse)
        return 100.0 if fuse else 90.0

    orig = bench.bench_headline
    bench.bench_headline = fake_headline
    try:
        headline, err, detail = bench._run_headline(
            only={"fused_accum_flat32"})
        assert ran == [True]
        assert detail == {"fused_accum_flat32": 100.0}
        assert headline == 100.0 and err is None
    finally:
        bench.bench_headline = orig
