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


@pytest.fixture(autouse=True)
def fresh_budget():
    """bench's global deadline is anchored at import time; a long test
    session could otherwise start these tests with the budget already
    spent. Each test gets a fresh full budget."""
    saved = bench._DEADLINE
    bench._DEADLINE = time.monotonic() + bench.BENCH_BUDGET_S
    yield
    bench._DEADLINE = saved


def test_backoff_sleeps_fit_budget():
    """The probe schedule (sleeps + worst-case hung probes) must fit the
    given budget — fixed schedules lost round 3 (too short) and round 4
    (too long)."""
    for budget in (0, 100, 330, 780, 3600):
        sleeps = bench._backoff_sleeps(budget)
        worst = bench._PROBE_TIMEOUT_S * (len(sleeps) + 1) + sum(sleeps)
        assert worst <= max(budget, bench._PROBE_TIMEOUT_S)
    # a generous budget still produces a multi-probe schedule
    assert len(bench._backoff_sleeps(1800)) >= 3
    # doubling shape, capped
    s = bench._backoff_sleeps(10000)
    assert s[0] == 30 and all(b <= 600 for b in s)


def test_run_extra_skips_when_global_budget_spent():
    calls = []
    bench._DEADLINE = time.monotonic() + 10  # < 30 s armable
    out = bench._run_extra(lambda: calls.append(1) or 1.0, 300, retries=2)
    assert out == "skipped: global bench budget"
    assert not calls


def test_run_extra_clamps_armed_budget_to_remaining():
    """A nominal 300 s budget with only ~40 s of global budget left must
    arm an alarm that fires within the remaining window."""
    bench._DEADLINE = time.monotonic() + 65
    t0 = time.monotonic()
    out = bench._run_extra(lambda: time.sleep(120) or 1.0, 300, retries=0)
    assert out == "timeout"
    assert time.monotonic() - t0 < 60


def test_metric_end_respects_armed_budget():
    bench._metric_deadline = time.monotonic() + 50
    try:
        # nominal 960 s must clamp to the armed 50 s window
        assert bench._metric_end(960, margin=0) - time.monotonic() < 55
        # and an unset deadline falls back to the nominal window
        bench._metric_deadline = None
        end = bench._metric_end(100, margin=0) - time.monotonic()
        assert 95 < end <= 100
    finally:
        bench._metric_deadline = None


def test_run_headline_provisional_callback():
    """main() emits a provisional line after EACH variant via on_variant —
    the callback must see the running detail and best value."""
    seen = []
    vals = {"fused_chunked_k8": 105.0, "fused": 100.0, "scan": 90.0}

    def fake_headline(variant):
        return vals[variant]

    orig = bench.bench_headline
    bench.bench_headline = fake_headline
    try:
        headline, err, detail = bench._run_headline(
            on_variant=lambda d, best: seen.append((dict(d), best)))
    finally:
        bench.bench_headline = orig
    assert headline == 105.0 and err is None
    assert len(seen) == 3
    # the chunked variant (the shipped Trainer dispatch, best known) runs
    # FIRST so the provisional line carries a number as early as possible
    assert seen[0] == ({"fused_chunked_k8": 105.0}, 105.0)
    assert seen[2][1] == 105.0  # later variants don't lower the best


def test_sigterm_emits_best_known_line():
    """A SIGTERM mid-capture (the driver's outer timeout) must still leave
    a parseable JSON line with the provisional headline on stdout."""
    import json
    import subprocess

    code = (
        "import os, signal, time, json\n"
        "os.environ['JAX_PLATFORMS'] = 'cpu'\n"
        "import bench\n"
        "bench._set_headline(123.4)\n"
        "bench._line['extra_metrics']['note'] = 'provisional'\n"
        "signal.signal(signal.SIGTERM, bench._on_sigterm)\n"
        "os.kill(os.getpid(), signal.SIGTERM)\n"
        "time.sleep(30)\n"  # never reached
    )
    r = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, timeout=120,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    lines = [ln for ln in r.stdout.decode().splitlines() if ln.strip()]
    parsed = json.loads(lines[-1])
    assert parsed["value"] == 123.4
    assert "terminated" in parsed["extra_metrics"]


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

    def fake_headline(variant):
        ran.append(variant)
        return 100.0 if variant == "fused" else 90.0

    orig = bench.bench_headline
    bench.bench_headline = fake_headline
    try:
        headline, err, detail = bench._run_headline(
            only={"fused_accum_flat32"})
        assert ran == ["fused"]
        assert detail == {"fused_accum_flat32": 100.0}
        assert headline == 100.0 and err is None
    finally:
        bench.bench_headline = orig
