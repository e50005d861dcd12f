"""bench.py must survive transient device-memory exhaustion.

Round 3's official bench artifact (BENCH_r03.json) was a
RESOURCE_EXHAUSTED stack trace because a straggler measurement lane still
held HBM when the driver ran bench at round end. These tests inject a
synthetic allocation failure and assert the retry machinery recovers
(VERDICT r3 "Next" #1)."""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest

import bench


class FakeOOM(RuntimeError):
    """Stands in for jax.errors.JaxRuntimeError: RESOURCE_EXHAUSTED ..."""

    def __repr__(self):
        return "JaxRuntimeError('RESOURCE_EXHAUSTED: TPU backend error')"


def test_oom_retry_recovers_after_transient_failures():
    calls = {"n": 0}
    sleeps = []

    def flaky():
        calls["n"] += 1
        if calls["n"] <= 2:
            raise FakeOOM()
        return 42

    out = bench.oom_retry(flaky, "t", attempts=5, base_delay=1.0,
                          sleep=sleeps.append)
    assert out == 42
    assert calls["n"] == 3
    assert sleeps == [1.0, 2.0]          # exponential backoff


def test_oom_retry_gives_up_after_attempts():
    sleeps = []

    def always_oom():
        raise FakeOOM()

    with pytest.raises(FakeOOM):
        bench.oom_retry(always_oom, "t", attempts=3, base_delay=1.0,
                        sleep=sleeps.append)
    assert sleeps == [1.0, 2.0]          # attempts-1 waits, then re-raise


def test_non_oom_errors_propagate_immediately():
    calls = {"n": 0}

    def broken():
        calls["n"] += 1
        raise ValueError("a real bug, not memory pressure")

    with pytest.raises(ValueError):
        bench.oom_retry(broken, "t", attempts=5, base_delay=1.0,
                        sleep=lambda _: None)
    assert calls["n"] == 1               # no retry on non-OOM


def test_preflight_retries_then_succeeds(monkeypatch):
    """Preflight runs the tiny probe under the same retry loop; with the
    probe failing once (synthetic allocation failure) it must recover."""
    real = {"first": True}
    orig = bench.oom_retry

    def wrapped(fn, label, **kw):
        def injected():
            if real["first"]:
                real["first"] = False
                raise FakeOOM()
            return fn()
        kw["sleep"] = lambda _: None
        return orig(injected, label, **kw)

    monkeypatch.setattr(bench, "oom_retry", wrapped)
    bench.preflight()                    # must not raise
    assert real["first"] is False


def test_respawn_main_recovers_after_poisoned_client():
    """An ABORTED backend error poisons the in-process jax client; the
    parent must re-exec fresh children until one exits cleanly."""
    rcs = iter([1, 1, 0])
    cmds, sleeps = [], []

    def fake_run(cmd, env):
        cmds.append((tuple(cmd), env.get("SML_BENCH_CHILD")))
        return next(rcs)

    rc = bench.respawn_main(["bench.py"], attempts=3, delay=5.0,
                            sleep=sleeps.append, run=fake_run)
    assert rc == 0
    assert len(cmds) == 3
    assert all(child == "1" for _, child in cmds)
    assert sleeps == [5.0, 5.0]


def test_respawn_main_gives_up_with_last_rc():
    rc = bench.respawn_main(["bench.py"], attempts=2, delay=0.0,
                            sleep=lambda s: None,
                            run=lambda cmd, env: 7)
    assert rc == 7


def test_clean_trials_stall_rejection():
    """The device-scan protocol's clean-set rule: stalled (slow) trials
    can never enter the set, the fastest always anchors it, and the
    round-4 failure mode (1 fast + 2 stalled trials -> median halves)
    now yields the fast value."""
    import bench

    assert bench.clean_trials([]) == []
    # round-4's scored capture: trial 0 fast, 1-2 tunnel-stalled
    r4 = [1_040_000.0, 455_000.0, 450_000.0]
    assert bench.clean_trials(r4) == [1_040_000.0]
    # healthy capture: everything within 10%
    ok = [1.00e6, 1.02e6, 0.99e6, 1.01e6, 1.03e6]
    assert bench.clean_trials(ok) == sorted(ok)
    # boundary: exactly at 90% of max stays in
    assert bench.clean_trials([100.0, 90.0]) == [90.0, 100.0]
    assert bench.clean_trials([100.0, 89.9]) == [100.0]
