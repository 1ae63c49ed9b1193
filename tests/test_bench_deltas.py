"""Unit pins for bench.py's round-over-round delta block (r11 verdict
ask #6): ratio ordering, the 20 ms denominator floor, and robustness
to errored/missing previous entries — the block must never be able to
crash the driver's bench run."""

from __future__ import annotations

import importlib.util
import os
import sys


def _bench():
    spec = importlib.util.spec_from_file_location(
        "bench",
        os.path.join(os.path.dirname(__file__), "..", "bench.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules.setdefault("bench", mod)
    spec.loader.exec_module(mod)
    return mod


def test_ratio_ordering_and_shape():
    b = _bench()
    prev = {
        "a": {"warm_median": 1.0},
        "b": {"warm_median": 0.5},
        "c": {"warm_median": 2.0},
    }
    warm = {"a": 2.0, "b": 0.55, "c": 2.0}
    d = b.top_deltas(prev, warm)
    assert list(d) == ["a", "b", "c"]  # ratios 2.0, 1.1, 1.0
    assert d["a"] == [1.0, 2.0, 2.0]


def test_denominator_floor_suppresses_microsecond_jitter():
    b = _bench()
    prev = {"tiny": {"warm_median": 0.001}, "real": {"warm_median": 1.0}}
    warm = {"tiny": 0.01, "real": 1.5}
    d = b.top_deltas(prev, warm)
    # tiny's raw ratio would be 10x; floored to 0.01/0.02 = 0.5
    assert list(d)[0] == "real"
    assert d["tiny"][2] == 0.5


def test_errored_and_missing_previous_entries_skipped():
    b = _bench()
    prev = {
        "err": {"warm_median": None},
        "neg": {"warm_median": -1.0},
        "plain": 0.5,          # legacy scalar form tolerated
        "ok": {"warm_median": 1.0},
    }
    warm = {"err": 1.0, "neg": 1.0, "ok": 1.2, "new_query": 9.9, "plain": 1.0}
    d = b.top_deltas(prev, warm)
    assert set(d) == {"ok", "plain"}


def test_top_n_cap():
    b = _bench()
    prev = {f"q{i}": {"warm_median": 1.0} for i in range(30)}
    warm = {f"q{i}": 1.0 + i / 100 for i in range(30)}
    d = b.top_deltas(prev, warm)
    assert len(d) == 10
    assert list(d)[0] == "q29"


def test_ambient_load_threshold():
    """r12 verdict ask #3: the load stamp's noisy rule — 0.0625/core
    (2.0 on the 32-core sandbox); the documented noisy runs showed
    load 3-5."""
    import bench as b

    assert not b.ambient_load(32, 0.4)
    assert not b.ambient_load(32, 1.9)
    assert b.ambient_load(32, 2.1)
    assert b.ambient_load(32, 4.5)
    # degenerate cores never divides by zero
    assert b.ambient_load(0, 1.0)


def test_current_round_bad_env_falls_back(monkeypatch, capsys):
    """r14 ADVICE #2: a non-integer SPARK_GRAFT_ROUND used to raise
    ValueError inside the detail_name f-string, turning the except
    handler into a NameError that escaped AFTER the whole bench had
    run.  A bad env value now falls back to the artifact scan."""
    b = _bench()
    monkeypatch.setenv("SPARK_GRAFT_ROUND", "not-a-number")
    r = b._current_round()
    assert isinstance(r, int) and r >= 0
    assert "SPARK_GRAFT_ROUND" in capsys.readouterr().err
    monkeypatch.setenv("SPARK_GRAFT_ROUND", "17")
    assert b._current_round() == 17
