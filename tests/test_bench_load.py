"""bench.py load instrumentation: the external-busy meter must EXCLUDE
this process tree's own CPU (otherwise every bench run would report its
own Spark load as co-tenant noise and the adjudication signal is dead)."""

from __future__ import annotations

import subprocess
import time

import bench


def test_psi_reader_shape():
    psi = bench._read_psi_cpu()
    if psi is None:  # kernel without PSI: nothing to assert
        return
    assert "some" in psi
    assert {"avg10", "avg60", "avg300", "total"} <= set(psi["some"])


def test_subtree_ticks_capture_reaped_children():
    """The exclusion mechanism: a child's CPU must appear in OUR subtree
    total (via cutime/cstime once reaped), so the meter can subtract it.
    Asserted on the tick counter directly — the external FRACTION itself
    is not assertable on a co-tenant host, where sibling processes are
    legitimately counted as external load."""
    clk = bench._LoadMeter().clk
    before = bench._subtree_busy_ticks()
    p = subprocess.Popen(
        ["python3", "-c", "import time\nt=time.time()\nwhile time.time()-t<1.0: pass"]
    )
    p.wait()
    delta = bench._subtree_busy_ticks() - before
    assert delta >= 0.6 * clk, f"child spin not captured in subtree: {delta} ticks"


def test_meter_idle_near_zero():
    m = bench._LoadMeter()
    time.sleep(0.3)
    # co-tenant hosts may genuinely be busy; just bound the sane range
    frac = m.window()
    assert 0.0 <= frac <= 1.0


class _StubMeter:
    def window(self):
        return 0.0


def test_adjudication_skips_bench_synthesized_rows():
    """Regression: the solo re-measure used to KeyError on rows the bench
    synthesizes itself (etl_top100_books_cold is in timings/prev but not
    in the query registry), crashing the whole bench at the end of a
    90-query run. Such rows must get a no-solo marker instead."""
    prev_q = {"etl_top100_books_cold": 4.0, "fast_row": 0.1}
    timings = {"etl_top100_books_cold": 8.0, "fast_row": 0.2}
    adj = bench._adjudicate(
        None, "/nonexistent", {}, prev_q, timings, _StubMeter(), n_runs=1
    )
    assert adj["etl_top100_books_cold"]["solo_s"] is None
    assert adj["etl_top100_books_cold"]["run_ratio"] == 2.0
    assert "fast_row" not in adj  # below the 0.3 s floor


def test_adjudication_solo_remeasures_registry_rows():
    calls = []

    class _FakeDF:
        @property
        def write(self):
            return self

        def format(self, *_):
            return self

        def mode(self, *_):
            return self

        def save(self):
            calls.append(1)

    golden = {"slow_row": lambda spark, sf: _FakeDF()}
    adj = bench._adjudicate(
        None,
        "/x",
        golden,
        {"slow_row": 1.0},
        {"slow_row": 2.0},
        _StubMeter(),
        n_runs=3,
        prev_solo={"slow_row": 1.5},
    )
    # n_runs timed + ONE discarded warmup (VERDICT r13 #7): the cold
    # first execution is recorded separately, never mixed into the median
    assert len(calls) == 4
    assert adj["slow_row"]["solo_ratio"] is not None
    assert adj["slow_row"]["solo_cold_s"] is not None
    # like-for-like solo baseline (VERDICT r13 #2)
    assert adj["slow_row"]["solo_prev_s"] == 1.5
    assert adj["slow_row"]["solo_vs_solo"] is not None


def test_adjudication_watch_row_skips_are_recorded():
    """ADVICE r13: a watch row that falls out of the forced-adjudication
    contract (absent from the run, absent from the previous record, or
    under the 0.3 s floor) must leave a visible note in the artifact."""
    watch = sorted(bench._WATCH_ROWS)
    assert watch, "watch set unexpectedly empty"
    adj = bench._adjudicate(
        None, "/x", {}, {}, {}, _StubMeter(), n_runs=1
    )
    for q in watch:
        assert "NOT adjudicated" in adj[q]["note"]
    # present in the run but with no previous record → the skip names it
    q0 = watch[0]
    adj = bench._adjudicate(
        None, "/x", {}, {}, {q0: 1.0}, _StubMeter(), n_runs=1
    )
    assert "no previous record" in adj[q0]["note"]


def test_adjudication_solo_window_probes(monkeypatch):
    """r13: with a fresh adjudication session, the probes re-run in THAT
    window and each solo divides by its own window's factor (the start-
    of-run factors can be stale by the time solos run); the reserved
    __solo_window__ entry records both probes, and rows carry
    solo_cal_factor + probe_class."""

    class _FakeDF:
        @property
        def write(self):
            return self

        def format(self, *_):
            return self

        def mode(self, *_):
            return self

        def save(self):
            pass

    class _StubSpark:
        def stop(self):
            pass

    golden = {
        "topk_books": lambda spark, sf: _FakeDF(),
        "ann_lsh_buckets": lambda spark, sf: _FakeDF(),
        "slow_row": lambda spark, sf: _FakeDF(),
    }
    adj = bench._adjudicate(
        _StubSpark(),
        "/x",
        golden,
        {"slow_row": 1.0},
        {"slow_row": 2.0},
        _StubMeter(),
        n_runs=1,
        mk_session=lambda name: _StubSpark(),
        prev_probes=(1.0, 2.0),
    )
    w = adj["__solo_window__"]
    assert w["topk_p50"] is not None and w["fold_p50"] is not None
    assert w["topk_factor"] is not None and w["fold_factor"] is not None
    row = adj["slow_row"]
    assert row["probe_class"] == "topk"
    assert row["solo_cal_factor"] is not None
    assert row["fresh_session"] is True


def test_adjudication_solo_vs_solo_uses_solo_era_probes(monkeypatch):
    """r14 review #2: solo_vs_solo_cal must divide by this solo window's
    probe over the PREVIOUS solo window's probe (the era the stored
    solo_s was measured in), not the previous run's start-of-run probe."""

    class _FakeDF:
        @property
        def write(self):
            return self

        def format(self, *_):
            return self

        def mode(self, *_):
            return self

        def save(self):
            pass

    class _StubSpark:
        def stop(self):
            pass

    golden = {
        "topk_books": lambda spark, sf: _FakeDF(),
        "ann_lsh_buckets": lambda spark, sf: _FakeDF(),
        "slow_row": lambda spark, sf: _FakeDF(),
    }
    times = iter(range(1000))
    monkeypatch.setattr(bench.time, "monotonic", lambda: next(times) * 0.1)
    adj = bench._adjudicate(
        _StubSpark(),
        "/x",
        golden,
        {"slow_row": 1.0},
        {"slow_row": 2.0},
        _StubMeter(),
        n_runs=1,
        mk_session=lambda name: _StubSpark(),
        prev_probes=(1.0, 2.0),
        prev_solo={"slow_row": 1.5},
        prev_solo_probes=(4.0, 8.0),
    )
    row = adj["slow_row"]
    w = adj["__solo_window__"]
    # era factor = this solo window's topk probe / previous solo probe
    assert row["solo_vs_solo_cal_factor"] == round(w["topk_p50"] / 4.0, 3)
    assert row["solo_vs_solo"] is not None
