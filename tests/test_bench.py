"""bench.py fail-safe + contention-verdict unit tests (no Spark).

r4 verdict items #1/#2: the artifact must (a) carry a machine-readable
contention verdict computed from the per-leg probes with the
BASELINE.md post-mortem thresholds, and (b) never overrun the driver
window — the budget gate must degrade the draw schedule, and every
intermediate emit must be a fully parseable JSON line.
"""

from __future__ import annotations

import json

import bench


def _leg(cores: int, pps: float, spin: float, mc: float,
         load1: float = 1.0) -> dict:
    return {
        "cores": cores,
        "crawl_pages": 400000,
        "crawl_rounds": 2,
        "crawl_wall_sec": 100.0,
        "fetched_pages": int(pps * 100),
        "frontier_urls_processed": int(pps * 600),
        "fetched_pages_per_sec": pps,
        "frontier_urls_per_sec": pps * 6,
        "probe_spin_per_sec": round(spin),
        "probe_spin_mc_per_sec": round(mc),
        "probe_load1": load1,
    }


def _reps(lo_legs, hi_legs):
    return {1: list(lo_legs), 4: list(hi_legs)}


class TestContentionVerdict:
    def test_clean_window_not_contended(self):
        # all legs at full silicon, matched clocks (mc = 4x spin)
        lo = [_leg(1, 300.0, 33e6, 132e6)]
        hi = [_leg(4, 1000.0, 33e6, 132e6), _leg(4, 980.0, 32.8e6, 131e6)]
        v = bench.contention_verdict(_reps(lo, hi), 1, 4, lo[0], hi[0], 4)
        assert v["contended"] is False
        assert v["inflation_risk"] is False
        assert v["pair_low_accepted"] and v["pair_hi_accepted"]
        assert abs(v["scaling_clock_skew"] - 1.0) < 0.02
        assert v["legs_accepted"] == {"1": [True], "4": [True, True]}

    def test_depressed_hi_best_is_contended(self):
        # the 0.806-run shape: hi best drew under a ~40% mc episode
        # (probe 24.1M vs 40M best — BASELINE.md) while a later, slower
        # hi draw saw clean silicon, so best_mc is established high
        lo = [_leg(1, 300.0, 40e6, 160e6)]
        hi = [
            _leg(4, 900.0, 40e6, 96e6),    # best throughput, mc at 60%
            _leg(4, 700.0, 40e6, 160e6),   # clean probes, slower draw
        ]
        v = bench.contention_verdict(_reps(lo, hi), 1, 4, lo[0], hi[0], 4)
        assert v["pair_hi_accepted"] is False
        assert v["contended"] is True
        assert v["legs_accepted"]["4"] == [False, True]

    def test_clock_skew_flags_contended(self):
        # the 0.727-run shape: lo best rode single-core turbo (33.3M/s)
        # while the hi best's per-core aggregate sat at 30.5M/s -> skew
        # 1.09 > 1.05 even though both legs' probes clear 85% of best
        lo = [_leg(1, 318.0, 33.3e6, 122e6)]
        hi = [_leg(4, 925.0, 33.0e6, 122e6)]
        v = bench.contention_verdict(_reps(lo, hi), 1, 4, lo[0], hi[0], 4)
        assert v["scaling_clock_skew"] > bench.SKEW_FLAG
        assert v["contended"] is True
        assert v["pair_hi_accepted"] is True  # skew alone flipped it

    def test_depressed_lo_best_is_inflation_risk_not_contended(self):
        # lo best launched at 60% silicon: the DENOMINATOR under-reads
        # capacity, so the reported ratio may be optimistic — recorded
        # as inflation_risk, not contended (which means under-measured)
        lo = [_leg(1, 250.0, 20e6, 80e6)]
        hi = [_leg(4, 1000.0, 33e6, 132e6)]
        v = bench.contention_verdict(_reps(lo, hi), 1, 4, lo[0], hi[0], 4)
        assert v["inflation_risk"] is True
        assert v["contended"] is False
        # depressed lo clock also reads as LOW skew, not high
        assert v["scaling_clock_skew"] < 1.0

    def test_mc_workers_denominator_matches_high_n(self):
        # r4 ADVICE low #1: with ZENO_BENCH_HIGH_CORES=8 the per-core
        # denominator must divide by 8, not a hard-coded 4
        lo = [_leg(1, 150.0, 33e6, 8 * 33e6)]
        hi = [_leg(8, 1100.0, 33e6, 8 * 33e6)]
        reps = {1: lo, 8: hi}
        v = bench.contention_verdict(reps, 1, 8, lo[0], hi[0], 8)
        assert abs(v["scaling_clock_skew"] - 1.0) < 0.02

    def test_thresholds_recorded_in_verdict(self):
        lo = [_leg(1, 300.0, 33e6, 132e6)]
        hi = [_leg(4, 1000.0, 33e6, 132e6)]
        v = bench.contention_verdict(_reps(lo, hi), 1, 4, lo[0], hi[0], 4)
        assert v["probe_accept_threshold"] == bench.PROBE_ACCEPT
        assert v["skew_flag_threshold"] == bench.SKEW_FLAG


class TestBudgetGate:
    def test_est_leg_cost_uses_measured_walls(self):
        st = bench._BenchState(0.1, 1, 4)
        assert st.est_leg_cost(1) == bench._DEFAULT_LEG_COST[1]
        st.leg_walls[1] = [480.0, 520.0]
        assert st.est_leg_cost(1) == 520.0

    def test_affordable_degrades_near_deadline(self, monkeypatch):
        monkeypatch.setattr(bench, "DEADLINE", 1000.0)
        st = bench._BenchState(0.1, 1, 4)
        st.leg_walls[1] = [500.0]
        st.leg_walls[4] = [200.0]
        # fresh clock: 1000s left, reserve 420 -> lo (1.2*500+35=635)
        # unaffordable, hi (1.2*200+35=275) affordable
        assert st.affordable(1) is False
        assert st.affordable(4) is True

    def test_settle_cap_shrinks_with_budget(self, monkeypatch):
        monkeypatch.setattr(bench, "DEADLINE", 900.0)
        st = bench._BenchState(0.1, 1, 4)
        st.leg_walls[4] = [200.0]
        # 900 - 420 - 240 = 240s of settle slack for the next hi leg
        assert abs(st.settle_cap(4) - 240.0) < 5.0
        # and it never goes below the 10s probe floor
        monkeypatch.setattr(bench, "DEADLINE", 100.0)
        st2 = bench._BenchState(0.1, 1, 4)
        st2.leg_walls[4] = [200.0]
        assert st2.settle_cap(4) == 10.0


class TestIncrementalArtifact:
    def _populated_state(self):
        st = bench._BenchState(0.1, 1, 4)
        st.reps[1].append(_leg(1, 300.0, 33e6, 132e6))
        st.reps[4].append(_leg(4, 1000.0, 33e6, 132e6))
        return st

    def test_emit_before_any_pair_is_parseable(self, capsys):
        st = bench._BenchState(0.1, 1, 4)
        st.emit(progress="scaling")
        line = capsys.readouterr().out.strip()
        parsed = json.loads(line)
        assert parsed["partial"] is True
        assert parsed["metric"] == "fetched_pages_per_sec"
        assert parsed["queries"] == {}

    def test_partial_after_pair_carries_the_gate_number(self, capsys):
        st = self._populated_state()
        st.emit(progress="scaling")
        parsed = json.loads(capsys.readouterr().out.strip())
        assert parsed["partial"] is True
        assert parsed["scaling_efficiency"] == round((1000.0 / 300.0) / 4, 3)
        assert parsed["value"] == 1000.0
        assert parsed["scaling_low_pages_per_sec"] == 300.0
        assert "contended" in parsed and "scaling_probes" in parsed
        assert parsed["probe_mc_workers"] == 4

    def test_final_emit_not_partial_and_has_queries(self, capsys):
        st = self._populated_state()
        st.queries = {"host_counts": 0.3}
        st.emit(progress="done", final=True)
        parsed = json.loads(capsys.readouterr().out.strip())
        assert parsed["partial"] is False
        assert parsed["queries"] == {"host_counts": 0.3}

    def test_sigterm_handler_emits_best_so_far(self, capsys):
        # the handler must print a parseable line; os._exit is stubbed
        import signal as _signal

        st = self._populated_state()
        exits = []
        real_exit = bench.os._exit
        bench.os._exit = lambda code: exits.append(code)
        try:
            bench._install_signal_emitters(st)
            handler = _signal.getsignal(_signal.SIGTERM)
            handler(_signal.SIGTERM, None)
        finally:
            bench.os._exit = real_exit
            _signal.signal(_signal.SIGTERM, _signal.SIG_DFL)
            _signal.signal(_signal.SIGINT, _signal.default_int_handler)
        parsed = json.loads(capsys.readouterr().out.strip())
        assert parsed["partial"] is True
        assert "terminated_by_signal" in parsed["progress"]
        assert parsed["scaling_efficiency"] == round((1000.0 / 300.0) / 4, 3)
        assert exits == [128 + int(_signal.SIGTERM)]


class TestDrawSchedule:
    def test_order_prefers_hi_hunt_over_third_lo(self):
        # run-7 evidence (BASELINE.md): lo draws are stable (±1.4%)
        # while hi draws swing 2x — under budget pressure the extra-HI
        # hunt must come before the 3rd symmetric pair
        s = bench.draw_schedule(1, 4, reps=3, hi_extra=4)
        assert s == [
            (1, True), (4, True),          # mandatory pair
            (1, False), (4, False),        # second symmetric pair
            (4, False), (4, False), (4, False), (4, False),  # hi hunt
            (1, False), (4, False),        # third pair, last to go
        ]

    def test_minimal_schedule_is_just_the_mandatory_pair(self):
        assert bench.draw_schedule(1, 4, reps=1, hi_extra=0) == [
            (1, True), (4, True)]


class TestLegCostCap:
    def test_timeout_kills_process_group_and_returns_none(self, monkeypatch):
        """run-9 post-mortem: a leg at >2x its measured cost is a
        contention crater that can never win per-leg-best — the worker
        is killed (GROUP kill: SIGKILLing only the python driver would
        orphan its JVM child) and the draw discarded."""
        import subprocess as sp

        events = []

        class FakeProc:
            pid = 4242

            def communicate(self, timeout=None):
                events.append(("communicate", timeout))
                raise sp.TimeoutExpired(cmd="x", timeout=timeout)

            def wait(self):
                events.append(("wait",))

        monkeypatch.setattr(bench.subprocess, "Popen",
                            lambda *a, **kw: FakeProc())
        monkeypatch.setattr(bench.os, "killpg",
                            lambda pid, sig: events.append(("killpg", pid, sig)))
        out = bench._crawl_in_subprocess(4, 0.1, timeout=123.0)
        assert out is None
        assert ("communicate", 123.0) in events
        assert ("killpg", 4242, bench.signal.SIGKILL) in events
        assert ("wait",) in events

    def test_result_parsed_when_within_cap(self, monkeypatch):
        class FakeProc:
            pid = 1
            returncode = 0

            def communicate(self, timeout=None):
                return ('CRAWL_RESULT {"cores": 4, '
                        '"fetched_pages_per_sec": 900.0}', "")

        monkeypatch.setattr(bench.subprocess, "Popen",
                            lambda *a, **kw: FakeProc())
        out = bench._crawl_in_subprocess(4, 0.1, timeout=500.0)
        assert out == {"cores": 4, "fetched_pages_per_sec": 900.0}

    def test_artifact_counts_killed_legs(self, capsys):
        st = bench._BenchState(0.1, 1, 4)
        st.leg_timeouts = 2
        st.emit(progress="scaling")
        parsed = json.loads(capsys.readouterr().out.strip())
        assert parsed["legs_killed_at_cost_cap"] == 2
