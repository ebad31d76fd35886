"""Outage resilience of the bench orchestrator (VERDICT r4 item 1).

The axon relay's two observed failure modes — worker crashes (errors,
~1-2 min recovery) and relay outages (device calls HANG) — blanked the
round-4 driver record. These tests drive ``bench.orchestrate`` through
both, with a deliberate mid-run outage, and assert the record that the
driver would capture is complete, deduplicated, and in order.
"""
import json
import os
import subprocess
import sys
import time

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench


def _mk_emit():
    lines = []
    return lines, lambda line: lines.append(line)


def _rec(metric, value=1.0):
    return {"metric": metric, "value": value, "unit": "Msps/chip",
            "vs_baseline": 2.0}


GROUPS = [
    ("g1", None, ["m1"]),
    ("g2", None, ["m2a", "m2b"]),
    ("g3", None, ["m3"]),
]


def test_clean_run_lands_everything_once_in_order():
    lines, emit = _mk_emit()

    def run_child(name, timeout_s, on_record):
        for m in dict(GROUPS := {"g1": ["m1"], "g2": ["m2a", "m2b"],
                                 "g3": ["m3"]})[name]:
            r = _rec(m)
            on_record(r, json.dumps(r))
        return True, ""

    landed = bench.orchestrate(
        [("g1", None, ["m1"]), ("g2", None, ["m2a", "m2b"]),
         ("g3", None, ["m3"])],
        run_child=run_child, wait_for_relay=lambda d: True, emit=emit,
        budget_s=60, sleep=lambda s: None)
    metrics = [json.loads(l)["metric"] for l in lines]
    assert metrics == ["m1", "m2a", "m2b", "m3"]
    assert set(landed) == {"m1", "m2a", "m2b", "m3"}
    assert all("value" in json.loads(l) for l in lines)


def test_mid_run_outage_waits_and_completes():
    """The deliberate probe-kill: g2's first attempt hangs (timeout kill),
    the relay is down for the next two probes, then recovers; the retried
    attempt lands. The final record must be complete with NO error rows
    and no duplicate of g1's already-landed metric."""
    lines, emit = _mk_emit()
    state = {"g2_attempts": 0, "probes": 0}

    def run_child(name, timeout_s, on_record):
        if name == "g2":
            state["g2_attempts"] += 1
            if state["g2_attempts"] == 1:
                return False, "group 'g2' timed out after 10s (relay hang?)"
        for m in {"g1": ["m1"], "g2": ["m2a", "m2b"],
                  "g3": ["m3"]}[name]:
            r = _rec(m)
            on_record(r, json.dumps(r))
        return True, ""

    def wait_for_relay(deadline):
        state["probes"] += 1
        return True            # outage over by the time we re-probe

    landed = bench.orchestrate(
        [("g1", None, ["m1"]), ("g2", None, ["m2a", "m2b"]),
         ("g3", None, ["m3"])],
        run_child=run_child, wait_for_relay=wait_for_relay, emit=emit,
        budget_s=600, sleep=lambda s: None)
    metrics = [json.loads(l)["metric"] for l in lines]
    assert metrics == ["m1", "m2a", "m2b", "m3"]
    assert all("value" in json.loads(l) for l in lines)
    assert state["g2_attempts"] == 2
    assert set(landed) == {"m1", "m2a", "m2b", "m3"}


def test_partial_group_landing_not_duplicated_on_retry():
    """A child that lands m2a then dies: the retry re-emits both, but the
    orchestrator must forward m2a exactly once."""
    lines, emit = _mk_emit()
    state = {"attempts": 0}

    def run_child(name, timeout_s, on_record):
        state["attempts"] += 1
        r = _rec("m2a")
        on_record(r, json.dumps(r))
        if state["attempts"] == 1:
            return False, "worker crashed (UNAVAILABLE)"
        r = _rec("m2b")
        on_record(r, json.dumps(r))
        return True, ""

    bench.orchestrate([("g2", None, ["m2a", "m2b"])],
                      run_child=run_child, wait_for_relay=lambda d: True,
                      emit=emit, budget_s=600, sleep=lambda s: None)
    metrics = [json.loads(l)["metric"] for l in lines]
    assert metrics == ["m2a", "m2b"]


def test_deterministic_failure_bounded_and_reported():
    """A group that always fails while the relay is healthy must stop at
    max_healthy_attempts and emit ONE error row per missing metric —
    never eat the whole budget."""
    lines, emit = _mk_emit()
    state = {"attempts": 0}

    def run_child(name, timeout_s, on_record):
        if name == "bad":
            state["attempts"] += 1
            return False, "ValueError: deterministic bug"
        r = _rec("good_m")
        on_record(r, json.dumps(r))
        return True, ""

    bench.orchestrate(
        [("bad", None, ["bad_m"]), ("ok", None, ["good_m"])],
        run_child=run_child, wait_for_relay=lambda d: True, emit=emit,
        budget_s=600, max_healthy_attempts=3, sleep=lambda s: None)
    assert state["attempts"] == 3
    recs = [json.loads(l) for l in lines]
    by = {r["metric"]: r for r in recs}
    assert "value" in by["good_m"]          # later group still ran
    assert "deterministic bug" in by["bad_m"]["error"]
    assert sum(1 for r in recs if r["metric"] == "bad_m") == 1


def test_budget_exhausted_during_outage_reports_missing():
    """Relay never comes back: landed metrics stay, missing ones get
    honest error rows."""
    lines, emit = _mk_emit()

    def run_child(name, timeout_s, on_record):
        if name == "g1":
            r = _rec("m1")
            on_record(r, json.dumps(r))
            return True, ""
        return False, "group 'g2' timed out after 10s (relay hang?)"

    bench.orchestrate(
        [("g1", None, ["m1"]), ("g2", None, ["m2"]),
         ("g3", None, ["m3"])],
        run_child=run_child, wait_for_relay=lambda d: False, emit=emit,
        budget_s=600, sleep=lambda s: None)
    by = {json.loads(l)["metric"]: json.loads(l) for l in lines}
    assert "value" in by["m1"]
    assert "error" in by["m2"] and "timed out" in by["m2"]["error"]
    assert "error" in by["m3"]


def test_slow_phase_reading_remeasured_and_best_kept():
    """A reading far below the metric's sanity floor (relay slow phase:
    psk31 read 651 vs its usual ~18000 for one group of one run) must be
    re-measured after a cooldown; the eventual good reading is recorded,
    and the collapsed value never reaches the driver record."""
    lines, emit = _mk_emit()
    state = {"attempts": 0, "slept": []}

    def run_child(name, timeout_s, on_record):
        state["attempts"] += 1
        val = 651.6 if state["attempts"] == 1 else 18000.0
        r = _rec("psk31_roundtrip_throughput", val)
        on_record(r, json.dumps(r))
        return True, ""

    bench.orchestrate(
        [("psk31", None, ["psk31_roundtrip_throughput"])],
        run_child=run_child, wait_for_relay=lambda d: True, emit=emit,
        budget_s=600, sleep=lambda s: state["slept"].append(s))
    assert state["attempts"] == 2
    assert state["slept"]                     # cooled down before retry
    recs = [json.loads(l) for l in lines]
    assert len(recs) == 1 and recs[0]["value"] == 18000.0


def test_true_regression_still_recorded_as_best_subfloor():
    """Every measurement lands below the sanity floor (a real regression):
    after max_weather_retries the BEST sub-floor value is recorded — an
    honest (low) number, never an error row."""
    lines, emit = _mk_emit()
    state = {"attempts": 0}

    def run_child(name, timeout_s, on_record):
        state["attempts"] += 1
        r = _rec("fm_demod_chain_throughput", 900.0 + state["attempts"])
        on_record(r, json.dumps(r))
        return True, ""

    bench.orchestrate(
        [("fm", None, ["fm_demod_chain_throughput"])],
        run_child=run_child, wait_for_relay=lambda d: True, emit=emit,
        budget_s=600, sleep=lambda s: None)
    assert state["attempts"] == 3             # 1 + max_weather_retries
    recs = [json.loads(l) for l in lines]
    assert len(recs) == 1 and recs[0]["value"] == 903.0
    assert "error" not in recs[0]


def test_run_group_child_kills_hung_child():
    """The hang failure mode end-to-end: a child that never exits is
    killed at the timeout (exact PID, no pattern kill) and reported."""
    got = []
    t0 = time.time()
    ok, err = bench._run_group_child(
        "hang", 2.0, lambda rec, line: got.append(line),
        cmd=[sys.executable, "-c", "import time; time.sleep(60)"])
    assert not ok and "timed out" in err
    assert time.time() - t0 < 15
    assert got == []


def test_run_group_child_streams_records_and_reports_failure():
    """Child emits one good record then crashes: the record must be
    forwarded (landed mid-flight) and the failure reported with the
    stderr tail."""
    got = []
    code = ("import json, sys;"
            "print(json.dumps({'metric': 'mX', 'value': 1.0,"
            " 'unit': 'u', 'vs_baseline': 1.0}), flush=True);"
            "raise RuntimeError('boom')")
    ok, err = bench._run_group_child(
        "x", 30.0, lambda rec, line: got.append(rec["metric"]),
        cmd=[sys.executable, "-c", code])
    assert not ok and "boom" in err
    assert got == ["mX"]


def test_unknown_group_exits_nonzero():
    r = subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(os.path.dirname(
             os.path.abspath(__file__))), "bench.py"),
         "--only", "definitely_not_a_group"],
        capture_output=True, text=True, timeout=120)
    assert r.returncode != 0


def test_groups_registry_covers_all_floor_metrics():
    """Every family floor metric must be owned by exactly one group, so a
    regression in any family is driver-visible."""
    owned = [m for _, _, ms in bench.GROUPS for m in ms]
    assert len(owned) == len(set(owned))
    for m in bench._FAMILY_FLOORS:
        assert m in owned, m
