"""The driver runs `python bench.py` once per round and parses its
LAST stdout line as JSON — pin that contract (one line, required keys,
every headline query present and registered) so a refactor can't
silently break the round artifact."""

from __future__ import annotations

import json
import os
import subprocess
import sys


def test_bench_emits_contract_json(sf_dir):
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=sf_dir,  # smallest SF the fixture provides
        SPARK_GRAFT_CPUS="8",
        SPARK_GRAFT_BENCH_RUNS="1",
    )
    out = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
        capture_output=True,
        text=True,
        timeout=540,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = out.stdout.strip().splitlines()
    final = json.loads(lines[-1])
    assert final["metric"] == "headline_queries_total_wall"
    assert final["unit"] == "sec"
    assert final["value"] > 0
    from bench import HEADLINE

    assert set(final["queries"]) == set(HEADLINE)
    assert all(v >= 0 for v in final["queries"].values())
    # r18 output protocol (r17 verdict #2): the FINAL line carries ONLY
    # the driver-contract keys so it always fits the driver's bounded
    # tail capture; diagnostics (medians, deltas, calibration, gate
    # state) move to the preceding {"diag": ...} line. Pin both halves.
    assert set(final) <= {"metric", "value", "unit", "queries", "stat", "sf"}
    assert len(json.dumps(final)) < 2800  # stays inside the tail window
    doc = json.loads(lines[-2])["diag"]
    assert set(doc["queries_median"]) == set(HEADLINE)
    # host-speed probe present every round (r10): the adjudication
    # record for cross-session machine drift
    assert doc["calibration"]["numpy_matmul_sec"] > 0
    assert doc["calibration"]["python_loop_sec"] > 0
    # regression report present whenever history exists
    if "delta_vs_prev" in doc:
        assert isinstance(doc["regressions"], list)
        assert doc["host_shift_ratio"] >= 1.0
        assert set(doc["declared_bounds_effective"]) == set(doc["declared_bounds"])
        assert isinstance(doc["bounds_exceeded_raw"], list)
        # calibration cross-check (r11): the gate shift is capped by
        # the independently-measured machine slowdown; both sides of
        # the adjudication are in the artifact
        assert "calibration_shift_ratio" in doc
        assert "host_shift_exceeds_calibration" in doc
        assert doc["host_shift_gate"] <= doc["host_shift_ratio"]
        if doc["calibration_shift_ratio"] is not None:
            assert (
                doc["host_shift_gate"]
                <= round(doc["calibration_shift_ratio"] * 1.1, 3) + 1e-9
            )
        # absolute backstop (round 15, r14 verdict #2b): raw times vs
        # the all-time per-query min at a fixed non-normalized ceiling,
        # present in the artifact whenever history exists; exceedances
        # surface in the loud regressions list, never silently
        assert doc["backstop_ceiling_x"] == 1.8
        assert isinstance(doc["backstop_exceeded_raw"], list)
        assert set(doc["backstop_exceeded_raw"]) <= set(doc["regressions"])
    # cross-session canary (r11): raw AND normalized, every round
    assert doc["canary"]["query"] == "tfidf_top_terms"
    assert doc["canary"]["raw_sec"] > 0
    assert doc["canary"]["normalized_sec"] > 0


def test_headline_queries_are_registered():
    from bench import HEADLINE
    import wnv_etl_lab2_spark.queries as q

    q._ensure_loaded()
    missing = [n for n in HEADLINE if n not in q.REGISTRY]
    assert not missing, f"bench names unregistered queries: {missing}"


def test_delta_baseline_covers_every_previously_benched_headliner():
    """Regression tracking must cover every headline query that has
    EVER appeared in a BENCH round — including ones whose only record
    is a round the driver truncated (parsed: null), which the baseline
    merger reconstructs from the recorded tail (round-6 verdict #7).
    Queries first joining HEADLINE this round legitimately have no
    baseline until their first bench run records one."""
    import glob
    import re

    from bench import HEADLINE, _previous_round_timings

    prev, hist_min = _previous_round_timings()
    if not prev:  # fresh checkout with no BENCH history
        return
    # the two views cover the same queries, and the all-time min can
    # never exceed the newest-wins value (round 15: absolute backstop)
    assert set(hist_min) == set(prev)
    assert all(hist_min[k] <= prev[k] + 1e-9 for k in prev)
    # calibration probe keys are machine stats, not queries — they
    # must never pollute either baseline view (they'd distort
    # prev_total and could gate on a non-query)
    assert not {"numpy_matmul_sec", "python_loop_sec"} & set(prev)
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    seen: set[str] = set()
    for path in glob.glob(os.path.join(here, "BENCH_r*.json")):
        with open(path) as f:
            blob = f.read()
        seen.update(re.findall(r'"([a-z0-9_]+)": -?[0-9.]+', blob))
    missing = [n for n in HEADLINE if n in seen and n not in prev]
    assert not missing, f"benched headliners with no delta baseline: {missing}"
    assert all(v > 0 for v in prev.values())


def test_declared_wall_bounds_cover_the_zstd_trade():
    """Round 8 accepted a measured local-wall-for-wire-bytes trade
    (zstd shuffle codec matching the cluster profile) on the exact-pair
    backbone; the accepted ceiling must stay DECLARED so a further
    slide trips the bench gate instead of hiding inside the trade.
    Every pinned query must exist, be registered, and carry a bound
    above its r8 measured wall but tight enough to catch another
    +15-25% slide; pinned queries trade the (stale, pre-zstd) relative
    gate for this absolute ceiling."""
    from bench import DECLARED_WALL_BOUNDS_SF01
    import wnv_etl_lab2_spark.queries as q

    q._ensure_loaded()
    assert set(DECLARED_WALL_BOUNDS_SF01) == {
        "ngram_jaccard_pairs",
        "containment_pairs",
        "multiway_join_topk_revenue",
        # r9: the routed near-dup path, pinned after the r9 isolated
        # A/B attributed ~0.12 s of its r8 slide to the codec (verdict
        # task 3 — ceiling catches any further unexplained slide)
        "dedup_minhash_lsh",
    }
    for name, bound in DECLARED_WALL_BOUNDS_SF01.items():
        assert name in q.REGISTRY
        assert 0 < bound <= 2.5, f"{name}: bound {bound} drifted loose"
