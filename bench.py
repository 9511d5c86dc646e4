#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Execution is forced with the noop sink (full computation, no driver
collect) — the honest end-to-end cost of each plan.
"""

from __future__ import annotations

import glob
import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from wnv_etl_lab2_spark import get_spark
from wnv_etl_lab2_spark import queries as q

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# timed repetitions per query (min is the primary stat; the median is
# also published). Overridable so the test suite can smoke the full
# harness contract in one pass.
RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))

# Headline set: the heaviest representative of each operator family.
HEADLINE = [
    "pricing_summary",            # wide agg scan
    "multiway_join_topk_revenue", # 3-way join + agg + top-k
    "groupby_agg",                # plain group-by
    "window_topk_per_group",      # ranking window
    "sessionize_events",          # window + agg on events
    "tumbling_window_batch",      # time bucketing
    "spray_targets",              # flagship spatial slice
    "spatial_buffer_erase",       # grid-bucketed distance anti-join
    "dedup_exact",                # hash dedup
    "ngram_jaccard_pairs",        # exact near-dup (inverted index)
    "dedup_minhash_lsh",          # MinHash LSH near-dup
    "ann_topk_bruteforce",        # exact vector top-k
    "embedding_neardup_pairs",    # blocked cosine pairs
    "polygon_clip_area",          # HOF polygon overlay (round 2)
    "tfidf_top_terms",            # tokenize + 2 aggs + window (round 2)
    "winnow_fingerprints",        # rolling-hash fingerprint map (round 2)
    "decontamination_overlap",    # cross-corpus gram semi-join (round 2)
    "embedding_centroid_stats",   # posexplode + combinable centroid aggs (round 2)
    "doc_chunking",               # fixed-window token explode (round 2)
    "gap_fill_locf",              # per-key grid + LOCF window (round 2)
    "ngram_counts_top",           # corpus bigram counts + TakeOrdered (round 2)
    "corpus_curation_stats",      # E2E quality + near-dup yield sheet (round 2)
    "event_funnel",               # conditional-min funnel, one groupBy (round 2)
    "repeated_span_removal",      # C4-style cross-doc span dedup (round 2)
    "knn_join_bruteforce",        # batched query-set top-k, broadcast scan (round 2)
    "containment_pairs",          # Broder containment over capped inverted index (round 4)
    "incremental_dedup_new_docs", # new-batch anti-join vs corpus dedup index (round 4)
    "pareto_frontier_curation",   # two-phase merge-associative skyline (round 4)
    "dedup_simhash",              # shuffle-free Arrow bit-count kernel (round 5)
    "concave_zone_clip",          # concave overlay via signed fan decomposition (round 5)
    "holed_zone_clip",            # polygon-with-holes overlay, winding additivity (round 6)
    "bm25_topk",                  # lexical retrieval: tf/df/avgdl + rounded top-k (round 6)
    "unigram_logprob_quality",    # corpus LM scoring via broadcast vocab join (round 6)
    "pii_scrub",                  # regex PII detect + global mask, scan-fused pure map (round 7)
    "hard_negative_mining",       # cross-label top-k near-misses, broadcast anchors (round 7)
    "dsir_importance_weights",    # DSIR log-ratio scoring via broadcast bucket model (round 7)
    "fuzzy_prefix_pairs",         # blocked fuzzy join: banded levenshtein over opener blocks (round 8)
    "token_drift_top_contributors",  # per-source KL drift decomposition (round 9)
    "embedding_covariance_int8",  # exact-integer Gram/covariance, constant-key agg (round 9)
    "logreg_gd_steps",            # 2 GD steps, gradient-as-combinable-aggregate (round 10)
    "source_similarity_matrix",   # per-source tf-idf cosine matrix, word-keyed pair join (round 10)
    "embedding_pca_power_iteration",  # Gram as 4096-key agg + in-plan power iteration (round 10)
    "chi2_token_source",          # token x source contingency chi2, bounded grid (round 11)
    "embedding_quantize_perdim",  # per-dim int8 calibration, 2 passes + d-row shuffle (round 11)
    "ann_topk_ivfpq",             # IVFADC residual code scan, zero-shuffle pure map (round 12)
    "partitioned_table_lifecycle",  # hive-partitioned DML + pruned reads, path-as-metadata (round 13)
    "type_widening_lifecycle",    # metadata-only ALTER COLUMN TYPE + mixed-generation widened read (round 14)
]
# Round-14 registrations deliberately NOT in the headline set:
# substring_dedup_spans is the third declared exact-pair floor
# (quarantined family — SCALE_SMOKE gates it per-unit instead, 0.54
# vs 1.0), and replace_deep_clone_lifecycle's wall is a corpus copy
# job (deep clone) whose timing measures IO volume, not a plan shape
# worth regression-tracking per round. Both are driver-evidenced.
# Round-15/16 lifecycle registrations follow the same rule: their
# walls are dominated by commit machinery and table IO (N appends,
# vacuum, tokenizer training EM), not by a query plan whose shape a
# min-of-5 regression gate protects. All are driver-evidenced each
# round they enter the window, and tokenizer_roundtrip additionally
# carries a SCALE_SMOKE per-unit x16 gate (0.5).


# Declared per-query wall bounds at sf0.1 (round-7 verdict #3): the
# exact-pair backbone accepts a measured local-CPU-for-network-bytes
# trade — round 8 switched the session to zstd shuffle compression
# (matching the cluster_conf 100 TB profile; MEASUREMENTS.md shuffle
# volume fell 44%/42% -> 29%/24% of the corpus on these two queries
# and roughly halved repo-wide), which costs ~0.2-0.3 s of compression
# CPU per pair query locally where there is no network to win back.
# The A/B (lz4 1.80/1.59 s vs zstd 2.15/1.82 s, min-of-5, r8) and the
# zstd-level sweep (negative "fast" levels compress barely better
# than lz4) are recorded in the round-8 work log; these bounds pin
# the accepted ceiling so any FURTHER slide fails the bench gate
# loudly instead of hiding inside the trade's noise.
DECLARED_WALL_BOUNDS_SF01 = {
    "ngram_jaccard_pairs": 2.40,
    "containment_pairs": 2.10,
    # broadcast-join-heavy TPC-H shape: shuffle is 19 KB (digest-only)
    # but the codec also compresses every broadcast build, and its r7
    # baseline (0.634 s) is a pre-zstd number with ±0.1 s session
    # noise on top — the 1.5x relative gate sat inside the noise band.
    # Declared ceiling instead: measured 0.75-0.98 across r8 sessions.
    "multiway_join_topk_revenue": 1.10,
    # the routed production near-dup path slid +0.347 s in the r8
    # bench (1.53 -> 1.88). The r9 isolated A/B on THIS query at sf0.1
    # (min-of-5: zstd 1.526 vs lz4 1.405) attributes ~0.12 s to the
    # codec; the remaining ~0.23 s is in-bench session pressure
    # (isolated singles always run under the interleaved in-bench
    # numbers — see .claude/skills/verify gotchas). Ceiling = r8
    # in-bench min + ~12% headroom; a second zstd-sized slide now
    # fails the gate loudly instead of hiding under the 1.5x band.
    "dedup_minhash_lsh": 2.10,
}

_PAIR_RE = re.compile(r'"([a-z0-9_]+)": (-?[0-9.]+)')


def _calibration() -> dict[str, float]:
    """Spark-free single-thread host-speed probe, recorded in the
    bench JSON every round (r10). Purpose: this bench runs inside a
    VM whose host contention is invisible from the guest — r10
    measured EVERY query (including zero-shuffle single-stage plans
    with byte-identical physical plans and unchanged MEASUREMENTS.md
    shuffle volume) uniformly ~1.4-1.7x slower than the r9 recording
    across three sessions hours apart. A fixed CPU workload separates
    'the machine got slower' from 'a plan got worse': compare
    calib values across rounds before reading per-query deltas.
    min-of-5 of (a) a numpy matmul (BLAS/SIMD speed) and (b) a pure
    Python arithmetic loop (interpreter speed)."""
    import numpy as np

    rng = np.random.RandomState(0)
    a = rng.rand(512, 512)
    mm = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(8):
            a = 0.5 * (a @ a) / np.linalg.norm(a)
        mm.append(time.perf_counter() - t0)
    py = []
    for _ in range(5):
        t0 = time.perf_counter()
        acc = 0
        for i in range(2_000_000):
            acc += i * i
        py.append(time.perf_counter() - t0)
    return {
        "numpy_matmul_sec": round(min(mm), 4),
        "python_loop_sec": round(min(py), 4),
    }


def _previous_calibration() -> dict[str, float] | None:
    """The newest prior round's recorded Spark-free calibration probe
    (r11, closing the r10 ADVICE loop): host_shift_ratio is derived
    from the benched queries' own t/prev ratios, so a uniform GENUINE
    regression is indistinguishable from host contention by that
    statistic alone — the calibration probe measures machine speed
    independently of any plan, and comparing this round's probe to the
    newest recorded one bounds how much machine slowdown actually
    happened. Returns None when no prior round recorded a probe
    (pre-r10 history)."""
    here = os.path.dirname(os.path.abspath(__file__))
    rounds = []
    for path in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if m:
            rounds.append((int(m.group(1)), path))
    for _, path in sorted(rounds, reverse=True):  # newest first
        try:
            with open(path) as f:
                doc = json.load(f)
        except (OSError, ValueError):
            continue
        parsed = doc.get("parsed", doc)
        calib = parsed.get("calibration") if isinstance(parsed, dict) else None
        if calib is None:
            # driver-truncated round (parsed: null): the probe is a
            # tiny fixed-shape object that survives in the recorded
            # tail — reconstruct it exactly like _previous_round_timings
            # reconstructs per-query mins
            m = re.search(r'"calibration": \{([^}]*)\}', doc.get("tail") or "")
            if m:
                calib = {k: float(v) for k, v in _PAIR_RE.findall(m.group(1))}
        if calib and all(
            calib.get(k, 0) > 0 for k in ("numpy_matmul_sec", "python_loop_sec")
        ):
            return {k: float(v) for k, v in calib.items()}
    return None


def _previous_round_timings() -> tuple[dict[str, float], dict[str, float]]:
    """Per-query baseline timings, TWO views over every
    BENCH_r{N}.json next to this script:

    - ``prev`` (first return): newest round winning — the
      round-over-round comparison base for delta_vs_prev and the
      host-normalized relative gate (round-6 verdict #7: carry
      first-round numbers forward).
    - ``hist_min`` (second return): the all-time per-query MIN — the
      re-basing-proof base for the ABSOLUTE backstop (round 15, r14
      verdict #2b): because ``prev`` re-bases every round, N
      consecutive host-shift-absorbed +9% rounds would compound to
      +30% raw with ``regressions: []`` each time; the all-time min
      never re-bases, so drift past the fixed ceiling always flags.

    A round whose JSON line was truncated by the driver records
    ``parsed: null`` plus the literal ``tail`` of the line; such a
    round is RECONSTRUCTED instead of skipped: (a) any per-query pairs
    intact in the tail's min-``queries`` fragment, (b) exact mins via
    that round's ``delta_vs_prev`` added to the prior rounds' mins
    (delta = min - prev_min, both knowns), (c) ``queries_median`` as
    the last-resort stand-in for anything else — a slight upward bias
    the 1.5x regression gate tolerates for one round. Missing/garbled
    history -> empty dict."""
    here = os.path.dirname(os.path.abspath(__file__))
    rounds = []
    for path in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if m:
            rounds.append((int(m.group(1)), path))
    acc: dict[str, float] = {}
    hist_min: dict[str, float] = {}
    # truncated-round tail reconstruction can sweep the calibration
    # probe's pairs in with the per-query mins; they are not queries
    _NOT_QUERIES = {"numpy_matmul_sec", "python_loop_sec"}

    def _fold_min(vals: dict[str, float]) -> None:
        for k, v in vals.items():
            if k not in _NOT_QUERIES:
                hist_min[k] = min(hist_min.get(k, v), v)

    for _, path in sorted(rounds):  # oldest -> newest; newest overwrites
        try:
            with open(path) as f:
                doc = json.load(f)
        except (OSError, ValueError):
            continue
        parsed = doc.get("parsed", doc)
        if isinstance(parsed, dict) and parsed.get("queries"):
            vals = {k: float(v) for k, v in parsed["queries"].items()}
            acc.update(vals)
            _fold_min(vals)
            continue
        tail = doc.get("tail") or ""
        if not tail:
            continue
        recon: dict[str, float] = {}
        # the min-`queries` fragment is everything before the FIRST
        # post-queries marker actually present in the tail; a tail
        # truncated past `queries_median` (round 7's shape) still has
        # `"stat"` / `"delta_vs_prev"`, and scanning past those would
        # load delta values (including negatives) as absolute baselines
        head = tail
        for marker in ('"queries_median"', '"stat"', '"delta_vs_prev"'):
            head = head.split(marker)[0]
        recon.update(
            {
                k: float(v)
                for k, v in _PAIR_RE.findall(head)
                if k not in _NOT_QUERIES
            }
        )
        mm = re.search(r'"delta_vs_prev": \{([^}]*)\}', tail)
        if mm:
            for k, v in _PAIR_RE.findall(mm.group(1)):
                if k in acc and k not in recon:
                    recon[k] = round(acc[k] + float(v), 3)
        med = re.search(r'"queries_median": \{([^}]*)\}', tail)
        if med:
            for k, v in _PAIR_RE.findall(med.group(1)):
                recon.setdefault(k, float(v))
        acc.update(recon)
        _fold_min(recon)
    return acc, hist_min


def main() -> None:
    spark = get_spark(app_name="wnv-etl-lab2-bench", cpus=CPUS, shuffle_partitions=CPUS)
    q._ensure_loaded()

    # warm JVM/codegen for every headline plan shape at the smallest
    # available SF so the timed runs measure steady-state plan cost,
    # not first-call JIT/class-loading (standard JVM benchmarking
    # practice); fall back to the target dir itself if the tiny SF
    # isn't present in this environment
    warm_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_dir):
        warm_dir = SF_DIR
    for name in HEADLINE:
        q.REGISTRY[name].fn(spark, warm_dir).write.mode("overwrite").format("noop").save()
    # one untimed pass at the TARGET SF: the first sf0.1 execution of
    # each plan pays one-off costs the tiny-SF warm can't cover (AQE
    # runtime statistics, scan-partition listing, codegen for
    # size-dependent plan variants), which otherwise land entirely on
    # the first timed sample and inflate single-run results
    for name in HEADLINE:
        q.REGISTRY[name].fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()

    # min over RUNS timed passes per query: steady-state plan cost,
    # robust to one-off GC/JIT spikes (the plans are deterministic;
    # variance is JVM noise, not data — measured ~±20% between single
    # runs, so the noise floor — the min — is the most reproducible
    # statistic; the median is published alongside so the spread is
    # visible in the artifact). The passes are INTERLEAVED — every
    # query once, then the whole list again — so session-level
    # pressure (heap growth, codegen-cache churn over ~30 plans)
    # lands on every query's sample set instead of only on whichever
    # queries run late; per-query deltas across rounds stay
    # attributable to code. `delta_vs_prev` compares min to prior
    # rounds' min — same statistic, same protocol, since round 3.
    samples: dict[str, list[float]] = {name: [] for name in HEADLINE}
    for _ in range(RUNS):
        for name in HEADLINE:
            fn = q.REGISTRY[name].fn
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
            samples[name].append(time.perf_counter() - t0)
    timings = {name: round(min(runs), 3) for name, runs in samples.items()}
    medians = {
        name: round(statistics.median(runs), 3) for name, runs in samples.items()
    }

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    prev, hist_min = _previous_round_timings()
    out = {
        "metric": "headline_queries_total_wall",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "queries_median": medians,
        "stat": f"min_of_{RUNS}",
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    out["calibration"] = _calibration()
    if prev:
        out["delta_vs_prev"] = {
            name: round(t - prev[name], 3) for name, t in timings.items() if name in prev
        }
        out["prev_total"] = round(sum(prev.values()), 3)
        # HOST-SPEED NORMALIZATION (r10): the per-query gates compare
        # wall times recorded on different days of a shared-host VM.
        # r10 measured a uniform ~1.4-1.7x slowdown on EVERY query —
        # including zero-shuffle single-stage plans whose physical
        # plans and shuffle bytes are byte-identical to r9's — i.e. a
        # machine shift, not a plan shift. The MEDIAN of t/prev across
        # all shared queries estimates that shift robustly (one truly
        # regressed query cannot move the median of ~40); the gates
        # then flag only queries that slide BEYOND the session-wide
        # shift. The ratio, the raw timings, and both raw and
        # effective bounds are all recorded here so the adjudication
        # is auditable; a host FASTER than baseline clamps to 1.0
        # (gates never loosen below their declared values).
        ratios = sorted(
            t / prev[name]
            for name, t in timings.items()
            if name in prev and prev[name] > 0.05
        )
        host_shift = 1.0
        if len(ratios) >= 10:
            host_shift = max(1.0, round(statistics.median(ratios), 3))
        out["host_shift_ratio"] = host_shift
        # CALIBRATION CROSS-CHECK (r11, r10 ADVICE medium): the
        # query-derived shift above cannot tell a uniform genuine
        # regression from host contention — both move every ratio
        # equally. The Spark-free probe can: its ratio vs the newest
        # recorded probe is the independently-measured machine
        # slowdown, and the gates may relax AT MOST that far (x1.1
        # cross-probe tolerance: the probes measure BLAS/interpreter
        # speed while the queries run on the JVM, so small divergence
        # is expected; a query-shift beyond it is flagged as a
        # suspected framework-wide regression, not absorbed).
        calib_prev = _previous_calibration()
        calib_shift = None
        if calib_prev is not None:
            calib_ratios = [
                out["calibration"][k] / calib_prev[k]
                for k in ("numpy_matmul_sec", "python_loop_sec")
                if calib_prev.get(k, 0) > 0
            ]
            calib_shift = max(1.0, round(max(calib_ratios), 3))
        out["calibration_prev"] = calib_prev
        out["calibration_shift_ratio"] = calib_shift
        if calib_shift is not None:
            cap = round(calib_shift * 1.1, 3)
            out["host_shift_exceeds_calibration"] = host_shift > cap
            host_shift_gate = min(host_shift, cap)
        else:
            out["host_shift_exceeds_calibration"] = False
            host_shift_gate = host_shift
        # every gate below uses the CAPPED shift
        out["host_shift_gate"] = host_shift_gate
        host_shift = host_shift_gate
        # regression gate: flag (don't fail — the driver still needs
        # the JSON line) any query that slowed >1.5x (host-adjusted)
        # vs the best prior round; an empty list is the expected
        # state. Queries with a DECLARED bound (the pinned ceiling of
        # the r8 zstd shuffle-bytes trade, DECLARED_WALL_BOUNDS_SF01)
        # are judged against that absolute ceiling (host-adjusted)
        # INSTEAD of the relative gate — but only at sf0.1, where the
        # bounds were measured; at any other SF the absolute numbers
        # don't apply, so the pinned queries fall back to the
        # relative gate like everything else (r8 advisory: no query
        # may ever be gate-free).
        rel_exempt = set(DECLARED_WALL_BOUNDS_SF01) if out["sf"] == 0.1 else set()
        out["regressions"] = sorted(
            {
                name
                for name, t in timings.items()
                if name not in rel_exempt
                and name in prev
                and prev[name] > 0.05
                and t > 1.5 * host_shift * prev[name]
            }
            | {
                name
                for name, bound in DECLARED_WALL_BOUNDS_SF01.items()
                if out["sf"] == 0.1 and timings.get(name, 0.0) > bound * host_shift
            }
        )
        out["declared_bounds"] = DECLARED_WALL_BOUNDS_SF01
        out["declared_bounds_effective"] = {
            name: round(bound * host_shift, 3)
            for name, bound in DECLARED_WALL_BOUNDS_SF01.items()
        }
        # informational: raw-bound exceedances even when inside the
        # host-adjusted ceiling, so a shift never SILENTLY absorbs one
        out["bounds_exceeded_raw"] = sorted(
            name
            for name, bound in DECLARED_WALL_BOUNDS_SF01.items()
            if out["sf"] == 0.1 and timings.get(name, 0.0) > bound
        )
        # ABSOLUTE BACKSTOP (round 15, r14 verdict #2b): the relative
        # gate re-bases on the NEWEST prior round and normalizes by the
        # session's host shift, so consecutive absorbed shifts could
        # compound raw drift past the driver's 2x rule with
        # regressions:[] every round. This gate is immune to both
        # mechanisms by construction: RAW time (never normalized)
        # against the ALL-TIME per-query min (never re-based) at a
        # fixed 1.8x ceiling — inside the driver's 2x rule with margin.
        # Declared-bound queries are exempt: their ceilings are already
        # absolute raw numbers that never re-base (bounds_exceeded_raw
        # reports them), so the backstop would only double-count. A
        # genuine host-contention day can trip this loudly — that is
        # the point: near the driver's own 2x ceiling, the round must
        # adjudicate in the open instead of auto-absorbing.
        out["backstop_ceiling_x"] = 1.8
        backstop_exceeded = sorted(
            name
            for name, t in timings.items()
            if out["sf"] == 0.1
            and name not in DECLARED_WALL_BOUNDS_SF01
            and hist_min.get(name, 0.0) > 0.05
            and t > 1.8 * hist_min[name]
        )
        out["backstop_exceeded_raw"] = backstop_exceeded
        out["regressions"] = sorted(
            set(out["regressions"]) | set(backstop_exceeded)
        )
    # cross-session canary (r11, r10 verdict #8): one mid-weight query
    # recorded raw AND normalized by the gate shift every round, so a
    # real plan regression in it can never hide inside a claimed host
    # shift — the normalized number must stay flat across rounds.
    canary = "tfidf_top_terms"
    shift = out.get("host_shift_gate", 1.0)
    out["canary"] = {
        "query": canary,
        "raw_sec": timings.get(canary),
        "normalized_sec": (
            round(timings[canary] / shift, 3) if canary in timings else None
        ),
    }
    # Output protocol (round 18, r17 verdict #2): the FINAL line
    # carries only the driver contract's keys
    # {"metric","value","unit","queries","stat","sf"} so it always
    # fits the driver's bounded tail capture — the r16 line (queries +
    # medians + deltas + gate state, several KB) overflowed that
    # window and nulled the whole PERF round-over-round comparison.
    # Everything else (medians, deltas, calibration, gate state) is
    # printed as its own JSON line IMMEDIATELY BEFORE, where the tail
    # window usually still captures it and tools that want it can
    # parse it; nothing was removed, only split.
    final_keys = ("metric", "value", "unit", "queries", "stat", "sf")
    diag = {k: v for k, v in out.items() if k not in final_keys}
    print(json.dumps({"diag": diag}))
    print(json.dumps({k: out[k] for k in final_keys if k in out}))


if __name__ == "__main__":
    main()
