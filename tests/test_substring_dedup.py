"""Exact substring dedup (round 14): `verbatim_span_pairs` finds
cross-doc verbatim spans with exact boundaries regardless of
frequency, and `strip_verbatim_spans` removes them from the later doc
(keep-first), converging to a span-free corpus."""

from __future__ import annotations

import pytest

from wnv_etl_lab2_spark.operators.substring import (
    strip_verbatim_spans,
    verbatim_span_pairs,
)

COPIED = "the quick brown fox jumps over the lazy dog near the river bank"
# 64 chars — one planted duplicated paragraph


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_finds_planted_span_with_exact_boundaries(spark):
    a = "AAAA lorem ipsum dolor sit amet " + COPIED + " tail of doc a here"
    b = "totally different opening text then " + COPIED + " and more words"
    docs = _docs(spark, [(1, a), (2, b), (3, "unrelated filler " * 8)])
    spans = verbatim_span_pairs(docs, k=20, min_len=40).collect()
    assert len(spans) == 1
    s = spans[0]
    assert (s.doc_a, s.doc_b) == (1, 2)
    assert s.span_len >= len(COPIED)
    # the reported window contains the planted copy at the right spot
    assert a[s.start_a - 1 : s.start_a - 1 + s.span_len] == (
        b[s.start_b - 1 : s.start_b - 1 + s.span_len]
    )
    assert COPIED in a[s.start_a - 1 : s.start_a - 1 + s.span_len]


def test_low_frequency_pair_is_found_unlike_df_threshold_ops(spark):
    """The family's defining property: ONE pair sharing a span is
    enough — no corpus-frequency threshold involved."""
    rows = [(i, f"unique text number {i} " * 6) for i in range(10)]
    rows.append((100, "prefix one " + COPIED))
    rows.append((101, "prefix two " + COPIED))
    spans = verbatim_span_pairs(_docs(spark, rows), k=20, min_len=40).collect()
    assert {(s.doc_a, s.doc_b) for s in spans} == {(100, 101)}


def test_short_overlaps_below_min_len_ignored(spark):
    shared20 = "twenty characters ab"  # exactly 20 — below min_len=40
    docs = _docs(
        spark,
        [(1, "x " * 10 + shared20 + " y " * 10), (2, shared20 + " z " * 15)],
    )
    assert verbatim_span_pairs(docs, k=20, min_len=40).count() == 0


def test_df_cap_drops_boilerplate_grams(spark):
    """A span shared by MORE than max_df docs is boilerplate by the
    declared cap contract and emits nothing."""
    rows = [(i, f"opener {i} " + COPIED) for i in range(12)]
    spans = verbatim_span_pairs(
        _docs(spark, rows), k=20, min_len=40, max_df=8
    )
    assert spans.count() == 0
    # raise the cap and the pairs appear
    assert verbatim_span_pairs(
        _docs(spark, rows), k=20, min_len=40, max_df=16
    ).count() == 12 * 11 // 2


def test_strip_removes_span_from_later_doc_and_converges(spark):
    a = "AAAA lorem ipsum dolor sit amet " + COPIED + " tail of doc a here"
    b = "totally different opening text then " + COPIED + " and more words"
    docs = _docs(spark, [(1, a), (2, b)])
    spans = verbatim_span_pairs(docs, k=20, min_len=40)
    cleaned = strip_verbatim_spans(docs, spans)
    out = {r.doc_id: r.text for r in cleaned.collect()}
    assert out[1] == a  # keep-first: the earlier doc is untouched
    assert COPIED not in out[2]
    # non-span text survives around the cut
    assert out[2].startswith("totally different opening text then")
    # convergence: re-running the finder on the cleaned corpus is empty
    assert verbatim_span_pairs(cleaned, k=20, min_len=40).count() == 0


def test_strip_merges_overlapping_spans(spark):
    """Two overlapping reported intervals on one doc cut as their
    union (the forward-cursor rebuild)."""
    docs = _docs(spark, [(7, "abcdefghijklmnopqrstuvwxyz")])
    spans = spark.createDataFrame(
        [(1, 7, 1, 3, 8), (1, 7, 1, 6, 10)],
        "doc_a long, doc_b long, start_a long, start_b long, span_len long",
    )
    out = strip_verbatim_spans(docs, spans).collect()[0].text
    # [3, 11) and [6, 16) merge to [3, 16): keep positions 1-2 and 16-26
    assert out == "ab" + "pqrstuvwxyz"


def test_min_len_below_k_refused(spark):
    with pytest.raises(ValueError, match="min_len"):
        verbatim_span_pairs(_docs(spark, [(1, "abc")]), k=20, min_len=10)


def test_prehash_df_pass_equals_exact_on_corpus(spark, sf_dir):
    """The 100 TB knob: keying the df pass on xxhash64(gram) instead
    of the gram string produces identical spans on the corpus (pair
    seeds still require real gram equality, so collisions can never
    fabricate a span; the 2^-64 cap-side false-negative risk is the
    documented trade)."""
    from wnv_etl_lab2_spark.sources.catalog import load_table

    d = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    exact = sorted(
        map(tuple, verbatim_span_pairs(d, k=20, min_len=40).collect())
    )
    hashed = sorted(
        map(
            tuple,
            verbatim_span_pairs(d, k=20, min_len=40, prehash=True).collect(),
        )
    )
    assert exact == hashed and len(exact) > 0


def test_max_occ_per_doc_bounds_repetition_blowup(spark):
    """The degenerate-repetition guard: a gram repeated o times per
    doc seeds o^2 pairs; the occurrence cap bounds that while still
    finding the span through the earliest occurrences."""
    run = "zxqj " * 60  # 300-char repetition run shared by both docs
    docs = _docs(spark, [(1, "alpha " + run), (2, "omega " + run)])
    a, b = "alpha " + run, "omega " + run
    exact = verbatim_span_pairs(docs, k=20, min_len=40)
    capped = verbatim_span_pairs(docs, k=20, min_len=40, max_occ_per_doc=8)
    assert exact.count() > 0 and capped.count() > 0
    # every capped-mode span is still a TRUE verbatim match (the cap
    # drops witnesses, it never fabricates); span COUNTS are not
    # comparable — capping fragments long periodic runs
    for s in capped.collect():
        assert (
            a[s.start_a - 1 : s.start_a - 1 + s.span_len]
            == b[s.start_b - 1 : s.start_b - 1 + s.span_len]
        )
    # the cap did its job: far fewer pair seeds entered the join than
    # the ~56^2-per-gram exact blowup (observable as spans touching
    # only the run's HEAD positions)
    assert max(s.start_b for s in capped.collect()) < 60  # head-only witnesses
