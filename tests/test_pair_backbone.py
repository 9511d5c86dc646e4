"""Randomized ground truth for the prefix-filtered exact-pair backbone
(queries/text_q._capped_pair_counts, round-6 rebuild): the AllPairs
prefix lemma, the PPJoin positional filter, and the bit-packed posting
encoding must lose NO qualifying pair and must report exact
(inter, na, nb) — checked against an independent brute-force
implementation on corpora with planted near-dups, excerpts
(containment pairs), and heavy stop-shingle mass."""

from __future__ import annotations

import pytest


def _brute_force_pairs(texts, cap):
    """Independent reference for the backbone's semantics: df-cap on
    word-3-shingles, capped set sizes, exact intersections."""
    sets = {}
    for doc_id, text in texts:
        ws = text.split(" ")
        if len(ws) < 3:
            continue
        sets[doc_id] = {" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)}
    df = {}
    for s in sets.values():
        for sh in s:
            df[sh] = df.get(sh, 0) + 1
    capped = {d: {sh for sh in s if df[sh] <= cap} for d, s in sets.items()}
    out = {}
    ids = sorted(capped)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(capped[a] & capped[b])
            if inter >= 1:
                out[(a, b)] = (inter, len(capped[a]), len(capped[b]))
    return out


@pytest.mark.parametrize("floor_kind", ["jaccard", "containment"])
def test_capped_pair_counts_random_corpora(spark, tmp_path, floor_kind):
    """On 3 seeded random corpora: every pair meeting the floor comes
    back (recall of the lossless filters), and every returned pair
    carries exact brute-force counts (soundness of the packed
    positional arithmetic)."""
    import random

    from wnv_etl_lab2_spark.queries.text_q import _DF_CAP, _capped_pair_counts

    rng = random.Random(20260814 + (floor_kind == "containment"))
    vocab = [f"w{i}" for i in range(40)]
    boiler = "the common header line that repeats forever and ever again"
    for trial in range(3):
        texts = []
        doc_id = 0
        for _ in range(30):
            n = rng.randint(1, 30)
            base = " ".join(rng.choice(vocab) for _ in range(n))
            if rng.random() < 0.5:
                base = base + " " + boiler  # heavy stop-shingle mass
            texts.append((doc_id, base))
            doc_id += 1
            if rng.random() < 0.4:  # planted near-dup / excerpt pair
                ws = base.split(" ")
                k = rng.randrange(len(ws))
                ws[k] = rng.choice(vocab)
                if rng.random() < 0.5:
                    ws = ws[: max(3, len(ws) // 2)]  # excerpt (containment)
                texts.append((doc_id, " ".join(ws)))
                doc_id += 1
        want = _brute_force_pairs(texts, _DF_CAP)

        out_dir = tmp_path / f"corpus_{floor_kind}_{trial}"
        spark.createDataFrame(
            [(d, t, "en", "src", len(t)) for d, t in texts],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).write.mode("overwrite").parquet(str(out_dir / "documents.parquet"))

        if floor_kind == "jaccard":
            got_df = _capped_pair_counts(spark, str(out_dir), jaccard_floor=0.5)

            def cond(i, na, nb):
                return i / (na + nb - i) >= 0.5

        else:
            got_df = _capped_pair_counts(spark, str(out_dir), containment_floor=0.8)

            def cond(i, na, nb):
                return i / min(na, nb) >= 0.8

        got = {(r.da, r.db): (r.inter, r.na, r.nb) for r in got_df.collect()}
        qualifying = {p: v for p, v in want.items() if cond(*v)}
        for p, v in qualifying.items():
            assert p in got, (trial, p, v)
            assert got[p] == v, (trial, p, v, got[p])
        for p, v in got.items():
            assert want.get(p) == v, (trial, p, v, want.get(p))


def test_oversized_doc_bypasses_positional_filter(spark, tmp_path):
    """A doc with >= 1024 capped shingles overflows the packed 10-bit
    fields; its postings must drop the `fits` bit and pass the
    positional filter UNCONDITIONALLY — pairs involving it are found
    with exact counts, not silently pruned by garbage arithmetic."""
    from wnv_etl_lab2_spark.queries.text_q import _DF_CAP, _capped_pair_counts

    # ~1100 distinct words -> ~1098 distinct shingles, all df <= 2
    big_words = [f"u{i}" for i in range(1100)]
    big = " ".join(big_words)
    near = " ".join(big_words[:-1] + ["uX"])  # near-identical
    texts = [(1, big), (2, near), (3, "a b c d e f g h")]
    out_dir = tmp_path / "big"
    spark.createDataFrame(
        [(d, t, "en", "src", len(t)) for d, t in texts],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(out_dir / "documents.parquet"))
    got = {
        (r.da, r.db): (r.inter, r.na, r.nb)
        for r in _capped_pair_counts(
            spark, str(out_dir), jaccard_floor=0.5
        ).collect()
    }
    want = _brute_force_pairs(texts, _DF_CAP)
    assert (1, 2) in got
    assert got[(1, 2)] == want[(1, 2)]
