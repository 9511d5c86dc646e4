"""BPE training on Spark: the learned merge sequence must equal an
independent pure-Python reference run on the same word frequencies,
and the apply step must re-tokenize consistently (concatenation
restores the word, token count bounded by chars+1)."""

from __future__ import annotations

from collections import Counter

from wnv_etl_lab2_spark.operators.bpe import (
    _END,
    apply_bpe,
    segment_word,
    train_bpe,
    word_frequencies,
)
from wnv_etl_lab2_spark.sources.catalog import load_table


def reference_bpe(word_freqs: dict[str, int], n_merges: int):
    """Textbook BPE (Sennrich et al. pseudocode), written independently
    of the operator: symbol-pair counts over the word table, merge the
    best pair, repeat."""
    vocab = {tuple(w) + (_END,): f for w, f in word_freqs.items()}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for syms, f in vocab.items():
            for pair in zip(syms, syms[1:]):
                pairs[pair] += f
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        out_vocab = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(best[0] + best[1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            out_vocab[tuple(out)] = out_vocab.get(tuple(out), 0) + f
        vocab = out_vocab
    return merges


def test_spark_trained_merges_equal_reference(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir)
    freqs = dict(word_frequencies(docs, vocab_limit=10_000))
    assert len(freqs) > 10
    want = reference_bpe(freqs, n_merges=30)
    got = train_bpe(docs, n_merges=30, vocab_limit=10_000)
    assert got == want  # identical merge sequence, rank for rank


def test_apply_round_trips_and_compresses(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir)
    merges = train_bpe(docs, n_merges=40, vocab_limit=10_000)
    toks = apply_bpe(docs, merges)
    rows = {r.doc_id: r for r in toks.limit(2000).collect()}
    texts = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
    assert rows
    for doc_id, r in rows.items():
        # concatenating tokens (minus the markers) restores the text
        joined = "".join(r.tokens).replace(_END, " ").rstrip(" ")
        assert joined == texts[doc_id].replace("  ", " ") or joined == texts[doc_id]
        assert r.n_tokens == len(r.tokens)
    # merges actually compress: fewer tokens than chars+1 per word
    sample = next(iter(rows.values()))
    n_words = len(texts[sample.doc_id].split(" "))
    n_chars = len(texts[sample.doc_id].replace(" ", ""))
    assert sample.n_tokens < n_chars + n_words


def test_segment_word_respects_rank_order():
    # greedy lowest-rank-first: (a,b) merges before (c,END) even though
    # both are applicable, so 'abc' becomes ab -> abc, leaving the
    # marker unmerged; with the pair order flipped the result differs
    ranks = {("a", "b"): 0, ("ab", "c"): 1, ("c", _END): 2}
    assert segment_word("abc", ranks) == ["abc", _END]
    flipped = {("c", _END): 0, ("a", "b"): 1, ("ab", "c"): 2}
    assert segment_word("abc", flipped) == ["ab", "c" + _END]
    # no applicable merge: pure character fallback
    assert segment_word("xy", ranks) == ["x", "y", _END]
