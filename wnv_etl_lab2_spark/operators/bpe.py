"""BPE tokenizer training on Spark (round 9).

`queries/text_q.bpe_pair_merge_counts` audits ONE iteration's pair
statistics; this module runs the full training loop and the corpus
re-tokenization — the tokenizer-fitting step of a training-data
pipeline.

Scale decomposition (the same one HuggingFace `tokenizers` uses):
BPE never iterates over the CORPUS — it iterates over the WORD
FREQUENCY table. So the corpus-sized work here is exactly one
combinable (word, count) aggregation + a TakeOrdered truncation to
``vocab_limit`` distinct words (a declared-bounded artifact, like the
IVF centroid sample: top-k by frequency covers the overwhelming mass
of any Zipf-distributed corpus, and the cutoff is a parameter, not a
silent cap). The merge loop then runs driver-side over that bounded
table — each iteration is O(vocab * avg_word_len), independent of
corpus size — and the learned merges BROADCAST back for the apply
step, a pure map over the scan (Arrow-batched, one crossing).

Determinism: pair selection breaks count ties lexicographically, so
the merge sequence is a pure function of the word-frequency table —
pinned against an independent reference implementation in
tests/test_bpe.py.
"""

# NOTE: no `from __future__ import annotations` here — pandas_udf
# resolves its input/return types from the REAL type hints at decoration
# time, and the future import would stringify them into an unsupported
# signature.
from pyspark.sql import DataFrame, functions as F

_END = "</w>"


def word_frequencies(
    docs: DataFrame, text_col: str = "text", vocab_limit: int = 50_000
) -> list[tuple[str, int]]:
    """The corpus-sized step: one (word, count) aggregation, truncated
    to the ``vocab_limit`` most frequent words (count desc, word asc —
    deterministic). Returns the bounded driver-side artifact the merge
    loop consumes."""
    counts = (
        docs.select(F.explode(F.split(text_col, " ")).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("w").asc())
        .limit(vocab_limit)
    )
    return [(r.w, r.n) for r in counts.collect()]


def train_bpe(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 50,
    vocab_limit: int = 50_000,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus: words split to
    characters (plus an end-of-word marker), then repeatedly merge the
    most frequent adjacent symbol pair. Returns the ordered merge
    list — rank IS list position."""
    vocab = {
        tuple(word) + (_END,): freq
        for word, freq in word_frequencies(docs, text_col, vocab_limit)
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for symbols, freq in vocab.items():
            for a, b in zip(symbols, symbols[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + freq
        if not pairs:
            break
        # deterministic argmax: highest count, then lexicographic pair
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for symbols, freq in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(symbols):
                if (
                    i + 1 < len(symbols)
                    and symbols[i] == best[0]
                    and symbols[i + 1] == best[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(symbols[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + freq
        vocab = new_vocab
    return merges


def segment_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Tokenize ONE word with a trained merge table: repeatedly apply
    the lowest-rank applicable merge (the standard BPE inference
    rule)."""
    symbols = list(word) + [_END]
    while len(symbols) > 1:
        best_rank, best_i = None, None
        for i, pair in enumerate(zip(symbols, symbols[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        symbols[best_i : best_i + 2] = [symbols[best_i] + symbols[best_i + 1]]
    return symbols


def apply_bpe(
    docs: DataFrame, merges: list[tuple[str, str]], text_col: str = "text"
) -> DataFrame:
    """Re-tokenize the corpus with a trained merge table: pure map,
    one Arrow crossing, the merge table broadcast by closure (KBs).
    Returns (doc_id, tokens array, n_tokens) — the fertility input for
    sequence packing and token accounting."""
    import pandas as pd

    from pyspark.sql.functions import pandas_udf

    ranks = {pair: i for i, pair in enumerate(merges)}

    @pandas_udf("array<string>")
    def tokenize(texts: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}

        def run(text: str) -> list[str]:
            out: list[str] = []
            for w in (text or "").split(" "):
                if not w:
                    continue
                if w not in cache:
                    cache[w] = segment_word(w, ranks)
                out.extend(cache[w])
            return out

        return texts.map(run)

    return docs.select(
        "doc_id", tokenize(F.col(text_col)).alias("tokens")
    ).withColumn("n_tokens", F.size("tokens").cast("long"))
