"""Unigram-LM (SentencePiece-style) tokenizer training on Spark
(round 15 — r14 verdict "what's missing" #3, the training-tier twin of
`operators/bpe.py`): the subword model half the modern tokenizers use
(T5, mT5, XLNet, ALBERT), trained by EM over piece probabilities
instead of greedy pair merging (Kudo 2018, "Subword Regularization").

Scale decomposition — identical to BPE's, because the algorithm never
needs the corpus, only the word-frequency table:

1. CORPUS-SIZED (one pass): a combinable (word, count) aggregation,
   truncated to ``vocab_limit`` distinct words (`bpe.word_frequencies`
   — the declared-bounded artifact; top-k by frequency covers the
   overwhelming mass of a Zipf-distributed corpus).
2. SEED (distributed over the bounded words table):
   `seed_piece_frequencies` explodes every substring of every distinct
   word up to ``max_piece_len`` weighted by word count — pure JVM
   (sequence/transform/substring inside whole-stage codegen), one
   combinable sum per piece — and the top ``seed_size`` pieces
   (frequency desc, piece asc: deterministic) come back as the seed
   vocabulary. O(distinct words x len x max_piece_len) rows shuffled,
   independent of corpus size.
3. EM (driver-side over the bounded artifact, like BPE's merge loop):
   each iteration Viterbi-segments every distinct word under the
   current piece log-probabilities (hard EM — the standard
   deterministic approximation of Kudo's lattice EM; ties broken by
   fewer pieces then lexicographic segmentation, so the whole training
   run is a pure function of the word table), accumulates
   count-weighted piece frequencies, re-estimates probabilities, and
   PRUNES the worst multi-character pieces by a shrink factor until
   ``vocab_size`` remains. Single characters are never pruned —
   SentencePiece's character-coverage guarantee, so every word stays
   segmentable.
4. APPLY (distributed, one Arrow crossing): `apply_unigram` broadcasts
   the final piece table by closure (KBs) and Viterbi-segments the
   corpus in a pandas UDF with a per-batch word cache — the same
   pure-map shape as `bpe.apply_bpe`.

`queries/text_q.unigram_seed_pieces` audits step 2 against a DuckDB
oracle replaying the substring explosion; tests/test_unigram.py pins
steps 3-4 against an independently written reference implementation.
"""

# NOTE: no `from __future__ import annotations` — pandas_udf resolves
# its types from the REAL hints at decoration time (same as bpe.py).
from pyspark.sql import DataFrame, functions as F


def seed_piece_frequencies(
    words: DataFrame, max_piece_len: int = 8
) -> DataFrame:
    """Candidate-piece frequencies over a (w, n) word-frequency frame:
    every substring of ``w`` up to ``max_piece_len`` characters,
    weighted by the word's corpus count ``n``, summed per piece. All
    JVM-side: the substring explosion is a sequence/transform/flatten
    higher-order-function chain inside whole-stage codegen, and the
    aggregation is a combinable sum keyed by piece — no Python, no
    driver funnel, O(words x len x max_piece_len) intermediate rows."""
    pieces = F.expr(
        "flatten(transform(sequence(1, length(w)), s -> "
        "transform(sequence(s, least(length(w), "
        f"s + {int(max_piece_len)} - 1)), e -> substring(w, s, e - s + 1))))"
    )
    return (
        words.select(F.col("n"), F.explode(pieces).alias("piece"))
        .groupBy("piece")
        .agg(F.sum("n").cast("long").alias("freq"))
    )


def viterbi_segment(
    word: str, logprob: dict, max_piece_len: int = 8
) -> list:
    """Best segmentation of ``word`` under piece log-probabilities:
    maximize the summed log-prob; ties prefer FEWER pieces, then the
    lexicographically smallest segmentation — a total order, so
    training is deterministic. Characters absent from the vocabulary
    fall back to themselves at a harsh penalty (never happens after
    seeding, which keeps every observed character)."""
    import math

    n = len(word)
    UNK = -1e9
    # best[i] = (score, n_pieces, segmentation) for word[:i]
    best = [(-math.inf, 0, [])] * (n + 1)
    best[0] = (0.0, 0, [])
    for i in range(n):
        score_i, k_i, seg_i = best[i]
        if score_i == -math.inf:
            continue
        for j in range(i + 1, min(n, i + max_piece_len) + 1):
            piece = word[i:j]
            lp = logprob.get(piece)
            if lp is None:
                if j - i > 1:
                    continue
                lp = UNK  # unknown single character: segmentable, penalized
            cand = (score_i + lp, k_i + 1, seg_i + [piece])
            cur = best[j]
            if (
                cand[0] > cur[0]
                or (cand[0] == cur[0] and cand[1] < cur[1])
                or (cand[0] == cur[0] and cand[1] == cur[1] and cand[2] < cur[2])
            ):
                best[j] = cand
    return best[n][2]


def expected_piece_counts(
    word: str, logprob: dict, max_piece_len: int = 8
) -> dict:
    """FULL-LATTICE expected piece counts for one word (Kudo 2018's
    E-step proper): forward/backward log-sums over every segmentation,
    so a piece's count is its posterior marginal — the probability
    mass of all segmentations passing through it — rather than the
    0/1 of the single Viterbi path. O(len x max_piece_len) per word.
    Unknown single characters participate at the same harsh penalty
    Viterbi uses, so coverage semantics match between the two
    E-steps."""
    import math

    n = len(word)
    UNK = -1e9

    def lp_of(i: int, j: int):
        piece = word[i:j]
        lp = logprob.get(piece)
        if lp is None and j - i == 1:
            return UNK
        return lp

    def logaddexp(a: float, b: float) -> float:
        if a == -math.inf:
            return b
        if b == -math.inf:
            return a
        m = max(a, b)
        return m + math.log(math.exp(a - m) + math.exp(b - m))

    alpha = [-math.inf] * (n + 1)
    alpha[0] = 0.0
    for i in range(n):
        if alpha[i] == -math.inf:
            continue
        for j in range(i + 1, min(n, i + max_piece_len) + 1):
            lp = lp_of(i, j)
            if lp is not None:
                alpha[j] = logaddexp(alpha[j], alpha[i] + lp)
    beta = [-math.inf] * (n + 1)
    beta[n] = 0.0
    for i in range(n - 1, -1, -1):
        for j in range(i + 1, min(n, i + max_piece_len) + 1):
            lp = lp_of(i, j)
            if lp is not None and beta[j] != -math.inf:
                beta[i] = logaddexp(beta[i], lp + beta[j])
    z = alpha[n]
    out: dict = {}
    if z == -math.inf:
        return out
    for i in range(n):
        if alpha[i] == -math.inf:
            continue
        for j in range(i + 1, min(n, i + max_piece_len) + 1):
            lp = lp_of(i, j)
            if lp is None or beta[j] == -math.inf:
                continue
            piece = word[i:j]
            gamma = math.exp(alpha[i] + lp + beta[j] - z)
            if gamma > 0.0:
                out[piece] = out.get(piece, 0.0) + gamma
    return out


def marginal_log_likelihood(vocab: list, words: list) -> float:
    """Total log P(word) under the unigram model, summed over ALL
    segmentations (the quantity full EM monotonically improves),
    count-weighted — computed via the same forward recursion as
    `expected_piece_counts`."""
    import math

    lp = dict(vocab)
    total = 0.0
    for w, n in words:
        counts_alpha = _forward_logZ(w, lp)
        total += n * counts_alpha
    return total


def _forward_logZ(word: str, logprob: dict, max_piece_len: int = 8) -> float:
    import math

    n = len(word)
    UNK = -1e9
    alpha = [-math.inf] * (n + 1)
    alpha[0] = 0.0
    for i in range(n):
        if alpha[i] == -math.inf:
            continue
        for j in range(i + 1, min(n, i + max_piece_len) + 1):
            piece = word[i:j]
            lp = logprob.get(piece)
            if lp is None:
                if j - i > 1:
                    continue
                lp = UNK
            a, b = alpha[j], alpha[i] + lp
            if a == -math.inf:
                alpha[j] = b
            else:
                m = max(a, b)
                alpha[j] = m + math.log(math.exp(a - m) + math.exp(b - m))
    return alpha[n]


def train_unigram(
    docs: DataFrame,
    text_col: str = "text",
    vocab_size: int = 400,
    iters: int = 4,
    max_piece_len: int = 8,
    seed_size: int = 2000,
    vocab_limit: int = 50_000,
    shrink: float = 0.75,
    em: str = "hard",
) -> list:
    """Train a unigram-LM piece vocabulary. Returns
    ``[(piece, logprob)]`` sorted by (logprob desc, piece asc) —
    rank IS list position, the artifact tests pin.

    Corpus work: ONE (word, count) aggregation + the distributed seed
    explosion over the bounded word table; the EM loop runs driver-side
    over that artifact (each iteration O(words x len x max_piece_len),
    independent of corpus size), pruning multi-character pieces by
    ``shrink`` per round until ``vocab_size`` remain.

    ``em="hard"`` (default) counts the single Viterbi path per word —
    fully deterministic via the documented tie-break order.
    ``em="soft"`` uses the full-lattice posterior marginals
    (`expected_piece_counts` — Kudo's actual E-step), which
    monotonically improves the MARGINAL likelihood between prune-free
    iterations (pinned in tests); float accumulation order is fixed
    (the word list is ordered), so it is deterministic too."""
    import math

    from wnv_etl_lab2_spark.operators.bpe import word_frequencies

    words = word_frequencies(docs, text_col, vocab_limit)
    if not words:
        raise ValueError(
            "cannot train a tokenizer on an empty corpus (no words in "
            f"column {text_col!r})"
        )
    spark = docs.sparkSession
    words_df = spark.createDataFrame(words, "w string, n long")
    chars = sorted({c for w, _ in words for c in w})
    seed_rows = (
        seed_piece_frequencies(words_df, max_piece_len)
        .orderBy(F.col("freq").desc(), F.col("piece").asc())
        .limit(int(seed_size))
        .collect()
    )
    freqs = {r["piece"]: float(r["freq"]) for r in seed_rows}
    for c in chars:  # character coverage: every seen char survives
        freqs.setdefault(c, 1.0)
    total = sum(freqs.values())
    logprob = {p: math.log(f / total) for p, f in freqs.items()}

    if em not in ("hard", "soft"):
        raise ValueError(f"em must be hard|soft, got {em!r}")

    def em_step(lp: dict) -> dict:
        counts: dict = {}
        if em == "soft":
            for w, n in words:
                for piece, gamma in expected_piece_counts(
                    w, lp, max_piece_len
                ).items():
                    counts[piece] = counts.get(piece, 0.0) + float(n) * gamma
            return counts
        for w, n in words:
            for piece in viterbi_segment(w, lp, max_piece_len):
                counts[piece] = counts.get(piece, 0.0) + float(n)
        return counts

    for _ in range(int(iters)):
        counts = em_step(logprob)
        for c in chars:
            counts.setdefault(c, 0.5)  # smoothing: chars never vanish
        multi = sorted(
            ((p, f) for p, f in counts.items() if len(p) > 1 and f > 0),
            key=lambda kv: (-kv[1], kv[0]),
        )
        n_multi_target = max(
            int(vocab_size) - len(chars), int(len(multi) * float(shrink))
        )
        multi = multi[:n_multi_target]
        kept = {p: f for p, f in multi}
        kept.update({c: counts[c] for c in chars})
        total = sum(kept.values())
        logprob = {p: math.log(f / total) for p, f in kept.items()}

    # final prune straight to vocab_size (chars always kept), then
    # renormalize so the survivors are a distribution — under soft EM
    # every lattice piece keeps some mass, so the prune genuinely
    # removes probability that must be redistributed
    multi = sorted(
        ((p, lp) for p, lp in logprob.items() if len(p) > 1),
        key=lambda kv: (-kv[1], kv[0]),
    )[: max(0, int(vocab_size) - len(chars))]
    final = dict(multi)
    final.update({c: logprob[c] for c in chars})
    log_z = math.log(sum(math.exp(v) for v in final.values()))
    final = {p: v - log_z for p, v in final.items()}
    return sorted(final.items(), key=lambda kv: (-kv[1], kv[0]))


def corpus_log_likelihood(vocab: list, words: list) -> float:
    """Viterbi log-likelihood of a (word, count) table under a trained
    vocabulary — the scalar EM is expected to improve (pinned
    non-decreasing across iterations in tests)."""
    lp = dict(vocab)
    return sum(
        n * sum(lp.get(p, -1e9) for p in viterbi_segment(w, lp))
        for w, n in words
    )


def apply_unigram(
    docs: DataFrame, vocab: list, text_col: str = "text"
) -> DataFrame:
    """Re-tokenize the corpus with a trained vocabulary: pure map, one
    Arrow crossing, the piece table broadcast by closure (KBs).
    Returns (doc_id, tokens, n_tokens) — the same contract as
    `bpe.apply_bpe`, so the two tokenizers are drop-in comparable."""
    import pandas as pd

    from pyspark.sql.functions import pandas_udf

    lp = dict(vocab)

    @pandas_udf("array<string>")
    def tokenize(texts: pd.Series) -> pd.Series:
        cache: dict = {}

        def run(text: str) -> list:
            out: list = []
            for w in (text or "").split(" "):
                if not w:
                    continue
                if w not in cache:
                    cache[w] = viterbi_segment(w, lp)
                out.extend(cache[w])
            return out

        return texts.map(run)

    return docs.select(
        "doc_id", tokenize(F.col(text_col)).alias("tokens")
    ).withColumn("n_tokens", F.size("tokens").cast("long"))
