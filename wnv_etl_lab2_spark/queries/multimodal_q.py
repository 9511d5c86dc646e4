"""Multimodal-column query: binary payload -> Arrow-batched features.

The decode is stubbed (no media libs in the container; see
operators/multimodal.py) — and because the stub is deterministic byte
arithmetic, the feature extraction is exact-oracle-verified: DuckDB
recomputes every feature from the hex encoding of the payload.
tests/test_multimodal.py additionally checks the values directly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from wnv_etl_lab2_spark.functions.chunking import token_windows_sql
from wnv_etl_lab2_spark.operators.multimodal import binary_features, documents_as_binary
from wnv_etl_lab2_spark.queries import register
from wnv_etl_lab2_spark.sources.catalog import load_table


@register(
    "multimodal_binary_features",
    # The "decode" is the deterministic stub (payload-byte arithmetic),
    # so the whole feature row IS SQL-expressible: DuckDB recomputes
    # byte values from the hex encoding (instr over the nibble
    # alphabet; '0' yields instr 0, which is its value) — this
    # upgrades the query from rows-only to exact-oracle-verified.
    oracle="""
    WITH p AS (
      SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n
      FROM documents
    ),
    v AS (
      SELECT doc_id, n,
             list_transform(range(0, LEAST(n, 16)),
               i -> instr('123456789ABCDEF', substr(hx, CAST(2*i+1 AS BIGINT), 1)) * 16
                  + instr('123456789ABCDEF', substr(hx, CAST(2*i+2 AS BIGINT), 1))) AS head_bytes,
             instr('123456789ABCDEF', substr(hx, 1, 1)) * 16
               + instr('123456789ABCDEF', substr(hx, 2, 1)) AS b0,
             instr('123456789ABCDEF', substr(hx, CAST(2*n-1 AS BIGINT), 1)) * 16
               + instr('123456789ABCDEF', substr(hx, CAST(2*n AS BIGINT), 1)) AS bN
      FROM p
    )
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_bytes,
           CAST(COALESCE(list_sum(head_bytes), 0) % 256 AS BIGINT) AS checksum,
           CAST(CASE WHEN n = 0 THEN 0 ELSE 64 + b0 % 64 END AS INTEGER) AS fake_width,
           CAST(CASE WHEN n = 0 THEN 0 ELSE 64 + bN % 64 END AS INTEGER) AS fake_height
    FROM v
    """,
)
def multimodal_binary_features(spark, sf_dir):
    """Opaque-binary feature extraction over mapInPandas: byte length,
    checksum, stub-decoded dimensions. Payload bytes cross the Arrow
    boundary once per batch; only (id, payload) is projected in."""
    docs = load_table(spark, "documents", sf_dir)
    return binary_features(documents_as_binary(docs))


@register(
    "binary_frame_fingerprints",
    oracle="""
    WITH p AS (SELECT doc_id, hex(encode(text)) AS hx FROM documents),
    f AS (
      SELECT doc_id, hx,
             UNNEST(generate_series(0, CAST(FLOOR(LENGTH(hx) / 64) AS BIGINT) - 1)) AS frame_idx
      FROM p WHERE LENGTH(hx) >= 64
    )
    SELECT doc_id, frame_idx,
           md5(substring(hx, CAST(frame_idx * 64 + 1 AS BIGINT), 64)) AS frame_md5
    FROM f
    """,
)
def binary_frame_fingerprints(spark, sf_dir):
    """Pure-Catalyst frame sampling over an opaque binary payload:
    the payload is cut into fixed 32-byte frames and each frame gets a
    content fingerprint — the decode-free half of video frame
    extraction (dedup by frame hash), complementing the mapInPandas
    sampler in operators/multimodal.py. Working over the hex encoding
    keeps the byte slicing engine-portable (2 hex chars per byte, so
    frame i is exactly hex[i*64+1 : +64]); everything stays in
    whole-stage codegen, one explode, no shuffle, no Python."""
    d = load_table(spark, "documents", sf_dir)
    d = d.select("doc_id", F.hex(F.encode(F.col("text"), "UTF-8")).alias("hx"))
    n_frames = F.floor(F.length("hx") / F.lit(64)).cast("long")
    d = d.where(n_frames > 0).select(
        "doc_id",
        "hx",
        F.explode(F.sequence(F.lit(0).cast("long"), n_frames - 1)).alias("frame_idx"),
    )
    frame_hex = F.col("hx").substr(
        (F.col("frame_idx") * 64 + 1).cast("int"), F.lit(64)
    )
    return d.select(
        "doc_id",
        "frame_idx",
        F.md5(F.encode(frame_hex, "UTF-8")).alias("frame_md5"),
    )


@register(
    "udtf_token_windows",
    # Same clipping arithmetic as doc_chunking's pure-SQL twin, so the
    # UDTF's row-generation is exactly oracle-checkable.
    oracle=f"""
    SELECT doc_id, w_idx AS win_idx, w_text AS win_text,
           w_tokens AS win_tokens
    FROM ({token_windows_sql(16)})
    """,
)
def udtf_token_windows(spark, sf_dir):
    """Python UDTF surface (Spark 4 `@udtf` + LATERAL join): each
    document row expands into 16-token windows from a user-defined
    TABLE function — the API a user reaches for when the row
    expansion has imperative logic a `sequence`/`slice` expression
    can't express (here it can, which is exactly what makes the
    exact DuckDB oracle possible; `doc_chunking` is the pure-
    Catalyst twin). The UDTF runs per input partition with Arrow
    transfer — no shuffle; the expansion cost is the same
    corpus_tokens/width rows as the built-in explode. For anything
    vectorizable prefer mapInPandas (batch-at-a-time); the UDTF's
    per-row `eval` is the slowest Python surface, which is why this
    is the API-coverage demo, not a hot path."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="win_idx bigint, win_text string, win_tokens bigint")
    class TokenWindows:
        def eval(self, text: str, width: int):
            if text is None:  # match the Catalyst twin: NULL expands to no rows
                return
            toks = [t for t in text.split(" ")]
            for i in range(0, max(1, (len(toks) + width - 1) // width)):
                chunk = toks[i * width : (i + 1) * width]
                if not chunk:
                    break
                yield i, " ".join(chunk), len(chunk)

    spark.udtf.register("token_windows_udtf", TokenWindows)
    d = load_table(spark, "documents", sf_dir)
    d.createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        "SELECT d.doc_id, t.win_idx, t.win_text, t.win_tokens "
        "FROM _udtf_docs d, LATERAL token_windows_udtf(d.text, 16) t"
    )


@register(
    "frame_overlap_pairs",
    # Video-dedup shape over the decode-free frame fingerprints:
    # document pairs sharing >= 2 identical aligned frames, with the
    # shared-frame count. Inverted index on the frame hash with a
    # document-frequency cap (same pileup defense as the shingle
    # index), pair expansion within capped postings only.
    oracle="""
    WITH p AS (SELECT doc_id, hex(encode(text)) AS hx FROM documents),
    f AS (
      SELECT doc_id, hx,
             UNNEST(generate_series(0, CAST(FLOOR(LENGTH(hx) / 64) AS BIGINT) - 1))
               AS frame_idx
      FROM p WHERE LENGTH(hx) >= 64
    ),
    fp AS (
      SELECT DISTINCT doc_id,
             md5(substring(hx, CAST(frame_idx * 64 + 1 AS BIGINT), 64)) AS h
      FROM f
    ),
    keep AS (SELECT h FROM fp GROUP BY h HAVING COUNT(*) BETWEEN 2 AND 16),
    kept AS (SELECT fp.doc_id, fp.h FROM fp JOIN keep USING (h)),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared_frames
      FROM kept a JOIN kept b ON a.h = b.h AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, CAST(shared_frames AS BIGINT) AS shared_frames
    FROM pairs WHERE shared_frames >= 2
    """,
)
def frame_overlap_pairs(spark, sf_dir):
    """Binary near-dup detection at FRAME granularity: document pairs
    sharing >= 2 identical aligned 32-byte frames (the video-dedup
    shape — shared scenes survive container-level re-encoding of
    everything around them). Distinct frame fingerprints feed a
    df-capped inverted index (2..16 — singletons pair with nothing,
    ubiquitous frames are boilerplate); candidate pairs come from the
    capped postings only, never a doc x doc join — the same scale
    defense as the shingle index."""
    d = load_table(spark, "documents", sf_dir)
    fp = binary_frame_fingerprints(spark, sf_dir).select(
        "doc_id", F.col("frame_md5").alias("h")
    ).distinct()
    fp = fp.localCheckpoint(eager=False)  # feeds the cap + both join sides
    keep = fp.groupBy("h").agg(F.count(F.lit(1)).alias("df")).where(
        F.col("df").between(2, 16)
    )
    kept = fp.join(keep.select("h"), "h")
    a = kept.select("h", F.col("doc_id").alias("doc_a"))
    b = kept.select("h", F.col("doc_id").alias("doc_b"))
    return (
        a.join(b, "h")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("long").alias("shared_frames"))
        .where(F.col("shared_frames") >= 2)
    )
