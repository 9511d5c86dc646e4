"""Multi-dimensional file layout: Z-order (Morton) clustering for
min/max file skipping.

At 100 TB a filter like ``lang = 'de' AND n_chars BETWEEN a AND b``
is served almost entirely by FILE PRUNING: parquet readers consult
per-file (and per-row-group) min/max statistics and skip files whose
range cannot match. Linear sort orders only cluster the FIRST sort
key — a table sorted by ``lang`` then ``n_chars`` prunes well on
``lang`` but every file spans the full ``n_chars`` range within its
lang run only if langs are few. Interleaving the bits of several
keys (the Morton curve) keeps EVERY key's value range narrow within
every file, so selective predicates on ANY clustered column skip
most files — the layout trick Delta/Iceberg expose as ``OPTIMIZE
ZORDER BY``, built here from primitives Spark already has:
rank-normalize each key, interleave bits in a JVM expression,
``repartitionByRange`` on the code, write.

The clustering changes WHERE rows land, never WHAT they are — the
table's content is byte-identical under a content hash, which is how
tests pin it. The skip benefit is asserted from the written files'
real parquet footers (pyarrow row-group statistics), not simulated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# 21 bits per dimension x 2 dims = 42-bit codes — exact in a BIGINT.
_BITS = 21


def _rank_col(df: DataFrame, col: str) -> "F.Column":
    """Dense rank of the column scaled into [0, 2^_BITS): Morton codes
    need uniformly-gridded non-negative ints; percent_rank over the
    distinct values linearizes any orderable dtype (strings included)
    without assuming a distribution."""
    from pyspark.sql import Window

    w = Window.orderBy(F.col(col))
    return (
        (F.percent_rank().over(w) * ((1 << _BITS) - 1))
        .cast("bigint")
    )


def morton_code(a: "F.Column", b: "F.Column", bits: int = _BITS) -> "F.Column":
    """Interleave the low ``bits`` bits of two non-negative BIGINT
    columns: result bit 2i = a's bit i, bit 2i+1 = b's bit i. Pure
    JVM arithmetic (shiftright/pmod), fully inside codegen."""
    return morton_code_n([a, b], bits=bits)


def morton_code_n(cols: list, bits: int = _BITS) -> "F.Column":
    """N-column Morton interleave (round 11 — OPTIMIZE ZORDER past two
    keys): result bit n*i + j = cols[j]'s bit i, so every column
    contributes equally at every granularity and each written file's
    per-column [min, max] ranges stay narrow for ALL n keys at once.
    The code must fit a signed BIGINT, so n * bits <= 63 — with the
    default 16-bit grid that is up to 3 columns; pass a smaller
    ``bits`` for 4+ (resolution beyond the file count is wasted
    anyway: 2^bits cells per axis only needs to exceed the file
    count). Pure JVM arithmetic, fully inside codegen."""
    n = len(cols)
    if n < 1:
        raise ValueError("morton_code_n needs at least one column")
    if n * bits > 63:
        raise ValueError(
            f"{n} columns x {bits} bits = {n * bits} exceeds a signed BIGINT; "
            f"lower bits to <= {63 // n}"
        )
    code = F.lit(0).cast("bigint")
    for i in range(bits):
        for j, c in enumerate(cols):
            bit = F.shiftright(c, i) % 2
            code = code + bit * F.lit(1 << (n * i + j))
    return code


def write_zordered(
    df: DataFrame,
    path: str,
    cols: tuple[str, str],
    n_files: int = 8,
) -> None:
    """Write ``df`` as ``n_files`` parquet files clustered on the
    Morton interleave of ``cols``: range-partition by the code (files
    own contiguous curve segments), sort within partitions, drop the
    helper column. ``repartitionByRange`` samples the code column to
    pick balanced split points — the same mechanics a sort-based
    OPTIMIZE job uses on a cluster; for N input splits the cost is
    one shuffle of the data, identical to any global sort.

    NOTE on the rank step: percent_rank over an unpartitioned window
    is a single-partition sort of the (distinct-value-sized) rank
    input — fine for clustering keys with bounded cardinality (lang,
    bucketed lengths). For an unbounded key, swap `_rank_col` for a
    broadcast quantile lookup (approxQuantile grid) — the curve only
    needs approximate uniformity."""
    a, b = cols
    coded = df.withColumn("_z", morton_code(_rank_col(df, a), _rank_col(df, b)))
    (
        coded.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_minmax_stats(path: str, column: str) -> list[tuple[str, object, object]]:
    """(file, min, max) of ``column`` per written parquet file, read
    from the REAL footers (pyarrow row-group statistics) — the exact
    metadata a scan consults when it prunes."""
    import glob
    import os

    import pyarrow.parquet as pq

    out = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                if col.path_in_schema == column and col.statistics is not None:
                    mins.append(col.statistics.min)
                    maxs.append(col.statistics.max)
        if mins:
            out.append((os.path.basename(f), min(mins), max(maxs)))
    return out


def files_matching(
    stats: list[tuple[str, object, object]], lo, hi
) -> list[str]:
    """Files whose [min, max] range intersects [lo, hi] — the set a
    pruning scan must read."""
    return [f for f, mn, mx in stats if not (mx < lo or mn > hi)]
