"""Incremental materialized-view maintenance over versioned tables
(round 9) — the composition the rest of the stack exists for:

    source (append-only versioned table)
      --table_appends-->  delta rows since the last refresh
      --aggregate-->      keyed delta aggregate
      --merge-->          new view state (monoid merge with the old)
      --overwrite_table-> next view version, STAMPED with the source
                          version it reflects

`queries/temporal_q.incremental_agg_merge` oracle-checks the merge ==
recompute contract for one state/delta split; this operator runs the
full maintenance LOOP with exactly-once bookkeeping: the view's
manifest batch stamp records the source version each refresh
reflects, so a crashed/replayed refresh is detected (stamp already
present) and skipped, and a concurrent refresher loses the version
race and rebases through `with_retries`.

Scale shape per refresh: the delta read is O(new data) (only the
appended files — `table_appends`), the delta aggregate is combinable,
and the merge joins two KEYED AGGREGATES (state rows, never raw
history) — the full-history recompute the pattern avoids happens only
on the first build. The ``aggregate``/``merge`` callables carry the
monoid: count/sum merge by addition, min/max by extremes, avg as
(sum, count) — exactly the contract the oracle query pins.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from wnv_etl_lab2_spark.operators.cdf import table_appends, table_changes
from wnv_etl_lab2_spark.sources.versioned import (
    create_table,
    last_committed_batch_id,
    last_stamp,
    latest_version,
    overwrite_table,
    read_table,
    with_retries,
)

Aggregate = Callable[[DataFrame], DataFrame]
Merge = Callable[[DataFrame, DataFrame], DataFrame]
Join = Callable[[DataFrame, DataFrame], DataFrame]


def refresh_incremental(
    spark: SparkSession,
    source_table: str,
    view_table: str,
    aggregate: Aggregate,
    merge: Merge,
    writer_id: str = "matview",
) -> int | None:
    """Bring ``view_table`` up to date with ``source_table``'s latest
    version. Returns the source version now reflected, or None if the
    view was already current. First call builds the view from the full
    snapshot; every later call consumes only the appended rows."""
    src_v = latest_version(spark, source_table)
    if src_v is None:
        raise ValueError(f"not a versioned table (no log): {source_table}")

    def attempt() -> int | None:
        # Pin the view version ONCE per attempt: stamp, state, and the
        # commit's CAS all derive from v0. Without the pin, a
        # concurrent refresher committing between the stamp read and
        # the state read makes this attempt merge its delta onto a
        # state that already includes it — and a commit that re-reads
        # latest for its own CAS would then succeed, double-applying
        # the delta instead of losing the race and rebasing (round-10
        # advisory fix).
        v0 = latest_version(spark, view_table)
        if v0 is None:
            state = aggregate(read_table(spark, source_table, src_v))
            create_table(state, view_table, batch_id=src_v, writer_id=writer_id)
            return src_v
        reflected = last_committed_batch_id(spark, view_table, writer_id, as_of=v0)
        if reflected is not None and src_v <= reflected:
            return None  # already current (or a replayed refresh)
        if reflected is None:
            # a view with no source-version stamp (created outside this
            # refresher) has no trustworthy incremental baseline — full
            # rebuild once, stamped, and every later refresh is
            # incremental
            state = aggregate(read_table(spark, source_table, src_v))
            overwrite_table(
                state, view_table, batch_id=src_v, writer_id=writer_id,
                expect_latest=v0,
            )
            return src_v
        delta_rows = table_appends(spark, source_table, reflected, src_v)
        new_state = merge(read_table(spark, view_table, v0), aggregate(delta_rows))
        overwrite_table(
            new_state, view_table, batch_id=src_v, writer_id=writer_id,
            expect_latest=v0,
        )
        return src_v

    return with_retries(attempt)


def refresh_incremental_cdf(
    spark: SparkSession,
    source_table: str,
    view_table: str,
    key: str,
    aggregate: Aggregate,
    merge: Merge,
    retract: Merge,
    writer_id: str = "matview-cdf",
) -> int | None:
    """`refresh_incremental` for sources that REWRITE history
    (merge/delete/overwrite/optimize — where `table_appends` rightly
    refuses): the delta range is consumed as a Change Data Feed
    (`cdf.table_changes`, keyed by ``key``) and applied
    retract/apply-style — inserts and update POSTIMAGES aggregate
    into the state through ``merge``, deletes and update PREIMAGES
    aggregate OUT through ``retract`` (the monoid's inverse:
    count/sum subtract; min/max need a full rebuild and should use
    plain refresh on rewrite instead). Same pinned-v0
    stamp/state/CAS discipline and `with_retries` rebase as the
    append-only refresher; same O(changed data) aggregates — the
    snapshot diff itself is the one keyed join `table_changes`
    documents. Returns the source version now reflected, or None if
    current."""
    src_v = latest_version(spark, source_table)
    if src_v is None:
        raise ValueError(f"not a versioned table (no log): {source_table}")

    def attempt() -> int | None:
        v0 = latest_version(spark, view_table)
        if v0 is None:
            state = aggregate(read_table(spark, source_table, src_v))
            create_table(state, view_table, batch_id=src_v, writer_id=writer_id)
            return src_v
        reflected = last_committed_batch_id(spark, view_table, writer_id, as_of=v0)
        if reflected is not None and src_v <= reflected:
            return None  # already current (or a replayed refresh)
        if reflected is None:
            state = aggregate(read_table(spark, source_table, src_v))
            overwrite_table(
                state, view_table, batch_id=src_v, writer_id=writer_id,
                expect_latest=v0,
            )
            return src_v
        changes = table_changes(spark, source_table, key, reflected, src_v)
        applied = changes.where(
            changes["_change_type"].isin("insert", "update_postimage")
        ).drop("_change_type")
        retracted = changes.where(
            changes["_change_type"].isin("delete", "update_preimage")
        ).drop("_change_type")
        new_state = retract(
            merge(read_table(spark, view_table, v0), aggregate(applied)),
            aggregate(retracted),
        )
        overwrite_table(
            new_state, view_table, batch_id=src_v, writer_id=writer_id,
            expect_latest=v0,
        )
        return src_v

    return with_retries(attempt)


def refresh_incremental_join(
    spark: SparkSession,
    source_a: str,
    source_b: str,
    view_table: str,
    join: Join,
    aggregate: Aggregate,
    merge: Merge,
    writer_id: str = "matview-join",
) -> tuple[int, int] | None:
    """Incrementally maintain ``view = aggregate(join(A, B))`` over TWO
    append-only versioned sources — the classic delta-join rule (round
    10, verdict item 7):

        (A0 + dA) JOIN (B0 + dB)
          = A0 JOIN B0  +  dA JOIN (B0 + dB)  +  A0 JOIN dB

    so the view's delta is ``join(dA, B1) UNION join(A0, dB)`` with
    ``B1`` the NEW B snapshot and ``A0`` the OLD A snapshot — both
    exact time-travel reads, both deltas O(new data) via
    `table_appends`, and every joined row counted exactly once (dA x dB
    lands in the first arm only). At scale each arm is a broadcast of
    the (small) delta against one snapshot scan; the aggregate over the
    union is combinable and the merge joins two keyed states, exactly
    as the single-source refresher.

    Bookkeeping: the view manifest's opaque ``stamp`` records BOTH
    reflected source versions ``{"a": va, "b": vb}`` (a single batch_id
    int cannot carry the vector); the same pinned-v0 read/stamp/CAS
    discipline as `refresh_incremental` makes concurrent refreshers
    lose loudly and rebase through `with_retries`. Returns the (va, vb)
    now reflected, or None if already current."""
    va = latest_version(spark, source_a)
    vb = latest_version(spark, source_b)
    if va is None or vb is None:
        raise ValueError(f"not versioned tables: {source_a}, {source_b}")

    def full_state() -> DataFrame:
        return aggregate(
            join(read_table(spark, source_a, va), read_table(spark, source_b, vb))
        )

    def attempt() -> tuple[int, int] | None:
        v0 = latest_version(spark, view_table)
        if v0 is None:
            create_table(
                full_state(), view_table, writer_id=writer_id,
                stamp={"a": va, "b": vb},
            )
            return (va, vb)
        st = last_stamp(spark, view_table, writer_id, as_of=v0)
        if st is None:
            # unstamped view (created outside this refresher): no
            # trustworthy incremental baseline — full rebuild once
            overwrite_table(
                full_state(), view_table, writer_id=writer_id,
                stamp={"a": va, "b": vb}, expect_latest=v0,
            )
            return (va, vb)
        ra, rb = int(st["a"]), int(st["b"])
        if va <= ra and vb <= rb:
            return None  # already current (or a replayed refresh)
        delta_a = table_appends(spark, source_a, ra, va)
        delta_b = table_appends(spark, source_b, rb, vb)
        delta = join(delta_a, read_table(spark, source_b, vb)).unionByName(
            join(read_table(spark, source_a, ra), delta_b)
        )
        new_state = merge(read_table(spark, view_table, v0), aggregate(delta))
        overwrite_table(
            new_state, view_table, writer_id=writer_id,
            stamp={"a": va, "b": vb}, expect_latest=v0,
        )
        return (va, vb)

    return with_retries(attempt)


def refresh_incremental_join_cdf(
    spark: SparkSession,
    source_a: str,
    source_b: str,
    view_table: str,
    key_a: str,
    key_b: str,
    join: Join,
    aggregate: Aggregate,
    merge: Merge,
    retract: Merge,
    writer_id: str = "matview-join-cdf",
) -> tuple[int, int] | None:
    """``view = aggregate(join(A, B))`` over two sources that may
    REWRITE history (round 11, r10 verdict #4) — the composition of
    `refresh_incremental_join` (delta-join) and
    `refresh_incremental_cdf` (retract/apply): each source's delta is
    a SIGNED multiset from its Change Data Feed (inserts and update
    postimages are +, deletes and update preimages are −), and the
    delta-join rule is applied per sign. Join is bilinear over signed
    multisets, so

        ΔV = ΔA ⋈ B1  ∪  A0 ⋈ ΔB

    holds verbatim with the joined row's sign equal to the delta
    row's sign (B1 = new B snapshot, A0 = old A snapshot — all-plus
    frames). Positive joined rows aggregate into the state through
    ``merge``; negative ones aggregate OUT through ``retract`` (the
    monoid's inverse — count/sum subtract; min/max have no inverse
    and need a plain rebuild on rewrite).

    Cost per refresh: two keyed snapshot diffs (`table_changes`, the
    one documented SMJ each) producing O(changed rows) deltas, then
    each delta-join arm broadcasts the (small) signed delta against
    one snapshot scan — never a snapshot-x-snapshot recompute. Same
    ``{"a": va, "b": vb}`` stamp vector and pinned-v0 read/stamp/CAS
    discipline as the append-only delta-join refresher. Returns the
    (va, vb) now reflected, or None if already current."""
    va = latest_version(spark, source_a)
    vb = latest_version(spark, source_b)
    if va is None or vb is None:
        raise ValueError(f"not versioned tables: {source_a}, {source_b}")

    def full_state() -> DataFrame:
        return aggregate(
            join(read_table(spark, source_a, va), read_table(spark, source_b, vb))
        )

    def split(changes: DataFrame) -> tuple[DataFrame, DataFrame]:
        plus = changes.where(
            changes["_change_type"].isin("insert", "update_postimage")
        ).drop("_change_type")
        minus = changes.where(
            changes["_change_type"].isin("delete", "update_preimage")
        ).drop("_change_type")
        return plus, minus

    def attempt() -> tuple[int, int] | None:
        v0 = latest_version(spark, view_table)
        if v0 is None:
            create_table(
                full_state(), view_table, writer_id=writer_id,
                stamp={"a": va, "b": vb},
            )
            return (va, vb)
        st = last_stamp(spark, view_table, writer_id, as_of=v0)
        if st is None:
            # unstamped view (created outside this refresher): no
            # trustworthy incremental baseline — full rebuild once
            overwrite_table(
                full_state(), view_table, writer_id=writer_id,
                stamp={"a": va, "b": vb}, expect_latest=v0,
            )
            return (va, vb)
        ra, rb = int(st["a"]), int(st["b"])
        if va <= ra and vb <= rb:
            return None  # already current (or a replayed refresh)
        a_plus, a_minus = split(table_changes(spark, source_a, key_a, ra, va))
        b_plus, b_minus = split(table_changes(spark, source_b, key_b, rb, vb))
        b1 = read_table(spark, source_b, vb)
        a0 = read_table(spark, source_a, ra)
        plus = join(a_plus, b1).unionByName(join(a0, b_plus))
        minus = join(a_minus, b1).unionByName(join(a0, b_minus))
        new_state = retract(
            merge(read_table(spark, view_table, v0), aggregate(plus)),
            aggregate(minus),
        )
        overwrite_table(
            new_state, view_table, writer_id=writer_id,
            stamp={"a": va, "b": vb}, expect_latest=v0,
        )
        return (va, vb)

    return with_retries(attempt)
