"""The ``main()`` analog: config file → source registry → full sync →
incremental sync, as one callable entry point plus a CLI.

Mirrors the reference's boot sequence (`cmd/cdc/main.go:15-33`):

1. ``config.LoadConfig("config.toml")``        → :func:`go_cdc_spark.config.load_config`
2. ``db.InitCDCDataSource()`` (meta DB)        → :class:`CheckpointStore` at ``meta_path``
3. ``syncdb.InitOrGetDataSource()`` per source → :meth:`Engine.init_sources`
   (build source, probe start position, persist the source-level meta
   row, register in the id-keyed holder map,
   `internal/syncdb/data_source.go:77-112`)
4. ``FullAmountService.Run``                   → :meth:`Engine.full_sync`
5. ``NewMySQLIncrementalService(...).Run``     → :meth:`Engine.incremental_sync`

The incremental phase drains each source's changelog directory with an
``availableNow`` trigger by default (deterministic for tests and batch
catch-up); pass ``continuous=True`` for a long-lived tail. Query
restarts are governed by :class:`RestartPolicy` (backoff parity with
`internal/cannal/incremental.go:100-114`).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .config import EngineConfig, SourceConfig, load_config
from .functions.rules import FilterRules
from .sources.meta import CheckpointStore
from .sources.snapshot import (
    JdbcMetadataSource,
    JdbcSnapshotSource,
    ParquetSnapshotSource,
    TableSnapshot,
    snapshot_all,
)
from .streaming.pipeline import StreamingMaterializer, read_changelog_stream
from .streaming.scd2 import Scd2Materializer
from .streaming.restart import RestartPolicy, run_with_restart
from .streaming.txn_gate import ReadCommittedGate


# Demux MERGE fan-out collapse guard (VERDICT r11 #5). Probed on
# local[32] (SCALE.md round-11): 48 tables × 8 workers collapses to
# 0.29× sequential (8 concurrent foreachBatch MERGEs × 32-task stages
# thrash the single JVM's scheduler/GC) while 16 tables × 8 workers is
# 2.6× FASTER — the hazard is table-count × concurrency on ONE JVM.
# So the cap applies only to local masters; a multi-executor cluster
# (concurrent jobs land on otherwise-idle executors) keeps the user's
# configured value.
_LOCAL_SAFE_MERGE_WORKERS = 4  # probed optimum at 48 tables (2.20×)
_LOCAL_MANY_TABLES = 16  # largest probed table count where w8 still won


def effective_merge_workers(requested: int, n_touched: int, master: str) -> int:
    """Bound the demux MERGE fan-out to the probed safe point: on a
    ``local[*]`` master with more than ``_LOCAL_MANY_TABLES`` touched
    tables, cap at ``_LOCAL_SAFE_MERGE_WORKERS`` (a user setting 8 on a
    many-table local source would silently lose 3×, the probed
    pathological point). Never raises the requested value."""
    workers = min(int(requested), n_touched)
    # single-JVM masters only: "local" / "local[N]" / "local[N,F]".
    # "local-cluster[n,c,m]" is MULTI-JVM (one executor process per
    # worker) — the probed single-JVM scheduler collapse does not apply
    # there, so the user's configured value stands (ADVICE r12)
    single_jvm = master == "local" or master.startswith("local[")
    if (
        single_jvm
        and n_touched > _LOCAL_MANY_TABLES
        and workers > _LOCAL_SAFE_MERGE_WORKERS
    ):
        import warnings

        warnings.warn(
            f"merge_concurrency={requested} capped to "
            f"{_LOCAL_SAFE_MERGE_WORKERS} on a local master with "
            f"{n_touched} touched tables: the probed local[32] A/B "
            "(SCALE.md round-11) shows 8 workers at 48 tables running "
            "0.29× SEQUENTIAL speed; raise the knob on a multi-executor "
            "cluster instead",
            stacklevel=2,
        )
        return _LOCAL_SAFE_MERGE_WORKERS
    return workers


@dataclass
class SourceHolder:
    """`DataSourceHolder` analog (`internal/syncdb/data_source.go:42-55`):
    id + live source + parsed config, registered in the engine map."""

    id: int
    config: SourceConfig
    source: object
    rules: FilterRules
    start_pos: str

    @property
    def name(self) -> str:
        return self.config.name


class Engine:
    """Config-driven multi-source CDC engine (registry + run loop)."""

    def __init__(self, config: EngineConfig, spark: SparkSession | None = None):
        self.config = config
        if spark is None:
            from .session import get_spark

            spark = get_spark()
        self.spark = spark
        self.meta = CheckpointStore(spark, config.meta_path)
        self.registry: dict[int, SourceHolder] = {}
        # (source_id, schema, table) -> materializer for the synced table
        self.tables: dict[tuple[int, str, str], StreamingMaterializer] = {}

    # -- step 3: source registry -----------------------------------------

    def _build_source(self, cfg: SourceConfig):
        if cfg.type == "parquet":
            if not cfg.path:
                raise ValueError(f"source {cfg.name!r}: parquet type needs path")
            return ParquetSnapshotSource(
                self.spark,
                cfg.path,
                schema_name=cfg.schema_name,
                primary_keys=cfg.primary_keys,
            )
        if cfg.type == "jdbc":
            return JdbcSnapshotSource(
                self.spark,
                cfg.dsn(),
                cfg.jdbc_properties(),
                num_partitions=cfg.num_partitions,
            )
        if cfg.type == "jdbc_metadata":
            # portable discovery via java.sql.DatabaseMetaData — any
            # JDBC engine, not just MySQL (tested against embedded Derby)
            return JdbcMetadataSource(
                self.spark,
                cfg.dsn(),
                cfg.jdbc_properties(),
                num_partitions=cfg.num_partitions,
            )
        raise ValueError(f"source {cfg.name!r}: unknown type {cfg.type!r}")

    def init_sources(self) -> dict[int, SourceHolder]:
        """Build + register every configured source: probe its current
        position (A16 binlog bootstrap) and persist the source-level
        meta row before any sync, like `data_source.go:102-107`."""
        for cfg in self.config.sources:
            src = self._build_source(cfg)
            pos = src.current_position()
            self.meta.upsert(cfg.name, pos, sync_type="incremental")
            self.registry[cfg.id] = SourceHolder(
                id=cfg.id,
                config=cfg,
                source=src,
                rules=cfg.parsed_rules(),
                start_pos=pos,
            )
        return self.registry

    # -- step 4: full sync ------------------------------------------------

    def _state_path(self, holder: SourceHolder, schema: str, table: str) -> str:
        return os.path.join(
            self.config.state_dir, f"src{holder.id}", schema, table
        )

    def full_sync(self, concurrency: int = 10) -> dict[int, list[TableSnapshot]]:
        """`FullAmountService.Run` analog: per source, discover → filter →
        bounded-parallel per-table snapshot (checkpointing each table's
        position), then materialize each table's typed state so the
        incremental phase has a base to merge into."""
        results: dict[int, list[TableSnapshot]] = {}
        for holder in self.registry.values():
            snaps = snapshot_all(
                holder.source,
                holder.name,
                rules=holder.rules,
                checkpoint=self.meta,
                concurrency=concurrency,
            )
            results[holder.id] = snaps
            for snap in snaps:
                if snap.error is not None:
                    continue  # rollback event; table skipped (no-PK etc.)
                typed = holder.source.read_table(snap.schema, snap.table)
                # under read_committed the GATE owns the A21 watermark
                # (it must cap below withheld rows); the materializer
                # then must not advance it independently
                mat_cls = (
                    Scd2Materializer if holder.config.history else StreamingMaterializer
                )
                self.tables[(holder.id, snap.schema, snap.table)] = mat_cls(
                    self.spark,
                    snapshot=typed,
                    keys=holder.source.get_table_primary_keys(snap.schema, snap.table),
                    state_path=self._state_path(holder, snap.schema, snap.table),
                    pos_threshold=snap.pos,
                    meta=None if holder.config.read_committed else self.meta,
                    data_source_id=holder.name,
                    table=snap.table,
                    skew_robust=holder.config.skew_robust,
                )
        return results

    # -- query-based capture (polling CDC, sources/polling.py) ------------

    def _capture_for(self, holder: SourceHolder):
        from .sources.polling import PollingCapture

        cfg = holder.config
        return PollingCapture(
            self.spark,
            cfg.dsn(),
            cfg.jdbc_properties(),
            changelog_dir=cfg.changelog,
            data_source=cfg.name,
            meta=self.meta,
            state_dir=os.path.join(
                self.config.state_dir, f"src{holder.id}", "_capture"
            ),
            num_partitions=cfg.num_partitions,
            # keydiff's O(table) scans ride the snapshot source's
            # partitioned chunked-keyset read, not a single JDBC stream
            read_table=holder.source.read_table,
        )

    def _capture_targets(self, holder: SourceHolder) -> list[tuple[str, str, dict]]:
        """(schema, table, options) for each captured table. Keys in
        ``capture_tables`` may be bare table names (schema resolved by
        discovery) or ``schema.table``; keydiff sources with an empty
        map capture every rule-included table."""
        cfg = holder.config
        named = list(cfg.capture_tables.items())
        if not named and cfg.capture == "keydiff":
            listing = holder.source.list_tables(holder.source.list_schemas())
            named = [
                (f"{sc}.{tb}", {})
                for sc, tbs in listing.items()
                for tb in tbs
                if holder.rules.allow(sc, tb)
            ]
        out = []
        listing = None
        for key, opts in named:
            if "." in key:
                sc, tb = key.split(".", 1)
            else:
                if listing is None:
                    listing = holder.source.list_tables(
                        holder.source.list_schemas()
                    )
                sc = next(
                    (s for s, tbs in listing.items() if key in tbs), None
                )
                if sc is None:
                    raise ValueError(
                        f"capture table {key!r} not found in any schema"
                    )
                tb = key
            out.append((sc, tb, opts))
        return out

    def capture_seed(self) -> None:
        """Seed capture watermarks/key-state at the CURRENT database
        position — call after :meth:`init_sources` and BEFORE
        :meth:`full_sync` (seed-then-snapshot: rows that change in
        between re-emit on the first poll, a convergent duplicate; the
        reverse order would lose them — see polling.py)."""
        for holder in self.registry.values():
            cfg = holder.config
            if not cfg.capture:
                continue
            cap = self._capture_for(holder)
            for sc, tb, opts in self._capture_targets(holder):
                if cfg.capture == "incrementing":
                    cap.seed(sc, tb, opts["version_col"])
                elif cfg.capture == "timestamp":
                    cap.seed_timestamp(
                        sc, tb, opts["timestamp_col"],
                        incrementing_col=opts.get("incrementing_col"),
                    )
                else:
                    cap.seed_keydiff(
                        sc, tb, holder.source.get_table_primary_keys(sc, tb)
                    )

    def capture_poll(self) -> dict[tuple[int, str, str], int]:
        """One capture poll per captured table: write the delta (or
        diff) into the changelog dir as envelope segments. Follow with
        :meth:`incremental_sync` to apply them — or call
        :meth:`capture_sync` for both."""
        out: dict[tuple[int, str, str], int] = {}
        for holder in self.registry.values():
            cfg = holder.config
            if not cfg.capture:
                continue
            cap = self._capture_for(holder)
            for sc, tb, opts in self._capture_targets(holder):
                pks = holder.source.get_table_primary_keys(sc, tb)
                self._capture_schema_drift(holder, cap, sc, tb)
                if cfg.capture == "incrementing":
                    n = cap.poll_incrementing(
                        sc, tb, pks,
                        version_col=opts["version_col"],
                        deleted_col=opts.get("deleted_col"),
                        overlap=int(opts.get("overlap", 0)),
                    )
                elif cfg.capture == "timestamp":
                    n = cap.poll_timestamp(
                        sc, tb, pks,
                        timestamp_col=opts["timestamp_col"],
                        incrementing_col=opts.get("incrementing_col"),
                        deleted_col=opts.get("deleted_col"),
                        overlap_ms=int(opts.get("overlap_ms", 0)),
                    )
                else:
                    n = cap.poll_keydiff(sc, tb, pks)
                out[(holder.id, sc, tb)] = n
        return out

    def _capture_schema_drift(self, holder: SourceHolder, cap, sc: str, tb: str) -> None:
        """Query-based capture's half of A19's schema evolution: a
        replication log carries DDL as QueryEvents, but polling only
        ever sees the CURRENT table — so live schema drift would be
        silently mangled by the materializer's typed cast until the
        next full snapshot. Before each poll, diff the live schema
        (one JDBC *metadata* round trip — no rows) against the
        materialized one and forward what the log would have carried;
        the drain's ``evolve_schema`` applies it idempotently, so
        re-polls after a failed drain converge.

        - NEW live columns → ``ADD COLUMN`` (pre-drift rows read NULL);
        - live column TYPE drift that is provably WIDENING
          (``functions.ddl.is_widening``: e.g. INT→BIGINT,
          DECIMAL(10,2)→DECIMAL(14,2)) → ``CHANGE col col <decl>``
          (VERDICT r12 #4: before this, values kept flowing through
          the stringly envelope while the materializer cast to the
          OLD type — silent overflow/precision loss);
        - NON-widening drift (e.g. BIGINT→INT) warns LOUDLY and is not
          forwarded — destructive narrowing is the operator's call
          (values keep casting to the old, wider type, which loses
          nothing);
        - dropped source columns are left in place (the column simply
          stops receiving values, matching the log-based path's
          behavior for un-forwarded drops).

        Events are emitted at the CURRENT watermark, not watermark+1
        (ADVICE r12): wm+1 is exactly the next version incrementing
        capture will assign, so after the drain ``_advance_meta``
        would mark a not-yet-emitted position as applied — weakening
        the "positions <= watermark are applied" invariant purge
        safety rests on. The current watermark still drains
        (pos_threshold is the SNAPSHOT pos, a different axis) and
        ``_apply_ddl`` runs before DML within the batch."""
        from .functions.ddl import is_widening
        from .sources.changelog import POS_WIDTH
        from .sources.polling import spark_decl

        mat = self.tables.get((holder.id, sc, tb))
        if mat is None:
            return
        have = {
            f.name: f.dataType
            for f in self.read_table(holder.id, sc, tb).schema.fields
        }
        live = cap._query(f"SELECT * FROM {sc}.{tb}").schema
        pos = (cap._watermark(sc, tb) or "0" * POS_WIDTH).zfill(POS_WIDTH)
        from pyspark.sql import types as T

        for f in live.fields:
            if f.name not in have:
                cap.emit_ddl(
                    sc,
                    tb,
                    f"ALTER TABLE {tb} ADD COLUMN {f.name} "
                    f"{spark_decl(f.dataType.simpleString())}",
                    pos,
                )
                continue
            cur = have[f.name]
            if f.dataType == cur:
                continue
            # same transport axis, different session rendering — the
            # JDBC reader yields LTZ timestamps while DDL declarations
            # decode to NTZ; the stringly envelope carries the same
            # wall clock either way, so this is not drift
            if {type(cur), type(f.dataType)} == {
                T.TimestampType, T.TimestampNTZType
            }:
                continue
            if is_widening(cur, f.dataType):
                cap.emit_ddl(
                    sc,
                    tb,
                    f"ALTER TABLE {tb} CHANGE COLUMN {f.name} {f.name} "
                    f"{spark_decl(f.dataType.simpleString())}",
                    pos,
                )
            else:
                import warnings

                warnings.warn(
                    f"capture {holder.name}: live column {sc}.{tb}."
                    f"{f.name} drifted {cur.simpleString()} -> "
                    f"{f.dataType.simpleString()}, which is NOT a "
                    "lossless widening — not forwarded; the "
                    "materializer keeps casting to the old type. "
                    "Re-snapshot the table to adopt the narrower type "
                    "deliberately.",
                    stacklevel=2,
                )

    def capture_sync(self) -> dict[tuple[int, str, str], int]:
        """Poll every captured source, then drain what the poll wrote
        (availableNow) — one end-to-end query-based CDC round."""
        polled = self.capture_poll()
        self.incremental_sync()
        return polled

    def capture_run(
        self,
        interval_s: float = 5.0,
        max_polls: int | None = None,
        restart_policy: RestartPolicy | None = None,
        sleep=None,
    ) -> int:
        """Continuous query-based capture — the polling analog of the
        reference's incremental Run loop (`internal/cannal/
        incremental.go:100-114`): poll → drain → sleep, with the same
        consecutive-failure backoff policy (a successful round resets
        the counter; ``RetriesExhausted`` after ``max_attempts``
        consecutive failures). ``max_polls`` bounds the loop for tests
        and batch catch-up; None runs until interrupted. Every round is
        the crash-safe :meth:`capture_sync` — a failure mid-round
        re-emits on the next poll and the latest-wins MERGE converges.
        Returns the number of completed rounds."""
        import time as _time

        from .streaming.restart import RetriesExhausted

        policy = restart_policy or RestartPolicy()
        sleep = sleep or _time.sleep
        failures = 0
        backoff = policy.delays()
        rounds = 0
        while max_polls is None or rounds < max_polls:
            try:
                self.capture_sync()
                rounds += 1
                failures = 0
                backoff = policy.delays()  # reset like incremental.go:171-173
                if max_polls is None or rounds < max_polls:
                    sleep(interval_s)
            except Exception as exc:  # noqa: BLE001 — policy decides
                failures += 1
                if failures >= policy.max_attempts:
                    raise RetriesExhausted(failures, exc) from exc
                sleep(next(backoff))
        return rounds

    # -- binlog file ingestion (wire-format decoder, sources/binlog.py) ----

    BINLOG_NS = "#binlog"

    def ingest_binlogs(self) -> dict[tuple[int, str], int]:
        """Decode every NEW binlog file under each source's
        ``binlog_dir`` into its changelog (the replication-socket
        analog for file-shipped binlogs: mysqlbinlog output dirs,
        relay logs, object-store archives). Per source the method
        keeps two meta families under ``{name}#binlog``:

        - a GTID watermark row (the A17 set, JSON) — the decoder skips
          transactions the watermark already covers, so OVERLAPPING
          archive files (the common mysqlbinlog-dump shape) and crash
          re-ingests emit nothing twice (`incremental.go:141-149`,
          ``StartSyncGTID`` resume);
        - one row per fully-ingested FILE, so completed files are
          never re-read at all.

        Crash ordering: segment lands → GTID watermark advances →
        file marked done. A crash between the first two re-decodes
        the file into convergent latest-wins duplicates; between the
        last two, the re-decode is fully GTID-skipped and the file
        just gets re-marked. Follow with :meth:`incremental_sync` (or
        call :meth:`binlog_sync`)."""
        from .functions.gtid import GtidSet
        from .sources.binlog import BinlogEnvelopeDecoder, binlog_to_changelog

        out: dict[tuple[int, str], int] = {}
        for holder in self.registry.values():
            cfg = holder.config
            if not cfg.binlog_dir:
                continue
            ns = f"{cfg.name}{self.BINLOG_NS}"
            wm_json = self.meta.get_pos(ns)
            wm = GtidSet.from_json(wm_json) if wm_json else GtidSet()
            col_names = {
                tuple(k.split(".", 1)): v for k, v in cfg.binlog_tables.items()
            }
            for fname in sorted(os.listdir(cfg.binlog_dir)):
                path = os.path.join(cfg.binlog_dir, fname)
                if not os.path.isfile(path):
                    continue
                if self.meta.get_pos(ns, sc="_file", tb=fname) is not None:
                    continue  # fully ingested in a prior run
                dec = BinlogEnvelopeDecoder(
                    cfg.name, column_names=col_names or None, skip_covered=wm
                )
                n = binlog_to_changelog(
                    path, cfg.changelog, cfg.name, decoder=dec
                )
                wm = wm.union(dec.gtids_seen)
                self.meta.upsert(ns, wm.to_json(), sync_type="binlog")
                self.meta.upsert(
                    ns, str(n), sc="_file", tb=fname, sync_type="binlog"
                )
                out[(holder.id, fname)] = n
        return out

    def binlog_sync(self) -> dict[tuple[int, str], int]:
        """Ingest new binlog files, then drain what they wrote
        (availableNow) — one end-to-end binary-capture round."""
        ingested = self.ingest_binlogs()
        self.incremental_sync()
        return ingested

    # -- maintained grid views (VERDICT r11 #4) ----------------------------

    def _grid_for(self, holder: SourceHolder, schema: str, table: str, opts: dict):
        from .streaming.ivm import IncrementalGrid

        state = os.path.join(
            self.config.state_dir,
            f"src{holder.id}",
            "_views",
            f"grid-{schema}.{table}",
        )
        return IncrementalGrid(
            self.spark,
            state,
            type_col=opts.get("type_col", "event_type"),
            ts_col=opts.get("ts_col", "ts"),
            value_col=opts.get("value_col", "value"),
        )

    def sync_grids(self) -> None:
        """Advance every configured maintained grid view
        (``grid_tables`` in source config) from its source changelog —
        one availableNow drain per view, own checkpoint identity, fold
        cost O(batch + touched cells) per micro-batch with
        calendar-bounded state (streaming/ivm.py::IncrementalGrid).
        Crash/replay safety is the IVM family's run-scoped batch stamp;
        re-running after a drain is a no-op. The views are DERIVED
        state: downstream ``ts_*`` consumers read them through
        :meth:`read_grid` instead of rescanning raw events — at 100 TB
        the raw event volume is touched exactly once, by this fold."""
        for holder in self.registry.values():
            cfg = holder.config
            for key, opts in cfg.grid_tables.items():
                sc, tb = key.split(".", 1)
                grid = self._grid_for(holder, sc, tb, opts)
                stream = self._changelog_stream(cfg, catchup=True).filter(
                    (F.col("schema") == sc) & (F.col("table") == tb)
                )
                ckpt = os.path.join(
                    self.config.checkpoint_dir,
                    f"src{holder.id}",
                    "_views",
                    f"grid-{sc}.{tb}",
                )
                grid.start(
                    stream, ckpt, query_name=f"{cfg.name}.grid.{sc}.{tb}"
                ).awaitTermination()

    def read_grid(self, source_id: int, schema: str, table: str):
        """The DENSE maintained grid for a configured view — the same
        (type, hour, n_events, hour_value) surface as
        ``operators/timeseries._dense_grid``, densified from the
        maintained sparse cells at read time. Feed it to the df-level
        time-series cores (e.g. ``operators.timeseries.forecast_core``)
        for maintained-vs-recomputed parity (tests/test_grid_ivm.py)."""
        holder = self.registry[source_id]
        key = f"{schema}.{table}"
        if key not in holder.config.grid_tables:
            raise KeyError(
                f"source {holder.name!r} has no grid view {key!r} "
                "(configure [source.grid_tables] and run sync_grids)"
            )
        return self._grid_for(
            holder, schema, table, holder.config.grid_tables[key]
        ).read_table()

    # -- step 5: incremental sync -----------------------------------------

    def _changelog_stream(self, cfg: SourceConfig, catchup: bool = False):
        """The source's change stream in envelope form. ``native`` reads
        CHANGE_EVENT_SCHEMA JSON-lines segments; ``debezium`` reads raw
        Debezium message values (one JSON message per line, exactly a
        Kafka topic's values) through the envelope adapter — the public
        interchange format standing in for the reference's go-mysql
        replication client (`internal/cannal/incremental.go:149`), which
        has no OSS-Spark wire equivalent. An optional schema-change topic
        dir unions in as op='ddl' events.

        ``catchup`` widens the per-trigger file bound for availableNow
        backlog drains (see SourceConfig.catchup_files_per_trigger)."""
        mfpt = cfg.max_files_per_trigger
        if catchup:
            mfpt = cfg.catchup_files_per_trigger or 8 * mfpt
        if cfg.changelog_format == "debezium":
            from .sources.debezium import (
                debezium_schema_changes,
                debezium_to_change_events,
                debezium_txn_boundaries,
            )

            def topic(path: str):
                return self.spark.readStream.option(
                    "maxFilesPerTrigger", mfpt
                ).text(path)

            stream = debezium_to_change_events(
                topic(cfg.changelog), default_source=cfg.name
            )
            if cfg.schema_changelog:
                stream = stream.unionByName(
                    debezium_schema_changes(
                        topic(cfg.schema_changelog), default_source=cfg.name
                    )
                )
            if cfg.txn_changelog:
                stream = stream.unionByName(
                    debezium_txn_boundaries(
                        topic(cfg.txn_changelog), default_source=cfg.name
                    )
                )
            return stream
        return read_changelog_stream(self.spark, cfg.changelog, mfpt)

    def _attach_watermark(self, holder: SourceHolder) -> str | None:
        """The consumer watermark that governs replay safety for this
        source: the MOST-BEHIND table's position — its incremental
        watermark row if the stream ever advanced, else its full-sync
        snapshot position (events at-or-below it are skipped by
        ``pos_threshold``, so purging through it loses nothing)."""
        rows = self.meta.all()
        per_table: list[str] = []
        for (src_id, schema, table), _ in self.tables.items():
            if src_id != holder.id:
                continue
            row = rows.get((holder.name, None, table)) or rows.get(
                (holder.name, schema, table)
            )
            if row is None or row.last_pos is None:
                return None  # a table with no recorded position at all
            per_table.append(row.last_pos)
        return min(per_table) if per_table else None

    def safe_purge_pos(self, source_id: int) -> str | None:
        """The highest changelog position retention may purge through
        without ever tripping :meth:`check_attach`: the most-behind
        table's watermark (pass to
        :func:`~go_cdc_spark.sources.retention.purge_changelog`)."""
        return self._attach_watermark(self.registry[source_id])

    def check_attach(self) -> None:
        """Replication attach-time safety (A17/A18): per source, refuse
        to tail a changelog whose retention purged events this engine
        never applied — the explicit form of the server-side check the
        reference delegates to ``StartSyncGTID`` (MySQL error 1236).
        Raises ``PurgedBinlogError`` (GTID flavor) or
        ``ChangelogPurgedError`` (pos flavor); resuming past the hole
        would silently lose rows, so boot must fail loudly instead."""
        from .sources.retention import attach_guard

        for holder in self.registry.values():
            cfg = holder.config
            if not cfg.changelog or not os.path.isdir(cfg.changelog):
                continue
            wm = self._attach_watermark(holder)
            src_pos = self.meta.get_pos(holder.name)
            attach_guard(
                cfg.changelog,
                watermark_pos=wm,
                watermark_gtid_json=src_pos
                if src_pos and src_pos.startswith("{")
                else None,
            )

    def incremental_sync(
        self,
        continuous: bool = False,
        restart_policy: RestartPolicy | None = None,
        demux: bool = True,
    ) -> None:
        """Tail each source's changelog directory and MERGE into the
        materialized tables. ``availableNow`` (default) drains what
        exists and stops — the deterministic test/batch mode;
        ``continuous`` runs until stopped, restarting per
        :class:`RestartPolicy` on failure. Attach safety runs first:
        a purged-past-watermark changelog aborts the boot loudly.

        ``demux`` (default): ONE stream per SOURCE reads the shared
        changelog once per micro-batch and fans the batch out to every
        table's MERGE inside one foreachBatch — the reference's shape
        (one replication socket feeding per-table appliers,
        internal/cannal/incremental.go:69) and the VERDICT r9 #2 fix:
        per-TABLE streams re-scan the whole changelog once per table
        per segment, and every micro-batch rewrites every table's
        state even when the batch carries no rows for it (measured:
        533→>5k ev/s at sf0.1, restart 54.8s→<20s). Within a batch,
        tables the batch does not touch are skipped entirely — their
        state is bit-identical, so skip == apply. Read-committed
        (gated) sources keep the per-table path: the txn gate owns a
        per-table pending store + watermark whose semantics are
        per-stream. History (SCD2) sources ALSO keep the per-table
        path: Scd2Materializer's interval derivation is replay-
        sensitive (a replayed event re-derives rows that already exist
        as closed intervals, scd2.py), and switching an existing
        deployment onto the demux checkpoint identity would replay the
        whole drained changelog through it — the run_id-scoped replay
        stamp returns None under a NEW checkpoint, and pos_threshold
        only filters events at-or-below the snapshot position, not
        already-applied incremental events. For flat (pos-latest-wins
        MERGE) tables that replay IS idempotent, so switching modes is
        safe but wasteful: the new checkpoint drains the changelog
        once more."""
        self.check_attach()

        def make_start(holder: SourceHolder, schema: str, table: str, mat):
            cfg = holder.config

            def start():
                stream = self._changelog_stream(cfg, catchup=not continuous)
                keep = holder.rules.to_column(
                    F.col("schema"), F.col("table")
                ) & ((F.col("schema") == schema) & (F.col("table") == table))
                if cfg.read_committed:
                    # commit/rollback events are TRANSACTION-scoped, not
                    # table-scoped (a MySQL XID event carries no table —
                    # NULL schema/table would fail BOTH the rule filter
                    # and the table filter — and a txn can span tables):
                    # every gated table's stream must see them, or rows
                    # of cross-table transactions strand in the pending
                    # store forever with a frozen watermark
                    keep = keep | F.col("op").isin("commit", "rollback")
                stream = stream.filter(keep)
                ckpt = os.path.join(
                    self.config.checkpoint_dir, f"src{holder.id}", schema, table
                )
                qn = f"{cfg.name}.{schema}.{table}"
                if cfg.read_committed:
                    gate = ReadCommittedGate(
                        self.spark,
                        pending_path=self._state_path(holder, schema, table)
                        + ".pending",
                        downstream=mat.process_batch,
                        meta=self.meta,
                        data_source_id=cfg.name,
                        table=table,
                    )
                    return gate.start(stream, ckpt, query_name=qn)
                return mat.start(stream, ckpt, query_name=qn)

            return start

        def make_demux_start(holder: SourceHolder, mats: dict):
            """One stream per SOURCE: the changelog is read ONCE per
            micro-batch, pinned, demuxed to per-table slices, and only
            tables the batch touches run their MERGE."""
            cfg = holder.config

            def start():
                stream = self._changelog_stream(
                    cfg, catchup=not continuous
                ).filter(
                    holder.rules.to_column(F.col("schema"), F.col("table"))
                )
                ckpt = os.path.join(
                    self.config.checkpoint_dir, f"src{holder.id}", "_demux"
                )
                for mat in mats.values():
                    # replay-guard stamp parity with mat.start(): state
                    # stamps carry the DEMUX checkpoint identity, so a
                    # re-pointed checkpoint (batch ids restart at 0)
                    # cannot silently skip batches
                    mat._run_id = ckpt

                def demux_batch(batch, batch_id: int) -> None:
                    batch = batch.persist()
                    try:
                        touched = {
                            (r["schema"], r["table"])
                            for r in batch.select("schema", "table")
                            .distinct()
                            .collect()  # catalog-rate: ≤ |tables| rows
                        }
                        work = [
                            ((schema, table), mat)
                            for (schema, table), mat in mats.items()
                            if (schema, table) in touched
                            # untouched state is bit-identical: skip == apply
                        ]

                        def apply_one(item):
                            (schema, table), mat = item
                            mat.process_batch(
                                batch.filter(
                                    (F.col("schema") == schema)
                                    & (F.col("table") == table)
                                ),
                                batch_id,
                            )

                        # Bounded fan-out over touched tables (VERDICT r10
                        # #3): at 100+ tables a sequential loop serializes
                        # the batch behind its slowest table. Threads submit
                        # independent Spark jobs (snapshot_all's pattern);
                        # per-table state dirs are disjoint and the meta
                        # store upsert holds its own lock. Failure semantics
                        # match the sequential loop: the first raise fails
                        # the batch, the replayed batch skips tables whose
                        # applied-batch stamp already advanced.
                        workers = effective_merge_workers(
                            cfg.merge_concurrency,
                            len(work),
                            self.spark.sparkContext.master,
                        )
                        if workers <= 1:
                            for item in work:
                                apply_one(item)
                        else:
                            from concurrent.futures import ThreadPoolExecutor

                            with ThreadPoolExecutor(max_workers=workers) as pool:
                                for fut in [
                                    pool.submit(apply_one, it) for it in work
                                ]:
                                    fut.result()
                    finally:
                        batch.unpersist()

                return (
                    stream.writeStream.queryName(f"{cfg.name}._demux")
                    .option("checkpointLocation", ckpt)
                    .foreachBatch(demux_batch)
                    .trigger(availableNow=True)
                    .start()
                )

            return start

        by_source: dict[int, dict] = {}
        for (src_id, schema, table), mat in self.tables.items():
            if self.registry[src_id].config.changelog:
                by_source.setdefault(src_id, {})[(schema, table)] = mat

        work = []
        for src_id, mats in by_source.items():
            holder = self.registry[src_id]
            if (
                demux
                and not holder.config.read_committed
                and not holder.config.history
            ):
                work.append(make_demux_start(holder, mats))
            else:
                work += [
                    make_start(holder, schema, table, mat)
                    for (schema, table), mat in mats.items()
                ]

        def make_dlq_start(holder: SourceHolder):
            """One quarantine stream per source, SEPARATE from the
            per-table delivery queries: malformed lines parse to NULL
            schema/table, so a per-table rule filter would drop them
            before any consumer saw them — and attaching the capture
            to every table's stream would quarantine each bad line
            once per table."""
            cfg = holder.config

            def start():
                from .streaming.dlq import DeadLetterQueue, read_changelog_stream_dlq

                dlq = DeadLetterQueue(self.spark, self.quarantine_path(cfg.name))
                stream = read_changelog_stream_dlq(
                    self.spark, cfg.changelog, cfg.max_files_per_trigger
                )
                ckpt = os.path.join(
                    self.config.checkpoint_dir, f"src{holder.id}", "_quarantine"
                )

                def pb(batch, batch_id):
                    dlq.split_batch(batch, batch_id)  # clean side unused here

                return (
                    stream.writeStream.queryName(f"{cfg.name}.quarantine")
                    .option("checkpointLocation", ckpt)
                    .foreachBatch(pb)
                    .trigger(availableNow=True)
                    .start()
                )

            return start

        work += [
            make_dlq_start(holder)
            for holder in self.registry.values()
            if holder.config.changelog and holder.config.quarantine
        ]
        if continuous and len(work) > 1:
            # long-lived tails must run concurrently (one blocked
            # awaitTermination would starve the rest); each gets its own
            # restart loop, like the reference's per-source goroutine
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=len(work)) as pool:
                futures = [
                    pool.submit(run_with_restart, s, restart_policy) for s in work
                ]
                for f in futures:
                    f.result()
        else:
            for s in work:
                run_with_restart(s, restart_policy)

    # -- the whole boot sequence ------------------------------------------

    def run(self, continuous: bool = False) -> dict:
        self.init_sources()
        snaps = self.full_sync()
        self.incremental_sync(continuous=continuous)
        return {
            "sources": {h.id: h.name for h in self.registry.values()},
            "tables": {
                f"{sid}/{sc}/{tb}": mat.state_path
                for (sid, sc, tb), mat in self.tables.items()
            },
            "snapshots": {
                sid: [(s.schema, s.table, s.pos, s.error) for s in lst]
                for sid, lst in snaps.items()
            },
        }

    def read_table(self, source_id: int, schema: str, table: str):
        """Queryable current state of a synced table (tombstones hidden).
        Same contract whether the table is materialized flat or as SCD2
        history (``history = true``) — proven equal in
        tests/test_scd2_stream.py."""
        mat = self.tables[(source_id, schema, table)]
        if isinstance(mat, Scd2Materializer):
            return mat.current()
        return mat.read_table()

    def _history_mat(self, source_id: int, schema: str, table: str) -> Scd2Materializer:
        mat = self.tables[(source_id, schema, table)]
        if not isinstance(mat, Scd2Materializer):
            raise ValueError(
                f"{schema}.{table} is materialized flat; set history = true "
                "on its source to keep SCD2 versions"
            )
        return mat

    def read_history(self, source_id: int, schema: str, table: str):
        """All row versions with validity-position intervals
        (``__valid_from_pos`` / ``__valid_to_pos``, NULL = open)."""
        return self._history_mat(source_id, schema, table).history()

    def read_table_asof(self, source_id: int, schema: str, table: str, pos: str):
        """Time travel: the table as it stood at changelog position
        ``pos`` (interval containment over the SCD2 history)."""
        return self._history_mat(source_id, schema, table).asof(pos)

    def _monitored_tables(self, holder: SourceHolder) -> list[tuple[str, str]]:
        """(schema, table) pairs to monitor: the live registry when
        this engine ran full_sync, else the state-directory layout a
        PRIOR run materialized (``state_dir/src{id}/{schema}/{table}``)
        — so ``status`` works on an existing deployment without
        re-snapshotting anything."""
        mats = [(sc, tb) for (sid, sc, tb) in self.tables if sid == holder.id]
        if mats:
            return mats
        base = os.path.join(self.config.state_dir, f"src{holder.id}")
        out: list[tuple[str, str]] = []
        if os.path.isdir(base):
            for sc in sorted(os.listdir(base)):
                scdir = os.path.join(base, sc)
                # _capture / _views are engine-internal state families
                if sc.startswith("_") or not os.path.isdir(scdir):
                    continue
                for tb in sorted(os.listdir(scdir)):
                    p = os.path.join(scdir, tb)
                    # skip sidecars: {table}.pending (txn gate),
                    # {table}.aliases.json, storeio tmp dirs
                    if os.path.isdir(p) and "." not in tb:
                        out.append((sc, tb))
        return out

    def status(self) -> dict:
        """The operational one-stop report (`status` CLI): per source,
        both lag faces — :meth:`freshness` (changelog → table) and
        :meth:`capture_lag` (database → changelog). Keys are stringly
        (JSON-friendly)."""
        fresh = self.freshness()
        cap = self.capture_lag()
        out: dict = {}
        for holder in self.registry.values():
            entry: dict = {"id": holder.id, "tables": {}, "capture": {}}
            for (sid, sc, tb), rep in fresh.items():
                if sid == holder.id:
                    entry["tables"][f"{sc}.{tb}"] = rep
            for (sid, sc, tb), rep in cap.items():
                if sid == holder.id:
                    entry["capture"][f"{sc}.{tb}"] = rep
            out[holder.name] = entry
        return out

    def freshness(self) -> dict:
        """Replication-lag report per materialized table — the
        monitoring face of the reference's GTID watermark bookkeeping
        (A21, `internal/cannal/incremental.go:195-208`): how far the
        source changelog has advanced past what each table has APPLIED.

        Per (source_id, schema, table):

        - ``applied_pos`` — the table's incremental watermark (falls
          back to its snapshot position, the same resolution order as
          the purge-safety watermark in :meth:`_attach_watermark`);
        - ``latest_pos`` — the max event position currently in the
          changelog for that table (None if the changelog carries
          nothing for it);
        - ``events_behind`` — events in the changelog above
          ``applied_pos`` (what one :meth:`incremental_sync` drain
          would apply);
        - ``fresh`` — nothing pending.

        Cost: ONE distributed scan of each native-format changelog dir
        (counts aggregate map-side; the applied-watermark table is a
        catalog-rate broadcast); output is catalog-rate. Debezium-format
        sources are skipped (their lag lives in the Kafka consumer
        offset, not a file dir)."""
        from .sources.changelog import CHANGE_EVENT_SCHEMA

        rows = self.meta.all()
        out: dict = {}
        for holder in self.registry.values():
            cfg = holder.config
            if (
                not cfg.changelog
                or cfg.changelog_format != "native"
                or not os.path.isdir(cfg.changelog)
            ):
                continue
            mats = self._monitored_tables(holder)
            if not mats:
                continue
            applied = {}
            for sc, tb in mats:
                row = rows.get((holder.name, None, tb)) or rows.get(
                    (holder.name, sc, tb)
                )
                applied[(sc, tb)] = None if row is None else row.last_pos
            app_df = self.spark.createDataFrame(
                [(sc, tb, applied[(sc, tb)]) for sc, tb in mats],
                "schema string, table string, applied_pos string",
            )
            ev = (
                self.spark.read.schema(CHANGE_EVENT_SCHEMA)
                .json(cfg.changelog)
                .select("schema", "table", "pos")
            )
            agg = (
                ev.join(F.broadcast(app_df), ["schema", "table"])
                .groupBy("schema", "table", "applied_pos")
                .agg(
                    F.max("pos").alias("latest_pos"),
                    F.sum(
                        F.when(
                            F.col("applied_pos").isNull()
                            | (F.col("pos") > F.col("applied_pos")),
                            1,
                        ).otherwise(0)
                    )
                    .cast("long")
                    .alias("events_behind"),
                )
            )
            got = {(r["schema"], r["table"]): r for r in agg.collect()}
            for sc, tb in mats:
                r = got.get((sc, tb))
                behind = 0 if r is None else int(r["events_behind"])
                out[(holder.id, sc, tb)] = {
                    "applied_pos": applied[(sc, tb)],
                    "latest_pos": None if r is None else r["latest_pos"],
                    "events_behind": behind,
                    "fresh": behind == 0,
                }
        return out

    def capture_lag(self) -> dict:
        """The capture-side half of the lag story (:meth:`freshness`
        covers changelog→table): how far each POLLED table's source
        database has advanced past the capture watermark — i.e. what
        the next poll would emit. ``incrementing`` compares the stored
        watermark to the live MAX(version) (one pushed-down scalar
        aggregate per table, O(index) in the database); ``timestamp``
        does the same over MAX(timestamp_col) and reports ``behind``
        in SECONDS of lag; ``keydiff``
        has no version axis, so it reports the live row count vs the
        key-state size (a drifted count proves pending changes; equal
        counts prove nothing — documented as ``approximate=True``).

        Per (source_id, schema, table): ``watermark``, ``source_head``,
        ``behind`` (versions / |rowcount delta|), ``approximate``."""
        out: dict = {}
        for holder in self.registry.values():
            cfg = holder.config
            if not cfg.capture:
                continue
            cap = self._capture_for(holder)
            for sc, tb, opts in self._capture_targets(holder):
                wm = cap._watermark(sc, tb)
                if cfg.capture == "incrementing":
                    vc = opts["version_col"]
                    row = cap._query(
                        f"SELECT MAX({vc}) AS v FROM {sc}.{tb}"
                    ).first()
                    head = None if row is None or row[0] is None else int(row[0])
                    behind = (
                        0
                        if head is None
                        else max(0, head - int(wm or 0))
                    )
                    out[(holder.id, sc, tb)] = {
                        "watermark": wm,
                        "source_head": head,
                        "behind": behind,
                        "approximate": False,
                    }
                elif cfg.capture == "timestamp":
                    # behind is SECONDS of replication lag (live
                    # MAX(ts) vs the watermarked ts) — the natural
                    # monitoring unit for a last-modified axis
                    tc = opts["timestamp_col"]
                    df = cap._query(f"SELECT MAX({tc}) AS t FROM {sc}.{tb}")
                    row = df.select(F.unix_micros(df[df.columns[0]])).first()
                    head = None if row is None or row[0] is None else int(row[0])
                    wm_micros = int(wm[:20]) if wm else 0
                    behind = (
                        0.0
                        if head is None
                        else max(0, head - wm_micros) / 1_000_000
                    )
                    out[(holder.id, sc, tb)] = {
                        "watermark": wm,
                        "source_head": head,
                        "behind": behind,
                        "approximate": False,
                    }
                else:
                    from . import storeio

                    row = cap._query(
                        f"SELECT COUNT(*) AS n FROM {sc}.{tb}"
                    ).first()
                    live_n = 0 if row is None else int(row[0])
                    state_path = cap._key_state_path(sc, tb)
                    storeio.recover(state_path)
                    state_n = (
                        self.spark.read.parquet(state_path).count()
                        if os.path.exists(state_path)
                        else 0
                    )
                    out[(holder.id, sc, tb)] = {
                        "watermark": wm,
                        "source_head": live_n,
                        "behind": abs(live_n - state_n),
                        "approximate": True,
                    }
        return out

    def quarantine_path(self, source_name: str) -> str:
        return os.path.join(self.config.state_dir, "quarantine", source_name)

    def read_quarantine(self, source_name: str):
        """Quarantined changelog events for a source (reason, raw line,
        surviving parsed fields, batch id) — empty if the source is
        clean or quarantine is off."""
        from .streaming.dlq import DeadLetterQueue

        return DeadLetterQueue(
            self.spark, self.quarantine_path(source_name)
        ).read_table()


def run(config_path: str, spark: SparkSession | None = None, continuous: bool = False) -> dict:
    """`cmd/cdc/main.go` in one call: load config, boot, sync."""
    return Engine(load_config(config_path), spark=spark).run(continuous=continuous)
