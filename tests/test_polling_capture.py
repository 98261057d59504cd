"""Query-based incremental CDC against a LIVE database (VERDICT r10 #1).

The reference's capture identity is the MySQL replication socket
(`internal/cannal/incremental.go:69-178`) — unavailable here. These
tests close the fidelity gap the public way: poll-based capture
(sources/polling.py, the Kafka-Connect-JDBC / Debezium-incremental-
snapshot pattern) against embedded Derby, wired through the SAME
Engine pipeline: discovery → snapshot → poll → changelog segments →
streaming MERGE, with INSERT/UPDATE/DELETE executed in the database
between polls and the materialized table asserted to converge exactly.
"""

from __future__ import annotations

import pytest

from go_cdc_spark.app import Engine
from go_cdc_spark.config import load_config

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def _derby(spark, tmp_path):
    url = f"jdbc:derby:{tmp_path}/derbydb;create=true"
    jvm = spark.sparkContext._jvm
    jvm.java.lang.Class.forName(DERBY_DRIVER)
    conn = jvm.java.sql.DriverManager.getConnection(url)
    return url, conn


def _config(tmp_path, url, capture, capture_tables_toml="", include="CUST"):
    cfg = f"""
[engine]
meta_path      = "{tmp_path}/meta"
state_dir      = "{tmp_path}/state"
checkpoint_dir = "{tmp_path}/ckpt"

[[source]]
id        = 1
name      = "derbysrc"
type      = "jdbc_metadata"
url       = "{url}"
changelog = "{tmp_path}/changelog"
capture   = "{capture}"
[source.properties]
driver = "{DERBY_DRIVER}"
{capture_tables_toml}
[source.rules.global]
include_tables = ["{include}"]
"""
    p = tmp_path / "config.toml"
    p.write_text(cfg)
    (tmp_path / "changelog").mkdir(exist_ok=True)
    return str(p)


def _db_rows(conn, sql):
    st = conn.createStatement()
    rs = st.executeQuery(sql)
    n = rs.getMetaData().getColumnCount()
    out = set()
    while rs.next():
        out.add(tuple(rs.getObject(i + 1) for i in range(n)))
    rs.close()
    return out


def _mat_rows(engine, table, cols):
    df = engine.read_table(1, "APP", table).select(*cols)
    return {tuple(r) for r in df.collect()}


def test_keydiff_capture_converges_with_hard_deletes(spark, tmp_path):
    """snapshot → mutate (INSERT/UPDATE/hard DELETE) → poll → drain →
    exact readback, twice over — then an idle poll emits nothing."""
    url, conn = _derby(spark, tmp_path)
    st = conn.createStatement()
    st.executeUpdate(
        "CREATE TABLE APP.CUST (K1 INT NOT NULL PRIMARY KEY, "
        "NAME VARCHAR(30), BAL DOUBLE)"
    )
    ps = conn.prepareStatement("INSERT INTO APP.CUST VALUES (?, ?, ?)")
    for k in range(1, 21):
        ps.setInt(1, k)
        ps.setString(2, f"name{k}")
        ps.setDouble(3, k * 1.25)
        ps.executeUpdate()

    engine = Engine(load_config(_config(tmp_path, url, "keydiff")), spark=spark)
    engine.init_sources()
    engine.capture_seed()  # seed-then-snapshot (see polling.py)
    engine.full_sync()
    cols = ("K1", "NAME", "BAL")
    assert _mat_rows(engine, "CUST", cols) == _db_rows(
        conn, "SELECT K1, NAME, BAL FROM APP.CUST"
    )

    # round 1: insert, update, hard delete — all between polls
    st.executeUpdate("INSERT INTO APP.CUST VALUES (21, 'newbie', 0.5)")
    st.executeUpdate("UPDATE APP.CUST SET NAME='renamed', BAL=99.75 WHERE K1=3")
    st.executeUpdate("DELETE FROM APP.CUST WHERE K1=7")
    polled = engine.capture_sync()
    assert polled[(1, "APP", "CUST")] == 3
    want = _db_rows(conn, "SELECT K1, NAME, BAL FROM APP.CUST")
    got = _mat_rows(engine, "CUST", cols)
    assert got == want
    assert (21, "newbie", 0.5) in got
    assert not any(r[0] == 7 for r in got)

    # round 2: delete the row round 1 inserted + re-insert a deleted key
    st.executeUpdate("DELETE FROM APP.CUST WHERE K1 = 21")
    st.executeUpdate("INSERT INTO APP.CUST VALUES (7, 'reborn', 7.0)")
    engine.capture_sync()
    assert _mat_rows(engine, "CUST", cols) == _db_rows(
        conn, "SELECT K1, NAME, BAL FROM APP.CUST"
    )

    # idle poll: no changes -> zero events, state still exact
    polled = engine.capture_sync()
    assert polled[(1, "APP", "CUST")] == 0
    assert _mat_rows(engine, "CUST", cols) == _db_rows(
        conn, "SELECT K1, NAME, BAL FROM APP.CUST"
    )

    # keydiff capture_lag: rowcount drift is approximate lag evidence
    lag = engine.capture_lag()[(1, "APP", "CUST")]
    assert lag["approximate"] is True and lag["behind"] == 0
    st.executeUpdate("INSERT INTO APP.CUST VALUES (30, 'drift', 1.0)")
    assert engine.capture_lag()[(1, "APP", "CUST")]["behind"] == 1
    engine.capture_sync()
    assert engine.capture_lag()[(1, "APP", "CUST")]["behind"] == 0
    conn.close()


def test_incrementing_capture_high_watermark_and_soft_delete(spark, tmp_path):
    """High-watermark polling over a version column: only the delta
    crosses the wire (watermark advances in meta), soft-deleted rows
    tombstone, and a repeated poll after no changes emits nothing."""
    url, conn = _derby(spark, tmp_path)
    st = conn.createStatement()
    st.executeUpdate(
        "CREATE TABLE APP.ITEMS (K1 INT NOT NULL PRIMARY KEY, "
        "NAME VARCHAR(30), V BIGINT, DELETED SMALLINT)"
    )
    ps = conn.prepareStatement("INSERT INTO APP.ITEMS VALUES (?, ?, ?, 0)")
    for k in range(1, 11):
        ps.setInt(1, k)
        ps.setString(2, f"item{k}")
        ps.setLong(3, k)  # versions 1..10
        ps.executeUpdate()

    capture_toml = """[source.capture_tables.ITEMS]
version_col = "V"
deleted_col = "DELETED"
"""
    engine = Engine(
        load_config(_config(tmp_path, url, "incrementing", capture_toml, include="ITEMS")),
        spark=spark,
    )
    engine.init_sources()
    engine.capture_seed()
    engine.full_sync()

    # watermark seeded at the pre-snapshot max version
    assert engine.meta.get_pos("derbysrc#capture", sc="APP", tb="ITEMS") == "000000000010"

    st.executeUpdate("INSERT INTO APP.ITEMS VALUES (11, 'fresh', 11, 0)")
    st.executeUpdate("UPDATE APP.ITEMS SET NAME='bumped', V=12 WHERE K1=4")
    st.executeUpdate("UPDATE APP.ITEMS SET DELETED=1, V=13 WHERE K1=9")  # soft delete
    polled = engine.capture_sync()
    assert polled[(1, "APP", "ITEMS")] == 3  # ONLY the delta was emitted
    assert engine.meta.get_pos("derbysrc#capture", sc="APP", tb="ITEMS") == "000000000013"

    got = {r.K1: (r.NAME, r.V) for r in engine.read_table(1, "APP", "ITEMS").collect()}
    assert got[11] == ("fresh", 11)
    assert got[4] == ("bumped", 12)
    assert 9 not in got  # tombstoned
    want = _db_rows(conn, "SELECT K1, NAME, V FROM APP.ITEMS WHERE DELETED = 0")
    assert {(k, n, v) for k, (n, v) in got.items()} == want

    # idle poll: watermark unchanged, nothing emitted
    polled = engine.capture_sync()
    assert polled[(1, "APP", "ITEMS")] == 0
    assert engine.meta.get_pos("derbysrc#capture", sc="APP", tb="ITEMS") == "000000000013"
    conn.close()


def test_incrementing_capture_default_shape_no_deleted_col(spark, tmp_path):
    """The STANDARD Kafka-Connect ``incrementing`` config — a version
    column and nothing else (no soft-delete flag) — must capture
    inserts+updates end-to-end (VERDICT r11 #1: this exact shape used
    to crash with NameError on its first poll and no gate saw it)."""
    url, conn = _derby(spark, tmp_path)
    st = conn.createStatement()
    st.executeUpdate(
        "CREATE TABLE APP.ITEMS (K1 INT NOT NULL PRIMARY KEY, "
        "NAME VARCHAR(30), V BIGINT)"
    )
    for k in range(1, 11):
        st.executeUpdate(f"INSERT INTO APP.ITEMS VALUES ({k}, 'item{k}', {k})")

    capture_toml = """[source.capture_tables.ITEMS]
version_col = "V"
"""
    engine = Engine(
        load_config(_config(tmp_path, url, "incrementing", capture_toml, include="ITEMS")),
        spark=spark,
    )
    engine.init_sources()
    engine.capture_seed()
    engine.full_sync()
    assert engine.meta.get_pos("derbysrc#capture", sc="APP", tb="ITEMS") == "000000000010"

    # insert + update between polls -> exactly the delta is emitted
    st.executeUpdate("INSERT INTO APP.ITEMS VALUES (11, 'fresh', 11)")
    st.executeUpdate("UPDATE APP.ITEMS SET NAME='bumped', V=12 WHERE K1=4")
    polled = engine.capture_sync()
    assert polled[(1, "APP", "ITEMS")] == 2
    assert engine.meta.get_pos("derbysrc#capture", sc="APP", tb="ITEMS") == "000000000012"
    cols = ("K1", "NAME", "V")
    assert _mat_rows(engine, "ITEMS", cols) == _db_rows(
        conn, "SELECT K1, NAME, V FROM APP.ITEMS"
    )

    # idle poll: zero events, watermark stays
    polled = engine.capture_sync()
    assert polled[(1, "APP", "ITEMS")] == 0
    assert engine.meta.get_pos("derbysrc#capture", sc="APP", tb="ITEMS") == "000000000012"
    assert _mat_rows(engine, "ITEMS", cols) == _db_rows(
        conn, "SELECT K1, NAME, V FROM APP.ITEMS"
    )
    conn.close()


def test_crash_replay_segments_get_fresh_filenames(spark, tmp_path):
    """Crash between _emit and the watermark advance (ADVICE r11
    medium): the replay re-emits the same changes PLUS anything that
    committed in between. Spark's FileStreamSource tracks seen files by
    path — if the replay reused the original segment names, the
    already-drained paths would never be re-read and the in-between
    rows would be lost under an advancing watermark. Unique per-emit
    filenames make the replay a new, drained, convergent duplicate."""
    from go_cdc_spark.sources.polling import PollingCapture

    url, conn = _derby(spark, tmp_path)
    st = conn.createStatement()
    st.executeUpdate(
        "CREATE TABLE APP.ITEMS (K1 INT NOT NULL PRIMARY KEY, "
        "NAME VARCHAR(30), V BIGINT)"
    )
    for k in range(1, 6):
        st.executeUpdate(f"INSERT INTO APP.ITEMS VALUES ({k}, 'item{k}', {k})")
    capture_toml = """[source.capture_tables.ITEMS]
version_col = "V"
"""
    engine = Engine(
        load_config(_config(tmp_path, url, "incrementing", capture_toml, include="ITEMS")),
        spark=spark,
    )
    engine.init_sources()
    engine.capture_seed()
    engine.full_sync()

    # poll with the watermark advance suppressed = crash right after
    # the emit; the emitted segment still gets DRAINED by the stream
    st.executeUpdate("INSERT INTO APP.ITEMS VALUES (6, 'six', 6)")
    st.executeUpdate("INSERT INTO APP.ITEMS VALUES (7, 'seven', 7)")
    orig = PollingCapture._set_watermark
    PollingCapture._set_watermark = lambda self, *a, **k: None
    try:
        engine.capture_sync()  # emits v6,v7; drains them; watermark stuck at 5
    finally:
        PollingCapture._set_watermark = orig
    assert engine.meta.get_pos("derbysrc#capture", sc="APP", tb="ITEMS") == "000000000005"

    # a row commits between the original poll and the replay
    st.executeUpdate("INSERT INTO APP.ITEMS VALUES (8, 'eight', 8)")
    # the replay poll re-emits v6,v7 (same watermark tag!) plus v8 —
    # with reused filenames the segment would overwrite an
    # already-seen path and v8 would never reach the stream
    polled = engine.capture_sync()
    assert polled[(1, "APP", "ITEMS")] == 3
    cols = ("K1", "NAME", "V")
    got = _mat_rows(engine, "ITEMS", cols)
    assert got == _db_rows(conn, "SELECT K1, NAME, V FROM APP.ITEMS")
    assert (8, "eight", 8) in got  # the in-between commit survived
    assert engine.meta.get_pos("derbysrc#capture", sc="APP", tb="ITEMS") == "000000000008"
    conn.close()


def test_overlap_window_recovers_late_commit(spark, tmp_path):
    """The documented loss case of watermark polling (polling.py): a
    row committed LATE with an already-polled version. overlap=0
    reproduces the loss; a configured overlap window re-polls
    ``v > wm - overlap`` and recovers it (convergent latest-wins
    duplicates for the re-seen rows)."""
    url, conn = _derby(spark, tmp_path)
    st = conn.createStatement()
    st.executeUpdate(
        "CREATE TABLE APP.ITEMS (K1 INT NOT NULL PRIMARY KEY, "
        "NAME VARCHAR(30), V BIGINT)"
    )
    for k in range(1, 6):
        st.executeUpdate(f"INSERT INTO APP.ITEMS VALUES ({k}, 'item{k}', {k})")

    capture_toml = """[source.capture_tables.ITEMS]
version_col = "V"
"""
    engine = Engine(
        load_config(_config(tmp_path, url, "incrementing", capture_toml,
                            include="ITEMS")),
        spark=spark,
    )
    engine.init_sources()

    # --- zero overlap: the documented loss ---
    engine.capture_seed()
    engine.full_sync()
    st.executeUpdate("INSERT INTO APP.ITEMS VALUES (9, 'fast', 9)")
    engine.capture_sync()  # watermark -> 9
    assert engine.meta.get_pos("derbysrc#capture", sc="APP", tb="ITEMS") == "000000000009"
    # late commit: version 7 assigned before the poll, committed after
    st.executeUpdate("INSERT INTO APP.ITEMS VALUES (6, 'late', 7)")
    polled = engine.capture_sync()
    assert polled[(1, "APP", "ITEMS")] == 0  # the loss, reproduced
    cols = ("K1", "NAME", "V")
    assert (6, "late", 7) not in _mat_rows(engine, "ITEMS", cols)

    # --- overlap window on the same source: the late commit is recovered ---
    engine.registry[1].config.capture_tables["ITEMS"]["overlap"] = 5
    polled = engine.capture_sync()  # polls v > 9-5 = 4
    assert polled[(1, "APP", "ITEMS")] == 3  # v∈{5,7,9}: item5, late, fast
    got = _mat_rows(engine, "ITEMS", cols)
    assert (6, "late", 7) in got
    assert got == _db_rows(conn, "SELECT K1, NAME, V FROM APP.ITEMS")
    # watermark never regresses below the pre-overlap high water
    assert engine.meta.get_pos("derbysrc#capture", sc="APP", tb="ITEMS") == "000000000009"
    conn.close()


def test_capture_config_validation(tmp_path):
    bad = f"""
[engine]
meta_path      = "{tmp_path}/meta"
state_dir      = "{tmp_path}/state"
checkpoint_dir = "{tmp_path}/ckpt"

[[source]]
id      = 1
name    = "s"
type    = "jdbc_metadata"
url     = "jdbc:derby:x"
capture = "incrementing"
"""
    p = tmp_path / "bad.toml"
    p.write_text(bad)
    with pytest.raises(ValueError, match="capture needs a changelog"):
        load_config(str(p))

    bad2 = bad.replace('capture = "incrementing"',
                       f'capture = "magic"\nchangelog = "{tmp_path}/cl"')
    p.write_text(bad2)
    with pytest.raises(ValueError, match="unknown capture"):
        load_config(str(p))

    bad3 = bad.replace(
        'capture = "incrementing"',
        f'capture = "incrementing"\nchangelog = "{tmp_path}/cl"\n'
        "[source.capture_tables.ITEMS]\ndeleted_col = \"D\"",
    )
    p.write_text(bad3)
    with pytest.raises(ValueError, match="version_col"):
        load_config(str(p))

    # incrementing with an EMPTY capture_tables map is a silent no-op
    # (version_col is per-table, nothing auto-discovers) — reject at
    # load time (ADVICE r11 low)
    bad4 = bad.replace(
        'capture = "incrementing"',
        f'capture = "incrementing"\nchangelog = "{tmp_path}/cl"',
    )
    p.write_text(bad4)
    with pytest.raises(ValueError, match="non-empty capture_tables"):
        load_config(str(p))

    # negative / non-int overlap rejected
    bad5 = bad.replace(
        'capture = "incrementing"',
        f'capture = "incrementing"\nchangelog = "{tmp_path}/cl"\n'
        '[source.capture_tables.ITEMS]\nversion_col = "V"\noverlap = -3',
    )
    p.write_text(bad5)
    with pytest.raises(ValueError, match="overlap"):
        load_config(str(p))


def test_capture_run_polls_with_backoff_reset(spark, tmp_path):
    """Continuous polling loop (capture_run): mutations injected between
    rounds (via the sleep hook) converge round-by-round; a transient
    failure backs off per RestartPolicy and a successful round resets
    the consecutive counter (incremental.go:100-114 parity)."""
    from go_cdc_spark.streaming.restart import RestartPolicy, RetriesExhausted

    url, conn = _derby(spark, tmp_path)
    st = conn.createStatement()
    st.executeUpdate(
        "CREATE TABLE APP.CUST (K1 INT NOT NULL PRIMARY KEY, NAME VARCHAR(30), BAL DOUBLE)"
    )
    for k in range(1, 6):
        st.executeUpdate(f"INSERT INTO APP.CUST VALUES ({k}, 'n{k}', {k}.0)")
    engine = Engine(load_config(_config(tmp_path, url, "keydiff")), spark=spark)
    engine.init_sources()
    engine.capture_seed()
    engine.full_sync()

    mutations = iter([
        "INSERT INTO APP.CUST VALUES (6, 'six', 6.0)",
        "DELETE FROM APP.CUST WHERE K1 = 2",
    ])

    def sleep_and_mutate(_dt):
        sql = next(mutations, None)
        if sql:
            st.executeUpdate(sql)

    rounds = engine.capture_run(interval_s=0.01, max_polls=3, sleep=sleep_and_mutate)
    assert rounds == 3
    cols = ("K1", "NAME", "BAL")
    assert _mat_rows(engine, "CUST", cols) == _db_rows(
        conn, "SELECT K1, NAME, BAL FROM APP.CUST"
    )
    conn.close()

    # transient failures: two raises then success -> loop survives with
    # backoff sleeps; exhaustion raises RetriesExhausted
    calls = {"n": 0}
    slept: list[float] = []

    def flaky():
        calls["n"] += 1
        if calls["n"] <= 2:
            raise RuntimeError("transient")
        return {}

    engine.capture_sync = flaky
    rounds = engine.capture_run(
        interval_s=0.0,
        max_polls=1,
        restart_policy=RestartPolicy(max_attempts=5, base_delay=0.25, cap=1.0),
        sleep=slept.append,
    )
    assert rounds == 1 and calls["n"] == 3
    assert slept[:2] == [0.25, 0.5]  # exponential backoff, not interval

    engine.capture_sync = lambda: (_ for _ in ()).throw(RuntimeError("down"))
    with pytest.raises(RetriesExhausted):
        engine.capture_run(
            max_polls=1,
            restart_policy=RestartPolicy(max_attempts=3, base_delay=0.0),
            sleep=lambda _d: None,
        )


def test_schema_drift_new_column_flows_through_capture(spark, tmp_path):
    """ALTER TABLE ADD COLUMN between polls (query-based capture's A19
    half): the poll forwards the drift as a synthesized DDL event, the
    drain evolves the materialized schema, and the new column's values
    arrive — where before they were silently dropped until the next
    full snapshot. Pre-drift rows read NULL (the log-based contract)."""
    url, conn = _derby(spark, tmp_path)
    st = conn.createStatement()
    st.executeUpdate(
        "CREATE TABLE APP.ITEMS (K1 INT NOT NULL PRIMARY KEY, "
        "NAME VARCHAR(30), V BIGINT)"
    )
    for k in range(1, 6):
        st.executeUpdate(f"INSERT INTO APP.ITEMS VALUES ({k}, 'n{k}', {k})")
    capture_toml = """[source.capture_tables.ITEMS]
version_col = "V"
"""
    engine = Engine(
        load_config(_config(tmp_path, url, "incrementing", capture_toml, include="ITEMS")),
        spark=spark,
    )
    engine.init_sources()
    engine.capture_seed()
    engine.full_sync()

    st.executeUpdate("ALTER TABLE APP.ITEMS ADD COLUMN TIER INT")
    st.executeUpdate(
        "INSERT INTO APP.ITEMS (K1, NAME, V, TIER) VALUES (6, 'six', 6, 2)"
    )
    st.executeUpdate("UPDATE APP.ITEMS SET NAME='b4', V=7, TIER=9 WHERE K1=4")
    engine.capture_sync()

    df = engine.read_table(1, "APP", "ITEMS")
    assert "TIER" in df.columns
    got = {r.K1: (r.NAME, r.V, r.TIER) for r in df.collect()}
    assert got[6] == ("six", 6, 2)
    assert got[4] == ("b4", 7, 9)
    assert got[1] == ("n1", 1, None)  # pre-drift row: honest NULL

    # idle re-poll: no duplicate-DDL failure, state stable
    engine.capture_sync()
    assert {r.K1: (r.NAME, r.V, r.TIER) for r in engine.read_table(
        1, "APP", "ITEMS").collect()} == got
    conn.close()


def test_capture_lag_reports_pending_versions(spark, tmp_path):
    """Engine.capture_lag: the capture-side lag monitor — versions
    committed past the watermark read as `behind`, a poll returns the
    report to zero; keydiff reports the approximate rowcount drift."""
    url, conn = _derby(spark, tmp_path)
    st = conn.createStatement()
    st.executeUpdate(
        "CREATE TABLE APP.ITEMS (K1 INT NOT NULL PRIMARY KEY, "
        "NAME VARCHAR(30), V BIGINT)"
    )
    for k in range(1, 6):
        st.executeUpdate(f"INSERT INTO APP.ITEMS VALUES ({k}, 'n{k}', {k})")
    capture_toml = """[source.capture_tables.ITEMS]
version_col = "V"
"""
    engine = Engine(
        load_config(_config(tmp_path, url, "incrementing", capture_toml, include="ITEMS")),
        spark=spark,
    )
    engine.init_sources()
    engine.capture_seed()
    engine.full_sync()

    lag = engine.capture_lag()[(1, "APP", "ITEMS")]
    assert lag["behind"] == 0 and lag["approximate"] is False

    st.executeUpdate("INSERT INTO APP.ITEMS VALUES (6, 'six', 8)")
    lag = engine.capture_lag()[(1, "APP", "ITEMS")]
    assert lag["behind"] == 3  # head 8 vs watermark 5
    assert lag["source_head"] == 8 and lag["watermark"] == "000000000005"

    engine.capture_sync()
    assert engine.capture_lag()[(1, "APP", "ITEMS")]["behind"] == 0
    conn.close()


def test_keydiff_drift_reemit_burst_delivers_backfill(spark, tmp_path):
    """ADVICE r12 (documented-deliberate): after ADD COLUMN, keydiff's
    next poll fingerprints over val_cols that now include the new
    column, so every row with a NON-NULL new value re-emits once
    (to_json omits NULL fields: still-NULL rows keep their pre-drift
    fingerprint — the burst is O(backfilled rows), not O(table)). That
    burst is the only convergent way to deliver backfilled values: a
    row whose only change since the last poll is in the NEW column (the
    classic ALTER + backfill UPDATE) must land exactly; the tempting
    refresh-fingerprints-without-emitting alternative would lose it
    forever (see poll_keydiff's docstring)."""
    url, conn = _derby(spark, tmp_path)
    st = conn.createStatement()
    st.executeUpdate(
        "CREATE TABLE APP.CUST (K1 INT NOT NULL PRIMARY KEY, "
        "NAME VARCHAR(30), BAL DOUBLE)"
    )
    for k in range(1, 11):
        st.executeUpdate(f"INSERT INTO APP.CUST VALUES ({k}, 'n{k}', {k}.5)")

    engine = Engine(load_config(_config(tmp_path, url, "keydiff")), spark=spark)
    engine.init_sources()
    engine.capture_seed()
    engine.full_sync()

    # drift + backfill touching ONLY the new column
    st.executeUpdate("ALTER TABLE APP.CUST ADD COLUMN TIER INT")
    st.executeUpdate("UPDATE APP.CUST SET TIER = K1 * 10 WHERE K1 <= 5")
    polled = engine.capture_sync()
    # the documented burst: exactly the backfilled rows re-emit once
    # (NULL-valued rows keep their pre-drift fingerprint via to_json)
    assert polled[(1, "APP", "CUST")] == 5
    df = engine.read_table(1, "APP", "CUST")
    assert "TIER" in df.columns
    got = {r.K1: r.TIER for r in df.collect()}
    assert got == {k: (k * 10 if k <= 5 else None) for k in range(1, 11)}

    # burst happens ONCE: the next idle poll emits nothing
    assert engine.capture_sync()[(1, "APP", "CUST")] == 0
    # and a later only-new-column update is a normal 1-event poll
    st.executeUpdate("UPDATE APP.CUST SET TIER = 99 WHERE K1 = 7")
    assert engine.capture_sync()[(1, "APP", "CUST")] == 1
    assert {r.K1: r.TIER for r in engine.read_table(
        1, "APP", "CUST").collect()}[7] == 99
    conn.close()


# --------------------------------------------------------------------------
# concurrent-writer chaos (VERDICT r12 #2): the pinned-scan consistency
# argument raced for real
# --------------------------------------------------------------------------


class _ChaosWriter:
    """A writer thread committing INSERT/UPDATE/DELETE continuously
    against Derby on its OWN JDBC connection while capture polls run —
    every statement autocommits, so commits land DURING poll scans.
    Tracks live keys / the version counter in Python so the final
    convergence assert has an exact expectation axis."""

    def __init__(self, jvm, url, table, mode, seed_keys, start_version=0):
        import threading

        self.jvm = jvm
        self.url = url
        self.table = table
        self.mode = mode  # "keydiff" (hard deletes) | "incrementing"
        self.keys = set(seed_keys)
        self.version = start_version
        self.next_key = max(seed_keys) + 100
        self.stop = threading.Event()
        self.error = None
        self.statements = 0
        self.thread = threading.Thread(target=self._run, daemon=True)

    def _run(self):
        import random
        import time

        rng = random.Random(42)
        conn = self.jvm.java.sql.DriverManager.getConnection(self.url)
        st = conn.createStatement()
        try:
            while not self.stop.is_set() and self.statements < 3000:
                roll = rng.random()
                if roll < 0.45 or len(self.keys) < 5:
                    k = self.next_key
                    self.next_key += 1
                    self.version += 1
                    if self.mode == "incrementing":
                        st.executeUpdate(
                            f"INSERT INTO APP.{self.table} VALUES "
                            f"({k}, 'w{k}', {self.version})"
                        )
                    else:
                        st.executeUpdate(
                            f"INSERT INTO APP.{self.table} VALUES "
                            f"({k}, 'w{k}', {k}.25)"
                        )
                    self.keys.add(k)
                elif roll < 0.85 or self.mode == "incrementing":
                    k = rng.choice(sorted(self.keys))
                    self.version += 1
                    if self.mode == "incrementing":
                        st.executeUpdate(
                            f"UPDATE APP.{self.table} SET NAME='u{self.version}', "
                            f"V={self.version} WHERE K1={k}"
                        )
                    else:
                        st.executeUpdate(
                            f"UPDATE APP.{self.table} SET NAME='u{self.statements}', "
                            f"BAL={self.statements}.5 WHERE K1={k}"
                        )
                else:
                    k = rng.choice(sorted(self.keys))
                    st.executeUpdate(f"DELETE FROM APP.{self.table} WHERE K1={k}")
                    self.keys.discard(k)
                self.statements += 1
                time.sleep(0.004)
        except Exception as exc:  # noqa: BLE001 — surfaced in the main thread
            self.error = exc
        finally:
            conn.close()


def test_chaos_keydiff_concurrent_writer_converges(spark, tmp_path):
    """A writer thread inserts/updates/hard-deletes CONTINUOUSLY while
    capture_run polls keydiff mode: commits land during the pinned
    diff scans. After the writer stops, one quiescent poll must
    converge the materialized table row-for-row with the source — if
    the pin were broken (state promoted from a fresh re-read racing
    the emit), rows committed mid-poll would be promoted as seen
    without ever being emitted and the final poll could not repair
    them."""
    url, conn = _derby(spark, tmp_path)
    st = conn.createStatement()
    st.executeUpdate(
        "CREATE TABLE APP.CUST (K1 INT NOT NULL PRIMARY KEY, "
        "NAME VARCHAR(30), BAL DOUBLE)"
    )
    for k in range(1, 21):
        st.executeUpdate(f"INSERT INTO APP.CUST VALUES ({k}, 'n{k}', {k}.0)")

    engine = Engine(load_config(_config(tmp_path, url, "keydiff")), spark=spark)
    engine.init_sources()
    engine.capture_seed()
    engine.full_sync()

    w = _ChaosWriter(
        spark.sparkContext._jvm, url, "CUST", "keydiff", seed_keys=range(1, 21)
    )
    w.thread.start()
    try:
        # poll continuously WHILE the writer commits (the race window)
        engine.capture_run(interval_s=0.0, max_polls=4)
    finally:
        w.stop.set()
        w.thread.join(timeout=60)
    assert w.error is None, f"writer thread failed: {w.error}"
    assert w.statements > 100, "writer must actually overlap the polls"

    # quiescent repair poll + drain, then exact convergence
    engine.capture_sync()
    cols = ("K1", "NAME", "BAL")
    assert _mat_rows(engine, "CUST", cols) == _db_rows(
        conn, "SELECT K1, NAME, BAL FROM APP.CUST"
    )
    # and the state is stable: one more idle round changes nothing
    assert engine.capture_sync()[(1, "APP", "CUST")] == 0
    conn.close()


def test_chaos_incrementing_overlap_concurrent_writer_converges(spark, tmp_path):
    """The same chaos against incrementing mode WITH an overlap window
    (VERDICT r12 #2's second half): a single-writer version counter
    commits continuously during polls; overlap re-emits the trailing
    window every poll (convergent duplicates) and the final quiescent
    poll must converge exactly."""
    url, conn = _derby(spark, tmp_path)
    st = conn.createStatement()
    st.executeUpdate(
        "CREATE TABLE APP.ITEMS (K1 INT NOT NULL PRIMARY KEY, "
        "NAME VARCHAR(30), V BIGINT)"
    )
    for k in range(1, 21):
        st.executeUpdate(f"INSERT INTO APP.ITEMS VALUES ({k}, 'n{k}', {k})")
    capture_toml = """[source.capture_tables.ITEMS]
version_col = "V"
overlap = 8
"""
    engine = Engine(
        load_config(_config(tmp_path, url, "incrementing", capture_toml, include="ITEMS")),
        spark=spark,
    )
    engine.init_sources()
    engine.capture_seed()
    engine.full_sync()

    w = _ChaosWriter(
        spark.sparkContext._jvm, url, "ITEMS", "incrementing",
        seed_keys=range(1, 21), start_version=20,
    )
    w.thread.start()
    try:
        engine.capture_run(interval_s=0.0, max_polls=4)
    finally:
        w.stop.set()
        w.thread.join(timeout=60)
    assert w.error is None, f"writer thread failed: {w.error}"
    assert w.statements > 100, "writer must actually overlap the polls"

    engine.capture_sync()
    cols = ("K1", "NAME", "V")
    assert _mat_rows(engine, "ITEMS", cols) == _db_rows(
        conn, "SELECT K1, NAME, V FROM APP.ITEMS"
    )
    # watermark reached the writer's final version
    assert engine.meta.get_pos("derbysrc#capture", sc="APP", tb="ITEMS") == str(
        w.version
    ).zfill(12)
    # idle round: only the overlap window re-emits (bounded, convergent)
    n = engine.capture_sync()[(1, "APP", "ITEMS")]
    assert n <= 8
    assert _mat_rows(engine, "ITEMS", cols) == _db_rows(
        conn, "SELECT K1, NAME, V FROM APP.ITEMS"
    )
    conn.close()


# --------------------------------------------------------------------------
# timestamp / timestamp+incrementing mode (VERDICT r12 #3)
# --------------------------------------------------------------------------


def _ts_table(conn, rows):
    st = conn.createStatement()
    st.executeUpdate(
        "CREATE TABLE APP.DOCS (K1 INT NOT NULL PRIMARY KEY, "
        "NAME VARCHAR(30), TS TIMESTAMP, SEQ BIGINT)"
    )
    for k, name, ts, seq in rows:
        st.executeUpdate(
            f"INSERT INTO APP.DOCS VALUES ({k}, '{name}', "
            f"TIMESTAMP('{ts}'), {seq})"
        )
    return st


def test_timestamp_incrementing_capture_exact_ties(spark, tmp_path):
    """timestamp+incrementing (the Kafka-Connect composite watermark):
    equal-timestamp rows arriving ACROSS polls are captured exactly by
    the (ts, inc) tie clause — no overlap window needed; the idle poll
    emits nothing."""
    url, conn = _derby(spark, tmp_path)
    T0, T1 = "2024-01-01 10:00:00.000000", "2024-01-01 10:00:05.500000"
    st = _ts_table(conn, [
        (1, "a", T0, 1), (2, "b", T0, 2), (3, "c", T0, 3),
    ])
    capture_toml = """[source.capture_tables.DOCS]
timestamp_col = "TS"
incrementing_col = "SEQ"
"""
    engine = Engine(
        load_config(_config(tmp_path, url, "timestamp", capture_toml, include="DOCS")),
        spark=spark,
    )
    engine.init_sources()
    engine.capture_seed()
    engine.full_sync()
    # watermark seeded at (T0, 3): 20-digit micros + 12-digit seq
    wm = engine.meta.get_pos("derbysrc#capture", sc="APP", tb="DOCS")
    assert len(wm) == 32 and wm.endswith("000000000003")

    cols = ("K1", "NAME", "SEQ")
    # poll 1: two rows at the SAME new timestamp T1
    st.executeUpdate(f"INSERT INTO APP.DOCS VALUES (4, 'd', TIMESTAMP('{T1}'), 4)")
    st.executeUpdate(f"INSERT INTO APP.DOCS VALUES (5, 'e', TIMESTAMP('{T1}'), 5)")
    assert engine.capture_sync()[(1, "APP", "DOCS")] == 2
    # poll 2: a LATE tie lands at exactly the watermarked timestamp T1
    # — the composite watermark captures it exactly
    st.executeUpdate(f"INSERT INTO APP.DOCS VALUES (6, 'f', TIMESTAMP('{T1}'), 6)")
    assert engine.capture_sync()[(1, "APP", "DOCS")] == 1
    assert _mat_rows(engine, "DOCS", cols) == _db_rows(
        conn, "SELECT K1, NAME, SEQ FROM APP.DOCS"
    )
    # idle poll: exact mode emits NOTHING
    assert engine.capture_sync()[(1, "APP", "DOCS")] == 0
    # an update bumping ts+seq flows
    st.executeUpdate(
        "UPDATE APP.DOCS SET NAME='a2', "
        "TS=TIMESTAMP('2024-01-01 10:00:09.000000'), SEQ=7 WHERE K1=1"
    )
    assert engine.capture_sync()[(1, "APP", "DOCS")] == 1
    assert _mat_rows(engine, "DOCS", cols) == _db_rows(
        conn, "SELECT K1, NAME, SEQ FROM APP.DOCS"
    )
    # capture_lag: behind reads in SECONDS
    st.executeUpdate(
        "UPDATE APP.DOCS SET TS=TIMESTAMP('2024-01-01 10:00:19.000000'), "
        "SEQ=8 WHERE K1=2"
    )
    lag = engine.capture_lag()[(1, "APP", "DOCS")]
    assert lag["approximate"] is False and lag["behind"] == 10.0
    engine.capture_sync()
    assert engine.capture_lag()[(1, "APP", "DOCS")]["behind"] == 0.0
    conn.close()


def test_timestamp_only_misses_late_tie_without_overlap(spark, tmp_path):
    """timestamp-only with overlap_ms=0: a row committing LATE at an
    already-watermarked timestamp is invisible — the documented
    restriction of every timestamp-polling CDC (Connect's docs say the
    same); the idle poll emits nothing."""
    url, conn = _derby(spark, tmp_path)
    T0, T1 = "2024-01-01 10:00:00.000000", "2024-01-01 10:00:05.000000"
    st = _ts_table(conn, [(1, "a", T0, 1)])
    capture_toml = """[source.capture_tables.DOCS]
timestamp_col = "TS"
"""
    engine = Engine(
        load_config(_config(tmp_path, url, "timestamp", capture_toml, include="DOCS")),
        spark=spark,
    )
    engine.init_sources()
    engine.capture_seed()
    engine.full_sync()

    st.executeUpdate(f"INSERT INTO APP.DOCS VALUES (2, 'b', TIMESTAMP('{T1}'), 2)")
    assert engine.capture_sync()[(1, "APP", "DOCS")] == 1
    # late tie at the watermarked timestamp: MISSED (documented)
    st.executeUpdate(f"INSERT INTO APP.DOCS VALUES (3, 'late', TIMESTAMP('{T1}'), 3)")
    assert engine.capture_sync()[(1, "APP", "DOCS")] == 0
    got = {r[0] for r in _mat_rows(engine, "DOCS", ("K1",))}
    assert 3 not in got
    assert engine.capture_sync()[(1, "APP", "DOCS")] == 0  # idle: nothing
    conn.close()


def test_timestamp_overlap_recovers_late_commits(spark, tmp_path):
    """timestamp-only with overlap_ms (the timestamp.delay.interval.ms
    analog): commits landing up to the window behind the watermark —
    including exact ties — are recovered on the next poll as convergent
    duplicates; soft deletes tombstone through the same path."""
    url, conn = _derby(spark, tmp_path)
    T0 = "2024-01-01 10:00:00.000000"
    T1 = "2024-01-01 10:00:05.000000"
    T1_LATE = "2024-01-01 10:00:03.250000"  # 1.75 s behind the watermark
    st = conn.createStatement()
    st.executeUpdate(
        "CREATE TABLE APP.DOCS (K1 INT NOT NULL PRIMARY KEY, "
        "NAME VARCHAR(30), TS TIMESTAMP, SEQ BIGINT, DELETED SMALLINT)"
    )
    st.executeUpdate(
        f"INSERT INTO APP.DOCS VALUES (1, 'a', TIMESTAMP('{T0}'), 1, 0)"
    )
    capture_toml = """[source.capture_tables.DOCS]
timestamp_col = "TS"
deleted_col = "DELETED"
overlap_ms = 2000
"""
    engine = Engine(
        load_config(_config(tmp_path, url, "timestamp", capture_toml, include="DOCS")),
        spark=spark,
    )
    engine.init_sources()
    engine.capture_seed()
    engine.full_sync()

    st.executeUpdate(f"INSERT INTO APP.DOCS VALUES (2, 'b', TIMESTAMP('{T1}'), 2, 0)")
    # new row 2 + seeded row 1 (inside the watermark's trailing window,
    # a convergent duplicate)
    assert engine.capture_sync()[(1, "APP", "DOCS")] == 2
    # two late commits: one 1.75 s behind the watermark, one an exact tie
    st.executeUpdate(
        f"INSERT INTO APP.DOCS VALUES (3, 'late', TIMESTAMP('{T1_LATE}'), 3, 0)"
    )
    st.executeUpdate(
        f"INSERT INTO APP.DOCS VALUES (4, 'tie', TIMESTAMP('{T1}'), 4, 0)"
    )
    # the window re-emits row 2 as a convergent duplicate alongside both
    assert engine.capture_sync()[(1, "APP", "DOCS")] == 3
    cols = ("K1", "NAME", "SEQ")
    assert _mat_rows(engine, "DOCS", cols) == _db_rows(
        conn, "SELECT K1, NAME, SEQ FROM APP.DOCS WHERE DELETED = 0"
    )
    # soft delete flows as a tombstone
    st.executeUpdate(
        "UPDATE APP.DOCS SET DELETED=1, "
        "TS=TIMESTAMP('2024-01-01 10:00:08.000000') WHERE K1=1"
    )
    engine.capture_sync()
    assert _mat_rows(engine, "DOCS", cols) == _db_rows(
        conn, "SELECT K1, NAME, SEQ FROM APP.DOCS WHERE DELETED = 0"
    )
    assert not any(r[0] == 1 for r in _mat_rows(engine, "DOCS", cols))
    # steady state: only the overlap window re-emits, convergently
    n = engine.capture_sync()[(1, "APP", "DOCS")]
    assert n <= 2
    assert _mat_rows(engine, "DOCS", cols) == _db_rows(
        conn, "SELECT K1, NAME, SEQ FROM APP.DOCS WHERE DELETED = 0"
    )
    conn.close()


def test_timestamp_capture_config_validation(tmp_path):
    """timestamp capture: empty capture_tables and missing
    timestamp_col / bad overlap_ms fail at load time."""
    import pytest as _pytest

    url = f"jdbc:derby:{tmp_path}/nodb"
    with _pytest.raises(ValueError, match="non-empty capture_tables"):
        load_config(_config(tmp_path, url, "timestamp"))
    with _pytest.raises(ValueError, match="timestamp_col"):
        load_config(_config(
            tmp_path, url, "timestamp",
            '[source.capture_tables.DOCS]\nincrementing_col = "SEQ"\n',
        ))
    with _pytest.raises(ValueError, match="overlap_ms"):
        load_config(_config(
            tmp_path, url, "timestamp",
            '[source.capture_tables.DOCS]\ntimestamp_col = "TS"\noverlap_ms = -5\n',
        ))


# --------------------------------------------------------------------------
# type-widening schema drift (VERDICT r12 #4)
# --------------------------------------------------------------------------


def test_is_widening_policy():
    from pyspark.sql import types as T

    from go_cdc_spark.functions.ddl import is_widening

    # integer rank
    assert is_widening(T.IntegerType(), T.LongType())
    assert is_widening(T.ShortType(), T.IntegerType())
    assert not is_widening(T.LongType(), T.IntegerType())
    assert not is_widening(T.IntegerType(), T.IntegerType())
    # float family: LONG->DOUBLE rounds past 2^53 — not widening
    assert is_widening(T.FloatType(), T.DoubleType())
    assert is_widening(T.IntegerType(), T.DoubleType())
    assert not is_widening(T.LongType(), T.DoubleType())
    assert not is_widening(T.DoubleType(), T.FloatType())
    # decimal
    assert is_widening(T.DecimalType(10, 2), T.DecimalType(14, 2))
    assert is_widening(T.DecimalType(10, 2), T.DecimalType(14, 4))
    assert not is_widening(T.DecimalType(14, 2), T.DecimalType(10, 2))
    assert not is_widening(T.DecimalType(10, 2), T.DecimalType(11, 4))  # int digits shrink
    assert is_widening(T.LongType(), T.DecimalType(19, 0))
    assert not is_widening(T.LongType(), T.DecimalType(18, 0))
    # anything non-binary -> string; binary's envelope form is base64
    assert is_widening(T.LongType(), T.StringType())
    assert is_widening(T.TimestampType(), T.StringType())
    assert not is_widening(T.BinaryType(), T.StringType())
    assert not is_widening(T.StringType(), T.LongType())


def test_widening_drift_int_to_bigint_lands_without_loss(spark, tmp_path):
    """VERDICT r12 #4: a live INT→BIGINT column migration (Derby can't
    retype in place, so the real-world copy/drop/rename migration) is
    detected at poll time, forwarded as an idempotent CHANGE, and a
    value past 2^31 lands exactly — before this, the materializer kept
    casting to INT and the overflow was silent."""
    url, conn = _derby(spark, tmp_path)
    st = conn.createStatement()
    st.executeUpdate(
        "CREATE TABLE APP.ITEMS (K1 INT NOT NULL PRIMARY KEY, "
        "N INT, V BIGINT)"
    )
    for k in range(1, 6):
        st.executeUpdate(f"INSERT INTO APP.ITEMS VALUES ({k}, {k * 10}, {k})")
    capture_toml = """[source.capture_tables.ITEMS]
version_col = "V"
"""
    engine = Engine(
        load_config(_config(tmp_path, url, "incrementing", capture_toml, include="ITEMS")),
        spark=spark,
    )
    engine.init_sources()
    engine.capture_seed()
    engine.full_sync()
    from pyspark.sql import types as T

    assert isinstance(
        engine.read_table(1, "APP", "ITEMS").schema["N"].dataType, T.IntegerType
    )

    # live migration N: INT -> BIGINT (copy/drop/rename), then a value
    # only BIGINT can hold
    st.executeUpdate(
        "CREATE TABLE APP.ITEMS2 (K1 INT NOT NULL PRIMARY KEY, "
        "N BIGINT, V BIGINT)"
    )
    st.executeUpdate("INSERT INTO APP.ITEMS2 SELECT K1, N, V FROM APP.ITEMS")
    st.executeUpdate("DROP TABLE APP.ITEMS")
    st.executeUpdate("RENAME TABLE APP.ITEMS2 TO ITEMS")
    st.executeUpdate(
        "UPDATE APP.ITEMS SET N = 3000000000, V = 6 WHERE K1 = 2"
    )
    engine.capture_sync()
    df = engine.read_table(1, "APP", "ITEMS")
    assert isinstance(df.schema["N"].dataType, T.LongType)
    got = {r.K1: r.N for r in df.collect()}
    assert got[2] == 3000000000  # no overflow, no loss
    assert got[1] == 10  # pre-drift values intact
    # idempotent: the next poll re-detects nothing, state stable
    assert engine.capture_sync()[(1, "APP", "ITEMS")] == 0
    assert {r.K1: r.N for r in engine.read_table(1, "APP", "ITEMS").collect()} == got
    conn.close()


def test_nonwidening_drift_warns_and_keeps_old_type(spark, tmp_path):
    """BIGINT→INT live narrowing: warned loudly, NOT forwarded — the
    materializer keeps the wider type (loses nothing), and data keeps
    flowing."""
    url, conn = _derby(spark, tmp_path)
    st = conn.createStatement()
    st.executeUpdate(
        "CREATE TABLE APP.ITEMS (K1 INT NOT NULL PRIMARY KEY, "
        "N BIGINT, V BIGINT)"
    )
    for k in range(1, 4):
        st.executeUpdate(f"INSERT INTO APP.ITEMS VALUES ({k}, {k * 10}, {k})")
    capture_toml = """[source.capture_tables.ITEMS]
version_col = "V"
"""
    engine = Engine(
        load_config(_config(tmp_path, url, "incrementing", capture_toml, include="ITEMS")),
        spark=spark,
    )
    engine.init_sources()
    engine.capture_seed()
    engine.full_sync()

    st.executeUpdate(
        "CREATE TABLE APP.ITEMS2 (K1 INT NOT NULL PRIMARY KEY, "
        "N INT, V BIGINT)"
    )
    st.executeUpdate("INSERT INTO APP.ITEMS2 SELECT K1, CAST(N AS INT), V FROM APP.ITEMS")
    st.executeUpdate("DROP TABLE APP.ITEMS")
    st.executeUpdate("RENAME TABLE APP.ITEMS2 TO ITEMS")
    st.executeUpdate("UPDATE APP.ITEMS SET N = 77, V = 4 WHERE K1 = 1")

    import warnings as _warnings

    with _warnings.catch_warnings(record=True) as w:
        _warnings.simplefilter("always")
        engine.capture_sync()
    assert any("NOT a lossless widening" in str(x.message) for x in w)
    from pyspark.sql import types as T

    df = engine.read_table(1, "APP", "ITEMS")
    assert isinstance(df.schema["N"].dataType, T.LongType)  # kept wide
    assert {r.K1: r.N for r in df.collect()}[1] == 77  # data still flows
    conn.close()


# --------------------------------------------------------------------------
# status CLI (VERDICT r12 #6): the monitoring face
# --------------------------------------------------------------------------


def test_status_cli_reports_both_lag_faces(spark, tmp_path, capsys):
    """`python -m go_cdc_spark status config.toml`: a FRESH engine (no
    full_sync — tables discovered from the prior run's state dir)
    reports replication lag and capture lag per source, human-readable
    and as JSON."""
    import json as _json

    from go_cdc_spark.__main__ import main

    url, conn = _derby(spark, tmp_path)
    st = conn.createStatement()
    st.executeUpdate(
        "CREATE TABLE APP.ITEMS (K1 INT NOT NULL PRIMARY KEY, "
        "NAME VARCHAR(30), V BIGINT)"
    )
    for k in range(1, 6):
        st.executeUpdate(f"INSERT INTO APP.ITEMS VALUES ({k}, 'n{k}', {k})")
    capture_toml = """[source.capture_tables.ITEMS]
version_col = "V"
"""
    cfg = _config(tmp_path, url, "incrementing", capture_toml, include="ITEMS")
    engine = Engine(load_config(cfg), spark=spark)
    engine.init_sources()
    engine.capture_seed()
    engine.full_sync()
    engine.capture_sync()

    # pending work on BOTH axes: an unpolled version (capture lag) and
    # an undrained changelog segment (replication lag)
    st.executeUpdate("INSERT INTO APP.ITEMS VALUES (6, 'six', 8)")
    import json as _j
    import os as _os

    seg = {
        "data_source": "derbysrc", "schema": "APP", "table": "ITEMS",
        "op": "update", "data": {"K1": "7", "NAME": "seg", "V": "9"},
        "before": None, "ts": None, "pos": "000000000009", "txn_id": None,
    }
    with open(_os.path.join(str(tmp_path), "changelog", "manual.json"), "w") as f:
        f.write(_j.dumps(seg) + "\n")

    # the status command builds its OWN engine: no full_sync ran on it
    assert main(["status", cfg, "--json"]) == 0
    report = _json.loads(capsys.readouterr().out)
    entry = report["derbysrc"]
    t = entry["tables"]["APP.ITEMS"]
    assert t["fresh"] is False and t["events_behind"] == 1
    c = entry["capture"]["APP.ITEMS"]
    assert c["behind"] == 3 and c["approximate"] is False  # head 8 vs wm 5

    # human-readable face
    assert main(["status", cfg]) == 0
    out = capsys.readouterr().out
    assert "source derbysrc (id 1)" in out
    assert "1 events behind" in out
    assert "behind=3" in out

    # drain + poll -> both faces go green
    engine.capture_sync()
    assert main(["status", cfg, "--json"]) == 0
    report = _json.loads(capsys.readouterr().out)
    assert report["derbysrc"]["tables"]["APP.ITEMS"]["fresh"] is True
    assert report["derbysrc"]["capture"]["APP.ITEMS"]["behind"] == 0
    conn.close()
