#!/usr/bin/env python
"""Many-table demux drain probe (VERDICT r10 #3).

The per-SOURCE demux stream fans each micro-batch out to every touched
table's MERGE. At the 7-table fixture the sequential loop was the 18×
win; this probe measures what happens at a realistic TABLE COUNT
(default 48 tables, small per-table volume — the many-small-tables
shape of a production MySQL source) and A/Bs the round-11 bounded
thread fan-out (``merge_concurrency``) against the sequential loop.

Protocol per the repo's noisy-host rule: INTERLEAVED same-session
min-of-N — seq/par/seq/par — never two sequential blocks.

Usage: python tools/demux_scale_probe.py [n_tables] [rows_per_table] [events_per_table]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from go_cdc_spark.app import Engine  # noqa: E402
from go_cdc_spark.config import load_config  # noqa: E402
from go_cdc_spark.session import get_spark  # noqa: E402

N_TABLES = int(sys.argv[1]) if len(sys.argv) > 1 else 48
ROWS_PER_TABLE = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000
EVENTS_PER_TABLE = int(sys.argv[3]) if len(sys.argv) > 3 else 150
WORKERS = [int(w) for w in (sys.argv[4].split(",") if len(sys.argv) > 4 else ["1", "8"])]
REPS = 2


def _fixture(spark, root: str) -> str:
    """N parquet tables t00..tNN, identical shape."""
    data_dir = os.path.join(root, "seed")
    os.makedirs(data_dir)
    base = spark.range(ROWS_PER_TABLE).select(
        F.col("id").cast("int").alias("k"),
        F.concat(F.lit("v"), F.col("id")).alias("val"),
    )
    base.persist().count()
    for i in range(N_TABLES):
        base.write.parquet(os.path.join(data_dir, f"t{i:02d}.parquet"))
    base.unpersist()
    return data_dir


def _events(root: str) -> str:
    """One changelog with EVENTS_PER_TABLE updates per table, all
    tables interleaved in 4 segments (every micro-batch touches every
    table — the worst case for the sequential loop)."""
    seg_dir = os.path.join(root, "changelog")
    os.makedirs(seg_dir)
    events = []
    pos = 0
    for e in range(EVENTS_PER_TABLE):
        for i in range(N_TABLES):
            pos += 1
            events.append(json.dumps({
                "data_source": "probe", "schema": "main", "table": f"t{i:02d}",
                "op": "update",
                "data": {"k": str(e % ROWS_PER_TABLE), "val": f"u{pos}"},
                "before": None, "ts": None,
                "pos": str(pos).zfill(12), "txn_id": None,
            }))
    per = max(1, len(events) // 4)
    for s in range(0, len(events), per):
        with open(os.path.join(seg_dir, f"seg{s:08d}.json"), "w") as f:
            f.write("\n".join(events[s:s + per]) + "\n")
    return seg_dir


def _config(root: str, data_dir: str, seg_dir: str, tag: str, conc: int) -> str:
    pk = "\n".join(f't{i:02d} = ["k"]' for i in range(N_TABLES))
    include = ", ".join(f'"t{i:02d}"' for i in range(N_TABLES))
    cfg = f"""
[engine]
meta_path      = "{root}/{tag}/meta"
state_dir      = "{root}/{tag}/state"
checkpoint_dir = "{root}/{tag}/ckpt"

[[source]]
id        = 1
name      = "probe"
type      = "parquet"
path      = "{data_dir}"
changelog = "{seg_dir}"
catchup_files_per_trigger = 4
merge_concurrency = {conc}
[source.primary_keys]
{pk}
[source.rules.global]
include_tables = [{include}]
"""
    p = os.path.join(root, f"config_{tag}.toml")
    with open(p, "w") as f:
        f.write(cfg)
    return p


def _drain_once(spark, root, data_dir, seg_dir, tag, conc) -> float:
    cfg_path = _config(root, data_dir, seg_dir, tag, conc)
    engine = Engine(load_config(cfg_path), spark=spark)
    engine.init_sources()
    engine.full_sync()
    t0 = time.perf_counter()
    engine.incremental_sync()
    dt = time.perf_counter() - t0
    # spot-verify one table converged
    row = (
        engine.read_table(1, "main", "t00")
        .filter(F.col("k") == (EVENTS_PER_TABLE - 1) % ROWS_PER_TABLE)
        .first()
    )
    assert row is not None and row.val.startswith("u"), row
    shutil.rmtree(os.path.join(root, tag), ignore_errors=True)
    return dt


def main() -> None:
    spark = get_spark("demux-scale-probe")
    root = tempfile.mkdtemp(prefix="demux_probe_")
    data_dir = _fixture(spark, root)
    seg_dir = _events(root)
    n_events = N_TABLES * EVENTS_PER_TABLE

    times = {w: [] for w in WORKERS}
    for r in range(REPS):  # interleaved A/B (memory rule: never sequential blocks)
        for w in WORKERS:
            times[w].append(_drain_once(spark, root, data_dir, seg_dir, f"w{w}r{r}", w))
        print(f"rep {r}: " + "  ".join(f"w{w} {times[w][-1]:.1f}s" for w in WORKERS),
              file=sys.stderr)
    best = {w: min(ts) for w, ts in times.items()}
    base = best.get(1) or list(best.values())[0]
    print(json.dumps({
        "metric": "demux_many_table_drain",
        "n_tables": N_TABLES,
        "rows_per_table": ROWS_PER_TABLE,
        "events": n_events,
        "seconds_by_workers": {str(w): round(t, 2) for w, t in best.items()},
        "ev_s_by_workers": {str(w): int(n_events / t) for w, t in best.items()},
        "speedup_vs_seq": {str(w): round(base / t, 2) for w, t in best.items()},
    }))
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
