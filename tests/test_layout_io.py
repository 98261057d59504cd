"""Physical Z-order layout: write real parquet files (one per Morton
cell), read back with the 2-D probe, and assert the ENGINE actually
skips — from the scan's own metrics (rows decoded after row-group
min/max pruning) and from the parquet footers (files whose stats
envelope misses the probe). The registered `layout_zorder` query
simulates this with computed flags; here the same layout is measured
as I/O."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from go_cdc_spark.operators.layout import (
    PROBE_CK_HI,
    PROBE_CK_LO,
    PROBE_OD_HI,
    PROBE_OD_LO,
    run_with_scan_metrics,
    write_clustered,
)
from go_cdc_spark.tables import load


def _ck_pred():
    return (F.col("o_custkey") >= PROBE_CK_LO) & (F.col("o_custkey") <= PROBE_CK_HI)


def _od_pred():
    return (F.col("od") >= F.lit(PROBE_OD_LO).cast("date")) & (
        F.col("od") <= F.lit(PROBE_OD_HI).cast("date")
    )


def _probe(df):
    return df.filter(_ck_pred() & _od_pred())


def _footer_skippable(path: str) -> tuple[int, int]:
    """(n_files, n_skippable) from parquet footer min/max stats — the
    file-level form of what the reader's row-group pruning consumes."""
    import datetime

    import pyarrow.parquet as pq

    lo_d = datetime.date.fromisoformat(PROBE_OD_LO)
    hi_d = datetime.date.fromisoformat(PROBE_OD_HI)
    files = glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
    skippable = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        ck = {"min": None, "max": None}
        od = {"min": None, "max": None}
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                name = col.path_in_schema
                if name not in ("o_custkey", "od") or col.statistics is None:
                    continue
                tgt = ck if name == "o_custkey" else od
                s = col.statistics
                tgt["min"] = s.min if tgt["min"] is None else min(tgt["min"], s.min)
                tgt["max"] = s.max if tgt["max"] is None else max(tgt["max"], s.max)
        if ck["min"] is None or od["min"] is None:
            continue
        if (
            ck["max"] < PROBE_CK_LO
            or ck["min"] > PROBE_CK_HI
            or od["max"] < lo_d
            or od["min"] > hi_d
        ):
            skippable += 1
    return len(files), skippable


@pytest.fixture(scope="module")
def layouts(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("layouts")
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.to_date("o_orderdate").alias("od")
    )
    zdir, ldir = str(base / "zorder"), str(base / "linear")
    write_clustered(o, "o_custkey", "od", zdir, linear=False)
    write_clustered(o, "o_custkey", "od", ldir, linear=True)
    return o, zdir, ldir


def test_zorder_layout_preserves_rows(spark, layouts):
    o, zdir, ldir = layouts
    want = o.count()
    assert spark.read.parquet(zdir).count() == want
    assert spark.read.parquet(ldir).count() == want
    # probe answers agree across layouts and with the unclustered base
    expect = sorted(r.o_orderkey for r in _probe(o).collect())
    for d in (zdir, ldir):
        got = sorted(r.o_orderkey for r in _probe(spark.read.parquet(d)).collect())
        assert got == expect


def test_zorder_files_skippable_by_footer_stats(layouts):
    _, zdir, ldir = layouts
    zn, zskip = _footer_skippable(zdir)
    ln, lskip = _footer_skippable(ldir)
    # the 2-D probe leaves most z-ordered files skippable by their own
    # footer stats (both dimensions' envelopes are tight per cell)
    assert zskip > zn * 0.8, f"zorder: only {zskip}/{zn} files skippable"
    assert 0 < zn <= (1 << 6) + 1  # one file per cell (64 cells max)
    assert 0 < ln <= (1 << 6) + 1


def test_engine_skips_on_both_dimensions_for_zorder(spark, layouts):
    """The measured point of Z-ordering: the engine's own row-group
    pruning (pushed min/max filters) keeps BOTH dimensions usable.
    A layout sorted by custkey alone answers custkey probes perfectly
    but decodes ~the whole table for a date probe; the z-ordered files
    prune on either dimension. Asserted from the scan node's metrics
    (rows decoded from parquet), not computed flags."""
    o, zdir, ldir = layouts
    total = o.count()
    # date-only probe: linear must decode ~everything, zorder prunes
    nz, mz = run_with_scan_metrics(spark.read.parquet(zdir).filter(_od_pred()))
    nl, ml = run_with_scan_metrics(spark.read.parquet(ldir).filter(_od_pred()))
    assert nz == nl
    assert ml["numOutputRows"] > total * 0.9, "linear should not prune on od"
    assert mz["numOutputRows"] < total * 0.5, (
        f"zorder decoded {mz['numOutputRows']}/{total} on the od probe"
    )
    # custkey-only probe: linear is near-perfect (its sort dimension —
    # the documented trade), zorder still prunes meaningfully
    nz, mz = run_with_scan_metrics(spark.read.parquet(zdir).filter(_ck_pred()))
    nl, ml = run_with_scan_metrics(spark.read.parquet(ldir).filter(_ck_pred()))
    assert nz == nl
    assert ml["numOutputRows"] <= mz["numOutputRows"]
    assert mz["numOutputRows"] < total * 0.5
    # 2-D probe: both layouts decode a small fraction of the table
    nz, mz = run_with_scan_metrics(_probe(spark.read.parquet(zdir)))
    nl, ml = run_with_scan_metrics(_probe(spark.read.parquet(ldir)))
    assert nz == nl
    assert mz["numOutputRows"] < total * 0.2
    # linear prunes via its custkey prefix only — coarser at tiny SF
    # (few rows per file → wide envelopes), so the bound is looser
    assert ml["numOutputRows"] < total * 0.4
