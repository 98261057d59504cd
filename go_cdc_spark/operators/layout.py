"""Data-layout optimization: Z-order (Morton) clustering + the
min/max file-skipping stats it exists to improve.

At 100 TB the single biggest scan lever is not the plan — it's the
LAYOUT: a table clustered so that each file's min/max envelope is
tight on the columns queries filter by lets the reader skip files
entirely (parquet row-group pruning / Delta-Iceberg data skipping).
Sorting by ONE column makes its envelopes tight and every other
column's envelopes full-range; Z-ordering interleaves the bits of two
(or more) dimensions so BOTH stay moderately tight — the standard
multi-dimensional clustering technique (Morton curves, public: Delta
``OPTIMIZE ZORDER BY``, Iceberg sort orders).

Scale design — deliberately NO global sort/rank anywhere:

- dimensions are binned by VALUE against the table's global min/max
  (one 1-row aggregate, broadcast crossJoin — the repo's established
  pattern) with double ops on exactly-representable integers — map
  side, deterministic, oracle-exact (no sampled range partitioner, no
  single-reducer ROW_NUMBER);
- the Z-value is a bit-interleave expression (codegen'd);
- a "file" is a fixed Z-space cell (the top bits of the Z-value), so
  file assignment is map-side too; a real writer then emits one file
  per cell (``repartition(cell).write`` / ``maxRecordsPerFile``), and
  per-cell row counts vary with density — the honest static-binning
  trade vs a sampling range partitioner (which is not
  run-deterministic);
- per-file stats are ONE groupBy over cell ids.

The registered query emits BOTH layouts' file stats (z-order vs
single-column linear sort) with a skip flag for a fixed 2-D probe, so
the improvement is visible in the checked data itself, not asserted.

Reference scope note: the Go replicator (internal/syncdb) has no
layout stage — this is part of the training-pipeline surface the
survey adds on top (SURVEY.md §2.B.1).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..plans.registry import query
from ..tables import load

BITS = 10  # per-dimension resolution: 1024 bins
FILE_BITS = 3  # top bits per dimension defining a "file" cell: 64 files

# Fixed 2-D probe predicate for the skipping measurement (literals on
# both engine sides): a narrow customer range × one calendar year.
PROBE_CK_LO, PROBE_CK_HI = 100, 199
PROBE_OD_LO, PROBE_OD_HI = "1998-01-01", "1998-12-31"


def bin_col(v: Column, lo: Column, rng: Column, bits: int = BITS) -> Column:
    """Value-proportional bin in [0, 2**bits): floor((v - lo) * 2**bits
    / rng) with rng = hi - lo + 1. The operands are integers exactly
    representable in double (custkeys/day-offsets ≪ 2^53), so the
    multiply, divide and floor are the same IEEE ops in both engines —
    deterministic without a rank, needing only the global min/max
    (broadcast 1-row aggregate)."""
    n = float(1 << bits)
    return F.floor(
        (v - lo).cast("double") * F.lit(n) / rng.cast("double")
    ).cast("long")


def _sql_bin(v: str, lo: str, rng: str, bits: int = BITS) -> str:
    n = float(1 << bits)
    return f"CAST(floor(CAST({v} - {lo} AS DOUBLE) * {n} / CAST({rng} AS DOUBLE)) AS BIGINT)"


def zvalue_col(b1: Column, b2: Column, bits: int = BITS) -> Column:
    """Morton interleave: bit j of b1 → position 2j+1, bit j of b2 →
    position 2j. A flat sum of masked shifts — whole-stage-codegen'd,
    no UDF."""
    z = F.lit(0).cast("long")
    for j in range(bits):
        z = z + F.shiftright(b1, j).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * j + 1))
        z = z + F.shiftright(b2, j).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * j))
    return z


def _sql_zvalue(b1: str, b2: str, bits: int = BITS) -> str:
    terms = []
    for j in range(bits):
        terms.append(f"((({b1} >> {j}) & 1) * {1 << (2 * j + 1)})")
        terms.append(f"((({b2} >> {j}) & 1) * {1 << (2 * j)})")
    return "(" + " + ".join(terms) + ")"


# ---------------------------------------------------------------------------
# REAL layout writer + engine-measured skipping. The registered query
# below simulates files as Z-cells so the improvement is oracle-
# checkable; this writer makes the same layout physical: one parquet
# file per Morton cell, so each file's min/max envelope IS the cell
# envelope and the parquet reader's row-group pruning (min/max stats +
# pushed filters) skips non-matching files at scan time. Measured by
# tests/test_layout_io.py via the scan's own numOutputRows/numFiles
# metrics — observed skipping, not computed flags.
# ---------------------------------------------------------------------------


def _numeric_dim(df: DataFrame, c: str) -> Column:
    """Bin-space form of a dimension column: dates become day offsets
    (exact integers), numerics pass through."""
    if isinstance(df.schema[c].dataType, T.DateType):
        return F.datediff(F.col(c), F.lit("1970-01-01").cast("date"))
    return F.col(c)


def with_zcell(
    df: DataFrame,
    c1: str,
    c2: str,
    bits: int = BITS,
    file_bits: int = FILE_BITS,
    linear: bool = False,
) -> DataFrame:
    """``df`` plus ``__zcell``: the Morton file cell of (c1, c2) —
    entirely map-side expressions over one broadcast min/max row (no
    sort, no rank; see module docstring). ``linear=True`` yields the
    single-column baseline (top bits of c1's bin) for A/B measurement."""
    e1, e2 = _numeric_dim(df, c1), _numeric_dim(df, c2)
    g = df.agg(
        F.min(e1).alias("__lo1"),
        (F.max(e1) - F.min(e1) + 1).alias("__rng1"),
        F.min(e2).alias("__lo2"),
        (F.max(e2) - F.min(e2) + 1).alias("__rng2"),
    )
    b = df.crossJoin(F.broadcast(g))
    b1 = bin_col(e1, F.col("__lo1"), F.col("__rng1"), bits)
    b2 = bin_col(e2, F.col("__lo2"), F.col("__rng2"), bits)
    if linear:
        cell = F.shiftright(b1, bits - 2 * file_bits)
    else:
        shift = bits - file_bits
        cell = zvalue_col(
            F.shiftright(b1, shift), F.shiftright(b2, shift), file_bits
        )
    return b.select(*df.columns, cell.alias("__zcell"))


def write_clustered(
    df: DataFrame,
    c1: str,
    c2: str,
    out_dir: str,
    bits: int = BITS,
    file_bits: int = FILE_BITS,
    linear: bool = False,
) -> None:
    """Physically cluster ``df`` by Morton cell and write ONE parquet
    file per cell (repartition on the cell key, then partitionBy — each
    cell hashes to exactly one task, so each ``__zcell=`` dir holds one
    file whose column min/max envelope is the cell envelope).

    Scale shape: the only shuffle is the repartition on the cell key —
    the same clustering write a Delta ``OPTIMIZE ZORDER BY`` performs,
    minus the global range partitioner (static value bins keep the job
    deterministic and sample-free; density skew shows up as file-size
    variance, the documented trade)."""
    cells = with_zcell(df, c1, c2, bits=bits, file_bits=file_bits, linear=linear)
    (
        cells.repartition(F.col("__zcell"))
        .write.mode("overwrite")
        .partitionBy("__zcell")
        .parquet(out_dir)
    )


def run_with_scan_metrics(df: DataFrame) -> tuple[int, dict[str, int]]:
    """Execute ``df`` and return (result row count, parquet scan
    metrics). The metrics come from the executed plan's own
    FileSourceScan node — ``numOutputRows`` there counts rows DECODED
    from parquet (i.e. rows in row groups that survived min/max
    pruning), which is the engine's measured skipping."""
    n = len(df.collect())
    plan = df._jdf.queryExecution().executedPlan()

    def walk(node):
        name = node.getClass().getSimpleName()
        if name == "AdaptiveSparkPlanExec":
            yield from walk(node.executedPlan())
            return
        yield name, node
        it = node.children().iterator()
        while it.hasNext():
            yield from walk(it.next())

    out: dict[str, int] = {}
    jvm = df.sparkSession.sparkContext._jvm
    for name, node in walk(plan):
        if "FileSourceScan" in name or "BatchScan" in name:
            jmap = jvm.scala.collection.JavaConverters.mapAsJavaMap(node.metrics())
            for k in jmap.keySet().toArray():
                out[k] = out.get(k, 0) + jmap.get(k).value()
    return n, out


_LAYOUT_ORACLE = f"""
WITH o AS (
    SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS od FROM orders
),
g AS (
    SELECT MIN(o_custkey) AS ck_lo, MAX(o_custkey) - MIN(o_custkey) + 1 AS ck_rng,
           MIN(od) AS od_lo, date_diff('day', MIN(od), MAX(od)) + 1 AS od_rng
    FROM o
),
b AS (
    SELECT o.o_orderkey, o.o_custkey, o.od,
           {_sql_bin("o.o_custkey", "g.ck_lo", "g.ck_rng")} AS b1,
           {_sql_bin("date_diff('day', g.od_lo, o.od)", "0", "g.od_rng")} AS b2
    FROM o CROSS JOIN g
),
cells AS (
    SELECT *,
           {_sql_zvalue(f"(b1 >> {BITS - FILE_BITS})", f"(b2 >> {BITS - FILE_BITS})", FILE_BITS)} AS z_file,
           (b1 >> {BITS - 2 * FILE_BITS}) AS lin_file
    FROM b
),
lay AS (
    SELECT 'zorder' AS layout, z_file AS file_id, o_custkey, od FROM cells
    UNION ALL
    SELECT 'linear' AS layout, lin_file AS file_id, o_custkey, od FROM cells
)
SELECT layout, CAST(file_id AS INTEGER) AS file_id,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       MIN(o_custkey) AS min_ck, MAX(o_custkey) AS max_ck,
       MIN(od) AS min_od, MAX(od) AS max_od,
       (MAX(o_custkey) < {PROBE_CK_LO} OR MIN(o_custkey) > {PROBE_CK_HI}
        OR MAX(od) < DATE '{PROBE_OD_LO}' OR MIN(od) > DATE '{PROBE_OD_HI}') AS skip_probe
FROM lay
GROUP BY layout, file_id
"""


@query("layout_zorder", oracle=_LAYOUT_ORACLE)
def layout_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order vs linear layout, measured by the stats that matter:
    per-file (Z-cell) min/max envelopes on BOTH dimensions and whether
    the fixed 2-D probe (`o_custkey` ∈ [{PROBE_CK_LO}, {PROBE_CK_HI}] ×
    1994) can SKIP the file. The z-order rows skip far more files than
    the linear rows for the same probe — the measured point of the
    operator (the linear layout's date envelopes are full-range in
    every file).

    'Files' here are the top-{FILE_BITS}-bits-per-dimension Z cells
    (64 of them) and the same-width custkey prefix for
    the linear baseline — assignment is entirely map-side expressions
    over one broadcast min/max row; see the module docstring for why
    no rank/global sort appears (the 100 TB shape: layout jobs must
    not single-reduce)."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.to_date("o_orderdate").alias("od")
    )
    g = o.agg(
        F.min("o_custkey").alias("ck_lo"),
        (F.max("o_custkey") - F.min("o_custkey") + 1).alias("ck_rng"),
        F.min("od").alias("od_lo"),
        (F.datediff(F.max("od"), F.min("od")) + 1).alias("od_rng"),
    )
    b = o.crossJoin(F.broadcast(g)).select(
        "o_custkey",
        "od",
        bin_col(F.col("o_custkey"), F.col("ck_lo"), F.col("ck_rng")).alias("b1"),
        bin_col(
            F.datediff(F.col("od"), F.col("od_lo")), F.lit(0), F.col("od_rng")
        ).alias("b2"),
    )
    shift = BITS - FILE_BITS
    cells = b.select(
        "o_custkey",
        "od",
        zvalue_col(
            F.shiftright(F.col("b1"), shift), F.shiftright(F.col("b2"), shift), FILE_BITS
        ).alias("z_file"),
        F.shiftright(F.col("b1"), BITS - 2 * FILE_BITS).alias("lin_file"),
    )
    both = cells.select(
        F.lit("zorder").alias("layout"), F.col("z_file").alias("file_id"), "o_custkey", "od"
    ).unionByName(
        cells.select(
            F.lit("linear").alias("layout"),
            F.col("lin_file").alias("file_id"),
            "o_custkey",
            "od",
        )
    )
    return both.groupBy("layout", F.col("file_id").cast("int").alias("file_id")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("o_custkey").alias("min_ck"),
        F.max("o_custkey").alias("max_ck"),
        F.min("od").alias("min_od"),
        F.max("od").alias("max_od"),
        (
            (F.max("o_custkey") < PROBE_CK_LO)
            | (F.min("o_custkey") > PROBE_CK_HI)
            | (F.max("od") < F.lit(PROBE_OD_LO).cast("date"))
            | (F.min("od") > F.lit(PROBE_OD_HI).cast("date"))
        ).alias("skip_probe"),
    )
