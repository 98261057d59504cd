"""Weighted sampling operators for corpus curation.

Two engine-exact weighted sampling designs complementing the uniform /
stratified / temperature samplers (text.py, curation.py):

- **PPS Bernoulli sampling** (`sample_weighted_pps`) — inclusion
  probability proportional to size (document length): the classic
  survey-sampling design for token-budgeted corpus draws where long
  documents should be kept more often. Pure map-side filter: one
  1-row broadcast for the max weight, then an integer comparison per
  row — no shuffle of the corpus at any scale.
- **Priority sampling** (`sample_priority`) — Duffield–Lund–Thorup
  priority sampling: a without-replacement weighted top-k where each
  row gets priority w/u (u uniform) and the k highest priorities are
  kept. Unbiased subset-sum estimation with a FIXED sample size —
  what PPS Bernoulli cannot give. One global top-k: Spark plans
  ``orderBy().limit(k)`` as TakeOrderedAndProject (per-partition
  partial top-k, driver merges k rows per partition), so the shuffle
  is k×partitions rows regardless of corpus size.

Determinism / engine parity: all "randomness" is md5-derived from the
stable key (the house idiom — reproducible across runs, engines, and
retried tasks; rand() is none of those). The only floating-point step
is a SINGLE IEEE-754 division of two exactly-representable integers
(w/u), which is correctly rounded by definition in both Spark and
DuckDB — so the priority order, and therefore the selected sample, is
bit-identical across engines. No pow()/ln() (whose libm rounding is
engine-dependent) anywhere.

Parity note: the reference (go-cdc, a CDC replicator) has no sampling
surface; these belong to the LLM-pipeline surface SURVEY.md §2.B
requires alongside dedup/similarity/curation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import query
from ..tables import load


def _hash16(tag: str, key: str = "doc_id") -> Column:
    """Deterministic uniform 16-bit integer from (tag, key): first 4 hex
    chars of md5 → 0..65535. Same derivation as the stratified/holdout
    samplers so one audit covers the whole idiom."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(tag), F.col(key).cast("string"))), 1, 4),
            16,
            10,
        )
        .cast("long")
    )


_PPS_RATE = 2500  # per-10000 inclusion rate at the maximum weight (25%)

_PPS_ORACLE = f"""
WITH w AS (SELECT MAX(n_chars) AS w_max FROM documents)
SELECT doc_id, lang, source, n_chars,
       CAST(({_PPS_RATE} * n_chars) AS DOUBLE)
           / CAST((10000 * w_max) AS DOUBLE) AS incl_prob
FROM documents, w
WHERE CAST(concat('0x', substr(md5(concat('pps', CAST(doc_id AS VARCHAR))), 1, 4))
           AS BIGINT) * 10000 * w_max < {_PPS_RATE} * 65536 * n_chars
"""


@query("sample_weighted_pps", oracle=_PPS_ORACLE)
def sample_weighted_pps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probability-proportional-to-size Bernoulli sampling: include each
    document with probability (RATE/10000)·(n_chars/max_chars).

    The inclusion test is pure integer arithmetic on the RAW 16-bit
    hash — ``u · 10000 · w_max < RATE · 65536 · w`` — so there is no
    float threshold to drift between engines AND no modulo bias: a
    ``u % 10000`` residue over a uniform 0..65535 would make residues
    0..5535 occur 7/65536 vs 6/65536, inflating the true inclusion rate
    ~6.8% above the reported ``incl_prob`` and biasing any
    Horvitz-Thompson estimator built on it. Cross-multiplying against
    the full 65536-wide hash keeps the realized rate within 1/65536 of
    the reported ratio. The max weight arrives via a 1-row broadcast
    crossJoin — no driver round-trip, no shuffle of the corpus. At
    100 TB this is scan → filter, embarrassingly parallel.
    """
    docs = load(spark, sf_dir, "documents")
    w_max = docs.agg(F.max("n_chars").alias("w_max"))
    u = _hash16("pps")
    return (
        docs.crossJoin(F.broadcast(w_max))
        .filter(
            u * F.lit(10000) * F.col("w_max")
            < F.lit(_PPS_RATE * 65536) * F.col("n_chars")
        )
        .select(
            "doc_id",
            "lang",
            "source",
            "n_chars",
            (
                (F.lit(_PPS_RATE) * F.col("n_chars")).cast("double")
                / (F.lit(10000) * F.col("w_max")).cast("double")
            ).alias("incl_prob"),
        )
    )


_PRIORITY_K = 100

_PRIORITY_ORACLE = f"""
SELECT doc_id, n_chars,
       CAST(n_chars AS DOUBLE)
           / CAST(1 + CAST(concat('0x', substr(md5(concat('prio',
                 CAST(doc_id AS VARCHAR))), 1, 4)) AS BIGINT) AS DOUBLE)
           AS priority
FROM documents
ORDER BY priority DESC, doc_id
LIMIT {_PRIORITY_K}
"""


@query("sample_priority", oracle=_PRIORITY_ORACLE)
def sample_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Priority sampling (Duffield–Lund–Thorup): priority = w/u with
    u ~ Uniform{1..65536} md5-derived from doc_id; keep the k highest
    priorities (ties broken by doc_id). Fixed-size without-replacement
    weighted sample with unbiased subset-sum estimators.

    w and u are exact integers and w/u is ONE correctly-rounded IEEE
    division, so the ranking is bit-identical in Spark and DuckDB.
    ``orderBy().limit(k)`` compiles to TakeOrderedAndProject: each
    partition keeps its local top-k and only k·partitions rows reach
    the driver-side merge — no global sort at any corpus size.
    """
    docs = load(spark, sf_dir, "documents")
    prio = F.col("n_chars").cast("double") / (F.lit(1) + _hash16("prio")).cast("double")
    return (
        docs.select("doc_id", "n_chars", prio.alias("priority"))
        .orderBy(F.col("priority").desc(), "doc_id")
        .limit(_PRIORITY_K)
    )
