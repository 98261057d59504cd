"""Training-data curation operators: decontamination, repetition-based
quality filtering, boilerplate n-gram mining.

These extend the text/dedup suite (operators/text.py, operators/dedup.py)
with the remaining curation stages a large-scale LLM data pipeline runs
between raw crawl and training shards:

- **decontamination** — remove training documents that share n-grams
  with an evaluation/benchmark set (the standard guard against test-set
  leakage). The eval set is small by construction (benchmark suites are
  thousands of documents, not billions), so its distinct-shingle set is
  broadcast and the whole check is a map-side semi-probe: no shuffle of
  the 100 TB training side except the per-doc hit count aggregation,
  keyed by unique doc_id (no skew by construction).
- **repetition quality** (Gopher-style rules): fraction of duplicate
  tokens / dominant-token share / duplicate 2-gram share per document.
  Two-level aggregation (token counts, then per-doc rollup) keyed by
  (doc_id, token) then doc_id — map-side partial aggregation applies at
  both levels, and doc_id keys are unique → uniformly distributed.
- **boilerplate mining** — n-grams present in more than a fixed share
  of all documents (navigation chrome, license headers, templated
  spam). One explode + one count-distinct-docs aggregation keyed by the
  n-gram itself; the document-count scalar joins in via a 1-row
  broadcast, so the threshold is computed without any driver round-trip.

All row-path expressions are JVM built-ins inside whole-stage codegen
(split / transform / sequence lambdas shared with operators/text.py);
no Python UDFs anywhere.

Parity note: the reference (go-cdc, a CDC replicator) has no curation
surface; these belong to the derived LLM-pipeline surface SURVEY.md §2.B
requires alongside dedup/similarity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import query
from ..tables import load
from .text import marker_hits, shingles_col, words_col

EVAL_SOURCE = "src0"  # stand-in benchmark set: one source shard

# DuckDB n-gram list builders (same NULL-skipping concat_ws semantics as
# text.shingles_col: out-of-range list indexes are NULL, concat_ws drops
# them, so a doc shorter than n yields its whole text as one shingle).


def _sql_shingles(n: int) -> str:
    parts = ",\n         ".join(f"string_split(text, ' ')[i + {k}]" for k in range(n))
    return f"""
list_transform(
    range(1, greatest(len(string_split(text, ' ')) - {n - 1}, 1) + 1),
    i -> concat_ws(' ',
         {parts}))
""".strip()


# ---------------------------------------------------------------------------
# Decontamination: training docs sharing any 3-gram with the eval set.
# ---------------------------------------------------------------------------

_DECONTAM_ORACLE = f"""
WITH ev AS (
    SELECT DISTINCT unnest({_sql_shingles(3)}) AS sh
    FROM documents WHERE source = '{EVAL_SOURCE}'
),
tr AS (
    SELECT doc_id, unnest(list_distinct({_sql_shingles(3)})) AS sh
    FROM documents WHERE source <> '{EVAL_SOURCE}'
),
hits AS (
    SELECT doc_id, COUNT(*) AS shared_ngrams
    FROM tr JOIN ev USING (sh)
    GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(h.shared_ngrams, 0) AS BIGINT) AS shared_ngrams,
       CASE WHEN COALESCE(h.shared_ngrams, 0) > 0 THEN 1 ELSE 0 END AS contaminated
FROM documents d LEFT JOIN hits h USING (doc_id)
WHERE d.source <> '{EVAL_SOURCE}'
"""


@query("decontaminate_ngrams", oracle=_DECONTAM_ORACLE)
def decontaminate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: per training document, the number of
    distinct 3-gram shingles it shares with the eval set (here: the
    ``src0`` shard) and a contaminated flag.

    Scale shape (100 TB training / small eval): the eval shingle set is
    built once and **broadcast** — the training side is never shuffled
    against it; each partition probes the broadcast hash table with its
    own exploded shingles. The only shuffle is the per-doc hit count
    (unique doc_id keys) plus the final left join back to the doc list,
    both keyed identically so AQE coalesces them. Contrast with a naive
    shingle-equi-join of two exploded 100 TB sides.
    """
    docs = load(spark, sf_dir, "documents")
    ev = (
        docs.filter(F.col("source") == EVAL_SOURCE)
        .select(F.explode(F.array_distinct(shingles_col())).alias("sh"))
        .distinct()
        .withColumn("__seen", F.lit(1))
    )
    train = docs.filter(F.col("source") != EVAL_SOURCE)
    # r14: ONE training pass instead of two — explode_outer keeps
    # zero-shingle docs (the old form re-scanned the doc list and
    # left-joined the hit counts back), the broadcast probe marks each
    # shingle seen/unseen, and one doc_id aggregate counts the hits.
    return (
        train.select(
            "doc_id",
            F.explode_outer(F.array_distinct(shingles_col())).alias("sh"),
        )
        .join(F.broadcast(ev), "sh", "left")
        .groupBy("doc_id")
        .agg(F.count(F.when(F.col("__seen") == 1, 1)).alias("__hits"))
        .select(
            "doc_id",
            F.col("__hits").cast("long").alias("shared_ngrams"),
            F.when(F.col("__hits") > 0, 1).otherwise(0).alias("contaminated"),
        )
    )


# ---------------------------------------------------------------------------
# n-gram novelty: the inverse of decontamination — how much of a
# holdout document is UNSEEN in the training split, the standard
# memorization / diversity probe over a corpus split.
# ---------------------------------------------------------------------------

_NOVELTY_N = 5  # 5-word spans, the Lee-et-al dedup granularity

_NOVELTY_ORACLE = f"""
WITH tr AS (
    SELECT DISTINCT unnest({_sql_shingles(_NOVELTY_N)}) AS sh
    FROM documents WHERE doc_id % 10 < 8
),
hg AS (
    SELECT doc_id, unnest(list_distinct({_sql_shingles(_NOVELTY_N)})) AS sh
    FROM documents WHERE doc_id % 10 >= 8
),
novel AS (
    SELECT h.doc_id, COUNT(*) AS novel_grams
    FROM hg h LEFT JOIN tr ON tr.sh = h.sh
    WHERE tr.sh IS NULL
    GROUP BY h.doc_id
),
per AS (SELECT doc_id, COUNT(*) AS n_grams FROM hg GROUP BY doc_id)
SELECT p.doc_id,
       CAST(p.n_grams AS BIGINT) AS n_grams,
       CAST(COALESCE(nv.novel_grams, 0) AS BIGINT) AS novel_grams,
       CAST(COALESCE(nv.novel_grams, 0) AS DOUBLE)
           / CAST(p.n_grams AS DOUBLE) AS novelty
FROM per p LEFT JOIN novel nv USING (doc_id)
"""


@query("ngram_novelty", oracle=_NOVELTY_ORACLE)
def ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per holdout document (doc_id % 10 >= 8, the 20% split), the
    fraction of its distinct {_NOVELTY_N}-gram shingles that never
    appear in the training split — decontamination's inverse: low
    novelty = the holdout mostly restates training text (leakage /
    memorization risk), high novelty = genuinely new material.

    Scale shape: the REFERENCE side here is the big one (training
    grams), so unlike decontaminate_ngrams' broadcast-eval shape this
    is a distinct-first gram-key shuffle join: both sides dedupe
    map-side before the shuffle (array_distinct per doc, then DISTINCT
    on the train side). r14: ONE pass instead of three — the old form
    exploded the holdout twice (novel-count anti-join + per-doc total)
    and joined the two counts back; a left join against the distinct
    train grams (no fan-out possible: the right side is unique on the
    key) marks seen/unseen per gram, and a single doc_id aggregate
    folds both counts. Same values, one holdout explode, one gram
    shuffle, one doc_id shuffle."""
    docs = load(spark, sf_dir, "documents")
    sh = F.explode(F.array_distinct(shingles_col(n=_NOVELTY_N))).alias("sh")
    tr = (
        docs.filter(F.col("doc_id") % 10 < 8)
        .select(sh)
        .distinct()
        .withColumn("__seen", F.lit(1))
    )
    hg = docs.filter(F.col("doc_id") % 10 >= 8).select("doc_id", sh)
    counts = (
        hg.join(tr, "sh", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count(F.when(F.col("__seen").isNull(), 1)).alias("novel_grams"),
        )
    )
    return counts.select(
        "doc_id",
        F.col("n_grams").cast("long").alias("n_grams"),
        F.col("novel_grams").cast("long").alias("novel_grams"),
        (
            F.col("novel_grams").cast("double") / F.col("n_grams").cast("double")
        ).alias("novelty"),
    )


# ---------------------------------------------------------------------------
# Repetition-based quality rules (Gopher-style).
# ---------------------------------------------------------------------------

_REPETITION_ORACLE = f"""
WITH tc AS (
    SELECT doc_id, tok, COUNT(*) AS c
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
    GROUP BY doc_id, tok
),
agg AS (
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           COUNT(*) AS n_uniq,
           MAX(c) AS top_c
    FROM tc GROUP BY doc_id
),
tg AS (
    SELECT doc_id,
           len(list_distinct({_sql_shingles(2)})) AS d2,
           greatest(len(string_split(text, ' ')) - 1, 1) AS n2
    FROM documents
)
SELECT a.doc_id,
       a.n_tokens,
       CAST(a.n_uniq AS DOUBLE) / CAST(a.n_tokens AS DOUBLE) AS uniq_token_frac,
       CAST(a.top_c AS DOUBLE) / CAST(a.n_tokens AS DOUBLE) AS top_token_frac,
       1.0 - CAST(tg.d2 AS DOUBLE) / CAST(tg.n2 AS DOUBLE) AS dup_2gram_frac,
       CASE WHEN CAST(a.top_c AS DOUBLE) / CAST(a.n_tokens AS DOUBLE) <= 0.125
                 AND 1.0 - CAST(tg.d2 AS DOUBLE) / CAST(tg.n2 AS DOUBLE) <= 0.125
            THEN 1 ELSE 0 END AS keep
FROM agg a JOIN tg USING (doc_id)
"""


@query("quality_repetition", oracle=_REPETITION_ORACLE)
def quality_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filters: per document, unique-token
    fraction, dominant-token share, and duplicate-2-gram share, plus the
    resulting keep/drop decision.

    Scale shape: token counts are a (doc_id, token)-keyed aggregation
    with map-side partials, rolled up to doc_id — both keys unique or
    near-unique, no skew. The 2-gram distinctness is computed **inside
    the row** (array_distinct over the shingle array, no explode): a
    document's 2-gram set never leaves its partition. The final join is
    doc_id-to-doc_id on two already-co-keyed aggregates.
    """
    docs = load(spark, sf_dir, "documents")
    agg = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.count("*").alias("n_uniq"),
            F.max("c").alias("top_c"),
        )
    )
    tg = docs.select(
        "doc_id",
        F.size(F.array_distinct(shingles_col(n=2))).alias("d2"),
        F.greatest(F.size(F.split("text", " ")) - 1, F.lit(1)).alias("n2"),
    )
    top_frac = F.col("top_c").cast("double") / F.col("n_tokens").cast("double")
    dup2_frac = F.lit(1.0) - F.col("d2").cast("double") / F.col("n2").cast("double")
    return (
        agg.join(tg, "doc_id")
        .select(
            "doc_id",
            "n_tokens",
            (F.col("n_uniq").cast("double") / F.col("n_tokens").cast("double")).alias(
                "uniq_token_frac"
            ),
            top_frac.alias("top_token_frac"),
            dup2_frac.alias("dup_2gram_frac"),
            F.when((top_frac <= 0.125) & (dup2_frac <= 0.125), 1)
            .otherwise(0)
            .alias("keep"),
        )
    )


# ---------------------------------------------------------------------------
# Boilerplate n-gram mining: 2-grams present in ≥5% of all documents.
# ---------------------------------------------------------------------------

_BOILERPLATE_ORACLE = f"""
WITH sh AS (
    SELECT doc_id, unnest(list_distinct({_sql_shingles(2)})) AS ngram
    FROM documents
),
df AS (SELECT ngram, COUNT(*) AS doc_freq FROM sh GROUP BY ngram),
total AS (SELECT COUNT(*) AS n_docs FROM documents)
SELECT df.ngram, df.doc_freq,
       CAST(df.doc_freq AS DOUBLE) / CAST(t.n_docs AS DOUBLE) AS doc_share
FROM df, total t
WHERE df.doc_freq * 20 >= t.n_docs
"""


@query("boilerplate_ngrams", oracle=_BOILERPLATE_ORACLE)
def boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate mining: 2-grams whose document frequency is ≥5% of
    the corpus (template chrome / license headers / repeated spam), with
    their document share.

    Scale shape: per-doc distinct shingles explode map-side; one
    aggregation keyed by the n-gram (hot n-grams are exactly what we're
    looking for, and a count-only aggregate is skew-immune thanks to
    map-side partial counts). The corpus document count is a 1-row
    aggregate **cross-broadcast** into the filter — integer-arithmetic
    threshold (`doc_freq * 20 >= n_docs`), no driver collect, no float
    threshold drift.
    """
    docs = load(spark, sf_dir, "documents")
    # raw explode + count-distinct, not array_distinct + count: the
    # per-doc array_distinct is an interpreted collection pass (see
    # dedup.py); distinct-(doc,ngram) folds into the two-phase
    # count-distinct aggregate, fully codegen
    df = (
        docs.select("doc_id", F.explode(shingles_col(n=2)).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count_distinct("doc_id").alias("doc_freq"))
    )
    total = docs.agg(F.count("*").alias("n_docs"))
    return (
        df.crossJoin(F.broadcast(total))
        .filter(F.col("doc_freq") * 20 >= F.col("n_docs"))
        .select(
            "ngram",
            "doc_freq",
            (F.col("doc_freq").cast("double") / F.col("n_docs").cast("double")).alias(
                "doc_share"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Reference-model quality scoring (CCNet lineage): CCNet buckets web
# documents by the perplexity of a KenLM trained on Wikipedia. The
# in-engine, log-free analog: train a bigram VOCABULARY on a trusted
# reference slice, score every document by its out-of-vocabulary bigram
# rate, and bucket the corpus on that rate. Pure rational arithmetic
# end to end (counts, integer-div bucketing, one exact-longs division)
# — so unlike a log-prob perplexity, it is bit-identical cross-engine
# and earns a full hash-checked oracle.
# ---------------------------------------------------------------------------

# trusted reference slice: every 7th document stands in for CCNet's
# Wikipedia (a deterministic, engine-portable sample rule)
_OOV_REF_MOD = 7
_OOV_BUCKETS = 10

_OOV_ORACLE = f"""
WITH big AS (
    SELECT doc_id, lang, unnest({_sql_shingles(2)}) AS bg FROM documents
),
vocab AS (SELECT DISTINCT bg FROM big WHERE doc_id % {_OOV_REF_MOD} = 0),
scored AS (
    SELECT b.doc_id, b.lang,
           COUNT(*) AS n_big,
           SUM(CASE WHEN v.bg IS NULL THEN 1 ELSE 0 END) AS n_oov
    FROM big b LEFT JOIN vocab v ON b.bg = v.bg
    GROUP BY b.doc_id, b.lang
)
SELECT lang,
       CAST(LEAST({_OOV_BUCKETS - 1}, (n_oov * {_OOV_BUCKETS}) // n_big)
            AS INT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_big) AS BIGINT) AS n_bigrams,
       CAST(SUM(n_oov) AS BIGINT) AS n_oov,
       CAST(SUM(n_oov) AS DOUBLE) / CAST(SUM(n_big) AS DOUBLE) AS oov_rate
FROM scored
GROUP BY lang, bucket
"""


@query("quality_oov_bigrams", oracle=_OOV_ORACLE)
def quality_oov_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(lang, decile-bucket) corpus composition by out-of-vocabulary
    bigram rate against a reference slice — the log-free CCNet
    perplexity-bucket analog (see module comment). A document whose
    bigrams are mostly unseen in the trusted slice lands in a high
    bucket: the filter/mix knob is then per-bucket sampling, exactly
    CCNet's head/middle/tail treatment.

    Scale shape: bigrams explode map-side (the shared shingle
    expression, codegen); the vocabulary is a distinct over the
    reference slice only (corpus/{_OOV_REF_MOD}); membership is one
    hash join keyed by the bigram string (count-only aggregate above
    it, skew-immune via map-side partials); the rollup output is
    lang × {_OOV_BUCKETS} rows. At 100 TB the vocabulary of a trusted
    slice is the big-but-boundable side — cap it by document frequency
    (the boilerplate_ngrams pattern) or swap in a bloom filter of the
    vocab; the join stays the same plan."""
    docs = load(spark, sf_dir, "documents")
    big = docs.select(
        "doc_id", "lang", F.explode(shingles_col(n=2)).alias("bg")
    )
    vocab = (
        big.filter(F.col("doc_id") % _OOV_REF_MOD == 0).select("bg").distinct()
    )
    scored = (
        big.join(vocab.withColumn("__known", F.lit(True)), "bg", "left")
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_big"),
            F.sum(F.when(F.col("__known").isNull(), 1).otherwise(0)).alias(
                "n_oov"
            ),
        )
    )
    bucket = F.least(
        F.lit(_OOV_BUCKETS - 1),
        F.expr(f"(n_oov * {_OOV_BUCKETS}) div n_big"),
    ).cast("int")
    return (
        scored.groupBy("lang", bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_big").cast("bigint").alias("n_bigrams"),
            F.sum("n_oov").cast("bigint").alias("n_oov"),
        )
        .withColumn(
            "oov_rate",
            F.col("n_oov").cast("double") / F.col("n_bigrams").cast("double"),
        )
    )


# ---------------------------------------------------------------------------
# Sequence packing: greedy fixed-budget concatenation within hash buckets.
# ---------------------------------------------------------------------------

SEQ_BUDGET = 256  # tokens per packed training sequence
N_PACK_BUCKETS = 16

_PACK_ORACLE = f"""
WITH t AS (
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           CAST(concat('0x', substr(md5(concat('pack', CAST(doc_id AS VARCHAR))), 1, 4)) AS BIGINT)
               % {N_PACK_BUCKETS} AS bucket
    FROM documents
),
c AS (
    SELECT doc_id, n_tokens, bucket,
           COALESCE(SUM(n_tokens) OVER (
               PARTITION BY bucket ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
    FROM t
)
SELECT doc_id, n_tokens, bucket,
       CAST(cum_before // {SEQ_BUDGET} AS BIGINT) AS seq_in_bucket,
       CAST(cum_before % {SEQ_BUDGET} AS BIGINT) AS offset_in_seq
FROM c
"""


@query("pack_sequences", oracle=_PACK_ORACLE)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: assign documents to fixed-token-budget training
    sequences by greedy concatenation in stable (doc_id) order — the
    standard pretraining step that turns ragged documents into dense
    fixed-length samples. A document starting at offset ``o`` in
    sequence ``s`` straddles into ``s+1`` when ``o + n_tokens`` exceeds
    the budget (concat-then-chunk semantics).

    Scale shape: packing runs **within hash buckets**, each an
    independent window — shuffle keyed by bucket, running-sum state is
    O(1) per row. The tempting global version (one ORDER BY doc_id
    window over the corpus) serializes 100 TB through a single
    partition; the bucket count is the parallelism knob, and bucket
    assignment is a deterministic hash so re-runs produce identical
    shards.
    """
    from pyspark.sql.window import Window

    docs = load(spark, sf_dir, "documents")
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("pack"), F.col("doc_id").cast("string"))), 1, 4
            ),
            16,
            10,
        ).cast("long")
        % N_PACK_BUCKETS
    )
    t = docs.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        bucket.alias("bucket"),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = t.withColumn("cum_before", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
    return c.select(
        "doc_id",
        "n_tokens",
        "bucket",
        F.expr(f"cum_before div {SEQ_BUDGET}").alias("seq_in_bucket"),
        (F.col("cum_before") % SEQ_BUDGET).alias("offset_in_seq"),
    )


# ---------------------------------------------------------------------------
# Temperature-based mixture sampling (XLM-R style, α = 0.5).
# ---------------------------------------------------------------------------

_TEMPERATURE_ORACLE = """
WITH c AS (SELECT lang, COUNT(*) AS n_l FROM documents GROUP BY lang),
m AS (SELECT MIN(n_l) AS n_min FROM c),
r AS (
    SELECT lang,
           CAST(floor(sqrt(CAST(m.n_min AS DOUBLE) / CAST(c.n_l AS DOUBLE)) * 10000)
                AS BIGINT) AS thr
    FROM c, m
)
SELECT d.doc_id, d.lang, d.source
FROM documents d JOIN r USING (lang)
WHERE CAST(concat('0x', substr(md5(concat('temp', CAST(doc_id AS VARCHAR))), 1, 4)) AS BIGINT)
      % 10000 < r.thr
"""


@query("sample_temperature", oracle=_TEMPERATURE_ORACLE)
def sample_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-flattened language mixture (α = 0.5): per-language
    keep-rate ``sqrt(n_rarest / n_lang)`` — the rarest language keeps
    everything, dominant languages downsample toward a flatter mixture
    (the multilingual-pretraining rebalance). Selection is hash-of-key,
    not rand(): reproducible across runs, engines, and task retries.

    Float-parity note: α = 0.5 makes the rate a ``sqrt``, which IEEE 754
    requires to be correctly rounded — bit-identical in Spark and DuckDB.
    A general ``pow(x, α)`` is NOT correctly-rounded and could flip a
    floor() at a threshold boundary between engines.

    Scale shape: language counts are a tiny aggregate, broadcast back;
    the keep decision is a map-side filter. Nothing shuffles except the
    O(#languages) rate table.
    """
    docs = load(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count("*").alias("n_l"))
    n_min = counts.agg(F.min("n_l").alias("n_min"))
    rates = counts.crossJoin(F.broadcast(n_min)).select(
        "lang",
        F.floor(
            F.sqrt(F.col("n_min").cast("double") / F.col("n_l").cast("double"))
            * 10000
        )
        .cast("long")
        .alias("thr"),
    )
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("temp"), F.col("doc_id").cast("string"))), 1, 4
            ),
            16,
            10,
        ).cast("long")
        % 10000
    )
    return (
        docs.join(F.broadcast(rates), "lang")
        .filter(bucket < F.col("thr"))
        .select("doc_id", "lang", "source")
    )


# ---------------------------------------------------------------------------
# Chunk-level exact dedup (RefinedWeb-style "paragraph" dedup): split
# every document into fixed windows of CHUNK_WORDS words, drop every
# chunk that appeared earlier in the corpus (first occurrence by
# (doc_id, pos) survives), reassemble the surviving chunks in document
# order. Catches boilerplate repeated ACROSS documents that whole-doc
# hashing misses, without the recall limits of shingle LSH.
# ---------------------------------------------------------------------------

CHUNK_WORDS = 10
_POS_ENC = 10_000  # keeper key = doc_id * _POS_ENC + pos (pos < 10k by construction)
_MAX_CHUNKS = 40  # oracle-side position range bound (docs are <= 100 words)

_PARA_ORACLE = f"""
WITH w AS (
    SELECT doc_id, string_split(text, ' ') AS ws FROM documents
), ch AS (
    SELECT doc_id, r.i - 1 AS pos,
           array_to_string(list_slice(ws, (r.i - 1) * {CHUNK_WORDS} + 1,
                                      (r.i - 1) * {CHUNK_WORDS} + {CHUNK_WORDS}), ' ') AS chunk
    FROM w, (SELECT unnest(range(1, {_MAX_CHUNKS} + 1)) AS i) r
    WHERE r.i <= CAST(ceil(len(ws) / {CHUNK_WORDS}.0) AS BIGINT)
), keeper AS (
    SELECT chunk, MIN(doc_id * {_POS_ENC} + pos) AS keeper_key
    FROM ch GROUP BY chunk
), kept AS (
    SELECT ch.doc_id, ch.pos, ch.chunk
    FROM ch JOIN keeper USING (chunk)
    WHERE ch.doc_id * {_POS_ENC} + ch.pos = keeper.keeper_key
), reassembled AS (
    SELECT doc_id, string_agg(chunk, ' ' ORDER BY pos) AS text_deduped,
           CAST(COUNT(*) AS BIGINT) AS n_kept
    FROM kept GROUP BY doc_id
)
SELECT w.doc_id,
       COALESCE(r.text_deduped, '') AS text_deduped,
       COALESCE(r.n_kept, 0) AS n_kept,
       CAST(ceil(len(w.ws) / {CHUNK_WORDS}.0) AS BIGINT) AS n_total
FROM w LEFT JOIN reassembled r USING (doc_id)
"""


@query("dedup_paragraphs", oracle=_PARA_ORACLE)
def dedup_paragraphs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide chunk dedup: {CHUNK_WORDS}-word windows, global first
    occurrence (min (doc_id, pos), encoded as one BIGINT so the survivor
    pick is a plain MIN aggregate) survives; documents are rebuilt from
    their surviving chunks in order.

    Scale shape: chunking is map-side (the word array is bound once per
    row — the staged-projection rule); the dedup itself is ONE
    hash-groupBy on the chunk text plus an equi-join back, both keyed by
    the chunk — no window over the corpus, no skew beyond genuinely hot
    boilerplate chunks (which AQE skew-split handles). Reassembly
    aggregates ~{CHUNK_WORDS}0-word docs by unique doc_id.
    """
    docs = load(spark, sf_dir, "documents")
    staged = docs.select("doc_id", F.split("text", " ").alias("ws"))
    n_chunks = F.ceil(F.size("ws") / F.lit(float(CHUNK_WORDS))).cast("int")
    chunked = staged.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda i: F.array_join(
                    F.slice("ws", i * CHUNK_WORDS + 1, CHUNK_WORDS), " "
                ),
            )
        ).alias("pos", "chunk"),
    )
    enc = F.col("doc_id") * _POS_ENC + F.col("pos")
    keeper = chunked.groupBy("chunk").agg(F.min(enc).alias("keeper_key"))
    kept = chunked.join(keeper, "chunk").filter(enc == F.col("keeper_key"))
    reassembled = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "chunk"))),
                lambda s: s["chunk"],
            ),
            " ",
        ).alias("text_deduped"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    return (
        staged.join(reassembled, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("text_deduped", F.lit("")).alias("text_deduped"),
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            F.ceil(F.size("ws") / F.lit(float(CHUNK_WORDS))).cast("long").alias("n_total"),
        )
    )


# ---------------------------------------------------------------------------
# PII redaction: the scrub pass every crawl corpus runs before training.
# Pure regexp_replace chain — map-side, whole-stage codegen, no shuffle
# at all. Patterns are deliberately RE2-compatible (no backrefs, no
# lookaround) so the same strings run in Java regex (Spark) and RE2
# (DuckDB) with identical semantics.
# ---------------------------------------------------------------------------

_PII_PATTERNS = [
    # order matters: emails contain digit runs and dots, so they redact first
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("number", r"\b\d{6,}\b", "<NUM>"),
]

_PII_COUNT_SQL = " + ".join(
    f"len(regexp_extract_all(text, '{pat}'))" for _, pat, _ in _PII_PATTERNS
)
_PII_REDACT_SQL = "text"
for _, _pat, _rep in _PII_PATTERNS:
    _PII_REDACT_SQL = f"regexp_replace({_PII_REDACT_SQL}, '{_pat}', '{_rep}', 'g')"

_PII_ORACLE = f"""
SELECT doc_id,
       {_PII_REDACT_SQL} AS text_redacted,
       CAST({_PII_COUNT_SQL} AS BIGINT) AS n_redactions
FROM documents
"""


@query("pii_redact", oracle=_PII_ORACLE)
def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redact emails / IPv4s / long digit runs with typed placeholder
    tokens, counting the redactions per document. Counting runs against
    the ORIGINAL text (a replacement could otherwise create or destroy a
    later pattern's match), and replacement order is pinned so the
    passes compose deterministically."""
    docs = load(spark, sf_dir, "documents")
    n = F.lit(0).cast("long")
    for _, pat, _ in _PII_PATTERNS:
        n = n + F.regexp_count("text", F.lit(pat))
    redacted = F.col("text")
    for _, pat, rep in _PII_PATTERNS:
        redacted = F.regexp_replace(redacted, pat, rep)
    return docs.select(
        "doc_id",
        redacted.alias("text_redacted"),
        n.alias("n_redactions"),
    )


# ---------------------------------------------------------------------------
# C4-style composite keep/drop filter: the cheap lexical rules run
# together in one map-side pass (no shuffle anywhere) with per-rule
# flags kept in the output so downstream can audit WHY a doc dropped —
# the operational shape of every production corpus filter.
# ---------------------------------------------------------------------------

C4_MIN_WORDS = 50
C4_MAX_WORD_LEN = 20
C4_MIN_STOP_RATIO = 0.05

_C4_ORACLE = f"""
SELECT doc_id,
       n_words,
       too_short,
       has_long_word,
       stop_ratio,
       low_stopword,
       CASE WHEN too_short = 0 AND has_long_word = 0 AND low_stopword = 0
            THEN 1 ELSE 0 END AS keep
FROM (
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
           CASE WHEN len(string_split(text, ' ')) < {C4_MIN_WORDS} THEN 1 ELSE 0 END AS too_short,
           CASE WHEN len(regexp_extract_all(text, '[^ ]{{{C4_MAX_WORD_LEN + 1},}}')) > 0
                THEN 1 ELSE 0 END AS has_long_word,
           CAST(len(list_filter(string_split(text, ' '), w_ -> w_ IN ('the', 'a', 'of'))) AS DOUBLE)
               / len(string_split(text, ' ')) AS stop_ratio,
           CASE WHEN CAST(len(list_filter(string_split(text, ' '), w_ -> w_ IN ('the', 'a', 'of'))) AS DOUBLE)
                     / len(string_split(text, ' ')) < {C4_MIN_STOP_RATIO} THEN 1 ELSE 0 END AS low_stopword
    FROM documents
)
"""


@query("c4_quality_filter", oracle=_C4_ORACLE)
def c4_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite lexical quality filter (C4-flavored): minimum length,
    no over-long tokens (mangled markup/base64 blobs), minimum stopword
    ratio (natural-language check) — each rule surfaced as its own flag
    plus the combined keep decision. Everything is one codegen
    projection over the corpus; the over-long-token rule is a
    regexp_count on the raw text, not a per-word array pass."""
    return c4_flags(load(spark, sf_dir, "documents"))


def c4_flags(
    docs: DataFrame,
    min_words: int = C4_MIN_WORDS,
    max_word_len: int = C4_MAX_WORD_LEN,
    min_stop_ratio: float = C4_MIN_STOP_RATIO,
) -> DataFrame:
    """df-level C4 core (thresholds are the recipe knobs; the
    registered query fixes them at the module constants)."""
    n_words = F.size(words_col()).cast("long")
    too_short = F.when(n_words < min_words, 1).otherwise(0)
    has_long_word = F.when(
        F.regexp_count("text", F.lit(f"[^ ]{{{max_word_len + 1},}}")) > 0, 1
    ).otherwise(0)
    stop_ratio = marker_hits("en").cast("double") / F.size(words_col())
    low_stopword = F.when(stop_ratio < min_stop_ratio, 1).otherwise(0)
    base = docs.select(
        "doc_id",
        n_words.alias("n_words"),
        too_short.alias("too_short"),
        has_long_word.alias("has_long_word"),
        stop_ratio.alias("stop_ratio"),
        low_stopword.alias("low_stopword"),
    )
    return base.withColumn(
        "keep",
        F.when(
            (F.col("too_short") == 0)
            & (F.col("has_long_word") == 0)
            & (F.col("low_stopword") == 0),
            1,
        ).otherwise(0),
    )


# ---------------------------------------------------------------------------
# Corpus composition report: the mixture table every training run is
# configured from (docs/tokens per source × language, with shares).
# ---------------------------------------------------------------------------


@query(
    "corpus_composition",
    oracle="""
    WITH per AS (
        SELECT source, lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        FROM documents GROUP BY source, lang
    ), tot AS (
        SELECT CAST(SUM(n_docs) AS BIGINT) AS t_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS t_tokens
        FROM per
    )
    SELECT source, lang, n_docs, n_tokens,
           CAST(n_docs AS DOUBLE) / t_docs AS share_docs,
           CAST(n_tokens AS DOUBLE) / t_tokens AS share_tokens
    FROM per CROSS JOIN tot
    """,
)
def corpus_composition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Docs and whitespace-token counts per (source, language) with
    corpus shares — the input to mixture weighting (sample_temperature
    consumes exactly these rates). Integer counts divide as doubles at
    the end, so shares are engine-exact. One groupBy + a 1-row
    broadcast total; no other shuffle."""
    docs = load(spark, sf_dir, "documents")
    per = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(words_col())).alias("n_tokens"),
    )
    tot = per.agg(
        F.sum("n_docs").alias("t_docs"), F.sum("n_tokens").alias("t_tokens")
    )
    return per.crossJoin(F.broadcast(tot)).select(
        "source",
        "lang",
        "n_docs",
        "n_tokens",
        (F.col("n_docs").cast("double") / F.col("t_docs")).alias("share_docs"),
        (F.col("n_tokens").cast("double") / F.col("t_tokens")).alias("share_tokens"),
    )


# ---------------------------------------------------------------------------
# RAG / context-window document chunking.
# ---------------------------------------------------------------------------

_CHUNK_SIZE = 500
_CHUNK_STRIDE = 400

_CHUNK_ORACLE = f"""
SELECT doc_id, CAST(i AS BIGINT) AS chunk_no,
       CAST(i * {_CHUNK_STRIDE} AS BIGINT) AS chunk_start,
       substr(text, CAST(i * {_CHUNK_STRIDE} + 1 AS INT), {_CHUNK_SIZE})
         AS chunk_text,
       CAST(LENGTH(substr(text, CAST(i * {_CHUNK_STRIDE} + 1 AS INT),
                          {_CHUNK_SIZE})) AS BIGINT) AS chunk_len
FROM documents,
     UNNEST(generate_series(
       0, CAST(FLOOR((LENGTH(text) - 1) / {_CHUNK_STRIDE}) AS BIGINT))) t(i)
ORDER BY doc_id, chunk_no
"""


@query("chunk_documents", oracle=_CHUNK_ORACLE)
def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-size character chunks (500 wide, stride 400
    → 100-char overlap)
    — the retrieval/embedding prep step that turns documents into
    context-window-sized passages.

    Scale shape: pure map-side Generate (sequence + explode + substr
    inside codegen) — zero shuffles, output volume = input ×
    size/stride overlap factor. substr is O(chunk) not O(doc) per
    output row, so a pathological 1 GB document costs its own length,
    not length × chunks. At 100 TB the chunk stream feeds straight
    into the embedding/minhash stages without materializing."""
    # empty documents yield ZERO chunks: without the filter, Spark's
    # sequence(0, -1) descends ([0, -1]) while the oracle's
    # generate_series(0, -1) is empty — divergent rows with negative
    # chunk numbers.
    docs = load(spark, sf_dir, "documents").filter(F.length("text") > 0)
    n_chunks_hi = F.floor((F.length("text") - 1) / _CHUNK_STRIDE)
    chunked = docs.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), n_chunks_hi.cast("int"))).alias("i"),
        F.col("text"),
    )
    start = F.col("i").cast("bigint") * _CHUNK_STRIDE
    chunk = F.substring(
        F.col("text"), (F.col("i") * _CHUNK_STRIDE + 1).cast("int"), _CHUNK_SIZE
    )
    return (
        chunked.select(
            "doc_id",
            F.col("i").cast("bigint").alias("chunk_no"),
            start.alias("chunk_start"),
            chunk.alias("chunk_text"),
            F.length(chunk).cast("bigint").alias("chunk_len"),
        )
        .orderBy("doc_id", "chunk_no")
    )


# ---------------------------------------------------------------------------
# Gap-based sessionization (batch twin of the streaming session window).
# ---------------------------------------------------------------------------

_SESSION_GAP_MIN = 30

_SESSIONIZE_ORACLE = f"""
WITH marked AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN ts - LAG(ts) OVER w <= INTERVAL {_SESSION_GAP_MIN} MINUTE
              THEN 0 ELSE 1 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
numbered AS (
  SELECT user_id, event_id, ts, value,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS session_no
  FROM marked
)
SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
       MIN(ts) AS session_start, MAX(ts) AS session_end,
       COUNT(*) AS n_events,
       CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
         AS total_value
FROM numbered
GROUP BY user_id, session_no
ORDER BY user_id, session_no
"""


@query("sessionize_events", oracle=_SESSIONIZE_ORACLE)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: a session breaks after 30 idle
    minutes (_SESSION_GAP_MIN); emit per-session bounds and totals. The batch twin of
    the streaming ``session_window`` aggregation (window_session) —
    this form also ASSIGNS session numbers, which the built-in window
    aggregate doesn't expose.

    Scale shape: one shuffle on user_id serves both windows (lag mark,
    running sum — same partitioning and ordering, evaluated in a single
    Window exec) and the per-session aggregate re-uses the (user_id)
    clustering so only the final small rollup exchanges. Per-user state
    is a single row (previous ts) — unbounded history streams through."""
    ev = load(spark, sf_dir, "events")
    from pyspark.sql.window import Window

    gap_us = _SESSION_GAP_MIN * 60 * 1_000_000
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.when(us - F.lag(us).over(w) <= gap_us, F.lit(0))
        .otherwise(F.lit(1))
        .alias("is_new"),
    )
    wrun = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    numbered = marked.withColumn(
        "session_no", F.sum("is_new").over(wrun).cast("bigint")
    )
    return (
        numbered.groupBy("user_id", "session_no")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("total_value"),
        )
        .orderBy("user_id", "session_no")
    )


# ---------------------------------------------------------------------------
# Language-model quality proxy: corpus bigram statistics per document.
# The cheap stand-in for perplexity-based quality filtering (the
# CCNet/KenLM stage of public LLM pipelines): documents whose word
# bigrams are rare in the corpus read as noise/garbled/off-domain.
# Rational-arithmetic only — a real LM emits log-probs, and ln() is
# 1-ulp engine-dependent (see functions guide), so the score here is
# the mean corpus frequency of the document's bigrams plus the share
# of rare bigrams: same ranking power for filtering, bit-exact in
# both engines (integer sums through ONE IEEE division each).
#
# Scale shape: explode bigrams → count per bigram (map-side partials
# collapse the skew: bigram frequency follows Zipf, but partial
# aggregation bounds any one reducer's hot key) → join the counts
# back → per-doc rollup keyed by unique doc_id. Two shuffles of the
# exploded corpus — the inherent cost of any corpus-LM scoring pass;
# at 100 TB the bigram count table itself can be df-capped/broadcast
# once vocabulary saturates.
# ---------------------------------------------------------------------------

_LM_BIGRAM_ORACLE = f"""
WITH bg AS (
    SELECT doc_id, unnest({_sql_shingles(2)}) AS bg FROM documents
),
c AS (SELECT bg, COUNT(*) AS c FROM bg GROUP BY bg)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(c) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_bigram_count,
       CAST(SUM(CASE WHEN c <= 2 THEN 1 ELSE 0 END) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE) AS rare_share
FROM bg JOIN c USING (bg)
GROUP BY doc_id
"""


@query("lm_bigram_score", oracle=_LM_BIGRAM_ORACLE)
def lm_bigram_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-proxy quality score: per document, the mean corpus
    frequency of its word bigrams and the share of rare (≤2
    occurrences) bigrams. Low mean / high rare-share flags unusual
    text the way high LM perplexity does, without engine-dependent
    logarithms."""
    docs = load(spark, sf_dir, "documents")
    bg = docs.select("doc_id", F.explode(shingles_col(n=2)).alias("bg"))
    counts = bg.groupBy("bg").agg(F.count(F.lit(1)).alias("c"))
    return (
        bg.join(counts, "bg")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            (F.sum("c").cast("double") / F.count(F.lit(1)).cast("double")).alias(
                "mean_bigram_count"
            ),
            (
                F.sum(F.when(F.col("c") <= 2, 1).otherwise(0)).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("rare_share"),
        )
    )


# ---------------------------------------------------------------------------
# URL canonicalization + dedup: the first dedup stage of every web-crawl
# pipeline (CCNet/C4 lineage) — collapse scheme/case/www/trailing-slash/
# tracking-param variants of the same page BEFORE any content hashing
# runs. The fixture corpus carries no URL column, so a deterministic
# synthetic URL derives from (source, doc_id) identically in both
# engines (the media-bytes pattern, operators/multimodal.py): the oracle
# then checks real canonicalization string semantics, not fixture
# plumbing.
# ---------------------------------------------------------------------------

# messy-on-purpose synthetic URL: mixed-case scheme, optional www,
# bucketed path (collisions = duplicate pages), optional trailing
# slash, interleaved tracking and content params
_URL_SQL_SPARK = """
concat(
  element_at(array('HTTPS://', 'https://', 'http://', 'https://'),
             cast(doc_id % 4 as int) + 1),
  CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END,
  source, '.example.com/articles/', cast(doc_id % 500 as string),
  CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END,
  CASE WHEN doc_id % 5 = 0 THEN concat('?utm_source=feed&ref=', cast(doc_id % 3 as string))
       WHEN doc_id % 5 = 1 THEN concat('?ref=', cast(doc_id % 3 as string), '&utm_campaign=x')
       ELSE '' END
)
""".strip()

_URL_SQL_DUCK = """
concat(
  ['HTTPS://', 'https://', 'http://', 'https://'][CAST(doc_id % 4 AS INTEGER) + 1],
  CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END,
  source, '.example.com/articles/', CAST(doc_id % 500 AS VARCHAR),
  CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END,
  CASE WHEN doc_id % 5 = 0 THEN concat('?utm_source=feed&ref=', CAST(doc_id % 3 AS VARCHAR))
       WHEN doc_id % 5 = 1 THEN concat('?ref=', CAST(doc_id % 3 AS VARCHAR), '&utm_campaign=x')
       ELSE '' END
)
""".strip()

_URL_DEDUP_ORACLE = f"""
WITH u AS (
  SELECT doc_id, {_URL_SQL_DUCK} AS url FROM documents
), parts AS (
  SELECT doc_id, url,
         string_split(url, '?')[1] AS base,
         CASE WHEN len(string_split(url, '?')) > 1
              THEN string_split(url, '?')[2] ELSE NULL END AS q
  FROM u
), canon AS (
  SELECT doc_id,
         concat(
           regexp_replace(regexp_replace(regexp_replace(
               lower(base), '^https?://', ''), '^www\\.', ''), '/$', ''),
           CASE WHEN q IS NOT NULL
                     AND len(list_filter(string_split(q, '&'),
                                         p -> p NOT LIKE 'utm_%')) > 0
                THEN concat('?', array_to_string(
                       list_sort(list_filter(string_split(q, '&'),
                                             p -> p NOT LIKE 'utm_%')), '&'))
                ELSE '' END
         ) AS canon_url
  FROM parts
)
SELECT canon_url,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       MIN(doc_id) AS keep_doc_id
FROM canon GROUP BY canon_url
"""


@query("url_dedup_canonical", oracle=_URL_DEDUP_ORACLE)
def url_dedup_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization dedup: lowercase host, strip scheme / www. /
    trailing slash, drop utm_* tracking params, sort the survivors —
    then group by the canonical form, keeping the min doc_id as
    survivor.

    Scale shape: canonicalization is pure map-side string expressions in
    whole-stage codegen; the only shuffle is the final group-by on the
    canonical URL, whose keys are near-unique by construction (no skew —
    a hot canonical URL IS the duplicate cluster being collapsed, and it
    collapses map-side via partial aggregation)."""
    docs = load(spark, sf_dir, "documents")
    url = F.expr(_URL_SQL_SPARK)
    base = F.lower(F.split_part(url, F.lit("?"), F.lit(1)))
    q = F.nullif(F.split_part(url, F.lit("?"), F.lit(2)), F.lit(""))
    base = F.regexp_replace(base, r"^https?://", "")
    base = F.regexp_replace(base, r"^www\.", "")
    base = F.regexp_replace(base, r"/$", "")
    kept = F.expr("filter(split(q, '&'), p -> p NOT LIKE 'utm_%')")
    canon = F.concat(
        F.col("base"),
        F.when(
            F.col("q").isNotNull() & (F.size(kept) > 0),
            F.concat(F.lit("?"), F.array_join(F.array_sort(kept), "&")),
        ).otherwise(F.lit("")),
    )
    return (
        docs.select("doc_id", base.alias("base"), q.alias("q"))
        .select("doc_id", canon.alias("canon_url"))
        .groupBy("canon_url")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("keep_doc_id"),
        )
    )


# ---------------------------------------------------------------------------
# Semantic decontamination: flag training vectors whose embedding is
# near-identical to any evaluation vector — the companion to the n-gram
# check above for paraphrased/remixed benchmark leakage that lexical
# shingles miss. Eval set = vec_id < _SEM_EVAL_N (stand-in; production
# passes the benchmark embedding table).
# ---------------------------------------------------------------------------

_SEM_EVAL_N = 32
_SEM_TAU = 0.999  # near-duplicate cosine threshold


def _curation_sql_cosine(a: str, b: str) -> str:
    from .similarity import _sql_cosine

    return _sql_cosine(a, b)


_SEM_DECON_ORACLE = f"""
WITH e AS (SELECT vec_id, embedding FROM embeddings),
ev AS (SELECT vec_id AS eval_id, embedding AS ev_vec FROM e
       WHERE vec_id < {_SEM_EVAL_N}),
tr AS (SELECT vec_id, embedding FROM e WHERE vec_id >= {_SEM_EVAL_N}),
sims AS (
  SELECT tr.vec_id,
         {{cos}} AS cos,
         ev.eval_id
  FROM tr CROSS JOIN ev
),
best AS (
  SELECT vec_id, cos, eval_id,
         ROW_NUMBER() OVER (PARTITION BY vec_id
                            ORDER BY cos DESC, eval_id) AS rn
  FROM sims
)
SELECT vec_id, cos AS max_cosine, CAST(eval_id AS BIGINT) AS nearest_eval_id,
       CAST(cos >= {_SEM_TAU} AS BOOLEAN) AS contaminated
FROM best WHERE rn = 1
"""


@query(
    "decontaminate_semantic",
    oracle=_SEM_DECON_ORACLE.format(
        cos=_curation_sql_cosine("tr.embedding", "ev.ev_vec")
    ),
)
def decontaminate_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space decontamination: per training vector, the max
    cosine against the evaluation set, the nearest eval id, and a
    contaminated flag at {_SEM_TAU} — catches paraphrase-level leakage
    the lexical n-gram probe can't.

    Scale shape: eval embeddings broadcast (benchmark sets are small by
    construction); the scan side computes the argmax per vector inside
    its own partition (window keyed by the unique vec_id — map-side
    WindowGroupLimit cut) — the 100 TB training corpus is never
    shuffled. Exact-fold cosine (similarity.py) keeps the score
    hash-identical across engines; norms are precomputed ONCE per
    vector map-side (cosine_from), so each pair evaluates one fold
    instead of three — measured 1.42s → 0.77s at sf0.1 (min-of-4
    interleaved, bit-equal results)."""
    from pyspark.sql import Window

    from .similarity import cosine_from, dot_col, norm_col

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    ev = emb.filter(F.col("vec_id") < _SEM_EVAL_N).select(
        F.col("vec_id").alias("eval_id"),
        F.col("embedding").alias("ev_vec"),
        norm_col("embedding").alias("ev_norm"),
    )
    tr = emb.filter(F.col("vec_id") >= _SEM_EVAL_N).select(
        "vec_id", "embedding", norm_col("embedding").alias("tr_norm")
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.desc("cos"), F.asc("eval_id")
    )
    return (
        tr.crossJoin(F.broadcast(ev))
        .select(
            "vec_id",
            cosine_from(
                dot_col("embedding", "ev_vec"), "tr_norm", "ev_norm"
            ).alias("cos"),
            "eval_id",
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "vec_id",
            F.col("cos").alias("max_cosine"),
            F.col("eval_id").cast("long").alias("nearest_eval_id"),
            (F.col("cos") >= F.lit(_SEM_TAU)).alias("contaminated"),
        )
    )
