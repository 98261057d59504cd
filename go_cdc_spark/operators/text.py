"""Text-analysis operators for LLM training-data pipelines.

All hot-path expressions are JVM built-ins (split / regexp / transform /
filter lambdas) inside whole-stage codegen — no Python in the row path.
Shared shingle/token helpers are plain Column builders reused by the
dedup operators.

At 100 TB these are embarrassingly parallel map-side operators: no
shuffle at all except the final small aggregations; Catalyst prunes the
scan to (doc_id, text) only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import query
from ..tables import load

# Marker lists retained for quality_score's stop_ratio and for the
# accuracy-comparison test against the trigram model below.
LANG_MARKERS = {
    "en": ("the", "a", "of"),
    "de": ("der", "und", "das"),
    "es": ("el", "la", "que"),
}

# Byte-trigram language model: the highest-frequency character
# trigrams of each language (public linguistic frequency tables —
# e.g. Cavnar & Trenkle's n-gram categorization line of work), with
# small integer weights (2 = strongly distinctive, 1 = frequent).
# Integer weights + integer occurrence counts keep every score exact
# in both engines — no logits, no floats. Scoring is pure map-side
# string arithmetic (count occurrences via length-difference after
# replace), so language ID adds ZERO shuffle at any corpus size —
# deliberately NOT explode-trigrams + join, which would shuffle the
# whole corpus by doc_id for the score sum.
LANG_TRIGRAMS: dict[str, tuple[tuple[str, int], ...]] = {
    "en": ((" th", 2), ("the", 2), ("he ", 1), ("ing", 2), ("ng ", 1),
           ("and", 1), (" of", 1), ("ion", 1), ("tio", 1), (" to", 1),
           ("ed ", 1), (" wi", 1), ("is ", 1), ("at ", 1), ("ere", 1)),
    "de": (("der", 2), ("ich", 2), ("sch", 2), ("ein", 2), ("die", 1),
           ("und", 2), ("che", 1), ("ung", 2), ("cht", 1), ("gen", 1),
           ("en ", 1), ("er ", 1), (" ge", 1), ("ber", 1), ("das", 1)),
    "es": (("que", 2), (" qu", 1), ("ión", 2), ("ón ", 1), ("una", 1),
           ("los", 2), (" lo", 1), ("ado", 1), ("ent", 1), ("nte", 1),
           ("de ", 1), (" de", 1), ("la ", 1), (" la", 1), ("os ", 1)),
    "fr": (("eur", 2), ("ais", 2), ("eau", 2), ("oux", 1), (" ét", 2),
           ("été", 1), ("les", 1), (" le", 1), ("ent", 1), ("ons", 1),
           ("our", 1), ("ux ", 1), ("est", 1), (" es", 1), ("de ", 1)),
}

BPE_ISH_PATTERN = "[a-z]+|[0-9]|[^a-z0-9 ]"


def words_col(text: str = "text") -> Column:
    return F.split(F.col(text), " ")


def marker_hits(lang: str, text: str = "text") -> Column:
    quoted = ", ".join(f"'{w}'" for w in LANG_MARKERS[lang])
    return F.expr(f"size(filter(split({text}, ' '), w -> w IN ({quoted})))").cast("long")


def shingles_col(text: str = "text", n: int = 3) -> Column:
    """n-word shingle strings (not hashed): transform over a sequence of
    start offsets; out-of-range lookups are NULL and concat_ws skips them,
    so short documents yield their whole text as the single shingle.

    The word array is bound ONCE via an outer single-element transform
    lambda (``transform(array(split(..)), w -> ...)``) — naively
    substituting ``split(text)`` into every element access makes the
    regex split run per shingle per access (~30× slower per expression
    copy, measured at sf0.1)."""
    parts = ", ".join(f"try_element_at(w, i + {k})" for k in range(n))
    return F.expr(
        f"""
        element_at(transform(array(split({text}, ' ')), w ->
            transform(
                sequence(1, greatest(size(w) - {n - 1}, 1)),
                i -> concat_ws(' ', {parts})
            )), 1)
        """
    )


@query(
    "text_stats",
    oracle="""
    SELECT lang, source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS sum_words,
           CAST(SUM(len(string_split(text, ' '))) AS DOUBLE) / COUNT(*) AS avg_words
    FROM documents
    GROUP BY lang, source
    """,
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    nw = F.size(words_col()).cast("long")
    return docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.sum(nw).alias("sum_words"),
        (F.sum(nw).cast("double") / F.count(F.lit(1))).alias("avg_words"),
    )


@query(
    "text_tokens",
    oracle=f"""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_ws_tokens,
           len(regexp_extract_all(text, '{BPE_ISH_PATTERN}')) AS n_bpe_tokens
    FROM documents
    """,
)
def text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + a BPE-ish regex lexer
    (letter-runs | single digits | punctuation) — the pre-tokenizer
    shape used for LLM corpus budgeting."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(words_col()).cast("long").alias("n_ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(BPE_ISH_PATTERN), F.lit(0)))
        .cast("long")
        .alias("n_bpe_tokens"),
    )


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def trigram_score_col(lang: str, padded: str = "__padded") -> Column:
    """Σ weight × occurrence-count of each model trigram in the padded
    lowercased text. Counting is (len(s) − len(replace(s, t, ''))) / |t|
    — pure string expressions, no explode, no shuffle; replace is
    non-overlapping left-to-right in both engines so counts match."""
    terms = [
        (F.length(padded) - F.length(F.replace(F.col(padded), F.lit(t))))
        / F.lit(len(t)) * F.lit(w)
        for t, w in LANG_TRIGRAMS[lang]
    ]
    total = terms[0]
    for term in terms[1:]:
        total = total + term
    return total.cast("long")


def _sql_trigram_score(lang: str, padded: str = "__padded") -> str:
    return (
        "CAST("
        + " + ".join(
            f"(length({padded}) - length(replace({padded}, {_sql_quote(t)}, ''))) / {len(t)} * {w}"
            for t, w in LANG_TRIGRAMS[lang]
        )
        + " AS BIGINT)"
    )


_LANGS = tuple(LANG_TRIGRAMS)  # argmax tie-break order: en > de > es > fr


def _argmax_lang_sql() -> str:
    arms = []
    for i, lang in enumerate(_LANGS[:-1]):
        conds = [f"{lang}_score >= {o}_score" for o in _LANGS[i + 1:]]
        arms.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    return "CASE " + " ".join(arms) + f" ELSE '{_LANGS[-1]}' END"


def _argmax_lang_col() -> Column:
    out = F.lit(_LANGS[-1])
    expr = None
    for i, lang in enumerate(_LANGS[:-1]):
        cond = F.lit(True)
        for o in _LANGS[i + 1:]:
            cond = cond & (F.col(f"{lang}_score") >= F.col(f"{o}_score"))
        arm = F.when(cond, F.lit(lang))
        expr = arm if expr is None else expr.when(cond, F.lit(lang))
    return expr.otherwise(out)


@query(
    "lang_id",
    oracle=f"""
    SELECT doc_id, lang,
           {", ".join(f"{lg}_score" for lg in _LANGS)},
           {_argmax_lang_sql()} AS pred_lang
    FROM (
        SELECT doc_id, lang,
               {", ".join(f"{_sql_trigram_score(lg)} AS {lg}_score" for lg in _LANGS)}
        FROM (SELECT doc_id, lang, ' ' || lower(text) || ' ' AS __padded
              FROM documents)
    )
    """,
)
def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language ID via a character-trigram frequency model
    (LANG_TRIGRAMS: top trigrams per language with small integer
    weights, after Cavnar & Trenkle-style n-gram categorization) —
    replacing the round-1 marker-word stand-in. Each language's score
    is the weighted trigram occurrence count over the space-padded
    lowercased text; prediction is the argmax with the deterministic
    tie-break order {_LANGS} (ties prefer the earlier language, so
    trigram-free text — e.g. CJK — degrades to 'en' explicitly).

    Accuracy: on real multilingual sentences the model separates
    en/de/es/fr where the old marker heuristic could not see 'fr' at
    all (tests/test_curation_units.py::test_lang_id_trigram_on_real_
    sentences). On the synthetic fixture corpus the `lang` label is
    uncorrelated with the generated text by construction, so corpus
    accuracy is the label prior for ANY model — the fixture checks
    exactness, the sentence test checks discrimination.

    Scale shape: ~60 replace+length expressions per row, all inside
    whole-stage codegen; zero shuffle at any corpus size (scoring adds
    no exchange to the scan)."""
    docs = load(spark, sf_dir, "documents")
    padded = docs.select(
        "doc_id",
        "lang",
        F.concat(F.lit(" "), F.lower("text"), F.lit(" ")).alias("__padded"),
    )
    scored = padded.select(
        "doc_id",
        "lang",
        *[trigram_score_col(lg).alias(f"{lg}_score") for lg in _LANGS],
    )
    return scored.withColumn("pred_lang", _argmax_lang_col())


@query(
    "quality_score",
    oracle="""
    SELECT doc_id,
           n_words,
           punct_ratio,
           stop_ratio,
           0.4 * stop_ratio + 0.3 * LEAST(1.0, n_words / 400.0) + 0.3 * (1.0 - punct_ratio) AS score
    FROM (
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
               CAST(length(text) - length(regexp_replace(text, '[.!?,;:]', '', 'g')) AS DOUBLE)
                   / length(text) AS punct_ratio,
               CAST(len(list_filter(string_split(text, ' '), w -> w IN ('the', 'a', 'of'))) AS DOUBLE)
                   / len(string_split(text, ' ')) AS stop_ratio
        FROM documents
    )
    """,
)
def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic document quality: length, punctuation density, stopword
    ratio — the usual first-pass corpus filter."""
    docs = load(spark, sf_dir, "documents")
    n_words = F.size(words_col()).cast("long")
    punct_ratio = (
        (F.length("text") - F.length(F.regexp_replace("text", r"[.!?,;:]", ""))).cast("double")
        / F.length("text")
    )
    stop_ratio = marker_hits("en").cast("double") / F.size(words_col())
    base = docs.select(
        "doc_id",
        n_words.alias("n_words"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stop_ratio"),
    )
    return base.withColumn(
        "score",
        F.lit(0.4) * F.col("stop_ratio")
        + F.lit(0.3) * F.least(F.lit(1.0), F.col("n_words") / F.lit(400.0))
        + F.lit(0.3) * (F.lit(1.0) - F.col("punct_ratio")),
    )


@query(
    "doc_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(text) AS fp,
           list_aggregate(
               list_transform(
                   range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1),
                   i -> md5(concat_ws(' ',
                            string_split(text, ' ')[i],
                            string_split(text, ' ')[i + 1],
                            string_split(text, ' ')[i + 2]))
               ), 'min') AS min_shingle
    FROM documents
    """,
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: full-text md5 + minimum 3-shingle hash
    (a 1-permutation MinHash — the rolling-hash fingerprint used as the
    near-dup bucketing key)."""
    docs = load(spark, sf_dir, "documents")
    min_shingle = F.array_min(F.transform(shingles_col(), lambda s: F.md5(s)))
    return docs.select(
        "doc_id",
        F.md5(F.col("text")).alias("fp"),
        min_shingle.alias("min_shingle"),
    )


@query(
    "top_tokens",
    oracle="""
    SELECT token, n_occurrences, n_docs
    FROM (
        SELECT token,
               CAST(COUNT(*) AS BIGINT) AS n_occurrences,
               CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
               ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, token) AS rn
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
        GROUP BY token
    )
    WHERE rn <= 50
    """,
)
def top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary: explode whitespace tokens, count occurrences
    and document frequency, keep the top 50 (deterministic tie-break on
    the token itself).

    Scale shape: explode is map-side; the token groupBy is the one
    shuffle, with map-side partial aggregation shrinking it to
    |vocab| × partitions; the global top-k is a TakeOrdered over
    per-partition top-ks — no full sort. Power-law token skew is safe:
    hot tokens are *pre-aggregated per partition* before the shuffle,
    so the reducer sees one partial per partition, not one row per
    occurrence (the two_phase_agg situation never arises)."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.explode(words_col()).alias("token"))
        .groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.desc("n_occurrences"), F.asc("token"))
        .limit(50)
    )


@query(
    "sample_stratified",
    oracle="""
    SELECT doc_id, lang, source
    FROM documents
    WHERE CAST(concat('0x', substr(md5(concat('doc', CAST(doc_id AS VARCHAR))), 1, 4)) AS BIGINT) % 100
          < (CASE WHEN lang = 'en' THEN 10 ELSE 30 END)
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: per-language rates (en 10%,
    rest 30% — downsample the over-represented stratum) decided by a
    hash of the stable key, NOT rand() — reproducible across runs,
    engines, and retried tasks, which is what makes corpus ablations
    comparable. Map-side only: a filter, no shuffle, no state."""
    return stratified_filter(load(spark, sf_dir, "documents"))


def stratified_filter(
    docs: DataFrame,
    rates: dict[str, int] | None = None,
    default_rate: int = 30,
) -> DataFrame:
    """df-level stratified core (per-language percent rates are the
    recipe knobs; the registered query fixes en=10 / default=30)."""
    bucket = (
        F.conv(F.substring(F.md5(F.concat(F.lit("doc"), F.col("doc_id").cast("string"))), 1, 4), 16, 10)
        .cast("long")
        % 100
    )
    rate = F.lit(default_rate)
    for lang, r in (rates if rates is not None else {"en": 10}).items():
        rate = F.when(F.col("lang") == lang, F.lit(int(r))).otherwise(rate)
    return docs.filter(bucket < rate).select("doc_id", "lang", "source")


# ---------------------------------------------------------------------------
# Fuzzy string matching (entity resolution): similar-but-not-equal name
# pairs via blocked self-join + edit-distance verification. The
# classic record-linkage shape: blocking keys bound the quadratic
# step (like LSH buckets for vectors/shingles), the exact distance
# runs only inside blocks.
# ---------------------------------------------------------------------------

FUZZY_MAX_DIST = 4
_FUZZY_BAND = 4  # length-band width: second blocking key


@query(
    "fuzzy_name_match",
    oracle=f"""
    WITH n AS (SELECT DISTINCT p_name AS nm FROM part),
    k AS (
        SELECT nm, string_split(nm, ' ')[1] AS fw,
               CAST(floor(length(nm) / {_FUZZY_BAND}.0) AS INT) AS band
        FROM n
    )
    SELECT a.nm AS name_a, b.nm AS name_b,
           CAST(levenshtein(a.nm, b.nm) AS BIGINT) AS dist
    FROM k a JOIN k b ON a.fw = b.fw AND a.band = b.band AND a.nm < b.nm
    WHERE levenshtein(a.nm, b.nm) <= {FUZZY_MAX_DIST}
    """,
)
def fuzzy_name_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-identical part-name pairs: block on (first word, length
    band), verify levenshtein <= {FUZZY_MAX_DIST} inside blocks only.

    Scale shape: names dedupe to the distinct-vocabulary level first
    (entity resolution runs over entities, not rows), the self-join
    fan-out is bounded by block occupancy, and the O(len²) edit
    distance runs on candidates only. The length band means a pair
    straddling a band edge is missed — the standard blocking recall
    trade, tuned by {_FUZZY_BAND}; widen bands or add a second pass
    with offset bands for higher recall."""
    names = load(spark, sf_dir, "part").select(F.col("p_name").alias("nm")).distinct()
    keyed = names.select(
        "nm",
        F.split("nm", " ")[0].alias("fw"),
        F.floor(F.length("nm") / F.lit(float(_FUZZY_BAND))).cast("int").alias("band"),
    )
    a = keyed.select(F.col("nm").alias("name_a"), "fw", "band")
    b = keyed.select(F.col("nm").alias("name_b"), "fw", "band")
    dist = F.levenshtein("name_a", "name_b")
    return (
        a.join(b, ["fw", "band"])
        .filter(F.col("name_a") < F.col("name_b"))
        .filter(dist <= FUZZY_MAX_DIST)
        .select("name_a", "name_b", dist.cast("long").alias("dist"))
    )


# ---------------------------------------------------------------------------
# TF-IDF term salience.
# ---------------------------------------------------------------------------

_TFIDF_TOP = 3

_TFIDF_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS token
  FROM documents
),
tf AS (
  SELECT doc_id, token, COUNT(*) AS tf
  FROM tok WHERE LENGTH(token) > 2
  GROUP BY doc_id, token
),
df AS (
  SELECT token, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY token
),
n AS (SELECT CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS n_docs FROM tf)
SELECT doc_id, token, tf, salience FROM (
  SELECT tf.doc_id, tf.token, CAST(tf.tf AS BIGINT) AS tf,
         tf.tf * (n.n_docs / df.df) AS salience,
         ROW_NUMBER() OVER (PARTITION BY tf.doc_id
                            ORDER BY tf.tf * (n.n_docs / df.df) DESC, tf.token)
           AS rn
  FROM tf JOIN df USING (token) CROSS JOIN n
)
WHERE rn <= {_TFIDF_TOP}
ORDER BY doc_id, salience DESC, token
"""


@query("tf_idf_top_terms", oracle=_TFIDF_ORACLE)
def tf_idf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 (_TFIDF_TOP) salient terms per document by TF-IDF with a
    RATIONAL idf (N/df, not log(N/df)): ranking is order-isomorphic to
    the log form within a document (log is monotone), and rational idf
    keeps the score a deterministic double — ln() differs by 1 ulp
    between libm implementations, which would break cross-engine
    verification (measured: 3/50 values differ Spark vs DuckDB).

    Scale shape: tf is one (doc_id, token) shuffle with map-side
    partial counts; df re-aggregates tf's output (no token re-explode);
    the 1-row corpus count broadcasts; the final top-k per doc is a
    WindowGroupLimit — per-doc heaps, no global sort. Vocabulary-sized
    df joins tf on token (both already partitioned by token from the
    df shuffle at scale)."""
    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    ).filter(F.length("token") > 2)
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("token").agg(F.count(F.lit(1)).cast("double").alias("df"))
    n = tf.agg(F.countDistinct("doc_id").cast("double").alias("n_docs"))
    from pyspark.sql.window import Window

    scored = (
        tf.join(df, "token")
        .join(F.broadcast(n))
        .withColumn("salience", F.col("tf") * (F.col("n_docs") / F.col("df")))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("salience"), F.asc("token"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TFIDF_TOP)
        .select("doc_id", "token", "tf", "salience")
        .orderBy("doc_id", F.desc("salience"), "token")
    )


# ---------------------------------------------------------------------------
# Vocabulary indexing (StringIndexer analog for token pipelines).
# ---------------------------------------------------------------------------

_VOCAB_MIN_COUNT = 5


@query(
    "vocab_index",
    oracle=f"""
    SELECT token, n, ROW_NUMBER() OVER (ORDER BY n DESC, token) - 1 AS token_id
    FROM (
      SELECT token, COUNT(*) AS n
      FROM (SELECT UNNEST(string_split(text, ' ')) AS token FROM documents)
      WHERE LENGTH(token) > 0
      GROUP BY token
      HAVING COUNT(*) >= {_VOCAB_MIN_COUNT}
    )
    ORDER BY token_id
    """,
)
def vocab_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-ranked vocabulary with dense integer ids (corpus count
    >= {_VOCAB_MIN_COUNT}, ties broken lexically) — the StringIndexer /
    tokenizer-vocab build step of a training pipeline, as a plain
    aggregate + rank.

    Scale shape: token counting is one (token)-keyed shuffle with
    map-side partials; the dense-id assignment is a single-partition
    window over the VOCABULARY (already aggregate-sized, orders of
    magnitude smaller than the corpus) — the one deliberate
    single-reducer step, bounded by |vocab| not |tokens|. The min-count
    filter applies before the rank, shrinking that partition further."""
    docs = load(spark, sf_dir, "documents")
    from pyspark.sql.window import Window

    counts = (
        docs.select(F.explode(F.split("text", " ")).alias("token"))
        .filter(F.length("token") > 0)
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= _VOCAB_MIN_COUNT)
    )
    w = Window.orderBy(F.desc("n"), F.asc("token"))
    return (
        counts.withColumn("token_id", F.row_number().over(w) - 1)
        .select("token", "n", "token_id")
        .orderBy("token_id")
    )


# ---------------------------------------------------------------------------
# Deterministic train/holdout split.
# ---------------------------------------------------------------------------

_HOLDOUT_PCT = 10  # md5-bucket percent reserved for evaluation


@query(
    "split_train_holdout",
    oracle=f"""
    SELECT split, COUNT(*) AS n_docs,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
           MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
    FROM (
      SELECT doc_id, text,
             CASE WHEN CAST(concat('0x', substr(md5(concat('split',
                    CAST(doc_id AS VARCHAR))), 1, 4)) AS BIGINT) % 100
                  < {_HOLDOUT_PCT}
                  THEN 'holdout' ELSE 'train' END AS split
      FROM documents
    )
    GROUP BY split
    ORDER BY split
    """,
)
def split_train_holdout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic {_HOLDOUT_PCT}%-holdout split by salted md5 of the
    document key, with per-split doc/token accounting — reproducible
    across engines, retries, and data re-shuffles (no RNG state), and
    stable under corpus growth: a document's split never changes when
    other documents arrive.

    Scale shape: the split label is a map-side hash projection; the
    audit rollup is a 2-group aggregate with map-side partials. The
    same labeling expression, minus the rollup, tags the corpus in a
    training-shard write (shards.py uses the identical md5-bucket
    pattern)."""
    docs = load(spark, sf_dir, "documents")
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("split"), F.col("doc_id").cast("string"))), 1, 4
            ),
            16,
            10,
        ).cast("bigint")
        % 100
    )
    return (
        docs.select(
            "doc_id",
            "text",
            F.when(bucket < _HOLDOUT_PCT, F.lit("holdout"))
            .otherwise(F.lit("train"))
            .alias("split"),
        )
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size(F.split("text", " "))).cast("bigint").alias("n_tokens"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("split")
    )


# ---------------------------------------------------------------------------
# BPE merge training: the tokenizer-training primitive (Sennrich et al.,
# public BPE formulation). Each round counts adjacent symbol pairs
# weighted by word frequency, picks the most frequent pair
# (deterministic tie-break), and merges it corpus-wide. Merging is
# expressed as a fixed-depth chain of space-delimited string
# replacements — replace() is leftmost-non-overlapping in every engine,
# and a chain of _BPE_REPLACE_DEPTH applications reaches the fixpoint
# for symbol sequences up to 2^depth repeats, so both engines compute
# the identical merged corpus.
# ---------------------------------------------------------------------------

_BPE_ROUNDS = 2
_BPE_REPLACE_DEPTH = 4  # fixpoint for up to 2^4 consecutive repeats


def _sql_bpe_pairs(seq_rel: str) -> str:
    """DuckDB: weighted adjacent-pair counts over a (word, cnt, seq)
    relation; seq is the space-joined symbol sequence.  The position
    list is derived per-row from the symbol count (mirrors Spark's
    ``sequence(1, size-1)``) so arbitrarily long words count every
    adjacent pair — no fixed cap."""
    return f"""
  SELECT t[i] AS l, t[i + 1] AS r, CAST(SUM(cnt) AS BIGINT) AS c
  FROM (SELECT cnt, t, unnest(range(1, greatest(len(t), 1))) AS i
        FROM (SELECT cnt, string_split(seq, ' ') AS t FROM {seq_rel}))
  GROUP BY t[i], t[i + 1]
""".strip()


def _sql_bpe_merge(seq_rel: str, top_rel: str) -> str:
    rep = "concat(' ', seq, ' ')"
    for _ in range(_BPE_REPLACE_DEPTH):
        rep = (
            f"replace({rep}, concat(' ', l, ' ', r, ' '), "
            "concat(' ', l, r, ' '))"
        )
    return f"""
  SELECT word, cnt, trim({rep}) AS seq
  FROM {seq_rel} CROSS JOIN {top_rel}
""".strip()


_BPE_ORACLE = f"""
WITH wc AS (
  SELECT tok AS word, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
  WHERE tok != '' GROUP BY tok
),
s0 AS (
  SELECT word, cnt, trim(regexp_replace(word, '(.)', '\\1 ', 'g')) AS seq
  FROM wc
),
p1 AS ({_sql_bpe_pairs("s0")}),
t1 AS (SELECT l, r, c FROM p1 ORDER BY c DESC, l, r LIMIT 1),
s1 AS ({_sql_bpe_merge("s0", "t1")}),
p2 AS ({_sql_bpe_pairs("s1")}),
t2 AS (SELECT l, r, c FROM p2 ORDER BY c DESC, l, r LIMIT 1)
SELECT 1 AS merge_rank, l AS lhs, r AS rhs, concat(l, r) AS merged,
       c AS pair_count FROM t1
UNION ALL
SELECT 2, l, r, concat(l, r), c FROM t2
"""


def _bpe_pairs(seqs: DataFrame) -> DataFrame:
    pair = F.expr(
        """
        filter(transform(sequence(1, greatest(size(split(seq, ' ')) - 1, 1)),
                         i -> struct(try_element_at(split(seq, ' '), i) AS l,
                                     try_element_at(split(seq, ' '), i + 1) AS r)),
               x -> x.r IS NOT NULL)
        """
    )
    return (
        seqs.select("cnt", F.explode(pair).alias("p"))
        .select("cnt", F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .groupBy("l", "r")
        .agg(F.sum("cnt").cast("long").alias("c"))
    )


def _bpe_merge(seqs: DataFrame, top: DataFrame) -> DataFrame:
    rep = "concat(' ', seq, ' ')"
    for _ in range(_BPE_REPLACE_DEPTH):
        rep = (
            f"replace({rep}, concat(' ', l, ' ', r, ' '), "
            "concat(' ', l, r, ' '))"
        )
    return seqs.crossJoin(F.broadcast(top)).select(
        "word", "cnt", F.expr(f"trim({rep})").alias("seq")
    )


@query("bpe_train_merges", oracle=_BPE_ORACLE)
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the first {_BPE_ROUNDS} BPE merges on the corpus: word
    frequencies → character symbol sequences → repeat (count weighted
    adjacent pairs → pick argmax pair, ties by (count desc, l, r) →
    merge corpus-wide). Output one row per learned merge:
    (merge_rank, lhs, rhs, merged, pair_count).

    Scale shape: pair counting aggregates the (vocabulary-sized, NOT
    corpus-sized) word table — the word-count rollup is the only
    corpus-wide shuffle, and it's the same partial-agg shape as
    text_stats. Each round shuffles |pairs| ≤ |vocab|×len rows and
    broadcasts ONE row back; rounds are a fixed unrolled constant, the
    standard iterate-over-broadcast-scalar pattern (kmeans_centroids).
    Production BPE runs thousands of merges with the same per-round
    plan — driver-side loop, nothing new per round."""
    docs = load(spark, sf_dir, "documents")
    wc = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    seqs = wc.select(
        "word",
        "cnt",
        F.trim(F.regexp_replace("word", "(.)", "$1 ")).alias("seq"),
    )
    out = None
    for rank in range(1, _BPE_ROUNDS + 1):
        top = (
            _bpe_pairs(seqs)
            .orderBy(F.desc("c"), "l", "r")
            .limit(1)
        )
        row = top.select(
            F.lit(rank).alias("merge_rank"),
            F.col("l").alias("lhs"),
            F.col("r").alias("rhs"),
            F.concat("l", "r").alias("merged"),
            F.col("c").alias("pair_count"),
        )
        out = row if out is None else out.unionByName(row)
        if rank < _BPE_ROUNDS:
            seqs = _bpe_merge(seqs, top)
    return out


_BPE_APPLY_ORACLE = f"""
WITH wc AS (
  SELECT tok AS word, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
  WHERE tok != '' GROUP BY tok
),
s0 AS (
  SELECT word, cnt, trim(regexp_replace(word, '(.)', '\\1 ', 'g')) AS seq
  FROM wc
),
p1 AS ({_sql_bpe_pairs("s0")}),
t1 AS (SELECT l, r, c FROM p1 ORDER BY c DESC, l, r LIMIT 1),
s1 AS ({_sql_bpe_merge("s0", "t1")}),
p2 AS ({_sql_bpe_pairs("s1")}),
t2 AS (SELECT l, r, c FROM p2 ORDER BY c DESC, l, r LIMIT 1),
s2 AS ({_sql_bpe_merge("s1", "t2")})
SELECT CAST(SUM(s0.cnt) AS BIGINT) AS n_words,
       CAST(SUM(s0.cnt * len(string_split(s0.seq, ' '))) AS BIGINT) AS symbols_before,
       CAST(SUM(s0.cnt * len(string_split(s2.seq, ' '))) AS BIGINT) AS symbols_after
FROM s0 JOIN s2 USING (word)
"""


@query("bpe_apply_stats", oracle=_BPE_APPLY_ORACLE)
def bpe_apply_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the {_BPE_ROUNDS} learned merges back to the corpus and
    report the compression: total words, symbol count before/after —
    the roundtrip proof that training and application agree (every
    tokenizer-build pipeline ships this sanity stat).

    Same scale shape as bpe_train_merges: all arithmetic happens on the
    vocabulary-sized relation with word frequencies as weights."""
    docs = load(spark, sf_dir, "documents")
    wc = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    s0 = wc.select(
        "word",
        "cnt",
        F.trim(F.regexp_replace("word", "(.)", "$1 ")).alias("seq"),
    )
    seqs = s0
    for _ in range(_BPE_ROUNDS):
        top = _bpe_pairs(seqs).orderBy(F.desc("c"), "l", "r").limit(1)
        seqs = _bpe_merge(seqs, top)
    merged = seqs.select("word", F.col("seq").alias("mseq"))
    nsym = F.size(F.split("seq", " "))
    msym = F.size(F.split("mseq", " "))
    return (
        s0.join(merged, "word")
        .agg(
            F.sum("cnt").cast("long").alias("n_words"),
            F.sum(F.col("cnt") * nsym).cast("long").alias("symbols_before"),
            F.sum(F.col("cnt") * msym).cast("long").alias("symbols_after"),
        )
    )


# ---------------------------------------------------------------------------
# Corpus-level distributional diagnostics: Zipf rank-frequency and
# Heaps vocabulary growth — the two summary curves a corpus report
# leads with (skewed-token health check before training; a corpus whose
# freq×rank collapses or whose vocab growth flatlines early is usually
# boilerplate- or dedup-damaged).
# ---------------------------------------------------------------------------

_ZIPF_TOP = 50

_ZIPF_ORACLE = f"""
WITH tok AS (
  SELECT UNNEST(string_split(text, ' ')) AS token FROM documents
),
freq AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS freq
  FROM tok WHERE LENGTH(token) > 0 GROUP BY token
),
total AS (SELECT CAST(SUM(freq) AS BIGINT) AS total FROM freq),
top AS (
  SELECT token, freq FROM freq
  ORDER BY freq DESC, token LIMIT {_ZIPF_TOP}
),
ranked AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY freq DESC, token) AS INTEGER) AS rank,
         token, freq
  FROM top
)
SELECT r.rank, r.token, r.freq,
       CAST(r.freq * r.rank AS BIGINT) AS freq_x_rank,
       CAST(CAST(SUM(r.freq) OVER (ORDER BY r.rank
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS DOUBLE) / CAST(t.total AS DOUBLE) AS cum_share
FROM ranked r CROSS JOIN total t
ORDER BY r.rank
"""


@query("corpus_zipf", oracle=_ZIPF_ORACLE)
def corpus_zipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{_ZIPF_TOP} rank-frequency table with the Zipf product
    freq×rank (≈ constant under Zipf's law) and the cumulative corpus
    share held by the top ranks.

    Scale shape: ONE aggregation over the exploded token stream
    (map-side partials fold the hot-token skew before the exchange),
    then a TakeOrderedAndProject cuts the vocabulary to {_ZIPF_TOP}
    rows — the rank/cumsum window runs on that tiny relation, never on
    the vocabulary. Counts and products are exact BIGINTs; cum_share
    is one double division of exact longs."""
    from pyspark.sql.window import Window

    docs = load(spark, sf_dir, "documents")
    tok = docs.select(F.explode(F.split("text", " ")).alias("token")).filter(
        F.length("token") > 0
    )
    freq = tok.groupBy("token").agg(F.count(F.lit(1)).alias("freq"))
    total = freq.agg(F.sum("freq").cast("long").alias("total"))
    top = freq.orderBy(F.desc("freq"), "token").limit(_ZIPF_TOP)
    w = Window.orderBy(F.desc("freq"), "token")
    cum = Window.orderBy("rank").rowsBetween(Window.unboundedPreceding, 0)
    ranked = top.withColumn("rank", F.row_number().over(w).cast("int"))
    return (
        ranked.crossJoin(F.broadcast(total))
        .select(
            "rank",
            "token",
            "freq",
            (F.col("freq") * F.col("rank")).cast("long").alias("freq_x_rank"),
            (
                F.sum("freq").over(cum).cast("long").cast("double")
                / F.col("total").cast("double")
            ).alias("cum_share"),
        )
        .orderBy("rank")
    )


# doc-count checkpoints for the vocabulary growth curve; prefixes are
# by doc_id so the curve is deterministic and oracle-replayable (a
# random ordering would measure the same asymptote but not hash-match)
_HEAPS_CAPS = (16, 64, 256, 1024, 4096)

_HEAPS_ORACLE = f"""
WITH caps AS (SELECT CAST(UNNEST([{", ".join(map(str, _HEAPS_CAPS))}]) AS BIGINT) AS n_cap),
tok AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS token FROM documents
),
tok2 AS (SELECT doc_id, token FROM tok WHERE LENGTH(token) > 0),
first AS (SELECT token, MIN(doc_id) AS first_doc FROM tok2 GROUP BY token),
doccnt AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tok FROM tok2 GROUP BY doc_id),
vocab AS (
  SELECT c.n_cap, CAST(COUNT(*) AS BIGINT) AS vocab
  FROM first f JOIN caps c ON f.first_doc < c.n_cap
  GROUP BY c.n_cap
),
toks AS (
  SELECT c.n_cap, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(d.n_tok) AS BIGINT) AS tokens_total
  FROM doccnt d JOIN caps c ON d.doc_id < c.n_cap
  GROUP BY c.n_cap
)
SELECT t.n_cap, t.n_docs, t.tokens_total, v.vocab,
       CAST(v.vocab AS DOUBLE) / CAST(t.tokens_total AS DOUBLE) AS ttr
FROM toks t JOIN vocab v USING (n_cap)
ORDER BY t.n_cap
"""


@query("corpus_heaps", oracle=_HEAPS_ORACLE)
def corpus_heaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary growth: distinct-token count (and
    type-token ratio) at doc-id-prefix checkpoints {_HEAPS_CAPS} —
    sub-linear growth is healthy; early flattening flags a repetitive
    or over-deduplicated corpus.

    Scale shape: the corpus is scanned ONCE into two small aggregates —
    per-token first-occurrence doc (vocabulary-sized) and per-doc token
    count (doc-count-sized); every checkpoint is then answered from
    those aggregates via a broadcast join against the literal
    checkpoint list, so adding checkpoints costs nothing corpus-side.
    Checkpoints beyond the corpus measure the whole corpus (doc_id < n
    is simply all docs), keeping one fixed query across SFs."""
    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    ).filter(F.length("token") > 0)
    first = tok.groupBy("token").agg(F.min("doc_id").alias("first_doc"))
    doccnt = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_tok"))
    caps = spark.createDataFrame(
        [(int(n),) for n in _HEAPS_CAPS], "n_cap long"
    )
    vocab = (
        first.join(F.broadcast(caps), F.col("first_doc") < F.col("n_cap"))
        .groupBy("n_cap")
        .agg(F.count(F.lit(1)).alias("vocab"))
    )
    toks = (
        doccnt.join(F.broadcast(caps), F.col("doc_id") < F.col("n_cap"))
        .groupBy("n_cap")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("long").alias("tokens_total"),
        )
    )
    return (
        toks.join(vocab, "n_cap")
        .select(
            "n_cap",
            "n_docs",
            "tokens_total",
            "vocab",
            (
                F.col("vocab").cast("double")
                / F.col("tokens_total").cast("double")
            ).alias("ttr"),
        )
        .orderBy("n_cap")
    )


# ---------------------------------------------------------------------------
# Interpolated Kneser–Ney bigram language model over the corpus — the
# standard n-gram smoothing (Kneser & Ney 1995; Chen & Goodman 1999)
# every LM-data pipeline uses for perplexity-style quality filtering.
# Trained fully in-engine from exact counts.
# ---------------------------------------------------------------------------

# d = 0.75 is the canonical KN discount AND exactly representable in
# binary (3/4), so the float expression tree stays deterministic; both
# sides cast it to DOUBLE explicitly (DuckDB would otherwise parse the
# literal as DECIMAL and multiply in decimal — different rounding).
_KN_ORACLE = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
bg AS (
  SELECT t[i] AS w1, t[i + 1] AS w2
  FROM toks, UNNEST(generate_series(1, len(t) - 1)) AS s(i)
),
c12 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12 FROM bg GROUP BY w1, w2),
lhs AS (
  SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1,
         CAST(COUNT(*) AS BIGINT) AS n1w1
  FROM c12 GROUP BY w1
),
rhs AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS nw2 FROM c12 GROUP BY w2),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS ntot FROM c12)
SELECT c.w1, c.w2, c.c12, l.c1, l.n1w1, r.nw2,
       GREATEST(CAST(c.c12 AS DOUBLE) - CAST(0.75 AS DOUBLE), CAST(0.0 AS DOUBLE))
         / CAST(l.c1 AS DOUBLE)
       + ((CAST(0.75 AS DOUBLE) * CAST(l.n1w1 AS DOUBLE)) / CAST(l.c1 AS DOUBLE))
         * (CAST(r.nw2 AS DOUBLE) / CAST(t.ntot AS DOUBLE)) AS p_kn
FROM c12 c JOIN lhs l ON c.w1 = l.w1 JOIN rhs r ON c.w2 = r.w2 CROSS JOIN tot t
ORDER BY c.w1, c.w2
"""


@query("lm_kneser_ney_bigrams", oracle=_KN_ORACLE)
def lm_kneser_ney_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser–Ney bigram probabilities, d = 3/4:

        P(w2|w1) = max(c(w1,w2) − d, 0)/c(w1)
                 + d·N1+(w1,·)/c(w1) · N1+(·,w2)/N1+(·,·)

    The continuation distribution (how many CONTEXTS a word follows,
    not how often it occurs) is what distinguishes KN from plain
    absolute discounting — "Francisco" is frequent but only ever
    follows "San".

    Cross-engine exactness: every sufficient statistic is an exact
    BIGINT count over the distinct-bigram table; the probability is one
    fixed IEEE expression tree (sub, two divisions, mul, add — all
    correctly rounded) with d = 0.75 exactly representable in binary,
    so results hash-match bit-exactly.

    Scale shape: bigram extraction is one map-side zip_with+explode
    (no shuffle); the count tables are three keyed aggregates OVER THE
    DISTINCT-BIGRAM table (vocabulary-bounded, ≤|V|², never
    data-volume-bounded past the first agg); N1+(·,·) is a scalar
    aggregate broadcast (a 1-row bound — BNLJ lint class); the final
    joins are vocabulary-sized."""
    toks = load(spark, sf_dir, "documents").select(
        F.split(F.col("text"), " ").alias("t")
    )
    bg = toks.select(
        F.explode(
            F.expr(
                "zip_with(slice(t, 1, size(t) - 1), slice(t, 2, size(t) - 1),"
                " (a, b) -> struct(a AS w1, b AS w2))"
            )
        ).alias("bg")
    ).select("bg.w1", "bg.w2")
    # pin the distinct-bigram table once (lazy): it feeds lhs/rhs/tot
    # and the final join — without the pin each consumer re-runs the
    # corpus tokenize+explode+count (measured: 4 document scans)
    c12 = (
        bg.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("c12"))
        .localCheckpoint(eager=False)
    )
    lhs = c12.groupBy("w1").agg(
        F.sum("c12").cast("long").alias("c1"),
        F.count(F.lit(1)).cast("long").alias("n1w1"),
    )
    rhs = c12.groupBy("w2").agg(F.count(F.lit(1)).cast("long").alias("nw2"))
    tot = c12.agg(F.count(F.lit(1)).cast("long").alias("ntot"))
    p = (
        F.greatest(
            F.col("c12").cast("double") - F.lit(0.75), F.lit(0.0)
        )
        / F.col("c1").cast("double")
        + (F.lit(0.75) * F.col("n1w1").cast("double"))
        / F.col("c1").cast("double")
        * (F.col("nw2").cast("double") / F.col("ntot").cast("double"))
    )
    return (
        c12.join(lhs, "w1")
        .join(rhs, "w2")
        .crossJoin(F.broadcast(tot))
        .select("w1", "w2", "c12", "c1", "n1w1", "nw2", p.alias("p_kn"))
        .orderBy("w1", "w2")
    )


# ---------------------------------------------------------------------------
# Flesch reading-ease readability — the classic document-quality
# signal (syllables approximated by vowel groups, the standard
# SQL-computable proxy).
# ---------------------------------------------------------------------------

# Constants are parsed from identical literals through an explicit
# DOUBLE cast on both engines (the 0.15 lesson: DuckDB would otherwise
# fold decimal literals where Python/Spark compute in binary).
_READABILITY_ORACLE = """
WITH feat AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
         CAST(GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1) AS BIGINT)
           AS n_sentences,
         CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT)
           AS n_syllables
  FROM documents
)
SELECT doc_id, n_words, n_sentences, n_syllables,
       CAST(206.835 AS DOUBLE)
       - CAST(1.015 AS DOUBLE)
         * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
       - CAST(84.6 AS DOUBLE)
         * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE))
         AS flesch
FROM feat
WHERE n_words > 0
ORDER BY doc_id
"""


@query("text_readability", oracle=_READABILITY_ORACLE)
def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading ease per document:
    ``206.835 − 1.015·(words/sentences) − 84.6·(syllables/words)`` with
    syllables approximated by vowel groups (``[aeiouy]+`` runs) and
    sentences by terminal-punctuation runs (min 1) — the standard
    relational proxy for the classic readability score.

    Cross-engine exactness: the three counts are exact BIGINTs from
    identical regexes; the score is one fixed IEEE expression tree
    whose constants go through explicit double casts on both engines
    (decimal-literal folding differs otherwise — the 0.15 lesson).

    Scale shape: pure map — three regexp counts per document, no
    shuffle at all (the ORDER BY is presentation)."""
    docs = load(spark, sf_dir, "documents")
    feat = docs.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_words"),
        F.greatest(
            F.size(F.regexp_extract_all("text", F.lit("[.!?]+"), F.lit(0))),
            F.lit(1),
        ).cast("long").alias("n_sentences"),
        F.size(
            F.regexp_extract_all(F.lower("text"), F.lit("[aeiouy]+"), F.lit(0))
        ).cast("long").alias("n_syllables"),
    )
    flesch = (
        F.lit(206.835)
        - F.lit(1.015)
        * (F.col("n_words").cast("double") / F.col("n_sentences").cast("double"))
        - F.lit(84.6)
        * (F.col("n_syllables").cast("double") / F.col("n_words").cast("double"))
    )
    return (
        feat.filter(F.col("n_words") > 0)
        .select(
            "doc_id", "n_words", "n_sentences", "n_syllables",
            flesch.alias("flesch"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Simpson diversity of the token distribution per language — the
# LOG-FREE corpus-diversity measure (entropy needs ln, which drifts a
# ulp between libms — the verify-notes rule; Simpson's Σpᵢ² is pure
# rational arithmetic).
# ---------------------------------------------------------------------------

_SIMPSON_ORACLE = """
WITH tok AS (
  SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents
),
cnt AS (
  SELECT lang, w, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY lang, w
),
agg AS (
  SELECT lang,
         CAST(SUM(c) AS BIGINT) AS n_tokens,
         CAST(COUNT(*) AS BIGINT) AS vocab,
         CAST(SUM(c * c) AS BIGINT) AS sum_sq
  FROM cnt GROUP BY lang
)
SELECT lang, n_tokens, vocab, sum_sq,
       CAST(sum_sq AS DOUBLE) / (CAST(n_tokens AS DOUBLE) * CAST(n_tokens AS DOUBLE))
         AS simpson,
       CAST(1.0 AS DOUBLE)
       - CAST(sum_sq AS DOUBLE)
         / (CAST(n_tokens AS DOUBLE) * CAST(n_tokens AS DOUBLE))
         AS gini_simpson
FROM agg
ORDER BY lang
"""


@query("corpus_simpson_diversity", oracle=_SIMPSON_ORACLE)
def corpus_simpson_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson concentration Σpᵢ² and Gini–Simpson diversity 1 − Σpᵢ²
    of the token distribution per language — the corpus-mixing
    diagnostic that needs no logarithm (Shannon entropy's ln drifts
    between libms and is banned from oracle-checked output; Simpson is
    the standard rational substitute and orders mixtures the same way).

    Exactness: token counts and Σc² are exact BIGINTs (c ≤ n ≤ ~10⁹
    tokens/lang before c² strains BIGINT; at 100 TB swap the square
    accumulation to DECIMAL(38,0) — the stats_moments discipline);
    the index is two double casts and one division per output row.

    Scale shape: one explode + one (lang, token)-keyed count with
    map-side partials, then a |vocab|-bounded per-lang fold; output is
    |langs| rows."""
    tok = load(spark, sf_dir, "documents").select(
        "lang", F.explode(F.split(F.col("text"), " ")).alias("w")
    )
    cnt = tok.groupBy("lang", "w").agg(F.count(F.lit(1)).cast("long").alias("c"))
    agg = cnt.groupBy("lang").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("vocab"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("sum_sq"),
    )
    simpson = F.col("sum_sq").cast("double") / (
        F.col("n_tokens").cast("double") * F.col("n_tokens").cast("double")
    )
    return agg.select(
        "lang",
        "n_tokens",
        "vocab",
        "sum_sq",
        simpson.alias("simpson"),
        (F.lit(1.0) - simpson).alias("gini_simpson"),
    ).orderBy("lang")


# ---------------------------------------------------------------------------
# Bigram collocations: adjacency counts + unigram margins (round 13).
# ---------------------------------------------------------------------------

_COLLOC_MIN_C12 = 5
_COLLOC_TOPK = 50


@query(
    "text_collocations",
    oracle=f"""
    WITH bg AS (
      SELECT UNNEST(ts[1:len(ts)-1]) AS w1, UNNEST(ts[2:len(ts)]) AS w2
      FROM (SELECT string_split(text, ' ') AS ts FROM documents)
      WHERE len(ts) >= 2
    ),
    uni AS (
      SELECT token, CAST(COUNT(*) AS BIGINT) AS c
      FROM (SELECT UNNEST(string_split(text, ' ')) AS token FROM documents)
      WHERE LENGTH(token) > 0 GROUP BY token
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n
      FROM (SELECT UNNEST(string_split(text, ' ')) AS token FROM documents)
      WHERE LENGTH(token) > 0
    ),
    pairs AS (
      SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
      FROM bg WHERE LENGTH(w1) > 0 AND LENGTH(w2) > 0
      GROUP BY w1, w2 HAVING COUNT(*) >= {_COLLOC_MIN_C12}
    )
    SELECT w1, w2, c12, u1.c AS c1, u2.c AS c2, tot.n AS n_tokens
    FROM pairs
    JOIN uni u1 ON pairs.w1 = u1.token
    JOIN uni u2 ON pairs.w2 = u2.token
    CROSS JOIN tot
    ORDER BY c12 DESC, w1, w2 LIMIT {_COLLOC_TOPK}
    """,
)
def text_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram collocation mining: adjacent-token pair counts joined to
    their unigram margins and the corpus token total — the exact
    sufficient statistics of every association score (PMI, log-
    likelihood, lift), emitted as BIGINTs so the oracle compare is
    bit-exact (the scores themselves are one log away and belong to
    the consumer; ln is libm-drifty cross-engine, see bpe_*).

    Scale shape: bigram generation is a map-side array transform (no
    positional self-join); the pair count is one (w1,w2)-keyed shuffle
    with map-side partials, pre-shrunk by the min-count filter before
    the unigram joins; unigram margins and the scalar total broadcast
    (vocabulary-sized; the total folds from the margins — no third
    corpus pass). The token-array relation feeds BOTH the unigram and
    bigram branches, so it is lazily pinned (localCheckpoint) — one
    documents scan instead of four (scan-count audited). Top-K is
    TakeOrderedAndProject."""
    docs = load(spark, sf_dir, "documents")
    arr = docs.select(F.split("text", " ").alias("ts")).localCheckpoint(
        eager=False
    )
    toks = arr.select(F.explode("ts").alias("token")).filter(
        F.length("token") > 0
    )
    uni = toks.groupBy("token").agg(F.count(F.lit(1)).cast("long").alias("c"))
    tot = uni.agg(F.sum("c").cast("long").alias("n_tokens"))
    bg = (
        arr.filter(F.size("ts") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(ts) - 1), "
                    "i -> struct(ts[i-1] AS w1, ts[i] AS w2))"
                )
            ).alias("p")
        )
        .select("p.w1", "p.w2")
        .filter((F.length("w1") > 0) & (F.length("w2") > 0))
    )
    pairs = (
        bg.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("c12"))
        .filter(F.col("c12") >= _COLLOC_MIN_C12)
    )
    return (
        pairs.join(F.broadcast(uni.withColumnRenamed("token", "w1")
                               .withColumnRenamed("c", "c1")), "w1")
        .join(F.broadcast(uni.withColumnRenamed("token", "w2")
                          .withColumnRenamed("c", "c2")), "w2")
        .crossJoin(F.broadcast(tot))
        .select("w1", "w2", "c12", "c1", "c2", "n_tokens")
        .orderBy(F.desc("c12"), "w1", "w2")
        .limit(_COLLOC_TOPK)
    )


# ---------------------------------------------------------------------------
# RAKE keyword word-scores via gaps-and-islands phrases (round 13).
# ---------------------------------------------------------------------------

_RAKE_STOP = ("the", "a", "an", "of", "and", "to", "in", "is")
_RAKE_TOPK = 40
_RAKE_STOP_SQL = ", ".join(f"'{w}'" for w in _RAKE_STOP)


@query(
    "text_rake_keywords",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             UNNEST(ts) AS token,
             UNNEST(range(1, len(ts) + 1)) AS pos
      FROM (SELECT doc_id, string_split(text, ' ') AS ts FROM documents)
    ),
    nonstop AS (
      SELECT doc_id, token, pos,
             pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos)
               AS phrase_key
      FROM toks
      WHERE LENGTH(token) > 0 AND token NOT IN ({_RAKE_STOP_SQL})
    ),
    sized AS (
      SELECT token,
             CAST(COUNT(*) OVER (PARTITION BY doc_id, phrase_key) AS BIGINT)
               AS phrase_len
      FROM nonstop
    ),
    scores AS (
      SELECT token,
             CAST(COUNT(*) AS BIGINT) AS freq,
             CAST(SUM(phrase_len) AS BIGINT) AS degree
      FROM sized GROUP BY token
    )
    SELECT token, freq, degree,
           CAST(degree * 1000000 // freq AS BIGINT) AS score_ppm
    FROM scores
    ORDER BY score_ppm DESC, freq DESC, token LIMIT {_RAKE_TOPK}
    """,
)
def text_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword word-scores (Rose et al., the public formulation):
    candidate phrases are maximal stopword-free token runs — derived
    with the gaps-and-islands trick (pos − row_number over non-stop
    tokens is constant within a run), no per-phrase parsing — and each
    word scores degree/frequency where degree sums the lengths of the
    phrases it appears in. The ratio ships as integer ppm (both
    engines floor positive integer division), keeping the compare
    hash-exact.

    Scale shape: tokenize + stopword filter are map-side; the island
    key is one (doc)-partitioned window; phrase sizing is a second
    window over the same partitioning (one shuffle, reused sort);
    the word rollup is a token-keyed aggregate with map-side partials;
    top-K is TakeOrderedAndProject."""
    from pyspark.sql.window import Window

    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos0", "token")
    ).select("doc_id", "token", (F.col("pos0") + 1).alias("pos"))
    nonstop = toks.filter(
        (F.length("token") > 0) & (~F.col("token").isin(*_RAKE_STOP))
    ).withColumn(
        "phrase_key",
        F.col("pos")
        - F.row_number().over(Window.partitionBy("doc_id").orderBy("pos")),
    )
    sized = nonstop.withColumn(
        "phrase_len",
        F.count(F.lit(1))
        .over(Window.partitionBy("doc_id", "phrase_key"))
        .cast("long"),
    )
    scores = sized.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("freq"),
        F.sum("phrase_len").cast("long").alias("degree"),
    )
    return (
        scores.select(
            "token", "freq", "degree",
            F.expr("CAST(degree * 1000000 DIV freq AS BIGINT)").alias("score_ppm"),
        )
        .orderBy(F.desc("score_ppm"), F.desc("freq"), "token")
        .limit(_RAKE_TOPK)
    )


# ---------------------------------------------------------------------------
# Deterministic k-fold split audit (round 13; split_train_holdout's k-way
# sibling).
# ---------------------------------------------------------------------------

_KFOLD_K = 5


@query(
    "split_kfold",
    oracle=f"""
    SELECT fold, COUNT(*) AS n_docs,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
           MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
    FROM (
      SELECT doc_id, text,
             CAST(CAST(concat('0x', substr(md5(concat('fold',
                    CAST(doc_id AS VARCHAR))), 1, 4)) AS BIGINT)
                  % {_KFOLD_K} AS BIGINT) AS fold
      FROM documents
    )
    GROUP BY fold
    ORDER BY fold
    """,
)
def split_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic {_KFOLD_K}-fold assignment by salted md5 bucket —
    split_train_holdout's k-way sibling for cross-validation: a
    document's fold never changes as the corpus grows, folds are
    disjoint by construction, and the audit rollup proves the balance
    (each fold carries ~1/k of docs and tokens).

    Scale shape: the fold label is a map-side hash projection; the
    rollup is a k-group aggregate with map-side partials."""
    docs = load(spark, sf_dir, "documents")
    fold = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("fold"), F.col("doc_id").cast("string"))),
                1, 4,
            ),
            16, 10,
        ).cast("bigint")
        % _KFOLD_K
    ).cast("bigint")
    return (
        docs.select("doc_id", "text", fold.alias("fold"))
        .groupBy("fold")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size(F.split("text", " "))).cast("bigint").alias("n_tokens"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("fold")
    )


# ---------------------------------------------------------------------------
# Tokenizer-vocabulary coverage: OOV rate per source (round 13).
# ---------------------------------------------------------------------------


@query(
    "vocab_oov_rate",
    oracle=f"""
    WITH vocab AS (
      SELECT token FROM (
        SELECT token, COUNT(*) AS n
        FROM (SELECT UNNEST(string_split(text, ' ')) AS token FROM documents)
        WHERE LENGTH(token) > 0 GROUP BY token
      ) WHERE n >= {_VOCAB_MIN_COUNT}
    ),
    toks AS (
      SELECT source, UNNEST(string_split(text, ' ')) AS token FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN vocab.token IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_oov,
           CAST(SUM(CASE WHEN vocab.token IS NULL THEN 1 ELSE 0 END)
                * 1000000 // COUNT(*) AS BIGINT) AS oov_ppm
    FROM toks LEFT JOIN vocab ON toks.token = vocab.token
    WHERE LENGTH(toks.token) > 0
    GROUP BY source ORDER BY source
    """,
)
def vocab_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-vocabulary coverage audit: the out-of-vocabulary token
    rate per document source against the corpus vocabulary
    (count ≥ {_VOCAB_MIN_COUNT}, the vocab_index criterion) — the
    coverage check run before committing to a tokenizer, surfacing
    sources the vocab underserves.

    Scale shape: the vocabulary is aggregate-sized and BROADCAST into
    a left join against the token stream (no token-keyed shuffle of
    the corpus); the rollup is |sources| groups with map-side
    partials. At 100 TB the vocab build is the only corpus-wide
    shuffle, already paid by vocab_index."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.explode(F.split("text", " ")).alias("token")
    ).filter(F.length("token") > 0)
    vocab = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= _VOCAB_MIN_COUNT)
        .select("token", F.lit(True).alias("__in_vocab"))
    )
    return (
        toks.join(F.broadcast(vocab), "token", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum(F.when(F.col("__in_vocab").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_oov"),
        )
        .select(
            "source", "n_tokens", "n_oov",
            F.expr("CAST(n_oov * 1000000 DIV n_tokens AS BIGINT)").alias("oov_ppm"),
        )
        .orderBy("source")
    )
