"""Declarative corpus-curation pipelines: TOML recipe → staged run.

The operator surface gives a user every individual curation step as an
oracle-checked function; this module is the composition layer — the
corpus counterpart of the CDC engine boot (`config.py` / `app.py`):
one config file in, a reproducible multi-stage run out.

Recipe layout::

    [corpus]
    input  = "/data/sf0.01"      # dir containing documents.parquet
    output = "/data/curated"     # per-stage dirs + manifest land here

    [[stage]]
    kind = "lang_keep"
    langs = ["en"]

    [[stage]]
    kind = "c4_quality"

    [[stage]]
    kind = "dedup_exact"

    [[stage]]
    kind = "shards"              # terminal: training-shard layout
    n_shards = 8

Execution model — **materialize between stages**: stage *i* reads the
previous stage's ``documents.parquet`` through the same ``(spark,
sf_dir)`` interface the oracle harness checks, applies its decision,
and writes a new ``documents.parquet``. This is deliberately NOT one
fused lazy plan:

- at 100 TB every production curation pipeline checkpoints stages to
  storage anyway (restartability; a 9-stage fused plan that dies at
  hour 30 restarts from zero, a staged one from stage 8), and each
  stage's output is independently inspectable/auditable;
- the per-stage row counts in the manifest are then *measured from the
  written data*, not estimated;
- each stage re-plans against real (post-filter) statistics instead of
  compounding selectivity estimates through nine operators.

Stage knobs: each stage's decision logic is the SAME df-level core the
registered operator calls (c4_flags, stratified_filter, pps_filter,
dsir_select, dedup_exact, dedup_survivors, media_phash_dedup …), so
recipe behavior cannot drift from the oracle-checked surface; recipe
parameters (thresholds, rates, k, bucket counts, shard count, language
list) default to the registered constants and override per stage.

Parity note: the reference (go-cdc) has no curation surface; this is
the LLM-pipeline composition layer over SURVEY.md §2.B operators.
"""

from __future__ import annotations

import json
import tomllib
from dataclasses import dataclass, field
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import curation, dedup, multimodal, sampling, text
from .operators.shards import shard_manifest, write_training_shards
from .tables import load

DOC_COLUMNS = ["doc_id", "text", "lang", "source", "n_chars"]


@dataclass
class Stage:
    kind: str
    params: dict = field(default_factory=dict)


@dataclass
class Recipe:
    input: str
    output: str
    stages: list[Stage]


_KNOWN_KINDS = (
    "lang_keep",
    "c4_quality",
    "pii_redact",
    "dedup_exact",
    "dedup_near",
    "dedup_phash",
    "dedup_phash_near",
    "dedup_paragraphs",
    "sample_stratified",
    "sample_pps",
    "sample_reservoir",
    "sample_dsir",
    "shards",
)


def load_recipe(path: str) -> Recipe:
    raw = tomllib.loads(Path(path).read_text())
    corpus = raw.get("corpus") or {}
    if "input" not in corpus or "output" not in corpus:
        raise ValueError("recipe needs [corpus] input and output")
    stages = []
    for i, s in enumerate(raw.get("stage") or []):
        kind = s.get("kind")
        if kind not in _KNOWN_KINDS:
            raise ValueError(f"stage {i}: unknown kind {kind!r}")
        stages.append(Stage(kind=kind, params={k: v for k, v in s.items() if k != "kind"}))
    if not stages:
        raise ValueError("recipe has no [[stage]] entries")
    for s in stages[:-1]:
        if s.kind == "shards":
            raise ValueError("'shards' must be the terminal stage")
    return Recipe(input=corpus["input"], output=corpus["output"], stages=stages)


def _recount_chars(df: DataFrame) -> DataFrame:
    return df.withColumn("n_chars", F.length("text").cast("long"))


def _apply_stage(spark: SparkSession, kind: str, params: dict, sf_dir: str) -> DataFrame:
    """Run one stage's decision against ``sf_dir`` and return the full
    surviving documents relation (DOC_COLUMNS schema)."""
    docs = load(spark, sf_dir, "documents")
    if kind == "lang_keep":
        langs = params.get("langs")
        if not langs:
            raise ValueError("lang_keep needs langs = [...]")
        return docs.filter(F.col("lang").isin(list(langs)))
    if kind == "c4_quality":
        keep = curation.c4_flags(
            docs,
            min_words=int(params.get("min_words", curation.C4_MIN_WORDS)),
            max_word_len=int(params.get("max_word_len", curation.C4_MAX_WORD_LEN)),
            min_stop_ratio=float(
                params.get("min_stop_ratio", curation.C4_MIN_STOP_RATIO)
            ),
        ).filter(F.col("keep") == 1).select("doc_id")
        return docs.join(keep, "doc_id", "left_semi")
    if kind == "pii_redact":
        red = curation.pii_redact(spark, sf_dir).select(
            "doc_id", F.col("text_redacted").alias("__new_text")
        )
        return _recount_chars(
            docs.join(red, "doc_id")
            .drop("text")
            .withColumnRenamed("__new_text", "text")
            .select(*DOC_COLUMNS)
        )
    if kind == "dedup_exact":
        keep = dedup.dedup_exact(spark, sf_dir).select(
            F.col("keep_doc_id").alias("doc_id")
        )
        return docs.join(keep, "doc_id", "left_semi")
    if kind == "dedup_near":
        keep = dedup.dedup_survivors(spark, sf_dir).select("doc_id")
        return docs.join(keep, "doc_id", "left_semi")
    if kind == "dedup_phash":
        keep = multimodal.media_phash_dedup(spark, sf_dir).select(
            F.col("keep_doc_id").alias("doc_id")
        )
        return docs.join(keep, "doc_id", "left_semi")
    if kind == "dedup_phash_near":
        keep = multimodal.media_phash_survivors(spark, sf_dir).select("doc_id")
        return docs.join(keep, "doc_id", "left_semi")
    if kind == "dedup_paragraphs":
        rew = curation.dedup_paragraphs(spark, sf_dir).select(
            "doc_id", F.col("text_deduped").alias("__new_text")
        )
        return _recount_chars(
            docs.join(rew, "doc_id")
            .drop("text")
            .withColumnRenamed("__new_text", "text")
            .filter(F.length("text") > 0)
            .select(*DOC_COLUMNS)
        )
    if kind == "sample_stratified":
        rates = {
            str(k_): int(v) for k_, v in (params.get("rates") or {"en": 10}).items()
        }
        keep = text.stratified_filter(
            docs, rates=rates, default_rate=int(params.get("default_rate", 30))
        ).select("doc_id")
        return docs.join(keep, "doc_id", "left_semi")
    if kind == "sample_pps":
        keep = sampling.pps_filter(
            docs,
            rate_per_10000=int(params.get("rate_per_10000", sampling._PPS_RATE)),
        ).select("doc_id")
        return docs.join(keep, "doc_id", "left_semi")
    if kind == "sample_reservoir":
        # deterministic fixed-k uniform reservoir (md5-hash-order
        # top-k; TakeOrderedAndProject — no shuffle, no global sort)
        k = int(params.get("k", 500))
        keep = (
            docs.select(
                "doc_id", F.md5(F.col("doc_id").cast("string")).alias("__r")
            )
            .orderBy("__r", "doc_id")
            .limit(k)
            .select("doc_id")
        )
        return docs.join(keep, "doc_id", "left_semi")
    if kind == "sample_dsir":
        # resample raw docs toward the trusted slice; the slice itself
        # (the target definition) always survives
        ref_mod = int(params.get("ref_mod", sampling._DSIR_REF_MOD))
        picked = sampling.dsir_select(
            docs,
            k=int(params.get("k", sampling._DSIR_K)),
            ref_mod=ref_mod,
            buckets=int(params.get("buckets", sampling._DSIR_BUCKETS)),
        ).select("doc_id")
        target = docs.filter(F.col("doc_id") % ref_mod == 0).select("doc_id")
        keep = picked.union(target).distinct()
        return docs.join(keep, "doc_id", "left_semi")
    raise ValueError(f"unknown stage kind {kind!r}")  # pragma: no cover


def run_recipe(spark: SparkSession, recipe: Recipe | str) -> list[dict]:
    """Execute a recipe; returns the per-stage manifest (also written
    to ``<output>/manifest.json``)."""
    if isinstance(recipe, str):
        recipe = load_recipe(recipe)
    out_root = Path(recipe.output)
    out_root.mkdir(parents=True, exist_ok=True)
    cur_dir = recipe.input
    manifest: list[dict] = []
    for i, stage in enumerate(recipe.stages):
        rows_in = load(spark, cur_dir, "documents").count()
        entry: dict = {"stage": i, "kind": stage.kind, "params": stage.params,
                       "rows_in": rows_in}
        if stage.kind == "shards":
            docs = load(spark, cur_dir, "documents")
            shard_dir = str(out_root / f"stage_{i:02d}_shards")
            write_training_shards(
                docs,
                shard_dir,
                shard_key="doc_id",
                n_shards=int(stage.params.get("n_shards", 8)),
                max_records_per_file=stage.params.get("max_records_per_file"),
            )
            mf = shard_manifest(spark, shard_dir, "doc_id")
            entry["rows_out"] = rows_in
            entry["n_files"] = mf.count()
            entry["path"] = shard_dir
        else:
            survived = _apply_stage(spark, stage.kind, stage.params, cur_dir)
            stage_dir = out_root / f"stage_{i:02d}_{stage.kind}"
            survived.select(*DOC_COLUMNS).write.mode("overwrite").parquet(
                str(stage_dir / "documents.parquet")
            )
            cur_dir = str(stage_dir)
            entry["rows_out"] = load(spark, cur_dir, "documents").count()
            entry["path"] = cur_dir
        manifest.append(entry)
    (out_root / "manifest.json").write_text(json.dumps(manifest, indent=2))
    return manifest
