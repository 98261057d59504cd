"""Recipe runner: composition semantics over the oracle-checked stage
operators (each stage's decision logic is tested elsewhere; here we
prove the STAGING — ordering, materialization, manifest accounting,
and equivalence to calling the operators by hand)."""

from __future__ import annotations

import json
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from go_cdc_spark.curate import load_recipe, run_recipe
from go_cdc_spark.operators import dedup, text
from go_cdc_spark.tables import load

RECIPE = """
[corpus]
input = "{input}"
output = "{output}"

[[stage]]
kind = "lang_keep"
langs = ["en", "de"]

[[stage]]
kind = "dedup_exact"

[[stage]]
kind = "sample_stratified"

[[stage]]
kind = "shards"
n_shards = 4
"""


def _write_recipe(tmp_path, sf_dir):
    p = tmp_path / "recipe.toml"
    p.write_text(RECIPE.format(input=sf_dir, output=str(tmp_path / "out")))
    return str(p)


def test_recipe_runs_and_accounts(spark, sf_dir, tmp_path):
    manifest = run_recipe(spark, _write_recipe(tmp_path, sf_dir))
    assert [m["kind"] for m in manifest] == [
        "lang_keep", "dedup_exact", "sample_stratified", "shards",
    ]
    # row accounting chains: each stage's rows_in is the prior rows_out
    for prev, cur in zip(manifest, manifest[1:]):
        assert cur["rows_in"] == prev["rows_out"]
    for m in manifest:
        assert m["rows_out"] <= m["rows_in"]
    # the manifest file matches the return value
    on_disk = json.loads((tmp_path / "out" / "manifest.json").read_text())
    assert on_disk == manifest
    # shard stage wrote real files
    shard_dir = Path(manifest[-1]["path"])
    assert manifest[-1]["n_files"] >= 1
    assert list(shard_dir.glob("*.parquet"))


def test_stages_equal_hand_composition(spark, sf_dir, tmp_path):
    """The staged run's final corpus equals applying the same operators
    by hand on progressively materialized inputs."""
    manifest = run_recipe(spark, _write_recipe(tmp_path, sf_dir))
    final_docs = load(spark, manifest[-2]["path"], "documents")

    docs = load(spark, sf_dir, "documents").filter(
        F.col("lang").isin(["en", "de"])
    )
    d1 = tmp_path / "hand1"
    docs.write.parquet(str(d1 / "documents.parquet"))
    keep = dedup.dedup_exact(spark, str(d1)).select(
        F.col("keep_doc_id").alias("doc_id")
    )
    d2 = tmp_path / "hand2"
    load(spark, str(d1), "documents").join(keep, "doc_id", "left_semi").write.parquet(
        str(d2 / "documents.parquet")
    )
    sampled = text.sample_stratified(spark, str(d2)).select("doc_id")
    expect = {
        r["doc_id"]
        for r in load(spark, str(d2), "documents")
        .join(sampled, "doc_id", "left_semi")
        .collect()
    }
    got = {r["doc_id"] for r in final_docs.collect()}
    assert got == expect
    assert manifest[-2]["rows_out"] == len(expect)


def test_recipe_validation(tmp_path, sf_dir):
    bad = tmp_path / "bad.toml"
    bad.write_text(
        f'[corpus]\ninput = "{sf_dir}"\noutput = "{tmp_path}/o"\n'
        '[[stage]]\nkind = "shards"\n[[stage]]\nkind = "dedup_exact"\n'
    )
    with pytest.raises(ValueError, match="terminal"):
        load_recipe(str(bad))
    bad2 = tmp_path / "bad2.toml"
    bad2.write_text(
        f'[corpus]\ninput = "{sf_dir}"\noutput = "{tmp_path}/o"\n'
        '[[stage]]\nkind = "nope"\n'
    )
    with pytest.raises(ValueError, match="unknown kind"):
        load_recipe(str(bad2))
    bad3 = tmp_path / "bad3.toml"
    bad3.write_text('[corpus]\ninput = "/x"\n')
    with pytest.raises(ValueError, match="input and output"):
        load_recipe(str(bad3))


def test_rewrite_stage_recounts_chars(spark, tmp_path):
    """pii_redact / dedup_paragraphs stages rewrite text — n_chars must
    be recomputed from the new text, not carried stale."""
    df = spark.createDataFrame(
        [(1, "contact a@b.com now", "en", "s", 19),
         (2, "clean text here", "en", "s", 15)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    src = tmp_path / "src"
    df.write.parquet(str(src / "documents.parquet"))
    rec = tmp_path / "r.toml"
    rec.write_text(
        f'[corpus]\ninput = "{src}"\noutput = "{tmp_path}/out"\n'
        '[[stage]]\nkind = "pii_redact"\n'
    )
    manifest = run_recipe(spark, str(rec))
    out = {
        r["doc_id"]: r
        for r in load(spark, manifest[0]["path"], "documents").collect()
    }
    assert "<EMAIL>" in out[1]["text"]
    assert out[1]["n_chars"] == len(out[1]["text"])
    assert out[2]["text"] == "clean text here"


def test_cli_curate_subcommand(spark, sf_dir, tmp_path, capsys):
    """`python -m go_cdc_spark curate recipe.toml` runs the recipe and
    prints the manifest (spark session reused from the test fixture)."""
    from go_cdc_spark.__main__ import main

    rec = tmp_path / "r.toml"
    rec.write_text(
        f'[corpus]\ninput = "{sf_dir}"\noutput = "{tmp_path}/out"\n'
        '[[stage]]\nkind = "dedup_exact"\n'
    )
    assert main(["curate", str(rec)]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out[0]["kind"] == "dedup_exact"
    assert out[0]["rows_out"] <= out[0]["rows_in"]


def test_cli_legacy_form_maps_to_sync(tmp_path):
    """A bare config path still parses as the sync subcommand (the
    round-<=7 invocation); a missing file then fails in the loader,
    proving dispatch reached sync."""
    from go_cdc_spark.__main__ import main

    with pytest.raises(FileNotFoundError):
        main([str(tmp_path / "nope.toml")])


def test_dedup_phash_stage(spark, tmp_path):
    """Perceptual-duplicate stage keeps one doc per phash bucket (the
    fixture media derives from text, so identical text ⇒ identical
    payload ⇒ same bucket; min doc_id survives)."""
    df = spark.createDataFrame(
        [(1, "same body text", "en", "s", 14),
         (2, "same body text", "en", "s", 14),
         (3, "a different document", "en", "s", 20)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    src = tmp_path / "src"
    df.write.parquet(str(src / "documents.parquet"))
    rec = tmp_path / "r.toml"
    rec.write_text(
        f'[corpus]\ninput = "{src}"\noutput = "{tmp_path}/out"\n'
        '[[stage]]\nkind = "dedup_phash"\n'
    )
    manifest = run_recipe(spark, str(rec))
    kept = {
        r["doc_id"] for r in load(spark, manifest[0]["path"], "documents").collect()
    }
    assert 1 in kept and 3 in kept
    assert 2 not in kept  # duplicate payload, higher doc_id


def test_stage_knobs_override_defaults(spark, sf_dir, tmp_path):
    """Recipe parameters flow into the shared df-level cores: a halved
    PPS rate keeps (weakly) fewer docs, a doubled DSIR k keeps more,
    and stratified rates change the language mix."""
    def run_one(body, out):
        rec = tmp_path / f"{out}.toml"
        rec.write_text(
            f'[corpus]\ninput = "{sf_dir}"\noutput = "{tmp_path}/{out}"\n' + body
        )
        return run_recipe(spark, str(rec))[0]

    pps_hi = run_one('[[stage]]\nkind = "sample_pps"\n', "pps_hi")
    pps_lo = run_one(
        '[[stage]]\nkind = "sample_pps"\nrate_per_10000 = 500\n', "pps_lo"
    )
    assert pps_lo["rows_out"] < pps_hi["rows_out"]

    dsir_small = run_one('[[stage]]\nkind = "sample_dsir"\nk = 5\n', "dsir_s")
    dsir_big = run_one('[[stage]]\nkind = "sample_dsir"\nk = 40\n', "dsir_b")
    assert dsir_big["rows_out"] - dsir_small["rows_out"] == 35

    strat = run_one(
        '[[stage]]\nkind = "sample_stratified"\ndefault_rate = 100\n'
        '[stage.rates]\nen = 0\n',
        "strat",
    )
    out_langs = {
        r["lang"] for r in load(spark, strat["path"], "documents").collect()
    }
    assert "en" not in out_langs and out_langs  # en zeroed, others full


def test_dedup_phash_near_stage(spark, sf_dir, tmp_path):
    """The near-dup stage keeps exactly the survivor set (cluster min +
    singletons) — weakly smaller than the exact-bucket stage's keep."""
    from go_cdc_spark.operators.multimodal import media_phash_survivors

    rec = tmp_path / "r.toml"
    rec.write_text(
        f'[corpus]\ninput = "{sf_dir}"\noutput = "{tmp_path}/out"\n'
        '[[stage]]\nkind = "dedup_phash_near"\n'
    )
    manifest = run_recipe(spark, str(rec))
    kept = {
        r["doc_id"] for r in load(spark, manifest[0]["path"], "documents").collect()
    }
    expect = {r["doc_id"] for r in media_phash_survivors(spark, sf_dir).collect()}
    assert kept == expect
    assert manifest[0]["rows_out"] <= manifest[0]["rows_in"]


def test_sample_reservoir_stage(spark, sf_dir, tmp_path):
    """Fixed-k deterministic reservoir as a recipe stage: exactly k
    docs survive (k < corpus), same set every run."""
    def run_one(body, out):
        rec = tmp_path / f"{out}.toml"
        rec.write_text(
            f'[corpus]\ninput = "{sf_dir}"\noutput = "{tmp_path}/{out}"\n' + body
        )
        return run_recipe(spark, str(rec))[0]

    a = run_one('[[stage]]\nkind = "sample_reservoir"\nk = 17\n', "resv_a")
    b = run_one('[[stage]]\nkind = "sample_reservoir"\nk = 17\n', "resv_b")
    assert a["rows_out"] == b["rows_out"] == 17
    ids_a = {r["doc_id"] for r in load(spark, a["path"], "documents").collect()}
    ids_b = {r["doc_id"] for r in load(spark, b["path"], "documents").collect()}
    assert ids_a == ids_b and len(ids_a) == 17
