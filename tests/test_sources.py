"""Source/sink coverage (SURVEY §2.1): CSV and JSON-lines readers with
explicit schemas, sampled CSV sink, parquet round-trips — each checked
against DuckDB reading the same files."""

import os

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs_pdf():
    con = duckdb.connect()
    return con.sql("SELECT doc_id, text, lang, source, n_chars FROM "
                   "read_parquet('/root/testdata/sf0.001/documents.parquet')"
                   ).df()


def test_csv_scan_with_schema(spark, docs_pdf, tmp_path):
    """S1 — CSV read with explicit schema (no inferSchema in prod)."""
    path = str(tmp_path / "docs.csv")
    docs_pdf.to_csv(path, index=False)
    df = spark.read.csv(path, header=True,
                        schema="doc_id long, text string, lang string, "
                               "source string, n_chars long")
    got = df.agg(F.count("*").alias("n"), F.sum("n_chars").alias("s")) \
        .collect()[0]
    assert got["n"] == len(docs_pdf)
    assert got["s"] == docs_pdf["n_chars"].sum()


def test_jsonl_scan(spark, docs_pdf, tmp_path):
    """S2 — JSON-lines read (the reference streams these in 100k chunks;
    Spark partitions for free)."""
    path = str(tmp_path / "docs.jsonl")
    docs_pdf.to_json(path, orient="records", lines=True)
    df = spark.read.json(path, schema="doc_id long, text string, "
                                      "lang string, source string, "
                                      "n_chars long")
    assert df.count() == len(docs_pdf)
    exp = docs_pdf.groupby("lang").size().to_dict()
    got = {r["lang"]: r["n"] for r in
           df.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert got == exp


def test_sampled_csv_sink(spark, tmp_path):
    """S8 — seeded sample + CSV sink (etl/02:146-152)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "sample")
    docs.sample(fraction=0.3, seed=42).limit(100) \
        .select("doc_id", "lang").write.csv(out, header=True)
    back = spark.read.csv(out, header=True,
                          schema="doc_id long, lang string")
    n = back.count()
    assert 0 < n <= 100
    # seeded sample is deterministic
    again = docs.sample(fraction=0.3, seed=42).limit(100).count()
    assert again == min(n, again)


def test_parquet_partitioned_roundtrip(spark, tmp_path):
    """S4 — partitioned parquet sink + partition-pruned scan."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "bylang")
    docs.write.partitionBy("lang").parquet(out)
    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    en = back.filter(F.col("lang") == "en")
    assert en.count() == docs.filter(F.col("lang") == "en").count()
    # physical layout: one dir per lang
    langs = {d.split("=")[1] for d in os.listdir(out)
             if d.startswith("lang=")}
    assert "en" in langs


def test_uniqueness_assertion_replaces_unique_index(spark):
    """S9 — Spark has no unique indexes; the contract is an assertion
    query (groupBy(id).count > 1 must be empty), per SURVEY §2.1."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    dupes = (docs.groupBy("doc_id").agg(F.count("*").alias("n"))
             .filter(F.col("n") > 1))
    assert dupes.count() == 0
