"""Document-build parity: Spark build_documents vs a pandas mirror of the
reference pipeline (nlp/10_product_prep.py build_products), including the
deterministic-dedup divergence (min-id == reference first-in-file-order when
input is id-sorted)."""

import numpy as np
import pandas as pd
import pytest

from review_recommender_spark.etl.pipeline import (build_documents,
                                                   resolve_aliases,
                                                   union_dedup_by_id,
                                                   valid_stars)
from review_recommender_spark.functions.text import normalize_product_py


def _synth_reviews(n=300, seed=7):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        sku = f"SKU{rng.integers(0, 30):03d}"
        text = " ".join(rng.choice(
            ["great", "bad", "battery", "sound", "quality", "cheap",
             "durable", "broke", "love", "terrible", "okay", "fine"],
            size=rng.integers(3, 12)))
        stars = int(rng.integers(1, 6)) if rng.random() > 0.1 else None
        ts = (pd.Timestamp("2020-01-01")
              + pd.Timedelta(days=int(rng.integers(0, 1000)))
              if rng.random() > 0.1 else pd.NaT)
        rows.append((f"id{i:05d}", sku, ts, stars, text))
    # planted exact duplicates (same sku + same text, later ids)
    for j in range(20):
        src = rows[j]
        rows.append((f"id9{j:04d}", src[1], src[2], src[3], src[4]))
    # short texts to be filtered
    rows.append(("idshort1", "SKU000", pd.NaT, 3, "tiny"))
    return pd.DataFrame(rows, columns=["id", "sku", "ts", "stars", "text"])


def _pandas_oracle(df: pd.DataFrame, max_per_key=5) -> pd.DataFrame:
    """Faithful mirror of nlp/10 build_products (id-sorted input makes
    keep-first == keep-min-id)."""
    df = df.sort_values("id").copy()
    df["__clean"] = df["text"].map(normalize_product_py)
    df = df[df["__clean"].str.len() >= 10]
    df = df.drop_duplicates(subset=["sku", "__clean"])
    kpis = df.groupby("sku", as_index=False).agg(
        n_reviews=("id", "count"), avg_stars=("stars", "mean"),
        last_ts=("ts", "max"))
    kpis["avg_stars"] = kpis["avg_stars"].astype(float).round(3)
    df = df.sort_values(["sku", "stars", "ts"],
                        ascending=[True, False, False], kind="stable")
    df["__rank"] = df.groupby("sku").cumcount() + 1
    keep = df[df["__rank"] <= max_per_key]
    agg = (keep.groupby("sku")["__clean"]
           .apply(lambda ss: " \n".join(ss.tolist()))
           .rename("agg_text").reset_index())
    out = kpis.merge(agg, on="sku", how="left")
    out["agg_text"] = out["agg_text"].fillna("")
    return out.sort_values("sku").reset_index(drop=True)


def test_build_documents_matches_reference_semantics(spark):
    pdf = _synth_reviews()
    sdf = spark.createDataFrame(
        pdf, schema="id string, sku string, ts timestamp, stars int, "
                    "text string")
    got = (build_documents(sdf, key="sku", max_per_key=5)
           .toPandas().sort_values("sku").reset_index(drop=True))
    exp = _pandas_oracle(pdf, max_per_key=5)
    assert got["sku"].tolist() == exp["sku"].tolist()
    assert got["n_reviews"].tolist() == exp["n_reviews"].tolist()
    np.testing.assert_allclose(got["avg_stars"].astype(float),
                               exp["avg_stars"].astype(float), rtol=1e-9)
    # ordered concat byte-identical per sku
    for s, g, e in zip(got["sku"], got["agg_text"], exp["agg_text"]):
        assert g == e, s
    # duplicates were actually removed
    assert got["n_reviews"].sum() < len(pdf) - 1


def test_resolve_aliases():
    pdf = pd.DataFrame({"reviewText": ["abc"], "overall": [4],
                        "asin": ["X"], "unixReviewTime": [1577836800],
                        "review_id": ["r1"]})
    import pyspark.sql  # noqa
    from review_recommender_spark.session import get_spark
    spark = get_spark("alias", cores=2)
    df = resolve_aliases(spark.createDataFrame(pdf))
    assert {"text", "stars", "sku", "ts", "id"} <= set(df.columns)


def test_valid_stars_bounds(spark):
    df = spark.createDataFrame(
        [(1, 0.4), (2, 1.4), (3, 5.4), (4, 5.6), (5, None)],
        "id int, stars double")
    kept = valid_stars(df).collect()
    got = {r["id"]: r["stars"] for r in kept}
    # 0.4→0 dropped, 1.4→1 kept, 5.4→5 kept, 5.6→6 dropped, null dropped
    assert got == {2: 1, 3: 5}


def test_union_dedup_by_id(spark):
    a = spark.createDataFrame([("x", 1), ("y", 2)], "id string, v int")
    b = spark.createDataFrame([("y", 2), ("z", 3)], "id string, v int")
    out = union_dedup_by_id([a, b], "id")
    assert sorted(r["id"] for r in out.collect()) == ["x", "y", "z"]


def test_clean_source_dual_timestamp_and_id_fallback(spark):
    """etl/02:57-63 dual coercion: a 'unix'-named date column parses as
    unix SECONDS, a string column as a timestamp string; blank/missing
    ids fall back to sha256(text|ts-iso|sku)[:32] (etl/02:12-14)."""
    import hashlib

    from review_recommender_spark.etl.pipeline import clean_source

    unix_src = spark.createDataFrame(
        [("a really long review text", 4.4, "SKU1", 1609556645, "idA"),
         ("another quite long review", 3.0, "SKU2", 1609556646, "  ")],
        "reviewText string, overall double, asin string, "
        "unixReviewTime long, reviewerID string")
    out = {r["id"]: r for r in clean_source(unix_src, "snap").collect()}
    assert "idA" in out
    assert str(out["idA"]["ts"]) == "2021-01-02 03:04:05"
    assert out["idA"]["stars"] == 4  # 4.4 rounds
    # blank id → stable hash with isoformat ts (+00:00 suffix)
    key = "another quite long review|2021-01-02T03:04:06+00:00|SKU2"
    exp = hashlib.sha256(key.encode()).hexdigest()[:32]
    assert exp in out

    str_src = spark.createDataFrame(
        [("string date long enough text", 5, "P1",
          "2021-01-02 03:04:05", "idB")],
        "content string, rating int, product_id string, date string, "
        "review_id string")
    row = clean_source(str_src, "kaggle").collect()[0]
    assert str(row["ts"]) == "2021-01-02 03:04:05"
    assert row["source"] == "kaggle"


def test_normalize_merge_first_source_wins(spark):
    from review_recommender_spark.etl.pipeline import normalize_merge
    a = spark.createDataFrame(
        [("shared-id", "first source review text", 4, "S1",
          "2021-01-01 00:00:00")],
        "id string, text string, stars int, sku string, date string")
    b = spark.createDataFrame(
        [("shared-id", "second source review text", 2, "S2",
          "2021-06-01 00:00:00"),
         ("only-b", "unique second source text", 5, "S3",
          "2021-06-02 00:00:00")],
        "id string, text string, stars int, sku string, date string")
    out = {r["id"]: r for r in
           normalize_merge([("alpha", a), ("beta", b)]).collect()}
    assert set(out) == {"shared-id", "only-b"}
    assert out["shared-id"]["source"] == "alpha"   # first source wins
    assert out["only-b"]["source"] == "beta"
