"""Reference-shaped ETL / document-build operators, Spark-first.

Covers the relational operator inventory of SURVEY.md §2 (S/P/D/J/A/W/O/U
rows) as reusable functions. Where the reference iterates pandas rows, the
rebuild is declarative DataFrame code so Catalyst plans pushdown/pruning and
the aggregates get map-side partials for free.

The document build (`build_documents`) is the reference's
nlp/10_product_prep.py pipeline re-keyed for any (key, text) table:
  filter short text → T1 normalize → dedup by (key, clean-text) → per-key
  KPIs → rank reviews per key (stars desc, ts desc, row-order tie-break) →
  keep top N → ordered concat with " \\n" → join KPIs.
Ordered concat uses sort-by-struct + array_join (collect_list alone has no
order guarantee — SURVEY.md A2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import normalize_product_udf

# Column-alias resolution (P1) — etl/02_normalize_merge.py:22-38.
TEXT_COLS = ["text", "reviewtext", "review_text", "content", "body"]
STAR_COLS = ["stars", "overall", "rating", "star_rating", "score"]
DATE_COLS = ["ts", "date", "reviewtime", "unixreviewtime", "timestamp"]
SKU_COLS = ["sku", "asin", "product_id", "productid", "item_id"]
ID_COLS = ["id", "review_id", "reviewid", "reviewerid"]


def resolve_aliases(df: DataFrame) -> DataFrame:
    """First-present alias wins, renamed to the canonical column (P1)."""
    lower = {c.lower(): c for c in df.columns}
    out = df
    for canon, cands in [("text", TEXT_COLS), ("stars", STAR_COLS),
                         ("ts", DATE_COLS), ("sku", SKU_COLS),
                         ("id", ID_COLS)]:
        if canon in df.columns:
            continue
        for cand in cands:
            if cand in lower:
                out = out.withColumnRenamed(lower[cand], canon)
                break
    return out


def valid_stars(df: DataFrame, col: str = "stars") -> DataFrame:
    """P2 — round to int, keep 1..5 (etl/02:47-51)."""
    return (df.withColumn(col, F.round(F.col(col)).cast("int"))
            .filter(F.col(col).between(1, 5)))


def min_text_length(df: DataFrame, col: str = "text",
                    min_len: int = 10) -> DataFrame:
    """P3 — nlp/10:43."""
    return df.filter(F.length(col) >= min_len)


def union_dedup_by_id(dfs: list[DataFrame], id_col: str = "id") -> DataFrame:
    """U1+U2+D1 — unionByName then dropDuplicates(id) (etl/02:128-139)."""
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out.dropDuplicates([id_col])


def per_key_kpis(df: DataFrame, key: str = "sku") -> DataFrame:
    """A1 — groupBy(key).agg(count, avg stars round 3, max ts)
    (nlp/10:55-60, 82)."""
    return df.groupBy(key).agg(
        F.count("id").alias("n_reviews"),
        F.round(F.avg("stars"), 3).alias("avg_stars"),
        F.max("ts").alias("last_ts"))


def rank_reviews_per_key(df: DataFrame, key: str = "sku",
                         max_per_key: int = 80) -> DataFrame:
    """W1 — row_number over (stars desc NULLS LAST, ts desc NULLS LAST,
    id asc) ≤ N. The id tie-break replaces the incidental stable-sort order
    pandas leaves behind (nlp/10:68-71; SURVEY.md quirk Q7)."""
    w = (Window.partitionBy(key)
         .orderBy(F.desc_nulls_last("stars"), F.desc_nulls_last("ts"),
                  F.asc("id")))
    return (df.withColumn("__rank", F.row_number().over(w))
            .filter(F.col("__rank") <= max_per_key))


def ordered_text_concat(df: DataFrame, key: str = "sku",
                        text_col: str = "__clean",
                        sep: str = " \n") -> DataFrame:
    """A2 — per-key concat of texts in rank order: sort structs inside the
    group, then array_join (deterministic, unlike bare collect_list)."""
    return (df.groupBy(key)
            .agg(F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(
                        F.struct(F.col("__rank").alias("r"),
                                 F.col(text_col).alias("t")))),
                    lambda s: s["t"]),
                sep).alias("agg_text")))


def build_documents(reviews: DataFrame, key: str = "sku",
                    max_per_key: int = 80, min_len: int = 10) -> DataFrame:
    """The full nlp/10 document build, distributed."""
    df = reviews.withColumn("__clean", normalize_product_udf(F.col("text")))
    df = df.filter(F.length("__clean") >= min_len)
    # deterministic dedup: keep the min-id row per (key, clean text). The
    # reference keeps pandas file order (nlp/10:51), which has no distributed
    # analogue — min-id is our documented determinism hardening (quirk Q7).
    wdup = Window.partitionBy(key, "__clean").orderBy(F.asc("id"))
    df = (df.withColumn("__dup_rn", F.row_number().over(wdup))
          .filter(F.col("__dup_rn") == 1).drop("__dup_rn"))
    kpis = per_key_kpis(df, key)
    ranked = rank_reviews_per_key(df, key, max_per_key)
    agg = ordered_text_concat(ranked, key)
    return (kpis.join(agg, key, "left")
            .withColumn("agg_text", F.coalesce("agg_text", F.lit(""))))


def best_snippet_per_key(df: DataFrame, key: str = "sku",
                         score_col: str = "__sim") -> DataFrame:
    """A3 — per-key argmax row with first-max-wins tie-break via original
    order column (numpy argmax keeps the first max; app/test.py:211-215)."""
    w = Window.partitionBy(key).orderBy(F.desc(score_col), F.asc("__pos"))
    return (df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1).drop("__rn"))
