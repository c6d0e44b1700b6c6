"""Clustering over embedding columns (reference M3: MiniBatchKMeans k=60,
nlp/_archive/05a_cluster_sanity.py:22-30) via pyspark.ml.KMeans, and the
TF-IDF top-terms-per-cluster naming operator (M5,
nlp/_archive/06_name_topics.py:18-45) as a pure SQL-expressible
composition (explode → tf per group → idf across groups → rank)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def kmeans_clusters(df: DataFrame, vec_col: str = "embedding",
                    k: int = 8, seed: int = 42) -> DataFrame:
    """Assign a cluster id per row (deterministic for a fixed seed)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    vecs = df.withColumn("__features", array_to_vector(F.col(vec_col)))
    model = KMeans(k=k, seed=seed, featuresCol="__features",
                   predictionCol="cluster").fit(vecs)
    return model.transform(vecs).drop("__features")


def tfidf_top_terms(df: DataFrame, group_col: str, tokens_col: str,
                    top_n: int = 5) -> DataFrame:
    """Top-N terms per group by tf·idf, idf = ln(n_groups / df_groups).
    Deterministic tie-break (score desc, term asc). Pure DataFrame ops —
    two small aggregations, no UDF."""
    exploded = df.select(F.col(group_col).alias("grp"),
                         F.explode(tokens_col).alias("term"))
    tf = exploded.groupBy("grp", "term").agg(F.count("*").alias("tf"))
    # n_groups rides the SAME action as a broadcast scalar subquery (no
    # separate .distinct().count() job); derived from tf (one row per
    # (grp, term)) so it shares tf's shuffle output instead of re-scanning
    n_groups = F.broadcast(
        tf.select(F.countDistinct("grp").alias("__ng")))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df_groups"))
    scored = (tf.join(dfreq, "term")
              .crossJoin(n_groups)
              .withColumn("tfidf",
                          F.round(F.col("tf")
                                  * F.log(F.col("__ng").cast("double")
                                          / F.col("df_groups")), 6))
              .drop("__ng"))
    w = Window.partitionBy("grp").orderBy(F.desc("tfidf"), F.asc("term"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= top_n)
            .select("grp", "term", "tfidf", "rank"))
