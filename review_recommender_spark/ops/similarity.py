"""Similarity search over embedding columns (array<float>).

The reference's dense retrieval is a single-node numpy matmul over an
mmap'd (N, 384) matrix (utils.py:111-124, app/test.py:125-132). Here:

  * brute_force_cosine_topk — the exact baseline: broadcast the probe
    vectors, JVM zip_with/aggregate dot products, per-probe top-k via
    window rank (Catalyst plans partial top-k per partition). No Python.
  * lsh_cosine_topk — the scale path: deterministic random-hyperplane
    signatures bucket both sides; candidates are rescored exactly within
    matching buckets (multi-probe over all bands). Recall is tested against
    the brute-force baseline in tests/test_ops.py.

At 10^12 rows the brute-force path is a full scan per probe batch —
viable only for reranking candidate pools; the LSH path prunes the scan to
matching buckets, trading recall.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

SEED = 42


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, x: acc + x))


def cosine_col(a: Column, b: Column) -> Column:
    # float32 inputs are widened to double BEFORE the products so the
    # arithmetic matches a float64 oracle to ~1e-15 (float32 products would
    # diverge at ~1e-7, breaking round-6 comparisons)
    a = a.cast("array<double>")
    b = b.cast("array<double>")
    return _dot(a, b) / F.greatest(_norm(a) * _norm(b), F.lit(1e-12))


def brute_force_cosine_topk(vectors: DataFrame, probes: DataFrame,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding",
                            probe_id_col: str = "probe_id",
                            probe_vec_col: str = "probe_vec",
                            k: int = 10) -> DataFrame:
    """Exact top-k neighbours per probe (probes broadcast; one scan)."""
    joined = vectors.crossJoin(F.broadcast(probes))
    scored = joined.select(
        F.col(probe_id_col),
        F.col(id_col),
        F.round(cosine_col(F.col(vec_col), F.col(probe_vec_col)), 6)
        .alias("cosine"))
    w = Window.partitionBy(probe_id_col).orderBy(F.desc("cosine"),
                                                 F.asc(id_col))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def hyperplanes(dim: int, n_planes: int, seed: int = SEED) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).astype(np.float64)


def _signature_col(vec_col: Column, planes: np.ndarray) -> Column:
    """Pack sign(v·h_i) bits into a long — JVM expression per plane."""
    bits = [
        F.when(_dot(vec_col,
                    F.array(*[F.lit(float(x)) for x in plane])) > 0,
               F.lit(1 << i)).otherwise(F.lit(0))
        for i, plane in enumerate(planes)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("long")


def ivf_index(vectors: DataFrame, id_col: str = "vec_id",
              vec_col: str = "embedding", n_clusters: int = 16,
              seed: int = SEED) -> tuple[DataFrame, np.ndarray]:
    """Offline IVF build (FAISS-IVF shape): KMeans coarse quantizer over
    the embedding column → (assignments DataFrame with an ``ivf_cluster``
    column, centroid matrix). At scale the assignments table is persisted
    PARTITIONED BY ivf_cluster so a query's nprobe clusters prune at the
    directory level; the centroid matrix is O(n_clusters·dim) —
    driver/broadcast-sized by construction."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    vecs = vectors.withColumn(
        "__features", array_to_vector(F.col(vec_col).cast("array<double>")))
    model = KMeans(k=n_clusters, seed=seed, featuresCol="__features",
                   predictionCol="ivf_cluster").fit(vecs)
    assigned = model.transform(vecs).drop("__features")
    centroids = np.stack([np.asarray(c) for c in model.clusterCenters()])
    return assigned, centroids


def ivf_cosine_topk(vectors: DataFrame, probes: DataFrame,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    probe_id_col: str = "probe_id",
                    probe_vec_col: str = "probe_vec",
                    k: int = 10, n_clusters: int = 16, nprobe: int = 4,
                    assigned: DataFrame | None = None,
                    centroids: np.ndarray | None = None) -> DataFrame:
    """Approximate top-k via IVF: each probe scans only its ``nprobe``
    nearest clusters (exact cosine within). The probe batch is
    driver-sized by contract (a query batch), so nearest-cluster
    selection is a tiny driver-side matmul against the centroid matrix —
    no extra Spark job. Recall vs brute force is pytest-gated ≥ 0.9
    (tests/test_ops.py)."""
    if assigned is None or centroids is None:
        assigned, centroids = ivf_index(vectors, id_col, vec_col,
                                        n_clusters)
    cn = centroids / np.maximum(
        np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12)
    spark = probes.sparkSession
    rows = []
    for r in probes.select(probe_id_col, probe_vec_col).collect():
        v = np.asarray(r[probe_vec_col], dtype=np.float64)
        v = v / max(float(np.linalg.norm(v)), 1e-12)
        top = np.argsort(-(cn @ v))[:nprobe]
        for c in top:
            rows.append((r[probe_id_col], int(c), list(r[probe_vec_col])))
    pc = spark.createDataFrame(
        rows, f"{probe_id_col} int, ivf_cluster int, "
              f"{probe_vec_col} array<float>")
    cand = assigned.join(F.broadcast(pc), "ivf_cluster")
    scored = cand.select(
        probe_id_col, id_col,
        F.round(cosine_col(F.col(vec_col), F.col(probe_vec_col)), 6)
        .alias("cosine"))
    w = Window.partitionBy(probe_id_col).orderBy(F.desc("cosine"),
                                                 F.asc(id_col))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def lsh_cosine_topk(vectors: DataFrame, probes: DataFrame,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    probe_id_col: str = "probe_id",
                    probe_vec_col: str = "probe_vec",
                    k: int = 10, dim: int = 64,
                    n_planes: int = 12, bands: int = 3) -> DataFrame:
    """Approximate top-k: hyperplane-signature bands bucket candidates,
    exact cosine rescoring within buckets. bands ≥ 2 gives multi-probe
    recall (a candidate matches if ANY band agrees)."""
    planes = hyperplanes(dim, n_planes)
    per_band = n_planes // bands
    band_planes = [planes[b * per_band:(b + 1) * per_band]
                   for b in range(bands)]

    def with_bands(df: DataFrame, vcol: str, idc: str, prefix: str) -> DataFrame:
        cols = [F.col(idc), F.col(vcol)]
        bandcols = [
            F.struct(F.lit(b).alias("band"),
                     _signature_col(F.col(vcol), bp).alias("sig"))
            for b, bp in enumerate(band_planes)]
        return (df.select(*cols, F.explode(F.array(*bandcols)).alias("bb"))
                .select(idc, vcol, F.col("bb.band").alias(f"{prefix}band"),
                        F.col("bb.sig").alias(f"{prefix}sig")))

    v = with_bands(vectors, vec_col, id_col, "")
    p = with_bands(probes, probe_vec_col, probe_id_col, "p")
    cand = (v.join(F.broadcast(p),
                   (F.col("band") == F.col("pband"))
                   & (F.col("sig") == F.col("psig")))
            .select(probe_id_col, id_col, vec_col, probe_vec_col)
            .dropDuplicates([probe_id_col, id_col]))
    scored = cand.select(
        probe_id_col, id_col,
        F.round(cosine_col(F.col(vec_col), F.col(probe_vec_col)), 6)
        .alias("cosine"))
    w = Window.partitionBy(probe_id_col).orderBy(F.desc("cosine"),
                                                 F.asc(id_col))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))
