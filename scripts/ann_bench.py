"""ANN evidence at bench scale: persisted-IVF vs exact dense scan.

Builds embeddings for a synthetic page corpus, runs the exact mapInArrow
scan and the persisted-IVF partition-pruned path over the golden-query
batch, and reports build-once cost, per-batch latency, scan fraction
(files touched / total files of the assignments table) and recall@pool.

Usage: python scripts/ann_bench.py [n_docs] (default 120000)
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 120_000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_clusters = int(os.environ.get("SPARK_GRAFT_IVF_CLUSTERS", "64"))
    nprobe = int(os.environ.get("SPARK_GRAFT_IVF_NPROBE", "16"))
    pool = 100
    shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
    if shm:
        os.environ.setdefault("SPARK_LOCAL_DIRS",
                              os.path.join(shm, "rrs_ann_local"))

    from pyspark.sql import functions as F

    from review_recommender_spark.corpus.pages import GOLDEN_PHRASES, pages_df
    from review_recommender_spark.index.tableio import TableIO
    from review_recommender_spark.ops.similarity import (IVF_ASSIGNMENTS,
                                                         ivf_build)
    from review_recommender_spark.query.encoder import embed_documents
    from review_recommender_spark.query.search import (dense_topk_batch,
                                                       dense_topk_batch_ivf)
    from review_recommender_spark.session import get_spark

    spark = get_spark("ann-bench", cores=cpus,
                      shuffle_partitions=max(cpus, 8))
    tmp = tempfile.mkdtemp(prefix="rrs_ann_", dir=shm)
    out: dict = {"n_docs": n_docs, "n_clusters": n_clusters,
                 "nprobe": nprobe, "pool": pool}
    try:
        docs = pages_df(spark, n_docs, partitions=max(32, cpus * 2))
        emb_path = os.path.join(tmp, "emb")
        (embed_documents(docs.select("doc_id", "text"))
         .select("doc_id", "embedding")
         .write.mode("overwrite").parquet(emb_path))
        emb = spark.read.parquet(emb_path)

        io = TableIO(os.path.join(tmp, "ivf"))
        t0 = time.perf_counter()
        ivf = ivf_build(emb, io, id_col="doc_id", n_clusters=n_clusters)
        out["ivf_build_sec"] = round(time.perf_counter() - t0, 3)

        queries = list(GOLDEN_PHRASES)
        # warm both paths once (JIT / worker spawn), then time
        dense_topk_batch(spark, emb, queries, pool).count()
        dense_topk_batch_ivf(spark, ivf, queries, pool,
                             nprobe=nprobe).count()

        t0 = time.perf_counter()
        exact = dense_topk_batch(spark, emb, queries, pool).toPandas()
        out["exact_batch_sec"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        approx = dense_topk_batch_ivf(spark, ivf, queries, pool,
                                      nprobe=nprobe).toPandas()
        out["ivf_batch_sec"] = round(time.perf_counter() - t0, 3)

        recalls = []
        for qi in range(len(queries)):
            e = set(exact[exact["query_id"] == qi]["doc_id"])
            a = set(approx[approx["query_id"] == qi]["doc_id"])
            recalls.append(len(e & a) / max(len(e), 1))
        out["recall_at_pool_mean"] = round(sum(recalls) / len(recalls), 4)
        out["recall_at_pool_min"] = round(min(recalls), 4)

        # scan fraction: files under the probed cluster dirs / all files
        from review_recommender_spark.query.encoder import encode_text
        probed = set()
        for q in queries:
            probed.update(ivf.probe_clusters(encode_text(q), nprobe))
        base = io.path(IVF_ASSIGNMENTS)
        def nfiles(d):
            return sum(len(fs) for _, _, fs in os.walk(d))
        total = sum(nfiles(os.path.join(base, d))
                    for d in os.listdir(base) if d.startswith("ivf_cluster="))
        touched = sum(nfiles(os.path.join(base, f"ivf_cluster={c}"))
                      for c in probed
                      if os.path.isdir(os.path.join(base,
                                                    f"ivf_cluster={c}")))
        out["probed_clusters"] = len(probed)
        out["files_scan_fraction"] = round(touched / max(total, 1), 4)
        print(json.dumps(out))
    finally:
        spark.stop()
        shutil.rmtree(tmp, ignore_errors=True)
        local_dirs = os.environ.get("SPARK_LOCAL_DIRS", "")
        if local_dirs.startswith("/dev/shm/"):
            shutil.rmtree(local_dirs, ignore_errors=True)


if __name__ == "__main__":
    main()
