"""Time incremental maintenance vs a full rebuild (delta_merge_index).

Builds a main index over N docs, then folds a delta of N/10 NEW docs in
two ways: (a) ``delta_merge_index`` (Stage A/C over the delta only,
touched-group re-encode, untouched pass-through) and (b) a from-scratch
``build_index`` over main+delta. Reports both wall times and a
content checksum (order-independent crc32 sums over encoded blocks +
exact term_stats equality) — byte-identity at small scale is separately
pytest-gated (tests/test_streaming.py::test_delta_merge_*).

Usage: python scripts/delta_bench.py
Env: SPARK_GRAFT_BENCH_DOCS (main size, default 400000),
     SPARK_GRAFT_CPUS (8).
Never run concurrently with other Spark sessions.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _index_checksum(spark, idx) -> tuple:
    from pyspark.sql import functions as F
    r = idx.postings(spark).agg(
        F.count("*").alias("blocks"),
        F.sum("n").alias("postings"),
        F.sum(F.crc32(F.col("doc_bytes"))
              + F.crc32(F.col("tf_bytes"))
              + F.crc32(F.col("dl_bytes"))).alias("crc"),
    ).collect()[0]
    s = idx.term_stats(spark).agg(
        F.count("*").alias("terms"),
        F.sum("df").alias("df_sum"),
        F.sum(F.round(F.col("idf") * 1e9)).alias("idf_q"),
    ).collect()[0]
    return (r["blocks"], r["postings"], r["crc"],
            s["terms"], s["df_sum"], s["idf_q"],
            idx.n_docs, round(idx.avgdl, 9), idx.vocab_size)


def main() -> None:
    n_main = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "400000"))
    n_delta = n_main // 10
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))

    from review_recommender_spark.config import EngineConfig, bm25_north
    from review_recommender_spark.corpus.pages import pages_df
    from review_recommender_spark.index.build import (build_index,
                                                      delta_merge_index)
    from review_recommender_spark.index.tableio import TableIO
    from review_recommender_spark.session import get_spark

    shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
    if shm:
        os.environ.setdefault("SPARK_LOCAL_DIRS",
                              os.path.join(shm, "rrs_spark_local"))
    spark = get_spark("delta-bench", cores=cpus,
                      shuffle_partitions=max(cpus, 8))
    tmp = tempfile.mkdtemp(prefix="rrs_delta_", dir=shm)
    try:
        cfg = EngineConfig(bm25=bm25_north())
        # materialize corpora (untimed)
        all_path = os.path.join(tmp, "all")
        main_path = os.path.join(tmp, "main")
        delta_path = os.path.join(tmp, "delta")
        allp = pages_df(spark, n_main + n_delta,
                        partitions=max(32, cpus * 2))
        allp.write.mode("overwrite").parquet(all_path)
        allp = spark.read.parquet(all_path)
        allp.filter(f"doc_id < {n_main}").write.mode("overwrite") \
            .parquet(main_path)
        allp.filter(f"doc_id >= {n_main}").write.mode("overwrite") \
            .parquet(delta_path)

        # JIT warmup (same steady-state convention as bench.py)
        build_index(spark, spark.read.parquet(main_path).limit(5000),
                    TableIO(os.path.join(tmp, "warm")), cfg)

        t0 = time.perf_counter()
        main = build_index(spark, main_path,
                           TableIO(os.path.join(tmp, "idx_main")), cfg,
                           shuffle_partitions=max(32, cpus * 2))
        main_sec = round(time.perf_counter() - t0, 3)

        t0 = time.perf_counter()
        merged = delta_merge_index(
            spark, main, delta_path,
            TableIO(os.path.join(tmp, "idx_merged")),
            shuffle_partitions=max(32, cpus * 2))
        merge_sec = round(time.perf_counter() - t0, 3)

        t0 = time.perf_counter()
        scratch = build_index(spark, all_path,
                              TableIO(os.path.join(tmp, "idx_all")), cfg,
                              shuffle_partitions=max(32, cpus * 2))
        rebuild_sec = round(time.perf_counter() - t0, 3)

        cs_m = _index_checksum(spark, merged)
        cs_s = _index_checksum(spark, scratch)
        print(json.dumps({
            "metric": "delta_merge_vs_rebuild",
            "n_main": n_main, "n_delta": n_delta, "cpus": cpus,
            "main_build_sec": main_sec,
            "delta_merge_sec": merge_sec,
            "full_rebuild_sec": rebuild_sec,
            "merge_speedup_vs_rebuild": round(rebuild_sec / merge_sec, 2),
            "content_equal": cs_m == cs_s,
            "checksum": list(cs_m),
        }))
    finally:
        spark.stop()
        shutil.rmtree(tmp, ignore_errors=True)
        local_dirs = os.environ.get("SPARK_LOCAL_DIRS", "")
        if local_dirs.startswith("/dev/shm/"):
            shutil.rmtree(local_dirs, ignore_errors=True)


if __name__ == "__main__":
    main()
