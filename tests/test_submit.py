"""Deployment smoke: the engine must run through a REAL
``spark-submit --py-files dist/engine.zip`` (the north rule's runtime
clause), producing BITWISE the same top-k as an in-process run.

The submitted job runs in its own JVM/session (local[4], neutral cwd, no
repo PYTHONPATH — only the zip provides the package), so this also
re-proves the package is self-contained and the build is
parallelism-independent (the in-process reference runs on the shared
local[8] test session with a different corpus partitioning).
"""

import importlib.util
import os

import pytest


def _load_package_module():
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts", "package.py")
    spec = importlib.util.spec_from_file_location("pkg_script", path)
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_spark_submit_py_files_bitwise(spark, tmp_path):
    import shutil
    if shutil.which("spark-submit") is None:
        pytest.skip("spark-submit not on PATH")
    pkg = _load_package_module()
    zip_path = pkg.build_zip(str(tmp_path / "engine.zip"))
    assert os.path.getsize(zip_path) > 10_000
    submitted = pkg.smoke(zip_path)

    from review_recommender_spark.config import EngineConfig, bm25_north
    from review_recommender_spark.corpus.pages import pages_df
    from review_recommender_spark.index.build import build_index
    from review_recommender_spark.index.tableio import TableIO
    from review_recommender_spark.query.bm25 import bm25_topk_exact

    idx = build_index(spark, pages_df(spark, 500),
                      TableIO(str(tmp_path / "ref_idx")),
                      EngineConfig(bm25=bm25_north()))
    ref = [(r["doc_id"], r["score"]) for r in
           bm25_topk_exact(spark, idx, "wireless bluetooth headphones",
                           k=5).collect()]
    assert submitted == ref  # doc ids AND float-bitwise scores
