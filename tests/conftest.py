import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from review_recommender_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("rrs-tests", cores=int(os.environ.get("TEST_CORES", "8")),
                  shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def small_pages_pdf():
    from review_recommender_spark.corpus.pages import pages_pdf
    return pages_pdf(np.arange(1000))


@pytest.fixture(scope="session")
def small_pages(spark, small_pages_pdf):
    from review_recommender_spark.corpus.pages import PAGES_SCHEMA
    df = spark.createDataFrame(small_pages_pdf, schema=PAGES_SCHEMA)
    df = df.repartition(8).cache()
    df.count()
    return df


# Micro BM25 corpus mirroring the reference pytest fixture
# (tests/conftest.py:91-100 in /root/reference) — FIXTURES.md F5.
MICRO_CORPUS = [
    ["wireless", "headphones", "bluetooth"],
    ["yellow", "cat", "socks", "soft"],
    ["gaming", "keyboard", "mechanical"],
]
MICRO_KEYS = ["SKU001", "SKU002", "SKU003"]


@pytest.fixture(scope="session")
def small_index(spark, small_pages, tmp_path_factory):
    """Index over the 1000-page corpus, built once per test session."""
    from review_recommender_spark.config import EngineConfig, bm25_north
    from review_recommender_spark.index.build import build_index
    from review_recommender_spark.index.tableio import TableIO
    import dataclasses

    root = str(tmp_path_factory.mktemp("index_small"))
    cfg = EngineConfig(bm25=bm25_north())
    # small ranges so range-pruning paths actually see many ranges
    cfg = dataclasses.replace(
        cfg, index=dataclasses.replace(cfg.index, range_shift=6,
                                       term_buckets=8))
    io = TableIO(root)
    idx = build_index(spark, small_pages, io, cfg, n_chunks=2)
    return idx
