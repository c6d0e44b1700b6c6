"""Corpus-scalar paths of the index build.

build_index computes n_docs / total_tokens / avgdl / avg_idf via driver-side
pyarrow footer+column reads while the pulled column is driver-sized
(cfg.index.driver_pull_max_*), else via a Spark aggregate. Both paths must
agree exactly — and the strict footer read must FAIL LOUDLY rather than
silently feed n_docs=0 into idf/avgdl (ADVICE round 2)."""

import dataclasses

import pytest

from review_recommender_spark.config import EngineConfig, bm25_north
from review_recommender_spark.index.build import build_index
from review_recommender_spark.index.tableio import (TableIO,
                                                    parquet_row_count,
                                                    parquet_row_count_strict)


def _cfg(**index_overrides):
    cfg = EngineConfig(bm25=bm25_north())
    return dataclasses.replace(
        cfg, index=dataclasses.replace(cfg.index, **index_overrides))


def test_spark_agg_fallback_agrees_with_driver_pull(spark, small_pages,
                                                    tmp_path):
    fast = build_index(spark, small_pages, TableIO(str(tmp_path / "a")),
                       _cfg())
    slow = build_index(spark, small_pages, TableIO(str(tmp_path / "b")),
                       _cfg(driver_pull_max_docs=0, driver_pull_max_terms=0))
    assert slow.n_docs == fast.n_docs
    assert slow.vocab_size == fast.vocab_size
    assert slow.avgdl == pytest.approx(fast.avgdl, abs=1e-12)
    # avg_idf feeds the ε-fixup → compare resulting idf values exactly
    fi = {r["term"]: r["idf"]
          for r in fast.term_stats(spark).select("term", "idf").collect()}
    si = {r["term"]: r["idf"]
          for r in slow.term_stats(spark).select("term", "idf").collect()}
    assert set(fi) == set(si)
    for t in fi:
        assert si[t] == pytest.approx(fi[t], rel=1e-12), t


def test_strict_row_count_raises_on_missing_path(tmp_path):
    missing = str(tmp_path / "nope")
    with pytest.raises(Exception):
        parquet_row_count_strict(missing)
    # the lenient metrics variant keeps returning 0
    assert parquet_row_count(missing) == 0
