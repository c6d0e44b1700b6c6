"""Physical-plan quality gates: partition pruning, filter pushdown, and
broadcast joins must actually appear in the optimized plans — the
properties that make the design hold at 100 TB."""

import io
import re

import pytest
from pyspark.sql import functions as F

from review_recommender_spark.query.bm25 import (_query_blocks,
                                                 bm25_topk_exact, weights_df)


def _plan(df, mode="formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode)


def test_postings_scan_partition_pruned(spark, small_index):
    """Querying 2 terms must prune postings directories by term_bucket and
    push the term filter into the parquet scan."""
    blocks = _query_blocks(spark, small_index, ["wireless", "sound"])
    plan = _plan(blocks)
    assert "PartitionFilters" in plan
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "term_bucket" in m.group(1), plan
    pushed = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert pushed and "term" in pushed.group(1), plan


def test_postings_scan_reads_no_dead_columns(spark, small_index):
    """Column pruning: a df-only projection must not read posting bytes."""
    df = (small_index.postings(spark)
          .filter(F.col("term") == "wireless")
          .select("term", "n"))
    plan = _plan(df)
    m = re.search(r"ReadSchema: ([^\n]*)", plan)
    assert m and "doc_bytes" not in m.group(1), plan


def test_weights_join_is_broadcast(spark, small_index):
    plan = _plan(weights_df(spark, small_index,
                            ["wireless sound", "yellow cat"]))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan, plan


def test_topk_is_take_ordered(spark, small_index):
    """orderBy + limit must plan TakeOrderedAndProject (distributed partial
    top-k), never a global sort."""
    df = bm25_topk_exact(spark, small_index, "wireless sound quality", k=10)
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan, plan


def test_term_stats_scan_partition_pruned(spark, small_index):
    stats = (small_index.term_stats(spark)
             .filter((F.col("term_bucket") == 3)
                     & (F.col("term") == "wireless")))
    plan = _plan(stats)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "term_bucket" in m.group(1), plan


def test_docs_filter_pushdown(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    df = docs.filter(F.col("doc_id") < 100).select("doc_id", "n_chars")
    plan = _plan(df)
    pushed = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert pushed and "doc_id" in pushed.group(1), plan
    m = re.search(r"ReadSchema: ([^\n]*)", plan)
    assert m and "text" not in m.group(1), plan
