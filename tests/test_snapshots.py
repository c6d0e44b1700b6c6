"""Snapshot-manifest hygiene: the parent-chain walk and expiry utility
(the Iceberg expireSnapshots analogue for the manifest layer — round-2
VERDICT 'what's missing' #5)."""

import pandas as pd

from review_recommender_spark.index.tableio import TableIO


def _write_n(spark, io, n):
    df = spark.createDataFrame(pd.DataFrame({"x": [1, 2, 3]}))
    ids = []
    for i in range(n):
        ids.append(io.write(df, "t", lineage={"rev": i}))
    return ids


def test_snapshot_chain_order(spark, tmp_path):
    io = TableIO(str(tmp_path))
    ids = _write_n(spark, io, 4)
    chain = io.snapshots("t")
    assert [m["snapshot_id"] for m in chain] == ids
    assert chain[0]["parent_snapshot_id"] is None
    for prev, cur in zip(chain, chain[1:]):
        assert cur["parent_snapshot_id"] == prev["snapshot_id"]


def test_expire_snapshots_keeps_recent_rereads_current(spark, tmp_path):
    io = TableIO(str(tmp_path))
    ids = _write_n(spark, io, 6)
    removed = io.expire_snapshots("t", keep_last=2)
    assert removed == 4
    chain = io.snapshots("t")
    assert [m["snapshot_id"] for m in chain] == ids[-2:]
    # oldest kept manifest was re-rooted
    assert chain[0]["parent_snapshot_id"] is None
    # current pointer still resolves and the table still reads
    assert io.current_snapshot("t")["snapshot_id"] == ids[-1]
    assert io.read(spark, "t").count() == 3
    # idempotent
    assert io.expire_snapshots("t", keep_last=2) == 0


def test_expire_snapshots_rejects_keep_last_zero(spark, tmp_path):
    """keep_last=0 would delete every manifest while _current.json still
    points at one (and chain[-0:] is the whole chain) — must be rejected
    up front, not half-executed."""
    from review_recommender_spark.index.tableio import TableIO
    import pytest
    io = TableIO(str(tmp_path))
    df = spark.range(3).toDF("x")
    io.write(df, "t")
    with pytest.raises(ValueError, match="keep_last"):
        io.expire_snapshots("t", keep_last=0)
    assert io.current_snapshot("t") is not None
    assert len(io.snapshots("t")) == 1
