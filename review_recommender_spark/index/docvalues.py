"""Doc-values: an id-sorted per-document metadata sidecar of the index.

The columnar analogue of Lucene's doc values / stored fields: a narrow
table ``(doc_id, <metadata cols>)`` materialized NEXT TO the index,
range-partitioned and sorted by ``doc_id`` so parquet file/row-group
min-max statistics turn every doc_id point or range predicate into file
skipping. The reference app re-reads its corpus pickle for result
metadata (app/test.py:74-78); at 10^12 docs the corpus table is petabytes
and result rendering cannot touch it — this sidecar is the serving-sized
replacement.

What it serves:

  * **Result rendering** (``fetch_doc_values``): the top-k page needs
    display fields for k ≈ 10 docs — an IN-list pushdown against the
    sorted sidecar reads O(k) row groups, not a corpus scan.
  * **Facets / filters** (``query/facets.py``): the facet panel's
    metadata join reads 2 narrow columns from the sidecar instead of the
    corpus parquet (column pruning alone leaves the corpus' row-group
    footprint; the sidecar's is ~avgdl× smaller by construction).
  * **Boost columns**: ``bm25_topk_exact(boost_docs=...)`` takes any
    (doc_id, boost) frame; a sidecar column scan is the cheap source.

Size/scale: one row per document, a handful of scalar columns — the
same order as ``doc_stats`` (which the build already maintains), i.e.
~10^12 rows ≈ low-TB at web scale, partitioned into
``n_docs >> range_shift`` sorted files. Point lookups prune to single
files; the build is one range-partitioned sort of a column-pruned
corpus projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .build import InvertedIndex
from .tableio import TableIO

DOC_VALUES = "doc_values"


def build_doc_values(spark: SparkSession, index: InvertedIndex,
                     docs: DataFrame, cols: list[str],
                     doc_id_col: str = "doc_id") -> None:
    """Materialize the sidecar: ``docs``'s ``cols`` projected, range-
    partitioned and sorted by doc_id (parquet min/max stats → file
    skipping for any doc_id predicate). One partition per
    ``2**range_shift`` docs to mirror the serving layout's granularity,
    bounded below for small corpora. Idempotent per snapshot
    (overwrite)."""
    if not cols:
        raise ValueError("cols must be non-empty")
    proj = docs.select(F.col(doc_id_col).cast("long").alias("doc_id"),
                      *cols)
    n_parts = max(4, index.n_docs >> index.cfg.index.range_shift)
    ordered = (proj.repartitionByRange(n_parts, F.col("doc_id"))
               .sortWithinPartitions("doc_id"))
    index.io.write(ordered, DOC_VALUES,
                   lineage={"derived_from": "corpus", "cols": cols})


def doc_values(spark: SparkSession, index: InvertedIndex) -> DataFrame:
    """The sidecar scan (column-prune further with .select as needed)."""
    return index.io.read(spark, DOC_VALUES)


def fetch_doc_values(spark: SparkSession, index: InvertedIndex,
                     doc_ids, cols: list[str] | None = None) -> DataFrame:
    """Point-fetch metadata for a result page: ``doc_ids`` (iterable of
    ints, driver-sized — a top-k, not a match set) becomes an IN-list
    predicate pushed to the sorted sidecar scan, so only the files whose
    [min, max] doc_id stats cover a requested id are read — O(k) row
    groups at any corpus size. For match-set-sized joins use
    ``doc_values`` + a join instead."""
    ids = sorted({int(d) for d in doc_ids})
    dv = doc_values(spark, index)
    if cols is not None:
        dv = dv.select("doc_id", *cols)
    if not ids:
        return dv.limit(0)
    return dv.filter(F.col("doc_id").isin(ids))
