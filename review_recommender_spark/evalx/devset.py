"""Dev-set (relevance judgments) loading — the reference's JSONL upload
path (app/app_product_search.py:436,458-459):
one JSON object per line, ``{"query": "...", "relevant": ["id1", ...]}``.

Loaded distributed via spark.read.json with an explicit schema (never
inferSchema) and handed to the evaluator as GoldenQuery records."""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .golden import GoldenQuery

DEVSET_SCHEMA = "query string, relevant array<string>"


def load_devset_jsonl(spark: SparkSession, path: str) -> list[GoldenQuery]:
    rows = (spark.read.schema(DEVSET_SCHEMA).json(path)
            .filter(F.col("query").isNotNull())
            .collect())
    out = []
    for qid, r in enumerate(rows):
        rel = frozenset(int(x) if str(x).lstrip("-").isdigit() else x
                        for x in (r["relevant"] or []))
        out.append(GoldenQuery(qid=qid, query=r["query"], relevant=rel))
    return out


def write_devset_jsonl(queries: list[GoldenQuery], path: str) -> None:
    import json
    with open(path, "w") as f:
        for q in queries:
            f.write(json.dumps({"query": q.query,
                                "relevant": sorted(map(str, q.relevant))})
                    + "\n")
