"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry AND its ``oracle_sql()`` on the same sf dir, compare
row count, schema (column names), and a canonical value hash (columns
sorted by name, rows sorted by all columns, floats rounded).

Usage: python scripts/check_oracles.py [sf_dir] [only_entry ...]
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(pdf: pd.DataFrame) -> tuple[str, list[str]]:
    cols = sorted(pdf.columns)
    pdf = pdf[cols].copy()
    for c in cols:
        if pdf[c].dtype.kind == "f":
            pdf[c] = pdf[c].round(6)
        elif pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
    pdf = pdf.sort_values(cols, kind="mergesort").reset_index(drop=True)
    payload = pdf.to_csv(index=False, float_format="%.6f").encode()
    return hashlib.sha256(payload).hexdigest(), cols


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    # the hybrid oracle computes its VALUES literal from this env var
    # (default sf0.01) — it MUST match the sf dir the Spark queries run
    # on, or the comparison is Spark@sf_dir vs oracle@other-sf: a
    # guaranteed false MISMATCH on any non-default scale factor
    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = sf_dir

    import __spark_entry__ as E
    from review_recommender_spark.session import get_spark
    spark = get_spark("oracle-check", cores=8, shuffle_partitions=8)

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = E.queries()
    oracles = E.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            spdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"{name:28s} SPARK-ERROR {exc}")
            failures += 1
            continue
        if name not in oracles:
            print(f"{name:28s} rows-only ({len(spdf)} rows)")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as exc:  # noqa: BLE001
            print(f"{name:28s} ORACLE-ERROR {exc}")
            failures += 1
            continue
        sh, scols = canon(spdf)
        oh, ocols = canon(odf)
        ok = (len(spdf) == len(odf)) and scols == ocols and sh == oh
        status = "OK" if ok else "MISMATCH"
        if not ok:
            failures += 1
            detail = (f" rows {len(spdf)}/{len(odf)} cols {scols}/{ocols} "
                      f"hash {'=' if sh == oh else '!='}")
        else:
            detail = f" ({len(spdf)} rows)"
        print(f"{name:28s} {status}{detail}")
    print(json.dumps({"failures": failures}))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
