"""Package the engine for ``spark-submit --py-files`` (north-rule runtime).

Builds dist/engine.zip containing the review_recommender_spark package and
(optionally) smoke-tests it through a real spark-submit in local mode with
an isolated PYTHONPATH, proving the zip is self-contained.

  python scripts/package.py            # build zip
  python scripts/package.py --smoke    # build + spark-submit smoke test
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "review_recommender_spark"

SMOKE_JOB = '''
import json
import sys
from review_recommender_spark.session import get_spark
from review_recommender_spark.corpus.pages import pages_df
from review_recommender_spark.config import EngineConfig, bm25_north
from review_recommender_spark.index.build import build_index
from review_recommender_spark.index.tableio import TableIO
from review_recommender_spark.query.bm25 import bm25_topk_exact
import tempfile

spark = get_spark("submit-smoke", cores=4)
idx = build_index(spark, pages_df(spark, 500),
                  TableIO(tempfile.mkdtemp()), EngineConfig(bm25=bm25_north()))
rows = bm25_topk_exact(spark, idx, "wireless bluetooth headphones",
                       k=5).collect()
assert len(rows) == 5 and rows[0]["score"] > 0, rows
# float hex → the in-process comparison in tests/test_submit.py is BITWISE
print("SUBMIT_SMOKE_OK "
      + json.dumps([[r["doc_id"], r["score"].hex()] for r in rows]))
spark.stop()
'''


def build_zip(out: str | None = None) -> str:
    out = out or os.path.join(REPO, "dist", "engine.zip")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(os.path.join(REPO, PKG)):
            for f in files:
                if f.endswith(".pyc") or "__pycache__" in root:
                    continue
                full = os.path.join(root, f)
                zf.write(full, os.path.relpath(full, REPO))
    return out


def smoke(zip_path: str) -> list[tuple[int, float]]:
    """Run the smoke job through a REAL ``spark-submit --master local[4]
    --py-files <zip>`` from a neutral cwd with no repo PYTHONPATH (only
    the zip provides the package) and return the top-k it printed as
    [(doc_id, score)] — the deployment path the north rule names,
    bitwise-compared to in-process results in tests/test_submit.py."""
    import json
    with tempfile.TemporaryDirectory() as td:
        job = os.path.join(td, "job.py")
        with open(job, "w") as f:
            f.write(SMOKE_JOB)
        env = dict(os.environ)
        env.pop("PYTHONPATH", None)
        res = subprocess.run(
            ["spark-submit", "--master", "local[4]", "--py-files", zip_path,
             job],
            capture_output=True, text=True, cwd=td, env=env, timeout=600)
        marker = [ln for ln in res.stdout.splitlines()
                  if ln.startswith("SUBMIT_SMOKE_OK ")]
        if not marker:
            sys.stderr.write(res.stderr[-3000:])
            raise SystemExit("spark-submit smoke FAILED")
        rows = json.loads(marker[0][len("SUBMIT_SMOKE_OK "):])
        print("spark-submit --py-files smoke: PASS")
        return [(int(d), float.fromhex(s)) for d, s in rows]


if __name__ == "__main__":
    path = build_zip()
    print(f"built {path} ({os.path.getsize(path) // 1024} KiB)")
    if "--smoke" in sys.argv:
        smoke(path)
