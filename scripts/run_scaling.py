"""Scaling-efficiency evidence: run bench.py's build phase at two
parallelism levels (local[8] vs local[32]) in separate processes (a Spark
local-mode JVM pins its core count at startup) and write BENCH/BASELINE.md.

eff = (docs_per_sec@32 / docs_per_sec@8) / 4 ; gate eff ≥ 0.8
(sandbox stand-in for the N → 4N executor criterion).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(cpus: int, n_docs: int, phases: str) -> dict:
    env = dict(os.environ,
               SPARK_GRAFT_CPUS=str(cpus),
               SPARK_GRAFT_BENCH_DOCS=str(n_docs),
               SPARK_GRAFT_BENCH_PHASES=phases)
    out = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                         capture_output=True, text=True, env=env, timeout=1800)
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main() -> None:
    n_docs = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "240000"))
    lo_cores, hi_cores = 8, 32
    lo = run_bench(lo_cores, n_docs, "build,bm25")
    hi = run_bench(hi_cores, n_docs, "build,bm25")
    tput_lo = lo["index_docs_per_sec"]
    tput_hi = hi["index_docs_per_sec"]
    eff = (tput_hi / tput_lo) / (hi_cores / lo_cores)

    md = f"""# BENCH/BASELINE — measured engine numbers

Corpus: deterministic synthetic Common-Crawl-style pages
(corpus/pages.py, seed=42), {n_docs:,} documents. Single machine,
Spark local mode; the two parallelism levels stand in for N vs 4N
executors per the sandbox evidence protocol (BASELINE.md §3).

## Index-build throughput & scaling efficiency

| parallelism | build sec | docs/sec | BM25 p50 | BM25 p95 |
|---|---|---|---|---|
| local[{lo_cores}] | {lo['queries']['index_build']} | {tput_lo:,.0f} | {lo.get('bm25_p50_sec')} | {lo.get('bm25_p95_sec')} |
| local[{hi_cores}] | {hi['queries']['index_build']} | {tput_hi:,.0f} | {hi.get('bm25_p50_sec')} | {hi.get('bm25_p95_sec')} |

**Scaling efficiency ({lo_cores} → {hi_cores} cores, 4×):**
eff = ({tput_hi:,.0f} / {tput_lo:,.0f}) / 4 = **{eff:.3f}**
(gate: ≥ 0.8 → {"PASS" if eff >= 0.8 else "FAIL"})

## Query latency (block-max-pruned BM25 top-10, warm index, local[{hi_cores}])

p50 = {hi.get('bm25_p50_sec')} s, p95 = {hi.get('bm25_p95_sec')} s over the
10 golden queries (evalx/golden.py). Rank-identity of every result vs the
BM25Okapi-formula oracle is enforced by `python -m pytest -x -q`
(tests/test_bm25_parity.py, tests/test_wand.py).

## Raw bench JSON

```json
{json.dumps(lo)}
{json.dumps(hi)}
```
"""
    out_path = os.path.join(REPO, "BENCH", "BASELINE.md")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        f.write(md)
    print(md)
    print(f"wrote {out_path}; eff={eff:.3f}")


if __name__ == "__main__":
    main()
