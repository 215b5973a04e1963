#!/usr/bin/env python
"""Two-parallelism scaling evidence for the north rule.

Runs the identical pipeline job on the identical input at local[N] and
local[4N] (fresh subprocess per level — separate JVMs, no cache sharing),
reports turns/sec at both plus efficiency = (tps_4N / tps_N) / 4, and writes
BENCH/BASELINE.md. In a real deployment N / 4N are executor counts; in this
single-host sandbox they are core counts, which exercises the same
partitioning/shuffle scaling path (BASELINE.md sandbox realization).

Usage: python scripts/scaling_bench.py [--sf 1.0] [--n 8] [--runs 2]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, shutil, sys, time
sf, cpus, out_root = float(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
sys.path.insert(0, {repo!r})
from openlogparse_spark.session import get_spark
from openlogparse_spark.pipeline import PipelineConfig, run_pipeline
from openlogparse_spark.fixtures.transcripts import fixture_dir
import os
fx = fixture_dir(sf, base=os.path.join({repo!r}, 'data', 'bench'))
spark = get_spark('scaling', master=f'local[{{cpus}}]')
spark.range(1000).count()   # exclude JVM warmup from the measurement
shutil.rmtree(out_root, ignore_errors=True)
t0 = time.time()
cfg = PipelineConfig(input_path=os.path.join(fx, 'transcripts.parquet'),
                     dims_dir=fx, output_root=out_root, run_id=f'scale{{cpus}}')
run_pipeline(spark, cfg)
wall = time.time() - t0
n = spark.read.parquet(os.path.join(fx, 'transcripts.parquet')).count()
print(json.dumps({{'cpus': cpus, 'wall': wall, 'turns': n,
                   'tps': n / wall}}))
spark.stop()
"""


def run_level(sf: float, cpus: int, runs: int) -> dict:
    best = None
    for i in range(runs):
        out_root = os.path.join(REPO, "data", "bench", f"scale_out_{cpus}")
        p = subprocess.run(
            [sys.executable, "-c", CHILD.format(repo=REPO), str(sf), str(cpus), out_root],
            capture_output=True, text=True, timeout=3600,
        )
        line = [l for l in p.stdout.splitlines() if l.startswith("{")][-1]
        r = json.loads(line)
        if best is None or r["tps"] > best["tps"]:
            best = r
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    # materialize the input once, outside the timed runs
    from openlogparse_spark.fixtures.transcripts import fixture_dir, write_fixtures

    fx = fixture_dir(args.sf, base=os.path.join(REPO, "data", "bench"))
    if not os.path.exists(os.path.join(fx, "transcripts.parquet")):
        sys.path.insert(0, REPO)
        write_fixtures(args.sf, base=os.path.join(REPO, "data", "bench"))

    lo = run_level(args.sf, args.n, args.runs)
    hi = run_level(args.sf, args.n * 4, args.runs)
    eff = (hi["tps"] / lo["tps"]) / 4.0
    result = {
        "sf": args.sf, "turns": lo["turns"],
        "n_cores": args.n, "tps_n": round(lo["tps"], 1), "wall_n": round(lo["wall"], 1),
        "n4_cores": args.n * 4, "tps_4n": round(hi["tps"], 1), "wall_4n": round(hi["wall"], 1),
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(result))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(f"""# BENCH/BASELINE — scaling evidence (north rule)

Same job (full parse → enrich → route → aggregate pipeline), same input
({result['turns']:,} turns, synthetic transcripts sf{args.sf}, seed=42),
two parallelism levels, separate JVMs, best of {args.runs} runs each.

| parallelism | wall (s) | throughput (turns/sec) |
|---|---|---|
| local[{args.n}] (N) | {result['wall_n']} | {result['tps_n']:,} |
| local[{args.n * 4}] (4N) | {result['wall_4n']} | {result['tps_4n']:,} |

**Scaling efficiency = (tps_4N / tps_N) / 4 = {result['scaling_efficiency']}**
(target ≥ 0.8 per BASELINE.json; sandbox realization of the N vs 4N
executor-cluster criterion — see BASELINE.md "Our baseline targets").

Measurement notes: fixture generation and Spark session startup excluded;
the timed region is the pipeline itself (all four stages + sink commits +
manifest records). Raw JSON: `{json.dumps(result)}`
""")
    print("wrote BENCH/BASELINE.md")


if __name__ == "__main__":
    main()
