#!/usr/bin/env python
"""Two-parallelism scaling evidence for the north rule.

Runs the identical pipeline job on the identical input with N executors and
4N executors — `local-cluster[N,2,16384]`: real separate executor JVMs with
2 cores / 16 GB each, a socket shuffle between them, and per-executor python
workers, i.e. the same topology as an N-node cluster, just co-hosted.
Fresh subprocess per level (no cache sharing); reports turns/sec at both
plus efficiency = (tps_4N / tps_N) / 4; writes BENCH/BASELINE.md.

Usage: python scripts/scaling_bench.py [--sf 2.0] [--n 1] [--runs 2]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CHILD = r"""
import json, shutil, sys, time
sf, n_exec, out_root = float(sys.argv[1]), int(sys.argv[2]), sys.argv[3]  # n_exec executors, 2 cores each
sys.path.insert(0, {repo!r})
from openlogparse_spark.session import get_spark
from openlogparse_spark.pipeline import PipelineConfig, run_pipeline
from openlogparse_spark.fixtures.transcripts import fixture_dir
import os
fx = fixture_dir(sf, base=os.path.join({repo!r}, 'data', 'bench'))
spark = get_spark('scaling', master=f'local-cluster[{{n_exec}},2,16384]', shuffle_partitions=32)
spark.range(1000).count()   # exclude JVM warmup from the measurement
shutil.rmtree(out_root, ignore_errors=True)
t0 = time.time()
# the north-rule metric is end-to-end PARSE -> ENRICH -> ROUTE throughput
# (all sink commits + manifest records inside the timed region); aggregates
# are benched separately (bench.py runs the full pipeline).
# materialize_enriched=False: one-shot run — the wide enriched table is kept
# as a cached plan over the masked view instead of a full parquet
# write+read (staging it is a resume feature, not part of the product).
cfg = PipelineConfig(input_path=os.path.join(fx, 'transcripts.parquet'),
                     dims_dir=fx, output_root=out_root, run_id=f'scale{{n_exec}}',
                     stages=('parse', 'enrich', 'route'),
                     materialize_enriched=False)
res = run_pipeline(spark, cfg)
wall = time.time() - t0
n = spark.read.parquet(os.path.join(fx, 'transcripts.parquet')).count()
print(json.dumps({{'cpus': n_exec, 'wall': wall, 'turns': n,
                   'tps': n / wall, 'timings': res.timings}}))
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
        if not any(l.startswith("{") for l in p.stdout.splitlines()):
            sys.stderr.write(p.stdout[-2000:] + "\n" + p.stderr[-4000:])
            raise RuntimeError(f"child failed (cpus={cpus})")
        line = [l for l in p.stdout.splitlines() if l.startswith("{")][-1]
        r = json.loads(line)
        if best is None or r["tps"] > best["tps"]:
            best = r
        sys.stderr.write(f"  level cpus={cpus} run{i}: {json.dumps(r)}\n")
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=2.0)
    ap.add_argument("--n", type=int, default=1)
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
        "n_executors": args.n, "tps_n": round(lo["tps"], 1), "wall_n": round(lo["wall"], 1),
        "n4_executors": args.n * 4, "tps_4n": round(hi["tps"], 1), "wall_4n": round(hi["wall"], 1),
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(result))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(f"""# BENCH/BASELINE — scaling evidence (north rule)

Same job (the north-rule metric: end-to-end parse → enrich → route,
including all sink commits + manifest records), same input
({result['turns']:,} turns, synthetic transcripts sf{args.sf}, seed=42),
two executor counts (local-cluster: one JVM per executor, 2 cores / 16 GB
each, socket shuffle — an N-node cluster co-hosted), best of {args.runs}
runs each.

| executors | wall (s) | throughput (turns/sec) |
|---|---|---|
| {args.n} executor(s) = local-cluster[{args.n},2,16384] (N) | {result['wall_n']} | {result['tps_n']:,} |
| {args.n * 4} executors = local-cluster[{args.n * 4},2,16384] (4N) | {result['wall_4n']} | {result['tps_4n']:,} |

**Scaling efficiency = (tps_4N / tps_N) / 4 = {result['scaling_efficiency']}**
(target ≥ 0.8 per BASELINE.json; sandbox realization of the N vs 4N
executor-cluster criterion — see BASELINE.md "Our baseline targets").

Measurement notes: fixture generation and Spark session startup excluded;
the timed region is the parse → enrich → route pipeline including every
sink commit + manifest record (one-shot mode: the enriched view is cached,
not staged to parquet — staging is a resume feature). Raw JSON:
`{json.dumps(result)}`
""")
    print("wrote BENCH/BASELINE.md")


if __name__ == "__main__":
    main()
