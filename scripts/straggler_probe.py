#!/usr/bin/env python
"""Verify WHERE the 4N legs' straggler time lives: data skew vs executor.

Runs one scaling-bench leg (same topology/config as scripts/scaling_bench.py)
with the Spark event log enabled, then parses SparkListenerTaskEnd events and
reports, for each stage with meaningful work, per-EXECUTOR task-duration
stats. If equal-sized tasks run several times slower on one executor JVM
while its peers are healthy, the tail is executor-localized (host
timeslicing / a cold JIT in that JVM) — the mitigation is speculative
execution, not repartitioning. If instead the slow tasks are the ones with
more input bytes/records, it is data skew and speculation would only mask it.

Usage: python scripts/straggler_probe.py [--sf 2.0] [--n 4] [--cores 2]
       [--speculation]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import subprocess
import sys
import time
from collections import defaultdict
from statistics import median

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CHILD = r"""
import json, os, shutil, sys, time
sf, n_exec, cores, evdir, spec = (float(sys.argv[1]), int(sys.argv[2]),
                                  int(sys.argv[3]), sys.argv[4],
                                  sys.argv[5] == '1')
sys.path.insert(0, {repo!r})
os.environ.setdefault('SPARK_GRAFT_MAX_PARTITION_BYTES', str(8 * 1024 * 1024))
from openlogparse_spark.session import get_spark
from openlogparse_spark.pipeline import PipelineConfig, run_pipeline
from openlogparse_spark.fixtures.transcripts import fixture_dir
fx = fixture_dir(sf, base=os.path.join({repo!r}, 'data', 'bench'))
conf = {{'spark.eventLog.enabled': 'true', 'spark.eventLog.dir': evdir,
         'spark.eventLog.compress': 'false'}}
if spec:
    conf.update({{'spark.speculation': 'true',
                  'spark.speculation.multiplier': '1.5',
                  'spark.speculation.quantile': '0.75'}})
spark = get_spark('straggler_probe',
                  master=f'local-cluster[{{n_exec}},{{cores}},16384]',
                  shuffle_partitions=64, extra_conf=conf)
warm_fx = fixture_dir(0.01, base=os.path.join({repo!r}, 'data', 'bench'))
out_root = evdir + '_out'
# warm exactly like scaling_bench so the probe sees steady-state stages
for tag in ('w1', 'w2'):
    shutil.rmtree(out_root, ignore_errors=True)
    run_pipeline(spark, PipelineConfig(
        input_path=os.path.join(warm_fx, 'transcripts.parquet'),
        dims_dir=warm_fx, output_root=out_root, run_id=tag,
        stages=('parse', 'enrich', 'route'), materialize_enriched=False))
shutil.rmtree(out_root, ignore_errors=True)
t0 = time.time()
run_pipeline(spark, PipelineConfig(
    input_path=os.path.join(fx, 'transcripts.parquet'), dims_dir=fx,
    output_root=out_root, run_id='probe',
    stages=('parse', 'enrich', 'route'), materialize_enriched=False))
wall = time.time() - t0
shutil.rmtree(out_root, ignore_errors=True)
print(json.dumps({{'wall': round(wall, 2)}}))
spark.stop()
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=2.0)
    ap.add_argument("--n", type=int, default=4)
    ap.add_argument("--cores", type=int, default=2)
    ap.add_argument("--speculation", action="store_true")
    args = ap.parse_args()

    from openlogparse_spark.fixtures.transcripts import ensure_fixtures
    for sf in (args.sf, 0.01):
        ensure_fixtures(sf, base=os.path.join(REPO, "data", "bench"))

    evdir = "/tmp/straggler_evlog"
    shutil.rmtree(evdir, ignore_errors=True)
    os.makedirs(evdir)
    p = subprocess.run(
        [sys.executable, "-c", CHILD.format(repo=REPO), str(args.sf),
         str(args.n), str(args.cores), evdir,
         "1" if args.speculation else "0"],
        capture_output=True, text=True, timeout=1800)
    lines = [l for l in p.stdout.splitlines() if l.startswith("{")]
    if not lines:
        sys.stderr.write(p.stdout[-2000:] + "\n" + p.stderr[-4000:])
        raise RuntimeError("probe child failed")
    wall = json.loads(lines[-1])["wall"]
    print(f"leg wall: {wall}s (speculation={'on' if args.speculation else 'off'})")

    # stage_id -> executor -> [(duration_s, records, bytes, speculative)]
    stages: dict[int, dict[str, list]] = defaultdict(lambda: defaultdict(list))
    stage_names: dict[int, str] = {}
    t_probe_start = None
    # Spark 4 rolling event logs are DIRECTORIES (eventlog_v2_<app>/events_*)
    paths = [p for p in glob.glob(os.path.join(evdir, "**"), recursive=True)
             if os.path.isfile(p) and "appstatus" not in os.path.basename(p)]
    for path in paths:
        with open(path) as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                et = ev.get("Event")
                if et == "SparkListenerJobStart":
                    # the timed probe run is the LAST group of jobs; we keep
                    # everything and filter by stage size below instead
                    pass
                elif et == "SparkListenerStageSubmitted":
                    si = ev["Stage Info"]
                    stage_names[si["Stage ID"]] = si.get("Stage Name", "?")
                elif et == "SparkListenerTaskEnd":
                    ti = ev["Task Info"]
                    tm = ev.get("Task Metrics") or {}
                    dur = (ti["Finish Time"] - ti["Launch Time"]) / 1000.0
                    inm = tm.get("Input Metrics") or {}
                    sr = tm.get("Shuffle Read Metrics") or {}
                    recs = (inm.get("Records Read") or 0) + (
                        sr.get("Total Records Read") or 0)
                    byts = (inm.get("Bytes Read") or 0) + (
                        (sr.get("Local Bytes Read") or 0)
                        + (sr.get("Remote Bytes Read") or 0))
                    stages[ev["Stage ID"]][ti["Executor ID"]].append(
                        (dur, recs, byts, ti.get("Speculative", False)))

    # report: stages whose total task time > 5% of the biggest stage
    totals = {sid: sum(d for ex in m.values() for d, *_ in ex)
              for sid, m in stages.items()}
    big = max(totals.values())
    print(f"\n{'stage':>6} {'executor':>9} {'tasks':>6} {'med_s':>7} "
          f"{'max_s':>7} {'med_rec':>9} {'med_MB':>7}")
    findings = []
    for sid in sorted(stages, key=lambda s: -totals[s]):
        if totals[sid] < 0.05 * big:
            continue
        name = stage_names.get(sid, "?").split("\n")[0][:60]
        print(f"-- stage {sid}: {name} (total task-sec {totals[sid]:.1f})")
        per_ex = {}
        for ex in sorted(stages[sid]):
            rows = stages[sid][ex]
            durs = sorted(d for d, *_ in rows)
            med_d = median(durs)
            med_r = median(r for _, r, _, _ in rows)
            med_b = median(b for _, _, b, _ in rows) / 1e6
            n_spec = sum(1 for *_, s in rows if s)
            per_ex[ex] = med_d
            print(f"{sid:>6} {ex:>9} {len(rows):>6} {med_d:>7.2f} "
                  f"{max(durs):>7.2f} {med_r:>9.0f} {med_b:>7.1f}"
                  + (f"  ({n_spec} speculative)" if n_spec else ""))
        if len(per_ex) > 1:
            ratio = max(per_ex.values()) / max(min(per_ex.values()), 1e-9)
            findings.append((sid, ratio))
            print(f"       executor median-duration spread: {ratio:.2f}x")
    print("\nsummary: per-stage executor median-task-duration spread "
          "(>2x with equal med_rec/med_MB = executor-localized):")
    for sid, ratio in findings:
        print(f"  stage {sid}: {ratio:.2f}x")


if __name__ == "__main__":
    main()
