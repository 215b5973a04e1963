"""Deterministic synthetic transcripts + dimension + route fixtures.

Implements FIXTURES.md: a transcripts table with exactly the BASELINE.json
input-hint shape ``(conv_id string, turn_idx int, role string, text string,
tool string, ts timestamp)``, seed-deterministic (seed=42), scaled by a row
count, with:
  - hot-key skew (1% Zipf conversations + one conversation holding ~2% of rows)
    to exercise the salted router (SURVEY.md §4 "skew handling");
  - ~0.5% corrupted rows for the quarantine path (ref: unknown-opcode warning,
    /root/reference/src/parser/Parser.cpp:476-478);
  - ~0.3% rows split across two turns with a trailing ``\\`` continuation
    marker (row-piece merge analogue: FB_P/FB_N chained rows,
    /root/reference/src/builder/Builder.h:238-284);
  - shuffled row order on write, so stable ``(conv_id, turn_idx)`` ordering
    must be re-established by the pipeline (LWN heap-sort analogue,
    /root/reference/src/parser/Parser.cpp:1384-1469).

The generator is pure numpy/pandas (no Spark) so tests and DuckDB oracles can
use the same bytes.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from openlogparse_spark.parse.templates import NOTE_SENTENCES, TEMPLATES

SEED = 42
# bump when the generator's output changes (new params/templates): stale
# on-disk fixtures from an older generator are silently wrong for DuckDB
# oracles that recompute from the same parquet, so ensure_fixtures()
# regenerates on mismatch
FIXTURE_VERSION = 3
EPOCH_2026 = pd.Timestamp("2026-01-01", tz=None).value // 10**9  # UTC seconds

TOOLS = [
    "bash", "read", "write", "edit", "grep", "glob",
    "web_fetch", "web_search", "sql", "python", "browser", "mail",
]
TOOL_CATEGORY = {
    "bash": "shell", "read": "fs", "write": "fs", "edit": "fs", "grep": "fs",
    "glob": "fs", "web_fetch": "net", "web_search": "net", "sql": "data",
    "python": "data", "browser": "ui", "mail": "net",
}
TOOL_RISK = {
    "bash": "high", "read": "low", "write": "medium", "edit": "medium",
    "grep": "low", "glob": "low", "web_fetch": "medium", "web_search": "low",
    "sql": "medium", "python": "high", "browser": "high", "mail": "high",
}
TOOL_SIDE_EFFECTS = {
    "bash": True, "read": False, "write": True, "edit": True, "grep": False,
    "glob": False, "web_fetch": False, "web_search": False, "sql": True,
    "python": True, "browser": True, "mail": True,
}
UNKNOWN_TOOL = "oracle9"  # 0.2% of tool turns reference it (left-join null path)


def _letters(i: int) -> str:
    """Unique all-letter token for row i (no digits, no '=' — stays unmasked)."""
    out = []
    i += 1
    while i:
        out.append(chr(97 + (i % 26)))
        i //= 26
    return "".join(out)


def _gen_params(rng: np.random.Generator, name: str, n: int) -> list[str]:
    """Seeded single-token vocabularies per parameter kind."""
    if name == "xid":
        return [f"0x{v:06x}" for v in rng.integers(0, 1 << 24, n)]
    if name == "scope":
        return list(rng.choice(["global", "local", "nested", "batch", "stream"], n))
    if name in ("n", "scn"):
        hi = 10**9 if name == "scn" else 100000
        return [str(v) for v in rng.integers(0, hi, n)]
    if name == "i":
        return [str(v) for v in rng.integers(1, 20, n)]
    if name == "opname":
        return list(rng.choice(["insert", "update", "delete"], n))
    if name == "args":
        return [f"job{v}.json" for v in rng.integers(0, 5000, n)]
    if name == "rc":
        return [str(v) for v in rng.choice([0, 0, 0, 1, 2], n)]
    if name == "code":
        return [f"E{v:04d}" for v in rng.integers(0, 60, n)]
    if name == "msg":
        return list(rng.choice(["timeout", "not_found", "denied", "oom", "parse_fail"], n))
    if name == "obj":
        return [f"tab{v}" for v in rng.integers(0, 200, n)]
    if name == "ddltype":
        return list(rng.choice(["CREATE", "ALTER", "DROP", "TRUNCATE"], n))
    if name == "path":
        return [f"/data/part{v}.parquet" for v in rng.integers(0, 3000, n)]
    if name == "url":
        return [f"https://example.com/p/{v}" for v in rng.integers(0, 9999, n)]
    if name == "status":
        return [str(v) for v in rng.choice([200, 200, 200, 404, 500, 302], n)]
    if name == "q":
        return [f"term{v}" for v in rng.integers(0, 800, n)]
    if name == "pat":
        return [f"pat{v}" for v in rng.integers(0, 400, n)]
    if name == "action":
        return list(rng.choice(["scan", "join", "agg", "write", "verify"], n))
    if name == "name":
        return list(rng.choice(["latency", "rows", "bytes", "cpu"], n))
    if name == "v":
        return [f"{v:.2f}" for v in rng.uniform(0, 1000, n)]
    if name == "ua":
        return list(rng.choice(["cli", "web", "api"], n))
    if name == "ver":
        return [f"{a}.{b}.{c}" for a, b, c in
                zip(rng.integers(0, 4, n), rng.integers(0, 10, n), rng.integers(0, 30, n))]
    if name == "reason":
        return list(rng.choice(["done", "timeout", "user_exit"], n))
    if name == "sentence":
        return list(rng.choice(list(NOTE_SENTENCES), n))
    if name == "at":
        # ISO-8601 'T' form: single token (no spaces), survives k=v masking
        secs = EPOCH_2026 + rng.integers(0, 96 * 3600, n)
        return [np.datetime_as_string(np.datetime64(int(v), "s")) for v in secs]
    if name == "ret":
        # ANSI YEAR TO MONTH interval string 'Y-M': single token; Spark
        # casts it to YearMonthIntervalType (DuckDB oracles recompute months)
        months = rng.integers(0, 61, n)
        return [f"{v // 12}-{v % 12}" for v in months]
    if name == "lag":
        # ANSI HOUR TO SECOND interval string: single token, castable to
        # INTERVAL by both Spark and DuckDB (interval-typed decode parity)
        lag_s = rng.integers(0, 13 * 3600, n)
        return [f"{v // 3600}:{(v // 60) % 60:02d}:{v % 60:02d}" for v in lag_s]
    raise KeyError(name)


def generate_transcripts(n_rows: int, seed: int = SEED) -> dict[str, pd.DataFrame]:
    """Return {'transcripts': raw shuffled, 'transcripts_logical': merge expectation}."""
    rng = np.random.default_rng(seed)

    # --- conversation sizes with skew -------------------------------------
    mean_turns = 9
    n_convs = max(4, n_rows // mean_turns)
    turns = rng.integers(3, 16, n_convs).astype(np.int64)
    n_skew = max(1, n_convs // 100)
    skew_idx = rng.choice(np.arange(1, n_convs), min(n_skew, n_convs - 1), replace=False)
    turns[skew_idx] = turns[skew_idx] * np.clip(rng.zipf(1.5, len(skew_idx)), 1, 40)
    hot_target = max(int(0.02 * turns.sum()), 60)
    turns[0] = max(turns[0], hot_target)  # conv00000000 is the hot key
    total = int(turns.sum())

    conv_ord = np.repeat(np.arange(n_convs), turns)
    conv_id = np.char.add("conv", np.char.zfill(conv_ord.astype(str), 8))
    starts = np.concatenate(([0], np.cumsum(turns)[:-1]))
    turn_idx = (np.arange(total) - np.repeat(starts, turns)).astype(np.int32)

    # --- timestamps: conv start over 4 days, 1-300 s per-turn increments ---
    conv_start = EPOCH_2026 + rng.integers(0, 96 * 3600, n_convs)
    deltas = rng.integers(1, 301, total).astype(np.int64)
    cum = np.cumsum(deltas)
    base = np.concatenate(([0], cum[np.cumsum(turns)[:-1] - 1]))
    within = cum - np.repeat(base, turns)
    ts = np.repeat(conv_start, turns) + within

    # --- template choice per row -------------------------------------------
    names = [t.name for t in TEMPLATES]
    weights = np.array([
        2, 2, 1, 1,            # begin commit rollback rollback_last
        8, 8, 2,               # call result error
        3, 3, 2, 1, 1,         # insert update delete ddl chkpt
        4, 3, 3, 3, 3,         # read write fetch search grep
        3, 3, 2, 2,            # plan think warn metric
        0, 1,                  # session (only turn 0) close
        10,                    # note
    ], dtype=float)
    weights /= weights.sum()
    tpl_idx = rng.choice(len(TEMPLATES), total, p=weights)
    # 30% of convs open with a system SESSION turn
    sys_convs = rng.random(n_convs) < 0.30
    session_i = names.index("session")
    turn0 = turn_idx == 0
    tpl_idx[turn0 & sys_convs[conv_ord]] = session_i

    # --- render text + role + tool, per template, vectorized chunks --------
    text = np.empty(total, dtype=object)
    role = np.empty(total, dtype=object)
    tool = np.full(total, None, dtype=object)
    for i, t in enumerate(TEMPLATES):
        sel = np.flatnonzero(tpl_idx == i)
        if sel.size == 0:
            continue
        cols = {}
        for p in t.params:
            if p == "tool":
                tv = rng.choice(TOOLS, sel.size).astype(object)
                unk = rng.random(sel.size) < 0.002
                tv[unk] = UNKNOWN_TOOL
                cols[p] = list(tv)
                tool[sel] = tv
            else:
                cols[p] = _gen_params(rng, p, sel.size)
        vals = [cols[p] for p in t.params]
        fmt = t.fmt
        text[sel] = [fmt.format(**dict(zip(t.params, row))) for row in zip(*vals)]
        role[sel] = t.gen_role
    # note turns alternate user/assistant
    note_sel = tpl_idx == names.index("note")
    role[note_sel & (turn_idx % 2 == 1)] = "assistant"

    df = pd.DataFrame({
        "conv_ord": conv_ord,
        "conv_id": conv_id,
        "orig_turn": turn_idx,
        "role": role,
        "text": text,
        "tool": tool,
        "ts": pd.to_datetime(ts, unit="s"),
    })

    # --- corruption: 0.5% rows become letter-garbage (quarantine path) -----
    corrupt = rng.random(total) < 0.005
    ci = np.flatnonzero(corrupt)
    garbage_pool = ["zq fk wpxu", "rj lmok ae", "xv bt uyhn", "pw scde gm"]
    df.loc[ci, "text"] = [
        f"{garbage_pool[k % len(garbage_pool)]} {_letters(int(k))}" for k in ci
    ]

    # --- row-piece splits: 0.3% of uncorrupted rows with >=4 tokens --------
    n_tok = df["text"].str.count(" ") + 1
    eligible = (~corrupt) & (n_tok >= 4)
    # ~0.3% of all rows overall (eligibility covers ~30% of rows)
    split = eligible & (rng.random(total) < 0.01)
    si = np.flatnonzero(split)

    df["piece"] = 0
    df["full_text"] = df["text"]
    head = df.copy()
    tails = []
    for k in si:
        toks = df.at[k, "text"].split(" ")
        cut = len(toks) // 2
        head.at[k, "text"] = " ".join(toks[:cut]) + " \\"
        tail = df.loc[k].copy()
        tail["text"] = " ".join(toks[cut:])
        tail["piece"] = 1
        tail["ts"] = tail["ts"] + pd.Timedelta(seconds=1)
        tails.append(tail)
    raw = pd.concat([head, pd.DataFrame(tails)]) if tails else head
    raw = raw.sort_values(["conv_ord", "orig_turn", "piece"], kind="stable").reset_index(drop=True)
    # dense turn_idx after splitting
    raw["turn_idx"] = raw.groupby("conv_ord").cumcount().astype(np.int32)

    logical = raw[raw["piece"] == 0][
        ["conv_id", "turn_idx", "role", "full_text", "tool", "ts"]
    ].rename(columns={"full_text": "text"}).reset_index(drop=True)

    raw = raw[["conv_id", "turn_idx", "role", "text", "tool", "ts"]]
    # shuffle row order on write (ordering must be re-established downstream)
    perm = rng.permutation(len(raw))
    raw = raw.iloc[perm].reset_index(drop=True)
    return {"transcripts": raw, "transcripts_logical": logical}


def generate_dims() -> dict[str, pd.DataFrame]:
    dim_tools = pd.DataFrame({
        "tool": TOOLS,
        "category": [TOOL_CATEGORY[t] for t in TOOLS],
        "risk": [TOOL_RISK[t] for t in TOOLS],
        "side_effects": [TOOL_SIDE_EFFECTS[t] for t in TOOLS],
    })
    dim_roles = pd.DataFrame({
        "role": ["user", "assistant", "tool", "system"],
        "is_model": [False, True, False, False],
        "weight": [1.0, 1.0, 0.5, 0.1],
    })
    routes = pd.DataFrame({
        "route_id": ["r_high_risk_calls", "r_errors", "r_txn", "r_net", "r_system", "r_none"],
        "template_pattern": [
            "^CALL ", "^(ERROR|WARN) ", "^(BEGIN|COMMIT|ROLLBACK)",
            "^(CALL|RESULT) ", ".*", "^CALL ",
        ],
        "condition": [
            "risk = 'high'", "true", "true",
            "category = 'net'", "role = 'system'", "risk = 'impossible'",
        ],
        "sink": [
            "events_r_high_risk_calls", "events_r_errors", "events_r_txn",
            "events_r_net", "events_r_system", "events_r_none",
        ],
        "tag_cols": [["conv_id"], ["conv_id"], ["conv_id"], ["tool"], ["conv_id"], ["conv_id"]],
    })
    return {"dim_tools": dim_tools, "dim_roles": dim_roles, "routes": routes}


def rows_for_sf(sf: float) -> int:
    return int(sf * 6_000_000)


def fixture_dir(sf: float, base: str | None = None) -> str:
    base = base or os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "data", "transcripts")
    return os.path.join(base, f"sf{sf}")


def generate_fixtures(sf: float, seed: int = SEED) -> dict[str, pd.DataFrame]:
    out = generate_transcripts(rows_for_sf(sf), seed)
    out.update(generate_dims())
    return out


def write_fixtures(sf: float, base: str | None = None, seed: int = SEED) -> str:
    d = fixture_dir(sf, base)
    os.makedirs(d, exist_ok=True)
    for name, df in generate_fixtures(sf, seed).items():
        df = df.copy()
        for c in df.columns:  # Spark parquet cannot read TIMESTAMP(NANOS)
            if str(df[c].dtype).startswith("datetime64[ns"):
                df[c] = df[c].astype("datetime64[us]")
        path = os.path.join(d, f"{name}.parquet")
        if name == "transcripts" and len(df) > 1_000_000:
            # shard large tables into many files — the layout a distributed
            # writer produces, and what keeps the scan parallel at any core
            # count (a single ~200MB file yields only 2 default-size splits)
            os.makedirs(path, exist_ok=True)
            shard = 131072
            for i in range(0, len(df), shard):
                df.iloc[i:i + shard].to_parquet(
                    os.path.join(path, f"part-{i // shard:05d}.parquet"),
                    index=False, row_group_size=65536)
        else:
            # small row groups keep even a single file splittable
            df.to_parquet(path, index=False, row_group_size=65536)
    with open(os.path.join(d, "_VERSION"), "w") as f:
        f.write(str(FIXTURE_VERSION))
    return d


def _on_disk_version(d: str) -> int:
    try:
        with open(os.path.join(d, "_VERSION")) as f:
            return int(f.read().strip())
    except (FileNotFoundError, ValueError):
        return 0


def ensure_fixtures(sf: float, base: str | None = None) -> str:
    d = fixture_dir(sf, base)
    if (not os.path.exists(os.path.join(d, "transcripts.parquet"))
            or _on_disk_version(d) != FIXTURE_VERSION):
        return write_fixtures(sf, base)
    return d
