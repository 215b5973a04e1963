"""Drain-style prefix-tree log-template miner.

Replaces the reference's *static* 24-way opcode dispatch table
(/root/reference/src/parser/Parser.cpp:282-460 + src/parser/OpCode*.h) with a
*mined* template table: the fixed opcode set of a binary redo log becomes a
discovered template set for free-form log/transcript text.

Algorithm (public: He et al., "Drain: An Online Log Parsing Approach with
Fixed Depth Tree", ICWS 2017):
  - tokens containing digits are pre-masked to ``<*>``;
  - a fixed-depth prefix tree groups token sequences by (length, first D
    tokens);
  - within a leaf, a sequence joins the most similar cluster if
    similarity >= sim_th (similarity = fraction of equal tokens at equal
    positions), else starts a new cluster;
  - joining a cluster generalizes mismatching positions to ``<*>``.

Distribution strategy (SURVEY.md §4 "custom pieces"):
  fit:   per-partition candidate mining (mapInPandas, Arrow-batched) emits
         (template, count) pairs — a massive reduction (distinct templates ≪
         rows) — then a deterministic driver-side merge: candidates are
         re-inserted into a fresh tree in canonical order
         (count desc, template asc), so the result is independent of
         partition count / cluster size (determinism requirement,
         SURVEY.md §7.3).
  apply: the final template table is broadcast; a vectorized pandas stage
         matches each row (memoized per distinct masked string per batch —
         no per-row Python in the hot path).

template_id = md5 prefix of the template string → stable across runs.
"""

from __future__ import annotations

import re
from collections import Counter

from openlogparse_spark.parse.templates import template_id_of

_DIGIT = re.compile(r"\d")
WILDCARD = "<*>"


def pre_mask(text: str) -> list[str]:
    """Tokenize + mask digit-bearing tokens and ``k=v`` values.

    Exactly mirrors stage.MASK_SQL_EXPR (single-space split, first-'='
    masking, ascii-digit test) so drain and sql modes agree."""
    out = []
    for tok in text.split(" "):
        if "=" in tok:
            k, _, _v = tok.partition("=")
            out.append(k + "=" + WILDCARD)
        elif any(c in "0123456789" for c in tok):
            out.append(WILDCARD)
        else:
            out.append(tok)
    return out


def _seq_sim(a: tuple[str, ...], b: tuple[str, ...]) -> float:
    eq = sum(1 for x, y in zip(a, b) if x == y or x == WILDCARD or y == WILDCARD)
    return eq / len(a) if a else 1.0


def _merge_seq(a: tuple[str, ...], b: tuple[str, ...]) -> tuple[str, ...]:
    return tuple(x if x == y else WILDCARD for x, y in zip(a, b))


class DrainMiner:
    """Fixed-depth prefix tree over token sequences."""

    def __init__(self, depth: int = 3, sim_th: float = 0.6, max_children: int = 64):
        self.depth = depth
        self.sim_th = sim_th
        self.max_children = max_children
        # tree: {length: {prefix_path_tuple: [ (template_tuple, count) ]}}
        self._leaves: dict[int, dict[tuple[str, ...], list[list]]] = {}

    def _leaf_key(self, tokens: list[str]) -> tuple[str, ...]:
        path = []
        for tok in tokens[: self.depth]:
            path.append(WILDCARD if _DIGIT.search(tok) else tok)
        return tuple(path)

    def add(self, tokens: list[str], count: int = 1) -> tuple[str, ...]:
        n = len(tokens)
        leaves = self._leaves.setdefault(n, {})
        key = self._leaf_key(tokens)
        if key not in leaves and len(leaves) >= self.max_children:
            key = (WILDCARD,)  # overflow leaf
        clusters = leaves.setdefault(key, [])
        seq = tuple(tokens)
        best_i, best_sim = -1, -1.0
        for i, (tmpl, _c) in enumerate(clusters):
            s = _seq_sim(seq, tmpl)
            if s > best_sim:
                best_i, best_sim = i, s
        if best_i >= 0 and best_sim >= self.sim_th:
            merged = _merge_seq(clusters[best_i][0], seq)
            clusters[best_i][0] = merged
            clusters[best_i][1] += count
            return merged
        clusters.append([seq, count])
        return seq

    def add_text(self, text: str, count: int = 1) -> tuple[str, ...]:
        return self.add(pre_mask(text), count)

    def templates(self) -> list[tuple[str, int]]:
        """[(template_string, support)] sorted by (-support, template)."""
        out: list[tuple[str, int]] = []
        for leaves in self._leaves.values():
            for clusters in leaves.values():
                for tmpl, c in clusters:
                    out.append((" ".join(tmpl), c))
        out.sort(key=lambda x: (-x[1], x[0]))
        return out

    def match(self, tokens: list[str]) -> str | None:
        """Best matching template string, or None."""
        n = len(tokens)
        leaves = self._leaves.get(n)
        if not leaves:
            return None
        seq = tuple(tokens)
        cands = []
        key = self._leaf_key(tokens)
        for k in (key, (WILDCARD,)):
            for tmpl, _c in leaves.get(k, []):
                cands.append(tmpl)
        best, best_sim = None, -1.0
        for tmpl in cands:
            s = _seq_sim(seq, tmpl)
            if s > best_sim:
                best, best_sim = tmpl, s
        if best is not None and best_sim >= self.sim_th:
            return " ".join(best)
        return None


def mine_candidates_partition(texts) -> Counter:
    """Per-partition pass: Counter{template_string: count}."""
    miner = DrainMiner()
    for t in texts:
        miner.add_text(t)
    return Counter(dict(miner.templates()))


def merge_candidates(counters: list[Counter], min_support: int = 1) -> list[tuple[str, str, int]]:
    """Deterministic driver-side merge → [(template_id, template, support)]."""
    total: Counter = Counter()
    for c in counters:
        total.update(c)
    miner = DrainMiner()
    for tmpl, cnt in sorted(total.items(), key=lambda x: (-x[1], x[0])):
        miner.add(tmpl.split(" "), cnt)
    out = []
    for tmpl, cnt in miner.templates():
        if cnt >= min_support:
            out.append((template_id_of(tmpl), tmpl, cnt))
    return out


def mine_templates(df, text_col: str = "text", min_support: int = 2,
                   max_candidates_per_partition: int = 10_000):
    """Distributed Drain fit over a DataFrame; returns [(id, template, support)].

    Stage shape: mapInPandas (Arrow) → tiny candidate rows → driver merge.
    At 10^12 rows the shuffle-free candidate emission is O(distinct templates
    x partitions), a few MB.

    `max_candidates_per_partition` bounds the driver merge against
    adversarial text (every row unique ⇒ unbounded candidate set): each
    partition emits only its top-K candidates by (support desc, template
    asc). Truncation can only drop templates rare in EVERY partition —
    which min_support would quarantine at the merge anyway — and keeps the
    driver-side state ≤ K × partitions rows.
    """
    import pandas as pd

    def part(batches):
        miner = DrainMiner()
        for pdf in batches:
            for t in pdf[text_col].dropna():
                miner.add_text(t)
        rows = miner.templates()[:max_candidates_per_partition]
        yield pd.DataFrame({"template": [r[0] for r in rows],
                            "support": [r[1] for r in rows]})

    cand = df.select(text_col).mapInPandas(part, schema="template string, support long")
    pdf = cand.toPandas()
    total = Counter(pdf.groupby("template")["support"].sum().to_dict())
    return merge_candidates([total], min_support=min_support)
