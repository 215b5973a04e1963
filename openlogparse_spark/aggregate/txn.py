"""Transaction semantics over ordered conversation turns.

Reference parity — the stateful heart of the reference pipeline:
  - transaction assembly keyed by xid (Parser::appendToTransaction*,
    /root/reference/src/parser/Parser.cpp:547-1203);
  - commit flush classifying and emitting the buffered ops
    (Transaction::flush, /root/reference/src/parser/Transaction.cpp:179-551);
  - partial-rollback cancellation popping the LAST matching DML op
    (Transaction::rollbackLastOp, Transaction.cpp:54-177 — the inverse-op
    stack algorithm);
  - whole-transaction rollback dropping the buffer (Transaction.cpp:187-189);
  - "transaction with no beginning" warn+skip (Parser.cpp:812-820) →
    orphaned DML ops are counted, not silently dropped;
  - transactions still open at end-of-log → 'partial'
    (transactionsPartial counter, Metrics.h:124-129).

This is a stack algorithm over an ordered stream — not expressible as a SQL
aggregate — so it runs as `applyInPandas` per conversation (Arrow-batched;
one shuffle on conv_id). `replay_transactions` is the pure-Python core shared
with the pytest oracle, guaranteeing the distributed and single-node answers
coincide by construction of the test.
"""

from __future__ import annotations

import pandas as pd

from openlogparse_spark.parse.templates import DML_OPS

OUTCOME_SCHEMA = (
    "conv_id string, xid string, outcome string, n_ops int, "
    "total_rows long, begin_turn int, end_turn int"
)


def replay_transactions(rows: list[tuple[int, str, dict]]) -> list[dict]:
    """Replay one conversation's ordered (turn_idx, op, params) stream.

    Returns transaction records: one per begin..commit/rollback pair, plus
    'partial' for still-open and 'orphan' for DML with no open transaction.
    """
    open_stack: list[dict] = []  # each: {xid, ops:[(turn, op, nrows)], begin_turn}
    out: list[dict] = []
    orphan_ops = 0
    orphan_rows = 0
    first_orphan_turn = None
    last_turn = 0

    for turn, op, params in rows:
        last_turn = turn
        if op == "begin":
            open_stack.append(
                {"xid": params.get("txn", "?"), "ops": [], "begin_turn": turn}
            )
        elif op in DML_OPS:
            nrows = int(params.get("rows", 0) or 0)
            if open_stack:
                open_stack[-1]["ops"].append((turn, op, nrows))
            else:
                orphan_ops += 1
                orphan_rows += nrows
                if first_orphan_turn is None:
                    first_orphan_turn = turn
        elif op == "rollback_last":
            # pop the last DML op of the innermost open txn (inverse-op cancel)
            if open_stack and open_stack[-1]["ops"]:
                open_stack[-1]["ops"].pop()
        elif op in ("commit", "rollback"):
            xid = params.get("txn", "?")
            # close the matching open txn (innermost-first), else innermost
            idx = None
            for i in range(len(open_stack) - 1, -1, -1):
                if open_stack[i]["xid"] == xid:
                    idx = i
                    break
            if idx is None and open_stack:
                idx = len(open_stack) - 1
            if idx is not None:
                t = open_stack.pop(idx)
                out.append(
                    {
                        "xid": t["xid"],
                        "outcome": "commit" if op == "commit" else "rollback",
                        "n_ops": len(t["ops"]),
                        "total_rows": sum(o[2] for o in t["ops"]),
                        "begin_turn": t["begin_turn"],
                        "end_turn": turn,
                    }
                )
            # commit/rollback with no open txn: counted as no-begin skip
            elif op == "commit" or op == "rollback":
                out.append(
                    {
                        "xid": xid,
                        "outcome": "no_begin",
                        "n_ops": 0,
                        "total_rows": 0,
                        "begin_turn": turn,
                        "end_turn": turn,
                    }
                )

    for t in open_stack:
        out.append(
            {
                "xid": t["xid"],
                "outcome": "partial",
                "n_ops": len(t["ops"]),
                "total_rows": sum(o[2] for o in t["ops"]),
                "begin_turn": t["begin_turn"],
                "end_turn": last_turn,
            }
        )
    if orphan_ops:
        out.append(
            {
                "xid": "?",
                "outcome": "orphan",
                "n_ops": orphan_ops,
                "total_rows": orphan_rows,
                "begin_turn": first_orphan_turn,
                "end_turn": last_turn,
            }
        )
    return out


def conv_outcomes(parsed):
    """Distributed transaction replay: applyInPandas per conv_id."""

    def per_conv(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("turn_idx")
        conv = pdf["conv_id"].iloc[0]
        rows = list(
            zip(pdf["turn_idx"], pdf["op"], (p if isinstance(p, dict) else {} for p in pdf["params"]))
        )
        recs = replay_transactions(rows)
        if not recs:
            return pd.DataFrame(
                columns=["conv_id", "xid", "outcome", "n_ops", "total_rows",
                         "begin_turn", "end_turn"]
            )
        out = pd.DataFrame(recs)
        out.insert(0, "conv_id", conv)
        return out

    return (
        parsed.select("conv_id", "turn_idx", "op", "params")
        .groupBy("conv_id")
        .applyInPandas(per_conv, schema=OUTCOME_SCHEMA)
    )
