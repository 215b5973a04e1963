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
aggregate — so it runs as an Arrow-batched `mapInPandas` over
partition-sorted conversations (one shuffle on conv_id; see conv_outcomes
for why not applyInPandas). `replay_transactions` is the pure-Python core
shared with the pytest oracle, guaranteeing the distributed and single-node
answers coincide by construction of the test.
"""

from __future__ import annotations

import pandas as pd

from openlogparse_spark.parse.templates import DML_OPS

OUTCOME_SCHEMA = (
    "conv_id string, xid string, outcome string, n_ops int, "
    "total_rows long, begin_turn int, end_turn int"
)


def replay_transactions(rows: list[tuple[int, str, dict]],
                        skip_xids: frozenset[str] | tuple[str, ...] = ()) -> list[dict]:
    """Replay one conversation's ordered (turn_idx, op, params) stream.

    Returns transaction records: one per begin..commit/rollback pair, plus
    'partial' for still-open and 'orphan' for DML with no open transaction.

    `skip_xids` drops WHOLE transactions here, inside the replay, because
    only begin/commit/rollback rows carry txn= — DML ops are attributed to
    their transaction by the stack, so a row filter upstream would drop the
    bracketing ops while the skipped txn's DML leaked into the enclosing
    open transaction or the orphan bucket. A skipped txn still occupies its
    stack slot (nesting and rollback_last attribution stay correct); it just
    emits no record at close (reference: the skip-xid list drops the full
    transaction, OpenLogReplicator.cpp:828-848).
    """
    skip = frozenset(skip_xids)
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
                {"xid": params.get("txn") or "?", "ops": [], "begin_turn": turn}
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
            xid = params.get("txn") or "?"
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
                if t["xid"] not in skip:
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
            elif xid not in skip:
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
        if t["xid"] in skip:
            continue
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


TXN_OPS = ("begin", "commit", "rollback", "rollback_last") + tuple(DML_OPS)


def conv_outcomes(parsed, max_turns_per_conv: int | None = None,
                  skip_xids: tuple[str, ...] = ()):
    """Distributed transaction replay.

    Shape (the 100 TB path): pre-filter to transaction-bearing ops only
    (~1/3 of turns; conversations with none produce no outcomes by
    definition), project the three scalars the replay needs (xid and row
    count pre-extracted from the params map JVM-side), then ONE shuffle —
    repartition(conv_id) + sortWithinPartitions — and a mapInPandas scan that
    replays conversations in partition order, carrying the open conversation
    across Arrow batch boundaries. This avoids applyInPandas's
    one-python-call-per-group overhead (transcripts have millions of tiny
    conversations — the skewed-many-small-groups regime).

    Guard rails (reference parity):
      - `max_turns_per_conv`: the transaction-max-mb drop analogue
        (/root/reference/src/parser/Parser.cpp:578-588 — an over-limit
        transaction is dropped and counted, never buffered unbounded). A
        conversation exceeding the cap stops buffering immediately (O(cap)
        memory however pathological the input) and emits ONE
        outcome='overflow' record carrying the total op count — conserved,
        never silent.
      - `skip_xids`: the skip-xid list (OpenLogReplicator.cpp:828-848) — the
        WHOLE transaction (begin + its attributed DML + close) is dropped
        inside the replay kernel, where stack attribution is known. It cannot
        be a JVM-side row filter: DML ops don't carry txn=, so filtering on
        params['txn'] would drop only the bracketing ops and leak the DML
        into the enclosing txn / orphan bucket.
    """
    from pyspark.sql import functions as F

    slim = parsed.filter(F.col("op").isin(*TXN_OPS))
    slim = (
        slim.select(
            "conv_id", "turn_idx", "op",
            F.col("params")["txn"].alias("xid"),
            F.coalesce(F.col("params")["rows"].try_cast("long"), F.lit(0)).alias("nrows"),
        )
        .repartition("conv_id")
        .sortWithinPartitions("conv_id", "turn_idx")
    )
    cap = max_turns_per_conv
    skip = frozenset(skip_xids)

    def run(batches):
        cur_conv = None
        buf: list[tuple] = []
        overflowed = 0          # ops seen past the cap for cur_conv
        first_turn = last_turn = None

        def flush(outs: list) -> None:
            # appends (conv_id, rec) rows to `outs` — ONE DataFrame is built
            # per Arrow batch below; the previous per-conversation
            # pd.DataFrame + insert + concat cost ~15-30 µs x n_convs
            # (~666k conversations at sf1.0 ≈ 10-20 s of pure allocation)
            if cur_conv is None:
                return
            if overflowed:
                recs = [{
                    "xid": "?", "outcome": "overflow",
                    "n_ops": len(buf) + overflowed,
                    "total_rows": 0,
                    "begin_turn": first_turn, "end_turn": last_turn,
                }]
            else:
                recs = replay_transactions(
                    [(t, o, {"txn": x, "rows": n}) for t, o, x, n in buf],
                    skip_xids=skip)
            for r in recs:
                r["conv_id"] = cur_conv
                outs.append(r)

        cols = ["conv_id", "xid", "outcome", "n_ops", "total_rows",
                "begin_turn", "end_turn"]

        def frame(outs: list) -> pd.DataFrame:
            return pd.DataFrame(outs, columns=cols)

        for pdf in batches:
            outs: list[dict] = []
            for c, t, o, x, n in zip(pdf["conv_id"], pdf["turn_idx"],
                                     pdf["op"], pdf["xid"], pdf["nrows"]):
                if c != cur_conv:
                    flush(outs)
                    cur_conv, buf, overflowed = c, [], 0
                    first_turn = t
                last_turn = t
                if cap is not None and (len(buf) >= cap or overflowed):
                    overflowed += 1     # stop buffering: bounded memory
                else:
                    buf.append((t, o, x, n))
            if outs:
                yield frame(outs)
        outs = []
        flush(outs)
        if outs:
            yield frame(outs)

    return slim.mapInPandas(run, schema=OUTCOME_SCHEMA)
