"""Property-based oracles (hypothesis): the stack-replay and row-piece-merge
kernels hold their invariants on adversarial inputs, not just fixtures.

The reference pins these semantics in unit tests over hand-built redo
streams (SURVEY §5); generating the streams instead covers the combinatorial
edge space (nested txns, rollback-last on empty stacks, orphan bursts,
continuation chains at batch boundaries).
"""

from hypothesis import given, settings
from hypothesis import strategies as st

from openlogparse_spark.aggregate.txn import DML_OPS, replay_transactions

OPS = ["begin", "commit", "rollback", "rollback_last",
       "insert", "update", "delete", "call", "note"]


@st.composite
def op_streams(draw):
    n = draw(st.integers(min_value=0, max_value=60))
    xids = ["x1", "x2", "x3"]
    rows = []
    for turn in range(n):
        op = draw(st.sampled_from(OPS))
        params = {}
        if op in ("begin", "commit", "rollback"):
            params["txn"] = draw(st.sampled_from(xids))
        if op in DML_OPS:
            params["rows"] = str(draw(st.integers(min_value=0, max_value=9)))
        rows.append((turn, op, params))
    return rows


@given(op_streams())
@settings(max_examples=300, deadline=None)
def test_replay_conserves_every_dml_row(stream):
    """Row conservation: every DML op's rows land in exactly one outcome
    bucket (commit/rollback/partial/orphan) or were explicitly cancelled by a
    rollback_last — nothing vanishes, nothing is double-counted."""
    recs = replay_transactions(stream)
    total_dml_rows = sum(int(p.get("rows", 0)) for _t, op, p in stream
                         if op in DML_OPS)
    accounted = sum(r["total_rows"] for r in recs)
    # cancelled rows: an independent mini-replay of ONLY the stack motion
    # (same xid-matched close rule), tracking what rollback_last removes
    cancelled = 0
    stack = []  # of (xid, [row counts])
    for _t, op, p in stream:
        if op == "begin":
            stack.append((p.get("txn") or "?", []))
        elif op in DML_OPS and stack:
            stack[-1][1].append(int(p.get("rows", 0)))
        elif op == "rollback_last" and stack and stack[-1][1]:
            cancelled += stack[-1][1].pop()
        elif op in ("commit", "rollback") and stack:
            xid = p.get("txn") or "?"
            idx = next((i for i in range(len(stack) - 1, -1, -1)
                        if stack[i][0] == xid), len(stack) - 1)
            stack.pop(idx)
    assert accounted + cancelled == total_dml_rows


@given(op_streams())
@settings(max_examples=300, deadline=None)
def test_replay_outcome_structure(stream):
    recs = replay_transactions(stream)
    n_begin = sum(1 for _t, op, _p in stream if op == "begin")
    closed = [r for r in recs if r["outcome"] in ("commit", "rollback")]
    partial = [r for r in recs if r["outcome"] == "partial"]
    orphan = [r for r in recs if r["outcome"] == "orphan"]
    # every begin is closed exactly once or left partial
    assert len(closed) + len(partial) == n_begin
    # at most one orphan summary record per conversation stream
    assert len(orphan) <= 1
    for r in recs:
        assert r["n_ops"] >= 0 and r["total_rows"] >= 0
        if r["outcome"] != "orphan":
            assert r["begin_turn"] <= r["end_turn"]


def _py_merge(rows):
    """Pure-python model of merge_row_pieces over one conversation."""
    out = []
    cur = None
    for turn, role, text, tool, ts in rows:
        stripped = text[:-1].rstrip() if text.endswith("\\") else text
        if cur is None:
            cur = [turn, role, stripped, tool, ts]
        else:
            cur[2] = cur[2] + " " + stripped
        if not text.endswith("\\"):
            out.append(tuple(cur))
            cur = None
    if cur is not None:
        out.append(tuple(cur))
    return out


@st.composite
def conversations(draw):
    n = draw(st.integers(min_value=1, max_value=25))
    rows = []
    for turn in range(n):
        word = draw(st.text(alphabet="abcx=1 ", min_size=1, max_size=8)
                    .filter(lambda s: s.strip() and not s.endswith("\\")))
        cont = draw(st.booleans()) and turn < n - 1
        rows.append((turn, "user", word + ("\\" if cont else ""),
                     None, "2026-01-01 00:00:00"))
    return rows


@given(st.lists(conversations(), min_size=1, max_size=3))
@settings(max_examples=12, deadline=None)
def test_merge_matches_python_model(spark_session_holder, convs):
    import pyspark.sql.functions as F

    from openlogparse_spark.parse import merge_row_pieces

    spark = spark_session_holder
    rows = []
    expected = {}
    for ci, conv in enumerate(convs):
        cid = f"c{ci}"
        rows += [(cid, t, role, text, tool, ts) for t, role, text, tool, ts in conv]
        expected[cid] = [(t, text) for t, _r, text, _tool, _ts in _py_merge(conv)]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx long, role string, text string, "
              "tool string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {}
    for r in merge_row_pieces(df.repartition(3)).collect():
        got.setdefault(r["conv_id"], []).append((r["turn_idx"], r["text"]))
    got = {k: sorted(v) for k, v in got.items()}
    assert got == {k: sorted(v) for k, v in expected.items()}


import pytest  # noqa: E402


@pytest.fixture(scope="module")
def spark_session_holder(spark):
    return spark
