"""Aggregate stage vs DuckDB / pure-python oracles."""

import os

import pandas as pd
import pyspark.sql.functions as F
import pytest

from openlogparse_spark.aggregate import agg_hourly, conv_outcomes, conv_stats
from openlogparse_spark.aggregate.txn import replay_transactions
from openlogparse_spark.enrich import enrich_stage
from openlogparse_spark.parse import parse_stage
from openlogparse_spark.parse.stage import MASK_DUCKDB_EXPR


@pytest.fixture(scope="module")
def enriched(spark, fx_dir):
    raw = spark.read.parquet(os.path.join(fx_dir, "transcripts.parquet"))
    e = enrich_stage(
        parse_stage(raw),
        spark.read.parquet(os.path.join(fx_dir, "dim_tools.parquet")),
        spark.read.parquet(os.path.join(fx_dir, "dim_roles.parquet")),
    )
    e.cache()
    e.count()
    return e


def test_agg_hourly_vs_duckdb(enriched, duck):
    got = (
        agg_hourly(enriched.filter("parse_ok"))
        .toPandas()
        .sort_values(["template_id", "tool", "hour_bucket"], na_position="first")
        .reset_index(drop=True)
    )
    # oracle: independent DuckDB pipeline (merge -> mask -> filter support>=2)
    exp = duck.execute(f"""
        WITH masked AS (
          SELECT substr(md5({MASK_DUCKDB_EXPR}),1,12) AS template_id, tool, ts
          FROM transcripts_logical
        ), supported AS (
          SELECT template_id FROM masked GROUP BY template_id HAVING count(*) >= 2
        )
        SELECT m.template_id, m.tool, date_trunc('hour', m.ts) AS hour_bucket,
               count(*) AS n_turns
        FROM masked m JOIN supported s USING (template_id)
        GROUP BY 1,2,3
    """).df().sort_values(["template_id", "tool", "hour_bucket"],
                          na_position="first").reset_index(drop=True)
    assert len(got) == len(exp)
    pd.testing.assert_series_equal(
        got["n_turns"].astype("int64"), exp["n_turns"].astype("int64"),
        check_names=False)
    assert (got["template_id"].values == exp["template_id"].values).all()


def test_conv_stats_vs_duckdb(enriched, duck):
    got = conv_stats(enriched).toPandas().set_index("conv_id").sort_index()
    exp = duck.execute("""
        WITH g AS (
          SELECT conv_id, turn_idx, ts,
                 epoch(ts) - lag(epoch(ts)) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS gap_s
          FROM transcripts_logical
        )
        SELECT conv_id, count(*) AS n_turns,
               max(epoch(ts)) - min(epoch(ts)) AS duration_s,
               avg(gap_s) AS avg_gap_s
        FROM g GROUP BY conv_id
    """).df().set_index("conv_id").sort_index()
    assert (got["n_turns"] == exp["n_turns"]).all()
    assert (got["duration_s"].astype("int64") == exp["duration_s"].astype("int64")).all()
    pd.testing.assert_series_equal(got["avg_gap_s"], exp["avg_gap_s"],
                                   check_names=False, rtol=1e-9)


def test_conv_outcomes_vs_python_oracle(enriched):
    from openlogparse_spark.aggregate.txn import TXN_OPS

    got = conv_outcomes(enriched.filter("parse_ok")).toPandas()
    pdf = (
        enriched.filter("parse_ok")
        .filter(F.col("op").isin(*TXN_OPS))  # replay sees the txn-op stream
        .select("conv_id", "turn_idx", "op", "params")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
    )
    exp_rows = []
    for conv, g in pdf.groupby("conv_id"):
        recs = replay_transactions(
            list(zip(g["turn_idx"], g["op"], (p or {} for p in g["params"]))))
        for r in recs:
            r["conv_id"] = conv
            exp_rows.append(r)
    exp = pd.DataFrame(exp_rows)
    key = ["conv_id", "xid", "outcome", "begin_turn", "end_turn", "n_ops", "total_rows"]
    got_s = got[key].sort_values(key).reset_index(drop=True)
    exp_s = exp[key].astype(got_s.dtypes.to_dict()).sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got_s, exp_s)


def test_rollback_last_cancels_stack_order():
    """The inverse-op stack semantics of Transaction::rollbackLastOp."""
    rows = [
        (0, "begin", {"txn": "x1"}),
        (1, "insert", {"rows": "10"}),
        (2, "update", {"rows": "5"}),
        (3, "rollback_last", {}),          # cancels the UPDATE, not the INSERT
        (4, "commit", {"txn": "x1"}),
        (5, "delete", {"rows": "7"}),      # orphan: no open txn
        (6, "begin", {"txn": "x2"}),       # never closed -> partial
        (7, "insert", {"rows": "3"}),
    ]
    recs = {r["xid"]: r for r in replay_transactions(rows)}
    assert recs["x1"]["outcome"] == "commit"
    assert recs["x1"]["n_ops"] == 1 and recs["x1"]["total_rows"] == 10
    assert recs["x2"]["outcome"] == "partial" and recs["x2"]["total_rows"] == 3
    assert recs["?"]["outcome"] == "orphan" and recs["?"]["total_rows"] == 7


def test_big_conversation_guard_and_skip_xids(spark):
    """transaction-max analogue: a pathological conversation is capped with
    bounded memory and surfaces as ONE conserved 'overflow' outcome; skip_xids
    drops the named transactions before replay (skip-xid list parity)."""
    n_big = 200_000
    big = spark.range(n_big).select(
        F.lit("huge").alias("conv_id"),
        F.col("id").cast("int").alias("turn_idx"),
        F.lit("insert").alias("op"),
        F.create_map(F.lit("rows"), F.lit("1"),
                     F.lit("txn"), F.lit("tx_big")).alias("params"),
    )
    # DML rows carry NO txn= (the real fixture domain): a skipped txn's DML
    # is attributed by the replay stack, so skip must drop it there — a
    # params['txn'] row filter would drop evil's begin/commit but leak its
    # insert into the enclosing 'outer' txn (the round-2 ADVICE bug).
    small = spark.createDataFrame(
        [("ok", 0, "begin", {"txn": "t1"}),
         ("ok", 1, "insert", {"rows": "2"}),
         ("ok", 2, "commit", {"txn": "t1"}),
         ("skipme", 0, "begin", {"txn": "outer"}),
         ("skipme", 1, "begin", {"txn": "evil"}),
         ("skipme", 2, "insert", {"rows": "99"}),   # belongs to evil
         ("skipme", 3, "commit", {"txn": "evil"}),
         ("skipme", 4, "insert", {"rows": "5"}),    # belongs to outer
         ("skipme", 5, "commit", {"txn": "outer"})],
        "conv_id string, turn_idx int, op string, params map<string,string>")
    parsed = big.unionByName(small)

    out = conv_outcomes(parsed, max_turns_per_conv=10_000,
                        skip_xids=("evil",)).toPandas()
    huge = out[out["conv_id"] == "huge"]
    assert len(huge) == 1
    assert huge.iloc[0]["outcome"] == "overflow"
    assert huge.iloc[0]["n_ops"] == n_big            # conserved, not dropped
    ok = out[out["conv_id"] == "ok"]
    assert len(ok) == 1 and ok.iloc[0]["outcome"] == "commit"
    sk = out[out["conv_id"] == "skipme"]
    # evil vanished WHOLE: no record for it, no orphan, and its DML was NOT
    # reattributed to the enclosing txn
    assert list(sk["xid"]) == ["outer"]
    assert sk.iloc[0]["outcome"] == "commit"
    assert sk.iloc[0]["n_ops"] == 1 and sk.iloc[0]["total_rows"] == 5
