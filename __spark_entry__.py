"""Driver contract for the spark-graft builder (PySpark target).

Every operator family from SURVEY.md §2 has a `queries()` entry; each
SQL-expressible one has a matching `oracle_sql()` DuckDB twin (same column
aliases; order-insensitive compare). Non-SQL-expressible ops (MinHash/SimHash
via xxhash64, hyperplane LSH, transaction stack replay) ship without a DuckDB
oracle → the driver records the weaker rows-only check; their correctness is
pinned by pytest oracles instead: a from-spec pure-python XXH64 asserts the
hash VALUES bit-exact (tests/test_hash_oracle.py), blocking losslessness and
recall are brute-force-checked at driver parameters (tests/test_functions.py),
and the stack replay has a pure-python model + hypothesis conservation
properties (tests/test_aggregate.py, tests/test_properties.py).

Float policy for oracle equality: exact-decimal sums (CAST to DECIMAL before
SUM), double division only on identical operands, ROUND(…, k) at the end —
both engines then produce bit-identical doubles.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

FIXTURE_SF_DIR = "/root/repo/data/transcripts/sf0.01"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _fixture(spark: SparkSession, name: str) -> DataFrame:
    # transcripts fixtures are pinned to sf0.01 (matching the oracle paths)
    from openlogparse_spark.fixtures import ensure_fixtures

    ensure_fixtures(0.01)
    return spark.read.parquet(os.path.join(FIXTURE_SF_DIR, f"{name}.parquet"))


# --------------------------------------------------------------------------
# flagship: log-pipeline shape over the driver's events table
# parse (regex template) -> broadcast enrich -> hourly rollup
# --------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    sf_dir = "/root/testdata/sf0.001"
    events = _t(spark, sf_dir, "events")
    customer = _t(spark, sf_dir, "customer")
    parsed = events.withColumn(
        "k_val", F.regexp_extract("props", r'"k":\s*(\d+)', 1).cast("int")
    )
    enriched = parsed.join(
        F.broadcast(customer.select(F.col("c_custkey").alias("user_id"), "c_mktsegment")),
        "user_id", "left",
    )
    return (
        enriched.groupBy("event_type", F.date_trunc("hour", "ts").alias("hour_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k_val").alias("sum_k"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("event_type", "hour_bucket")
    )


# --------------------------------------------------------------------------
# query registry: {name: (spark_callable, oracle_sql | None)}
# --------------------------------------------------------------------------

def _q1_pricing_summary(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,4)")  # noqa: E731
    return (
        li.filter(F.col("l_shipdate") <= "2000-12-31 00:00:00")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - dec("l_discount")))
            .cast("double").alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


_Q1_SQL = """
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) *
           (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE)
      AS sum_disc_price,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-31 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def _q3_top_orders(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1998-01-01")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1998-01-01")
    dec = lambda c: F.col(c).cast("decimal(18,4)")  # noqa: E731
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - dec("l_discount")))
             .cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


_Q3_SQL = """
SELECT l_orderkey, o_orderdate,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) *
           (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


def _q5_nation_revenue(spark, sf_dir):
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,4)")  # noqa: E731
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - dec("l_discount")))
             .cast("double").alias("revenue"),
             F.count(F.lit(1)).alias("n_items"))
    )


_Q5_SQL = """
SELECT n_name,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) *
           (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue,
  COUNT(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
"""


def _enrich_parts(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    supp = _t(spark, sf_dir, "supplier")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.countDistinct("s_name").alias("n_suppliers"),
            F.round(F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double") /
                    F.count(F.lit(1)), 6).alias("avg_qty"),
        )
    )


_ENRICH_PARTS_SQL = """
SELECT p_brand, COUNT(*) AS n_items, COUNT(DISTINCT s_name) AS n_suppliers,
  ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_qty
FROM lineitem JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
GROUP BY p_brand
"""


def _topk_orders_per_customer(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("o_custkey", "o_orderkey", "rank",
                F.col("o_totalprice").cast("double").alias("totalprice"))
    )


_TOPK_SQL = """
SELECT o_custkey, o_orderkey, rank, CAST(o_totalprice AS DOUBLE) AS totalprice
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         CAST(row_number() OVER (PARTITION BY o_custkey
              ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT) AS rank
  FROM orders
) WHERE rank <= 3
"""


def _running_revenue(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    w = (Window.partitionBy("o_custkey")
         .orderBy("o_orderdate", "o_orderkey")
         .rowsBetween(Window.unboundedPreceding, 0))
    return orders.select(
        "o_custkey", "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w)
        .cast("double").alias("running_total"),
    )


_RUNNING_SQL = """
SELECT o_custkey, o_orderkey,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
FROM orders
"""


# ---------------------------- events (log shaped) -------------------------

def _parse_events(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id", "event_type",
        F.regexp_extract("props", r'"k":\s*(\d+)', 1).cast("int").alias("k_val"),
    )


_PARSE_EVENTS_SQL = """
SELECT event_id, event_type,
  CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS INT) AS k_val
FROM events
"""


def _events_hourly(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("hour_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


_EVENTS_HOURLY_SQL = """
SELECT event_type, date_trunc('hour', ts) AS hour_bucket,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
  COUNT(DISTINCT user_id) AS n_users
FROM events GROUP BY 1, 2
"""


def _sessionize_events(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ep = F.col("ts").cast("timestamp").cast("long")
    marked = ev.withColumn(
        "new_s",
        F.when(F.lag(ep).over(wo).isNull()
               | ((ep - F.lag(ep).over(wo)) > 1800), 1).otherwise(0),
    )
    wcum = wo.rowsBetween(Window.unboundedPreceding, 0)
    sess = marked.withColumn("sess_id", F.sum("new_s").over(wcum))
    per_sess = sess.groupBy("user_id", "sess_id").agg(F.count(F.lit(1)).alias("sess_len"))
    return per_sess.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.max("sess_len").alias("max_sess_len"),
    )


_SESSIONIZE_SQL = """
WITH marked AS (
  SELECT user_id, event_id, ts,
    CASE WHEN lag(ts) OVER w IS NULL
           OR epoch(ts) - lag(epoch(ts)) OVER w > 1800
         THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id,
    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
  FROM marked
), per_sess AS (
  SELECT user_id, sess_id, COUNT(*) AS sess_len FROM sess GROUP BY 1, 2
)
SELECT user_id, COUNT(*) AS n_sessions, MAX(sess_len) AS max_sess_len
FROM per_sess GROUP BY user_id
"""


def _cdc_changes(spark, sf_dir):
    """Update normalization (reference CHANGED-mode, Builder.cpp:1425-1542):
    before/after images per key version with unchanged-column drop."""
    from openlogparse_spark.functions.cdc import before_after

    ev = _t(spark, sf_dir, "events")
    ba = before_after(ev, key_cols=("user_id",), order_cols=("ts", "event_id"),
                      value_cols=("event_type", "props"))
    return ba.select(
        "user_id", "event_id", "op",
        F.col("before.event_type").alias("b_type"),
        F.col("after.event_type").alias("a_type"),
        F.array_join("changed_cols", ",").alias("changed"),
    )


_CDC_SQL = """
WITH v AS (
  SELECT user_id, event_id, event_type, props,
         lag(event_type) OVER w AS b_type,
         lag(props) OVER w AS b_props,
         row_number() OVER w AS rn
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, event_id,
  CASE WHEN rn = 1 THEN 'insert'
       WHEN (b_type IS DISTINCT FROM event_type)
         OR (b_props IS DISTINCT FROM props) THEN 'update'
       ELSE 'noop' END AS op,
  b_type, event_type AS a_type,
  CASE WHEN rn = 1 THEN ''
       ELSE COALESCE(array_to_string([c FOR c IN [
         CASE WHEN b_type IS DISTINCT FROM event_type THEN 'event_type' END,
         CASE WHEN b_props IS DISTINCT FROM props THEN 'props' END
       ] IF c IS NOT NULL], ','), '') END AS changed
FROM v
"""


def _user_enrich(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    cust = _t(spark, sf_dir, "customer")
    return (
        ev.join(F.broadcast(cust.select(F.col("c_custkey").alias("user_id"),
                                        "c_mktsegment")), "user_id", "left")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.countDistinct("user_id").alias("n_users"))
    )


_USER_ENRICH_SQL = """
SELECT c_mktsegment, COUNT(*) AS n_events, COUNT(DISTINCT user_id) AS n_users
FROM events LEFT JOIN customer ON user_id = c_custkey
GROUP BY c_mktsegment
"""


# ------------------------------ documents ---------------------------------

def _doc_tokens(spark, sf_dir):
    from openlogparse_spark.functions.text import token_count

    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", token_count(F.col("text")).alias("n_tokens"))


_DOC_TOKENS_SQL = """
SELECT doc_id,
  CASE WHEN length(trim(text)) = 0 THEN 0
       ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tokens
FROM documents
"""


def _doc_bpe_tokens(spark, sf_dir):
    from openlogparse_spark.functions.text import bpe_token_count

    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", bpe_token_count(F.col("text")).alias("n_bpe"))


_DOC_BPE_SQL = r"""
SELECT doc_id,
  len(regexp_extract_all(text,
      '''(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}'']+|\s+'))
    AS n_bpe
FROM documents
"""


def _doc_quality(spark, sf_dir):
    from openlogparse_spark.functions.text import punct_ratio, stopword_ratio

    docs = _t(spark, sf_dir, "documents")
    t = F.col("text")
    return docs.select(
        "doc_id",
        F.round(stopword_ratio(t), 4).alias("stop_ratio"),
        F.round(punct_ratio(t), 4).alias("p_ratio"),
    )


_DOC_QUALITY_SQL = """
WITH toks AS (
  SELECT doc_id, text, string_split_regex(lower(trim(text)), '\\s+') AS tk
  FROM documents
)
SELECT doc_id,
  ROUND(CAST(len(list_filter(tk, x -> x IN
    ('the','a','an','and','or','of','to','in','is','it',
     'for','on','with','as','at','by','this','that','be','are'))) AS DOUBLE)
    / greatest(len(tk), 1), 4) AS stop_ratio,
  ROUND(CAST(length(text) - length(regexp_replace(text, '[^\\s\\w]', '', 'g')) AS DOUBLE)
    / greatest(length(text), 1), 4) AS p_ratio
FROM toks
"""


def _doc_lang(spark, sf_dir):
    from openlogparse_spark.functions.text import lang_id

    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", lang_id(F.col("text")).alias("lang_pred"))


_DOC_LANG_SQL = """
WITH toks AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS tk FROM documents
)
SELECT doc_id,
  CASE WHEN CAST(len(list_filter(tk, x -> x IN
    ('the','a','an','and','or','of','to','in','is','it',
     'for','on','with','as','at','by','this','that','be','are'))) AS DOUBLE)
    / greatest(len(tk), 1) >= 0.08
  THEN 'en' ELSE 'other' END AS lang_pred
FROM toks
"""


def _doc_fingerprint(spark, sf_dir):
    from openlogparse_spark.functions.text import fingerprint

    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", fingerprint(F.col("text")).alias("fp"))


_DOC_FP_SQL = """
SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
FROM documents
"""


def _doc_winnow(spark, sf_dir):
    """Rolling-hash winnowing fingerprint (MOSS): per-doc selected-gram-hash
    count + extremes (the set itself is asserted by pytest; scalars here keep
    the oracle compare simple)."""
    from openlogparse_spark.functions.text import winnow_fingerprints

    docs = _t(spark, sf_dir, "documents")
    fp = F.col("fp_set")
    return winnow_fingerprints(docs).select(
        "doc_id",
        F.size(fp).alias("n_fp"),
        F.element_at(fp, 1).alias("fp_min"),
        F.element_at(fp, -1).alias("fp_max"),
    )


_DOC_WINNOW_SQL = """
WITH g AS (
  SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS norm
  FROM documents
), h AS (
  SELECT doc_id,
    [md5(substr(norm, i, 8)) FOR i IN generate_series(1, greatest(length(norm) - 7, 1))] AS hs
  FROM g
), m AS (
  SELECT doc_id,
    list_sort(list_distinct(
      [list_min(hs[i:i+3]) FOR i IN generate_series(1, greatest(len(hs) - 3, 1))]
    )) AS fp
  FROM h
)
SELECT doc_id, len(fp) AS n_fp, fp[1] AS fp_min, fp[-1] AS fp_max FROM m
"""


def _doc_pii(spark, sf_dir):
    """PII detect + scrub (training-data curation). The synthetic documents
    fixture carries no organic PII, so the query first DRESSES the input
    deterministically — emails / an IPv4 / an SSN-shaped id keyed on doc_id,
    reproduced verbatim in the DuckDB oracle's CTE — then runs the generic
    operator (functions/text.py pii_scan) over the dressed column."""
    from openlogparse_spark.functions.text import pii_scan

    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    dressed = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(did % 7 == 0,
                   F.concat(F.lit(" reach user"), did.cast("string"),
                            F.lit("@example.com or ops@test.org"))
                   ).otherwise(F.lit("")),
            F.when(did % 11 == 0,
                   F.concat(F.lit(" from host 10.0."),
                            (did % 256).cast("string"), F.lit(".77"))
                   ).otherwise(F.lit("")),
            F.when(did % 13 == 0, F.lit(" ref 123-45-6789")
                   ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return pii_scan(dressed, "text", "doc_id")


_DOC_PII_SQL = r"""
WITH dressed AS (
  SELECT doc_id,
    text
    || CASE WHEN doc_id % 7 = 0
            THEN ' reach user' || CAST(doc_id AS VARCHAR)
                 || '@example.com or ops@test.org'
            ELSE '' END
    || CASE WHEN doc_id % 11 = 0
            THEN ' from host 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.77'
            ELSE '' END
    || CASE WHEN doc_id % 13 = 0 THEN ' ref 123-45-6789' ELSE '' END AS text
  FROM documents
)
SELECT doc_id,
  CAST(len(regexp_extract_all(text,
      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
  CAST(len(regexp_extract_all(text,
      '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ipv4,
  CAST(len(regexp_extract_all(text,
      '\b\d{3}-\d{2}-\d{4}\b')) AS BIGINT) AS n_ids,
  regexp_replace(regexp_replace(regexp_replace(text,
      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
      '\b\d{3}-\d{2}-\d{4}\b', '<ID>', 'g') AS scrubbed
FROM dressed
"""


def _doc_split(spark, sf_dir):
    """Deterministic train/val/test assignment: md5-keyed cumulative-weight
    buckets (functions/curate.py split_assign) — reshard-stable, reproduced
    byte-for-byte by the DuckDB oracle's identical hex-threshold compare."""
    from openlogparse_spark.functions.curate import split_assign

    docs = _t(spark, sf_dir, "documents")
    return split_assign(docs.select("doc_id"),
                        weights={"train": 0.9, "val": 0.05, "test": 0.05},
                        salt="v1")


# thresholds: int(0.9 * 16^8) = 0xe6666666, int(0.95 * 16^8) = 0xf3333333
_DOC_SPLIT_SQL = """
SELECT doc_id,
  CASE WHEN substr(md5(CAST(doc_id AS VARCHAR) || ':v1'), 1, 8) < 'e6666666'
       THEN 'train'
       WHEN substr(md5(CAST(doc_id AS VARCHAR) || ':v1'), 1, 8) < 'f3333333'
       THEN 'val'
       ELSE 'test' END AS split
FROM documents
"""


def _curation_funnel(spark, sf_dir):
    """End-to-end curation funnel (raw -> exact keep-one -> near-dup
    keep-one -> quality floor -> splits), as per-stage survivor counts.
    Composes the individually-oracled operators; the DuckDB twin re-derives
    every stage independently (md5 grouping, shingle-Jaccard pairs, a
    RECURSIVE-CTE reachability closure, the quality expression, the split
    thresholds)."""
    from openlogparse_spark.functions.curate import curation_funnel

    docs = _t(spark, sf_dir, "documents")
    # max_shingle_df=None: the DuckDB twin models no df cap, so the capped
    # default would diverge on a corpus where the cap binds (ADVICE r5)
    return curation_funnel(docs, jaccard_n=3, jaccard_threshold=0.2,
                           min_quality=0.5,
                           weights={"train": 0.9, "val": 0.05, "test": 0.05},
                           salt="v1", max_shingle_df=None)


_CURATION_FUNNEL_SQL = """
WITH RECURSIVE ex AS (
  SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)
), surv AS (
  SELECT d.* FROM documents d JOIN ex USING (doc_id)
), toks AS (
  SELECT doc_id, string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS tk
  FROM surv
), sh AS (
  SELECT DISTINCT doc_id AS id, shingle FROM (
    SELECT doc_id, unnest([array_to_string(tk[i:i+2], ' ')
                           FOR i IN generate_series(1, greatest(len(tk)-2, 1))]) AS shingle
    FROM toks
  ) WHERE length(shingle) > 0
), sizes AS (
  SELECT id, COUNT(*) AS sz FROM sh GROUP BY id
), inter AS (
  SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS n_inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
  GROUP BY 1, 2
), prs AS (
  SELECT id_a, id_b
  FROM inter
  JOIN sizes sa ON sa.id = id_a
  JOIN sizes sb ON sb.id = id_b
  WHERE CAST(n_inter AS DOUBLE) / (sa.sz + sb.sz - n_inter) >= 0.2
), edges AS (
  SELECT id_a AS u, id_b AS v FROM prs
  UNION
  SELECT id_b AS u, id_a AS v FROM prs
), reach(u, r) AS (
  SELECT doc_id AS u, doc_id AS r FROM surv
  UNION
  SELECT e.u, reach.r FROM edges e JOIN reach ON e.v = reach.u
), comp AS (
  SELECT u AS id, MIN(r) AS component FROM reach GROUP BY u
), reps AS (
  SELECT DISTINCT component AS doc_id FROM comp
), final AS (
  SELECT s.doc_id FROM surv s JOIN reps USING (doc_id)
  WHERE ROUND((
      least(CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                      ELSE len(string_split_regex(trim(text), '\\s+')) END
                 AS DOUBLE) / 20.0, 1.0)
    + least(CAST(len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                                 x -> x IN ('the','a','an','and','or','of','to','in','is','it',
                                            'for','on','with','as','at','by','this','that','be','are')))
                 AS DOUBLE)
            / greatest(len(string_split_regex(lower(trim(text)), '\\s+')), 1) * 5.0, 1.0)
    + 1.0 - least(CAST(length(text) - length(regexp_replace(text, '[^\\s\\w]', '', 'g')) AS DOUBLE)
                  / greatest(length(text), 1) * 4.0, 1.0)
  ) / 3.0, 4) >= 0.5
), sp AS (
  SELECT doc_id,
    CASE WHEN substr(md5(CAST(doc_id AS VARCHAR) || ':v1'), 1, 8) < 'e6666666'
         THEN 'train'
         WHEN substr(md5(CAST(doc_id AS VARCHAR) || ':v1'), 1, 8) < 'f3333333'
         THEN 'val'
         ELSE 'test' END AS split
  FROM final
)
SELECT '00_raw' AS stage, COUNT(*) AS n FROM documents
UNION ALL SELECT '10_exact_unique', COUNT(*) FROM ex
UNION ALL SELECT '20_near_unique', COUNT(*) FROM reps
UNION ALL SELECT '30_quality', COUNT(*) FROM final
UNION ALL SELECT '40_split_' || split, COUNT(*) FROM sp GROUP BY split
"""


def _doc_repetition(spark, sf_dir):
    """Duplicate-trigram fraction per document (functions/text.py
    repetition_ratio) — Gopher-style boilerplate/looped-text gate; pure
    per-row column algebra, no shuffle."""
    from openlogparse_spark.functions.text import repetition_ratio

    return repetition_ratio(_t(spark, sf_dir, "documents"))


_DOC_REPETITION_SQL = """
WITH toks AS (
  SELECT doc_id,
    string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS tk
  FROM documents
), g AS (
  SELECT doc_id, list_sort([x FOR x IN
      [array_to_string(tk[i:i+2], ' ')
       FOR i IN generate_series(1, greatest(len(tk)-2, 1))]
      IF length(x) > 0]) AS sg
  FROM toks
)
SELECT doc_id,
  CASE WHEN len(sg) = 0 THEN 0.0
       ELSE ROUND(CAST(len(list_filter(generate_series(1, len(sg)), i ->
              (i > 1 AND sg[i] = sg[i-1])
              OR (i < len(sg) AND sg[i] = sg[i+1]))) AS DOUBLE)
            / len(sg), 4) END AS rep_ratio
FROM g
"""


def _doc_pack(spark, sf_dir):
    """Concatenate-and-chunk sequence-packing plan per source group
    (functions/curate.py pack_plan): one window cumsum, parallel across
    groups; chunk ids are deterministic under resharding."""
    from openlogparse_spark.functions.curate import pack_plan
    from openlogparse_spark.functions.text import token_count

    docs = _t(spark, sf_dir, "documents")
    sized = docs.select("doc_id", "source",
                        token_count(F.col("text")).alias("n_tokens"))
    return pack_plan(sized, context_len=512, tokens_col="n_tokens",
                     id_col="doc_id", group_col="source")


_DOC_PACK_SQL = """
WITH sized AS (
  SELECT doc_id, source,
    CASE WHEN length(trim(text)) = 0 THEN 0
         ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tokens
  FROM documents
), cum AS (
  SELECT doc_id, source AS grp, n_tokens,
    SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                        ROWS UNBOUNDED PRECEDING) AS cum_incl
  FROM sized
)
SELECT doc_id, grp,
  CAST(cum_incl - n_tokens AS BIGINT) AS tok_start,
  CAST(floor((cum_incl - n_tokens) / 512.0) AS BIGINT) AS chunk_first,
  CAST(floor((cum_incl - 1) / 512.0) AS BIGINT) AS chunk_last
FROM cum
"""


def _dedup_exact(spark, sf_dir):
    from openlogparse_spark.functions.dedup import exact_dedup

    docs = _t(spark, sf_dir, "documents")
    return exact_dedup(docs)


_DEDUP_EXACT_SQL = """
WITH fp AS (SELECT doc_id, md5(text) AS fp FROM documents),
keep AS (SELECT fp, MIN(doc_id) AS keep_id FROM fp GROUP BY fp)
SELECT doc_id, fp.fp AS fp, keep_id, doc_id != keep_id AS is_dup
FROM fp JOIN keep USING (fp)
"""


def _jaccard_pairs(spark, sf_dir):
    from openlogparse_spark.functions.dedup import jaccard_pairs

    docs = _t(spark, sf_dir, "documents")
    return jaccard_pairs(docs, n=3, threshold=0.2)


_JACCARD_SQL = """
WITH toks AS (
  SELECT doc_id, string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS tk
  FROM documents
), sh AS (
  SELECT DISTINCT doc_id AS id, shingle FROM (
    SELECT doc_id, unnest([array_to_string(tk[i:i+2], ' ')
                           FOR i IN generate_series(1, greatest(len(tk)-2, 1))]) AS shingle
    FROM toks
  ) WHERE length(shingle) > 0
), sizes AS (
  SELECT id, COUNT(*) AS sz FROM sh GROUP BY id
), inter AS (
  SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS n_inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
  ROUND(CAST(n_inter AS DOUBLE) / (sa.sz + sb.sz - n_inter), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.id = id_a
JOIN sizes sb ON sb.id = id_b
WHERE CAST(n_inter AS DOUBLE) / (sa.sz + sb.sz - n_inter) >= 0.2
"""


def _dedup_components(spark, sf_dir):
    """Transitive near-dup clustering: jaccard pairs -> connected components
    (keep-one-per-cluster step); singletons are their own component."""
    from openlogparse_spark.functions.dedup import dup_components, jaccard_pairs

    docs = _t(spark, sf_dir, "documents")
    pairs = jaccard_pairs(docs, n=3, threshold=0.2)
    return dup_components(pairs, all_ids=docs.select("doc_id"))


_DEDUP_COMPONENTS_SQL = """
WITH RECURSIVE toks AS (
  SELECT doc_id, string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS tk
  FROM documents
), sh AS (
  SELECT DISTINCT doc_id AS id, shingle FROM (
    SELECT doc_id, unnest([array_to_string(tk[i:i+2], ' ')
                           FOR i IN generate_series(1, greatest(len(tk)-2, 1))]) AS shingle
    FROM toks
  ) WHERE length(shingle) > 0
), sizes AS (
  SELECT id, COUNT(*) AS sz FROM sh GROUP BY id
), inter AS (
  SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS n_inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
  GROUP BY 1, 2
), pairs AS (
  SELECT id_a, id_b
  FROM inter
  JOIN sizes sa ON sa.id = id_a
  JOIN sizes sb ON sb.id = id_b
  WHERE CAST(n_inter AS DOUBLE) / (sa.sz + sb.sz - n_inter) >= 0.2
), edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION
  SELECT id_b AS u, id_a AS v FROM pairs
), reach(u, r) AS (
  SELECT doc_id AS u, doc_id AS r FROM documents
  UNION
  SELECT e.u, reach.r FROM edges e JOIN reach ON e.v = reach.u
)
SELECT u AS id, MIN(r) AS component FROM reach GROUP BY u
"""


def _minhash_lsh(spark, sf_dir):
    from openlogparse_spark.functions.dedup import minhash_lsh_pairs

    docs = _t(spark, sf_dir, "documents")
    return minhash_lsh_pairs(docs, num_hashes=64, bands=16, threshold=0.3)


def _simhash_pairs(spark, sf_dir):
    from openlogparse_spark.functions.dedup import simhash_near_pairs

    docs = _t(spark, sf_dir, "documents")
    return simhash_near_pairs(docs, max_hamming=8)


# ------------------------------ embeddings --------------------------------

def _ann_cosine_topk(spark, sf_dir):
    from openlogparse_spark.functions.similarity import cosine_topk

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return cosine_topk(emb, queries, k=5)


_ANN_SQL = """
WITH q AS (SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id < 5),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
    ROUND(list_dot_product(q.qvec::DOUBLE[], e.embedding::DOUBLE[]) /
          (sqrt(list_dot_product(q.qvec::DOUBLE[], q.qvec::DOUBLE[])) *
           sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))), 4) AS score
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id != q.query_id
)
SELECT query_id, neighbor_id, rank, score FROM (
  SELECT query_id, neighbor_id, score,
    CAST(row_number() OVER (PARTITION BY query_id
         ORDER BY score DESC, neighbor_id ASC) AS INT) AS rank
  FROM scored
) WHERE rank <= 5
"""


def _embed_near_pairs_lsh(spark, sf_dir):
    """Scale path of embed_near_pairs: narrow-row hyperplane-LSH candidates
    with Hamming-1 multi-probe, exact cosine verify on survivors. Approximate
    (recall pinned >=0.9 by pytest vs brute) — rows-only driver check."""
    from openlogparse_spark.functions.similarity import cosine_near_pairs

    emb = _t(spark, sf_dir, "embeddings")
    return cosine_near_pairs(emb, threshold=0.35, method="lsh")


def _embed_near_pairs(spark, sf_dir):
    from openlogparse_spark.functions.similarity import cosine_near_pairs

    emb = _t(spark, sf_dir, "embeddings")
    return cosine_near_pairs(emb, threshold=0.35, method="brute")


_EMBED_NEAR_SQL = """
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
  ROUND(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
        (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
         sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 4) AS score
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE ROUND(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
      (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
       sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 4) >= 0.35
"""


def _ann_lsh_topk(spark, sf_dir):
    from openlogparse_spark.functions.similarity import lsh_cosine_topk

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return lsh_cosine_topk(emb, queries, k=5)


# --------------------------- transcripts (north rule) ----------------------

_DUCK_STRIP = ("CASE WHEN text LIKE '%\\' THEN rtrim(substr(text, 1, length(text) - 1)) "
               "ELSE text END")

_DUCK_MERGE_CTE = f"""
ordered AS (
  SELECT conv_id, turn_idx, role, text, tool, ts,
         CASE WHEN lag(text) OVER w LIKE '%\\' THEN 0 ELSE 1 END AS head
  FROM '{FIXTURE_SF_DIR}/transcripts.parquet'
  WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
), grp AS (
  SELECT *, SUM(head) OVER (PARTITION BY conv_id ORDER BY turn_idx
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g
  FROM ordered
), merged AS (
  SELECT conv_id, MIN(turn_idx) AS turn_idx,
         arg_min(role, turn_idx) AS role,
         string_agg({_DUCK_STRIP}, ' ' ORDER BY turn_idx) AS text,
         arg_min(tool, turn_idx) AS tool,
         arg_min(ts, turn_idx) AS ts
  FROM grp GROUP BY conv_id, g
)
"""

from openlogparse_spark.parse.stage import MASK_DUCKDB_EXPR as _DUCK_MASK  # noqa: E402

_DUCK_PARSED_CTE = _DUCK_MERGE_CTE + f""", masked AS (
  SELECT *, {_DUCK_MASK} AS template FROM merged
), supported AS (
  SELECT template FROM masked GROUP BY template HAVING COUNT(*) >= 2
), parsed AS (
  SELECT m.*, substr(md5(m.template), 1, 12) AS template_id,
         s.template IS NOT NULL AS parse_ok
  FROM masked m LEFT JOIN supported s USING (template)
)
"""


def _t_merge_text(spark, sf_dir):
    from openlogparse_spark.parse import merge_row_pieces

    raw = _fixture(spark, "transcripts")
    return merge_row_pieces(raw).select("conv_id", "turn_idx", "text")


_T_MERGE_SQL = f"WITH {_DUCK_MERGE_CTE} SELECT conv_id, turn_idx, text FROM merged"


def _t_template_counts(spark, sf_dir):
    from openlogparse_spark.parse import parse_stage

    raw = _fixture(spark, "transcripts")
    return (
        parse_stage(raw).filter("parse_ok")
        .groupBy("template_id", "template")
        .agg(F.count(F.lit(1)).alias("n_turns"))
    )


_T_TEMPLATE_COUNTS_SQL = f"""
WITH {_DUCK_PARSED_CTE}
SELECT template_id, template, COUNT(*) AS n_turns
FROM parsed WHERE parse_ok GROUP BY 1, 2
"""


def _t_template_counts_drain(spark, sf_dir):
    """Same invariant as t_template_counts but through the pandas Drain
    mining path (SURVEY §4 custom piece #1, parse/stage.py — the Arrow-batch
    tree-mining stage), giving the drain mode its own DuckDB-green driver
    row instead of only the in-repo drain/sql parity pytest.

    Restricted to k=v-structured rows (text containing '='): on those the
    two parsers MUST agree, so the masking oracle applies; free-form garbage
    is where Drain intentionally diverges — it clusters it while the sql
    mask quarantines it — and no SQL oracle can express that clustering."""
    from openlogparse_spark.parse import parse_stage

    raw = _fixture(spark, "transcripts")
    return (
        parse_stage(raw, mode="drain")
        .filter("parse_ok AND contains(text, '=')")
        .groupBy("template_id", "template")
        .agg(F.count(F.lit(1)).alias("n_turns"))
    )


def _t_agg_hourly(spark, sf_dir):
    from openlogparse_spark.aggregate import agg_hourly
    from openlogparse_spark.parse import parse_stage

    raw = _fixture(spark, "transcripts")
    return agg_hourly(parse_stage(raw).filter("parse_ok"))


_T_AGG_HOURLY_SQL = f"""
WITH {_DUCK_PARSED_CTE}
SELECT template_id, tool, date_trunc('hour', ts) AS hour_bucket,
       COUNT(*) AS n_turns, COUNT(DISTINCT conv_id) AS n_convs
FROM parsed WHERE parse_ok GROUP BY 1, 2, 3
"""


def _t_route_counts(spark, sf_dir):
    """Per-sink routed-row counts — THE north-rule equality, as a driver query."""
    from openlogparse_spark.enrich import enrich_stage
    from openlogparse_spark.parse import parse_stage
    from openlogparse_spark.route import compile_route_filter

    raw = _fixture(spark, "transcripts")
    enriched = enrich_stage(
        parse_stage(raw),
        _fixture(spark, "dim_tools"),
        _fixture(spark, "dim_roles"),
    ).filter("parse_ok")
    routes = _fixture(spark, "routes").toPandas().to_dict("records")
    # ONE pass, one conditional sum per route, then unpivot — the router's
    # single-scan trick as a counting query (vs one Spark job per route)
    aggs = [
        F.sum(F.when(compile_route_filter(r["template_pattern"], r["condition"]),
                     F.lit(1)).otherwise(F.lit(0))).alias(r["route_id"])
        for r in routes
    ]
    pairs = ", ".join(f"'{r['route_id']}', `{r['route_id']}`" for r in routes)
    return enriched.agg(*aggs).selectExpr(
        f"stack({len(routes)}, {pairs}) AS (route_id, n_rows)")


_T_ROUTE_COUNTS_SQL = f"""
WITH {_DUCK_PARSED_CTE}, enriched AS (
  SELECT p.*,
    CASE WHEN p.tool IS NULL THEN NULL ELSE coalesce(dt.category, 'unknown') END AS category,
    CASE WHEN p.tool IS NULL THEN NULL ELSE coalesce(dt.risk, 'unknown') END AS risk
  FROM parsed p LEFT JOIN '{FIXTURE_SF_DIR}/dim_tools.parquet' dt USING (tool)
  WHERE p.parse_ok
)
SELECT 'r_high_risk_calls' AS route_id, COUNT(*) AS n_rows FROM enriched
  WHERE regexp_matches(template, '^CALL ') AND risk = 'high'
UNION ALL SELECT 'r_errors', COUNT(*) FROM enriched
  WHERE regexp_matches(template, '^(ERROR|WARN) ')
UNION ALL SELECT 'r_txn', COUNT(*) FROM enriched
  WHERE regexp_matches(template, '^(BEGIN|COMMIT|ROLLBACK)')
UNION ALL SELECT 'r_net', COUNT(*) FROM enriched
  WHERE regexp_matches(template, '^(CALL|RESULT) ') AND category = 'net'
UNION ALL SELECT 'r_system', COUNT(*) FROM enriched
  WHERE regexp_matches(template, '.*') AND role = 'system'
UNION ALL SELECT 'r_none', COUNT(*) FROM enriched
  WHERE regexp_matches(template, '^CALL ') AND risk = 'impossible'
"""


def _t_conv_stats(spark, sf_dir):
    from openlogparse_spark.aggregate import conv_stats
    from openlogparse_spark.parse import parse_stage

    raw = _fixture(spark, "transcripts")
    return conv_stats(parse_stage(raw)).select(
        "conv_id", "n_turns", "duration_s",
        F.round("avg_gap_s", 6).alias("avg_gap_s"),
    )


_T_CONV_STATS_SQL = f"""
WITH {_DUCK_MERGE_CTE}, g AS (
  SELECT conv_id, epoch(ts) - lag(epoch(ts)) OVER
         (PARTITION BY conv_id ORDER BY turn_idx) AS gap_s,
         epoch(ts) AS ep
  FROM merged
)
SELECT conv_id, COUNT(*) AS n_turns,
  CAST(MAX(ep) - MIN(ep) AS BIGINT) AS duration_s,
  ROUND(AVG(gap_s), 6) AS avg_gap_s
FROM g GROUP BY conv_id
"""


def _t_ddl_classify(spark, sf_dir):
    """DDL parse/classify (ref: DDL opcode parse → type classification,
    SURVEY §2 P8): per-statement-type counts over the ddl template."""
    from openlogparse_spark.parse import parse_stage

    raw = _fixture(spark, "transcripts")
    p = parse_stage(raw).filter("parse_ok")
    return (
        p.filter(F.col("template").startswith("DDL "))
        .groupBy(F.col("params")["stmt"].alias("ddl_type"))
        .agg(F.count(F.lit(1)).alias("n_stmts"),
             F.countDistinct("conv_id").alias("n_convs"))
    )


_T_DDL_SQL = f"""
WITH {_DUCK_PARSED_CTE}
SELECT NULLIF(regexp_extract(text, '(^| )stmt=([^ ]+)', 2), '') AS ddl_type,
       COUNT(*) AS n_stmts, COUNT(DISTINCT conv_id) AS n_convs
FROM parsed WHERE parse_ok AND template LIKE 'DDL %'
GROUP BY 1
"""


def _t_params_typed(spark, sf_dir):
    """Typed param decode (reference Builder::processValue analogue): native
    bigint sums over decoded k=v values, grouped per template."""
    from openlogparse_spark.parse import parse_stage
    from openlogparse_spark.parse.stage import typed_params

    raw = _fixture(spark, "transcripts")
    p = typed_params(parse_stage(raw).filter("parse_ok"))
    return p.groupBy("template_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.sum(F.col("p.rows")).alias("sum_rows"),
        F.sum(F.col("p.bytes")).alias("sum_bytes"),
        F.sum(F.col("p.tokens")).alias("sum_tokens"),
        F.max(F.col("p.scn")).alias("max_scn"),
        # TIMESTAMP-typed decode (reference Builder.cpp:210-252 DATE/TS
        # emit): native max over the chkpt template's at=<iso-ts> param
        F.max(F.col("p.at")).alias("max_at"),
        # INTERVAL-typed decode (reference Builder.cpp:354-589 INTERVAL_DTS
        # emit): lag=H:MM:SS decodes to a day-time interval; exercise both
        # interval->numeric (total seconds) and timestamp+interval arithmetic
        F.sum(F.col("p.lag").cast("bigint")).alias("sum_lag_secs"),
        F.max(F.col("p.at") + F.col("p.lag")).alias("max_eta"),
        # YEAR TO MONTH interval decode (INTERVAL_YTM, Format.h:47-54): the
        # ddl ret=Y-M param is a real YearMonthIntervalType column; cast to
        # int = total months (DuckDB recomputes arithmetically — it cannot
        # parse 'Y-M' interval strings)
        F.max(F.col("p.ret").cast("int")).alias("max_ret_months"),
    )


_T_PARAMS_TYPED_SQL = f"""
WITH {_DUCK_PARSED_CTE}
SELECT template_id, COUNT(*) AS n_turns,
  SUM(TRY_CAST(NULLIF(regexp_extract(text, '(^| )rows=([^ ]+)', 2), '') AS BIGINT)) AS sum_rows,
  SUM(TRY_CAST(NULLIF(regexp_extract(text, '(^| )bytes=([^ ]+)', 2), '') AS BIGINT)) AS sum_bytes,
  SUM(TRY_CAST(NULLIF(regexp_extract(text, '(^| )tokens=([^ ]+)', 2), '') AS BIGINT)) AS sum_tokens,
  MAX(TRY_CAST(NULLIF(regexp_extract(text, '(^| )scn=([^ ]+)', 2), '') AS BIGINT)) AS max_scn,
  MAX(TRY_CAST(NULLIF(regexp_extract(text, '(^| )at=([^ ]+)', 2), '') AS TIMESTAMP)) AS max_at,
  SUM(CAST(epoch(TRY_CAST(NULLIF(regexp_extract(text, '(^| )lag=([^ ]+)', 2), '') AS INTERVAL)) AS BIGINT)) AS sum_lag_secs,
  MAX(TRY_CAST(NULLIF(regexp_extract(text, '(^| )at=([^ ]+)', 2), '') AS TIMESTAMP)
      + TRY_CAST(NULLIF(regexp_extract(text, '(^| )lag=([^ ]+)', 2), '') AS INTERVAL)) AS max_eta,
  MAX(12 * TRY_CAST(split_part(NULLIF(regexp_extract(text, '(^| )ret=([^ ]+)', 2), ''), '-', 1) AS INT)
      + TRY_CAST(split_part(NULLIF(regexp_extract(text, '(^| )ret=([^ ]+)', 2), ''), '-', 2) AS INT)) AS max_ret_months
FROM parsed WHERE parse_ok GROUP BY template_id
"""


def _t_json_roundtrip(spark, sf_dir):
    """JSON message serialization (BuilderJson shape) must round-trip: emit
    to_json messages, parse them back, compare against the source columns."""
    from openlogparse_spark.functions.serialize import from_message_json, to_message_json
    from openlogparse_spark.parse import parse_stage

    raw = _fixture(spark, "transcripts")
    parsed = parse_stage(raw).filter("parse_ok")
    rt = from_message_json(to_message_json(parsed).select("value"))
    return rt.select("conv_id", "turn_idx", "template_id", "text")


_T_JSON_ROUNDTRIP_SQL = f"""
WITH {_DUCK_PARSED_CTE}
SELECT conv_id, turn_idx, template_id, text FROM parsed WHERE parse_ok
"""


def _t_conv_outcomes(spark, sf_dir):
    from openlogparse_spark.aggregate import conv_outcomes
    from openlogparse_spark.parse import parse_stage

    raw = _fixture(spark, "transcripts")
    return conv_outcomes(parse_stage(raw).filter("parse_ok"))


# ------------------------------ registry -----------------------------------

_REGISTRY: dict[str, tuple[Callable, str | None]] = {
    # TPC-H-style relational core (scan/filter/agg/join/sort/limit/window)
    "q1_pricing_summary": (_q1_pricing_summary, _Q1_SQL),
    "q3_top_orders": (_q3_top_orders, _Q3_SQL),
    "q5_nation_revenue": (_q5_nation_revenue, _Q5_SQL),
    "enrich_parts": (_enrich_parts, _ENRICH_PARTS_SQL),
    "topk_orders_per_customer": (_topk_orders_per_customer, _TOPK_SQL),
    "running_revenue": (_running_revenue, _RUNNING_SQL),
    # events: log-pipeline shape (parse/enrich/rollup/sessionize)
    "parse_events": (_parse_events, _PARSE_EVENTS_SQL),
    "events_hourly": (_events_hourly, _EVENTS_HOURLY_SQL),
    "sessionize_events": (_sessionize_events, _SESSIONIZE_SQL),
    "user_enrich": (_user_enrich, _USER_ENRICH_SQL),
    "cdc_changes": (_cdc_changes, _CDC_SQL),
    # documents: training-data text ops
    "doc_tokens": (_doc_tokens, _DOC_TOKENS_SQL),
    "doc_bpe_tokens": (_doc_bpe_tokens, _DOC_BPE_SQL),
    "doc_quality": (_doc_quality, _DOC_QUALITY_SQL),
    "doc_lang": (_doc_lang, _DOC_LANG_SQL),
    "doc_fingerprint": (_doc_fingerprint, _DOC_FP_SQL),
    "doc_winnow": (_doc_winnow, _DOC_WINNOW_SQL),
    "doc_pii": (_doc_pii, _DOC_PII_SQL),
    "doc_split": (_doc_split, _DOC_SPLIT_SQL),
    "curation_funnel": (_curation_funnel, _CURATION_FUNNEL_SQL),
    "doc_pack": (_doc_pack, _DOC_PACK_SQL),
    "doc_repetition": (_doc_repetition, _DOC_REPETITION_SQL),
    "dedup_exact": (_dedup_exact, _DEDUP_EXACT_SQL),
    "jaccard_pairs": (_jaccard_pairs, _JACCARD_SQL),
    "dedup_components": (_dedup_components, _DEDUP_COMPONENTS_SQL),
    "minhash_lsh_pairs": (_minhash_lsh, None),     # xxhash64 family: no SQL twin
    "simhash_near_pairs": (_simhash_pairs, None),  # xxhash64 family: no SQL twin
    # embeddings: similarity search
    "ann_cosine_topk": (_ann_cosine_topk, _ANN_SQL),
    "ann_lsh_topk": (_ann_lsh_topk, None),         # hyperplane sigs: no SQL twin
    "embed_near_pairs": (_embed_near_pairs, _EMBED_NEAR_SQL),
    "embed_near_pairs_lsh": (_embed_near_pairs_lsh, None),  # approximate: no SQL twin
    # transcripts: the north-rule pipeline invariants as driver queries
    "t_merge_text": (_t_merge_text, _T_MERGE_SQL),
    "t_template_counts": (_t_template_counts, _T_TEMPLATE_COUNTS_SQL),
    "t_template_counts_drain": (_t_template_counts_drain, _T_TEMPLATE_COUNTS_SQL),
    "t_agg_hourly": (_t_agg_hourly, _T_AGG_HOURLY_SQL),
    "t_route_counts": (_t_route_counts, _T_ROUTE_COUNTS_SQL),
    "t_conv_stats": (_t_conv_stats, _T_CONV_STATS_SQL),
    "t_conv_outcomes": (_t_conv_outcomes, None),   # stack replay: no SQL twin
    "t_params_typed": (_t_params_typed, _T_PARAMS_TYPED_SQL),
    "t_json_roundtrip": (_t_json_roundtrip, _T_JSON_ROUNDTRIP_SQL),
    "t_ddl_classify": (_t_ddl_classify, _T_DDL_SQL),
}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in _REGISTRY.items() if sql is not None}
