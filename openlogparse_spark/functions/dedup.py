"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale design notes (the point of each variant at 100 TB):
  - exact: one hash-groupBy; map-side combine makes the shuffle carry one row
    per distinct hash. O(n) scan, tiny shuffle.
  - n-gram Jaccard: exact pairwise similarity but only across pairs sharing a
    shingle (the shingle-join prunes the n² space). Fine for ≤ millions of
    docs per shingle bucket; superseded by MinHash at web scale.
  - MinHash+LSH: constant-size signature (k mins) per doc, banded into b
    buckets; candidate pairs only within equal (band, band_hash) — the
    standard web-dedup path (Broder '97; Leskovec et al., MMDS ch.3). All
    hashing via xxhash64 JVM-side; no UDF.
  - SimHash: 64-bit near-dup fingerprint (Charikar '02); Hamming-adjacent
    fingerprints are candidates. Bit arithmetic via bitwise aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup by content hash: per duplicate group keep min(id).

    Returns (id, fp, keep_id, is_dup)."""
    withfp = df.select(id_col, F.md5(F.col(text_col)).alias("fp"))
    keep = withfp.groupBy("fp").agg(F.min(id_col).alias("keep_id"))
    return (
        withfp.join(keep, "fp")
        .select(
            id_col, "fp", "keep_id",
            (F.col(id_col) != F.col("keep_id")).alias("is_dup"),
        )
    )


def _norm(text_col: str) -> F.Column:
    return F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")


def shingles(df: DataFrame, n: int = 3, text_col: str = "text",
             id_col: str = "doc_id") -> DataFrame:
    """Distinct word n-gram shingles per document: (id, shingle)."""
    toks = F.split(_norm(text_col), " ")
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
        lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
    )
    return (
        df.select(F.col(id_col).alias("id"), F.explode(F.array_distinct(grams)).alias("shingle"))
        .filter(F.length("shingle") > 0)
    )


def jaccard_pairs(df: DataFrame, n: int = 3, threshold: float = 0.8,
                  text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact n-gram Jaccard over pairs sharing ≥1 shingle.

    Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard >= threshold."""
    sh = shingles(df, n, text_col, id_col)
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "id_a").join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(F.col("n_inter")
                    / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_signatures(df: DataFrame, num_hashes: int = 64, n: int = 3,
                       text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, sig array<long>): k independent min-hashes of the shingle set.

    Hash family: xxhash64(seed_i, shingle) — JVM intrinsic, no UDF; one
    explode + one groupBy (map-side combined mins)."""
    sh = shingles(df, n, text_col, id_col)
    mins = [
        F.min(F.xxhash64(F.lit(i), F.col("shingle"))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    sig = sh.groupBy("id").agg(*mins)
    return sig.select("id", F.array(*[f"h{i}" for i in range(num_hashes)]).alias("sig"))


def minhash_lsh_pairs(df: DataFrame, num_hashes: int = 64, bands: int = 16,
                      n: int = 3, threshold: float = 0.5,
                      text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Candidate near-dup pairs via banded LSH, then verified by estimated
    Jaccard (signature agreement). Returns (id_a, id_b, est_jaccard)."""
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, num_hashes, n, text_col, id_col)
    banded = sig.select(
        "id", "sig",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.xxhash64(*[F.col("sig")[b * rows_per_band + r]
                                 for r in range(rows_per_band)]).alias("bh"),
                )
                for b in range(bands)
            ])
        ).alias("bb"),
    ).select("id", "sig", "bb.band", "bb.bh")
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.bh") == F.col("b.bh"))
               & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                F.col("a.sig").alias("sig_a"), F.col("b.sig").alias("sig_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    est = F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                          lambda m: m)) / F.lit(float(num_hashes))
    return (
        cand.withColumn("est_jaccard", F.round(est, 6))
        .filter(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
    )


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash per document (token-level, unweighted).

    Pure column algebra: per-token xxhash64 → per-bit ±1 votes aggregated via
    explode + groupBy — stays JVM-side (no UDF), shuffles one row per
    (doc, bit)."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(_norm(text_col), " ")).alias("tok"),
    ).filter(F.length("tok") > 0)
    h = toks.withColumn("h", F.xxhash64("tok"))
    bits = h.select(
        "id",
        F.explode(F.sequence(F.lit(0), F.lit(63))).alias("bit"),
        "h",
    ).withColumn(
        # column-valued shift amounts need the SQL form (F.shiftright takes
        # a Python int only)
        "vote",
        F.expr("IF((shiftright(h, bit) & 1) = 1, 1, -1)"),
    )
    votes = bits.groupBy("id", "bit").agg(F.sum("vote").alias("v"))
    return votes.groupBy("id").agg(
        F.sum(
            F.expr("IF(v > 0, shiftleft(CAST(1 AS BIGINT), bit), CAST(0 AS BIGINT))")
        ).alias("simhash")
    )


def simhash_near_pairs(df: DataFrame, max_hamming: int = 3,
                       text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Near-dup candidates: block on 16-bit simhash chunks (a pair within
    Hamming distance 3 of a 64-bit hash must agree on ≥1 of 4 chunks), then
    verify exact Hamming distance."""
    s = simhash(df, text_col, id_col)
    chunked = s.select(
        "id", "simhash",
        F.explode(F.array(*[
            F.struct(F.lit(c).alias("chunk"),
                     F.shiftright("simhash", c * 16).bitwiseAND(F.lit(0xFFFF)).alias("cv"))
            for c in range(4)
        ])).alias("ch"),
    ).select("id", "simhash", "ch.chunk", "ch.cv")
    a, b = chunked.alias("a"), chunked.alias("b")
    cand = (
        a.join(b, (F.col("a.chunk") == F.col("b.chunk"))
               & (F.col("a.cv") == F.col("b.cv"))
               & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                F.col("a.simhash").alias("sh_a"), F.col("b.simhash").alias("sh_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cand.withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
