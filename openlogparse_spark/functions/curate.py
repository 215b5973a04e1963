"""Training-data curation: deterministic dataset splits and the end-to-end
dedup -> quality -> split funnel.

These compose the operators this package already oracles one-by-one
(exact_dedup, jaccard_pairs, dup_components, quality_score) into the shape a
production curation run actually executes, plus the one primitive every such
run needs and Spark does not ship portably: a RESHARD-STABLE train/val/test
assignment (``sample()``/``randomSplit()`` depend on partitioning and seed
plumbing; a content-keyed hash does not).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .cache import release_on_gc
from .dedup import dup_components, exact_dedup, jaccard_pairs
from .text import quality_score

_HEX_SPACE = 16 ** 8  # first 8 md5 hex digits: uniform in [0, 16^8)


def split_key(id_col: Column, salt: str) -> Column:
    """First 8 lowercase-hex digits of md5(id ':' salt) — fixed-width hex
    compares lexicographically exactly as its numeric value, and md5 is
    engine-portable, so a DuckDB oracle reproduces assignments exactly
    (a seeded rand() would not)."""
    return F.substring(F.md5(F.concat(id_col.cast("string"),
                                      F.lit(":" + salt))), 1, 8)


def split_assign(df: DataFrame, weights: dict[str, float] | None = None,
                 salt: str = "v1", id_col: str = "doc_id",
                 out_col: str = "split") -> DataFrame:
    """Deterministic, reproducible train/val/test assignment.

    Buckets the split key against cumulative-weight thresholds (last bucket
    takes the remainder, so weights need not sum exactly to 1 in floating
    point). Pure per-row map: no shuffle, no state — any doc's assignment is
    independent of corpus size, partitioning, or arrival order, which is what
    makes the split stable across reshards and incremental backfills at
    100 TB. Changing `salt` re-rolls every assignment (epoch rotation).
    """
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    if len(weights) < 2:
        raise ValueError("split_assign needs at least 2 buckets")
    names = list(weights)
    total = float(sum(weights.values()))
    key = split_key(F.col(id_col), salt)
    expr = None
    cum = 0.0
    for name in names[:-1]:
        cum += weights[name] / total
        # clamp: a non-final bucket whose cumulative ratio reaches 1.0
        # (e.g. {'train': 1.0, 'test': 0.0}) would format as the 9-char
        # '100000000', and the lexicographic compare against 8-char keys
        # silently routes ~94% of docs into the zero-weight last bucket
        # (ADVICE r5). Clamping to the max 8-char key keeps every key below
        # the threshold, i.e. 100% in the full bucket.
        thr = format(min(int(cum * _HEX_SPACE), _HEX_SPACE - 1), "08x")
        cond = key < F.lit(thr)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return df.withColumn(out_col, expr.otherwise(names[-1]))


def curation_funnel(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", jaccard_n: int = 3,
                    jaccard_threshold: float = 0.2,
                    min_quality: float = 0.5,
                    weights: dict[str, float] | None = None,
                    salt: str = "v1",
                    max_shingle_df: int | None = 10_000) -> DataFrame:
    """End-to-end curation funnel: raw -> exact-dedup keep-one -> transitive
    near-dup keep-one -> quality floor -> deterministic splits. Returns the
    tiny (stage, n_docs) conservation table a 100 TB curation run reports per
    batch (stages are prefixed for a stable sort order).

    Scale shape: every stage is the already-audited operator (bucketed pair
    generation, O(log n)-round components, codegen'd quality expression,
    shuffle-free split) glued by DataFrame joins; the only driver-side values
    are dup_components' per-round convergence scalar and nothing else. A
    production run would materialize each stage's survivor ids to parquet
    between stages (resume points) instead of recomputing the lineage the
    way this counts-only view can afford to.
    """
    raw = df.select(F.lit("00_raw").alias("stage"),
                    F.count("*").cast("long").alias("n"))

    keep = (exact_dedup(df, text_col, id_col)
            .filter(~F.col("is_dup")).select(id_col))
    surv = df.join(keep, id_col).persist()
    n_exact = surv.select(F.lit("10_exact_unique").alias("stage"),
                          F.count("*").cast("long").alias("n"))

    # max_shingle_df exposed (ADVICE r5): the oracle-checked entry passes
    # None because its DuckDB twin models no df cap — with the default cap a
    # >10k-doc corpus holding a >10k-df shingle would silently diverge from
    # an uncapped oracle
    pairs = jaccard_pairs(surv, n=jaccard_n, threshold=jaccard_threshold,
                          text_col=text_col, id_col=id_col,
                          max_shingle_df=max_shingle_df)
    comp = dup_components(pairs, all_ids=surv.select(id_col))
    # component label = min reachable doc id, i.e. the representative itself
    reps = comp.select(F.col("component").alias(id_col)).distinct()
    n_near = reps.select(F.lit("20_near_unique").alias("stage"),
                         F.count("*").cast("long").alias("n"))

    final = (surv.join(reps, id_col)
             .filter(quality_score(F.col(text_col)) >= min_quality))
    n_quality = final.select(F.lit("30_quality").alias("stage"),
                             F.count("*").cast("long").alias("n"))

    sp = split_assign(final.select(id_col), weights, salt, id_col)
    n_splits = (sp.groupBy("split")
                .agg(F.count("*").cast("long").alias("n"))
                .select(F.concat(F.lit("40_split_"), F.col("split"))
                        .alias("stage"), "n"))

    out = raw.unionByName(n_exact).unionByName(n_near) \
             .unionByName(n_quality).unionByName(n_splits)
    res = release_on_gc(out, surv)
    if hasattr(pairs, "release_cached_inputs"):
        # chain: dropping the funnel result also frees jaccard's shingle cache
        inner = pairs.release_cached_inputs
        outer = res.release_cached_inputs
        def _release_all():  # noqa: ANN202
            outer()
            inner()
        res.release_cached_inputs = _release_all
    return res


def pack_plan(df: DataFrame, context_len: int = 2048,
              tokens_col: str = "n_tokens", id_col: str = "doc_id",
              group_col: str | None = "source") -> DataFrame:
    """Concatenate-and-chunk sequence-packing plan (the GPT-style pack:
    documents are concatenated in a deterministic order and the stream is
    cut every `context_len` tokens; a doc may straddle chunk boundaries).

    Returns (id, group, tok_start, chunk_first, chunk_last) where tok_start
    is the doc's offset in its group's token stream and chunk_first/last the
    chunk ids it lands in — the shuffle-plan a downstream tokenizer job
    consumes to build fixed-length training rows.

    Scale shape: ONE window cumsum partitioned by `group_col` (source,
    shard, language — any bounded-size grouping), so packing parallelizes
    across groups and never builds a global ordering; with group_col=None it
    degenerates to a single global window — correct, but serial, so demand a
    grouping at scale. Deterministic order inside a group is (id) — stable
    across reruns/reshards, which keeps chunk ids reproducible."""
    from pyspark.sql import Window

    if group_col is None:
        grp = F.lit("all")
        win = Window.orderBy(id_col)
    else:
        grp = F.col(group_col)
        win = Window.partitionBy(group_col).orderBy(id_col)
    cum_incl = F.sum(tokens_col).over(win)
    tok_start = (cum_incl - F.col(tokens_col)).cast("long")
    return df.select(
        id_col,
        grp.alias("grp"),
        tok_start.alias("tok_start"),
        F.floor(tok_start / context_len).alias("chunk_first"),
        F.floor((cum_incl - 1) / context_len).cast("long").alias("chunk_last"),
    )
