"""Text-analysis operators for a training-data pipeline.

All pure Catalyst column expressions (JVM-side, whole-stage codegen) — no
Python in the hot path. Each has an exact ANSI-SQL twin used as the DuckDB
oracle in ``__spark_entry__.oracle_sql``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Small fixed English stopword list (public; the classic top function words).
STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "at", "by", "this", "that", "be", "are",
)


def token_count(text: Column) -> Column:
    """Whitespace token count (0 for empty/blank)."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    )


# GPT-2-style pretokenizer regex, lookahead-free so Java regex (Spark) and
# RE2 (DuckDB oracle) agree: contractions | space?+letters | space?+digits |
# space?+other-runs | whitespace runs. Counting its matches approximates BPE
# token count well enough for length filtering/cost estimates without a
# vocab in the container.
BPE_PRETOKEN_RE = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}']+|\s+"


def bpe_token_count(text: Column) -> Column:
    """BPE-ish token count: matches of the GPT-2 pretokenizer pattern."""
    return F.regexp_count(text, F.lit(BPE_PRETOKEN_RE))


def stopword_ratio(text: Column) -> Column:
    """Fraction of whitespace tokens that are stopwords."""
    toks = F.split(F.lower(F.trim(text)), r"\s+")
    n_stop = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS)))
    return n_stop / F.greatest(F.size(toks), F.lit(1))


def punct_ratio(text: Column) -> Column:
    """Punctuation chars / total chars."""
    stripped = F.regexp_replace(text, r"[^\s\w]", "")
    return (F.length(text) - F.length(stripped)) / F.greatest(F.length(text), F.lit(1))


def quality_score(text: Column) -> Column:
    """Composite quality heuristic in [0,1]: long enough, mostly words,
    some stopwords (≈ real prose), little punctuation noise."""
    n_tok = token_count(text)
    len_ok = F.least(n_tok / F.lit(20.0), F.lit(1.0))
    stop_ok = F.least(stopword_ratio(text) * 5.0, F.lit(1.0))
    punct_ok = F.lit(1.0) - F.least(punct_ratio(text) * 4.0, F.lit(1.0))
    return F.round((len_ok + stop_ok + punct_ok) / 3.0, 4)


def lang_id(text: Column) -> Column:
    """Tiny language-ID heuristic: English stopword density.

    (A real system would use fastText/CLD3 — not in this container; the
    Spark-side shape is identical: one column expression or pandas UDF.)"""
    return F.when(stopword_ratio(text) >= 0.08, F.lit("en")).otherwise(F.lit("other"))


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of case/whitespace-normalized text."""
    norm = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    return F.md5(norm)


def winnow_fingerprints(df: DataFrame, text_col: str = "text",
                        k: int = 8, w: int = 4,
                        out_col: str = "fp_set") -> DataFrame:
    """Rolling-hash winnowing fingerprint (Schleimer et al., MOSS 2003):
    hash every k-char gram of the normalized text, slide a w-gram window,
    keep each window's minimum, dedupe. Robust to local edits (only windows
    near the edit change), unlike the whole-document md5 above.

    Pure column algebra; gram "hashes" are md5 strings so the lexicographic
    window-min is engine-independent (identical in the DuckDB oracle).
    Adds `out_col` array<string> of selected gram hashes, sorted.

    DF-level (not a Column helper) ON PURPOSE: each stage must be bound as a
    real column before the next lambda references it — an expression
    referenced inside `transform` is INLINED and re-evaluated per element
    (no common-subexpression elimination through lambdas), which turns the
    normalize+hash prework into an O(n_grams x doc_len) blowup (measured
    ~60x wall on the 500-doc fixture)."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    tmp_n, tmp_h = f"__{out_col}_norm", f"__{out_col}_hs"
    step1 = df.withColumn(tmp_n, norm)
    n_grams = F.greatest(F.length(tmp_n) - k + 1, F.lit(1))
    step2 = step1.withColumn(
        tmp_h,
        F.transform(F.sequence(F.lit(1), n_grams),
                    lambda i: F.md5(F.col(tmp_n).substr(i, F.lit(k)))),
    )
    n_wins = F.greatest(F.size(tmp_h) - w + 1, F.lit(1))
    mins = F.transform(
        F.sequence(F.lit(1), n_wins),
        lambda i: F.array_min(F.slice(F.col(tmp_h), i, w)),
    )
    return (step2.withColumn(out_col, F.array_sort(F.array_distinct(mins)))
            .drop(tmp_n, tmp_h))


def repetition_ratio(df: DataFrame, n: int = 3, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Gopher-style repetition signal: the fraction of word n-gram
    OCCURRENCES belonging to an n-gram that appears more than once in the
    document (boilerplate / looped generations score high; duplicate-n-gram
    fractions are standard quality gates, Rae et al. 2021 §A1.1).

    Pure per-row column algebra: build the gram MULTISET (same slice
    construction as dedup's shingles, without the distinct), sort it, count
    positions with an equal neighbor — all k occurrences of a repeated gram
    count, so the ratio reads "fraction of the doc that is repeated
    material". NO shuffle or groupBy: repetition depends only on the row, so
    this stays a map at any scale. Intermediates are bound as real columns
    (no CSE through transform lambdas — see winnow_fingerprints)."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    t1 = df.select(F.col(id_col), F.split(norm, " ").alias("__toks"))
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size("__toks") - n, F.lit(0))),
        lambda i: F.array_join(F.slice(F.col("__toks"), i + 1, n), " "),
    )
    t2 = t1.select(
        id_col,
        F.array_sort(F.filter(grams, lambda s: F.length(s) > 0)).alias("__sg"),
    )
    sg = F.col("__sg")
    sz = F.size(sg)
    # F.get is 0-based and NULL out of bounds (never ANSI-throws, unlike
    # element_at); false & NULL = false, so the edge positions fall out
    dup = F.size(F.filter(
        F.sequence(F.lit(0), F.greatest(sz - 1, F.lit(0))),
        lambda i: ((i > 0) & (F.get(sg, i) == F.get(sg, i - 1)))
                  | ((i < sz - 1) & (F.get(sg, i) == F.get(sg, i + 1))),
    ))
    ratio = F.when(sz == 0, F.lit(0.0)).otherwise(F.round(dup / sz, 4))
    return t2.select(id_col, ratio.alias("rep_ratio"))


# PII patterns shared by detect and scrub. Lookaround-free so Java regex
# (Spark) and RE2 (the DuckDB oracle) match identically; \b is fine in both
# on ASCII input. Ordered: email first (its local/domain parts contain dots
# and digits an IP pass could nibble), then IPv4, then SSN-shaped ids.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_ID9 = r"\b\d{3}-\d{2}-\d{4}\b"


def pii_scrub(text: Column) -> Column:
    """Replace PII spans with typed placeholders.

    Fixed email -> ipv4 -> id pass order; the placeholders carry no digits
    or '@', so later passes cannot re-match earlier replacements and the
    scrub is idempotent (scrub(scrub(x)) == scrub(x), pinned by test)."""
    out = F.regexp_replace(text, PII_EMAIL, "<EMAIL>")
    out = F.regexp_replace(out, PII_IPV4, "<IP>")
    return F.regexp_replace(out, PII_ID9, "<ID>")


def pii_scan(df: DataFrame, text_col: str = "text",
             id_col: str = "doc_id") -> DataFrame:
    """PII detect + scrub for a training-data curation pipeline: per-doc
    counts of emails / IPv4 addresses / SSN-shaped ids, plus the scrubbed
    text. Pure codegen'd column expressions over one scan — a per-row map
    with no shuffle, so it scales embarrassingly (100 TB = more tasks).
    Counts are on the ORIGINAL text; idx=0 because the patterns are
    group-free (Spark's regexp_extract_all defaults to group 1)."""
    t = F.col(text_col)
    return df.select(
        id_col,
        F.size(F.regexp_extract_all(t, F.lit(PII_EMAIL), 0))
         .cast("long").alias("n_emails"),
        F.size(F.regexp_extract_all(t, F.lit(PII_IPV4), 0))
         .cast("long").alias("n_ipv4"),
        F.size(F.regexp_extract_all(t, F.lit(PII_ID9), 0))
         .cast("long").alias("n_ids"),
        pii_scrub(t).alias("scrubbed"),
    )


def analyze(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """All text features in one projection (single scan, codegen'd)."""
    t = F.col(text_col)
    return df.select(
        id_col,
        token_count(t).alias("n_tokens"),
        F.length(t).alias("n_chars"),
        F.round(stopword_ratio(t), 4).alias("stop_ratio"),
        F.round(punct_ratio(t), 4).alias("punct_ratio"),
        quality_score(t).alias("quality"),
        lang_id(t).alias("lang_pred"),
        fingerprint(t).alias("fp"),
    )
