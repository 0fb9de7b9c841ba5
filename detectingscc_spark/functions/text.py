"""Text-analysis operators for training-data pipelines over
documents(doc_id, text, lang, source, n_chars).

All hot-path expressions are Spark built-ins (whole-stage codegen); the
arithmetic is deliberately chosen to be reproducible verbatim in ANSI SQL
so every operator has a DuckDB oracle (see __spark_entry__.oracle_sql).

Conventions (documented because they ARE the semantics):
  * token count   = spaces + 1 (single-space-separated corpora)
  * stopword hits = non-overlapping occurrences counted via
                    length-difference arithmetic
  * fingerprint   = min over stride-4 8-char shingles of sha256(shingle)
                    (one-hash MinHash; the k-hash version lives in
                    dedup.py)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STOPWORDS = ("the", "and", "data", "query", "table")


def occurrences(col: Column, needle: str) -> Column:
    """Count non-overlapping occurrences of `needle` via length-diff
    arithmetic — identical semantics in any SQL engine."""
    return (F.length(col) - F.length(F.replace(col, F.lit(needle), F.lit("")))) / len(needle)


def token_count(col: Column) -> Column:
    return (F.length(col) - F.length(F.replace(col, F.lit(" "), F.lit(""))) + 1).cast("long")


def text_stats(docs: DataFrame) -> DataFrame:
    """(doc_id, n_chars, n_tokens, avg_token_len, stop_hits, quality)"""
    text = F.col("text")
    ntok = token_count(text)
    stop = sum(occurrences(text, f" {w} ") for w in STOPWORDS).cast("long")
    nchars = F.length(text).cast("long")
    avg_tok = F.round(nchars / ntok, 4)
    quality = F.round(
        F.least(F.lit(1.0), ntok / F.lit(50.0)) * F.lit(0.5)
        + F.least(F.lit(1.0), stop / F.lit(10.0)) * F.lit(0.5),
        4,
    )
    return docs.select(
        "doc_id",
        nchars.alias("n_chars"),
        ntok.alias("n_tokens"),
        avg_tok.alias("avg_token_len"),
        stop.alias("stop_hits"),
        quality.alias("quality"),
    )


# GPT-2-style pre-tokenizer, reduced to constructs whose semantics are
# identical in Java regex (Spark) and the RE2-ish engines of other SQL
# systems: explicit character classes only (no \s, whose class membership
# differs across engines), longest-alternative-first.
BPE_TOKEN_RE = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 \\t\\r\\n]"


def token_count_bpe(col: Column) -> Column:
    """BPE-ish subword-boundary token count: letter runs count once, each
    digit separately (GPT-2 convention), punctuation char-by-char;
    whitespace never counts. Vectorized JVM regex — no Python."""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_TOKEN_RE), F.lit(0))).cast("long")


def token_counts(docs: DataFrame) -> DataFrame:
    """(doc_id, n_ws_tokens, n_bpe_tokens) — whitespace vs BPE-ish counts,
    the pair a training-data token-budget accountant needs."""
    text = F.col("text")
    return docs.select(
        "doc_id",
        token_count(text).alias("n_ws_tokens"),
        token_count_bpe(text).alias("n_bpe_tokens"),
    )


LANG_MARKERS = {
    "en": (" the ", " and "),
    "dataish": (" data ", " table "),
    "sparkish": (" spark ", " batch "),
}


def lang_guess(docs: DataFrame) -> DataFrame:
    """(doc_id, lang_guess) — n-gram-marker heuristic with deterministic
    CASE tie-break (first marker class wins on ties)."""
    text = F.col("text")
    scores = {k: sum(occurrences(text, m) for m in ms) for k, ms in LANG_MARKERS.items()}
    s_en, s_da, s_sp = scores["en"], scores["dataish"], scores["sparkish"]
    guess = (
        F.when((s_en >= s_da) & (s_en >= s_sp), F.lit("en"))
        .when(s_da >= s_sp, F.lit("dataish"))
        .otherwise(F.lit("sparkish"))
    )
    return docs.select("doc_id", guess.alias("lang_guess"))


def fingerprint(docs: DataFrame, shingle: int = 8, stride: int = 4) -> DataFrame:
    """(doc_id, fp) — rolling-shingle document fingerprint: min sha256 over
    stride-spaced substrings. Short docs fall back to whole-text hash."""
    return docs.select(
        "doc_id",
        F.expr(
            f"array_min(transform(sequence(1, greatest(1, length(text) - {shingle - 1}), {stride}),"
            f" i -> sha2(substring(text, i, {shingle}), 256)))"
        ).alias("fp"),
    )


def repetition_stats(docs: DataFrame) -> DataFrame:
    """(doc_id, n_words, dup_word_frac, top_bigram_frac) — Gopher-style
    repetition signals (Rae et al. 2021 §A1.1: fraction of duplicated
    words / fraction of tokens in the most common n-gram), the standard
    pre-training repetition filter.

    100 TB shape: the word-level stats are pure codegen arithmetic on the
    text column (no shuffle); the bigram mode needs one explode + two
    map-side-partial hash aggs keyed by doc_id — the explode fan-out is
    bounded by document length and the agg key (doc_id) is the natural
    partitioner, so no skew beyond the longest single document.
    """
    w = F.split(F.col("text"), " ")
    base = docs.select(
        "doc_id",
        F.size(w).alias("n_words"),
        F.size(F.array_distinct(w)).alias("n_distinct"),
    )
    # guard: sequence(1, 0) would step BACKWARDS in Spark, so gate on
    # size >= 2 instead of relying on an empty sequence
    grams = F.when(
        F.size(w) >= 2,
        F.expr(
            "transform(sequence(1, size(split(text, ' ')) - 1),"
            " i -> concat(element_at(split(text, ' '), i), ' ',"
            " element_at(split(text, ' '), i + 1)))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    bg = (
        docs.select("doc_id", F.explode(grams).alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_c"), F.sum("c").alias("total_bg"))
    )
    return base.join(bg, "doc_id", "left").select(
        "doc_id",
        "n_words",
        F.round(
            F.lit(1.0) - F.col("n_distinct") / F.col("n_words"), 6
        ).alias("dup_word_frac"),
        F.round(
            F.coalesce(F.col("top_c") / F.col("total_bg"), F.lit(0.0)), 6
        ).alias("top_bigram_frac"),
    )
