"""Lexical retrieval over documents(doc_id, text, ...): BM25 scoring.

The retrieval primitive a contamination scan / eval-set decontamination
pass needs: score every document against a bag of query terms and keep
the top-k. All arithmetic is Spark built-ins chosen to be reproducible
verbatim in ANSI SQL (the DuckDB oracle in __spark_entry__ uses the same
float literals), so the operator is oracle-checkable.

100 TB shape: corpus stats (N, avgdl) are one scalar agg broadcast to
every score row; per-term document frequencies are a tiny |terms|-row
frame, also broadcast; the only data-sized shuffle is the (doc_id, term)
tf agg, which is map-side partial. Top-k is orderBy().limit(k) — a
TakeOrderedAndProject, never a global sort.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Okapi defaults, written as the exact float literals the SQL oracle
# repeats (k1 + 1 is spelled 2.2, 1 - b is spelled 0.25: float-literal
# identity beats arithmetic identity across engines)
K1 = 1.2
K1_PLUS_1 = 2.2
B = 0.75
ONE_MINUS_B = 0.25


def bm25_scores(docs: DataFrame, terms: Sequence[str]) -> DataFrame:
    """(doc_id, score) for every document matching >= 1 query term.

    idf(t) = ln((N - df + 0.5) / (df + 0.5) + 1)   (Lucene's variant:
    always positive, so a term in >half the corpus still contributes).
    score  = sum_t idf(t) * tf * (k1+1) / (tf + k1*(1-b + b*dl/avgdl)).
    Scores are rounded to 6 decimals so downstream order-by is stable
    across engines and partitionings.
    """
    w = F.split(F.col("text"), " ")
    dl = docs.select("doc_id", F.size(w).alias("dl"))
    # N and avgdl: exact integers / exact int-sum division -> identical
    # doubles in any engine
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    tf = (
        docs.select("doc_id", F.explode(w).alias("term"))
        .where(F.col("term").isin(*terms))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    denom = F.col("tf") + K1 * (
        ONE_MINUS_B + B * F.col("dl") / F.col("avgdl")
    )
    return (
        tf.join(F.broadcast(df_), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", (idf * F.col("tf") * K1_PLUS_1 / denom).alias("s"))
        .groupBy("doc_id")
        .agg(F.round(F.sum("s"), 6).alias("score"))
    )


def bm25_topk(docs: DataFrame, terms: Sequence[str], k: int = 15) -> DataFrame:
    """Top-k BM25 hits, deterministic tie-break (score desc, doc_id asc)."""
    return (
        bm25_scores(docs, terms)
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def ngram_contamination(
    docs: DataFrame, eval_docs: DataFrame, n: int = 5
) -> DataFrame:
    """(doc_id, n_eval_docs, n_shared_ngrams) — training documents that
    share at least one word n-gram with any eval document: the standard
    eval-set decontamination scan (per GPT-3/PaLM contamination
    methodology: 13-gram/8-gram overlap; n is a parameter here because
    the synthetic fixture corpus has short docs).

    100 TB shape: both sides shingle via codegen transform + explode;
    the join key is the n-gram itself (hashing it is the engine's job —
    Spark hashes join keys anyway, so no manual pre-hash); the eval side
    of a decontamination run is tiny relative to the corpus, so Catalyst
    broadcasts it (hinted). Distinct-ngram dedup per side keeps the join
    multiplicity at (#docs containing g) x (#eval docs containing g)
    per shared gram, aggregated map-side-partial.
    """
    def shingles(df: DataFrame, out: str) -> DataFrame:
        w = F.split(F.col("text"), " ")
        grams = F.when(
            F.size(w) >= n,
            F.expr(
                f"transform(sequence(1, size(split(text, ' ')) - {n - 1}),"
                f" i -> array_join(slice(split(text, ' '), i, {n}), ' '))"
            ),
        ).otherwise(F.array().cast("array<string>"))
        return df.select(
            F.col("doc_id").alias(out), F.explode(grams).alias("g")
        ).distinct()

    train = shingles(docs, "doc_id")
    ev = shingles(eval_docs, "eval_id")
    return (
        train.join(F.broadcast(ev), "g")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("eval_id").alias("n_eval_docs"),
            F.countDistinct("g").alias("n_shared_ngrams"),
        )
    )
