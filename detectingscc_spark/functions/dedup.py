"""Deduplication operators for training-data pipelines.

  exact_dedup      sha256 hash-groupBy; canonical keeper = min doc_id
  minhash_lsh      k-permutation MinHash over stride-shingles + banded LSH
                   self-join -> candidate near-dup pairs. Hash family =
                   sha256(salt || shingle) so the EXACT same signature is
                   reproducible in any engine with sha256 (DuckDB oracle).
  simhash          64-bit SimHash over whitespace tokens, entirely
                   JVM-side: token hash = first 16 hex chars of
                   sha256(token), per-bit majority votes as 64 conditional
                   sums in ONE groupBy. Output is the 16-char lowercase
                   hex string — reproducible on any engine with sha256
                   (DuckDB oracle), no Python hash() in the loop.
  ngram_jaccard    exact character-3-gram Jaccard for candidate pairs,
                   blocked by `source` to bound the pair space
  embedding_dups   cosine > threshold pairs over embeddings, blocked by
                   `label` (the coarse-cluster blocking key)

Scale notes: LSH banding is the 100 TB path — the self-join key is
(band_idx, band_hash), so shuffle volume is O(docs x bands) not O(docs^2);
AQE skew-join handles hot buckets. Exact Jaccard / cosine verification
runs only on candidate pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_dedup(docs: DataFrame) -> DataFrame:
    """(doc_id, content_sha, keep) — keep = doc is the min-id member of its
    exact-duplicate group."""
    h = docs.select("doc_id", F.sha2(F.col("text"), 256).alias("content_sha"))
    keeper = h.groupBy("content_sha").agg(F.min("doc_id").alias("keeper"))
    return (
        h.join(keeper, "content_sha")
        .select("doc_id", "content_sha", (F.col("doc_id") == F.col("keeper")).alias("keep"))
    )


def _shingle_expr(shingle: int, stride: int) -> str:
    return (
        f"transform(sequence(1, greatest(1, length(text) - {shingle - 1}), {stride}),"
        f" i -> substring(text, i, {shingle}))"
    )


def minhash_signatures(docs: DataFrame, num_hashes: int = 16, shingle: int = 8, stride: int = 4) -> DataFrame:
    """(doc_id, sig: array<string>) — sig[h] = min over shingles of
    sha256('h<h>|' || shingle). Single shingle explode + k min-aggregates
    in one pass (map-side partial aggregation keeps the shuffle at one
    row per doc); identical output to the per-column formulation and to
    the DuckDB oracle SQL."""
    grams = docs.select("doc_id", F.explode(F.expr(_shingle_expr(shingle, stride))).alias("s"))
    aggs = [
        F.min(F.sha2(F.concat(F.lit(f"h{h}|"), F.col("s")), 256)).alias(f"mh{h}")
        for h in range(num_hashes)
    ]
    sig = grams.groupBy("doc_id").agg(*aggs)
    return sig.select("doc_id", F.array(*[F.col(f"mh{h}") for h in range(num_hashes)]).alias("sig"))


def minhash_lsh_pairs(
    docs: DataFrame, num_hashes: int = 16, bands: int = 4, shingle: int = 8, stride: int = 4
) -> DataFrame:
    """(doc_a, doc_b) candidate near-duplicate pairs: docs sharing at least
    one LSH band (band hash = sha256 of the band's concatenated minima)."""
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(docs, num_hashes, shingle, stride)
    banded = sig.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, {bands - 1}),"
                f" b -> struct(b as band, sha2(array_join(slice(sig, b*{rows_per_band}+1, {rows_per_band}), '|'), 256) as bh))"
            )
        ).alias("e"),
    ).select("doc_id", F.col("e.band").alias("band"), F.col("e.bh").alias("bh"))
    a = banded.select(F.col("band"), F.col("bh"), F.col("doc_id").alias("doc_a"))
    b = banded.select(F.col("band"), F.col("bh"), F.col("doc_id").alias("doc_b"))
    return (
        a.join(b, ["band", "bh"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


_HEX = "0123456789abcdef"


def simhash(docs: DataFrame, bits: int = 64) -> DataFrame:
    """(doc_id, simhash: string) — token-level 64-bit SimHash as a 16-char
    lowercase hex string.

    Token hash family = first 16 hex chars of sha256(token) (same
    stable-hash approach as the MinHash family): deterministic across
    drivers, clusters, Python versions — a correctness property for a
    persisted dedup key. The per-bit +1/-1 votes are 64 conditional sums
    computed in ONE hash aggregation (map-side partial agg; one shuffle
    row per doc), whole-stage codegen end to end — no Python in the loop.

    Bit b of hex digit j (1-based, most-significant first) is set iff a
    strict majority of tokens have that bit set in their hash; ties -> 0.
    Docs with no tokens hash to all zeros.
    """
    if bits != 64:
        raise ValueError("simhash: only bits=64 is supported")
    # explicit whitespace class, NOT \s: Java regex counts \x0B as \s but
    # RE2 (the DuckDB oracle engine) does not — persisted dedup keys must
    # not depend on which engine tokenized (same discipline as
    # functions/text.py's BPE_TOKEN_RE)
    toks = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), "[ \\t\\r\\n\\x0B\\f]+")).alias("tok")
    ).where(F.length("tok") > 0)
    h = toks.select("doc_id", F.sha2(F.col("tok"), 256).alias("sha"))
    aggs = [F.count("*").alias("n")]
    for j in range(1, 17):
        dig = f"(locate(substring(sha, {j}, 1), '{_HEX}') - 1)"
        for b in range(4):
            aggs.append(F.expr(f"sum(shiftright({dig}, {b}) & 1)").alias(f"s{j}_{b}"))
    agg = h.groupBy("doc_id").agg(*aggs)
    chars = []
    for j in range(1, 17):
        val = " + ".join(
            f"(CASE WHEN 2 * s{j}_{b} > n THEN {1 << b} ELSE 0 END)" for b in range(4)
        )
        chars.append(f"substring('{_HEX}', 1 + ({val}), 1)")
    sh = agg.select("doc_id", F.expr("concat(" + ", ".join(chars) + ")").alias("simhash"))
    return docs.select("doc_id").join(sh, "doc_id", "left").select(
        "doc_id", F.coalesce("simhash", F.lit("0" * 16)).alias("simhash")
    )


def ngram_jaccard_pairs(docs: DataFrame, n: int = 3, threshold: float = 0.0) -> DataFrame:
    """(doc_a, doc_b, jaccard) for same-`source` pairs: exact character
    n-gram Jaccard, computed via explode + join (distributed set ops)."""
    grams = docs.select(
        "doc_id",
        "source",
        F.explode(
            F.expr(f"array_distinct(transform(sequence(1, greatest(1, length(text)-{n - 1})), i -> substring(text, i, {n})))")
        ).alias("g"),
    )
    sizes = grams.groupBy("doc_id").agg(F.count("*").alias("sz"))
    ga = grams.select(F.col("source"), F.col("g"), F.col("doc_id").alias("doc_a"))
    gb = grams.select(F.col("source"), F.col("g"), F.col("doc_id").alias("doc_b"))
    inter = (
        ga.join(gb, ["source", "g"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("i"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sza"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("szb"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(F.col("i") / (F.col("sza") + F.col("szb") - F.col("i")), 6).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def embedding_dup_pairs(emb: DataFrame, threshold: float = 0.95) -> DataFrame:
    """(vec_a, vec_b, cos) near-duplicate embedding pairs with cosine >=
    threshold, blocked by `label` (at scale: LSH/IVF bucketing replaces the
    label block — see similarity.lsh_buckets)."""
    withn = emb.select(
        "vec_id",
        "label",
        F.col("embedding").cast("array<double>").alias("v"),
    ).withColumn("norm", F.sqrt(F.aggregate(F.col("v"), F.lit(0.0), lambda a, x: a + x * x)))
    a = withn.select(F.col("label"), F.col("vec_id").alias("vec_a"), F.col("v").alias("va"), F.col("norm").alias("na"))
    b = withn.select(F.col("label"), F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"), F.col("norm").alias("nb"))
    pairs = a.join(b, "label").where(F.col("vec_a") < F.col("vec_b"))
    dot = F.aggregate(F.zip_with(F.col("va"), F.col("vb"), lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)
    return (
        pairs.select("vec_a", "vec_b", F.round(dot / (F.col("na") * F.col("nb")), 6).alias("cos"))
        .where(F.col("cos") >= threshold)
    )


def dedup_clusters(
    spark,
    docs: DataFrame,
    *,
    num_hashes: int = 16,
    bands: int = 4,
    shingle: int = 8,
    stride: int = 4,
) -> DataFrame:
    """(doc_id, cluster_id, cluster_size) — fuzzy-dedup cluster
    assignment: exact-duplicate pairs (same sha256) unioned with
    MinHash-LSH candidate pairs, closed transitively by weak connected
    components over the pair graph. cluster_id = the cluster's min
    doc_id; singletons cluster to themselves with size 1.

    This is the transitive-closure complement to dedup_sweep's pairwise
    drop rule: a~b and b~c put a and c in ONE cluster even when (a,c)
    never collided in any band — the "one representative per duplicate
    cluster" shape corpus curation pipelines need when near-dup chains
    are longer than a single hop.

    100 TB shape: exact groups contribute STAR edges (each member to the
    group's min id), so the edge count stays linear in docs even for a
    million-copy boilerplate page — never the O(group^2) pair explosion;
    LSH banding bounds near-dup pairs at O(docs x bands); the CC phase is
    hash-min + pointer jumping, O(log diameter) supersteps
    (operators/components.py).
    """
    from ..operators.components import connected_components

    h = docs.select("doc_id", F.sha2(F.col("text"), 256).alias("s"))
    keeper = h.groupBy("s").agg(F.min("doc_id").alias("keeper"))
    exact = (
        h.join(keeper, "s")
        .where(F.col("doc_id") != F.col("keeper"))
        .select(F.col("keeper").alias("src"), F.col("doc_id").alias("dst"))
    )
    near = minhash_lsh_pairs(docs, num_hashes, bands, shingle, stride).select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    cc = connected_components(
        spark, exact.unionByName(near), docs.select(F.col("doc_id").alias("id"))
    )
    sizes = cc.groupBy("cc_id").agg(F.count("*").alias("cluster_size"))
    return cc.join(sizes, "cc_id").select(
        F.col("id").alias("doc_id"),
        F.col("cc_id").alias("cluster_id"),
        "cluster_size",
    )
