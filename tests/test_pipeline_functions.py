"""Training-data pipeline operators: dedup, similarity, text, multimodal
plumbing (rows-only ops get their exactness checks here)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from detectingscc_spark.functions.dedup import (
    embedding_dup_pairs,
    exact_dedup,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
)
from detectingscc_spark.functions.multimodal import extract_features, frame_sample, synthetic_media
from detectingscc_spark.functions.similarity import ann_topk_ivf, ann_topk_lsh, brute_force_topk
from detectingscc_spark.functions.text import fingerprint, lang_guess, text_stats

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    base = spark.read.parquet(f"{SF}/documents.parquet")
    # plant exact + near duplicates deterministically
    dup = base.where(F.col("doc_id") < 5).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text", "lang", "source", "n_chars"
    )
    near = base.where((F.col("doc_id") >= 5) & (F.col("doc_id") < 10)).select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tail")).alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    return base.unionByName(dup).unionByName(near)


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_exact_dedup(spark, docs):
    res = exact_dedup(docs).collect()
    by_id = {r["doc_id"]: r for r in res}
    for i in range(5):
        assert by_id[i]["keep"] is True
        assert by_id[i + 100000]["keep"] is False
        assert by_id[i]["content_sha"] == by_id[i + 100000]["content_sha"]
    kept = sum(1 for r in res if r["keep"])
    assert kept == len(res) - 5


def test_minhash_finds_planted_near_dups(spark, docs):
    pairs = {(r["doc_a"], r["doc_b"]) for r in minhash_lsh_pairs(docs).collect()}
    # exact dups always collide on every band
    for i in range(5):
        assert (i, i + 100000) in pairs
    # near dups (append-only edit) should mostly collide
    near_hits = sum(1 for i in range(5, 10) if (i, i + 200000) in pairs)
    assert near_hits >= 4


def test_minhash_signature_shape(spark, docs):
    sig = minhash_signatures(docs, num_hashes=16).first()
    assert len(sig["sig"]) == 16
    assert all(len(h) == 64 for h in sig["sig"])


def test_ngram_jaccard(spark, docs):
    sub = docs.where(F.col("doc_id").isin(5, 200005))
    res = ngram_jaccard_pairs(sub, n=3).collect()
    assert len(res) == 1
    assert res[0]["jaccard"] > 0.9


def _simhash_py(text: str) -> str:
    """Pure-python oracle mirroring the engine's simhash definition."""
    import hashlib
    import re

    toks = [t for t in re.split(r"\s+", text) if t]
    if not toks:
        return "0" * 16
    n = len(toks)
    hexes = [hashlib.sha256(t.encode()).hexdigest() for t in toks]
    digits = []
    for j in range(16):  # j = 0 is the most significant hex char
        d = 0
        for b in range(4):
            s = sum((int(h[j], 16) >> b) & 1 for h in hexes)
            if 2 * s > n:  # strict majority; ties -> 0
                d |= 1 << b
        digits.append("0123456789abcdef"[d])
    return "".join(digits)


def test_simhash_matches_python_oracle(spark, docs):
    sub = docs.where(F.col("doc_id") < 8)
    got = {r["doc_id"]: r["simhash"] for r in simhash(sub).collect()}
    for r in sub.collect():
        assert got[r["doc_id"]] == _simhash_py(r["text"])


def test_simhash_near_dup_close(spark, docs):
    sh = {r["doc_id"]: int(r["simhash"], 16) for r in simhash(docs).collect()}
    for i in range(5):
        assert sh[i] == sh[i + 100000]  # identical text -> identical simhash
    for i in range(5, 10):
        d = bin(sh[i] ^ sh[i + 200000]).count("1")
        assert d <= 8  # near dup -> small hamming distance


def test_brute_force_topk_vs_numpy(spark, emb):
    rows = emb.collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows}
    got = brute_force_topk(emb, query_ids=[0, 7], k=3).collect()
    for q in (0, 7):
        qs = sorted(
            ((int(r["vec_id"]), float(r["cos"])) for r in got if r["query_id"] == q),
            key=lambda t: -t[1],
        )
        qv = vecs[q]
        sims = {
            vid: float(qv @ v / (np.linalg.norm(qv) * np.linalg.norm(v)))
            for vid, v in vecs.items()
            if vid != q
        }
        exp = sorted(sims.items(), key=lambda kv: (-round(kv[1], 6), kv[0]))[:3]
        assert [v for v, _ in qs] == [v for v, _ in exp]
        for (_, a), (_, b) in zip(qs, exp):
            assert abs(a - b) < 1e-5


def test_ann_lsh_recall(spark, emb):
    qids = list(range(10))
    exact = brute_force_topk(emb, query_ids=qids, k=5).collect()
    approx = ann_topk_lsh(emb, query_ids=qids, k=5).collect()
    exact_set = {(r["query_id"], r["vec_id"]) for r in exact}
    approx_set = {(r["query_id"], r["vec_id"]) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.8  # multi-probe (Hamming<=1) quality bar
    assert all(r["rank"] <= 5 for r in approx)


def test_ann_ivf_recall_and_shape(spark, emb):
    qids = list(range(10))
    exact = brute_force_topk(emb, query_ids=qids, k=5).collect()
    approx = ann_topk_ivf(emb, query_ids=qids, k=5).collect()
    exact_set = {(r["query_id"], r["vec_id"]) for r in exact}
    approx_set = {(r["query_id"], r["vec_id"]) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    # probing 8/16 inverted lists on near-isotropic vectors: ~half the
    # corpus is candidate; the bar documents the quality floor
    assert recall >= 0.5
    assert all(r["rank"] <= 5 for r in approx)
    # deterministic across invocations
    again = ann_topk_ivf(emb, query_ids=qids, k=5).collect()
    assert sorted(map(tuple, approx)) == sorted(map(tuple, again))


def test_embedding_dups_symmetry(spark, emb):
    res = embedding_dup_pairs(emb, threshold=0.30).collect()
    for r in res:
        assert r["vec_a"] < r["vec_b"]
        assert r["cos"] >= 0.30


def test_text_stats_and_lang(spark, docs):
    st = text_stats(docs).where(F.col("doc_id") == 0).first()
    row = docs.where(F.col("doc_id") == 0).first()
    toks = row["text"].count(" ") + 1
    assert st["n_tokens"] == toks
    assert st["n_chars"] == len(row["text"])
    lg = lang_guess(docs).where(F.col("doc_id") == 0).first()
    assert lg["lang_guess"] in ("en", "dataish", "sparkish")


def test_fingerprint_deterministic_and_dup_stable(spark, docs):
    fp = {r["doc_id"]: r["fp"] for r in fingerprint(docs).collect()}
    for i in range(5):
        assert fp[i] == fp[i + 100000]


def test_multimodal_plumbing(spark):
    media = synthetic_media(spark, n=30)
    feats = extract_features(media, dim=16).collect()
    assert len(feats) == 30
    assert all(len(r["feature"]) == 16 for r in feats)
    # deterministic
    again = extract_features(synthetic_media(spark, n=30), dim=16).collect()
    assert sorted((r["media_id"], tuple(r["feature"])) for r in feats) == sorted(
        (r["media_id"], tuple(r["feature"])) for r in again
    )
    frames = frame_sample(media, every_n=4)
    vids = media.where(F.col("kind") == "video").count()
    assert frames.select("media_id").distinct().count() == vids
    with pytest.raises(NotImplementedError):
        extract_features(media, fake=False)


def test_token_counts_vs_python_re(spark, docs):
    import re

    from detectingscc_spark.functions.text import BPE_TOKEN_RE, token_counts

    got = {r["doc_id"]: (r["n_ws_tokens"], r["n_bpe_tokens"])
           for r in token_counts(docs).collect()}
    pat = re.compile(BPE_TOKEN_RE)
    for row in docs.select("doc_id", "text").collect():
        text = row["text"]
        ws = text.count(" ") + 1
        bpe = len(pat.findall(text))
        assert got[row["doc_id"]] == (ws, bpe), row["doc_id"]

    # the corpus is pure lowercase words (ws == bpe there); exercise the
    # digit/punct/mixed-case splitting on constructed rows
    cases = [
        (1, "foo12, bar!"),            # foo,1,2,",",bar,"!" -> 6
        (2, "df.groupBy(x).agg(n)"),   # mixed code-ish text
        (3, "a  b\tc\nd"),             # whitespace never counts
        (4, "2024-01-02T00:00:00Z"),
    ]
    cdf = spark.createDataFrame(cases, "doc_id long, text string")
    got2 = {r["doc_id"]: r["n_bpe_tokens"] for r in token_counts(cdf).collect()}
    for i, text in cases:
        assert got2[i] == len(pat.findall(text)), (i, text)
    assert got2[1] == 6
