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

    toks = [t for t in re.split("[ \t\r\n\x0b\f]+", text) if t]
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
    # sha256 payloads are not a container format the real decoders accept
    with pytest.raises(Exception, match="unsupported media container"):
        extract_features(media, fake=False).collect()


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


def test_simhash_whitespace_class_engine_parity(spark):
    """The tokenizer splits on an EXPLICIT whitespace class, so Java regex
    (Spark) and RE2 (the DuckDB oracle) agree even on edge whitespace like
    vertical tab \\x0b — \\s class membership differs between the two
    engines, which would silently diverge a persisted dedup key."""
    import duckdb

    texts = [
        "alpha\x0bbeta gamma",       # vertical tab: Java \s yes, RE2 \s no
        "one\ftwo\r\nthree\tfour",   # form feed + CRLF + tab
        " leading and trailing ",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}

    import __spark_entry__ as se

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, ?)" for i in range(len(texts)))
        + ") AS t(doc_id, text)",
        texts,
    )
    exp = dict(con.execute(se.SIMHASH_SQL).fetchall())
    assert got == exp
    # and the vertical-tab doc actually split (3 tokens, not 2): its hash
    # must differ from the unsplit variant
    one_tok = spark.createDataFrame([(9, "alpha\x0bbeta")], "doc_id long, text string")
    assert simhash(one_tok).collect()[0]["simhash"] != _simhash_py("alphabeta")


def test_ann_ivf_trained_quantizer(spark, emb):
    """Trained spherical-k-means quantizer: deterministic across calls
    (seeded sample, farthest-point init, first-index tie-breaks) and
    recall >= 0.8 at n_probe=8 — the production-shaped IVF bar, raised
    from the anchor quantizer's 0.5 floor."""
    from detectingscc_spark.functions.similarity import train_ivf_centroids

    cents = train_ivf_centroids(emb, n_centroids=16, iters=5)
    assert cents == train_ivf_centroids(emb, n_centroids=16, iters=5)
    assert len(cents) == 16 and all(len(c) == len(cents[0]) for c in cents)
    # centroids live on the unit sphere
    for c in cents:
        assert abs(sum(x * x for x in c) - 1.0) < 1e-9

    qids = list(range(10))
    exact = {(r["query_id"], r["vec_id"]) for r in brute_force_topk(emb, qids, k=5).collect()}
    approx = {
        (r["query_id"], r["vec_id"])
        for r in ann_topk_ivf(emb, qids, k=5, n_probe=8, centroids=cents).collect()
    }
    assert len(exact & approx) / len(exact) >= 0.8


def test_real_decoders_byte_exact(spark):
    """fake=False path: REAL pure-stdlib decoders. PPM and WAV fixtures
    are built byte-for-byte by the module's own encoders; expected
    features are computed independently here (closed-form on the planted
    pixel/sample patterns), so the whole Arrow mapInPandas decode path is
    checked end to end without any codec library."""
    import math

    from detectingscc_spark.functions.multimodal import encode_ppm, encode_wav, extract_features

    # 2x2 image: pixels R=(255,0,0), G=(0,255,0), B=(0,0,255), W=(255,255,255)
    px = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255])
    ppm = encode_ppm(2, 2, px)
    # 4-sample WAV: a planted square wave at 8 kHz
    wav = encode_wav([16384, -16384, 16384, -16384], sample_rate=8000)
    media = spark.createDataFrame(
        [(1, "image", ppm), (2, "audio", wav)], "media_id long, kind string, payload binary"
    )
    got = {r["media_id"]: r["feature"] for r in extract_features(media, dim=16, fake=False).collect()}

    img = got[1]
    assert img[:3] == [2.0, 2.0, 255.0]  # width, height, maxval
    assert abs(img[3] - 0.5) < 1e-9  # mean R: (1+0+0+1)/4
    assert abs(img[4] - 0.5) < 1e-9  # mean G
    assert abs(img[5] - 0.5) < 1e-9  # mean B
    assert img[9] == 0.0 and img[10] == 1.0  # global min/max
    assert img[15] == 0.0  # zero padding beyond the 13 defined features

    au = got[2]
    assert au[:3] == [1.0, 8000.0, 4.0]  # channels, rate, n_samples
    assert abs(au[3] - 0.0) < 1e-9  # mean of the symmetric square wave
    assert abs(au[4] - 16384.0 / 32768.0) < 1e-9  # rms
    assert abs(au[5] - 1.0) < 1e-9  # every adjacent pair crosses zero
    assert abs(au[6] + 0.5) < 1e-9 and abs(au[7] - 0.5) < 1e-9  # min/max


def test_ppm_decoder_handles_comments_and_wav_skips_unknown_chunks(spark):
    """Spec edge cases a naive parser misses: PPM `#` header comments and
    RIFF chunks other than fmt/data (e.g. LIST metadata)."""
    import struct

    import numpy as np

    from detectingscc_spark.functions.multimodal import _decode_ppm, _decode_wav, encode_wav

    ppm = b"P6\n# a comment line\n2 1\n# another\n255\n" + bytes([10, 20, 30, 40, 50, 60])
    f = _decode_ppm(ppm, 16)
    assert f[0] == 2.0 and f[1] == 1.0
    assert abs(f[3] - (10 + 40) / 2 / 255.0) < 1e-12  # mean R

    wav = encode_wav([100, -100], sample_rate=44100)
    # splice a LIST chunk between fmt and data
    fmt_end = wav.index(b"data")
    junk = b"LIST" + struct.pack("<I", 4) + b"INFO"
    spliced = wav[:fmt_end] + junk + wav[fmt_end:]
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    g = _decode_wav(spliced, 16)
    assert g[1] == 44100.0 and g[2] == 2.0


def test_dedup_clusters_transitive_closure(spark, docs):
    """dedup_clusters == union-find over the very pair graph it builds
    (exact sha groups star-joined to their min id + MinHash-LSH candidate
    pairs): every doc gets the cluster's min doc_id as cluster_id, sizes
    count members, singletons self-cluster. The planted fixture guarantees
    both exact (+100000 ids) and near (+200000 ids) edges exist."""
    from detectingscc_spark.functions.dedup import dedup_clusters, minhash_lsh_pairs

    got = {r.doc_id: (r.cluster_id, r.cluster_size) for r in dedup_clusters(spark, docs).collect()}

    sha_pairs = [
        (r.keeper, r.doc_id)
        for r in (
            docs.select("doc_id", F.sha2("text", 256).alias("s"))
            .withColumn("keeper", F.min("doc_id").over(__import__("pyspark").sql.Window.partitionBy("s")))
            .where(F.col("doc_id") != F.col("keeper"))
            .collect()
        )
    ]
    near_pairs = [(r.doc_a, r.doc_b) for r in minhash_lsh_pairs(docs).collect()]
    assert sha_pairs and near_pairs  # fixture really plants both kinds

    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    all_ids = [r.doc_id for r in docs.select("doc_id").collect()]
    for i in all_ids:
        find(i)
    for a, b in sha_pairs + near_pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    from collections import Counter

    roots = {i: find(i) for i in all_ids}
    sizes = Counter(roots.values())
    want = {i: (roots[i], sizes[roots[i]]) for i in all_ids}
    assert got == want


# ---- repetition / sampling / retrieval (round-6 pipeline additions) ----


def test_repetition_stats_known_values(spark):
    from detectingscc_spark.functions.text import repetition_stats

    df = spark.createDataFrame(
        [(1, "a a a a"), (2, "a b c"), (3, "x")], ["doc_id", "text"]
    )
    rows = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert rows[1]["n_words"] == 4
    assert rows[1]["dup_word_frac"] == 0.75
    assert rows[1]["top_bigram_frac"] == 1.0  # "a a" is every bigram
    assert rows[2]["dup_word_frac"] == 0.0
    assert rows[2]["top_bigram_frac"] == 0.5  # "a b" / "b c" tie at 1 of 2
    assert rows[3]["n_words"] == 1
    assert rows[3]["dup_word_frac"] == 0.0
    assert rows[3]["top_bigram_frac"] == 0.0  # no bigrams: left-join null path


def test_bm25_ranks_term_density(spark):
    from detectingscc_spark.functions.retrieval import bm25_scores

    df = spark.createDataFrame(
        [
            (1, "query query query pad pad"),
            (2, "query pad pad pad pad"),
            (3, "pad pad pad pad pad"),
            (4, "join query pad pad pad"),
        ],
        ["doc_id", "text"],
    )
    scores = {r["doc_id"]: r["score"] for r in bm25_scores(df, ["query", "join"]).collect()}
    assert 3 not in scores  # no query term -> no row
    assert scores[1] > scores[2]  # higher tf wins at equal dl
    # two distinct terms beat one: doc 4 matches the rarer "join" too
    assert scores[4] > scores[2]
    assert all(s > 0 for s in scores.values())


def test_stratified_sample_deterministic_and_consistent(spark, docs):
    from detectingscc_spark.functions.sampling import (
        deterministic_keep,
        stratified_sample_stats,
    )

    a = sorted(map(tuple, stratified_sample_stats(docs).collect()))
    b = sorted(map(tuple, stratified_sample_stats(docs).collect()))
    assert a == b  # pure function of doc_id: no seed, no partitioning effect
    totals = {r[0]: r[1] for r in a}
    expected = {
        r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert totals == expected
    n_total = sum(r[1] for r in a)
    n_sampled = sum(r[2] for r in a)
    # 2/16 nominal rate; loose binomial bound at this fixture size
    assert 0.04 < n_sampled / n_total < 0.22
    # the predicate itself agrees with the reported counts
    direct = docs.where(deterministic_keep(F.col("doc_id"), 2)).count()
    assert direct == n_sampled
    with pytest.raises(ValueError):
        deterministic_keep(F.col("doc_id"), 0)


def test_ngram_contamination_planted(spark):
    from detectingscc_spark.functions.retrieval import ngram_contamination

    ev = spark.createDataFrame(
        [(100, "alpha beta gamma delta")], ["doc_id", "text"]
    )
    train = spark.createDataFrame(
        [
            (1, "xx alpha beta gamma yy"),   # shares trigram "alpha beta gamma"
            (2, "beta alpha gamma delta-x"), # same words, no shared trigram
            (3, "zz"),                       # too short for any trigram
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in ngram_contamination(train, ev, n=3).collect()}
    assert set(rows) == {1}
    assert rows[1]["n_eval_docs"] == 1
    assert rows[1]["n_shared_ngrams"] == 1
