"""Corpus generation + ingest: edge extraction parity (built-in vs pandas
path vs generator rule) and the sha256 per-row invariant (input_hint)."""

from pyspark.sql import functions as F

from detectingscc_spark.corpus import expected_edges, generate_corpus
from detectingscc_spark.ingest import content_manifest, ingest, verify_sha256

N = 300


def test_corpus_deterministic(spark):
    a = generate_corpus(spark, N).orderBy("fid").collect()
    b = generate_corpus(spark, N).orderBy("fid").collect()
    assert a == b
    assert len(a) == N
    assert len({(r["repo"], r["path"]) for r in a}) == N


def test_extraction_matches_rule(spark):
    corpus = generate_corpus(spark, N)
    _, edges, _ = ingest(spark, corpus)
    exp = {(r["src"], r["dst"]) for r in expected_edges(spark, N).collect()}
    got = {(r["src"], r["dst"]) for r in edges.collect()}
    assert got == exp
    assert len(exp) > N  # successor backbone + shortcuts


def test_pandas_extractor_parity(spark):
    corpus = generate_corpus(spark, N)
    _, e_builtin, _ = ingest(spark, corpus, use_pandas=False)
    _, e_pandas, _ = ingest(spark, corpus, use_pandas=True)
    a = {(r["src"], r["dst"], r["part"]) for r in e_builtin.collect()}
    b = {(r["src"], r["dst"], r["part"]) for r in e_pandas.collect()}
    assert a == b


def test_sha256_invariant(spark):
    corpus = generate_corpus(spark, N)
    before = content_manifest(corpus)
    verts, edges, _ = ingest(spark, corpus)
    # ingest must not mutate content: re-derive manifest after running ingest
    assert verify_sha256(before, corpus) == 0
    # and the manifest itself is stable/deterministic
    m1 = sorted((r["repo"], r["path"], r["sha"]) for r in before.collect())
    m2 = sorted(
        (r["repo"], r["path"], r["sha"]) for r in content_manifest(generate_corpus(spark, N)).collect()
    )
    assert m1 == m2


def test_mint_vertices_fallback_dense_deterministic(spark):
    """Corpus WITHOUT a fid column takes the rank fallback: ids must be
    dense 0..n-1, equal to the global (repo, path) sort order, computed
    without any unpartitioned window over the file rows (plan check)."""
    from detectingscc_spark.ingest import mint_vertices

    corpus = generate_corpus(spark, N).drop("fid")
    v = mint_vertices(corpus)
    rows = v.orderBy("id").collect()
    assert [r["id"] for r in rows] == list(range(N))
    expected = sorted((r["repo"], r["path"]) for r in rows)
    assert [(r["repo"], r["path"]) for r in rows] == expected
    # deterministic across invocations
    again = mint_vertices(generate_corpus(spark, N).drop("fid")).orderBy("id").collect()
    assert rows == again
    # no single-partition pass over the file dimension: the row_number
    # window must be PARTITIONED by repo (windowspecdefinition(repo#...);
    # the only unpartitioned window is the cumulative sum over the
    # one-row-per-repo aggregate
    plan = v._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "row_number()" in line:
            assert "windowspecdefinition(repo#" in line, line
    corpus = generate_corpus(spark, N)
    verts, edges, _ = ingest(spark, corpus)
    assert verts.count() == N
    ids = [r["id"] for r in verts.select("id").orderBy("id").collect()]
    assert ids == list(range(N))
    # every edge endpoint resolves to a vertex
    dangling = (
        edges.join(verts.select(F.col("id").alias("dst")), "dst", "left_anti").count()
        + edges.join(verts.select(F.col("id").alias("src")), "src", "left_anti").count()
    )
    assert dangling == 0
