"""SCC exactness vs independent Kosaraju oracle on the reference's own
fixture graphs (/root/reference/data/*.gr) — golden values in SURVEY.md §5."""

import os

import pytest

from detectingscc_spark.operators.scc import strongly_connected_components
from detectingscc_spark.sources.gtgraph import gtgraph_meta, read_gtgraph

from .conftest import REF_DATA
from .oracles import kosaraju_scc

GOLDEN = {
    "sample0.gr": 4,
    "sample4.gr": 4,
    "sample5.gr": 3,
    "sample1.gr": 3,
    "sample128.gr": 13,
}


def _run_scc(spark, name, **kw):
    path = os.path.join(REF_DATA, name)
    v, _ = gtgraph_meta(spark, path)
    edges = read_gtgraph(spark, path)
    vertices = spark.range(1, v + 1).withColumnRenamed("id", "id")
    result = strongly_connected_components(spark, edges, vertices, **kw)
    got = {r["id"]: r["scc_id"] for r in result.collect()}
    erows = [(r["src"], r["dst"]) for r in edges.collect()]
    expect = kosaraju_scc(erows, list(range(1, v + 1)))
    return got, expect, v


@pytest.mark.parametrize("name", ["sample0.gr", "sample4.gr", "sample5.gr"])
def test_scc_small_distributed(spark, name):
    got, expect, v = _run_scc(spark, name)
    assert len(got) == v
    assert got == expect
    assert len(set(got.values())) == GOLDEN[name]


def test_scc_sample1_distributed(spark):
    got, expect, v = _run_scc(spark, "sample1.gr")
    assert got == expect
    assert len(set(got.values())) == GOLDEN["sample1.gr"]


def test_scc_sample128_distributed(spark):
    got, expect, v = _run_scc(spark, "sample128.gr")
    assert got == expect
    assert len(set(got.values())) == GOLDEN["sample128.gr"]


def test_scc_local_finish_path(spark):
    """Driver-side Tarjan finish must agree with the oracle (sample128,
    threshold above its edge count so the residual finishes locally)."""
    got, expect, _ = _run_scc(spark, "sample128.gr", local_finish_edges=1_000_000)
    assert got == expect


def test_scc_no_trim2(spark):
    got, expect, _ = _run_scc(spark, "sample5.gr", trim2_enabled=False)
    assert got == expect


@pytest.mark.parametrize("name", ["sample5.gr", "sample128.gr"])
def test_scc_csr_expansion(spark, name):
    """The Arrow CSR multi-hop kernel must agree with the join expander."""
    got, expect, _ = _run_scc(spark, name, expand="csr")
    assert got == expect


def test_scc_corpus_ingest_end_to_end(spark):
    """corpus -> pandas-UDF extraction -> SCC, vs oracle on rule edges."""
    from detectingscc_spark.corpus import generate_corpus
    from detectingscc_spark.ingest import ingest
    from .oracles import kosaraju_scc as _k

    n = 400
    corpus = generate_corpus(spark, n)
    verts, edges, _ = ingest(spark, corpus, use_pandas=True)
    res = strongly_connected_components(spark, edges, verts.select("id"))
    got = {r["id"]: r["scc_id"] for r in res.collect()}
    erows = [(r["src"], r["dst"]) for r in edges.collect()]
    assert got == _k(erows, list(range(n)))


def test_scc_hub_skew_salted_path(spark, monkeypatch):
    """Hub-skewed graph (one vertex touches ~50% of edges) driven through
    the SALTED hub-split join: BROADCAST_ROW_LIMIT is forced to 0 so
    every hop takes the shuffle path, and hub_degree_threshold=100 makes
    the hub's adjacency split out and salted across SALT_PARTS
    partitions. Output must stay exact."""
    from detectingscc_spark.operators import scc as scc_mod
    from .oracles import kosaraju_scc as _k

    monkeypatch.setattr(scc_mod, "BROADCAST_ROW_LIMIT", 0)
    n = 600
    hub = 0
    edges = []
    # ring 0..n-1 (one giant SCC) + hub spokes to/from every 2nd vertex
    for i in range(n):
        edges.append((i, (i + 1) % n))
    for i in range(2, n, 2):
        edges.append((hub, i))
        edges.append((i, hub))
    df = spark.createDataFrame(edges, "src long, dst long")
    res = strongly_connected_components(spark, df, hub_degree_threshold=100)
    got = {r["id"]: r["scc_id"] for r in res.collect()}
    assert got == _k(edges, list(range(n)))
    assert len(set(got.values())) == 1  # ring makes it one SCC


def test_scc_big_frontier_plain_shuffle_path(spark, monkeypatch):
    """No hubs above threshold + frontier past the broadcast limit ->
    the plain shuffle-join branch. Output must stay exact."""
    from detectingscc_spark.operators import scc as scc_mod
    from .oracles import kosaraju_scc as _k

    monkeypatch.setattr(scc_mod, "BROADCAST_ROW_LIMIT", 0)
    n = 400
    edges = [(i, (i + 1) % n) for i in range(n)]
    edges += [(i, (i + 7) % n) for i in range(0, n, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    res = strongly_connected_components(spark, df)
    got = {r["id"]: r["scc_id"] for r in res.collect()}
    assert got == _k(edges, list(range(n)))


def test_entry_contract(spark):
    import __spark_entry__ as se

    df = se.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"id", "scc_id"}
    assert set(se.oracle_sql()) <= set(se.queries())


@pytest.mark.slow
def test_scc_sample2_giant(spark):
    """32,768-vertex giant-SCC graph (golden: 4,889 SCCs, largest 25,039)."""
    got, expect, v = _run_scc(spark, "sample2.gr", local_finish_edges=50_000)
    assert got == expect
    assert len(set(got.values())) == 4889


@pytest.mark.parametrize("name,unroll", [("sample5.gr", 2), ("sample128.gr", 2), ("sample128.gr", 4)])
def test_scc_bfs_unroll_windows(spark, name, unroll):
    """Windowed BFS (k hops per driver action, tagged levels, last level
    = next frontier) must agree with the oracle; sample128 has depth > 4
    so windows genuinely chain, and its cycles exercise the in-window
    dedup anti-joins."""
    got, expect, _ = _run_scc(spark, name, bfs_unroll=unroll)
    assert got == expect
    assert len(set(got.values())) == GOLDEN[name]
