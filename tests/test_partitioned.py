"""Partitioned SCC (local Tarjan per part + condensation merge) must be
exactly equivalent to the global engine and the Kosaraju oracle —
including on the reference's METIS-partitioned 128-vertex fixture with
its shipped 10-way labeling."""

import os


from detectingscc_spark.operators.partitioned import scc_partitioned
from detectingscc_spark.sources.gtgraph import (
    gtgraph_meta,
    read_gtgraph,
    read_metis_partition,
)

from .conftest import REF_DATA
from .oracles import kosaraju_scc

METIS_PART = "/root/reference/src/MeTiSInput128.graph.part.10"


def test_partitioned_matches_oracle_hash_parts(spark):
    path = os.path.join(REF_DATA, "sample128.gr")
    v, _ = gtgraph_meta(spark, path)
    edges = read_gtgraph(spark, path)
    res = scc_partitioned(spark, edges, spark.range(1, v + 1), n_parts=10)
    got = {r["id"]: r["scc_id"] for r in res.collect()}
    erows = [(r["src"], r["dst"]) for r in edges.collect()]
    assert got == kosaraju_scc(erows, list(range(1, v + 1)))


def test_partitioned_with_metis_labels(spark):
    """Uses the reference's own 10-way METIS labeling as the part column
    (the exact input detectSCC consumes, /root/reference/src/load.cpp:118)."""
    path = os.path.join(REF_DATA, "sample128.gr")
    v, _ = gtgraph_meta(spark, path)
    edges = read_gtgraph(spark, path)
    labels = read_metis_partition(spark, METIS_PART)
    res = scc_partitioned(spark, edges, labels.select("id"), partitions=labels)
    got = {r["id"]: r["scc_id"] for r in res.collect()}
    erows = [(r["src"], r["dst"]) for r in edges.collect()]
    assert got == kosaraju_scc(erows, list(range(1, v + 1)))


def test_partitioned_on_corpus_graph(spark):
    from detectingscc_spark.corpus import generate_corpus
    from detectingscc_spark.ingest import ingest

    n = 500
    corpus = generate_corpus(spark, n)
    verts, edges, _ = ingest(spark, corpus)
    res = scc_partitioned(spark, edges, verts.select("id"), n_parts=8)
    got = {r["id"]: r["scc_id"] for r in res.collect()}
    erows = [(r["src"], r["dst"]) for r in edges.collect()]
    assert got == kosaraju_scc(erows, list(range(n)))


def test_partitioned_oversized_part_degrades_to_global(spark):
    """A part too big for one Arrow batch must bypass the local Tarjan
    (identity labels) and be absorbed by the global phase — same exact
    SCC ids, no executor-sized assumption. Forced here by a tiny
    max_local_edges so every hash part is 'oversized'; also mixed: only
    part 0 oversized via a crafted threshold."""
    path = os.path.join(REF_DATA, "sample128.gr")
    v, _ = gtgraph_meta(spark, path)
    edges = read_gtgraph(spark, path)
    erows = [(r["src"], r["dst"]) for r in edges.collect()]
    want = kosaraju_scc(erows, list(range(1, v + 1)))

    # every part oversized -> pure global-engine path through the
    # partitioned API (local phase contributes nothing)
    res = scc_partitioned(spark, edges, spark.range(1, v + 1), n_parts=10, max_local_edges=1)
    assert {r["id"]: r["scc_id"] for r in res.collect()} == want

    # threshold between part sizes -> some parts local, some global
    res2 = scc_partitioned(spark, edges, spark.range(1, v + 1), n_parts=10, max_local_verts=12)
    assert {r["id"]: r["scc_id"] for r in res2.collect()} == want


def test_metis_sink_roundtrip(spark, tmp_path):
    """write_metis_partition emits the reference's .part format: reading
    the reference's shipped labeling and writing it back is byte-stable."""
    from detectingscc_spark.sources.gtgraph import write_metis_partition

    labels = read_metis_partition(spark, METIS_PART)
    out = tmp_path / "roundtrip.part.10"
    write_metis_partition(labels, str(out))
    reread = read_metis_partition(spark, str(out))
    a = {(r["id"], r["part"]) for r in labels.collect()}
    b = {(r["id"], r["part"]) for r in reread.collect()}
    assert a == b
    with open(METIS_PART) as f:
        orig = [int(x) for x in f.read().split()]
    with open(out) as f:
        ours = [int(x) for x in f.read().split()]
    assert orig == ours


def test_metis_graph_sink_byte_stable(spark, tmp_path):
    """write_metis_graph reproduces the reference's GTgraph→METIS
    converter output (/root/reference/src/MetisInput.cpp:114-131) BYTE
    FOR BYTE on the shipped 128-vertex sample: same header, same
    out-then-in neighbor order, same trailing-space line format."""
    from detectingscc_spark.sources.gtgraph import write_metis_graph

    path = os.path.join(REF_DATA, "sample128.gr")
    v, e = gtgraph_meta(spark, path)
    edges = read_gtgraph(spark, path)
    out = tmp_path / "MeTiSInput128.graph"
    write_metis_graph(edges, str(out), n_verts=v, n_edges=e)
    with open("/root/reference/src/MeTiSInput128.graph", "rb") as f:
        ref = f.read()
    with open(out, "rb") as f:
        ours = f.read()
    assert ours == ref


def test_metis_graph_sink_rejects_zero_based(spark, tmp_path):
    import pytest

    from detectingscc_spark.sources.gtgraph import write_metis_graph

    zero_based = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    with pytest.raises(ValueError, match="1-indexed"):
        write_metis_graph(zero_based, str(tmp_path / "z.graph"), n_verts=3)


def test_metis_sink_rejects_zero_based_and_sparse_ids(spark, tmp_path):
    """The .part format is 1-indexed and dense; a 0-based engine id frame
    or a gap in the id space must fail loudly, never silently drop id 0 or
    fabricate label 0 for missing vertices."""
    import pytest

    from detectingscc_spark.sources.gtgraph import write_metis_partition

    zero_based = spark.createDataFrame([(0, 1), (1, 2)], "id long, part int")
    with pytest.raises(ValueError, match="1-indexed"):
        write_metis_partition(zero_based, str(tmp_path / "z.part"))

    sparse = spark.createDataFrame([(1, 1), (3, 2)], "id long, part int")
    with pytest.raises(ValueError, match="no label"):
        write_metis_partition(sparse, str(tmp_path / "s.part"))
