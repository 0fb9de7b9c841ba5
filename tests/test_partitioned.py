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


# ---- property test: the streamed .graph sink over random digraphs ------
# The round-5 streaming rewrite introduced driver-side gap-filling for
# isolated vertices (the `nxt` loop) covered only by the 128-vertex
# byte-stable fixture; hypothesis exercises it over random small digraphs
# with isolated vertices, hubs, self-loops and duplicate edges.

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_graphs = st.integers(min_value=1, max_value=10).flatmap(
    lambda n: st.tuples(
        st.just(n),
        st.lists(
            st.tuples(
                st.integers(min_value=1, max_value=n),
                st.integers(min_value=1, max_value=n),
            ),
            min_size=0,
            max_size=25,
        ),
    )
)


def _naive_metis_graph(n_verts, erows):
    """In-memory reference writer with the sink's documented semantics:
    header `V E`, line i = ascending out-neighbors then ascending
    in-neighbors, every number followed by one space, empty line for an
    isolated vertex, duplicates kept."""
    outs = {i: [] for i in range(1, n_verts + 1)}
    ins = {i: [] for i in range(1, n_verts + 1)}
    for u, v in erows:
        outs[u].append(v)
        ins[v].append(u)
    lines = [f"{n_verts} {len(erows)}\n"]
    for i in range(1, n_verts + 1):
        nbrs = sorted(outs[i]) + sorted(ins[i])
        lines.append("".join(f"{x} " for x in nbrs) + "\n" if nbrs else "\n")
    return "".join(lines)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(_graphs)
def test_metis_graph_sink_property(spark, tmp_path, g):
    from collections import Counter

    from detectingscc_spark.sources.gtgraph import write_metis_graph

    n_verts, erows = g
    edges = spark.createDataFrame(
        [(u, v) for u, v in erows] or [(None, None)], "src long, dst long"
    ).where("src is not null")
    out = tmp_path / f"prop_{n_verts}_{len(erows)}.graph"
    write_metis_graph(edges, str(out), n_verts=n_verts)

    with open(out) as f:
        got = f.read()
    assert got == _naive_metis_graph(n_verts, erows)

    # information-content roundtrip: line i holds outs(i)++ins(i), so the
    # multiset of (line_vertex, neighbor) pairs over the whole file equals
    # edges ++ reversed(edges) — every edge appears exactly twice
    lines = got.splitlines()
    header_v, header_e = (int(x) for x in lines[0].split())
    assert header_v == n_verts and header_e == len(erows)
    assert len(lines) == 1 + n_verts
    seen = Counter(
        (i, int(x))
        for i, ln in enumerate(lines[1:], start=1)
        for x in ln.split()
    )
    want = Counter(erows) + Counter((v, u) for u, v in erows)
    assert seen == want
