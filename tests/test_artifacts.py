"""Keyed ANN index artifacts: content-sensitive keying (a same-size
source rewrite must shift the digest and force a rebuild), pruning of
superseded digests (at most one live digest per kind after ensure_*),
suffix-complete publish (a crash that left the primary dir whole but a
secondary missing must be repaired, not skipped forever), and the
_swap_in failure path (a displaced artifact is restored, never leaked
as a .stale-* sibling over an empty keyed path)."""

import os
import shutil

import pytest

SF = os.environ.get("SPARK_GRAFT_SF_TEST", "/root/testdata/sf0.001")


def _entry():
    import __spark_entry__ as entry

    return entry


def _mk_sf(tmp_path):
    """A private sf_dir whose embeddings.parquet the test may mutate."""
    sf = tmp_path / "sf"
    sf.mkdir()
    src = os.path.join(SF, "embeddings.parquet")
    if os.path.isdir(src):
        shutil.copytree(src, sf / "embeddings.parquet")
    else:
        shutil.copyfile(src, sf / "embeddings.parquet")
    return str(sf)


def _rewrite_same_bytes(target):
    """Rewrite every file under target with its exact same bytes and a
    bumped mtime — size-identical, content-identical, mtime shifted."""
    files = [target] if os.path.isfile(target) else [
        os.path.join(root, fn)
        for root, _dirs, fns in os.walk(target)
        for fn in fns
    ]
    for p in files:
        with open(p, "rb") as f:
            data = f.read()
        with open(p, "wb") as f:
            f.write(data)
        st = os.stat(p)
        os.utime(p, ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000_000))


def _probe_rows(spark, path, sf_dir):
    from detectingscc_spark.functions.ann_index import ann_topk_ivf_indexed

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    df = ann_topk_ivf_indexed(spark, path, emb, [0, 1, 2], k=3, n_probe=4)
    return sorted((r["query_id"], r["vec_id"], r["cos"]) for r in df.collect())


def _live_digests(art_dir, kind):
    import re

    pat = re.compile(re.escape(kind) + r"_([0-9a-f]{16})$")
    return sorted(
        {m.group(1) for n in os.listdir(art_dir) for m in [pat.match(n)] if m}
    )


def test_same_size_rewrite_shifts_key_rebuilds_and_prunes(spark, tmp_path, monkeypatch):
    entry = _entry()
    art = tmp_path / "artifacts"
    monkeypatch.setenv("SPARK_GRAFT_ARTIFACTS_DIR", str(art))
    sf = _mk_sf(tmp_path)

    p1 = entry.ensure_ivf_index(spark, sf, n_centroids=8)
    assert os.path.exists(os.path.join(p1, "_SUCCESS"))
    r1 = _probe_rows(spark, p1, sf)
    assert r1

    # byte-identical rewrite: every file keeps its exact size, only the
    # mtime moves — the size-only key this replaces would silently reuse
    # the old digest here
    emb_dir = os.path.join(sf, "embeddings.parquet")
    _rewrite_same_bytes(emb_dir)
    p2 = entry.ensure_ivf_index(spark, sf, n_centroids=8)
    assert p2 != p1, "same-size rewrite did not shift the artifact key"
    assert os.path.exists(os.path.join(p2, "_SUCCESS"))
    # superseded digest pruned: at most one live digest per kind
    assert _live_digests(str(art), "ann_ivf") == [os.path.basename(p2).split("_")[-1]]
    assert not os.path.exists(p1) and not os.path.exists(p1 + "_centroids")
    # identical bytes → identical index contents
    assert _probe_rows(spark, p2, sf) == r1

    # genuinely different content → the fresh index answers differently
    emb = spark.read.parquet(emb_dir)
    from pyspark.sql import functions as F

    # negate every even vec_id's vector: even↔odd cosines flip sign, so
    # top-k genuinely changes (a global permutation like reverse() would
    # preserve every pairwise dot product)
    changed = emb.select(
        "vec_id",
        F.when(
            F.col("vec_id") % 2 == 0,
            F.transform("embedding", lambda x: -x),
        ).otherwise(F.col("embedding")).alias("embedding"),
    )
    changed.write.mode("overwrite").parquet(str(tmp_path / "emb2"))
    shutil.rmtree(emb_dir) if os.path.isdir(emb_dir) else os.remove(emb_dir)
    shutil.copytree(tmp_path / "emb2", emb_dir)
    p3 = entry.ensure_ivf_index(spark, sf, n_centroids=8)
    assert p3 not in (p1, p2)
    r3 = _probe_rows(spark, p3, sf)
    assert r3 != r1, "probe result did not change after the source table changed"


def test_keep_artifacts_env_disables_pruning(tmp_path, monkeypatch):
    entry = _entry()
    art = tmp_path / "artifacts"
    art.mkdir()
    live = art / "ann_lsh_aaaaaaaaaaaaaaaa"
    stale = art / "ann_lsh_bbbbbbbbbbbbbbbb"
    stale_suffix = art / "ann_lsh_bbbbbbbbbbbbbbbb_centroids"
    other_kind = art / "ann_ivf_cccccccccccccccc"
    unrelated = art / "ivf_centroids"
    live_tmp = art / "ann_lsh_aaaaaaaaaaaaaaaa.build-1-deadbeef"
    for d in (live, stale, stale_suffix, other_kind, unrelated, live_tmp):
        d.mkdir()

    monkeypatch.setenv("SPARK_GRAFT_KEEP_ARTIFACTS", "1")
    entry._prune_superseded("ann_lsh", str(live))
    assert stale.exists(), "pruning ran despite SPARK_GRAFT_KEEP_ARTIFACTS"

    monkeypatch.delenv("SPARK_GRAFT_KEEP_ARTIFACTS")
    entry._prune_superseded("ann_lsh", str(live))
    assert not stale.exists() and not stale_suffix.exists()
    assert live.exists() and live_tmp.exists(), "live digest or its tmp was pruned"
    assert other_kind.exists() and unrelated.exists(), "pruned across kinds"


def test_build_published_repairs_missing_suffix(spark, tmp_path, monkeypatch):
    """The round-5 skip-check bug: primary _SUCCESS present but a
    secondary suffix dir missing (crash between suffix swaps) made every
    replace=False rebuild discard its tmp — the artifact was never
    repaired and every IVF probe failed until a human deleted it."""
    entry = _entry()
    art = tmp_path / "artifacts"
    monkeypatch.setenv("SPARK_GRAFT_ARTIFACTS_DIR", str(art))
    sf = _mk_sf(tmp_path)

    path = entry.ensure_ivf_index(spark, sf, n_centroids=8)
    shutil.rmtree(path + "_centroids")
    path2 = entry.ensure_ivf_index(spark, sf, n_centroids=8)
    assert path2 == path
    assert os.path.exists(os.path.join(path + "_centroids", "_SUCCESS")), (
        "ensure_ivf_index did not repair the missing centroids sibling"
    )
    assert _probe_rows(spark, path, sf)


def test_swap_in_restores_displaced_artifact_on_failure(tmp_path):
    entry = _entry()
    final = tmp_path / "idx"
    final.mkdir()
    (final / "_SUCCESS").touch()
    (final / "part-0").write_text("old")

    with pytest.raises(OSError):
        # tmp does not exist → os.rename(tmp, final) fails for a
        # non-race reason after final was renamed aside
        entry._swap_in(str(tmp_path / "nonexistent-tmp"), str(final))

    assert (final / "_SUCCESS").exists() and (final / "part-0").read_text() == "old", (
        "displaced artifact was not restored to its keyed path"
    )
    leftovers = [n for n in os.listdir(tmp_path) if ".stale-" in n]
    assert not leftovers, f"stale sibling leaked: {leftovers}"
