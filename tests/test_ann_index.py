"""ANN probe pushdown into the lancelike source (reference
__push_ann__ df.py:1264-1352): layout writer, exact pruned top-k,
and the vector_nn_join auto-routing."""

import numpy as np
import pytest
from pyspark.sql import functions as F


def _clustered_df(spark, n_clusters=8, per_cluster=80, dim=16, seed=11):
    rng = np.random.default_rng(seed)
    dirs = rng.standard_normal((n_clusters, dim))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    rows = []
    i = 0
    for c in range(n_clusters):
        for _ in range(per_cluster):
            v = dirs[c] + 0.05 * rng.standard_normal(dim)
            rows.append((i, v.tolist()))
            i += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


@pytest.fixture(scope="module")
def indexed(spark, tmp_path_factory):
    from quokka_spark.functions.ann_index import write_ann_index
    df = _clustered_df(spark)
    path = str(tmp_path_factory.mktemp("ann") / "layout")
    meta = write_ann_index(df, path, "embedding", "vec_id", n_fragments=8)
    return df, path, meta


def test_write_ann_index_layout_and_sidecar(spark, indexed):
    df, path, meta = indexed
    assert meta["dim"] == 16
    frs = meta["fragments"]
    assert len(frs) >= 4                       # clusters actually split
    assert sum(f["count"] for f in frs) == df.count()
    assert all(-1.0 <= f["min_cos"] <= 1.0 for f in frs)
    # the layout stays a plain lancelike fragment directory: a full
    # scan through the generic reader sees every row unchanged
    from quokka_spark import QuokkaContext
    qc = QuokkaContext(spark=spark)
    back = qc.read_lance(path, vec_column="embedding").df
    assert back.count() == df.count()
    assert sorted(back.columns) == ["embedding", "vec_id"]


def test_ann_index_topk_exact_and_prunes_fragments(spark, indexed):
    """The pruned top-k must be BIT-IDENTICAL to brute force over the
    whole dataset (ties included) while reading fewer fragments than
    exist — the reference's index-probe contract."""
    from quokka_spark.functions.ann_index import ann_index_topk
    from quokka_spark.functions.similarity import brute_force_topk
    df, path, meta = indexed
    probes = df.filter(F.col("vec_id") % 160 == 3)   # one per 2 clusters
    info = {}
    got = (ann_index_topk(spark, path, probes, 5, scan_info=info)
           .toPandas().sort_values(["probe_id", "rank"]).reset_index(drop=True))
    want = (brute_force_topk(df, probes, "embedding", 5)
            .toPandas().sort_values(["probe_id", "rank"]).reset_index(drop=True))
    assert got["probe_id"].tolist() == want["probe_id"].tolist()
    assert got["vec_id"].tolist() == want["vec_id"].tolist()
    assert np.allclose(got["cosine_sim"], want["cosine_sim"], atol=1e-12)
    # pruning really happened: clustered data, distant cones skipped
    assert info["fragments_total"] == len(meta["fragments"])
    assert 0 < info["fragments_read"] < info["fragments_total"], info


def test_vector_nn_join_routes_through_index(spark, indexed):
    """read_lance over an indexed layout + vector_nn_join must push
    the probes into the source (fragments_read < total); any
    intermediate transform drops the provenance and takes the
    full-scan path, with identical results either way."""
    from quokka_spark import QuokkaContext
    df, path, meta = indexed
    qc = QuokkaContext(spark=spark)
    probes = df.filter(F.col("vec_id") < 3)
    ds = qc.read_lance(path, vec_column="embedding")
    assert getattr(ds, "_ann_index_path", None) == path
    info = {}
    pushed = (ds.vector_nn_join(probes, "embedding", k=4, scan_info=info)
              .df.toPandas().sort_values(["probe_id", "rank"])
              .reset_index(drop=True))
    assert info["fragments_read"] < info["fragments_total"]
    filtered = ds.filter("vec_id >= 0")
    assert getattr(filtered, "_ann_index_path", None) is None
    full = (filtered.vector_nn_join(probes, "embedding", k=4)
            .df.toPandas().sort_values(["probe_id", "rank"])
            .reset_index(drop=True))
    assert pushed["vec_id"].tolist() == full["vec_id"].tolist()
    assert np.allclose(pushed["cosine_sim"], full["cosine_sim"], atol=1e-12)


def test_ann_index_uniform_data_never_wrong(spark, tmp_path):
    """Adversarially uniform vectors: pruning may degrade to a full
    scan, but the answer must stay exact — the contract is 'never
    worse than unindexed, never wrong'."""
    from quokka_spark.functions.ann_index import (ann_index_topk,
                                                  write_ann_index)
    from quokka_spark.functions.similarity import brute_force_topk
    rng = np.random.default_rng(3)
    rows = [(i, rng.standard_normal(8).tolist()) for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    path = str(tmp_path / "uni")
    write_ann_index(df, path, "embedding", "vec_id", n_fragments=4)
    probes = df.filter(F.col("vec_id") < 3)
    info = {}
    got = (ann_index_topk(spark, path, probes, 7, scan_info=info)
           .toPandas().sort_values(["probe_id", "rank"]).reset_index(drop=True))
    want = (brute_force_topk(df, probes, "embedding", 7)
            .toPandas().sort_values(["probe_id", "rank"]).reset_index(drop=True))
    assert got["vec_id"].tolist() == want["vec_id"].tolist()
    assert info["fragments_read"] <= info["fragments_total"]


def test_ann_index_k_exceeds_total(spark, tmp_path):
    """k larger than the corpus: every vector comes back, ranked."""
    from quokka_spark.functions.ann_index import (ann_index_topk,
                                                  write_ann_index)
    rng = np.random.default_rng(4)
    rows = [(i, rng.standard_normal(4).tolist()) for i in range(10)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    path = str(tmp_path / "tiny")
    write_ann_index(df, path, "embedding", "vec_id", n_fragments=3)
    probes = df.filter(F.col("vec_id") == 0)
    out = ann_index_topk(spark, path, probes, 50).toPandas()
    assert len(out) == 10
    assert sorted(out["vec_id"]) == list(range(10))


def test_ann_index_dirty_vectors_quarantined(spark, tmp_path):
    """NULL/ragged vectors land in fragment -1: stored (lossless
    layout) but excluded from the index — the probe path never reads
    or returns them."""
    from quokka_spark.functions.ann_index import (ann_index_topk,
                                                  write_ann_index)
    rng = np.random.default_rng(5)
    rows = [(i, rng.standard_normal(4).tolist()) for i in range(20)]
    rows += [(100, None), (101, [1.0, 2.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    path = str(tmp_path / "dirty")
    meta = write_ann_index(df, path, "embedding", "vec_id", n_fragments=2)
    assert sum(f["count"] for f in meta["fragments"]) == 20
    assert spark.read.parquet(path).count() == 22   # lossless
    probes = df.filter(F.col("vec_id") < 2)
    out = ann_index_topk(spark, path, probes, 25).toPandas()
    assert not set(out["vec_id"]) & {100, 101}
    assert len(out) == 40                            # 2 probes x 20 valid


def test_write_lance_verb_roundtrip_and_pushdown(spark, tmp_path):
    """DataStream.write_lance is the sink face of the index layout
    (the reference materializes vector datasets with an IVF index the
    same way): indexed writes must round-trip through read_lance with
    probe pushdown active; ann_index=False writes a plain scan-only
    fragment directory."""
    from quokka_spark import QuokkaContext
    from quokka_spark.datastream import DataStream
    qc = QuokkaContext(spark=spark)
    df = _clustered_df(spark, n_clusters=4, per_cluster=40)
    path = str(tmp_path / "wl")
    out = DataStream(qc, df).write_lance(
        path, vec_column="embedding", id_column="vec_id", n_fragments=4)
    assert out.df.count() >= 4                 # filename stream, >=1/frag
    ds = qc.read_lance(path, vec_column="embedding")
    assert getattr(ds, "_ann_index_path", None) == path
    assert ds.df.count() == df.count()
    probes = df.filter(F.col("vec_id") < 2)
    info = {}
    res = (ds.vector_nn_join(probes, "embedding", k=3, scan_info=info)
           .df.toPandas())
    assert len(res) == 6 and info["fragments_read"] <= info["fragments_total"]
    # plain layout: readable, no index provenance
    plain = str(tmp_path / "plain")
    DataStream(qc, df).write_lance(plain, vec_column="embedding",
                                   ann_index=False)
    ds2 = qc.read_lance(plain, vec_column="embedding")
    assert getattr(ds2, "_ann_index_path", None) is None
    assert ds2.df.count() == df.count()
