"""Persisted incremental embedding-LSH dedup index
(operators/embedding_index.py).

Contract under test: increments sign O(increment), probe the persisted
band buckets, verify candidates with EXACT cosine, and commit survivors'
corpus + index rows atomically; the occupancy trigger fires when corpus
growth outruns the plane count, and the re-bucket verb changes physical
bucketing without changing dedup decisions.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from healthcare_etl_pipeline_spark.operators import embedding_index as EI
from healthcare_etl_pipeline_spark.sources.warehouse import TransactionalWarehouse

DIM = 8


def _basis(i: int) -> list[float]:
    """Unit basis vector e_i — mutually orthogonal (cos 0), identical
    copies cos 1.0: decisive at any threshold in (0, 1)."""
    return [1.0 if j == i else 0.0 for j in range(DIM)]


def _vecs(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )


VEC_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), True),
        T.StructField("embedding", T.ArrayType(T.DoubleType()), True),
    ]
)


@pytest.fixture
def wh(spark, tmp_path):
    w = TransactionalWarehouse(spark, str(tmp_path / "wh"))
    w.create_all()
    return w


def _bootstrap(spark, wh, rows, *, target_bucket=1024, planes="auto"):
    corpus = _vecs(spark, rows)
    wh.register_table("corpus_vecs", VEC_SCHEMA)
    EI.register_embedding_index(
        wh, "emb_idx", corpus, "vec_id", vectors_table="corpus_vecs"
    )
    txn = wh.begin("boot", operation="bootstrap")
    p = EI.build_embedding_index(
        wh,
        corpus,
        index_table="emb_idx",
        dim=DIM,
        threshold=0.9,
        planes=planes,
        target_bucket=target_bucket,
        txn=txn,
    )
    txn.stage(corpus, "corpus_vecs")
    txn.commit()
    return p


def test_increment_drops_corpus_dup_keeps_novel(spark, wh):
    _bootstrap(spark, wh, [(1, _basis(0)), (2, _basis(1))])
    inc = _vecs(spark, [(10, _basis(0)), (11, _basis(2))])
    survivors, rows = EI.novel_against_embedding_index(
        wh, inc, index_table="emb_idx", corpus_table="corpus_vecs"
    )
    assert [r.vec_id for r in survivors.collect()] == [11]
    assert {r.vec_id for r in rows.select("vec_id").distinct().collect()} == {11}


def test_bucket_collision_without_cosine_hit_survives(spark, wh):
    """The verification step is load-bearing: two DIFFERENT vectors that
    happen to share an LSH bucket (orthogonal vectors collide in any
    table where both sign positive on every plane) must NOT dedup —
    exact cosine 0 < threshold keeps the increment doc."""
    _bootstrap(spark, wh, [(1, _basis(0))])
    inc = _vecs(spark, [(10, _basis(1))])
    survivors, _ = EI.novel_against_embedding_index(
        wh, inc, index_table="emb_idx", corpus_table="corpus_vecs"
    )
    assert [r.vec_id for r in survivors.collect()] == [10]


def test_within_increment_greedy_keeps_smaller_id(spark, wh):
    _bootstrap(spark, wh, [(1, _basis(0))])
    inc = _vecs(spark, [(10, _basis(3)), (11, _basis(3)), (12, _basis(4))])
    survivors, _ = EI.novel_against_embedding_index(
        wh, inc, index_table="emb_idx", corpus_table="corpus_vecs"
    )
    assert sorted(r.vec_id for r in survivors.collect()) == [10, 12]


def test_second_increment_sees_first_survivors_and_idempotent(spark, wh):
    _bootstrap(spark, wh, [(1, _basis(0))])
    r1 = EI.embedding_dedup_increment(
        wh,
        _vecs(spark, [(10, _basis(2))]),
        index_table="emb_idx",
        corpus_table="corpus_vecs",
        batch_id="i1",
    )
    assert r1["committed"]
    # retry of the same batch is a no-op
    assert not EI.embedding_dedup_increment(
        wh,
        _vecs(spark, [(10, _basis(2))]),
        index_table="emb_idx",
        corpus_table="corpus_vecs",
        batch_id="i1",
    )["committed"]
    assert wh.read("corpus_vecs").filter("vec_id = 10").count() == 1
    # inc2's dup of an inc1 SURVIVOR is caught through the updated index
    survivors, _ = EI.novel_against_embedding_index(
        wh,
        _vecs(spark, [(20, _basis(2)), (21, _basis(3))]),
        index_table="emb_idx",
        corpus_table="corpus_vecs",
    )
    assert [r.vec_id for r in survivors.collect()] == [21]


def test_occupancy_trigger_fires_on_growth_and_rebucket_clears_it(spark, wh):
    # target_bucket=4: 3 vectors → lo-bound 2 planes at build
    p0 = _bootstrap(
        spark, wh, [(i, _basis(i)) for i in range(3)], target_bucket=4
    )
    assert p0 == 2
    assert not EI.needs_rebucket(
        wh, "emb_idx", "corpus_vecs", target_bucket=4
    )
    # grow the corpus past the occupancy target (40 rows, target 4 →
    # auto_planes = ceil(log2(10)) = 4): the flag must fire
    import numpy as np

    rng = np.random.default_rng(7)
    grown = [
        (100 + i, [float(x) for x in rng.standard_normal(DIM)])
        for i in range(40)
    ]
    txn = wh.begin("grow", operation="append")
    txn.stage(_vecs(spark, grown), "corpus_vecs")
    txn.commit()
    assert EI.needs_rebucket(wh, "emb_idx", "corpus_vecs", target_bucket=4)
    # the increment path surfaces the same flag with its commit
    res = EI.embedding_dedup_increment(
        wh,
        _vecs(spark, [(500, _basis(5))]),
        index_table="emb_idx",
        corpus_table="corpus_vecs",
        target_bucket=4,
        batch_id="i-grow",
    )
    assert res["needs_rebucket"]
    p1 = EI.rebucket_embedding_index(
        wh,
        index_table="emb_idx",
        corpus_table="corpus_vecs",
        target_bucket=4,
    )
    assert p1 == 4
    assert not EI.needs_rebucket(wh, "emb_idx", "corpus_vecs", target_bucket=4)
    # re-signed index covers the WHOLE corpus, one run (old runs replaced)
    assert (
        wh.read("emb_idx").select("vec_id").distinct().count()
        == wh.read("corpus_vecs").count()
    )
    # occupancy view: 4 planes → up to 16 buckets/table, finer than 2
    occ = {r.tbl: r.n_buckets for r in EI.bucket_occupancy(wh, "emb_idx").collect()}
    assert max(occ.values()) > 4  # finer than the 2-plane 4-bucket ceiling


def test_rebucket_preserves_dedup_decisions(spark, wh):
    """Probe-identity: candidates are verified with exact cosine either
    way, and exact-dup vectors collide at any plane count — so the SAME
    increment dedups identically against the 2-plane and 4-plane forms
    of the index."""
    _bootstrap(spark, wh, [(1, _basis(0)), (2, _basis(1)), (3, _basis(2))])
    # 10 dups corpus 1; 11/12 within-inc pair (12 dominated); 13 dups
    # corpus 2; 14 novel → survivors [11, 14] under either bucketing
    inc = _vecs(
        spark,
        [
            (10, _basis(0)),
            (11, _basis(5)),
            (12, _basis(5)),
            (13, _basis(1)),
            (14, _basis(6)),
        ],
    )
    before, _ = EI.novel_against_embedding_index(
        wh, inc, index_table="emb_idx", corpus_table="corpus_vecs"
    )
    ids_before = sorted(r.vec_id for r in before.collect())
    EI.rebucket_embedding_index(
        wh,
        index_table="emb_idx",
        corpus_table="corpus_vecs",
        planes=4,
    )
    assert EI.read_meta(wh, "emb_idx")["planes"] == 4
    after, _ = EI.novel_against_embedding_index(
        wh, inc, index_table="emb_idx", corpus_table="corpus_vecs"
    )
    assert sorted(r.vec_id for r in after.collect()) == ids_before == [11, 14]


def test_gdpr_forget_unblocks_reingest(spark, wh):
    """register_embedding_index wires the derived-index dependency: a
    forgotten vector's buckets die with its corpus row, so re-ingesting
    the same embedding under a new id survives."""
    _bootstrap(spark, wh, [(1, _basis(0)), (2, _basis(1))])
    erased = wh.forget({"corpus_vecs": F.col("vec_id") == 1})
    assert erased["corpus_vecs"] == 1 and erased["emb_idx"] > 0
    survivors, _ = EI.novel_against_embedding_index(
        wh,
        _vecs(spark, [(10, _basis(0)), (11, _basis(1))]),
        index_table="emb_idx",
        corpus_table="corpus_vecs",
    )
    assert [r.vec_id for r in survivors.collect()] == [10]
