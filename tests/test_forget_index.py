"""GDPR erasure → derived-index consistency.

Base-table ``forget``/``delete_where`` alone leave a forgotten document's
derived state behind: its LSH band buckets keep suppressing its future
near-duplicates from the corpus, and its ANN codes keep surfacing it as a
neighbor. These tests pin the round-7 contract: erasure on a base table
propagates to its registered derived indexes IN THE SAME TRANSACTION
(warehouse tables), and the persisted cell-partitioned ANN index has a
partition-pruned forget of its own.

Reference analogue: the erasure semantics SURVEY.md §2.9 already claims
for base tables, extended to materialized sidecars.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from healthcare_etl_pipeline_spark.operators import dedup_index as DI
from healthcare_etl_pipeline_spark.operators import similarity as S
from healthcare_etl_pipeline_spark.sources.warehouse import TransactionalWarehouse

DOC_A = "alpha beta gamma delta epsilon zeta eta theta"
DOC_B = "one two three four five six seven eight nine"
DOC_C = "red orange yellow green blue indigo violet ultraviolet"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _corpus_schema(spark):
    return _docs(spark, []).schema


@pytest.fixture
def wh(spark, tmp_path):
    w = TransactionalWarehouse(spark, str(tmp_path / "wh"))
    w.create_all()
    return w


def _bootstrap(spark, wh, rows):
    corpus = _docs(spark, rows)
    wh.register_table("corpus_docs", corpus.schema)
    DI.register_minhash_index(
        wh, "mh_idx", corpus, "doc_id", docs_table="corpus_docs"
    )
    txn = wh.begin("boot", operation="bootstrap")
    DI.build_minhash_index(wh, corpus, index_table="mh_idx", txn=txn)
    txn.stage(corpus, "corpus_docs")
    txn.commit()
    return corpus


def test_forget_erases_index_rows_in_same_commit(spark, wh):
    _bootstrap(spark, wh, [(1, DOC_A), (2, DOC_B)])
    pre_seq = wh.snapshots()[-1]["seq"]
    erased = wh.forget({"corpus_docs": F.col("doc_id") == 1})
    # both the corpus row AND its band buckets are gone, reported per table
    assert erased["corpus_docs"] == 1
    assert erased["mh_idx"] > 0
    assert wh.read("corpus_docs").filter("doc_id = 1").count() == 0
    assert wh.read("mh_idx").filter("doc_id = 1").count() == 0
    assert wh.read("mh_idx").filter("doc_id = 2").count() > 0  # survivor intact
    # ONE commit published both erasures (atomic: no snapshot where the
    # corpus row is gone but its buckets linger)
    assert wh.snapshots()[-1]["seq"] == pre_seq + 1
    # time travel to the pre-forget snapshot still sees both (and dies
    # together at vacuum, which for GDPR is the point)
    assert wh.read("corpus_docs", as_of=pre_seq).filter("doc_id = 1").count() == 1
    assert wh.read("mh_idx", as_of=pre_seq).filter("doc_id = 1").count() > 0


def test_forgotten_doc_no_longer_blocks_near_duplicates(spark, wh):
    """The erasure leak this feature closes: after forgetting doc 1, a
    new increment doc with the same text must SURVIVE dedup (nothing in
    the live corpus duplicates it) instead of being suppressed by the
    ghost's stale buckets."""
    _bootstrap(spark, wh, [(1, DOC_A), (2, DOC_B)])
    # pre-forget: an A-dup is (correctly) dropped
    pre, _ = DI.novel_against_index(
        wh, _docs(spark, [(10, DOC_A)]), index_table="mh_idx"
    )
    assert pre.count() == 0
    wh.forget({"corpus_docs": F.col("doc_id") == 1})
    post, _ = DI.novel_against_index(
        wh, _docs(spark, [(10, DOC_A), (11, DOC_B)]), index_table="mh_idx"
    )
    assert [r.doc_id for r in post.collect()] == [10]  # 11 still dups doc 2


def test_delete_where_tombstones_index_in_same_commit(spark, wh):
    corpus = _docs(spark, [(1, DOC_A), (2, DOC_B), (3, DOC_C)])
    wh.register_table("corpus_docs", corpus.schema, primary_key=("doc_id",))
    DI.register_minhash_index(
        wh, "mh_idx", corpus, "doc_id", docs_table="corpus_docs"
    )
    txn = wh.begin("boot", operation="bootstrap")
    DI.build_minhash_index(wh, corpus, index_table="mh_idx", txn=txn)
    txn.stage(corpus, "corpus_docs")
    txn.commit()
    pre_seq = wh.snapshots()[-1]["seq"]
    n = wh.delete_where("corpus_docs", F.col("doc_id") == 3)
    assert n == 1
    assert wh.snapshots()[-1]["seq"] == pre_seq + 1  # one commit, both hidden
    assert wh.read("corpus_docs").filter("doc_id = 3").count() == 0
    assert wh.read("mh_idx").filter("doc_id = 3").count() == 0
    # merge-on-read: the probe (which reads via wh.read) stops seeing the
    # ghost immediately; compact later applies + retires the tombstones
    survivors, _ = DI.novel_against_index(
        wh, _docs(spark, [(30, DOC_C)]), index_table="mh_idx"
    )
    assert [r.doc_id for r in survivors.collect()] == [30]
    wh.compact("mh_idx")
    assert wh.committed_runs_for("__tomb_mh_idx") == []
    assert wh.read("mh_idx").filter("doc_id = 3").count() == 0


def test_derived_index_registration_is_durable_and_validated(spark, tmp_path):
    wh1 = TransactionalWarehouse(spark, str(tmp_path / "wh"))
    wh1.create_all()
    corpus = _docs(spark, [(1, DOC_A)])
    wh1.register_table("corpus_docs", corpus.schema)
    DI.register_minhash_index(
        wh1, "mh_idx", corpus, "doc_id", docs_table="corpus_docs"
    )
    txn = wh1.begin("boot", operation="bootstrap")
    DI.build_minhash_index(wh1, corpus, index_table="mh_idx", txn=txn)
    txn.stage(corpus, "corpus_docs")
    txn.commit()
    # a COLD handle (new process / branch view) enforces the propagation
    wh2 = TransactionalWarehouse(spark, str(tmp_path / "wh"))
    assert wh2.derived_indexes_of("corpus_docs") == {"mh_idx": ["doc_id"]}
    erased = wh2.forget({"corpus_docs": F.col("doc_id") == 1})
    assert erased["mh_idx"] > 0
    # validation: unknown key column refuses registration
    with pytest.raises(ValueError, match="key column"):
        wh2.register_derived_index(
            "mh_idx", base_table="corpus_docs", key=("nope",)
        )


def test_ann_index_forget_partition_pruned(spark, tmp_path):
    """Forget one vector from a persisted IVF-PQ index: its codes vanish,
    it stops surfacing in top-k, untouched cells' files are bit-identical
    (partition-pruned rewrite), and a cell emptied by the erasure is
    dropped outright."""
    from healthcare_etl_pipeline_spark.catalog import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    q = emb.filter("vec_id < 3")
    c = emb.filter("vec_id >= 3")
    idx = str(tmp_path / "ivfpq")
    S.build_ivfpq_index(c, idx, dim=64, m=8, ks=16, iters=0)

    stored = spark.read.parquet(idx)
    n0 = stored.count()
    # pick a victim that IS served in top-k pre-forget, so the test bites
    pre = S.ann_ivfpq_from_index(spark, idx, q, k=5, dim=64, nprobe=5)
    victim = pre.filter("q_id = 0 AND rank = 1").collect()[0]["vec_id"]
    victim_cell = stored.filter(F.col("vec_id") == victim).collect()[0]["cell"]
    untouched = [
        e for e in os.listdir(idx)
        if e.startswith("cell=") and e != f"cell={victim_cell}"
    ]
    before_files = {
        d: sorted(os.listdir(os.path.join(idx, d))) for d in untouched
    }

    assert S.ann_index_forget(spark, idx, [victim]) == 1
    after = spark.read.parquet(idx)
    assert after.count() == n0 - 1
    assert after.filter(F.col("vec_id") == victim).count() == 0
    post = S.ann_ivfpq_from_index(spark, idx, q, k=5, dim=64, nprobe=5)
    assert post.filter(F.col("vec_id") == victim).count() == 0
    # partition pruning: every non-victim cell kept its exact files
    for d, files in before_files.items():
        assert sorted(os.listdir(os.path.join(idx, d))) == files
    # idempotent / no-hit fast path
    assert S.ann_index_forget(spark, idx, [victim]) == 0

    # empty-cell handling: erase EVERY id in one cell → its dir is gone
    cell_ids = [
        r["vec_id"]
        for r in after.filter(F.col("cell") == victim_cell).collect()
    ]
    if cell_ids:
        S.ann_index_forget(spark, idx, cell_ids)
        assert not os.path.isdir(os.path.join(idx, f"cell={victim_cell}"))
        assert spark.read.parquet(idx).filter(
            F.col("cell") == victim_cell
        ).count() == 0
