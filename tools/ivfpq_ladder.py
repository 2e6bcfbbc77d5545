#!/usr/bin/env python
"""IVF-PQ incremental-maintenance parity at a scale rung (VERDICT r8 #7).

``ivfpq_index_append``'s scale claim is that a 100 TB vector index absorbs
daily ingest WITHOUT retrain or rewrite: encode determinism over frozen
books means append-built == fresh-built over the same books. The claim is
unit-tested small; this drives it at a rung:

1. bootstrap the index on 80% of the rung's embeddings (coarse cells =
   the table's label column; books Lloyd-trained on the base residuals);
2. absorb two 10% appends with the FROZEN books;
3. GDPR-forget a deterministic ~0.1% id slice (partition-pruned rewrite);
4. build a SECOND index from scratch — SAME frozen centroids+codebooks,
   one encode pass over exactly the surviving corpus;
5. compare the two code tables by portable digest (exact: ids, cells,
   m int codes) and sampled recall@k through the full two-stage serving
   path. Parity must be EXACT — same books, same codes, same neighbors.

Usage: python tools/ivfpq_ladder.py [SF_DIR] [--work /tmp/ivfpq_rung]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/tmp/sf10")
    ap.add_argument("--work", default="/tmp/ivfpq_rung")
    ap.add_argument("--k", type=int, default=5)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from healthcare_etl_pipeline_spark.catalog import load_table
    from healthcare_etl_pipeline_spark.operators import similarity as S
    from healthcare_etl_pipeline_spark.operators.fingerprint import (
        table_digest,
    )
    from healthcare_etl_pipeline_spark.session import get_spark

    if os.path.isdir(args.work):
        shutil.rmtree(args.work)
    os.makedirs(args.work)
    idx_inc = os.path.join(args.work, "inc")
    idx_fresh = os.path.join(args.work, "fresh")

    spark = get_spark()
    emb = load_table(spark, args.sf_dir, "embeddings")
    n_total = emb.count()
    base = emb.filter(F.col("vec_id") % 10 < 8)
    inc1 = emb.filter(F.col("vec_id") % 10 == 8)
    inc2 = emb.filter(F.col("vec_id") % 10 == 9)
    forget_ids = [
        r.vec_id
        for r in emb.filter(F.col("vec_id") % 1009 == 7)
        .select("vec_id")
        .collect()
    ]
    print(
        f"corpus={n_total} base={base.count()} "
        f"inc1={inc1.count()} inc2={inc2.count()} forget={len(forget_ids)}",
        flush=True,
    )

    t0 = time.time()
    S.build_ivfpq_index(base, idx_inc, dim=64, m=8, ks=16, iters=2)
    t_boot = time.time() - t0
    t0 = time.time()
    S.ivfpq_index_append(spark, idx_inc, inc1, dim=64)
    S.ivfpq_index_append(spark, idx_inc, inc2, dim=64)
    t_append = time.time() - t0
    t0 = time.time()
    n_erased = S.ann_index_forget(spark, idx_inc, forget_ids)
    t_forget = time.time() - t0
    print(
        f"boot {t_boot:.1f}s, 2 appends {t_append:.1f}s, "
        f"forget({n_erased} rows) {t_forget:.1f}s",
        flush=True,
    )

    # Fresh build over the SAME frozen quantizers: copy the side tables,
    # then one append-encode pass over exactly the surviving corpus.
    for suffix in (".centroids", ".codebooks"):
        shutil.copytree(idx_inc + suffix, idx_fresh + suffix)
    survivors = emb.filter(~F.col("vec_id").isin(forget_ids))
    t0 = time.time()
    S.ivfpq_index_append(spark, idx_fresh, survivors, dim=64)
    t_fresh = time.time() - t0
    print(f"fresh one-pass encode {t_fresh:.1f}s", flush=True)

    cols = ["vec_id", "cell", "codes"]
    d_inc = {
        (r.bucket, r.n, r.s)
        for r in table_digest(
            spark.read.parquet(idx_inc).select(*cols)
        ).collect()
    }
    d_fresh = {
        (r.bucket, r.n, r.s)
        for r in table_digest(
            spark.read.parquet(idx_fresh).select(*cols)
        ).collect()
    }
    codes_ok = d_inc == d_fresh
    print(
        f"{'ok' if codes_ok else 'FAIL'}  codes digest parity "
        f"(inc buckets={len(d_inc)}, fresh={len(d_fresh)})",
        flush=True,
    )

    probes = emb.filter(F.col("vec_id") < 100)
    corpus = survivors
    r_inc = S.ivfpq_recall(
        spark, idx_inc, probes, corpus, k=args.k, dim=64
    )
    r_fresh = S.ivfpq_recall(
        spark, idx_fresh, probes, corpus, k=args.k, dim=64
    )
    recall_ok = abs(r_inc - r_fresh) < 1e-12
    print(
        f"{'ok' if recall_ok else 'FAIL'}  recall@{args.k} parity: "
        f"incremental={r_inc:.4f} fresh={r_fresh:.4f}",
        flush=True,
    )
    return 0 if codes_ok and recall_ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
