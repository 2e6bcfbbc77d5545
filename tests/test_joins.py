"""Custom join operator tests: as-of, binned range join, salted join."""

from pyspark.sql import functions as F

from healthcare_etl_pipeline_spark.operators import joins as J


def _frames(spark):
    trades = spark.createDataFrame(
        [(1, 10, "t1"), (1, 20, "t2"), (2, 15, "t3")],
        ["key", "t", "trade"],
    )
    quotes = spark.createDataFrame(
        [(1, 5, 100.0), (1, 10, 101.0), (1, 18, 102.0), (2, 30, 200.0)],
        ["key", "qt", "px"],
    )
    return trades, quotes


def test_asof_join_inclusive(spark):
    trades, quotes = _frames(spark)
    out = J.asof_join(
        trades,
        quotes.select("key", "qt", "px"),
        key="key",
        left_time="t",
        right_time="qt",
        payload_cols=["px"],
    )
    got = {r.trade: r.px for r in out.collect()}
    # t1@10: quote@10 visible (inclusive); t2@20: quote@18; t3@15: no quote yet
    assert got == {"t1": 101.0, "t2": 102.0, "t3": None}


def test_asof_join_strict(spark):
    trades, quotes = _frames(spark)
    out = J.asof_join(
        trades,
        quotes.select("key", "qt", "px"),
        key="key",
        left_time="t",
        right_time="qt",
        payload_cols=["px"],
        strict=True,
    )
    got = {r.trade: r.px for r in out.collect()}
    # strict: quote@10 NOT visible to trade@10 → falls back to quote@5
    assert got == {"t1": 100.0, "t2": 102.0, "t3": None}


def test_asof_join_keeps_all_left_rows(spark):
    trades, quotes = _frames(spark)
    out = J.asof_join(
        trades,
        quotes.select("key", "qt", "px"),
        key="key",
        left_time="t",
        right_time="qt",
        payload_cols=["px"],
    )
    assert out.count() == trades.count()


def test_asof_join_null_payload_from_matched_row(spark):
    """The matched right row's NULLs must come through as NULLs — not be
    back-filled per-column from an OLDER right row (which would mix columns
    of different right rows and diverge from ASOF semantics)."""
    trades = spark.createDataFrame([(1, 20, "t1")], ["key", "t", "trade"])
    quotes = spark.createDataFrame(
        [(1, 5, 100.0, 9.0), (1, 18, 102.0, None)],
        ["key", "qt", "px", "sz"],
    )
    out = J.asof_join(
        trades,
        quotes.select("key", "qt", "px", "sz"),
        key="key",
        left_time="t",
        right_time="qt",
        payload_cols=["px", "sz"],
    ).collect()[0]
    # matched row is quote@18: px=102.0, sz=NULL — sz must NOT be 9.0
    assert out.px == 102.0
    assert out.sz is None


def test_salted_join_rejects_outer_how(spark):
    import pytest

    big = spark.createDataFrame([(0, 1)], ["k", "v"])
    small = spark.createDataFrame([(0, "a")], ["k", "name"])
    with pytest.raises(ValueError, match="salted_join supports"):
        J.salted_join(big, small, key="k", how="full_outer")


def test_range_join_binned_matches_naive(spark):
    points = spark.createDataFrame(
        [(i, float(i)) for i in range(50)], ["pid", "x"]
    )
    intervals = spark.createDataFrame(
        [(100, 3.0, 9.0), (200, 8.5, 20.0), (300, 45.0, 60.0)],
        ["iid", "lo", "hi"],
    )
    binned = J.range_join_binned(
        points, intervals, left_point="x", right_lo="lo", right_hi="hi", bin_width=5.0
    )
    naive = points.crossJoin(intervals).filter(
        (F.col("x") >= F.col("lo")) & (F.col("x") <= F.col("hi"))
    )
    assert {(r.pid, r.iid) for r in binned.collect()} == {
        (r.pid, r.iid) for r in naive.collect()
    }


def test_salted_join_matches_plain(spark):
    big = spark.createDataFrame(
        [(i % 3, i) for i in range(100)], ["k", "v"]
    )
    small = spark.createDataFrame([(0, "a"), (1, "b"), (2, "c")], ["k", "name"])
    salted = J.salted_join(big, small, key="k", salt_buckets=4)
    plain = big.join(small, "k")
    assert salted.count() == plain.count() == 100
    assert {(r.k, r.v, r.name) for r in salted.collect()} == {
        (r.k, r.v, r.name) for r in plain.collect()
    }


def test_salted_join_spreads_skewed_key(spark):
    """Skew evidence: one key carrying ~95% of a 2M-row big side. With AQE
    and broadcast off (forcing a shuffled join), the plain join lands the
    hot key on ONE reducer; salting spreads it across salt_buckets. Asserts
    identical results, a strictly better max-partition spread, and that the
    salted run isn't slower."""
    import time

    from healthcare_etl_pipeline_spark.operators.joins import salted_join

    confs = {
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        n = 2_000_000
        big = spark.range(n).select(
            # 95% of rows on key 0, the rest spread over 31 keys
            F.when(F.col("id") % 20 != 0, F.lit(0))
            .otherwise((F.col("id") % 31) + 1)
            .alias("k"),
            F.col("id").alias("v"),
        )
        small = spark.createDataFrame(
            [(i, f"name_{i}") for i in range(32)], ["k", "name"]
        )

        t0 = time.perf_counter()
        plain = big.join(small, "k")
        plain_cnt = plain.count()
        t_plain = time.perf_counter() - t0

        t0 = time.perf_counter()
        salted = salted_join(big, small, key="k", salt_buckets=8)
        salted_cnt = salted.count()
        t_salted = time.perf_counter() - t0

        assert plain_cnt == salted_cnt == n
        # aggregate equivalence (full row-set compare is the same join again;
        # per-key counts + value sums pin the semantics)
        agg = lambda df: sorted(
            map(
                tuple,
                df.groupBy("k", "name").agg(
                    F.count(F.lit(1)).alias("c"), F.sum("v").alias("s")
                ).collect(),
            )
        )
        assert agg(plain) == agg(salted)

        # mechanism: the hot key's rows no longer serialize on one reducer
        # (ideal spread is salt_buckets×; salt→reducer hash collisions under
        # the small local shuffle.partitions make ~2-3× the robust bound)
        part_max = lambda df: (
            df.groupBy(F.spark_partition_id().alias("p"))
            .count()
            .agg(F.max("count"))
            .first()[0]
        )
        assert part_max(salted) < part_max(plain) / 2
        # and the wall-clock should not regress (hot partition serializes
        # the plain join; generous slack keeps the assertion robust)
        assert t_salted < t_plain * 1.5
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_asof_join_random_sweep_vs_naive(spark):
    """Union-merge as-of join == naive join+rank on randomized inputs
    (seeded): keys with no matches, ties at identical timestamps, multiple
    rights between lefts, empty right side for some keys."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    rng = random.Random(7)
    for trial in range(6):
        n_keys = rng.randint(1, 4)
        lefts = [
            (k, rng.randint(0, 30), f"L{trial}_{i}")
            for i, k in enumerate(rng.choices(range(n_keys), k=rng.randint(1, 12)))
        ]
        rights = [
            (k, rng.randint(0, 30), float(i))
            for i, k in enumerate(rng.choices(range(n_keys + 1), k=rng.randint(0, 12)))
        ]
        left = spark.createDataFrame(lefts, ["key", "t", "tag"])
        if rights:
            right = spark.createDataFrame(rights, ["key", "rt", "px"])
        else:
            right = spark.createDataFrame([], "key int, rt int, px double")
        # naive: all (left, earlier-right) pairs, keep latest right (ties →
        # max px, mirroring deterministic max-tie-break after dedup)
        right_dedup = (
            right.groupBy("key", "rt").agg(F.max("px").alias("px"))
        )
        got = {
            (r.tag, r.px)
            for r in J.asof_join(
                left,
                right_dedup,
                key="key",
                left_time="t",
                right_time="rt",
                payload_cols=["px"],
            ).collect()
        }
        w = Window.partitionBy("tag").orderBy(F.desc("rt"))
        naive = (
            left.join(
                right_dedup,
                (left.key == right_dedup.key) & (right_dedup.rt <= left.t),
                "left",
            )
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
        )
        want = {(r.tag, r.px) for r in naive.collect()}
        assert got == want, (trial, sorted(got), sorted(want))


def test_fuzzy_blocked_pairs_respects_blocks_and_threshold(spark):
    from healthcare_etl_pipeline_spark.operators.joins import (
        fuzzy_blocked_pairs,
    )

    df = spark.createDataFrame(
        [("red widget",), ("Red  widget",), ("ted widget",),
         ("red gadget",), ("red widget",)],
        "p_name string",
    )
    out = fuzzy_blocked_pairs(
        df,
        "p_name",
        block=F.element_at(F.split(F.col("name"), " "), -1),
        max_dist=3,
    ).collect()
    pairs = {(r.name_a, r.name_b): (r.dist, r.n_a, r.n_b) for r in out}
    # same block ('widget'), dist 1 — matched; counts aggregate dup rows
    assert pairs[("red widget", "ted widget")][0] == 1
    assert pairs[("red widget", "ted widget")][1] == 2  # 'red widget' twice
    # 'red gadget' blocks under 'gadget' — never compared despite dist 2
    assert not any("gadget" in a or "gadget" in b for a, b in pairs)


def test_interval_overlap_join_exactly_once_across_bins(spark):
    from healthcare_etl_pipeline_spark.operators.joins import interval_overlap_join

    # intervals deliberately spanning multiple width-10 bins; (1,2) overlap
    # across a bin boundary, (1,3) overlap inside one bin, (2,4) disjoint
    left = spark.createDataFrame(
        [(1, 5.0, 25.0), (2, 22.0, 40.0)], ["lid", "llo", "lhi"]
    )
    right = spark.createDataFrame(
        [(3, 8.0, 12.0), (4, 50.0, 60.0), (5, 24.0, 26.0)], ["rid", "rlo", "rhi"]
    )
    out = interval_overlap_join(
        left, right,
        left_lo="llo", left_hi="lhi", right_lo="rlo", right_hi="rhi",
        bin_width=10,
    ).select("lid", "rid").collect()
    pairs = sorted((r.lid, r.rid) for r in out)
    # each overlapping pair appears EXACTLY once despite sharing 2+ bins
    assert pairs == [(1, 3), (1, 5), (2, 5)]


def test_skew_join_gates_on_aqe(spark):
    """skew_join's gate (measured, BENCH_NOTES round 8): salt when the
    hot share clears the threshold (probed or caller-known — salting won
    2.2x on a 40%-hot key at sf100), plain when the key is measured
    uniform (salting costs ~1.5x there), plain under AQE's safety net
    when nothing is known, salted when even that net is off; force
    overrides everything."""
    big = spark.createDataFrame([(i % 3, i) for i in range(60)], ["k", "v"])
    small = spark.createDataFrame([(0, "a"), (1, "b"), (2, "c")], ["k", "nm"])

    def salt_stages(df):
        return "__salt" in df._jdf.queryExecution().analyzed().toString()

    # session default: AQE + skewJoin on -> plain join, no salt column
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"
    gated = J.skew_join(big, small, key="k")
    assert not salt_stages(gated)

    # AQE off -> salted
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        fallback = J.skew_join(big, small, key="k")
        assert salt_stages(fallback)
        # force="plain" overrides the fallback
        assert not salt_stages(J.skew_join(big, small, key="k", force="plain"))
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)

    # force="salt" overrides the AQE gate
    forced = J.skew_join(big, small, key="k", force="salt")
    assert salt_stages(forced)

    # hot_share drives the decision past the AQE default: a measured hot
    # key salts even with AQE on; a measured-uniform key stays plain even
    # with AQE off
    assert salt_stages(J.skew_join(big, small, key="k", hot_share=0.4))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        assert not salt_stages(
            J.skew_join(big, small, key="k", hot_share=0.001)
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)

    # probe=True estimates the hot share from a sample: a 1-key big side
    # must salt, and the probe must not error on tiny samples
    hot = spark.createDataFrame([(7, i) for i in range(4000)], ["k", "v"])
    probed = J.skew_join(
        hot, small, key="k", probe=True, probe_fraction=0.2
    )
    assert salt_stages(probed)

    # all variants value-identical to the plain join
    want = {(r.k, r.v, r.nm) for r in big.join(small, "k").collect()}
    for df in (gated, forced):
        assert {(r.k, r.v, r.nm) for r in df.collect()} == want

    import pytest as _pytest

    with _pytest.raises(ValueError):
        J.skew_join(big, small, key="k", force="bogus")


def test_probe_hot_share_memoized(spark, monkeypatch):
    """probe_hot_share memoizes per (semantic plan, key, fraction): the
    second gate decision on the same logical input must not re-scan."""
    J._PROBE_MEMO.clear()
    hot = spark.createDataFrame([(7, i) for i in range(4000)], ["k", "v"])

    calls = {"n": 0}
    orig_sample = type(hot).sample

    def counting_sample(self, *a, **kw):
        calls["n"] += 1
        return orig_sample(self, *a, **kw)

    monkeypatch.setattr(type(hot), "sample", counting_sample)
    s1 = J.probe_hot_share(hot, "k", probe_fraction=0.2)
    s2 = J.probe_hot_share(hot, "k", probe_fraction=0.2)
    assert s1 == s2 and s1 > 0.9
    assert calls["n"] == 1, "second probe must hit the memo, not re-scan"

    # an equivalent-but-distinct DataFrame object of the same plan also
    # hits the memo (semanticHash identity, not Python object identity)
    twin = spark.createDataFrame([(7, i) for i in range(4000)], ["k", "v"])
    if twin.semanticHash() == hot.semanticHash():
        J.probe_hot_share(twin, "k", probe_fraction=0.2)
        assert calls["n"] == 1
    # different fraction -> distinct memo entry -> new scan
    J.probe_hot_share(hot, "k", probe_fraction=0.5)
    assert calls["n"] == 2
    # memo=False bypasses
    J.probe_hot_share(hot, "k", probe_fraction=0.2, memo=False)
    assert calls["n"] == 3
    J._PROBE_MEMO.clear()


def test_skew_join_hot_customer_takes_salt_path(spark):
    """The registry hot-key query's gate decision must be SALT (probe
    sees the ~40% synthetic hot share) and values must equal the plain
    join — the gate never changes results."""
    from healthcare_etl_pipeline_spark.queries.join_ops import (
        skew_join_hot_customer,
    )

    J._PROBE_MEMO.clear()
    out = skew_join_hot_customer(spark, "/root/testdata/sf0.01")
    assert "__salt" in out._jdf.queryExecution().analyzed().toString()
    rows = {(r.c_mktsegment, r.n_orders, r.total_price) for r in out.collect()}
    assert sum(r[1] for r in rows) > 0
    J._PROBE_MEMO.clear()


def _pit_frames(spark):
    labels = spark.createDataFrame(
        [(1, 100, "L1"), (1, 200, "L2"), (2, 50, "L3"), (3, 10, "L4")],
        ["key", "t", "label"],
    )
    f_a = spark.createDataFrame(
        [(1, 100, 1.0), (1, 150, 2.0), (2, 49, 3.0)], ["key", "ft", "a_val"]
    ).select("key", "ft", "a_val")
    f_b = spark.createDataFrame(
        [(1, 90, "x"), (2, 50, "y")], ["key", "ft", "b_val"]
    )
    return labels, f_a, f_b


def test_pit_join_multi_feature_latest_at_or_before(spark):
    labels, f_a, f_b = _pit_frames(spark)
    out = J.pit_join(
        labels,
        [("a", f_a, "ft", ["a_val"]), ("b", f_b, "ft", ["b_val"])],
        key="key",
        label_time="t",
    )
    got = {r.label: (r.a_val, r.b_val) for r in out.collect()}
    assert got == {
        "L1": (1.0, "x"),   # a@100 inclusive tie visible; b@90
        "L2": (2.0, "x"),   # latest a@150; b unchanged
        "L3": (3.0, "y"),   # a@49; b@50 inclusive
        "L4": (None, None), # key 3 has no feature rows at all
    }
    assert out.count() == labels.count()  # left-outer: every label survives


def test_pit_join_horizon_nulls_stale_matches(spark):
    labels, f_a, f_b = _pit_frames(spark)
    out = J.pit_join(
        labels,
        [("a", f_a, "ft", ["a_val"]), ("b", f_b, "ft", ["b_val"])],
        key="key",
        label_time="t",
        horizon=F.lit(10),
    )
    got = {r.label: (r.a_val, r.b_val) for r in out.collect()}
    # L1@100: a@100 fresh (age 0), b@90 fresh (age 10, inclusive edge)
    # L2@200: a@150 age 50 -> stale; b@90 age 110 -> stale
    # L3@50: a@49 age 1 fresh, b@50 age 0 fresh
    assert got == {
        "L1": (1.0, "x"),
        "L2": (None, None),
        "L3": (3.0, "y"),
        "L4": (None, None),
    }


def test_pit_join_single_shuffle_for_all_features(spark):
    labels, f_a, f_b = _pit_frames(spark)
    out = J.pit_join(
        labels,
        [("a", f_a, "ft", ["a_val"]), ("b", f_b, "ft", ["b_val"])],
        key="key",
        label_time="t",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the whole K-feature join hangs off ONE hashpartitioning exchange on
    # the key — the scale contract vs K chained as-of joins
    assert plan.count("hashpartitioning(__key") == 1, plan
