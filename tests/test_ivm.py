"""Incremental view maintenance (operators/ivm.py, r10): maintained
aggregate views over the CDC feed equal a from-scratch recompute at
every version, for exact integer measures, NULL keys/values, group
moves, and key death."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cincinnati_police_calls_for_service_etl_using_python_dask_spark.operators import (
    ivm,
)
from cincinnati_police_calls_for_service_etl_using_python_dask_spark.sources.txtable import (
    TxTable,
)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "k long, g string, v long")


def _recompute(snapshot_df):
    return snapshot_df.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("v").alias("sum_v"),
        F.round(F.sum("v") / F.count("v"), 4).alias("avg_v"),
    )


def _rows(df):
    return sorted(
        (tuple(r) for r in df.collect()),
        key=lambda t: tuple((x is not None, x) for x in t),
    )


def test_maintained_view_equals_recompute_at_every_version(spark, tmp_path):
    t = TxTable.create(
        spark,
        str(tmp_path / "ivm1"),
        _mk(
            spark,
            [(1, "a", 10), (2, "a", 20), (3, "b", 5), (4, None, 7),
             (5, "b", None)],
        ).coalesce(1),
    )
    state = ivm.state_of(t.read(version=0), ["g"], sums=["v"])
    # v1: append (new group c, more a)
    t.append(_mk(spark, [(6, "c", 100), (7, "a", 30)]).coalesce(1))
    # v2: update moves a row BETWEEN groups and changes its value
    t.update(F.col("k") == 3, {"g": F.lit("a"), "v": F.lit(50)})
    # v3: delete kills group c entirely (count -> 0, key leaves state)
    t.delete(F.col("g") == "c")
    # v4: update touching only non-view columns cancels to zero delta
    t.update(F.col("k") == 1, {"k": F.col("k") + 100})
    for v in range(1, t.latest_version() + 1):
        feed = t.change_feed("k", v - 1, v)
        state = ivm.merge_states(
            state, ivm.delta_state(feed, ["g"], sums=["v"]), ["g"]
        )
        view = ivm.finalize_state(
            state, ["g"], sums=["v"], avgs=["v"]
        )
        want = _recompute(t.read(version=v))
        assert _rows(view) == _rows(want), f"divergence at version {v}"
    # group c is GONE from the state (not a zero row)
    assert state.filter(F.col("g") == "c").count() == 0


def test_single_fold_over_whole_history(spark, tmp_path):
    t = TxTable.create(
        spark,
        str(tmp_path / "ivm2"),
        _mk(spark, [(i, "g" + str(i % 3), i * 10) for i in range(30)]).coalesce(1),
    )
    base = ivm.state_of(t.read(version=0), ["g"], sums=["v"])
    t.delete(F.col("k") % 5 == 0)
    t.update(F.col("k") % 7 == 1, {"v": F.col("v") + 1})
    t.append(_mk(spark, [(100, "g0", 999), (101, "g9", 1)]).coalesce(1))
    delta = ivm.delta_state(
        t.change_feed("k", 0, t.latest_version()), ["g"], sums=["v"]
    )
    view = ivm.finalize_state(
        ivm.merge_states(base, delta, ["g"]), ["g"], sums=["v"], avgs=["v"]
    )
    assert _rows(view) == _rows(_recompute(t.read()))


def test_distinct_count_maintenance(spark, tmp_path):
    t = TxTable.create(
        spark,
        str(tmp_path / "ivm3"),
        _mk(
            spark,
            [(1, "a", 1), (2, "a", 1), (3, "a", 2), (4, "b", None),
             (5, "b", 3)],
        ).coalesce(1),
    )
    vstate = ivm.distinct_state_of(t.read(version=0), ["g"], "v")
    # delete one of the duplicate v=1 rows (distinct count unchanged),
    # then the second (drops), then add a fresh value to b
    t.delete(F.col("k") == 1)
    t.delete(F.col("k") == 2)
    t.append(_mk(spark, [(6, "b", 9)]).coalesce(1))
    vstate = ivm.merge_states(
        vstate,
        ivm.distinct_delta_state(
            t.change_feed("k", 0, t.latest_version()), ["g"], "v"
        ),
        ["g", "v"],
    )
    got = {
        r["g"]: r["nunique_v"]
        for r in ivm.finalize_distinct(vstate, ["g"], "v").collect()
    }
    want = {
        r["g"]: r["n"]
        for r in t.read()
        .groupBy("g")
        .agg(F.countDistinct("v").alias("n"))
        .collect()
    }
    assert got == want == {"a": 1, "b": 2}


def test_ivm_validation_and_unknown_change_type(spark):
    df = _mk(spark, [(1, "a", 1)])
    state = ivm.state_of(df, ["g"], sums=["v"])
    with pytest.raises(ValueError, match="not maintained"):
        ivm.finalize_state(state, ["g"], sums=[], avgs=["v"])
    with pytest.raises(ValueError, match="schemas differ"):
        ivm.merge_states(state, ivm.state_of(df, ["g"]), ["g"])
    bad = df.withColumn("_change_type", F.lit("bogus"))
    with pytest.raises(Exception, match="unknown _change_type"):
        ivm.delta_state(bad, ["g"], sums=["v"]).collect()


def test_negative_multiplicity_fails_loudly(spark):
    """r11 (ADVICE r10): a value-level state carrying a NEGATIVE
    multiplicity (inconsistent feed / double-folded delta) must error
    at finalize, never count the dead value as live."""
    neg = spark.createDataFrame(
        [("a", 1, -1), ("a", 2, 2)], "g string, v long, __w long"
    )
    with pytest.raises(Exception, match="negative multiplicity"):
        ivm.finalize_distinct(neg, ["g"], "v").collect()
    with pytest.raises(Exception, match="negative multiplicity"):
        ivm.finalize_minmax(neg, ["g"], "v").collect()
    ok = spark.createDataFrame(
        [("a", 1, 1), ("a", 2, 2)], "g string, v long, __w long"
    )
    assert ivm.finalize_distinct(ok, ["g"], "v").collect()[0][1] == 2
    r = ivm.finalize_minmax(ok, ["g"], "v").collect()[0]
    assert (r["min_v"], r["max_v"]) == (1, 2)


def test_refresh_view_requires_feed_key(spark, tmp_path):
    """r11 (ADVICE r10): an empty feed_key must fail at wiring time
    with a pointed error, not degenerate into a keyless diff on the
    second refresh."""
    t = TxTable.create(
        spark, str(tmp_path / "src_fk"), _mk(spark, [(1, "a", 1)])
    )
    with pytest.raises(ValueError, match="feed_key"):
        ivm.refresh_view(
            spark, t, str(tmp_path / "view_fk"), ["g"], sums=["v"]
        )


def test_streaming_cdc_feeds_maintained_view(spark, tmp_path):
    """The streaming CDC source drives the SAME fold: each micro-batch
    of change rows maintains the state via foreachBatch — the
    continuously-maintained materialized view shape. State after the
    drain equals a from-scratch recompute."""
    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.sources.txstream import (
        TxTableStreamSource,
    )

    spark.dataSource.register(TxTableStreamSource)
    path = str(tmp_path / "ivm_stream")
    t = TxTable.create(
        spark,
        path,
        _mk(spark, [(i, "g" + str(i % 2), i) for i in range(12)]).coalesce(1),
    )
    holder = {"state": ivm.state_of(t.read(version=0), ["g"], sums=["v"])}
    t.delete(F.col("k") < 3)
    t.update(F.col("k") == 5, {"v": F.lit(500)})
    t.append(_mk(spark, [(50, "g0", 7)]).coalesce(1))

    def fold(batch_df, _epoch):
        # batches arrive per commit range; the fold is associative so
        # any batching maintains the same state
        delta = ivm.delta_state(batch_df, ["g"], sums=["v"])
        holder["state"] = ivm.merge_states(
            holder["state"], delta, ["g"]
        ).localCheckpoint(eager=True)

    q = (
        spark.readStream.format("txtable_stream")
        .option("readChangeFeed", "true")
        .option("key", "k")
        .option("startingVersion", "1")
        .load(path)
        .writeStream.trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ivm_ck"))
        .foreachBatch(fold)
        .start()
    )
    q.awaitTermination()
    got = ivm.finalize_state(holder["state"], ["g"], sums=["v"], avgs=["v"])
    assert _rows(got) == _rows(_recompute(t.read()))


def test_minmax_maintenance_via_value_state(spark, tmp_path):
    """Deleting the current max uncovers the runner-up: the value-level
    state IS the auxiliary store MIN/MAX need under deletes."""
    t = TxTable.create(
        spark,
        str(tmp_path / "ivm4"),
        _mk(
            spark,
            [(1, "a", 9), (2, "a", 9), (3, "a", 4), (4, "a", 1),
             (5, "b", 7)],
        ).coalesce(1),
    )
    vstate = ivm.distinct_state_of(t.read(version=0), ["g"], "v")
    t.delete(F.col("k") == 1)   # one of two v=9 rows: max stays 9
    t.delete(F.col("k") == 2)   # last v=9 row: max falls to 4
    t.delete(F.col("k") == 4)   # min rises to 4
    vstate = ivm.merge_states(
        vstate,
        ivm.distinct_delta_state(
            t.change_feed("k", 0, t.latest_version()), ["g"], "v"
        ),
        ["g", "v"],
    )
    got = {
        r["g"]: (r["min_v"], r["max_v"])
        for r in ivm.finalize_minmax(vstate, ["g"], "v").collect()
    }
    assert got == {"a": (4, 4), "b": (7, 7)}
    want = {
        r["g"]: (r["mn"], r["mx"])
        for r in t.read()
        .groupBy("g")
        .agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
        .collect()
    }
    assert got == want
    with pytest.raises(ValueError, match="at least one"):
        ivm.finalize_minmax(vstate, ["g"], "v", want_min=False, want_max=False)


def test_refresh_view_lifecycle_exactly_once(spark, tmp_path):
    """The stored-view loop: init = one full aggregate stamped with
    the source version; each refresh folds only the feed since the
    watermark, lands atomically, and replays no-op."""
    src = TxTable.create(
        spark,
        str(tmp_path / "rv_src"),
        _mk(spark, [(i, "g" + str(i % 3), i * 10) for i in range(24)]).coalesce(1),
    )
    vpath = str(tmp_path / "rv_view")

    def check():
        got = ivm.finalize_state(
            ivm.merge_states(  # no-op merge: just read the stored state
                TxTable(spark, vpath).read(),
                TxTable(spark, vpath).read().limit(0),
                ["g"],
            ),
            ["g"], sums=["v"], avgs=["v"],
        )
        assert _rows(got) == _rows(_recompute(src.read()))

    # init: full aggregate at the current source version
    v0 = ivm.refresh_view(spark, src, vpath, ["g"], sums=["v"], feed_key="k")
    assert v0 == src.latest_version()
    check()
    # already current -> no-op
    assert ivm.refresh_view(spark, src, vpath, ["g"], sums=["v"], feed_key="k") is None
    # DML, then an incremental refresh
    src.delete(F.col("k") % 4 == 0)
    src.update(F.col("k") == 5, {"v": F.lit(5000)})
    src.append(_mk(spark, [(900, "gX", 3)]).coalesce(1))
    v1 = ivm.refresh_view(spark, src, vpath, ["g"], sums=["v"], feed_key="k")
    assert v1 == src.latest_version() > v0
    check()
    # crash-after-commit replay: a stale-epoch overwrite is a NO-OP
    view = TxTable(spark, vpath)
    before = sorted(map(tuple, view.read().collect()))
    bogus = view.read().limit(1)
    v_now = view.overwrite(bogus, txn=(f"ivm:{vpath}", v1))
    assert v_now == view.latest_version()
    assert sorted(map(tuple, view.read().collect())) == before
    # a table without the watermark is refused
    other = str(tmp_path / "rv_other")
    TxTable.create(spark, other, _mk(spark, [(1, "a", 1)]).coalesce(1))
    with pytest.raises(ValueError, match="watermark"):
        ivm.refresh_view(spark, src, other, ["g"], sums=["v"], feed_key="k")


def test_refresh_view_measure_fn_cents(spark, tmp_path):
    """measure_fn derives the maintained measure identically on the
    snapshot (init) and feed (refresh) paths — integer cents here."""
    rows = [(1, "a", 101), (2, "a", 250), (3, "b", 999)]
    src = TxTable.create(
        spark, str(tmp_path / "rvc_src"), _mk(spark, rows).coalesce(1)
    )
    vpath = str(tmp_path / "rvc_view")

    def cents(df):
        return df.withColumn("vc", (F.col("v") * 100).cast("long"))

    ivm.refresh_view(
        spark, src, vpath, ["g"], sums=["vc"], feed_key="k", measure_fn=cents
    )
    src.append(_mk(spark, [(4, "b", 1)]).coalesce(1))
    src.delete(F.col("k") == 1)
    ivm.refresh_view(
        spark, src, vpath, ["g"], sums=["vc"], feed_key="k", measure_fn=cents
    )
    got = {
        r["g"]: r["sum_vc"]
        for r in ivm.finalize_state(
            TxTable(spark, vpath).read(), ["g"], sums=["vc"]
        ).collect()
    }
    want = {
        r["g"]: r["s"]
        for r in cents(src.read()).groupBy("g").agg(F.sum("vc").alias("s")).collect()
    }
    assert got == want == {"a": 25000, "b": 100000}


# ---------------------------------------------------------------------------
# r11: IVM over JOINS — Δ(A⋈B) = ΔA⋈B_new ∪ A_old⋈ΔB, folded with
# multiplied weights; refresh_join_view stamps BOTH source watermarks
# in one atomic commit.
# ---------------------------------------------------------------------------


def _mk_dim(spark, rows):
    return spark.createDataFrame(rows, "j long, g string")


def _mk_fact(spark, rows):
    return spark.createDataFrame(rows, "k long, j long, v long")


def _join_recompute(a, b):
    return (
        a.join(b, "j")
        .groupBy("g")
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"), F.sum("v").alias("sum_v"))
    )


def test_join_delta_matches_recompute_at_every_version(spark, tmp_path):
    """Fold Δ(A⋈B) after DML on BOTH sides — fact appends/deletes,
    dim group-moves (update), dangling fact rows (no partner), a dim
    delete that kills every matching join row — and the maintained
    state equals the from-scratch join aggregate at every version."""
    dim = TxTable.create(
        spark, str(tmp_path / "jd_dim"),
        _mk_dim(spark, [(1, "a"), (2, "b"), (3, "c")]).coalesce(1),
    )
    fact = TxTable.create(
        spark, str(tmp_path / "jd_fact"),
        _mk_fact(
            spark,
            [(10, 1, 100), (11, 1, 50), (12, 2, 7), (13, 9, 999)],  # 13 dangles
        ).coalesce(1),
    )
    keys, sums = ["g"], ["v"]
    state = ivm.state_of(
        fact.read(version=0).join(dim.read(version=0), "j"), keys, sums
    )
    wm_f, wm_d = 0, 0

    def advance():
        nonlocal state, wm_f, wm_d
        vf, vd = fact.latest_version(), dim.latest_version()
        df_ = (
            fact.change_feed("k", wm_f, vf)
            if vf > wm_f
            else fact.read(version=vf).limit(0).withColumn(
                "_change_type", F.lit("insert"))
        )
        dd = (
            dim.change_feed("j", wm_d, vd)
            if vd > wm_d
            else dim.read(version=vd).limit(0).withColumn(
                "_change_type", F.lit("insert"))
        )
        dj = ivm.join_delta(fact.read(version=wm_f), df_, dim.read(version=vd), dd, "j")
        state = ivm.merge_states(
            state, ivm.delta_state(dj, keys, sums, weight_col="__ivm_w"), keys
        )
        wm_f, wm_d = vf, vd
        got = _rows(ivm.finalize_state(state, keys, sums=sums))
        want = _rows(
            _join_recompute(fact.read(), dim.read()).select(
                "g", "n_rows", F.col("sum_v").alias("sum_v"))
        )
        # align names: finalize_state emits n_rows/sum_v
        assert got == want, (got, want)

    # fact-side DML only
    fact.append(_mk_fact(spark, [(14, 2, 3), (15, 3, 11)]).coalesce(1))
    fact.delete(F.col("k") == 11)
    advance()
    # dim-side DML only: group move b->bb, delete c (kills (15,3,11))
    dim.update(F.col("j") == 2, {"g": F.lit("bb")})
    dim.delete(F.col("j") == 3)
    advance()
    # BOTH sides change between refreshes (exercises the cross term:
    # a new fact row joining a dim row that changed in the same window)
    fact.append(_mk_fact(spark, [(16, 4, 21), (17, 1, 2)]).coalesce(1))
    dim.append(_mk_dim(spark, [(4, "d")]).coalesce(1))
    dim.update(F.col("j") == 1, {"g": F.lit("aa")})
    fact.delete(F.col("k") == 12)
    advance()
    # idle refresh: zero-delta fold is a no-op
    advance()


def test_refresh_join_view_exactly_once_two_watermarks(spark, tmp_path):
    dim = TxTable.create(
        spark, str(tmp_path / "rjv_dim"),
        _mk_dim(spark, [(1, "a"), (2, "b")]).coalesce(1),
    )
    fact = TxTable.create(
        spark, str(tmp_path / "rjv_fact"),
        _mk_fact(spark, [(10, 1, 100), (11, 2, 7)]).coalesce(1),
    )
    vpath = str(tmp_path / "rjv_view")
    kw = dict(
        on="j", keys=["g"], sums=["v"], feed_key_a="k", feed_key_b="j"
    )

    def served():
        return _rows(
            ivm.finalize_state(TxTable(spark, vpath).read(), ["g"], sums=["v"])
        )

    def want():
        return _rows(_join_recompute(fact.read(), dim.read()))

    # init stamps BOTH watermarks on commit 0
    v = ivm.refresh_join_view(spark, fact, dim, vpath, **kw)
    assert v == (fact.latest_version(), dim.latest_version())
    assert served() == want()
    snap = TxTable(spark, vpath).snapshot()
    assert snap.txns[f"ivm-join:{vpath}:a"] == fact.latest_version()
    assert snap.txns[f"ivm-join:{vpath}:b"] == dim.latest_version()
    # current -> None
    assert ivm.refresh_join_view(spark, fact, dim, vpath, **kw) is None
    # one source advances
    fact.append(_mk_fact(spark, [(12, 1, 9)]).coalesce(1))
    assert ivm.refresh_join_view(spark, fact, dim, vpath, **kw) is not None
    assert served() == want()
    # both advance in one window, incl. a dim group move
    dim.update(F.col("j") == 2, {"g": F.lit("bb")})
    fact.delete(F.col("k") == 10)
    ivm.refresh_join_view(spark, fact, dim, vpath, **kw)
    assert served() == want()
    # crash-after-commit replay: multi-txn overwrite with stale epochs
    # is a NO-OP (version does not advance, state unchanged)
    view = TxTable(spark, vpath)
    v_before, rows_before = view.latest_version(), served()
    view.overwrite(
        view.read().limit(0),
        txn=[
            (f"ivm-join:{vpath}:a", fact.latest_version()),
            (f"ivm-join:{vpath}:b", dim.latest_version()),
        ],
    )
    assert view.latest_version() == v_before and served() == rows_before
    # validation: empty feed keys and foreign tables are refused
    with pytest.raises(ValueError, match="feed_key_a"):
        ivm.refresh_join_view(
            spark, fact, dim, vpath, on="j", keys=["g"], sums=["v"],
            feed_key_b="j",
        )
    other = str(tmp_path / "rjv_other")
    TxTable.create(spark, other, _mk_dim(spark, [(1, "a")]).coalesce(1))
    with pytest.raises(ValueError, match="watermarks"):
        ivm.refresh_join_view(spark, fact, dim, other, **kw)


def test_refresh_view_expired_watermark_raises_retention_error(
    spark, tmp_path
):
    """r12 (VERDICT r11 #5): the fold time-travels to the view's
    watermark version, so when log retention (expire_log) drops it the
    refresh must fail with the pointed retention error — the same
    contract the streaming reader gives — not a bare snapshot
    reconstruction error that reads like corruption."""
    t = TxTable.create(
        spark, str(tmp_path / "ret_src"), _mk(spark, [(1, "a", 10)]).coalesce(1)
    )
    vpath = str(tmp_path / "ret_view")
    ivm.refresh_view(spark, t, vpath, ["g"], sums=["v"], feed_key="k")
    # drive the source past a checkpoint (every 10 commits) so
    # expire_log can cut ABOVE the view's watermark (version 0)
    for i in range(11):
        t.append(_mk(spark, [(100 + i, "b", i)]).coalesce(1))
    assert t.expire_log()  # versions below the v10 checkpoint are gone
    with pytest.raises(RuntimeError, match="log retention"):
        ivm.refresh_view(spark, t, vpath, ["g"], sums=["v"], feed_key="k")


def test_refresh_join_view_expired_watermark_raises_retention_error(
    spark, tmp_path
):
    """Same retention contract for the JOIN view, whose delta term
    A_old ⋈ ΔB reads source A at its OLD watermark version."""
    dim = TxTable.create(
        spark, str(tmp_path / "retj_dim"),
        _mk_dim(spark, [(1, "a")]).coalesce(1),
    )
    fact = TxTable.create(
        spark, str(tmp_path / "retj_fact"),
        _mk_fact(spark, [(10, 1, 100)]).coalesce(1),
    )
    vpath = str(tmp_path / "retj_view")
    ivm.refresh_join_view(
        spark, fact, dim, vpath, on="j", keys=["g"], sums=["v"],
        feed_key_a="k", feed_key_b="j",
    )
    for i in range(11):
        fact.append(_mk_fact(spark, [(100 + i, 1, i)]).coalesce(1))
    assert fact.expire_log()
    with pytest.raises(RuntimeError, match="log retention"):
        ivm.refresh_join_view(
            spark, fact, dim, vpath, on="j", keys=["g"], sums=["v"],
            feed_key_a="k", feed_key_b="j",
        )
