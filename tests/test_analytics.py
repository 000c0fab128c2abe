"""Funnel + retention golden tests (hand-derived)."""

from datetime import datetime

import pytest

from flexgraph_spark import analytics


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp"
    )


def test_funnel_golden(spark):
    d = datetime
    rows = [
        # user 1 completes the whole funnel in order
        (1, "view", d(2026, 1, 1, 10)),
        (1, "click", d(2026, 1, 1, 11)),
        (1, "buy", d(2026, 1, 1, 12)),
        # user 2 clicks BEFORE viewing -> stops after view
        (2, "click", d(2026, 1, 1, 9)),
        (2, "view", d(2026, 1, 1, 10)),
        # user 3 views + clicks, never buys
        (3, "view", d(2026, 1, 1, 8)),
        (3, "click", d(2026, 1, 1, 9)),
        # user 4 never views
        (4, "click", d(2026, 1, 1, 8)),
        (4, "buy", d(2026, 1, 1, 9)),
    ]
    out = {r.step_idx: (r.step, r.n_users)
           for r in analytics.funnel(_ev(spark, rows),
                                     ["view", "click", "buy"]).collect()}
    assert out == {0: ("view", 3), 1: ("click", 2), 2: ("buy", 1)}
    # strictly-after rule: a click at the exact view timestamp doesn't count
    tie = [(7, "view", d(2026, 1, 1, 10)), (7, "click", d(2026, 1, 1, 10))]
    out2 = {r.step_idx: r.n_users
            for r in analytics.funnel(_ev(spark, tie), ["view", "click"]).collect()}
    assert out2 == {0: 1, 1: 0}
    with pytest.raises(ValueError):
        analytics.funnel(_ev(spark, tie), [])


def test_retention_golden(spark):
    d = datetime
    rows = [
        # cohort Jan 1: users 1, 2; user 1 returns day 1 and 3, user 2 never
        (1, "view", d(2026, 1, 1, 10)),
        (1, "view", d(2026, 1, 2, 10)),
        (1, "click", d(2026, 1, 2, 12)),  # same day, counted once
        (1, "view", d(2026, 1, 4, 10)),
        (2, "view", d(2026, 1, 1, 23)),
        # cohort Jan 3: user 5
        (5, "view", d(2026, 1, 3, 1)),
        (5, "view", d(2026, 1, 4, 1)),
    ]
    out = {(r.cohort, r.offset): r.n_users
           for r in analytics.retention(_ev(spark, rows)).collect()}
    assert out == {
        ("2026-01-01", 0): 2,
        ("2026-01-01", 1): 1,
        ("2026-01-01", 3): 1,
        ("2026-01-03", 0): 1,
        ("2026-01-03", 1): 1,
    }


def test_asof_join_backward_ties_and_tolerance(spark):
    """Backward match within key; equal-ts matches inclusively; missing
    history gives NULLs; tolerance voids stale matches."""
    from datetime import datetime as dt

    from flexgraph_spark.analytics import asof_join

    left = spark.createDataFrame(
        [
            (1, 10, dt(2024, 1, 1, 10, 0, 0)),
            (2, 10, dt(2024, 1, 1, 11, 0, 0)),
            (3, 10, dt(2024, 1, 1, 9, 0, 0)),   # before any right row
            (4, 20, dt(2024, 1, 1, 10, 30, 0)),
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, dt(2024, 1, 1, 10, 0, 0), 1.0),   # ties with left #1
            (10, dt(2024, 1, 1, 10, 30, 0), 2.0),
            (20, dt(2024, 1, 1, 8, 0, 0), 9.0),
        ],
        "user_id long, ts timestamp, value double",
    )
    got = {r["event_id"]: r for r in
           asof_join(left, right, on=["user_id"]).collect()}
    assert got[1]["value"] == 1.0          # inclusive equal-ts match
    assert got[2]["value"] == 2.0          # latest preceding, not first
    assert got[3]["value"] is None and got[3]["_matched_ts"] is None
    assert got[4]["value"] == 9.0

    got_tol = {r["event_id"]: r for r in
               asof_join(left, right, on=["user_id"],
                         tolerance_s=3600).collect()}
    assert got_tol[4]["value"] is None     # 2.5h old: voided
    assert got_tol[2]["value"] == 2.0      # 30min old: kept


def test_interval_join_containment_and_buckets(spark):
    """Closed-bound containment across bucket boundaries; keyed isolation;
    multi-interval points fan out one row per interval."""
    from datetime import datetime as dt

    from flexgraph_spark.analytics import interval_join

    pts = spark.createDataFrame(
        [
            (1, 10, dt(2024, 1, 1, 10, 0, 0)),   # inside A (boundary start)
            (2, 10, dt(2024, 1, 1, 11, 59, 59)), # inside A, crosses bucket
            (3, 10, dt(2024, 1, 1, 12, 0, 1)),   # just past A's end
            (4, 20, dt(2024, 1, 1, 10, 30, 0)),  # same time, other key
            (5, 10, dt(2024, 1, 1, 10, 30, 0)),  # inside A and B
        ],
        "event_id long, user_id long, ts timestamp",
    )
    ivs = spark.createDataFrame(
        [
            ("A", 10, dt(2024, 1, 1, 10, 0, 0), dt(2024, 1, 1, 12, 0, 0)),
            ("B", 10, dt(2024, 1, 1, 10, 15, 0), dt(2024, 1, 1, 10, 45, 0)),
        ],
        "interval_id string, user_id long, start timestamp, end timestamp",
    )
    got = sorted(
        (r["event_id"], r["interval_id"])
        for r in interval_join(pts, ivs, on=["user_id"], bucket_s=600).collect()
    )
    assert got == [(1, "A"), (2, "A"), (5, "A"), (5, "B")]


def test_timeseries_rollup_partial_merge_lossless(spark):
    """Coarser levels built from finer partials equal direct aggregation;
    non-nesting resolutions are rejected."""
    from datetime import datetime as dt

    from flexgraph_spark.analytics import timeseries_rollup

    ev = spark.createDataFrame(
        [
            (1, dt(2024, 1, 1, 0, 10), "a", 1.0),
            (2, dt(2024, 1, 1, 0, 50), "a", 2.0),
            (3, dt(2024, 1, 1, 1, 10), "a", 4.0),
            (4, dt(2024, 1, 2, 5, 0), "b", 8.0),
        ],
        "event_id long, ts timestamp, event_type string, value double",
    )
    rows = timeseries_rollup(
        ev, group_cols=["event_type"], resolutions_s=(3600, 86400)
    ).collect()
    day = {(r["bucket_start"], r["event_type"]): r for r in rows
           if r["resolution_s"] == 86400}
    d0 = dt(2024, 1, 1).timestamp()
    assert day[(int(d0), "a")]["n"] == 3
    assert day[(int(d0), "a")]["v_sum"] == 7.0
    assert day[(int(d0), "a")]["v_max"] == 4.0
    assert day[(int(d0) + 86400, "b")]["n"] == 1
    hours = [r for r in rows if r["resolution_s"] == 3600]
    assert len(hours) == 3

    with pytest.raises(ValueError):
        timeseries_rollup(ev, resolutions_s=(3600, 5000)).collect()


def test_snapshot_diff_statuses_and_null_safety(spark):
    from flexgraph_spark.analytics import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", "x"), (2, "b", None), (3, "c", "z"), (4, "d", "w")],
        "id long, text string, tag string",
    )
    new = spark.createDataFrame(
        [(1, "a", "x"),        # unchanged -> dropped from the diff
         (2, "b", ""),         # NULL -> '' must register as changed
         (3, "c2", "z"),       # changed
         (5, "e", "v")],       # added; 4 removed
        "id long, text string, tag string",
    )
    got = {r.id: r.status for r in snapshot_diff(old, new, keys=["id"]).collect()}
    assert got == {2: "changed", 3: "changed", 4: "removed", 5: "added"}
    # explicit compare_cols ignores other columns
    got2 = {
        r.id: r.status
        for r in snapshot_diff(old, new, keys=["id"], compare_cols=["text"]).collect()
    }
    assert got2 == {3: "changed", 4: "removed", 5: "added"}
    import pytest as _pytest
    with _pytest.raises(ValueError):
        snapshot_diff(old.select("id"), new.select("id"), keys=["id"])


def test_exact_quantiles_vs_sorted(spark):
    """Histogram-bisection order statistics == the sorted-list definition,
    on a skewed multiset with ties and negatives, at several bucket/refine
    configs (including ones that force the recursion and the single-valued
    bucket short-circuits)."""
    import math

    vals = ([5.0] * 40 + [-3.0] * 7 + [1000.0] * 3
            + [float(v) for v in range(100)] + [0.25, 0.25])
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    qs = [0.01, 0.1, 0.5, 0.9, 0.99, 1.0]
    s = sorted(vals)
    expect = {int(round(q * 100)): s[max(1, math.ceil(q * len(s) - 1e-9)) - 1]
              for q in qs}
    for kw in ({}, {"n_buckets": 4, "max_refine_rows": 10},
               {"n_buckets": 2, "max_refine_rows": 5}):
        got = {r.pct: r.val
               for r in analytics.exact_quantiles(df, "v", qs, **kw).collect()}
        assert got == expect, kw


def test_exact_quantiles_edges(spark):
    # empty input and all-equal input (mn == mx fast path), NULLs excluded
    empty = spark.createDataFrame([], "v double")
    assert analytics.exact_quantiles(empty, "v", [0.5]).count() == 0
    eq = spark.createDataFrame([(7.0,)] * 9 + [(None,)], "v double")
    [r] = analytics.exact_quantiles(eq, "v", [0.5]).collect()
    assert (r.pct, r.val) == (50, 7.0)


def test_entity_resolution_blocks_and_clusters(spark):
    """Planted twins link; unrelated records stay singletons; identical
    records in DIFFERENT blocks never pair (blocking is a hard gate)."""
    rows = [
        (1, "alice johnson", "12 oak street apt 4", "A"),
        (2, "alice johnson jr", "12 oak street apt 4", "A"),   # twin of 1
        (3, "bob smith", "99 pine avenue suite 7", "A"),
        (4, "carol davis", "1 elm road floor 2", "B"),
        (5, "alice johnson", "12 oak street apt 4", "B"),      # = 1, other block
    ]
    df = spark.createDataFrame(rows, "rec_id long, name string, addr string, blk string")
    got = {r.rec_id: r.entity_id for r in analytics.entity_resolution(
        df, "rec_id", ["name", "addr"], "blk", threshold=0.6).collect()}
    assert got[1] == got[2] == 1
    assert got[3] == 3 and got[4] == 4
    assert got[5] == 5  # blocking prevented the cross-block match


def test_weighted_quantiles_vs_python(spark):
    """Weighted-CDF inverse vs a plain-python replay on decimal weights,
    including the recursion path and tie grouping."""
    from decimal import Decimal

    rows = [(float(v), Decimal(w)) for v, w in
            [(5, 1), (5, 3), (1, 10), (9, 2), (7, 4), (3, 0), (9, 5)]]
    df = spark.createDataFrame(rows, "x double, w decimal(18,2)")
    pcts = [1, 25, 50, 75, 100]
    # python oracle: group ties, cumulative weights
    agg = {}
    for v, w in rows:
        agg[v] = agg.get(v, Decimal(0)) + w
    total = sum(agg.values())
    def py_q(p):
        cum = Decimal(0)
        for v in sorted(agg):
            cum += agg[v]
            if 100 * cum >= total * p:
                return v
    expect = {p: py_q(p) for p in pcts}
    for kw in ({}, {"n_buckets": 2, "max_refine_values": 2}):
        got = {r.pct: r.val for r in analytics.weighted_quantiles(
            df, "x", "w", pcts, **kw).collect()}
        assert got == expect, kw


def test_attribution_models_and_lookback(spark):
    from datetime import datetime as d
    rows = [
        (1, d(2026, 1, 1, 8), 7, "view", 0.0),     # outside 2h lookback
        (2, d(2026, 1, 1, 11), 7, "view", 0.0),
        (3, d(2026, 1, 1, 11, 30), 7, "click", 0.0),
        (4, d(2026, 1, 1, 12), 7, "purchase", 9.5),
        (5, d(2026, 1, 1, 13), 7, "view", 0.0),    # after conversion
        (6, d(2026, 1, 2, 12), 8, "purchase", 1.0),  # no touches: direct
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double")
    last = {r.conv_id: r.touch_id for r in analytics.attribution(
        ev, ["view", "click"], "purchase", model="last",
        lookback_hours=2).collect()}
    assert last == {4: 3, 6: None}
    first = {r.conv_id: r.touch_id for r in analytics.attribution(
        ev, ["view", "click"], "purchase", model="first",
        lookback_hours=2).collect()}
    assert first == {4: 2, 6: None}  # event 1 excluded by the window
    nolimit = {r.conv_id: r.touch_id for r in analytics.attribution(
        ev, ["view", "click"], "purchase", model="first",
        lookback_hours=None).collect()}
    assert nolimit[4] == 1
    import pytest as _p
    with _p.raises(ValueError):
        analytics.attribution(ev, ["view"], "purchase", model="linear")


def test_grouped_exact_quantiles_vs_sorted(spark):
    """Per-group ranks equal the sorted-list definition, including a
    single-valued group (mn==mx fast path) and an integer group key."""
    import math

    data = {"a": [5.0, 1.0, 9.0, 3.0, 3.0], "b": [7.0] * 4,
            "c": [float(v) for v in range(20)]}
    rows = [(g, v) for g, vals in data.items() for v in vals]
    df = spark.createDataFrame(rows, "grp string, v double")
    qs = [0.1, 0.5, 1.0]
    got = {(r.grp, r.pct): r.val
           for r in analytics.grouped_exact_quantiles(
               df, "v", "grp", qs).collect()}
    for g, vals in data.items():
        s = sorted(vals)
        for q in qs:
            k = max(1, math.ceil(q * len(s) - 1e-9))
            assert got[(g, int(round(q * 100)))] == s[k - 1], (g, q)
    # integer group keys round-trip through the string cast
    idf = spark.createDataFrame([(1, 2.0), (1, 4.0), (2, 9.0)], "grp int, v double")
    igot = {(r.grp, r.pct): r.val
            for r in analytics.grouped_exact_quantiles(
                idf, "v", "grp", [0.5]).collect()}
    assert igot == {("1", 50): 2.0, ("2", 50): 9.0}


def test_spearman_vs_scipy_free_reference(spark):
    """Tie-aware Spearman == the average-rank Pearson definition computed
    in plain python, on data with heavy ties; constant column -> NULL."""
    xs = [1.0, 2.0, 2.0, 3.0, 5.0, 5.0, 5.0, 8.0]
    ys = [2.0, 1.0, 4.0, 4.0, 6.0, 9.0, 6.0, 9.0]

    def avg_ranks(vals):
        order = sorted(vals)
        return [ (order.index(v) + 1 + len(order) - order[::-1].index(v)) / 2
                 for v in vals ]
    rx, ry = avg_ranks(xs), avg_ranks(ys)
    n = len(xs)
    sx, sy = sum(rx), sum(ry)
    sxy = sum(a * b for a, b in zip(rx, ry))
    sxx = sum(a * a for a in rx)
    syy = sum(b * b for b in ry)
    exp = (n * sxy - sx * sy) / (
        (n * sxx - sx * sx) ** 0.5 * (n * syy - sy * sy) ** 0.5)
    df = spark.createDataFrame(list(zip(xs, ys)), "x double, y double")
    [r] = analytics.spearman_correlation(df, "x", "y").collect()
    assert r.n == n and abs(r.rho - exp) < 1e-6
    const = spark.createDataFrame([(1.0, 2.0), (1.0, 5.0)], "x double, y double")
    [rc] = analytics.spearman_correlation(const, "x", "y").collect()
    assert rc.rho is None


def test_rank_biased_overlap_identical_and_disjoint(spark):
    """RBO == 1 - p^depth-ish geometric mass for identical rankings
    (truncated: sum_{d<=D}(1-p)p^(d-1) since X_d = d), 0 for disjoint
    lists, and strictly between for a head swap."""
    import math

    a = spark.createDataFrame(
        [(i, 100.0 - i) for i in range(10)], "vertex long, score double")
    same = analytics.rank_biased_overlap(a, a, p=0.5, depth=10).first()
    expect = sum((1 - 0.5) * 0.5 ** (d - 1) for d in range(1, 11))
    assert abs(same.rbo - round(expect, 6)) < 1e-9
    b = spark.createDataFrame(
        [(i + 100, 100.0 - i) for i in range(10)], "vertex long, score double")
    assert analytics.rank_biased_overlap(a, b, p=0.5, depth=10).first().rbo == 0.0
    # swap ranks 1 and 2 in b': overlap X_1 = 0, X_d = d for d >= 2
    bswap = spark.createDataFrame(
        [(0, 99.0), (1, 100.0)] + [(i, 100.0 - i) for i in range(2, 10)],
        "vertex long, score double")
    mid = analytics.rank_biased_overlap(a, bswap, p=0.5, depth=10).first().rbo
    exp_mid = sum((1 - 0.5) * 0.5 ** (d - 1) * (0 if d == 1 else 1)
                  for d in range(1, 11))
    assert abs(mid - round(exp_mid, 6)) < 1e-9


def test_ndcg_at_k_closed_forms(spark):
    import math

    rel = spark.createDataFrame(
        [(1, 3.0), (2, 2.0), (3, 1.0), (4, 0.0)], "doc_id long, rel double")
    perfect = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 3)], "doc_id long, rank int")
    [r] = analytics.ndcg_at_k(perfect, rel, k=3).collect()
    assert r.ndcg == 1.0
    # worst order of the same items
    worst = spark.createDataFrame(
        [(3, 1), (2, 2), (1, 3)], "doc_id long, rank int")
    [w] = analytics.ndcg_at_k(worst, rel, k=3).collect()
    dcg = 1.0 / math.log2(2) + 2.0 / math.log2(3) + 3.0 / math.log2(4)
    idcg = 3.0 / math.log2(2) + 2.0 / math.log2(3) + 1.0 / math.log2(4)
    assert abs(w.ndcg - round(dcg / idcg, 6)) < 1e-9
    # no relevant items anywhere -> NULL ndcg
    zero = spark.createDataFrame(
        [(1, 0.0), (2, 0.0)], "doc_id long, rel double")
    [z] = analytics.ndcg_at_k(perfect, zero, k=3).collect()
    assert z.ndcg is None


def test_weighted_quantiles_double_weights_always_emit_every_pct(spark):
    """Regression: with double (non-decimal) weights, float accumulation
    can leave pct=100's rhs an ulp above the scanned total, previously
    dropping the row silently. Every requested pct must come back, and
    pct=100 is the global max."""
    rows = [(float(v), 0.1) for v in range(1, 8)]
    df = spark.createDataFrame(rows, "x double, w double")
    got = {r.pct: r.val for r in analytics.weighted_quantiles(
        df, "x", "w", [25, 50, 100]).collect()}
    assert sorted(got) == [25, 50, 100]
    assert got[100] == 7.0


def test_entity_resolution_whitespace_only_records_stay_singletons(spark):
    """Regression: whitespace-only records normalize to ' ' (not ''), and
    previously stayed pairable — all merging at Jaccard 1.0. They must
    resolve to themselves; real twins still link."""
    rows = [
        (1, " ", "  ", "A"),
        (2, "\t", " ", "A"),
        (3, "acme corporation ltd", "5 main street", "A"),
        (4, "acme corporation ltd", "5 main street", "A"),
    ]
    df = spark.createDataFrame(rows, "rec_id long, name string, addr string, blk string")
    got = {r.rec_id: r.entity_id for r in analytics.entity_resolution(
        df, "rec_id", ["name", "addr"], "blk", threshold=0.6).collect()}
    assert got[1] == 1 and got[2] == 2
    assert got[3] == got[4] == 3
