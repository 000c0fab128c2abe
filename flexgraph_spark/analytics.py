"""Batch analytics over the events table: ordered funnels and cohort
retention — the two workhorse product-analytics queries an engine at this
tier is expected to answer over trillions of events. Pure DataFrame plans
(joins + aggregations, no UDFs), each with an exact DuckDB oracle row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from flexgraph_spark import gimv


def funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered funnel: a user reaches step k iff they emitted ``steps[k]``
    STRICTLY AFTER their earliest completion of step k-1 (the classic
    min-timestamp funnel — insensitive to repeats, deterministic).
    Returns (step_idx, step, n_users), one row per step.

    Scale shape: per step one filtered scan + one (user ⨝ user) hash join
    against the (shrinking) reached-set and one min-aggregate — k steps =
    k joins keyed on the uniform user id, never a per-user event-sequence
    sort. The per-step counts union into ONE DataFrame so the whole
    funnel is a single job.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    u, t = F.col(user_col), F.col(ts_col)
    reached = (
        events.where(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(t).alias("_t"))
    )
    parts = [
        reached.agg(F.count("*").cast("long").alias("n_users")).select(
            F.lit(0).alias("step_idx"), F.lit(steps[0]).alias("step"), "n_users"
        )
    ]
    for i, s in enumerate(steps[1:], 1):
        nxt = (
            events.where(F.col(type_col) == s)
            .join(reached.withColumnRenamed("_t", "_prev"), user_col)
            .where(t > F.col("_prev"))
            .groupBy(user_col)
            .agg(F.min(t).alias("_t"))
        )
        parts.append(
            nxt.agg(F.count("*").cast("long").alias("n_users")).select(
                F.lit(i).alias("step_idx"), F.lit(s).alias("step"), "n_users"
            )
        )
        reached = nxt
    out = parts[0]
    for frame in parts[1:]:
        out = out.union(frame)
    return out


def retention(
    events: DataFrame,
    period: str = "day",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Cohort retention: cohort = the user's first-activity period
    (day/week/month via ``date_trunc``); a cohort "retains" a user at
    offset k if the user was active k periods after the cohort period.
    Returns (cohort, offset, n_users) with cohort formatted yyyy-MM-dd.

    Scale shape: one min-aggregate for first-touch, one distinct on
    (user, period) — both map-side combined, keyed by the uniform user
    id — then a join and a count aggregation. Offsets are day-based
    (date_diff), so week/month cohorts still report exact day offsets of
    the period starts.
    """
    per = F.date_trunc(period, F.col(ts_col))
    first = events.groupBy(user_col).agg(F.min(per).alias("_cohort"))
    act = events.select(F.col(user_col), per.alias("_p")).distinct()
    return (
        act.join(first, user_col)
        .groupBy(
            F.date_format("_cohort", "yyyy-MM-dd").alias("cohort"),
            F.datediff(F.col("_p"), F.col("_cohort")).alias("offset"),
        )
        .agg(F.count("*").cast("long").alias("n_users"))
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    payload: list[str] | None = None,
    tolerance_s: int | None = None,
) -> DataFrame:
    """As-of join: for every left row, attach the LATEST right row with
    ``right_ts <= left_ts`` within the same ``on`` keys (kdb aj /
    pandas merge_asof backward semantics; ties at equal timestamps match
    inclusively). Returns the left columns plus the right ``payload``
    columns and ``_matched_ts`` — all NULL when nothing precedes.
    ``tolerance_s`` voids matches older than the given seconds.

    Implementation is the union-and-carry plan, NOT a range join: tag
    both sides, sort within each key by (ts, side) — right before left at
    equal ts — and carry the last non-null right payload forward with one
    ``last(ignorenulls)`` running window. ONE shuffle on the key columns,
    per-key sorted scan, zero row multiplication — the shape that
    survives a 100 TB event stream (a range join would explode; per-key
    sort is Spark's windowed sort, spill-safe). Skewed keys are the usual
    AQE/salting territory. Precondition: ``right`` unique per
    (on, right_ts) — dedupe upstream with whatever rule fits.
    """
    payload = payload or [
        c for c in right.columns if c not in set(on) | {right_ts}
    ]
    lrow = F.struct(*[F.col(c) for c in left.columns]).alias("_lrow")
    pay = F.struct(
        F.col(right_ts).alias("_matched_ts"),
        *[F.col(c) for c in payload],
    ).alias("_pay")
    l_tag = left.select(
        *[F.col(c) for c in on],
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        lrow,
        F.lit(None).cast(
            right.select(pay).schema["_pay"].dataType.simpleString()
        ).alias("_pay"),
    )
    r_tag = right.select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(
            left.select(lrow).schema["_lrow"].dataType.simpleString()
        ).alias("_lrow"),
        pay,
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*on)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = (
        l_tag.unionByName(r_tag)
        .withColumn("_c", F.last("_pay", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )
    if tolerance_s is not None:
        fresh = (
            F.col("_ts").cast("timestamp").cast("long")
            - F.col("_c._matched_ts").cast("timestamp").cast("long")
        ) <= tolerance_s
        carried = carried.withColumn(
            "_c", F.when(fresh, F.col("_c"))
        )
    return carried.select(
        *[F.col(f"_lrow.{c}").alias(c) for c in left.columns],
        F.col("_c._matched_ts").alias("_matched_ts"),
        *[F.col(f"_c.{c}").alias(c) for c in payload],
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: list[str] | None = None,
    point_ts: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bucket_s: int = 3600,
) -> DataFrame:
    """Range (interval-containment) join: every point row matched to every
    interval row with ``start <= point_ts <= end`` (closed bounds, BETWEEN
    semantics), optionally also equi-keyed on ``on``. Returns the point
    columns + the interval columns (inner join; a point in k intervals
    yields k rows).

    Plan: time-bucket decomposition, NOT a raw theta-join — each interval
    explodes into the ``bucket_s``-second buckets it covers (one JVM
    ``sequence``), each point hashes to its single bucket, and the join
    is a plain equi-join on (keys…, bucket) + a containment filter. Cost
    is Σ interval_span/bucket_s extra rows instead of |points|×|intervals|
    pairs; pick bucket_s near the median interval length (long outlier
    intervals fan out linearly — cap upstream if adversarial). This is
    the 100 TB shape: equi-join on uniform keys, pushdown-friendly,
    no BroadcastNestedLoop anywhere.
    """
    on = on or []
    b = F.lit(int(bucket_s))
    def _epoch(c):
        # NTZ-safe epoch seconds (TIMESTAMP_NTZ refuses a direct long cast)
        return F.col(c).cast("timestamp").cast("long")

    pb = points.withColumn("_bucket", F.floor(_epoch(point_ts) / b))
    ib = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(_epoch(start_col) / b), F.floor(_epoch(end_col) / b)
            )
        ),
    )
    joined = pb.join(ib, on + ["_bucket"]).filter(
        (F.col(point_ts) >= F.col(start_col))
        & (F.col(point_ts) <= F.col(end_col))
    )
    return joined.drop("_bucket")


def timeseries_rollup(
    events: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    group_cols: list[str] | None = None,
    resolutions_s: tuple[int, ...] = (3600, 86400, 604800),
) -> DataFrame:
    """Hypertable-style multi-resolution rollup (the TimescaleDB
    continuous-aggregate pattern): the FINEST resolution aggregates the
    raw events once; every coarser level merges the next-finer level's
    partials — count/sum/min/max are mergeable, so the raw table is
    scanned exactly once no matter how many resolutions materialize
    (at 100 TB the raw scan dominates; partial-merge levels are
    partial-agg-sized). Each resolution must divide the next coarser one.
    Returns (resolution_s, bucket_start, group_cols…, n, v_sum, v_min,
    v_max) with bucket_start in epoch seconds.
    """
    group_cols = group_cols or []
    rs = sorted(int(r) for r in resolutions_s)
    for a, b in zip(rs, rs[1:]):
        if b % a != 0:
            raise ValueError(
                f"resolution {b} must be a multiple of the finer {a} "
                "(buckets must nest for partial merging)"
            )
    epoch = F.col(ts_col).cast("timestamp").cast("long")
    level = (
        events.groupBy(
            (F.floor(epoch / rs[0]) * rs[0]).alias("bucket_start"),
            *[F.col(c) for c in group_cols],
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(value_col).alias("v_sum"),
            F.min(value_col).alias("v_min"),
            F.max(value_col).alias("v_max"),
        )
        .withColumn("resolution_s", F.lit(rs[0]))
    )
    out = level
    for r in rs[1:]:
        level = (
            level.groupBy(
                (F.floor(F.col("bucket_start") / r) * r).alias("bucket_start"),
                *[F.col(c) for c in group_cols],
            )
            .agg(
                F.sum("n").alias("n"),
                F.sum("v_sum").alias("v_sum"),
                F.min("v_min").alias("v_min"),
                F.max("v_max").alias("v_max"),
            )
            .withColumn("resolution_s", F.lit(r))
        )
        out = out.unionByName(level)
    cols = ["resolution_s", "bucket_start", *group_cols,
            "n", "v_sum", "v_min", "v_max"]
    return out.select(*cols)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Snapshot delta — what changed between two versions of a table (the
    daily-crawl diff that feeds warm-start recompute): full-outer join on
    ``keys``, each side collapsed to ONE sha256 row hash over
    ``compare_cols`` (default: all shared non-key columns, sorted), and a
    verdict per key: ``added`` / ``removed`` / ``changed`` (unchanged rows
    are dropped — at crawl scale they are ~all of the table and the diff
    must stay delta-sized). Returns ``(keys..., status)``.

    Scale shape: hashing is map-side (one sha256 per row, null-safe via a
    unit-separator + sentinel encoding so ('a', NULL) never collides with
    ('a', '')); the join then ships 32-byte digests instead of full rows
    — the content_invariant pattern generalized from "equal?" to "what
    changed?". One key-hash shuffle per side.
    """
    if compare_cols is None:
        shared = set(old.columns) & set(new.columns)
        compare_cols = sorted(shared - set(keys))
    if not compare_cols:
        raise ValueError("snapshot_diff needs at least one compare column")

    def row_hash(df: DataFrame, alias: str) -> DataFrame:
        h = F.sha2(
            F.concat_ws(
                "\x1f",
                *[
                    F.coalesce(F.col(c).cast("string"), F.lit("\x00null"))
                    for c in compare_cols
                ],
            ),
            256,
        )
        return df.select(*keys, h.alias(alias))

    a = row_hash(old, "_h_old")
    b = row_hash(new, "_h_new")
    joined = a.join(b, keys, "full")
    status = (
        F.when(F.col("_h_old").isNull(), "added")
        .when(F.col("_h_new").isNull(), "removed")
        .when(F.col("_h_old") != F.col("_h_new"), "changed")
    )
    return (
        joined.withColumn("status", status)
        .filter(F.col("status").isNotNull())
        .select(*keys, "status")
    )


def exact_quantiles(
    df: DataFrame,
    col: str,
    qs: list[float],
    n_buckets: int = 8192,
    max_refine_rows: int = 2_000_000,
) -> DataFrame:
    """Exact order statistics at 100 TB scale — no global sort, no
    approx_percentile error bound.

    For each q in ``qs`` returns the k-th smallest value of ``col`` with
    ``k = max(1, ceil(q * n))`` (SQL ``ORDER BY col LIMIT 1 OFFSET k-1``
    semantics, so a DuckDB oracle can replay it exactly). NULLs are
    excluded, matching SQL ordered-set aggregates.

    Scale shape (histogram bisection, NOT a sort):
      pass 1  one agg -> (n, min, max).
      pass 2  one groupBy over ``n_buckets`` equi-width buckets ->
              (count, min, max) per bucket; only ``n_buckets`` rows reach
              the driver, never data rows.
      pass 3  rows from the <=len(qs) buckets that contain a target rank
              are ranked by a per-bucket window (one task per bucket,
              each expected n/n_buckets rows) and joined to the tiny
              (bucket, local_rank) target table.
    A bucket that is single-valued (min==max) resolves without pass 3; a
    bucket larger than ``max_refine_rows`` with distinct values recurses
    on the bucket's value range (depth is log_{n_buckets}(n/max_refine) —
    2 levels cover 10^13 rows at the defaults). Output:
    ``(pct int, val double)`` where pct = round(q*100).

    Reference parity: the reference engine has no order statistics; this
    is part of the training-data-pipeline addendum (length/score
    percentile cuts for corpus filtering).
    """
    x = df.select(F.col(col).cast("double").alias("x")).filter(
        F.col("x").isNotNull()
    )
    head = x.agg(
        F.count("*").alias("n"), F.min("x").alias("mn"), F.max("x").alias("mx")
    ).collect()[0]
    n = head["n"]
    spark = df.sparkSession
    out_schema = "pct int, val double"
    if n == 0:
        return spark.createDataFrame([], out_schema)
    import math

    # k = max(1, ceil(q*n)); the tiny epsilon guards float drift in q*n
    targets = [(int(round(q * 100)), max(1, math.ceil(q * n - 1e-9))) for q in qs]
    rows = _kth_smallest(x, targets, head["mn"], head["mx"], n, n_buckets, max_refine_rows)
    return spark.createDataFrame(rows, out_schema).orderBy("pct")


def _kth_smallest(
    x: DataFrame,
    targets: list[tuple[int, int]],
    mn: float,
    mx: float,
    n: int,
    n_buckets: int,
    max_refine_rows: int,
) -> list[tuple[int, float]]:
    """Resolve (pct, k) targets over x in [mn, mx] with |x| = n rows.

    Returns [(pct, value)]. k is the 1-indexed rank within this x.
    """
    if mn == mx:
        return [(pct, float(mn)) for pct, _ in targets]
    w = (mx - mn) / n_buckets
    bucket = F.least(
        F.lit(n_buckets - 1),
        F.greatest(F.lit(0), F.floor((F.col("x") - F.lit(mn)) / F.lit(w))),
    ).cast("int")
    hist = {
        r["b"]: r
        for r in x.groupBy(bucket.alias("b"))
        .agg(F.count("*").alias("c"), F.min("x").alias("bmn"), F.max("x").alias("bmx"))
        .collect()
    }
    order = sorted(hist)
    resolved: list[tuple[int, float]] = []
    refine: list[tuple[int, int, int]] = []  # (pct, bucket, local_rank)
    recurse: dict[int, list[tuple[int, int]]] = {}
    for pct, k in targets:
        cum = 0
        for b in order:
            c = hist[b]["c"]
            if cum + c >= k:
                local = k - cum
                if hist[b]["bmn"] == hist[b]["bmx"]:
                    resolved.append((pct, float(hist[b]["bmn"])))
                elif c > max_refine_rows:
                    recurse.setdefault(b, []).append((pct, local))
                else:
                    refine.append((pct, b, local))
                break
            cum += c
    for b, sub_targets in recurse.items():
        sub = x.filter(
            (F.col("x") >= F.lit(float(hist[b]["bmn"])))
            & (F.col("x") <= F.lit(float(hist[b]["bmx"])))
        )
        resolved.extend(
            _kth_smallest(
                sub, sub_targets, hist[b]["bmn"], hist[b]["bmx"], hist[b]["c"],
                n_buckets, max_refine_rows,
            )
        )
    if refine:
        spark = x.sparkSession
        need = spark.createDataFrame(
            [(p, b, r) for p, b, r in refine], "pct int, b int, lr int"
        )
        wanted_buckets = sorted({b for _, b, _ in refine})
        win = Window.partitionBy("b").orderBy("x")
        ranked = (
            x.withColumn("b", bucket)
            .filter(F.col("b").isin(wanted_buckets))
            .withColumn("lr", F.row_number().over(win))
        )
        got = ranked.join(F.broadcast(need), ["b", "lr"]).select("pct", "x").collect()
        resolved.extend((r["pct"], float(r["x"])) for r in got)
    return resolved


def entity_resolution(
    records: DataFrame,
    key_col: str,
    text_cols: list[str],
    block_col: str,
    threshold: float = 0.6,
    k: int = 3,
) -> DataFrame:
    """Record linkage / entity resolution over structured records: which
    rows are the same real-world entity?

    Pipeline (the classic blocking + pairwise-similarity + transitive-
    closure shape):
      1. serialize ``text_cols`` into one normalized string (lower,
         whitespace-collapsed) and shingle it into distinct character
         ``k``-grams — all column expressions;
      2. candidate pairs ONLY within a ``block_col`` group (the blocking
         key caps the quadratic term: cost is sum of block^2, never
         corpus^2 — at web scale pick blocks like zip+name-initial and
         cap block sizes upstream);
      3. exact Jaccard over the shingle arrays keeps pairs >= threshold;
      4. matched pairs feed the GIM-V HashMin CC engine; entity_id = min
         key in the component, singletons resolve to themselves.
    Returns (``key_col``, entity_id).
    """
    from flexgraph_spark import algorithms

    norm = F.lower(
        F.regexp_replace(F.concat_ws(" ", *text_cols), r"\s+", " ")
    )
    n = records.select(
        F.col(key_col).cast("long").alias("_id"),
        F.col(block_col).alias("_blk"),
        norm.alias("_norm"),
    )
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length("_norm") - (k - 1), F.lit(1))),
            lambda i: F.col("_norm").substr(i, F.lit(k)),
        )
    )
    sh = n.select("_id", "_blk", grams.alias("_sh"),
                  (F.length(F.trim(F.col("_norm"))) > 0).alias("_has_text")
                  ).persist()
    # blank records (all text cols empty/NULL, or whitespace-only — the
    # concat_ws + collapse leaves " ", hence the trim) share a degenerate
    # shingle set and would all merge at Jaccard 1.0 — exclude them from
    # pairing entirely; they resolve to themselves below
    pairable = sh.filter("_has_text")
    a = pairable.select(F.col("_id").alias("id_a"), F.col("_blk").alias("_blk"),
                        F.col("_sh").alias("sh_a"))
    b = pairable.select(F.col("_id").alias("id_b"), F.col("_blk").alias("_blk"),
                        F.col("_sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    pairs = (
        a.join(b, "_blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "_j",
            inter.cast("double")
            / (F.size("sh_a") + F.size("sh_b") - inter),
        )
        .filter(F.col("_j") >= threshold)
        .select("id_a", "id_b")
    )
    cc = algorithms.connected_components(
        pairs.selectExpr("id_a as src", "id_b as dst")
    )
    out = (
        sh.select(F.col("_id").alias(key_col))
        .join(cc.state.withColumnRenamed("vertex", key_col), key_col, "left")
        .select(
            key_col,
            F.coalesce(F.col("value"), F.col(key_col)).cast("long")
            .alias("entity_id"),
        )
    )
    # materialize before releasing the shingle cache — long sessions run
    # entity_resolution repeatedly and the persist would otherwise leak
    out = gimv.truncate_plan(out)
    sh.unpersist(blocking=False)
    return out


def weighted_quantiles(
    df: DataFrame,
    col: str,
    weight_col: str,
    pcts: list[int],
    n_buckets: int = 8192,
    max_refine_values: int = 2_000_000,
) -> DataFrame:
    """Exact WEIGHTED quantiles at scale: for each integer percent in
    ``pcts`` return the smallest value x with
    100 * W(<= x) >= W_total * pct — the weighted-CDF inverse (revenue
    percentiles of a size column, token-weighted length cuts). Same
    histogram-bisection shape as :func:`exact_quantiles` (bucket pass,
    driver sees only bucket rows, per-bucket refine, recursion on
    oversized buckets) but aggregating sum(weight), with ties grouped by
    value so the answer is tie-order-free.

    The boundary test multiplies through by 100 instead of dividing
    (100*cum >= W*pct), so with DECIMAL weights every comparison is
    exact in both this engine and a SQL oracle — pass decimal weights
    when cross-engine bit-equality matters; double weights are subject
    to summation-order rounding at exact boundaries. NULL values/weights
    are excluded. Output (pct int, val double).
    """
    x = df.select(
        F.col(col).cast("double").alias("x"), F.col(weight_col).alias("w")
    ).filter(F.col("x").isNotNull() & F.col("w").isNotNull())
    head = x.agg(
        F.sum("w").alias("tw"), F.min("x").alias("mn"), F.max("x").alias("mx")
    ).collect()[0]
    spark = df.sparkSession
    out_schema = "pct int, val double"
    if head["tw"] is None:
        return spark.createDataFrame([], out_schema)
    targets = [(int(p), head["tw"] * int(p)) for p in pcts]  # RHS of 100*cum >= W*pct
    rows = _weighted_kth(
        x, targets, head["mn"], head["mx"], n_buckets, max_refine_values
    )
    return spark.createDataFrame(rows, out_schema).orderBy("pct")


def _weighted_kth(
    x: DataFrame,
    targets: list[tuple[int, object]],
    mn: float,
    mx: float,
    n_buckets: int,
    max_refine_values: int,
) -> list[tuple[int, float]]:
    """Resolve (pct, rhs) targets: smallest x with 100*cumweight >= rhs,
    over x in [mn, mx]."""
    if mn == mx:
        return [(pct, float(mn)) for pct, _ in targets]
    w = (mx - mn) / n_buckets
    bucket = F.least(
        F.lit(n_buckets - 1),
        F.greatest(F.lit(0), F.floor((F.col("x") - F.lit(mn)) / F.lit(w))),
    ).cast("int")
    hist = {
        r["b"]: r
        for r in x.groupBy(bucket.alias("b"))
        .agg(
            F.sum("w").alias("bw"),
            F.count_distinct("x").alias("nv"),
            F.min("x").alias("bmn"),
            F.max("x").alias("bmx"),
        )
        .collect()
    }
    order = sorted(hist)
    resolved: list[tuple[int, float]] = []
    refine: list[tuple[int, int, object]] = []  # (pct, bucket, remaining rhs)
    recurse: dict[int, list[tuple[int, object]]] = {}
    for pct, rhs in targets:
        cum = 0
        hit = False
        for b in order:
            r = hist[b]
            if 100 * (cum + r["bw"]) >= rhs:
                rem = rhs - 100 * cum
                if r["bmn"] == r["bmx"]:
                    resolved.append((pct, float(r["bmn"])))
                elif r["nv"] > max_refine_values:
                    recurse.setdefault(b, []).append((pct, rem))
                else:
                    refine.append((pct, b, rem))
                hit = True
                break
            cum += r["bw"]
        if not hit and order:
            # With double (non-decimal) weights, summing per-bucket can
            # land the grand total an ulp BELOW rhs (e.g. pct=100), so no
            # bucket satisfies the boundary test. The mathematical answer
            # is then the global maximum — clamp to the last non-empty
            # bucket's max instead of silently dropping the pct row.
            resolved.append((pct, float(hist[order[-1]]["bmx"])))
    for b, sub in recurse.items():
        subx = x.filter(
            (F.col("x") >= F.lit(float(hist[b]["bmn"])))
            & (F.col("x") <= F.lit(float(hist[b]["bmx"])))
        )
        resolved.extend(
            _weighted_kth(subx, sub, hist[b]["bmn"], hist[b]["bmx"],
                          n_buckets, max_refine_values)
        )
    if refine:
        # ONE pass for every remaining target: per-bucket distinct-value
        # cumweights (window partitioned by bucket), joined against the
        # tiny (bucket, pct, rem) table — no per-target rescan
        spark = x.sparkSession
        need = spark.createDataFrame(
            [(b, pct, str(rem)) for pct, b, rem in refine],
            "b int, pct int, rem string",
        )
        wanted = sorted({b for _, b, _ in refine})
        vals = (
            x.withColumn("b", bucket)
            .filter(F.col("b").isin(wanted))
            .groupBy("b", "x")
            .agg(F.sum("w").alias("vw"))
        )
        win = Window.partitionBy("b").orderBy("x").rowsBetween(
            Window.unboundedPreceding, 0
        )
        got = (
            vals.withColumn("cw", F.sum("vw").over(win))
            .join(F.broadcast(need), "b")
            .filter(
                (F.lit(100) * F.col("cw"))
                >= F.col("rem").cast("decimal(38,6)")
            )
            .groupBy("pct")
            .agg(F.min("x").alias("x"))
            .collect()
        )
        resolved.extend((r["pct"], float(r["x"])) for r in got)
    return resolved


def attribution(
    events: DataFrame,
    touch_types: list[str],
    conversion_type: str,
    model: str = "last",
    lookback_hours: int | None = 72,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Marketing/touch attribution: credit each conversion to ONE touch
    event — ``model='last'`` (industry default) takes the latest touch at
    or before the conversion inside the lookback window, ``'first'`` the
    earliest. Ties at the same timestamp break to the lowest touch
    event_id, so the credit assignment is deterministic and
    SQL-replayable. Conversions with no eligible touch report a NULL
    touch (the "direct" bucket). Returns (conv_id, user, conv_ts,
    touch_id, touch_type, value).

    Scale shape: one conversions⨝touches join keyed on the user id plus
    a per-conversion argmin/argmax window — the join is the only
    shuffle, and it is user-keyed (uniform); no per-user event-sequence
    sort, no window over the whole corpus. At 10^12 events the lookback
    predicate prunes the join output to conversion-local touches.
    """
    if model not in ("last", "first"):
        raise ValueError("model must be 'last' or 'first'")
    conv = events.filter(F.col(type_col) == conversion_type).select(
        F.col(id_col).alias("conv_id"),
        F.col(user_col).alias("user"),
        F.col(ts_col).alias("conv_ts"),
        F.col(value_col).alias("value"),
    )
    touch = events.filter(F.col(type_col).isin(touch_types)).select(
        F.col(id_col).alias("touch_id"),
        F.col(user_col).alias("user"),
        F.col(ts_col).alias("touch_ts"),
        F.col(type_col).alias("touch_type"),
    )
    cond = F.col("touch_ts") <= F.col("conv_ts")
    if lookback_hours is not None:
        cond = cond & (
            F.col("touch_ts")
            >= F.col("conv_ts") - F.expr(f"INTERVAL {int(lookback_hours)} HOURS")
        )
    # eligibility lives IN the join condition so ineligible touches are
    # pruned before the window — a hot user with 10^6 touches never
    # fans out against every conversion; the left join still emits one
    # NULL-touch row per unmatched conversion (the direct bucket)
    joined = conv.join(
        touch, (conv["user"] == touch["user"]) & cond, "left"
    ).drop(touch["user"]).withColumn(
        "_ok", F.col("touch_id").isNotNull()
    )
    order = (
        [F.desc("_ok"), F.desc("touch_ts"), F.asc("touch_id")]
        if model == "last"
        else [F.desc("_ok"), F.asc("touch_ts"), F.asc("touch_id")]
    )
    w = Window.partitionBy("conv_id").orderBy(*order)
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "conv_id",
            "user",
            "conv_ts",
            F.when(F.col("_ok"), F.col("touch_id")).alias("touch_id"),
            F.when(F.col("_ok"), F.col("touch_type")).alias("touch_type"),
            "value",
        )
    )


def grouped_exact_quantiles(
    df: DataFrame,
    col: str,
    group_col: str,
    qs: list[float],
    n_buckets: int = 8192,
) -> DataFrame:
    """Exact per-group order statistics — one histogram pass for ALL
    groups at once (per-language length cuts, per-domain score
    percentiles): k = max(1, ceil(q*n_g))-th smallest within each group,
    the same rank rule as :func:`exact_quantiles`.

    Scale shape: pass 1 one (group) agg for (n, min, max); pass 2 ONE
    groupBy (group, equi-width bucket) histogram — driver sees
    n_groups x n_buckets rows at most (histogram rows, never data);
    pass 3 ranks only the target buckets with a window PARTITIONED BY
    (group, bucket) and joins the tiny (group, bucket, local_rank)
    table. Designed for moderate group counts (languages, sources —
    10^2..10^4); for 10^6+ groups with small members a plain per-group
    sort-within-partitions wins and this histogram route is overkill.
    Output (``group_col``, pct int, val double).
    """
    import math

    x = df.select(
        F.col(group_col).cast("string").alias("_g"),
        F.col(col).cast("double").alias("x"),
    ).filter(F.col("x").isNotNull() & F.col("_g").isNotNull())
    heads = {
        r["_g"]: r
        for r in x.groupBy("_g")
        .agg(F.count("*").alias("n"), F.min("x").alias("mn"), F.max("x").alias("mx"))
        .collect()
    }
    spark = df.sparkSession
    out_schema = f"{group_col} string, pct int, val double"
    resolved: list[tuple[str, int, float]] = []
    # (group, bucket) -> [(pct, local_rank)]
    refine: list[tuple[str, int, int, int]] = []
    wexprs = {}
    for g, h in heads.items():
        mn, mx, n = h["mn"], h["mx"], h["n"]
        for q in qs:
            pct = int(round(q * 100))
            k = max(1, math.ceil(q * n - 1e-9))
            if mn == mx:
                resolved.append((str(g), pct, float(mn)))
            else:
                wexprs[g] = (mx - mn) / n_buckets
                refine.append((str(g), pct, k, 0))  # bucket filled below
    if refine:
        # histogram for all non-degenerate groups in ONE pass
        w_map = F.create_map(
            *[l for g, w in wexprs.items() for l in (F.lit(g), F.lit(w))]
        )
        mn_map = F.create_map(
            *[l for g in wexprs for l in (F.lit(g), F.lit(float(heads[g]["mn"])))]
        )
        bucket = F.least(
            F.lit(n_buckets - 1),
            F.greatest(
                F.lit(0),
                F.floor((F.col("x") - mn_map[F.col("_g")]) / w_map[F.col("_g")]),
            ),
        ).cast("int")
        xs = x.filter(F.col("_g").isin(list(wexprs))).withColumn("b", bucket)
        hist: dict[tuple[str, int], int] = {}
        for r in xs.groupBy("_g", "b").agg(F.count("*").alias("c")).collect():
            hist[(r["_g"], r["b"])] = r["c"]
        needs = []
        for g, pct, k, _ in refine:
            cum = 0
            for b in range(n_buckets):
                c = hist.get((g, b), 0)
                if cum + c >= k:
                    needs.append((g, b, k - cum, pct))
                    break
                cum += c
        need_df = spark.createDataFrame(
            needs, "_g string, b int, lr int, pct int"
        )
        win = Window.partitionBy("_g", "b").orderBy("x")
        ranked = (
            xs.join(need_df.select("_g", "b").distinct(), ["_g", "b"])
            .withColumn("lr", F.row_number().over(win))
        )
        got = ranked.join(F.broadcast(need_df), ["_g", "b", "lr"]).select(
            "_g", "pct", "x"
        ).collect()
        resolved.extend((r["_g"], r["pct"], float(r["x"])) for r in got)
    return spark.createDataFrame(resolved, out_schema).orderBy(group_col, "pct")


def spearman_correlation(
    df: DataFrame, x_col: str, y_col: str
) -> DataFrame:
    """Exact Spearman rank correlation at scale — monotonic-association
    measure robust to outliers (the screening statistic for feature/
    quality-signal redundancy), with PROPER tie handling (average
    ranks), computed so every intermediate is integer-exact:

      * per-column average ranks come from the distinct-value count
        table: avg_rank(v) = |{x < v}| + (c_v + 1)/2 — a window over
        DISTINCT values only (scales when distinct ≪ rows; a fully
        continuous column degrades to a rows-sized window and belongs in
        approx territory);
      * DOUBLED ranks (2·avg_rank, always integral) ride through the
        Pearson sums as decimal(38,0), so Σxy/Σx²/(Σx)² are exact and
        the only float op is the final division — bit-identical in any
        engine.
    Returns one row (n, rho). rho is NULL when either column is
    constant (zero variance).
    """
    from pyspark.sql import Window

    pairs = df.select(
        F.col(x_col).cast("double").alias("x"),
        F.col(y_col).cast("double").alias("y"),
    ).filter(F.col("x").isNotNull() & F.col("y").isNotNull())
    # exactness bound: the numerator n·Σ(rx·ry) ~ 4n^4 must fit
    # decimal(38,0); beyond ~1e9 rows Spark would NULL (non-ANSI) or
    # throw (ANSI) on overflow — refuse loudly and point at sampling
    n_rows = pairs.count()
    if n_rows > 1_000_000_000:
        raise ValueError(
            f"spearman_correlation: {n_rows} rows exceeds the "
            "decimal(38,0) exactness bound (~1e9); rank-correlate a "
            "deterministic sample (corpus.deterministic_sample) instead"
        )

    def dranks(c: str, out: str) -> DataFrame:
        counts = pairs.groupBy(c).agg(F.count("*").alias("_c"))
        w = Window.orderBy(c).rowsBetween(Window.unboundedPreceding, -1)
        return counts.select(
            c,
            (
                2 * F.coalesce(F.sum("_c").over(w), F.lit(0))
                + F.col("_c") + 1
            ).cast("decimal(38,0)").alias(out),
        )
    withr = (
        pairs.join(dranks("x", "rx"), "x")
        .join(dranks("y", "ry"), "y")
    )
    s = withr.agg(
        F.count("*").cast("decimal(38,0)").alias("n"),
        F.sum("rx").alias("sx"),
        F.sum("ry").alias("sy"),
        F.sum(F.col("rx") * F.col("ry")).alias("sxy"),
        F.sum(F.col("rx") * F.col("rx")).alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    vx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    vy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return s.select(
        F.col("n").cast("long").alias("n"),
        F.when(
            (vx > 0) & (vy > 0),
            F.round(num / (F.sqrt(vx) * F.sqrt(vy)), 6),
        ).alias("rho"),
    )


def rank_biased_overlap(
    a: DataFrame,
    b: DataFrame,
    item_col: str = "vertex",
    score_col: str = "score",
    p: float = 0.9,
    depth: int = 50,
) -> DataFrame:
    """Truncated rank-biased overlap (Webber et al., TOIS 2010) between
    two rankings — THE comparison metric for top-weighted lists (how
    similar are PageRank and TrustRank orderings? did the incremental
    recompute preserve the head?). Ranks are taken by (score desc, item
    asc) — deterministic under ties; RBO@depth = (1-p)·Σ_{d=1..D}
    p^(d-1)·|A_d ∩ B_d|/d, computed without materializing prefixes: an
    item contributes to every d >= max(rank_a, rank_b), so the overlap
    curve is one cumulative count over the joined rank table crossed
    with the tiny depth table (≤ depth² rows). Returns one row
    (depth, p, rbo).

    Scale: two top-``depth`` rank windows (global k-heaps at
    TakeOrdered size — depth is small by definition) + one item join;
    nothing corpus-sized past the windows.
    """
    from pyspark.sql import Window

    def top(df: DataFrame, rank_name: str) -> DataFrame:
        w = Window.orderBy(F.desc(score_col), F.asc(item_col))
        return (
            df.withColumn(rank_name, F.row_number().over(w))
            .filter(F.col(rank_name) <= depth)
            .select(F.col(item_col).alias("item"), rank_name)
        )

    joined = top(a, "ra").join(top(b, "rb"), "item").select(
        F.greatest("ra", "rb").alias("m")
    )
    spark = a.sparkSession
    depths = spark.range(1, depth + 1).select(F.col("id").cast("int").alias("d"))
    xd = (
        depths.crossJoin(joined)
        .groupBy("d")
        .agg(F.sum((F.col("m") <= F.col("d")).cast("int")).alias("x"))
    )
    term = (
        F.pow(F.lit(float(p)), F.col("d") - 1) * F.col("x") / F.col("d")
    )
    return (
        depths.join(xd, "d", "left")
        .select(F.coalesce("x", F.lit(0)).alias("x"), "d")
        .agg(
            F.lit(depth).alias("depth"),
            F.round(F.lit(float(p)), 6).alias("p"),
            F.round((1.0 - p) * F.sum(term), 6).alias("rbo"),
        )
    )


def ndcg_at_k(
    ranking: DataFrame,
    relevance: DataFrame,
    k: int = 20,
    item_col: str = "doc_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
) -> DataFrame:
    """NDCG@k — the graded ranking-quality metric: DCG over the system's
    top-k (rel / log2(rank+1)) normalized by the ideal DCG over the
    corpus-wide top-k relevances (ties -> lowest item id, so both sides
    are deterministic). Returns one row (k, dcg, idcg, ndcg); ndcg NULL
    when no item in the corpus is relevant.

    Scale: the ideal ranking is a global k-heap over the relevance table
    (TakeOrdered, never a full sort); the DCG side joins the tiny ranked
    list to relevance on the item id. Evaluate retrieval (BM25, rank
    selection) without leaving the engine.
    """
    from pyspark.sql import Window

    ranked = ranking.filter(F.col(rank_col) <= k).select(
        F.col(item_col).alias("item"), F.col(rank_col).alias("r")
    )
    rel = relevance.select(
        F.col(item_col).alias("item"), F.col(rel_col).cast("double").alias("rel")
    )
    dcg = (
        ranked.join(rel, "item", "left")
        .select(
            (F.coalesce("rel", F.lit(0.0)) / F.log2(F.col("r") + 1)).alias("g")
        )
        .agg(F.coalesce(F.sum("g"), F.lit(0.0)).alias("dcg"))
    )
    iw = Window.orderBy(F.desc("rel"), F.asc("item"))
    idcg = (
        rel.withColumn("r", F.row_number().over(iw))
        .filter((F.col("r") <= k) & (F.col("rel") > 0))
        .select((F.col("rel") / F.log2(F.col("r") + 1)).alias("g"))
        .agg(F.sum("g").alias("idcg"))
    )
    return dcg.crossJoin(idcg).select(
        F.lit(k).alias("k"),
        F.round("dcg", 6).alias("dcg"),
        F.round("idcg", 6).alias("idcg"),
        F.round(
            F.when(F.col("idcg") > 0, F.col("dcg") / F.col("idcg")), 6
        ).alias("ndcg"),
    )
