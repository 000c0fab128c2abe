"""Distributed probabilistic sketches: Count-Min, Bloom, HyperLogLog,
Misra-Gries — the classic mergeable-summary quartet, re-expressed as pure
DataFrame plans over deterministic sha256 bucket hashes.

Lineage: the reference's research family estimates neighborhood sizes with
Flajolet-Martin bit-string sketches (HADI, Kang et al. 2011 — same group as
FlexGraph; cf. the in-repo effective-closeness operator over HADI sketches
in algorithms.py). This module generalizes that one sketch into the family
a 100 TB corpus pipeline actually needs: frequency estimation (Count-Min,
Cormode & Muthukrishnan 2005), membership screens (Bloom 1970), distinct
counting (HyperLogLog, Flajolet et al. 2007) and deterministic heavy
hitters (Misra & Gries 1982, merged per Agarwal et al. 2013's mergeable
summaries).

Design rules shared by every sketch here:

- **Deterministic hashing.** Every bucket index derives from
  ``sha256(salt ':' value)`` through :func:`sha_long` — no JVM hash seeds,
  no RNG state. The SQL oracle replays the exact same buckets with DuckDB's
  ``('0x' || substr(sha256(..), 1, 15))::bigint``, so Count-Min counters,
  Bloom bit positions, and HLL registers are *bit-identical* between the
  Spark plan and the oracle: these are fully gate-able, not rows-only.
- **Bounded shuffle.** Each build is one explode + one aggregation whose
  map-side partial combine caps the shuffled rows at (sketch size ×
  partitions), independent of input row count. The finished sketch is at
  most a few thousand rows — always broadcastable to the probe side.
- **No driver round-trips.** Estimates (including HLL's bias-corrected
  formula with its linear-counting branch) are computed as column
  expressions on 1-row aggregates, never via ``collect()``-then-decide.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Column, functions as F


# ---------------------------------------------------------------------------
# Deterministic 60-bit hashing (engine/oracle-portable)


def sha_long(col: Column, salt: str) -> Column:
    """Uniform 60-bit non-negative integer from ``sha256(salt ':' value)``.

    15 hex chars = 60 bits < 2^63, so the cast never overflows (ANSI-safe).
    DuckDB replays it exactly:
    ``('0x' || substr(sha256(salt || ':' || v), 1, 15))::bigint``.
    """
    preimage = F.concat_ws(":", F.lit(salt), col.cast("string"))
    return F.conv(F.substring(F.sha2(preimage, 256), 1, 15), 16, 10).cast("long")


def sha_bucket(col: Column, salt: str, modulus: int) -> Column:
    """``sha_long(col, salt) % modulus`` — hash is non-negative, so ``%``
    and ``pmod`` coincide on both engines."""
    return sha_long(col, salt) % F.lit(modulus)


def _sha_long_sql(expr: str, salt: str) -> str:
    """The DuckDB replay of :func:`sha_long` (oracle-builder helper)."""
    return f"('0x' || substr(sha256('{salt}:' || {expr}), 1, 15))::bigint"


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005)


def count_min_build(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 2048,
    count_col: str | None = None,
) -> DataFrame:
    """Build a depth × width Count-Min sketch of ``key_col`` frequencies.

    Returns the counter table ``(row, bucket, counter)`` — at most
    depth × width rows regardless of input size. Each input key increments
    one bucket per row, hashed with row-salted sha256 (salt ``cm{row}``),
    so independent rows see independent collisions.

    Scale shape: one explode (×depth) + one count aggregation. The
    map-side partial combine caps the shuffle at depth × width rows per
    map task — the sketch build costs one pass over the data and a
    constant-size shuffle, the property that makes CM viable at 100 TB.
    Guarantee: est ≥ true, and est ≤ true + 2N/width with prob ≥
    1 − (1/2)^depth per query (N = total count).
    """
    rb = F.array(
        *[
            F.struct(
                F.lit(d).alias("row"),
                sha_bucket(F.col(key_col), f"cm{d}", width).alias("bucket"),
            )
            for d in range(depth)
        ]
    )
    weight = (
        F.col(count_col).cast("long") if count_col is not None else F.lit(1).cast("long")
    )
    return (
        df.select(F.explode(rb).alias("rb"), weight.alias("c"))
        .groupBy(F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
        .agg(F.sum("c").alias("counter"))
    )


def count_min_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 2048,
) -> DataFrame:
    """Point-query the sketch for every row of ``keys``: min over the
    depth row-counters, 0 for never-seen buckets.

    The counter table is ≤ depth × width rows by construction, so it is
    broadcast to the (arbitrarily large) key side — the probe is a
    map-only stage plus one per-key min."""
    kb = keys.select(
        F.col(key_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("row"),
                        sha_bucket(F.col(key_col), f"cm{d}", width).alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("rb"),
    ).select(key_col, "rb.row", "rb.bucket")
    return (
        kb.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("counter"), F.lit(0))).alias("cm_est"))
    )


# ---------------------------------------------------------------------------
# Bloom filter (Bloom 1970)


def bloom_build(
    df: DataFrame, key_col: str, num_bits: int = 1 << 16, num_hashes: int = 5
) -> DataFrame:
    """Build a Bloom filter as the table of occupied bit positions.

    Returns ``(pos)`` distinct rows (≤ num_bits). Representing the filter
    as a position *table* instead of a packed bitmap keeps it a pure
    DataFrame (joinable, oracle-replayable); at the default 2^16 bits the
    broadcast is ≤ 0.5 MB, and a production screen sizes num_bits ≈
    1.44 · n · log2(1/fp) the usual way.
    """
    pos = F.array(
        *[sha_bucket(F.col(key_col), f"bf{i}", num_bits) for i in range(num_hashes)]
    )
    return df.select(F.explode(pos).alias("pos")).distinct()


def bloom_probe(
    bloom: DataFrame,
    probes: DataFrame,
    key_col: str,
    num_bits: int = 1 << 16,
    num_hashes: int = 5,
) -> DataFrame:
    """Membership screen: ``maybe_present`` per probe key.

    Bloom guarantee (gate-able): no false negatives — every key that was
    inserted probes True. The filter table is broadcast; the probe is one
    map-side explode + broadcast join + per-key AND."""
    kb = probes.select(
        F.col(key_col),
        F.explode(
            F.array(
                *[
                    sha_bucket(F.col(key_col), f"bf{i}", num_bits)
                    for i in range(num_hashes)
                ]
            )
        ).alias("pos"),
    )
    marked = kb.join(
        F.broadcast(bloom.withColumn("_hit", F.lit(1))), ["pos"], "left"
    )
    return marked.groupBy(key_col).agg(
        (F.count("_hit") == F.lit(num_hashes)).alias("maybe_present")
    )


# ---------------------------------------------------------------------------
# HyperLogLog (Flajolet, Fusy, Gandouet, Meunier 2007)

_HLL_HASH_BITS = 60  # sha_long width


def _hll_alpha(m: int) -> float:
    if m >= 128:
        return 0.7213 / (1.0 + 1.079 / m)
    return {16: 0.673, 32: 0.697, 64: 0.709}[m]


def hll_registers(
    df: DataFrame,
    key_col: str,
    precision: int = 10,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """HLL register table: ``(group_cols..., bucket, m)`` with
    m = max rank observed in the bucket.

    The 60-bit sha hash splits into ``precision`` low bits (bucket index)
    and the remaining ``60 - precision`` bits; the rank ρ is the position
    of the leftmost 1-bit in the remainder (1-based), ``avail + 1`` when
    the remainder is zero. Both the split and ρ are integer-exact on both
    engines (ρ via ``length(bin(x))`` / ``length(to_base(x, 2))``), so
    the register table is bit-identical to the oracle's replay.

    Scale shape: one hash projection + one max-aggregation; map-side
    combine caps the shuffle at m = 2^precision rows per (group ×
    partition). Distinct-counting a 100 TB column costs one scan and a
    2^precision-row result."""
    m = 1 << precision
    avail = _HLL_HASH_BITS - precision
    h = sha_long(F.col(key_col), "hll")
    bucket = (h % F.lit(m)).alias("bucket")
    rem = F.shiftright(h, precision)
    rho = (
        F.when(rem == 0, F.lit(avail + 1))
        .otherwise(F.lit(avail) - (F.length(F.bin(rem)) - F.lit(1)))
        .alias("rho")
    )
    gcols = list(group_cols or [])
    return (
        df.select(*gcols, bucket, rho)
        .groupBy(*gcols, "bucket")
        .agg(F.max("rho").alias("m"))
    )


def hll_estimate(
    registers: DataFrame,
    precision: int = 10,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Bias-corrected HLL cardinality estimate per group, as a pure
    aggregate plan (no driver branch).

    raw = α_m · m² / Σ 2^(−M_j) with empty registers contributing 2^0 = 1
    (the register table stores only non-empty buckets; the Σ adds
    ``m − count`` for the missing ones). Small-range correction: when
    raw ≤ 2.5·m and zero registers exist, fall back to linear counting
    m·ln(m/V). The large-range correction is unnecessary at 60 hash bits.
    """
    m = 1 << precision
    alpha = _hll_alpha(m)
    gcols = list(group_cols or [])
    agg = registers.groupBy(*gcols).agg(
        F.count(F.lit(1)).alias("_filled"),
        F.sum(F.pow(F.lit(2.0), -F.col("m"))).alias("_sum_inv"),
    )
    zeros = F.lit(m) - F.col("_filled")
    sum_inv = F.col("_sum_inv") + zeros.cast("double")
    raw = F.lit(alpha * m * m) / sum_inv
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(raw)
    return agg.select(*gcols, est.alias("hll_est"))


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters (Misra & Gries 1982 / Agarwal et al. 2013 merge)


def misra_gries(
    df: DataFrame, key_col: str, k: int = 64, count_col: str | None = None
) -> DataFrame:
    """Deterministic heavy hitters: ≤ k keys with underestimated counts
    ``mg_est``, guaranteeing every key with true frequency > N/(k+1)
    survives (N = total weight).

    Two-level mergeable-summary plan (Agarwal et al. 2013, thm. on MG
    mergeability): (1) each partition builds a local MG summary of ≤ k
    counters inside ``mapInPandas`` — Arrow-batched ``value_counts`` per
    batch, compacted by subtracting the (k+1)-th largest counter whenever
    the dict exceeds 8k entries (a self-merge, same error bound); (2) the
    ≤ k·partitions summary rows are summed per key, then the global
    (k+1)-th largest summed counter is subtracted from every key
    (broadcast 1-row offset — no driver round-trip) and non-positive
    rows are dropped.

    The surviving set depends only on true frequencies up to the N/(k+1)
    error bound — the *guaranteed* members are partitioning-independent,
    which is what the driver gate checks (sketch output must contain every
    2N/(k+1)-frequent key); borderline members may vary with partitioning,
    as with any MG deployment."""
    import pandas as pd  # noqa: F401 — mapInPandas contract

    weight_col = count_col

    def summarize(batches):
        from collections import Counter

        import pandas as pd

        cnt: Counter = Counter()
        cap = 8 * k
        for pdf in batches:
            if weight_col is None:
                vc = pdf[key_col].value_counts()
            else:
                vc = pdf.groupby(key_col, sort=False)[weight_col].sum()
            cnt.update(vc.to_dict())
            if len(cnt) > cap:
                # self-merge compaction: subtract the (k+1)-th largest,
                # keep positive (error bound preserved per Agarwal et al.)
                vals = sorted(cnt.values(), reverse=True)
                off = vals[k] if len(vals) > k else 0
                cnt = Counter(
                    {kk: v - off for kk, v in cnt.items() if v - off > 0}
                )
        if len(cnt) > k:
            vals = sorted(cnt.values(), reverse=True)
            off = vals[k]
            cnt = Counter({kk: v - off for kk, v in cnt.items() if v - off > 0})
        yield pd.DataFrame(
            {key_col: list(cnt.keys()), "c": [int(v) for v in cnt.values()]}
        )

    key_type = dict(df.dtypes)[key_col]
    cols = [key_col] if weight_col is None else [key_col, weight_col]
    partials = df.select(*cols).mapInPandas(
        summarize, schema=f"`{key_col}` {key_type}, c long"
    )
    summed = partials.groupBy(key_col).agg(F.sum("c").alias("c"))
    # global merge offset: the (k+1)-th largest summed counter (0 when
    # fewer than k+1 keys survive the partials)
    kth = (
        summed.orderBy(F.desc("c"), F.col(key_col))
        .limit(k + 1)
        .agg(
            F.when(F.count(F.lit(1)) > k, F.min("c")).otherwise(F.lit(0)).alias("_off")
        )
    )
    adjusted = summed.crossJoin(F.broadcast(kth)).select(
        key_col, (F.col("c") - F.col("_off")).alias("mg_est")
    )
    return adjusted.where(F.col("mg_est") > 0)
