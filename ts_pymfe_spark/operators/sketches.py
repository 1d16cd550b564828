"""Mergeable distinct-count sketches (HyperLogLog) with md5-derived
registers, pure Spark SQL end to end.

Engine addition (no reference counterpart — the reference computes
nothing cardinality-shaped): at 100 TB "distinct users per day/tier"
via ``count(distinct)`` shuffles every distinct value; the HLL sketch
shuffles at most ``groups x 2^p`` (register, max_rho) pairs no matter
how many rows scanned, and the register table itself is a mergeable,
storable artifact (max per register — the same merge-on-read shape the
tier store uses for moments).

Determinism contract: the hash is the first 8 hex chars (32 bits) of
``md5(salt | value)`` — no JVM/process-seeded hashing — so the sketch,
its merge, and the estimate are pure functions of the input set and
exactly reproducible in any engine with md5 (the DuckDB oracle runs
the identical pipeline).  Estimator is classic Flajolet et al. HLL:
``alpha_m * m^2 / sum_j 2^(-M_j)`` with the small-range linear-counting
correction (E <= 2.5 m and empty registers present -> m * ln(m/V)).

Float-exactness note (why the group sums hash cross-engine): each
``2^(-M_j)`` is a binary fraction in [2^-(33-p), 2^-1] and a group sum
has <= 2^p terms, so every partial sum spans < 53 bits and is EXACT in
double regardless of Spark's aggregation order.  Only ``ln`` in the
linear-counting branch is transcendental; the contract rounds to 6
decimals on both engines.
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _alpha(m: int) -> float:
    # Flajolet et al. 2007 bias constant (m >= 128 form).
    return 0.7213 / (1.0 + 1.079 / m)


def hll_sketch(df: DataFrame, keys: Sequence[str], value_col: str,
               p: int = 10, salt: str = "hll") -> DataFrame:
    """Per-group HLL register table: (keys..., register, max_rho).

    One exchange of (keys, register) rows with a map-side partial max
    — the shuffle is O(groups x 2^p) regardless of input rows.  Null
    values are ignored (SQL count-distinct convention).
    """
    if not 4 <= p <= 16:
        raise ValueError(f"p={p} outside [4, 16]")
    suffix_bits = 32 - p
    mask = (1 << suffix_bits) - 1
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt + "|"),
                           F.col(value_col).cast("string"))),
            1, 8),
        16, 10,
    ).cast("long")
    suffix = h.bitwiseAND(F.lit(mask))
    rho = (
        F.when(suffix == 0, F.lit(suffix_bits + 1))
        .otherwise(F.instr(F.lpad(F.bin(suffix), suffix_bits, "0"), "1"))
        .cast("int")
    )
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(*keys,
                F.shiftright(h, suffix_bits).cast("int").alias("register"),
                rho.alias("rho"))
        .groupBy(*keys, "register")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_merge(*sketches: DataFrame) -> DataFrame:
    """Merge register tables (same keys/p): max per (keys, register).

    This is the scale story: daily sketches persist as tiny tables and
    any date-range / rollup union re-aggregates with max — no re-scan
    of raw data (same merge-on-read contract as the moment tiers).
    """
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    keys = [c for c in out.columns if c not in ("register", "max_rho")]
    return (out.groupBy(*keys, "register")
            .agg(F.max("max_rho").alias("max_rho")))


def hll_estimate(sketch: DataFrame, keys: Sequence[str],
                 p: int = 10) -> DataFrame:
    """Cardinality estimate from a register table.

    -> (keys..., registers_used, est_distinct) where est_distinct is
    rounded to 6 decimals (the only transcendental is the
    linear-counting ``ln``).
    """
    m = 1 << p
    alpha = _alpha(m)
    used = F.count("*")
    # unseen registers hold rho=0 and contribute 2^0 = 1 each
    s_all = (F.lit(float(m)) - used.cast("double")
             + F.sum(F.pow(F.lit(2.0), -F.col("max_rho"))))
    raw = F.lit(alpha * m * m) / s_all
    v = F.lit(m) - used  # empty-register count
    est = F.when((raw <= F.lit(2.5 * m)) & (v > 0),
                 F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double"))
                 ).otherwise(raw)
    return (sketch.groupBy(*keys)
            .agg(used.cast("long").alias("registers_used"),
                 (F.round(est, 6) + F.lit(0.0)).alias("est_distinct")))


def hll_distinct(df: DataFrame, keys: Sequence[str], value_col: str,
                 p: int = 10, salt: str = "hll") -> DataFrame:
    """Sketch + estimate in one call (two tiny exchanges: the register
    partial-max, then the O(groups x 2^p) estimate agg)."""
    return hll_estimate(hll_sketch(df, keys, value_col, p, salt), keys, p)


def hll_error_bound(p: int = 10) -> float:
    """Published relative standard error 1.04 / sqrt(m)."""
    return 1.04 / math.sqrt(1 << p)


def heavy_hitters(df: DataFrame, keys: Sequence[str], value_col: str,
                  k: int = 5) -> DataFrame:
    """Exact per-group top-k values by frequency, deterministic
    tiebreak (count desc, value asc).  Nulls are excluded (their
    asc-ordering differs across engines).

    -> (keys..., value, cnt, rank), rank 1..k.

    Scale shape: the count stage shuffles O(distinct (keys, value))
    with a map-side partial — never raw rows; the rank window then
    re-shuffles only those counts by the group keys.  (Partitioning by
    (keys, value) cannot serve a keys-only window — the subset rule
    runs the other way — so the second, tiny exchange is the honest
    cost of exact top-k.)
    """
    from pyspark.sql import Window

    counts = (df.filter(F.col(value_col).isNotNull())
              .groupBy(*keys, value_col)
              .agg(F.count("*").cast("long").alias("cnt")))
    w = Window.partitionBy(*keys).orderBy(
        F.col("cnt").desc(), F.col(value_col).asc())
    return (counts.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def hll_rolling(sketch: DataFrame, day_col: str = "day",
                window_days: int = 7, p: int = 10) -> DataFrame:
    """Trailing-N-day distinct estimate per day from DAILY sketches —
    the killer mergeability demo: a 7-day sliding distinct costs 7
    sketch merges (each O(2^p) rows), never 7 re-scans of raw data.

    Each (day, register, rho) row is exploded to the ``window_days``
    future days it influences, max-merged per (day, register), and
    estimated; output days are restricted to days that actually occur
    in the input sketch (no phantom tail after the last day).

    ``day_col`` must be a DATE column.
    """
    keys = [c for c in sketch.columns if c not in ("register", "max_rho")]
    if day_col not in keys:
        raise ValueError(f"{day_col} not in sketch keys {keys}")
    fan = (
        sketch.select(
            "*",
            F.explode(F.sequence(F.lit(0), F.lit(window_days - 1)))
            .alias("_i"))
        .withColumn(day_col, F.date_add(F.col(day_col), F.col("_i")))
        .drop("_i")
    )
    merged = fan.groupBy(*keys, "register").agg(
        F.max("max_rho").alias("max_rho"))
    days = sketch.select(day_col).distinct()
    merged = merged.join(F.broadcast(days), day_col, "left_semi")
    return hll_estimate(merged, keys, p)


def hll_overlap(sketch: DataFrame, day_col: str = "day",
                p: int = 10) -> DataFrame:
    """Day-over-day set overlap from sketches alone
    (inclusion-exclusion): |A ∩ B| ≈ est(A) + est(B) − est(A ∪ B),
    with est(A ∪ B) the max-merge of the two register tables — the
    sketch-only form of day-over-day retained-users, no raw re-scan.

    Collect-free: the pairwise union per day IS ``hll_rolling`` with a
    2-day window; the previous day's single estimate joins in via a
    ``date_add`` shift.  One row per day whose literal predecessor day
    is present in the sketch.

    -> (day, est_prev, est_cur, est_union, est_overlap)
    """
    singles = hll_estimate(sketch, [day_col], p)
    cur = singles.select(F.col(day_col).alias("day"),
                         F.col("est_distinct").alias("est_cur"))
    prv = singles.select(F.date_add(F.col(day_col), 1).alias("day"),
                         F.col("est_distinct").alias("est_prev"))
    un = hll_rolling(sketch, day_col, window_days=2, p=p).select(
        F.col(day_col).alias("day"),
        F.col("est_distinct").alias("est_union"))
    return (cur.join(prv, "day").join(un, "day")
            .select("day", "est_prev", "est_cur", "est_union",
                    (F.round(F.col("est_prev") + F.col("est_cur")
                             - F.col("est_union"), 6) + F.lit(0.0))
                    .alias("est_overlap")))


# ---------------------------------------------------------------------------
# Count-min sketch (Cormode & Muthukrishnan 2005): mergeable frequency
# counters, the companion to HLL's mergeable cardinality registers.
# ---------------------------------------------------------------------------

#: Mersenne prime 2^61-1 — the same modulus discipline as the minhash
#: permutations (textpipe.MINHASH_P): a_i < 2^22 times a 40-bit hash
#: stays below 2^62, so no BIGINT overflow on any engine and the
#: DuckDB oracle reproduces every bucket bit-exactly.
CMS_P = (1 << 61) - 1


def cms_coef(which: str, i: int) -> int:
    """md5-derived row-hash coefficient in [1, 2^22-1]:
    hex2int(md5("cms{which}:{i}")[:8]) % (2^22-1) + 1 — model
    parameters, same philosophy as the minhash permutations / LSH
    hyperplanes."""
    import hashlib

    h = int(hashlib.md5(f"cms{which}:{i}".encode()).hexdigest()[:8], 16)
    return (h % ((1 << 22) - 1)) + 1


def _cms_bucket(x: F.Column, i: int, w: int) -> F.Column:
    return ((F.lit(cms_coef("a", i)) * x + F.lit(cms_coef("b", i)))
            % F.lit(CMS_P)) % F.lit(w)


def cms_sketch(df: DataFrame, value_col: str, d: int = 4,
               w: int = 2048) -> DataFrame:
    """Count-min sketch of a column: a (row, bucket, cnt) counter
    table, ``d`` pairwise-independent-style rows x ``w`` buckets.
    Each value hashes once via md5 (40-bit prefix) then through ``d``
    linear row hashes mod 2^61-1 mod ``w``.

    Mergeable: counters SUM — union two sketch tables and re-aggregate
    (``cms_merge``), the same merge-on-read shape as the HLL register
    and tier moment stores.

    Scale shape: the explode is narrow (d rows per input, d is 4);
    the single exchange carries at most d*w counter rows per map task
    after partial aggregation — O(1) in the input size, by
    construction.  NULL values are skipped (no hash to take).
    """
    x = F.conv(F.substring(F.md5(F.col(value_col).cast("string")), 1, 10),
               16, 10).cast("long")
    pairs = (df.where(F.col(value_col).isNotNull())
             .select(F.posexplode(
                 F.array(*[_cms_bucket(x, i, w) for i in range(d)]))
                 .alias("row", "bucket")))
    return pairs.groupBy("row", "bucket").agg(
        F.count("*").alias("cnt"))


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Sum-merge counter tables built with the same (d, w)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(sketch: DataFrame, candidates: DataFrame,
                 value_col: str, d: int = 4, w: int = 2048) -> DataFrame:
    """Point-query a sketch for each candidate value: est = min over
    the d rows of the candidate's bucket counter (missing bucket =
    0).  CMS guarantees est >= true count, with overshoot bounded by
    (e/w) * total across all rows per row-hash.

    Scale shape: the sketch is at most d*w rows — a true constant —
    so it BROADCASTS to the candidates; the only exchange is the
    per-candidate min-aggregation (d rows each).

    -> (value_col, est_count)
    """
    x = F.conv(F.substring(F.md5(F.col(value_col).cast("string")), 1, 10),
               16, 10).cast("long")
    cand = candidates.select(
        value_col,
        F.posexplode(F.array(*[_cms_bucket(x, i, w) for i in range(d)]))
        .alias("row", "bucket"))
    joined = cand.join(F.broadcast(sketch), ["row", "bucket"], "left")
    return (joined.groupBy(value_col)
            .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0)))
                 .alias("est_count")))


def cms_topk(df: DataFrame, value_col: str, k: int = 20, d: int = 4,
             w: int = 2048) -> DataFrame:
    """Heavy hitters by count-min estimate: build the sketch, query it
    for every distinct value, keep the top ``k`` (est desc, value asc
    deterministic ties).  At 100 TB the sketch half is the stored
    artifact (O(d*w) no matter the scan); the candidate half is
    whatever cheaper/later pass supplies plausible keys — here the
    distinct values themselves, an O(distinct) exchange the EXACT
    counter would also pay, but the sketch never rescans history when
    candidates change.

    -> (value_col, est_count), k rows.
    """
    sk = cms_sketch(df, value_col, d, w)
    cand = df.where(F.col(value_col).isNotNull()).select(value_col).distinct()
    est = cms_estimate(sk, cand, value_col, d, w)
    return (est.orderBy(F.desc("est_count"), F.asc(value_col))
            .limit(k))
