"""Cardinality sketches: a deterministic HyperLogLog (Flajolet et al. 2007).

Beyond-reference operator for the 100 TB regime: exact `countDistinct` over
a high-cardinality key is a full shuffle of every distinct value; an HLL
register set is 128 longs per group, merges with `max`, and composes with
streaming state. Spark's built-in `approx_count_distinct` IS HLL++, but its
estimate is implementation-defined — this one is pinned to md5, so the
DuckDB twin (`oracle_extra.hll_distinct_sql`) reproduces it bit-for-bit and
the driver's value-hash gate applies to an approximate operator too.

Determinism contract (both engines evaluate the identical integer math):
hash h = first 15 hex chars of md5(key) as int64 (60 bits, the repo's
simhash hashing pattern); bucket j = h mod 128; w = h div 128 (53 bits);
rho = least(54 - bitlen(w), 29) — the leading-zero rank, capped at 29 so the
estimator product stays inside int64 (cap distorts nothing below ~10^8
distinct per bucket). Register M_j = max rho. Raw estimate
E = alpha_128 * m^2 / sum_j 2^-M_j with alpha scaled to ppm and the harmonic
sum cleared to the integer T = sum_present 2^(29-M_j) + (m-V) * 2^29:
E = (ALPHA_PPM * m^2 * 2^29) div T div 10^6. No small-range (linear
counting) correction — it needs a float ln; the emitted `n_exact` column
shows the raw-HLL error instead, and at sketch-relevant cardinalities the
correction is off anyway.

Scale shape: one map-side-combined max-aggregate on (group, bucket) — a
128-row-per-group shuffle regardless of input size — then a 128-row fold
per group. The exact column is for the parity display only; drop it at
production scale (it is the expensive full-distinct the sketch replaces).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

M = 128  # registers (2^7)
RHO_CAP = 29
ALPHA_PPM = 715270  # round(1e6 * 0.7213 / (1 + 1.079/128))


CM_D = 4    # hash rows
CM_W = 256  # counters per row


def countmin_cells(
    df: DataFrame, key_expr: str, d: int = CM_D, w: int = CM_W
) -> DataFrame:
    """(i, bucket, c): the d×w Count-Min cell table for ``df``'s keys —
    factored out so the STREAMING sketch reuses the identical cell build
    per micro-batch (cell tables are mergeable by (i, bucket) sum, the
    defining property that makes Count-Min a streaming structure)."""
    keyed = df.select(F.expr(key_expr).alias("k"))
    rows = keyed.select(
        "k", F.explode(F.expr(f"sequence(0, {d - 1})")).alias("i")
    ).select(
        "k", "i",
        F.expr(
            f"pmod(cast(conv(substr(md5(concat(i, ':', k)), 1, 15), 16, 10)"
            f" as bigint), {w})"
        ).alias("bucket"),
    )
    return rows.groupBy("i", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )


def countmin_heavy_hitters(
    df: DataFrame, key_expr: str, d: int = CM_D, w: int = CM_W
) -> DataFrame:
    """(key, n_exact, cm_estimate, over_pm): Count-Min sketch frequency
    estimates (Cormode & Muthukrishnan 2005) — the streaming-state-sized
    structure for heavy-hitter counting: ``d``×``w`` integer counters
    REGARDLESS of stream length; an item's estimate is the MIN over its
    ``d`` hashed counters (always an over-estimate — the ``over_pm`` column
    shows it against the exact count). Like ``hll_distinct``, the hashes
    are pinned to md5 so an APPROXIMATE structure passes the bit-exact
    cross-engine value-hash gate.

    Shape at scale: the sketch build explodes each item into its d rows
    (generator) and aggregates into ≤ d·w cells — a bounded-size shuffle at
    any volume, map-side combined; probes join the cell table back
    BROADCAST (it is ≤1024 rows by construction). The exact count exists
    for the parity display; production drops it (it is the full groupBy
    the sketch replaces).
    """
    keyed = df.select(F.expr(key_expr).alias("k"))
    cells = countmin_cells(df, key_expr, d, w)
    exact = keyed.groupBy("k").agg(F.count(F.lit(1)).cast("long").alias("n_exact"))
    probes = (
        exact.select("k")
        .select("k", F.explode(F.expr(f"sequence(0, {d - 1})")).alias("i"))
        .select(
            "k", "i",
            F.expr(
                f"pmod(cast(conv(substr(md5(concat(i, ':', k)), 1, 15), 16, 10)"
                f" as bigint), {w})"
            ).alias("bucket"),
        )
        .join(F.broadcast(cells), ["i", "bucket"])
        .groupBy("k")
        .agg(F.min("c").alias("cm_estimate"))
    )
    return exact.join(probes, "k").select(
        F.col("k").alias("key"),
        "n_exact",
        "cm_estimate",
        F.expr(
            "(cm_estimate - n_exact) * 1000000L div greatest(n_exact, 1L)"
        ).alias("over_pm"),
    )


def hll_distinct(df: DataFrame, group_col: str, key_col: str) -> DataFrame:
    """(group, n_exact, hll_estimate, err_pm): per-group distinct-count
    estimate from a 128-register md5 HyperLogLog, alongside the exact count
    and the absolute relative error in ppm (expected ~1.04/sqrt(128) = 9.2%
    for the raw estimator)."""
    hashed = df.select(
        F.col(group_col).alias("grp"),
        F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 15), 16, 10)
        .cast("long")
        .alias("h"),
    )
    regs = (
        hashed.select(
            "grp",
            F.expr(f"h % {M}").alias("j"),
            F.expr(f"least(54 - length(bin(h div {M})), {RHO_CAP})").alias("rho"),
        )
        .groupBy("grp", "j")
        .agg(F.max("rho").alias("m_j"))
    )
    folded = regs.groupBy("grp").agg(
        F.sum(F.expr(f"shiftleft(1L, {RHO_CAP} - m_j)")).alias("t_present"),
        F.count(F.lit(1)).alias("v"),
    )
    est = folded.select(
        "grp",
        F.expr(
            f"({ALPHA_PPM * M * M * (1 << RHO_CAP)}L"
            f" div (t_present + ({M} - v) * {1 << RHO_CAP}L)) div 1000000"
        ).alias("hll_estimate"),
    )
    exact = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.countDistinct(key_col).cast("long").alias("n_exact")
    )
    return (
        exact.join(est, "grp")
        .select(
            F.col("grp").alias(group_col),
            "n_exact",
            "hll_estimate",
            F.expr(
                "abs(hll_estimate - n_exact) * 1000000L div greatest(n_exact, 1)"
            ).alias("err_pm"),
        )
    )
