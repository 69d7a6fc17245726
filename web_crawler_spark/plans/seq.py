"""Two-phase deterministic global sequence assignment (scale-safe).

A global ``row_number()`` over an unpartitioned window funnels every row
through ONE task — fine at validation scale, fatal when one round's
discoveries are billions of rows (the 10^10-frontier target). When the
target ordering admits a MONOTONE bucketing — bucket(a) <= bucket(b)
whenever row a sorts before row b — a dense global sequence can be
assigned fully in parallel:

  phase 1: ``row_number()`` partitioned BY BUCKET (parallel window, one
           shuffle on the bucket key);
  phase 2: per-bucket counts (one aggregate whose output is at most the
           bucket count — a sizing constant, not the data size) are
           packed into ONE sorted array, exclusive-prefix-summed with
           JVM array expressions (no window at all), and broadcast-
           joined back as per-bucket start offsets.

The prefix pass is O(B²) element additions inside codegen over the
B-entry count array; callers size B (bucket granularity) in the low
thousands, where that is microseconds. Nothing in the pipeline ever
sees an unpartitioned window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_running_total(
    df: DataFrame,
    order_col: str,
    val_col: str,
    out_col: str,
) -> DataFrame:
    """Inclusive prefix sum of ``val_col`` over rows ordered by the
    unique ``order_col`` — windowless (same packed-array fold as the
    offset pass below), for small keyed frames like per-round metric
    rollups where an unpartitioned running-sum window would be the lazy
    choice."""
    packed = df.agg(
        F.array_sort(
            F.collect_list(F.struct(F.col(order_col), F.col(val_col).alias("_v")))
        ).alias("_arr")
    )
    sums = (
        packed.select(
            F.explode(
                F.transform(
                    F.col("_arr"),
                    lambda x, i: F.struct(
                        x[order_col].alias(order_col),
                        F.aggregate(
                            F.slice(F.col("_arr"), F.lit(1), i + 1),
                            F.lit(0).cast("long"),
                            lambda acc, y: acc + y["_v"],
                        ).alias(out_col),
                    ),
                )
            ).alias("_s")
        )
        .select("_s.*")
    )
    return df.join(F.broadcast(sums), order_col)


def with_global_seq(
    df: DataFrame,
    bucket_cols: list[str],
    order_cols: list[str],
    out_col: str,
    start: int = 0,
) -> DataFrame:
    """Add ``out_col`` = dense global sequence ``start..start+n-1`` over
    ``df`` ordered by (*bucket_cols, *order_cols) lexicographically.

    Contract: ``bucket_cols`` must be a monotone coarsening of the global
    order (rows in a lower bucket all sort before rows in a higher one)
    and ``(*bucket_cols, *order_cols)`` must totally order the rows —
    both hold for every engine call site (sequence counters are unique).
    """
    w_in = Window.partitionBy(*bucket_cols).orderBy(*order_cols)
    counts = df.groupBy(*bucket_cols).agg(F.count("*").alias("_bn"))
    # pack the <= B count rows into one sorted array; bucket keys lead
    # the struct so array_sort orders buckets lexicographically (keys
    # are unique post-groupBy, _bn never decides)
    packed = counts.agg(
        F.array_sort(
            F.collect_list(F.struct(*[F.col(c) for c in bucket_cols], F.col("_bn")))
        ).alias("_arr")
    )
    # exclusive prefix sum, windowless: element i's offset = sum of the
    # first i counts (slice is 1-based; transform's index is 0-based)
    offs = (
        packed.select(
            F.explode(
                F.transform(
                    F.col("_arr"),
                    lambda x, i: F.struct(
                        *[x[c].alias(c) for c in bucket_cols],
                        F.aggregate(
                            F.slice(F.col("_arr"), F.lit(1), i),
                            F.lit(0).cast("long"),
                            lambda acc, y: acc + y["_bn"],
                        ).alias("_boff"),
                    ),
                )
            ).alias("_s")
        )
        .select("_s.*")
    )
    return (
        df.withColumn("_brn", F.row_number().over(w_in))
        .join(F.broadcast(offs), bucket_cols)
        .selectExpr(
            "* EXCEPT (_brn, _boff)",
            f"cast(_brn - 1 + _boff + {int(start)} AS long) AS {out_col}",
        )
    )


def with_global_prefix_sum(
    df: DataFrame,
    bucket_cols: list[str],
    order_cols: list[str],
    val_col: str,
    out_col: str,
    start: int = 0,
) -> DataFrame:
    """Add ``out_col`` = EXCLUSIVE global prefix sum of ``val_col`` over
    ``df`` ordered by (*bucket_cols, *order_cols) — with_global_seq
    generalized from counting rows to summing a value (the row-count
    case is val_col = 1). Same contract: bucket_cols must be a monotone
    coarsening of the order and the full key must totally order rows;
    same two-phase shape: a bucket-partitioned running-sum window, then
    per-bucket totals packed into one sorted array, exclusive-prefix-
    summed windowlessly, and broadcast-joined back. Used by sequence
    packing (pipeline_ops.pack_sequences_df), where the running token
    total over billions of docs must never funnel through one task."""
    w_in = Window.partitionBy(*bucket_cols).orderBy(*order_cols)
    local = df.withColumn(
        "_lps",
        F.sum(val_col).over(w_in).cast("long") - F.col(val_col).cast("long"),
    )
    totals = df.groupBy(*bucket_cols).agg(
        F.sum(F.col(val_col).cast("long")).alias("_bn"))
    packed = totals.agg(
        F.array_sort(
            F.collect_list(F.struct(*[F.col(c) for c in bucket_cols], F.col("_bn")))
        ).alias("_arr")
    )
    offs = (
        packed.select(
            F.explode(
                F.transform(
                    F.col("_arr"),
                    lambda x, i: F.struct(
                        *[x[c].alias(c) for c in bucket_cols],
                        F.aggregate(
                            F.slice(F.col("_arr"), F.lit(1), i),
                            F.lit(0).cast("long"),
                            lambda acc, y: acc + y["_bn"],
                        ).alias("_boff"),
                    ),
                )
            ).alias("_s")
        )
        .select("_s.*")
    )
    return (
        local.join(F.broadcast(offs), bucket_cols)
        .withColumn(out_col, F.col("_lps") + F.col("_boff") + F.lit(start))
        .drop("_lps", "_boff")
    )
