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
           prefix-summed into per-bucket start offsets and broadcast-
           joined back.

The only ordered pass runs over the per-bucket COUNT frame; it is
partitioned by a literal so the provably-tiny frame never trips
WindowExec's unpartitioned-window path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


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
    # exclusive prefix sum over <= n_buckets rows (bucket keys are unique
    # post-groupBy, so the running sum is well-defined without a frame)
    w_off = Window.partitionBy(F.lit(0)).orderBy(*bucket_cols)
    offs = (
        counts.withColumn("_boff", F.sum("_bn").over(w_off) - F.col("_bn"))
        .drop("_bn")
    )
    return (
        df.withColumn("_brn", F.row_number().over(w_in))
        .join(F.broadcast(offs), bucket_cols)
        .withColumn(
            out_col,
            (F.col("_brn") - 1 + F.col("_boff") + F.lit(start)).cast("long"),
        )
        .drop("_brn", "_boff")
    )
