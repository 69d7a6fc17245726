"""T30: training-shard export — the terminal sink of the pipeline.

A pretraining dataloader consumes fixed-size shards in a deterministic
order; this module turns any keyed DataFrame (cleaned documents, the
crawl's kept image+caption rows) into exactly that: every row gets a
dense global position (curriculum order when a difficulty phase is
supplied, otherwise a pure deterministic md5 shuffle), positions map to
shards of ``shard_size`` rows, each shard is written as its own parquet
partition with rows in position order, and a manifest records per-shard
row counts, position ranges, and an order-insensitive content checksum.

Scale shape: positions come from the two-phase windowless global
sequence (plans/seq.py), the shard map is pure arithmetic on the
position (no extra shuffle beyond the one repartition that co-locates
each shard in a single task → one file per shard dir), and the
checksum is a bit_xor aggregate of a 60-bit md5 prefix — associative,
order-insensitive, overflow-free, and recomputable by any engine that
can read the shards back (the tests recompute it with DuckDB).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from web_crawler_spark.plans.pipeline_ops import curriculum_order_df

# 15 hex chars = 60 bits: fits a signed 64-bit int in every engine
# (conv returns a decimal STRING — cast explicitly, ANSI mode won't)
_CHECKSUM = ("bit_xor(cast(conv(substr(md5(cast(doc_id as string)), 1, 15),"
             " 16, 10) as bigint))")


def shard_plan(d: DataFrame, shard_size: int, id_col: str = "doc_id",
               phase_col=None, start: int = 1) -> DataFrame:
    """Assign (phase, curriculum_pos, shard_id) to every row. ``id_col``
    must be unique (it seeds the deterministic shuffle and totally
    orders ties). ``phase_col`` is an optional difficulty Column; absent,
    all rows are phase 0 and the order is a pure md5 shuffle. ``start``
    offsets the positions — the streaming sink continues a run's
    position counter across micro-batches with it."""
    if int(shard_size) <= 0:
        raise ValueError(f"shard_size must be positive, got {shard_size}")
    x = d if id_col == "doc_id" else d.withColumnRenamed(id_col, "doc_id")
    out = curriculum_order_df(
        x, phase_col if phase_col is not None else F.lit(0), start=start)
    out = out.withColumn(
        "shard_id", F.expr(f"(curriculum_pos - 1) div {int(shard_size)}"))
    return out if id_col == "doc_id" else out.withColumnRenamed("doc_id", id_col)


def export_training_shards(d: DataFrame, out_dir: str, shard_size: int,
                           id_col: str = "doc_id", phase_col=None,
                           overwrite: bool = False) -> DataFrame:
    """Write ``d`` as training shards under ``out_dir``:

    - ``out_dir/data/shard_id=N/`` — one parquet file per shard, rows
      in curriculum-position order (every shard holds exactly
      ``shard_size`` rows except the last);
    - ``out_dir/_manifest/`` — parquet manifest: (shard_id, n_rows,
      min_pos, max_pos, checksum).

    Deterministic: the same input rows produce the same row→shard
    mapping, in-shard order, and manifest regardless of the input's
    partitioning. Returns the manifest DataFrame."""
    planned = shard_plan(d, shard_size, id_col=id_col, phase_col=phase_col)
    if id_col != "doc_id":
        planned = planned.withColumnRenamed(id_col, "doc_id")
    mode = "overwrite" if overwrite else "errorifexists"
    (
        planned.repartition("shard_id")
        .sortWithinPartitions("shard_id", "curriculum_pos")
        .write.mode(mode)
        .partitionBy("shard_id")
        .parquet(os.path.join(out_dir, "data"))
    )
    manifest = (
        planned.groupBy("shard_id")
        .agg(F.count("*").alias("n_rows"),
             F.min("curriculum_pos").alias("min_pos"),
             F.max("curriculum_pos").alias("max_pos"),
             F.expr(_CHECKSUM).alias("checksum"))
    )
    manifest.coalesce(1).write.mode(mode).parquet(os.path.join(out_dir, "_manifest"))
    return manifest
