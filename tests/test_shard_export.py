"""T30 training-shard export: exact shard sizes, in-shard order,
manifest integrity (recomputed independently with DuckDB from the
written files), determinism across input partitionings, and the
crawl-integration path (images_kept -> shards)."""

from __future__ import annotations

import glob
import os
import shutil

import duckdb
import pyspark.sql.functions as F
import pytest

from web_crawler_spark.sources.shards import export_training_shards, shard_plan

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "lang")


def test_shard_sizes_and_ranges(spark, docs, tmp_path):
    out = str(tmp_path / "shards")
    man = export_training_shards(docs, out, shard_size=128).orderBy("shard_id")
    rows = man.collect()
    n = docs.count()
    assert [r["n_rows"] for r in rows] == [128, 128, 128, n - 384]
    # shards are contiguous position ranges
    for r in rows:
        assert r["min_pos"] == r["shard_id"] * 128 + 1
        assert r["max_pos"] == r["min_pos"] + r["n_rows"] - 1


def test_manifest_matches_written_files_via_duckdb(spark, docs, tmp_path):
    out = str(tmp_path / "shards")
    man = {r["shard_id"]: r for r in export_training_shards(
        docs, out, shard_size=200).collect()}
    con = duckdb.connect()
    got = con.sql(
        f"SELECT shard_id, count(*) AS n_rows, min(curriculum_pos) AS mn,"
        f" max(curriculum_pos) AS mx"
        f" FROM read_parquet('{out}/data/*/*.parquet', hive_partitioning=1)"
        f" GROUP BY 1"
    ).fetchall()
    assert len(got) == len(man)
    for shard_id, n_rows, mn, mx in got:
        m = man[shard_id]
        assert (n_rows, mn, mx) == (m["n_rows"], m["min_pos"], m["max_pos"])
    # checksum recompute in Spark-compatible form (conv semantics)
    back = spark.read.parquet(f"{out}/data")
    from web_crawler_spark.sources.shards import _CHECKSUM

    re_ck = {r["shard_id"]: r["ck"] for r in back.groupBy("shard_id").agg(
        F.expr(_CHECKSUM).alias("ck")).collect()}
    for sid, m in man.items():
        assert re_ck[sid] == m["checksum"]


def test_in_shard_order_and_one_file_per_shard(spark, docs, tmp_path):
    out = str(tmp_path / "shards")
    export_training_shards(docs, out, shard_size=128)
    for d in sorted(glob.glob(f"{out}/data/shard_id=*")):
        files = [f for f in os.listdir(d) if f.endswith(".parquet")]
        assert len(files) == 1, f"{d} should hold exactly one file"
        con = duckdb.connect()
        pos = [r[0] for r in con.sql(
            f"SELECT curriculum_pos FROM '{d}/{files[0]}'").fetchall()]
        assert pos == sorted(pos), "rows must be written in position order"


def test_deterministic_across_partitionings(spark, docs, tmp_path):
    a_dir, b_dir = str(tmp_path / "a"), str(tmp_path / "b")
    ma = export_training_shards(docs, a_dir, shard_size=150).collect()
    mb = export_training_shards(
        docs.repartition(17), b_dir, shard_size=150).collect()
    assert sorted(map(tuple, ma)) == sorted(map(tuple, mb))
    sa = spark.read.parquet(f"{a_dir}/data").select(
        "doc_id", "shard_id", "curriculum_pos")
    sb = spark.read.parquet(f"{b_dir}/data").select(
        "doc_id", "shard_id", "curriculum_pos")
    assert sa.exceptAll(sb).count() == 0 and sb.exceptAll(sa).count() == 0


def test_phase_ordering_respected(spark, docs, tmp_path):
    out = str(tmp_path / "shards")
    d = docs.withColumn("hard", (F.col("doc_id") % 2 == 1).cast("int"))
    export_training_shards(d, out, shard_size=100, phase_col=F.col("hard"))
    back = spark.read.parquet(f"{out}/data")
    easy_max = back.filter("hard = 0").agg(F.max("curriculum_pos")).first()[0]
    hard_min = back.filter("hard = 1").agg(F.min("curriculum_pos")).first()[0]
    assert easy_max < hard_min


def test_overwrite_guard(spark, docs, tmp_path):
    out = str(tmp_path / "shards")
    export_training_shards(docs, out, shard_size=128)
    with pytest.raises(Exception):
        export_training_shards(docs, out, shard_size=128)
    export_training_shards(docs, out, shard_size=128, overwrite=True)


def test_crawl_images_kept_export(spark, fix_dir, tmp_path):
    """The north-star composition: crawl -> kept image+caption rows ->
    deterministic training shards. Every kept row lands in exactly one
    shard and nothing is lost."""
    from web_crawler_spark.config import CrawlConfig
    from web_crawler_spark.plans.crawl import CrawlEngine

    run_dir = str(tmp_path / "run")
    shutil.rmtree(run_dir, ignore_errors=True)
    eng = CrawlEngine(spark, fix_dir, run_dir,
                      CrawlConfig(per_host_k=2, max_rounds=4))
    eng.run()
    kept = eng.images_kept()
    n = kept.count()
    assert n > 0
    out = str(tmp_path / "shards")
    man = export_training_shards(kept, out, shard_size=8, id_col="image_id")
    total = man.agg(F.sum("n_rows")).first()[0]
    assert total == n
    back = spark.read.parquet(f"{out}/data")
    assert back.select("doc_id").distinct().count() == n
    assert set(r["caption"] is not None for r in back.collect()) == {True}


# ------------------------------------------------ ST6: streaming twin

def _write_doc_files(spark, base, n_files=3, rows_per=40):
    """n_files single parquet FILES (one micro-batch each under
    maxFilesPerTrigger=1), disjoint doc_id ranges. Spark writes
    directories, so move the lone part file out."""
    os.makedirs(base, exist_ok=True)
    for i in range(n_files):
        tmp = f"{base}/_tmp_f{i}"
        (spark.range(i * rows_per, (i + 1) * rows_per)
         .select(F.col("id").alias("doc_id"),
                 F.concat(F.lit("doc "), F.col("id").cast("string")).alias("text"))
         .coalesce(1).write.mode("overwrite").parquet(tmp))
        part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        os.replace(f"{tmp}/{part}", f"{base}/f{i}.parquet")
        shutil.rmtree(tmp)


def test_stream_shards_positions_continue(spark, tmp_path):
    from web_crawler_spark.streaming.stream_ops import stream_export_shards

    src = str(tmp_path / "src")
    _write_doc_files(spark, src, n_files=3, rows_per=40)
    out = str(tmp_path / "out")
    back = stream_export_shards(spark, src, out, shard_size=32)
    rows = back.select("doc_id", "curriculum_pos", "shard_id").collect()
    n = len(rows)
    assert n == 120
    assert sorted(r["curriculum_pos"] for r in rows) == list(range(1, n + 1))
    for r in rows:
        assert r["shard_id"] == (r["curriculum_pos"] - 1) // 32
    # a shard left partial by one batch (40 % 32 != 0) is completed by
    # the next: shards 0..2 are exactly full on the final table
    sizes = {r["shard_id"]: 0 for r in rows}
    for r in rows:
        sizes[r["shard_id"]] += 1
    assert [sizes[i] for i in sorted(sizes)] == [32, 32, 32, 24]


def test_stream_shards_restart_continues(spark, tmp_path):
    """Run the stream over 2 files, then add a 3rd and rerun with the
    SAME checkpoint: earlier batches' data is untouched (bit-identical
    read) and new positions continue the counter."""
    from web_crawler_spark.streaming.stream_ops import stream_export_shards

    src = str(tmp_path / "src")
    _write_doc_files(spark, src, n_files=2, rows_per=40)
    out = str(tmp_path / "out")
    first = stream_export_shards(spark, src, out, shard_size=32)
    snap = sorted(map(tuple, first.select(
        "doc_id", "curriculum_pos", "shard_id").collect()))
    assert len(snap) == 80
    _write_doc_files(spark, src, n_files=3, rows_per=40)  # adds f2 only (f0/f1 rewritten identical)
    again = stream_export_shards(spark, src, out, shard_size=32)
    rows = sorted(map(tuple, again.select(
        "doc_id", "curriculum_pos", "shard_id").collect()))
    assert len(rows) == 120
    assert rows[:0] == []  # keep mypy quiet
    # original 80 rows identical, 40 new rows continue 81..120
    old = [r for r in rows if r[0] < 80]
    assert sorted(old) == snap
    new_pos = sorted(r[1] for r in rows if r[0] >= 80)
    assert new_pos == list(range(81, 121))


def test_stream_shards_matches_batch_sink_per_batch(spark, tmp_path):
    """Within one micro-batch the streaming order IS the batch sink's
    order: one-file source == batch shard_plan on the same rows."""
    from web_crawler_spark.sources.shards import shard_plan
    from web_crawler_spark.streaming.stream_ops import stream_export_shards

    src = str(tmp_path / "src")
    _write_doc_files(spark, src, n_files=1, rows_per=50)
    out = str(tmp_path / "out")
    got = stream_export_shards(spark, src, out, shard_size=16)
    exp = shard_plan(spark.read.parquet(f"{src}/f0.parquet"), 16)
    a = sorted(map(tuple, got.select("doc_id", "curriculum_pos", "shard_id").collect()))
    b = sorted(map(tuple, exp.select("doc_id", "curriculum_pos", "shard_id").collect()))
    assert a == b
