"""Schema evolution + MERGE upsert on the ManifestCatalog.

Iceberg contracts under test:
- ALTER TABLE ADD COLUMN is metadata-only: old parts null-fill, new
  appends carry the column, resume sees the evolved schema, time travel
  to a pre-evolution round reads the OLD schema.
- MERGE INTO (copy-on-write upsert): matched rows updated, unmatched
  kept, new keys inserted; pre-merge snapshots untouched. Parity is
  checked against an INDEPENDENT DuckDB formulation (full outer join +
  COALESCE), not the engine's own anti-join shape.
"""
from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import types as T

from web_crawler_spark.sources.catalog import ManifestCatalog

BASE = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("val", T.StringType()),
])


def _cat(spark, path, schema=BASE):
    return ManifestCatalog(spark, str(path), table_schemas={"t": schema})


def _rows(spark, pairs, schema=BASE):
    return spark.createDataFrame(pairs, schema)


@pytest.fixture(scope="module")
def evolved(spark, tmp_path_factory):
    """r0: two rows under the base schema; r1: schema += score, two more
    rows carrying it. Returns the run dir (re-openable)."""
    d = tmp_path_factory.mktemp("evo")
    cat = _cat(spark, d)
    cat.append("t", _rows(spark, [(1, "a"), (2, "b")]), partitions=1)
    cat.commit(0, {})
    cat.alter_add_columns("t", [T.StructField("score", T.DoubleType(), True)])
    wide = cat.table_schemas["t"]
    cat.append("t", _rows(spark, [(3, "c", 0.5), (4, "d", 0.9)], wide), partitions=1)
    cat.commit(1, {})
    return d


def test_old_parts_null_fill(spark, evolved):
    cat = _cat(spark, evolved)
    pdf = cat.read("t").toPandas().sort_values("id").reset_index(drop=True)
    assert list(pdf.columns) == ["id", "val", "score"]
    assert pdf["score"].isna().tolist() == [True, True, False, False]


def test_resume_sees_evolved_schema(spark, evolved):
    # a fresh catalog constructed with the CODE-declared (old) schema
    # must pick the evolved one up from the committed manifest
    cat = _cat(spark, evolved, schema=BASE)
    assert cat.table_schemas["t"].fieldNames() == ["id", "val", "score"]


def test_time_travel_uses_snapshot_schema(spark, evolved):
    cat = _cat(spark, evolved)
    old = cat.read_at("t", 0)
    assert old.columns == ["id", "val"]  # pre-evolution snapshot
    new = cat.read_at("t", 1)
    assert new.columns == ["id", "val", "score"]
    # incremental scan over the evolution boundary uses the target schema
    inc = cat.read_changes("t", 0, 1).toPandas()
    assert list(inc.columns) == ["id", "val", "score"]
    assert sorted(inc["id"]) == [3, 4]


def test_rejects_unsafe_evolution(spark, tmp_path):
    cat = _cat(spark, tmp_path)
    with pytest.raises(ValueError, match="already exists"):
        cat.alter_add_columns("t", [T.StructField("val", T.IntegerType(), True)])
    with pytest.raises(ValueError, match="nullable"):
        cat.alter_add_columns("t", [T.StructField("x", T.IntegerType(), False)])
    with pytest.raises(KeyError):
        cat.alter_add_columns("nope", [T.StructField("x", T.IntegerType(), True)])


def _merge_oracle(target: pd.DataFrame, source: pd.DataFrame) -> pd.DataFrame:
    """Independent MERGE semantics via DuckDB full outer join."""
    con = duckdb.connect()
    con.register("t", target)
    con.register("s", source)
    return con.execute("""
        SELECT COALESCE(s.id, t.id) AS id,
               COALESCE(s.val, t.val) AS val
        FROM t FULL OUTER JOIN s ON t.id = s.id
        ORDER BY id
    """).df()


def test_merge_upsert_matches_duckdb(spark, tmp_path):
    cat = _cat(spark, tmp_path)
    cat.append("t", _rows(spark, [(1, "a"), (2, "b"), (3, "c")]), partitions=1)
    cat.commit(0, {})
    src = [(2, "B"), (3, "C"), (9, "I")]
    cat.merge("t", _rows(spark, src), on="id")
    cat.commit(1, {})
    got = cat.read("t").toPandas().sort_values("id").reset_index(drop=True)
    want = _merge_oracle(
        pd.DataFrame({"id": [1, 2, 3], "val": ["a", "b", "c"]}),
        pd.DataFrame({"id": [2, 3, 9], "val": ["B", "C", "I"]}),
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # copy-on-write isolation: the pre-merge snapshot is unchanged
    before = cat.read_at("t", 0).toPandas().sort_values("id")
    assert list(before["val"]) == ["a", "b", "c"]


def test_merge_staged_until_commit(spark, tmp_path):
    cat = _cat(spark, tmp_path)
    cat.append("t", _rows(spark, [(1, "a")]), partitions=1)
    cat.commit(0, {})
    cat.merge("t", _rows(spark, [(1, "A"), (2, "b")]), on="id")
    # not yet committed: the live read still sees the old contents
    assert cat.read("t").toPandas()["val"].tolist() == ["a"]
    cat.commit(1, {})
    got = cat.read("t").toPandas().sort_values("id")
    assert got["val"].tolist() == ["A", "b"]


def test_merge_refuses_staged_uncommitted_writes(spark, tmp_path):
    """ADVICE r3: append-then-merge-before-commit would silently orphan
    the staged append (merge reads only the committed manifest and
    commit's replace-wins rule collapses the append list). The catalog
    must refuse instead of quietly losing data."""
    cat = _cat(spark, tmp_path)
    cat.append("t", _rows(spark, [(1, "a")]), partitions=1)
    cat.commit(0, {})
    # staged append in the current window → merge must refuse
    cat.append("t", _rows(spark, [(2, "b")]), partitions=1)
    with pytest.raises(RuntimeError, match="staged uncommitted"):
        cat.merge("t", _rows(spark, [(1, "A")]), on="id")
    cat.commit(1, {})
    # after commit the same merge goes through and sees BOTH rows
    cat.merge("t", _rows(spark, [(1, "A")]), on="id")
    cat.commit(2, {})
    got = cat.read("t").toPandas().sort_values("id")
    assert got["val"].tolist() == ["A", "b"]
    # staged-replace (stage on a stage-based table) also refuses
    cat.stage("s", _rows(spark, [(1, "x")]), partitions=1)
    with pytest.raises(RuntimeError, match="staged uncommitted"):
        cat.merge("s", _rows(spark, [(1, "X")]), on="id")


def test_merge_on_stage_based_table(spark, tmp_path):
    cat = _cat(spark, tmp_path)
    cat.stage("t", _rows(spark, [(1, "a"), (2, "b")]), partitions=1)
    cat.commit(0, {})
    cat.merge("t", _rows(spark, [(2, "B")]), on="id")
    cat.commit(1, {})
    got = cat.read("t").toPandas().sort_values("id")
    assert got["val"].tolist() == ["a", "B"]
    assert "t" in cat.manifest["versions"]  # stayed stage-based
