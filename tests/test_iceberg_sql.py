"""IcebergCatalog bookkeeping SQL, executed for real against DuckDB
stand-ins of the Iceberg metadata tables (the runtime jar is absent in
this sandbox, so these strings otherwise never run — SURVEY.md §7.3).
The `.snapshots` stand-in mirrors Iceberg's metadata-table shape:
(committed_at timestamp, snapshot_id bigint, summary map<string,string>)."""

import duckdb
import pytest

from web_crawler_spark.sources.iceberg import (
    sql_rounds_create,
    sql_rounds_latest,
    sql_snapshots_latest,
    sql_snapshots_total_records,
)


@pytest.fixture()
def con():
    c = duckdb.connect()
    c.sql("""
        CREATE TABLE snaps (committed_at TIMESTAMP, snapshot_id BIGINT,
                            summary MAP(VARCHAR, VARCHAR));
        INSERT INTO snaps VALUES
          (TIMESTAMP '2026-01-01 00:00:00', 11, MAP {'total-records': '40'}),
          (TIMESTAMP '2026-01-02 00:00:00', 22, MAP {'total-records': '75'});
        CREATE TABLE rounds (round INT, table_name VARCHAR,
                             snapshot_id BIGINT, counters VARCHAR);
        INSERT INTO rounds VALUES
          (0, 'frontier', 11, '{"next_seq": 1}'),
          (1, 'frontier', 22, '{"next_seq": 9}'),
          (1, 'seen', 23, '{"next_seq": 9}');
    """)
    return c


def test_snapshots_latest_picks_newest(con):
    assert con.sql(sql_snapshots_latest("snaps")).fetchone()[0] == 22


def test_snapshots_total_records_reads_summary_map(con):
    v = con.sql(sql_snapshots_total_records("snaps")).fetchone()[0]
    if isinstance(v, list):  # DuckDB wraps map element access in a list
        v = v[0]
    assert int(v) == 75


def test_rounds_latest_returns_only_max_round(con):
    rows = con.sql(sql_rounds_latest("rounds")).fetchall()
    assert sorted(r[0] for r in rows) == ["frontier", "seen"]
    assert all(r[2] == 1 for r in rows)


def test_rounds_create_ddl_shape():
    ddl = sql_rounds_create("wcs.crawl.rounds")
    assert "USING iceberg" in ddl and "snapshot_id BIGINT" in ddl
    # DuckDB can parse the column list (strip the Iceberg USING clause)
    duckdb.connect().sql(ddl.replace("USING iceberg", "").replace("STRING", "VARCHAR")
                         .replace("wcs.crawl.rounds", "r1"))
