"""Guard against parquet fixture timestamp-encoding drift.

The driver regenerates /root/testdata between rounds and the physical
timestamp encoding of ``events.ts`` has already drifted once
(TIMESTAMP(NANOS) -> TIMESTAMP(MICROS), which Spark 4 reads as
TIMESTAMP_NTZ and which breaks ``unix_micros`` at analysis).  These
tests make the next drift fail loudly in ONE place instead of breaking
twenty call sites: every timestamp-typed column of every table must
come out of ``load_table`` as session-zoned TIMESTAMP, and
``unix_micros`` must analyze against each of them.
"""

import pyspark.sql.functions as F
import pytest

from ftp_blueprints_spark.session import load_table

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def test_no_ntz_columns_survive_load(spark, sf_small):
    offenders = []
    for name in TABLES:
        df = load_table(spark, sf_small, name)
        for col, dtype in df.dtypes:
            if dtype == "timestamp_ntz":
                offenders.append(f"{name}.{col}")
    assert offenders == [], (
        f"load_table let TIMESTAMP_NTZ columns through: {offenders}; "
        "normalize_timestamps in session.py must cast them to timestamp"
    )


def test_unix_micros_analyzes_on_every_timestamp_column(spark, sf_small):
    checked = []
    for name in TABLES:
        df = load_table(spark, sf_small, name)
        for col, dtype in df.dtypes:
            if dtype.startswith("timestamp"):
                # analysis (not execution) is where NTZ drift explodes
                df.select(F.unix_micros(F.col(col))).schema
                checked.append(f"{name}.{col}")
    assert "events.ts" in checked


def test_events_ts_matches_oracle_epoch_us(spark, sf_small):
    """Value-level guard: Spark's unix_micros(ts) after normalization
    must equal DuckDB's epoch_us(ts) on the same parquet file."""
    duckdb = pytest.importorskip("duckdb")
    spark_sum = (
        load_table(spark, sf_small, "events")
        .select(F.sum(F.unix_micros("ts")).alias("s"))
        .collect()[0]["s"]
    )
    oracle_sum = duckdb.sql(
        f"SELECT SUM(epoch_us(ts)) FROM '{sf_small}/events.parquet'"
    ).fetchone()[0]
    assert spark_sum == oracle_sum
