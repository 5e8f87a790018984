"""Data-layout utilities for 100 TB operation: skew-salted joins,
partitioned writes (partition pruning on read-back), and bucketed
tables (co-located joins with no shuffle).

These are the knobs that keep the relational surface viable at
1000-executor scale:

- AQE's skew-join splitting handles moderate skew automatically
  (session.py enables it); `salted_join` is the explicit fallback for
  pathological keys — it trades a bounded replication of the small
  side (factor = `salt_buckets`) for an even distribution of the hot
  key's rows across tasks.
- `write_partitioned` lays data out so per-partition predicates become
  directory pruning (PartitionFilters in the scan, zero I/O for
  non-matching partitions).
- `write_bucketed` pre-shuffles once at write time; repeated joins or
  aggregations on the bucket key then run with NO exchange (asserted
  in tests/test_layout.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with key salting: the big side gets a deterministic
    per-row salt (hash of all columns, NOT random — reruns and retries
    must agree), the small side is replicated across all salt values,
    and the join key becomes (key, salt) so one hot key spreads over
    ``salt_buckets`` tasks.

    Use when a key's row count exceeds what one task can hold even
    after AQE splitting; replication multiplies the small side by
    ``salt_buckets``, so keep it broadcast-sized."""
    salt = (F.abs(F.xxhash64(*big.columns)) % salt_buckets).cast("int")
    big_salted = big.withColumn("_salt", salt)
    small_salted = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    joined = big_salted.join(small_salted, [key, "_salt"], how)
    return joined.drop("_salt")


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Write parquet partitioned by ``partition_cols``: predicates on
    those columns prune directories at read time instead of scanning
    (the physical plan shows them under PartitionFilters). zstd
    compression: ~30% smaller than snappy at comparable scan speed —
    at 100 TB the storage and scan-I/O delta is the dominant cost."""
    df.write.mode(mode).option("compression", "zstd").partitionBy(
        *partition_cols
    ).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort_col: str | None = None,
) -> None:
    """Persist as a bucketed (and optionally sorted) table: both sides
    of a future join bucketed on the same key with the same count join
    with no exchange — the shuffle was paid once at write time."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)
