"""Listing sources: materialize a real file tree as the manifest
DataFrame (SURVEY.md §2A S2-S5).

    path STRING, folder STRING, name STRING, is_dir BOOLEAN, size LONG

The reference walks the tree sequentially — BFS queue in
download_file.py:252-257 / delete_file.py:121-126, recursive DFS in
move_file.py:63-78 — paying >=1 network round-trip per directory entry
on one connection. Here each BFS *level* is expanded in parallel:
the current frontier of folders is parallelized across partitions and
each partition lists its folders with its own client
(``mapPartitions`` + per-partition ``spec.connect()``). Wall-clock per
level is max(folder listing) instead of sum, and the fan-out is
bounded by ``spec.max_connections`` so a wide tree cannot exceed the
server's session limit. Level results accumulate driver-side as plain
rows ONLY while the tree is small: past ``driver_rows_threshold``
entries the walk abandons driver accumulation and returns the
``ftp_manifest`` DataSource DataFrame instead (datasource.py), whose
per-top-level-entry partitions are walked executor-side — driver
memory stays O(threshold) no matter how many files the tree holds.

S5 (local recursive listing, upload_file.py:136-144) additionally maps
onto Spark's native file source: ``binary_manifest`` uses
``binaryFile`` + recursiveFileLookup/pathGlobFilter, which pushes the
glob into the distributed file-listing layer and prunes the content
column when only metadata is selected.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..functions import paths as P
from .connector import ClientSpec

MANIFEST_SCHEMA = "path string, folder string, name string, is_dir boolean, size bigint"

# Above this many manifest entries, list_tree stops accumulating rows on
# the driver and delegates to the executor-partitioned DataSource walk.
DRIVER_ROWS_THRESHOLD = 100_000


def _datasource_tree(
    spark: SparkSession, spec: ClientSpec, root: str, skip_dot_dirs: bool
) -> DataFrame:
    """The scale path: ``ftp_manifest`` DataSource (sources/datasource.py)
    — one root-level listing on the driver, every top-level entry's
    subtree walked executor-side with its own client. Nothing
    proportional to file count ever lives in driver memory."""
    from .datasource import ManifestDataSource, _spec_options

    try:
        spark.dataSource.register(ManifestDataSource)
    except Exception:
        pass  # already registered in this session
    return (
        spark.read.format("ftp_manifest")
        .options(**_spec_options(spec))
        .option("folder", root)
        .option("skip_dot_dirs", "true" if skip_dot_dirs else "false")
        .load()
    )


def _list_level(spec: ClientSpec, folders: list[str]) -> list[tuple]:
    """List one frontier of folders with a single client (executor-side)."""
    client = spec.connect()
    try:
        rows = []
        for folder in folders:
            for path, is_dir, size in client.listdir(folder):
                name = path.rsplit("/", 1)[-1]
                rows.append((path, folder, name, is_dir, size))
        return rows
    finally:
        client.close()


def list_tree(
    spark: SparkSession,
    spec: ClientSpec,
    root: str = "",
    skip_dot_dirs: bool = True,
    max_depth: int = 64,
    driver_rows_threshold: int = DRIVER_ROWS_THRESHOLD,
) -> DataFrame:
    """BFS the tree under ``root`` into a manifest DataFrame (S2+S3).

    Dot-directories are skipped during traversal when requested —
    download's behavior (download_file.py:150-152); delete does NOT
    skip them (delete_file.py:45-73), hence the flag.

    Driver memory is bounded: once the accumulated manifest crosses
    ``driver_rows_threshold`` rows the walk hands off to the
    executor-partitioned DataSource (the partial BFS work is discarded —
    crossing the threshold means the tree is big enough that a clean
    distributed walk beats finishing a driver-side one)."""
    sc = spark.sparkContext
    frontier = [root]
    all_rows: list[tuple] = []
    for _ in range(max_depth):
        if not frontier:
            break
        if len(all_rows) > driver_rows_threshold:
            return _datasource_tree(spark, spec, root, skip_dot_dirs)
        n_parts = max(1, min(len(frontier), spec.max_connections))
        level = (
            sc.parallelize(frontier, n_parts)
            .mapPartitions(lambda it, s=spec: _list_level(s, list(it)))
            .collect()
        )
        frontier = []
        for path, folder, name, is_dir, size in level:
            if skip_dot_dirs and set(name) == {"."}:
                continue  # F4 (download_file.py:58-62)
            all_rows.append((path, folder, name, is_dir, size))
            if is_dir:
                frontier.append(path)
    return spark.createDataFrame(all_rows, MANIFEST_SCHEMA)


def binary_manifest(
    spark: SparkSession,
    directory: str,
    glob: str | None = None,
    recursive: bool = True,
) -> DataFrame:
    """S5: local/DFS recursive listing through Spark's binaryFile source.

    The glob is pushed into file listing (pathGlobFilter) and `content`
    is pruned unless selected — metadata-only scans never read bytes.
    Paths are normalized to scheme-less '/'-paths to match the manifest
    produced by :func:`list_tree`."""
    reader = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true" if recursive else "false")
    )
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(directory)
    path = F.regexp_replace(F.col("path"), "^file:", "")
    return df.select(
        path.alias("path"),
        F.regexp_replace(path, "/[^/]*$", "").alias("folder"),
        P.basename(path).alias("name"),
        F.lit(False).alias("is_dir"),
        F.col("length").alias("size"),
    )
