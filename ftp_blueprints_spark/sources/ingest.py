"""Ingestion pipeline: remote CSV trees -> parquet, fully Spark-native.

The reference's blueprints move files byte-for-byte; the natural next
step for an ETL engine is to land them as COLUMNS. This composes the
``ftp_manifest`` DataSource (file bytes fetched executor-side, one
partition per subtree) with JVM-side parsing:

    bytes -> decode -> split lines -> posexplode -> from_csv -> parquet

No Python touches row data: decode/split/explode/from_csv are all
Catalyst expressions, so a 1000-executor ingest is bounded by FTP
bandwidth, not the driver. Header handling is per-file (line 0 of each
file is dropped when ``header=True``) and every output row keeps its
provenance (source path + 1-based line number) — the lineage columns a
training-data pipeline audits by.

Cold-start note (profiled r10): the FIRST Python-DataSource use in a
session pays ~2.8 s of one-time init BEFORE any execution — a plan-only
``load()`` spawns the driver-side Python plan runner and cold-imports
pyspark in it. Subsequent loads reuse the warm path (full ingest runs
settle 3.6 -> 1.3 s at sf0.1). Per-session, not per-job: nothing to fix
in the plan; long-lived sessions amortize it to zero.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .connector import ClientSpec


def _manifest_with_content(
    spark: SparkSession, spec: ClientSpec, folder: str
) -> DataFrame:
    from .datasource import ManifestDataSource, _spec_options

    try:
        spark.dataSource.register(ManifestDataSource)
    except Exception:
        pass  # already registered in this session
    return (
        spark.read.format("ftp_manifest")
        .options(**_spec_options(spec))
        .option("folder", folder)
        .option("with_content", "true")
        .load()
    )


def parse_csv_files(
    files: DataFrame, schema: str, header: bool = True, sep: str = ","
) -> DataFrame:
    """Binary ``content`` column -> typed rows (+ src_path, line_no).

    With ``header=True`` the FIRST NON-EMPTY line of each file is the
    header (a fixed ``idx > 0`` filter would leak the header as a data
    row whenever the file starts with a blank line, since blank lines
    are dropped but physical indices are not renumbered). ``line_no``
    is the physical line offset from the header (1 = first line after
    it), matching the pre-existing lineage contract."""
    lines = files.select(
        F.col("path").alias("src_path"),
        F.posexplode(
            F.split(F.decode("content", "UTF-8"), "\r?\n")
        ).alias("idx", "line"),
    ).filter(F.length(F.trim("line")) > 0)
    if header:
        from pyspark.sql import Window

        w = Window.partitionBy("src_path")
        lines = lines.withColumn("_hidx", F.min("idx").over(w)).filter(
            F.col("idx") != F.col("_hidx")
        )
        # offset from the header, not the physical idx: a file with a
        # leading blank line has its header at idx=1 and its first data
        # row at idx=2 — line_no must still be 1 there.
        line_no = F.col("idx") - F.col("_hidx")
    else:
        line_no = F.col("idx") + 1
    parsed = lines.select(
        "src_path",
        line_no.cast("bigint").alias("line_no"),
        F.from_csv("line", schema, {"sep": sep}).alias("r"),
    )
    return parsed.select("src_path", "line_no", "r.*")


def ingest_csv(
    spark: SparkSession,
    spec: ClientSpec,
    folder: str,
    schema: str,
    dest: str,
    pattern: str = r".*\.csv$",
    header: bool = True,
    sep: str = ",",
    partition_cols: list[str] | None = None,
) -> int:
    """Ingest every CSV under ``folder`` on the remote into a parquet
    dataset at ``dest``; returns the row count written. Optionally
    partitioned (directory-pruned on read-back)."""
    mf = _manifest_with_content(spark, spec, folder)
    files = mf.filter((~F.col("is_dir")) & F.col("path").rlike(pattern))
    rows = parse_csv_files(with_decompressed(files), schema, header=header, sep=sep)
    writer = rows.write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(dest)
    return spark.read.parquet(dest).count()


def parse_jsonl_files(files: DataFrame, schema: str) -> DataFrame:
    """Binary ``content`` -> typed rows from JSON-Lines files (the
    LLM-corpus interchange format): decode, split lines, from_json per
    line — all Catalyst expressions, same lineage columns as the CSV
    path. Unparseable lines keep their lineage with null fields."""
    lines = files.select(
        F.col("path").alias("src_path"),
        F.posexplode(
            F.split(F.decode("content", "UTF-8"), "\r?\n")
        ).alias("idx", "line"),
    ).filter(F.length(F.trim("line")) > 0)
    parsed = lines.select(
        "src_path",
        (F.col("idx") + 1).cast("bigint").alias("line_no"),
        F.from_json("line", schema).alias("r"),
    )
    return parsed.select("src_path", "line_no", "r.*")


def ingest_jsonl(
    spark: SparkSession,
    spec: ClientSpec,
    folder: str,
    schema: str,
    dest: str,
    pattern: str = r".*\.jsonl$",
    partition_cols: list[str] | None = None,
) -> int:
    """Ingest every JSONL file under ``folder`` into parquet at
    ``dest``; returns the row count written."""
    mf = _manifest_with_content(spark, spec, folder)
    files = mf.filter((~F.col("is_dir")) & F.col("path").rlike(pattern))
    rows = parse_jsonl_files(with_decompressed(files), schema)
    writer = rows.write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(dest)
    return spark.read.parquet(dest).count()


def parse_parquet_files(files: DataFrame, schema: str) -> DataFrame:
    """Binary ``content`` -> typed rows from parquet files fetched over
    the connector. Parquet is a binary container, so unlike CSV/JSONL
    there is no Catalyst expression that decodes it from a bytes
    column; one Arrow-natural mapInPandas pass opens each payload with
    pyarrow (zero-copy into the same Arrow batches Spark already
    speaks) and re-emits rows with the standard lineage columns
    (src_path, row_no within the source file).

    ``schema`` lists the columns to project (pushed into the pyarrow
    read so unneeded columns are never materialized). Executors parse
    only their own partition's files — at scale ingest stays bounded by
    transfer bandwidth, exactly like the CSV path."""
    import pandas as pd
    from pyspark.sql.types import StructType

    want = [f.split()[0] for f in schema.split(",")]
    out_schema = f"src_path string, row_no bigint, {schema}"

    def gen(batches):
        import io

        import pyarrow.parquet as pq

        for pdf in batches:
            for path, buf in zip(pdf["path"], pdf["content"]):
                tbl = pq.read_table(io.BytesIO(bytes(buf)), columns=want)
                out = tbl.to_pandas()
                out.insert(0, "row_no", range(1, len(out) + 1))
                out.insert(0, "src_path", path)
                yield out

    slim = files.select("path", "content")
    return slim.mapInPandas(gen, out_schema)


def ingest_parquet(
    spark: SparkSession,
    spec: ClientSpec,
    folder: str,
    schema: str,
    dest: str,
    pattern: str = r".*\.parquet$",
    partition_cols: list[str] | None = None,
) -> int:
    """Ingest every parquet file under ``folder`` on the remote into a
    parquet dataset at ``dest`` (re-landed with lineage columns);
    returns the row count written."""
    mf = _manifest_with_content(spark, spec, folder)
    files = mf.filter((~F.col("is_dir")) & F.col("path").rlike(pattern))
    rows = parse_parquet_files(files, schema)
    writer = rows.write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(dest)
    return spark.read.parquet(dest).count()


def with_decompressed(files: DataFrame) -> DataFrame:
    """Transparently gunzip compressed payloads: any ``content`` whose
    magic bytes are 1f 8b is decompressed executor-side in one
    Arrow-batched mapInPandas pass (no Catalyst gunzip expression
    exists); other payloads pass through untouched, so mixed trees of
    plain and .gz files ingest in one job. Magic-byte detection, not
    extension matching — server-side renames can't break it."""

    def gen(batches):
        import gzip

        for pdf in batches:
            out = pdf.copy()
            out["content"] = [
                gzip.decompress(bytes(c))
                if c is not None and bytes(c[:2]) == b"\x1f\x8b"
                else c
                for c in out["content"]
            ]
            yield out

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in files.schema)
    return files.mapInPandas(gen, schema)


def parse_orc_files(files: DataFrame, schema: str) -> DataFrame:
    """Binary ``content`` -> typed rows from ORC files fetched over the
    connector — same Arrow-natural mapInPandas shape as
    parse_parquet_files (ORC is the other common columnar container in
    warehouse exports); column projection is pushed into the pyarrow
    reader so unneeded columns never materialize."""
    want = [f.split()[0] for f in schema.split(",")]
    out_schema = f"src_path string, row_no bigint, {schema}"

    def gen(batches):
        import io

        import pyarrow.orc as po

        for pdf in batches:
            for path, buf in zip(pdf["path"], pdf["content"]):
                tbl = po.ORCFile(io.BytesIO(bytes(buf))).read(columns=want)
                out = tbl.to_pandas()
                out.insert(0, "row_no", range(1, len(out) + 1))
                out.insert(0, "src_path", path)
                yield out

    slim = files.select("path", "content")
    return slim.mapInPandas(gen, out_schema)


def ingest_orc(
    spark: SparkSession,
    spec: ClientSpec,
    folder: str,
    schema: str,
    dest: str,
    pattern: str = r".*\.orc$",
    partition_cols: list[str] | None = None,
) -> int:
    """Ingest every ORC file under ``folder`` on the remote into a
    parquet dataset at ``dest`` (re-landed with lineage columns);
    returns the row count written."""
    mf = _manifest_with_content(spark, spec, folder)
    files = mf.filter((~F.col("is_dir")) & F.col("path").rlike(pattern))
    rows = parse_orc_files(files, schema)
    writer = rows.write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(dest)
    return spark.read.parquet(dest).count()
