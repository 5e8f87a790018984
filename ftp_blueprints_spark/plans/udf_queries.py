"""Vectorized UDF surface (SURVEY.md §2A.6 / §2B UDF row): Arrow-batched
pandas_udf scalar and grouped-aggregate examples with DuckDB oracles.

These exist to prove the extension surface with parity, not because
the computations need Python — each formula is integer-exact so the
oracle hashes identically (float libm results differ across engines in
the last ulp; integer math does not). Real uses of this surface are
the multimodal decode (operators/multimodal.py) and any model-scoring
hook; the pattern here — Arrow batch in, vectorized numpy/pandas out,
no per-row Python — is the 100 TB-safe shape. Row-at-a-time
``F.udf`` is deliberately absent from this codebase.

The pandas_udf objects are built inside the query functions (the
decorator parses its return-type DDL, which needs a live session, so
module-import time is too early).
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import pandas_udf

from ..session import load_table
from .registry import query


def _doc_score_udf():
    @pandas_udf("bigint")
    def doc_score(text: pd.Series) -> pd.Series:
        """Vectorized scalar: integer quality bucket from char/token
        counts (whole Arrow batch at once, pandas str ops).

        Degenerate-input contract matches the SQL oracle exactly:
        token count is len(regexp-split of the TRIMMED text), which is
        1 for empty/whitespace-only strings (pandas ``''.split()``
        would say 0); NULL text yields NULL (nullable Int64), where a
        bare astype('int64') would crash the whole batch."""
        n_chars = text.str.len().astype("Int64")
        n_tokens = text.str.strip().str.split(r"\s+").map(
            lambda t: len(t) if isinstance(t, list) else None
        )
        n_tokens = pd.Series(n_tokens, index=text.index, dtype="Int64")
        return (n_chars // 100) * 10 + (n_tokens % 10)

    return doc_score


def _weighted_cents_udf():
    @pandas_udf("bigint")
    def weighted_cents(value: pd.Series, weight: pd.Series) -> int | None:
        """Grouped-aggregate: exact weighted sum in integer cents
        (each group's Arrow batch reduced vectorized).

        NULL handling matches SQL SUM: rows where either operand is
        NULL are skipped; a group with no non-NULL products sums to
        NULL (not 0)."""
        mask = value.notna() & weight.notna()
        if not mask.any():
            return None
        cents = (value[mask] * 100).round().astype("int64")
        return int((cents * weight[mask].astype("int64")).sum())

    return weighted_cents


@query(
    "udf_doc_score",
    """
SELECT doc_id,
       (length(text) // 100) * 10 + (length(regexp_split_to_array(trim(text), '\\s+')) % 10) AS score
FROM documents
""",
)
def udf_doc_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched scalar pandas_udf, oracle-checked: the UDF column
    computes the same integer formula the SQL oracle states."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", _doc_score_udf()("text").alias("score"))


@query(
    "udf_grouped_demean",
    """
WITH cents AS (
  SELECT event_id, user_id, CAST(ROUND(value * 100) AS BIGINT) AS c FROM events
)
SELECT event_id, user_id,
       c - (CAST(SUM(c) OVER (PARTITION BY user_id) AS BIGINT)
            // COUNT(*) OVER (PARTITION BY user_id)) AS dev_cents
FROM cents
""",
)
def udf_grouped_demean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas grouped-map: per-user demeaned value in integer
    cents (floor-div mean keeps the math exact). One Arrow batch per
    user group in, one out — the custom-grouped-transform shape
    (z-scores, per-entity models) with a window-SQL oracle."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")

    def demean(pdf: pd.DataFrame) -> pd.DataFrame:
        # SQL-matching NULL handling: SUM skips NULL cents, COUNT(*)
        # counts every row, and a NULL value yields a NULL deviation
        # (astype('int64') on a NaN would instead crash the batch).
        cents = (pdf["value"] * 100).round()
        mean_floor = int(cents.sum(skipna=True)) // len(cents)
        dev = pd.Series(pd.NA, index=pdf.index, dtype="Int64")
        m = cents.notna()
        dev[m] = cents[m].astype("int64") - mean_floor
        return pd.DataFrame(
            {
                "event_id": pdf["event_id"],
                "user_id": pdf["user_id"],
                "dev_cents": dev,
            }
        )

    return ev.groupBy("user_id").applyInPandas(
        demean, "event_id bigint, user_id bigint, dev_cents bigint"
    )


@query(
    "udf_grouped_weighted",
    """
SELECT event_type,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)
                * CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
         AS weighted_cents
FROM events GROUP BY event_type
""",
)
def udf_grouped_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas_udf (one Arrow batch per group into a scalar)
    with the identical integer formula as the DuckDB oracle."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "k", F.get_json_object("props", "$.k").cast("bigint")
    )
    return ev.groupBy("event_type").agg(
        _weighted_cents_udf()("value", "k").alias("weighted_cents")
    )


CHUNK_LEN = 200
CHUNK_STRIDE = 150  # 50-char overlap


@query(
    "udtf_chunks",
    f"""
SELECT doc_id,
       UNNEST(range(0, CAST(ceil(greatest(length(text) - {CHUNK_LEN - CHUNK_STRIDE}, 1)
                                 / {CHUNK_STRIDE}.0) AS BIGINT))) AS chunk_no,
       UNNEST(list_transform(
         range(0, CAST(ceil(greatest(length(text) - {CHUNK_LEN - CHUNK_STRIDE}, 1)
                            / {CHUNK_STRIDE}.0) AS BIGINT)),
         i -> substr(text, CAST(1 + i * {CHUNK_STRIDE} AS BIGINT), {CHUNK_LEN})))
       AS chunk
FROM documents
""",
)
def udtf_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking ({CHUNK_LEN}-char windows,
    {CHUNK_STRIDE}-char stride -> 50-char overlap) via a Python UDTF
    (Spark 4 table-function surface) in a LATERAL join: one input doc
    row -> N ordered chunk rows, no shuffle (the UDTF runs where the
    doc partition lives). Arrow-optimized UDTF transfer is enabled for
    the batch path. Scale note: this exact chunking is also
    pure-Catalyst-expressible (sequence -> transform(substring) ->
    posexplode — the formula the DuckDB oracle uses); the UDTF is the
    right tool when chunking needs a real tokenizer or
    sentence-boundary model, which built-ins can't express. Aligned
    parallel UNNESTs replay the ordinal in DuckDB."""
    from pyspark.sql.functions import udtf

    spark.conf.set("spark.sql.execution.pythonUDTF.arrow.enabled", "true")

    @udtf(returnType="chunk_no bigint, chunk string")
    class Chunker:
        def eval(self, text: str):
            if text is None:
                return
            n = len(text)
            i = 0
            pos = 0
            while True:
                yield (i, text[pos : pos + CHUNK_LEN])
                i += 1
                pos += CHUNK_STRIDE
                if pos + (CHUNK_LEN - CHUNK_STRIDE) >= n:
                    break

    docs = load_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("docs_for_chunking")
    spark.udtf.register("chunk_text", Chunker)
    return spark.sql(
        "SELECT doc_id, c.chunk_no, c.chunk "
        "FROM docs_for_chunking, LATERAL chunk_text(text) AS c"
    )
