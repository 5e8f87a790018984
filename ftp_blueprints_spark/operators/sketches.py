"""Mergeable frequency sketches over the documents corpus: an
oracle-checkable count-min sketch for heavy-hitter token counts.

Why a sketch when groupBy(tok) gives exact counts? At 100 TB the
token-frequency table itself is huge (vocabulary x languages), and
pipelines often need FREQUENT items only — the CMS collapses every
input partition to a constant DEPTH x WIDTH grid via map-side partial
aggregation, so the shuffle moves <= DEPTH*WIDTH rows per partition
regardless of corpus size, and sketches from different corpora merge
by cell-wise addition (the property exact counts lack).

Portability: the bucket hash is the first 8 hex chars of md5 parsed as
an integer — bit-identical in Spark (conv(_,16,10)) and DuckDB
(('0x'||_)::BIGINT) — so the driver hash-checks the sketch EXACTLY,
unlike approx_count_distinct whose HLL internals are engine-specific.

Reference scope: the reference has no aggregation surface beyond match
counting (SURVEY.md §2A.4); this is §2B/§2C extension surface (novel
sketch operator per the driver's north star).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

from ..functions import text as T
from ..plans.registry import query
from ..session import load_table

CMS_DEPTH = 4
CMS_WIDTH = 512
CMS_HH_MIN = 25  # report tokens with true count >= this

_LTOKS = r"regexp_split_to_array(trim(lower(text)), '\s+')"


def cms_bucket(tok: Column, depth: Column) -> Column:
    """Row-independent bucket for (token, depth): md5 first 8 hex chars
    -> int -> mod WIDTH. One md5 per (vocab row x depth), not per
    occurrence — always applied post-aggregation."""
    h = F.md5(F.concat(tok, F.lit("#"), depth.cast("string")))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % CMS_WIDTH).alias(
        "bucket"
    )


def cms_sketch(tf: DataFrame) -> DataFrame:
    """DEPTH x WIDTH count-min sketch from a (tok, tf) frequency table.
    Returns <= DEPTH*WIDTH rows: (d, bucket, cell)."""
    cells = tf.select(
        "tok",
        "tf",
        F.explode(F.array(*[F.lit(d) for d in range(CMS_DEPTH)])).alias("d"),
    ).select("tok", "tf", "d", cms_bucket(F.col("tok"), F.col("d")))
    return cells.groupBy("d", "bucket").agg(F.sum("tf").cast("bigint").alias("cell"))


@query(
    "sk_cms_heavy_hitters",
    f"""
WITH toks AS (SELECT UNNEST({_LTOKS}) AS tok FROM documents),
tf AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS tf FROM toks GROUP BY tok),
cells AS (
  SELECT tok, tf, d.d,
         CAST(('0x' || substr(md5(tok || '#' || d.d), 1, 8)) AS BIGINT) % {CMS_WIDTH}
           AS bucket
  FROM tf, (SELECT UNNEST([0, 1, 2, 3]) AS d) d
),
sketch AS (
  SELECT d, bucket, CAST(SUM(tf) AS BIGINT) AS cell FROM cells GROUP BY d, bucket
),
est AS (
  SELECT c.tok, MIN(c.tf) AS true_cnt, MIN(s.cell) AS cms_est
  FROM cells c JOIN sketch s ON c.d = s.d AND c.bucket = s.bucket
  GROUP BY c.tok
)
SELECT tok,
       CAST(true_cnt AS BIGINT) AS true_cnt,
       CAST(cms_est AS BIGINT) AS cms_est,
       cms_est >= true_cnt AS never_undercounts
FROM est WHERE true_cnt >= {CMS_HH_MIN}
""",
)
def sk_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter token counts via count-min sketch, with the exact
    count alongside so the one-sided error bound (est >= true, over-
    count <= N*e/WIDTH per row) is visible in the result. Plan: one
    token-key shuffle for the exact tf (kept only to report the bound;
    a pure-sketch pipeline skips it), a constant-size (d, bucket)
    aggregation for the sketch, then a broadcast join of vocab cells
    against the 2048-cell sketch — nothing downstream of the tf agg
    scales with the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(T.lower_tokens(F.col("text"))).alias("tok"))
    tf = toks.groupBy("tok").agg(F.count("*").cast("bigint").alias("tf"))
    cells = tf.select(
        "tok",
        "tf",
        F.explode(F.array(*[F.lit(d) for d in range(CMS_DEPTH)])).alias("d"),
    ).select("tok", "tf", "d", cms_bucket(F.col("tok"), F.col("d")))
    sketch = cells.groupBy("d", "bucket").agg(
        F.sum("tf").cast("bigint").alias("cell")
    )
    est = (
        cells.join(F.broadcast(sketch), ["d", "bucket"])
        .groupBy("tok")
        .agg(
            F.min("tf").cast("bigint").alias("true_cnt"),
            F.min("cell").cast("bigint").alias("cms_est"),
        )
    )
    return est.filter(F.col("true_cnt") >= CMS_HH_MIN).select(
        "tok",
        "true_cnt",
        "cms_est",
        (F.col("cms_est") >= F.col("true_cnt")).alias("never_undercounts"),
    )
