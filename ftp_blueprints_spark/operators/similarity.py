"""Similarity search over embedding columns (ArrayType(FloatType)).

- sim_topk_bruteforce: exact top-k cosine — the correctness baseline,
  oracle-checked against DuckDB list arithmetic.
- sim_embedding_neardup: exact near-dup pairs by cosine threshold.
- sim_ann_lsh: random-hyperplane LSH ANN — the 100 TB scale path:
  candidates only form inside matching sign-pattern buckets, so the
  join is bucket-keyed instead of a full cross product. Rows-only
  driver check; recall vs brute force asserted in tests.

All vector math is built-in zip_with/aggregate (functions/vectors.py)
— no Python UDFs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..functions.vectors import cosine, dot
from ..plans.registry import query
from ..session import load_table

N_QUERIES = 5  # query set: the N lowest vec_ids
TOP_K = 10

_COS_SQL = (
    "list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) / "
    "(sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[]))) * "
    "sqrt(list_dot_product(CAST(c.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))))"
)


@query(
    "sim_topk_bruteforce",
    f"""
WITH scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
         ROUND({_COS_SQL}, 6) AS cos_sim
  FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
  WHERE q.vec_id < {N_QUERIES}
)
SELECT * FROM (
  SELECT query_id, cand_id, cos_sim,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, cand_id) AS rank
  FROM scored
) WHERE rank <= {TOP_K}
""",
)
def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-k cosine: broadcast the (tiny) query set against all
    candidates; rank per query. At scale: queries broadcast, candidates
    stay partitioned -> embarrassingly parallel scoring, then a per-query
    top-k window on rounded score with vec_id tiebreak (deterministic)."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    c = emb.select(F.col("vec_id").alias("cand_id"), F.col("embedding").alias("c_emb"))
    scored = (
        F.broadcast(q)
        .join(c, F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            F.round(cosine(F.col("q_emb"), F.col("c_emb")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("cand_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= TOP_K
    )


NEARDUP_COS = 0.9


@query(
    "sim_embedding_neardup",
    f"""
SELECT q.vec_id AS vec_a, c.vec_id AS vec_b, ROUND({_COS_SQL}, 6) AS cos_sim
FROM embeddings q JOIN embeddings c ON q.vec_id < c.vec_id
WHERE ROUND({_COS_SQL}, 6) >= {NEARDUP_COS}
""",
)
def sim_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact embedding near-dup pairs (cosine >= 0.9). Brute-force
    baseline; the LSH bucket path below is the scale variant."""
    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("q_emb"))
    b = emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("c_emb"))
    cos = F.round(cosine(F.col("q_emb"), F.col("c_emb")), 6)
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", cos.alias("cos_sim"))
        .filter(F.col("cos_sim") >= NEARDUP_COS)
    )


# --- ANN: random-hyperplane LSH ---------------------------------------------

N_PLANES = 12
DIM = 64


def _plane(p: int) -> list[float]:
    """Deterministic pseudo-random hyperplane (no RNG: fixed integer
    mix so every engine/run derives the identical planes)."""
    return [(((p * 37 + d * 101 + 13) * 2654435761) % 1997 - 998) / 998.0 for d in range(DIM)]


def hyperplane_buckets(df: DataFrame, emb_col: str = "embedding") -> DataFrame:
    """Sign-pattern bucket id from N_PLANES literal hyperplanes. The
    planes are literal arrays -> the dot products are codegen'd; no
    join, no shuffle to assign buckets."""
    bucket = None
    for p in range(N_PLANES):
        plane = F.array(*[F.lit(v) for v in _plane(p)])
        bit = F.when(dot(F.col(emb_col), plane) >= 0, F.lit(2**p)).otherwise(0)
        bucket = bit if bucket is None else bucket + bit
    return df.withColumn("bucket", bucket.cast("bigint"))


@query("sim_ann_lsh")  # approximate by construction: rows-only check
def sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-k via hyperplane LSH: score only candidates in the same
    sign-pattern bucket as the query. Recall vs sim_topk_bruteforce is
    asserted in tests/test_similarity.py."""
    emb = hyperplane_buckets(load_table(spark, sf_dir, "embeddings"))
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        "bucket",
    )
    c = emb.select(
        F.col("vec_id").alias("cand_id"), F.col("embedding").alias("c_emb"), "bucket"
    )
    scored = (
        F.broadcast(q)
        .join(c, "bucket")
        .filter(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            F.round(cosine(F.col("q_emb"), F.col("c_emb")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("cand_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= TOP_K
    )
