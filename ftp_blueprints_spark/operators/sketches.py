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


def cms_cells(tf: DataFrame) -> DataFrame:
    """Per-(token, depth) bucket assignments from a (tok, tf) frequency
    table: (tok, tf, d, bucket) — the pre-aggregation sketch input,
    exposed separately so consumers that also need the cell lookup
    (sk_cms_heavy_hitters' est join) reuse ONE definition."""
    return tf.select(
        "tok",
        "tf",
        F.explode(F.array(*[F.lit(d) for d in range(CMS_DEPTH)])).alias("d"),
    ).select("tok", "tf", "d", cms_bucket(F.col("tok"), F.col("d")))


def cms_sketch(tf: DataFrame) -> DataFrame:
    """DEPTH x WIDTH count-min sketch from a (tok, tf) frequency table.
    Returns <= DEPTH*WIDTH rows: (d, bucket, cell)."""
    return (
        cms_cells(tf)
        .groupBy("d", "bucket")
        .agg(F.sum("tf").cast("bigint").alias("cell"))
    )


@query(
    "sk_cms_heavy_hitters",
    f"""
WITH toks AS (SELECT UNNEST({_LTOKS}) AS tok FROM documents),
tf AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS tf FROM toks GROUP BY tok),
cells AS (
  SELECT tok, tf, d.d,
         CAST(('0x' || substr(md5(tok || '#' || d.d), 1, 8)) AS BIGINT) % {CMS_WIDTH}
           AS bucket
  FROM tf, (SELECT UNNEST([{", ".join(map(str, range(CMS_DEPTH)))}]) AS d) d
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
    cells = cms_cells(tf)
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


# --- Bloom-filter membership: the constant-size decontamination path --------

BLOOM_M = 8192  # bits
BLOOM_K = 3  # hash functions

# shared with tx_decontaminate so both paths scrub the same eval set
from ..plans.text_queries import EVAL_MOD, EVAL_REM, SHINGLE_N  # noqa: E402


def _bloom_bit(s: Column, j: Column) -> Column:
    h = F.md5(F.concat(s, F.lit("#"), j.cast("string")))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % BLOOM_M).alias(
        "bit"
    )


def _shingles(docs: DataFrame, keys: tuple[str, ...] = ("doc_id",)) -> DataFrame:
    """(*keys, sh): token SHINGLE_N-grams, same construction as
    tx_decontaminate (docs shorter than SHINGLE_N yield no rows)."""
    toks = docs.select(*keys, T.lower_tokens(F.col("text")).alias("t"))
    return toks.select(
        *keys,
        F.explode(
            F.when(
                F.size("t") >= SHINGLE_N,
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - (SHINGLE_N - 1)),
                    lambda i: F.concat_ws(" ", F.slice(F.col("t"), i, SHINGLE_N)),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("sh"),
    )


@query(
    "sk_bloom_decontaminate",
    f"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
  FROM documents
),
sh AS (
  SELECT doc_id, array_to_string(t[i:i+{SHINGLE_N - 1}], ' ') AS sh
  FROM toks, UNNEST(range(1, len(t) - {SHINGLE_N - 2})) AS u(i)
  WHERE len(t) >= {SHINGLE_N}
),
eval_bits AS (
  SELECT DISTINCT
         CAST(('0x' || substr(md5(sh || '#' || j.j), 1, 8)) AS BIGINT) % {BLOOM_M}
           AS bit
  FROM (SELECT DISTINCT sh FROM sh WHERE doc_id % {EVAL_MOD} = {EVAL_REM}) e,
       (SELECT UNNEST([{", ".join(map(str, range(BLOOM_K)))}]) AS j) j
),
probes AS (
  SELECT s.doc_id, s.sh,
         CAST(('0x' || substr(md5(s.sh || '#' || j.j), 1, 8)) AS BIGINT) % {BLOOM_M}
           AS bit
  FROM (SELECT DISTINCT doc_id, sh FROM sh
        WHERE doc_id % {EVAL_MOD} <> {EVAL_REM}) s,
       (SELECT UNNEST([{", ".join(map(str, range(BLOOM_K)))}]) AS j) j
),
sh_hits AS (
  SELECT p.doc_id, p.sh,
         CAST(COUNT(*) FILTER (WHERE b.bit IS NOT NULL) = {BLOOM_K} AS INTEGER)
           AS maybe
  FROM probes p LEFT JOIN eval_bits b ON p.bit = b.bit
  GROUP BY p.doc_id, p.sh
),
flags AS (
  SELECT doc_id,
         CAST(MAX(maybe) AS INTEGER) AS bloom_flagged,
         CAST(SUM(maybe) AS BIGINT) AS n_maybe_shingles
  FROM sh_hits GROUP BY doc_id
),
exact AS (
  SELECT DISTINCT s.doc_id
  FROM sh s
  JOIN (SELECT DISTINCT sh FROM sh WHERE doc_id % {EVAL_MOD} = {EVAL_REM}) e
    USING (sh)
  WHERE s.doc_id % {EVAL_MOD} <> {EVAL_REM}
)
SELECT f.doc_id, f.n_maybe_shingles, f.bloom_flagged,
       CAST(e.doc_id IS NOT NULL AS INTEGER) AS is_contaminated_exact,
       CAST(f.bloom_flagged = 1 AND e.doc_id IS NULL AS INTEGER) AS false_positive
FROM flags f LEFT JOIN exact e USING (doc_id)
""",
)
def sk_bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination through a BLOOM_M-bit / BLOOM_K-hash Bloom
    filter instead of broadcasting raw eval shingles: when the held-out
    set is too large to ship verbatim, its shingles compress to a
    constant-size bit set (<= BLOOM_M rows however big the eval corpus
    gets) that broadcast-joins against the training shingle stream —
    the corpus side still never shuffles for the membership test, and
    per-shard bit sets merge by union. One-sided error by construction:
    every truly contaminated doc is flagged (no false negatives); the
    query emits the exact verdict alongside so the false-positive rate
    (~(1-e^{{-kn/m}})^k per probe) is measurable in the result. Docs
    with fewer than SHINGLE_N tokens have nothing to probe and yield no
    row (same domain as sh_hits on both engines).

    The probe stream MUST be distinct per (doc, shingle) before fanning
    out the BLOOM_K hash indices: the membership test is "all BLOOM_K
    bits set" counted as matched join rows, so a shingle occurring k
    times in a doc would contribute 3k matched rows, fail the == 3
    equality, and turn a true hit into a false negative — the exact
    error class the Bloom guarantee forbids."""
    return bloom_decontaminate(load_table(spark, sf_dir, "documents"))


def bloom_decontaminate(docs: DataFrame) -> DataFrame:
    """Operator body of sk_bloom_decontaminate over an arbitrary
    (doc_id, text) DataFrame — separated so tests can drive crafted
    corpora (e.g. the repeated-shingle false-negative regression)
    through the exact production plan."""
    is_eval = (F.col("doc_id") % EVAL_MOD) == EVAL_REM
    sh = _shingles(docs)
    js = F.array(*[F.lit(j) for j in range(BLOOM_K)])
    eval_bits = (
        sh.filter(is_eval)
        .select("sh")
        .distinct()
        .select(F.explode(js).alias("j"), "sh")
        .select(_bloom_bit(F.col("sh"), F.col("j")))
        .distinct()
    )
    probes = (
        sh.filter(~is_eval)
        .select("doc_id", "sh")
        .distinct()
        .select("doc_id", "sh", F.explode(js).alias("j"))
        .select("doc_id", "sh", _bloom_bit(F.col("sh"), F.col("j")))
    )
    sh_hits = (
        probes.join(
            F.broadcast(eval_bits.withColumn("set_bit", F.lit(1))), "bit", "left"
        )
        .groupBy("doc_id", "sh")
        .agg(
            (F.count("set_bit") == BLOOM_K).cast("int").alias("maybe")
        )
    )
    flags = sh_hits.groupBy("doc_id").agg(
        F.max("maybe").cast("int").alias("bloom_flagged"),
        F.sum("maybe").cast("bigint").alias("n_maybe_shingles"),
    )
    eval_sh = sh.filter(is_eval).select("sh").distinct()
    exact = (
        sh.filter(~is_eval)
        .join(F.broadcast(eval_sh), "sh", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("exact_hit", F.lit(1))
    )
    return flags.join(exact, "doc_id", "left").select(
        "doc_id",
        "n_maybe_shingles",
        "bloom_flagged",
        F.coalesce(F.col("exact_hit"), F.lit(0)).cast("int").alias(
            "is_contaminated_exact"
        ),
        ((F.col("bloom_flagged") == 1) & F.col("exact_hit").isNull())
        .cast("int")
        .alias("false_positive"),
    )


# --- KMV (k-minimum-values) distinct-count sketch ---------------------------

KMV_K = 64  # kept minima per group; stderr ~ 1/sqrt(K-2) ~ 12.7%
_KMV_HASH_SPACE = 1 << 48  # h = first 12 md5 hex chars -> uniform in [0, 2^48)


@query(
    "sk_kmv_distinct",
    f"""
WITH toks AS (
  SELECT source, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
  FROM documents
),
sh AS (
  SELECT source, array_to_string(t[i:i+{SHINGLE_N - 1}], ' ') AS sh
  FROM toks, UNNEST(range(1, len(t) - {SHINGLE_N - 2})) AS u(i)
  WHERE len(t) >= {SHINGLE_N}
),
hs AS (
  SELECT DISTINCT source,
         CAST(('0x' || substr(md5(sh), 1, 12)) AS BIGINT) AS h
  FROM sh
),
ranked AS (
  SELECT source, h, ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS rn
  FROM hs
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_kept,
       CAST(MAX(h) AS BIGINT) AS kth_hash,
       CAST(CASE WHEN COUNT(*) < {KMV_K} THEN COUNT(*)
                 ELSE {(KMV_K - 1) * _KMV_HASH_SPACE} // MAX(h) END
            AS BIGINT) AS est_distinct
FROM ranked WHERE rn <= {KMV_K}
GROUP BY source
""",
)
def sk_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source distinct-shingle cardinality via a KMV sketch
    (Bar-Yossef et al. 2002): hash every distinct token 3-gram
    uniformly into [0, 2^48), keep the K smallest hashes per group,
    estimate distinct as (K-1) * 2^48 / h_(K) — pure integer arithmetic
    on the portable md5-prefix hash, so unlike approx_count_distinct
    (HLL internals are engine-specific) the driver hash-checks the
    sketch EXACTLY. Shingles, not tokens, because distinct-shingle
    counts are what near-dup/decontamination budgeting needs — and the
    synthetic corpus's token vocab (~30) would degenerate to the exact
    path, while its thousands of shingles exercise the estimator.

    Scale: one (source, h) distinct shuffle with map-side partial
    aggregation, then the per-group K minima run as WindowGroupLimit —
    each mapper ships <= K rows per group, so the final exchange
    carries O(groups * K) regardless of corpus size. KMV sketches from
    disjoint corpora merge by unioning and re-taking the K minima (the
    property exact COUNT(DISTINCT) lacks); accuracy asserted vs exact
    distinct counts in tests/test_sketches.py."""
    docs = load_table(spark, sf_dir, "documents")
    hs = (
        _shingles(docs, keys=("source",))
        .select(
            "source",
            F.conv(F.substring(F.md5("sh"), 1, 12), 16, 10)
            .cast("bigint")
            .alias("h"),
        )
        .distinct()
    )
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy("h")
    kept = hs.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= KMV_K
    )
    n_kept = F.count("*")
    kth = F.max("h")
    return kept.groupBy("source").agg(
        n_kept.cast("bigint").alias("n_kept"),
        kth.cast("bigint").alias("kth_hash"),
        F.when(n_kept < KMV_K, n_kept)
        .otherwise(
            F.expr(f"{(KMV_K - 1) * _KMV_HASH_SPACE} DIV max(h)")
        )
        .cast("bigint")
        .alias("est_distinct"),
    )
