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
from ..plans.registry import ORACLES, query
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
    return cms_report(tf, cms_sketch(tf))


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


# --- incremental CMS maintenance: the streamed sketch registry ----------------
#
# The maintained-artifact pattern (similarity.py's IVF/IVFPQ/LSH index
# lifecycle) applied to the sketch family — with a STRONGER guarantee.
# Index rows have identities, so a replayed batch can be healed by key
# dedup or fenced by a compaction epoch; sketch cells are SUMS, where a
# double-counted replay is unhealable silent corruption. The registry
# therefore makes replays exactly-once BY CONSTRUCTION:
#
#   <dir>/parts/bid=N/        per-batch PARTIAL sketches (<= DEPTH*WIDTH
#                             rows each, whatever the batch size) landed
#                             by cms_append via dynamic (bid) overwrite
#   <dir>/consolidated.<tag>/ one merged partial of absorbed batches
#   <dir>/_manifest.json      {"tag", "hwm", "base"} — the SINGLE atomic
#                             commit point (write-tmp + fsync + rename +
#                             DIR fsync), a table format's
#                             snapshot-pointer swap
#
# Absorption state is a HIGH-WATERMARK, not a list (r11 review: one
# list entry per micro-batch would grow the manifest and the serve
# predicate with total history forever): every bid <= hwm is absorbed,
# which holds exactly because streaming batch ids are assigned
# monotonically and cms_compact absorbs ALL live bids at once. The
# corollary contract: a bid number must never be INTRODUCED at or
# below the current hwm with new data (stream replays of committed
# batches are fine — that is the exclusion working as designed).
#
# Serving merges consolidated.<manifest.tag> with every bid > hwm; a
# replay of an absorbed bid re-creates its parts dir but is excluded by
# the watermark at every commit point, and the next compact deletes it
# without re-absorbing. cms_compact publishes the new consolidated
# partial FULLY before the manifest rename, so a crash at any point
# leaves the previous snapshot served intact and only garbage (swept on
# the next call) behind.

_CMS_MANIFEST = "_manifest.json"


def cms_partial(docs: DataFrame) -> DataFrame:
    """The constant-size CMS partial of a document batch: token counts
    folded into the DEPTH x WIDTH grid. Map-side combinable twice
    (token tf, then cell sum); <= DEPTH*WIDTH rows out regardless of
    batch size — the whole point of appending sketches instead of
    rescanning the corpus."""
    toks = docs.select(F.explode(T.lower_tokens(F.col("text"))).alias("tok"))
    tf = toks.groupBy("tok").agg(F.count("*").cast("bigint").alias("tf"))
    return cms_sketch(tf)


def cms_report(tf: DataFrame, sketch: DataFrame) -> DataFrame:
    """THE heavy-hitter report surface shared by the monolithic and the
    incremental query (and the machinery test): estimate each vocab
    token against the 2048-cell sketch (broadcast), keep tokens with
    true count >= CMS_HH_MIN, emit the one-sided error bound column.
    One definition, like cms_cells — a report-surface fork between the
    two oracle-hash-checked paths would silently break the
    merge-exactness proof (r11 review)."""
    est = (
        cms_cells(tf)
        .join(F.broadcast(sketch), ["d", "bucket"])
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


def _cms_manifest(registry_dir: str) -> dict:
    """Current snapshot pointer: {"tag": str | None, "hwm": int | None,
    "base": bool}. ``hwm`` is the absorption high-watermark (every bid
    <= hwm is absorbed; None = nothing absorbed); ``base`` records that
    the build's corpus partial (bid -1) has been absorbed, so build
    idempotency survives compaction sweeping the bid dir. Missing file
    = fresh registry; an unreadable/corrupt file RAISES — a snapshot
    pointer must fail closed (serving from a guessed state could
    double-count absorbed bids)."""
    import json
    import os

    path = os.path.join(registry_dir, _CMS_MANIFEST)
    if not os.path.isfile(path):
        return {"tag": None, "hwm": None, "base": False}
    with open(path) as fh:
        m = json.load(fh)
    if not {"tag", "hwm", "base"} <= set(m):
        raise ValueError(f"corrupt CMS registry manifest under {registry_dir}")
    return m


def _cms_publish_manifest(registry_dir: str, manifest: dict) -> None:
    """Atomic snapshot-pointer swap: write-tmp + file fsync + rename +
    DIRECTORY fsync. The dir fsync is load-bearing (r11 review): the
    rename is directory metadata, and without forcing it to disk a
    power cut after cms_compact's destructive sweep could recover the
    OLD manifest pointing at a deleted consolidated dir — the crash
    guarantee requires the pointer to be durable BEFORE anything it
    supersedes is removed."""
    import json
    import os

    tmp = os.path.join(registry_dir, f".{_CMS_MANIFEST}.tmp.{os.getpid()}")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
        fh.flush()
        os.fsync(fh.fileno())
    os.rename(tmp, os.path.join(registry_dir, _CMS_MANIFEST))
    dfd = os.open(registry_dir, os.O_RDONLY)
    try:
        os.fsync(dfd)
    finally:
        os.close(dfd)


def cms_registry_build(spark: SparkSession, sf_dir: str, registry_dir: str) -> str:
    """Initialize a CMS registry from a standing corpus: the corpus's
    partial lands through the ordinary append path (one lifecycle
    covers build and maintenance) under the RESERVED bid -1 — streaming
    batch ids start at 0, so the base partial can never collide with
    (and be dynamically overwritten by) a stream's first micro-batch;
    the twin test caught exactly that with a bid-0 build. Idempotency
    checks the manifest's ``base`` flag as well as the bid dir: after a
    compact absorbs and sweeps bid -1, a restart must NOT re-sketch the
    whole corpus (the exact corpus-width work the registry exists to
    avoid; r11 review). Refuses a registry that has absorbed batches
    but never a base (hwm set, base False): bid -1 would land at or
    below the watermark, be excluded from serving, and be swept by the
    next compact — the corpus partial silently lost (r12 fence)."""
    import os

    os.makedirs(registry_dir, exist_ok=True)
    m = _cms_manifest(registry_dir)
    if m["base"] or os.path.isdir(
        os.path.join(registry_dir, "parts", "bid=-1")
    ):
        return registry_dir
    if m["hwm"] is not None:
        from .similarity import CompactionFenceError

        raise CompactionFenceError(
            f"CMS registry {registry_dir} has absorbed batches up to "
            f"hwm={m['hwm']} but no base partial: building now would "
            "introduce bid -1 at or below the watermark, where serving "
            "excludes it and the next compact sweeps it — the corpus "
            "partial would be silently lost. Build into a fresh "
            "registry dir instead."
        )
    docs = load_table(spark, sf_dir, "documents")
    cms_append(spark, registry_dir, docs, batch_id=-1)
    return registry_dir


def cms_append(
    spark: SparkSession, registry_dir: str, docs: DataFrame, batch_id: int
) -> DataFrame:
    """Append a document batch's CMS partial under parts/bid=batch_id
    (dynamic partition overwrite — an at-least-once replay rewrites
    exactly its own bid with identical deterministic content) and
    return the READ-BACK landed partial (the durable truth a replay
    would serve). An empty batch short-circuits to an empty partial
    (a dynamic overwrite of an empty frame creates no bid dir and the
    read-back would raise PATH_NOT_FOUND — the ivf_append lesson).

    No epoch fence needed, unlike the index appends: a replay of an
    ALREADY-ABSORBED bid re-creates the parts dir, but serving excludes
    it through the manifest watermark at every commit point and the
    next compact deletes it without re-absorbing — exactly-once by
    construction, not by healing. The single-writer rules that remain:
    don't run compact against an append of an IN-FLIGHT bid (the index
    families' quiesce contract), and never introduce a NEW bid at or
    below the manifest hwm (a stream CONTINUING from its checkpoint
    can't — batch ids are monotonic per checkpoint — but a stream
    restarted with a FRESH checkpoint on a maintained registry would;
    run_incremental_cms_stream refuses that start)."""
    import os

    if docs.isEmpty():
        return spark.createDataFrame([], "d int, bucket bigint, cell bigint")
    partial = cms_partial(docs).withColumn(
        "bid", F.lit(int(batch_id)).cast("bigint")
    )
    out = os.path.join(registry_dir, "parts")
    (
        partial.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bid")
        .parquet(out)
    )
    # Guard the thing actually WRITTEN, not just the input row count: a
    # non-empty batch whose texts all tokenize to nothing (e.g. every
    # text NULL — lower_tokens(NULL) explodes to zero rows) produces a
    # zero-row partial, the dynamic overwrite creates no bid dir, and
    # an unguarded read-back would fail the stream with PATH_NOT_FOUND
    # on a batch that is semantically a no-op.
    landed = os.path.join(out, f"bid={int(batch_id)}")
    if not os.path.isdir(landed):
        return spark.createDataFrame([], "d int, bucket bigint, cell bigint")
    return spark.read.parquet(landed).select("d", "bucket", "cell")


def _cms_frames(spark: SparkSession, registry_dir: str, m: dict) -> list:
    """The snapshot's merge inputs: consolidated.<tag> plus the live
    (bid > hwm) slice of parts/. The watermark filter is a RANGE
    predicate on the bid partition column — file-level pruning, O(1)
    however long the registry has lived (r11 review replaced the
    unbounded absorbed-list NOT-isin with this)."""
    import os

    frames = []
    if m["tag"] is not None:
        frames.append(
            spark.read.parquet(
                os.path.join(registry_dir, f"consolidated.{m['tag']}")
            ).select("d", "bucket", "cell")
        )
    parts_dir = os.path.join(registry_dir, "parts")
    # guard the empty-dir case (every bid absorbed and swept): parquet
    # schema inference fails on a directory with no files
    if os.path.isdir(parts_dir) and any(
        d.startswith("bid=") for d in os.listdir(parts_dir)
    ):
        parts = spark.read.parquet(parts_dir)
        if m["hwm"] is not None:
            parts = parts.filter(F.col("bid") > m["hwm"])
        frames.append(parts.select("d", "bucket", "cell"))
    return frames


def cms_registry_sketch(spark: SparkSession, registry_dir: str) -> DataFrame:
    """The servable merged sketch: consolidated.<manifest.tag> plus
    every live (bid > hwm) partition, summed cell-wise. The merge input
    is <= (#live bids + 1) * DEPTH * WIDTH rows — constant in corpus
    size, linear only in batches-since-compact.

    Reader contract: the returned frame is bound to the snapshot
    current at CALL time (manifest read eagerly, file paths resolved at
    the action). A cms_compact committing in between sweeps the old
    consolidated dir and absorbed parts, so a stale frame's action
    fails LOUDLY with a missing-path error — never silently wrong
    cells. Materialize (collect/write) before compacting, the read
    half of the single-writer rule; snapshot retention for concurrent
    readers is a table format's job, not this registry's."""
    m = _cms_manifest(registry_dir)
    frames = _cms_frames(spark, registry_dir, m)
    if not frames:
        return spark.createDataFrame([], "d int, bucket bigint, cell bigint")
    merged = frames[0]
    for f in frames[1:]:
        merged = merged.unionByName(f)
    return merged.groupBy("d", "bucket").agg(
        F.sum("cell").cast("bigint").alias("cell")
    )


def cms_compact(spark: SparkSession, registry_dir: str) -> bool:
    """Fold every live bid partial into a new consolidated partial and
    advance the manifest — bounding the serve-time merge width after
    long append runs. Commit discipline (the snapshot-pointer swap):

    1. LIST the live bids (> hwm) once, then merge consolidated.<old>
       with exactly that pinned set — filtering the fold input to the
       listed bids, NOT re-listing at Spark-action time, so a new bid
       landed by a concurrent append between the listing and the write
       is neither folded nor watermarked and simply stays live (r11
       review: the unpinned version folded it but left it outside
       ``absorbed`` — double-counted forever);
    2. write consolidated.<newtag> (a fresh uniquely-tagged dir:
       nothing serves it yet);
    3. atomically publish the manifest naming <newtag> with hwm
       advanced to max(live) — THE commit point (file + dir fsync): a
       crash anywhere before leaves the old snapshot served intact,
       the new dir being unreferenced garbage;
    4. sweep garbage: consolidated.* with other tags, parts dirs at or
       below the new hwm (replay residue included), stale manifest
       tmps. A crash mid-sweep leaves only re-sweepable leftovers.

    Returns False when there is nothing to fold or sweep.

    Writer concurrency (r12, mirroring the index families'
    _check_epoch/_post_write_fence — with the same honest limits):
    the manifest is re-read immediately before the publish rename
    (compare-and-swap — refuse when it changed since the fold read it)
    and again before the destructive sweep (post-write withdrawal —
    refuse when another writer's publish superseded ours). A racing
    second MANIFEST writer therefore fails loudly with
    CompactionFenceError in every interleaving the checks can observe,
    leaving only re-sweepable garbage. Two windows remain open by
    design and the single-writer deployment contract covers them, as
    it does for the index compacts: (1) the fence only sees MANIFEST
    writers — an append (including cms_registry_build's bid=-1 base
    partial) that lands between the live listing and the publish is
    protected by the fold pinning (it stays live, never double-
    counted) but a base partial landing there would be watermarked
    below hwm and swept, which is why in-flight appends vs compact
    remain under the quiesce contract and a build STARTED after
    absorption fails loudly in cms_registry_build instead; (2) the
    check-then-act gaps between the CAS re-read and the rename, and
    between the withdrawal re-read and each rmtree, are narrowed, not
    closed — closing them needs mutual exclusion the filesystem
    cannot give a multi-machine deployment, so schedule compacts from
    one place. In-flight READER frames from before the commit fail
    loudly rather than serve stale cells (see cms_registry_sketch).
    Tags are monotonic per registry (similarity._next_tag).
    Operations runbook: MAINTENANCE.md."""
    import os
    import re
    import shutil

    from .similarity import CompactionFenceError, _next_tag

    m = _cms_manifest(registry_dir)
    parts_dir = os.path.join(registry_dir, "parts")
    live, residue = [], []
    if os.path.isdir(parts_dir):
        for d in os.listdir(parts_dir):
            mm = re.fullmatch(r"bid=(-?\d+)", d)
            if not mm:
                continue
            b = int(mm.group(1))
            # residue = an already-absorbed bid re-created by a replay:
            # never re-absorbed (that would double-count), only swept
            if m["hwm"] is not None and b <= m["hwm"]:
                residue.append(b)
            else:
                live.append(b)
    garbage = [
        d
        for d in os.listdir(registry_dir)
        if d.startswith("consolidated.")
        and (m["tag"] is None or d != f"consolidated.{m['tag']}")
    ]
    if not live and not garbage and not residue:
        return False
    new_hwm = m["hwm"]
    if live:
        # pin the fold input to the LISTED bids (see step 1 above)
        frames = []
        if m["tag"] is not None:
            frames.append(
                spark.read.parquet(
                    os.path.join(registry_dir, f"consolidated.{m['tag']}")
                ).select("d", "bucket", "cell")
            )
        frames.append(
            spark.read.parquet(parts_dir)
            .filter(F.col("bid").isin(live))
            .select("d", "bucket", "cell")
        )
        merged = frames[0]
        for f in frames[1:]:
            merged = merged.unionByName(f)
        merged = merged.groupBy("d", "bucket").agg(
            F.sum("cell").cast("bigint").alias("cell")
        )
        tag = _next_tag(registry_dir)
        merged.write.mode("overwrite").parquet(
            os.path.join(registry_dir, f"consolidated.{tag}")
        )
        new_hwm = max(live) if m["hwm"] is None else max(m["hwm"], max(live))
        # compare-and-swap: the fold and the new consolidated dir are
        # only coherent against the snapshot the live listing came
        # from — if another writer advanced the manifest meanwhile,
        # publishing would watermark bids we never folded (or orphan
        # the other writer's consolidated dir). Refuse; our dir stays
        # unreferenced garbage for the next compact to sweep.
        cur = _cms_manifest(registry_dir)
        if cur != m:
            raise CompactionFenceError(
                f"CMS compact fenced on {registry_dir}: manifest "
                f"changed from {m} to {cur} since the fold read it "
                "(concurrent writer); this compact's output is "
                "unreferenced and will be swept"
            )
        published = {"tag": tag, "hwm": new_hwm, "base": m["base"] or -1 in live}
        _cms_publish_manifest(registry_dir, published)
        m = published
    # post-write withdrawal before the DESTRUCTIVE sweep: if another
    # writer's publish superseded the snapshot we are about to sweep
    # under, deleting "non-current" dirs would garbage-collect the
    # winner's consolidated dir — fail loudly instead.
    cur = _cms_manifest(registry_dir)
    if cur != m:
        raise CompactionFenceError(
            f"CMS compact fenced on {registry_dir}: manifest changed "
            f"from {m} to {cur} before the sweep (concurrent writer "
            "won the publish); leaving the sweep to the winner"
        )
    # sweep under the NEW (durably committed) snapshot: stale
    # consolidated dirs, absorbed bid partials, dead manifest tmps
    for d in os.listdir(registry_dir):
        keep = None if m["tag"] is None else f"consolidated.{m['tag']}"
        if d.startswith("consolidated.") and d != keep:
            shutil.rmtree(os.path.join(registry_dir, d), ignore_errors=True)
        if d.startswith(f".{_CMS_MANIFEST}.tmp."):
            try:
                os.remove(os.path.join(registry_dir, d))
            except OSError:
                pass
    if os.path.isdir(parts_dir) and m["hwm"] is not None:
        for d in os.listdir(parts_dir):
            mm = re.fullmatch(r"bid=(-?\d+)", d)
            if mm and int(mm.group(1)) <= m["hwm"]:
                shutil.rmtree(os.path.join(parts_dir, d), ignore_errors=True)
    return True


def run_incremental_cms_stream(
    spark: SparkSession,
    registry_dir: str,
    source: DataFrame,
    timeout_s: int = 300,
    checkpoint_dir: str | None = None,
):
    """Streaming twin of the CMS registry maintenance: arriving
    document batches stream through a foreachBatch cms_append, each
    landing its constant-size partial under bid=batch_id. No frozen
    state to snapshot at open (the grid is code constants) and no
    fence to carry for REPLAYS (those are exactly-once through the
    manifest watermark); restart resumes from the committed batch like
    the index twins.

    One start is refused (r12, ADVICE + review): a FRESH checkpoint
    against a registry that already carries stream batches — either
    ABSORBED (manifest hwm >= 0: the new stream would reassign ids
    from 0, land partials at or below the watermark, and have them
    silently excluded from serving and swept — unhealable loss) or
    still LIVE (parts/bid>=0 dirs: the new stream's bid-keyed dynamic
    overwrites would silently REPLACE the old stream's partials with
    different content). A base-only registry (bid -1 live, or
    hwm == -1 after the build's partial was absorbed) starts cleanly:
    a fresh stream's ids begin at 0, strictly above anything present.
    Continue from the existing checkpoint, or build a fresh REGISTRY
    for a genuinely new stream."""
    import os
    import re as _re

    from .similarity import _checkpoint_resumed

    ckpt = checkpoint_dir or os.path.join(registry_dir, "_part_ckpt")
    # committed offsets, not bare directory existence, mark a resumed
    # stream — an empty pre-created dir still assigns ids from 0
    # (r12 review; _checkpoint_resumed is the shared proxy of all four
    # stream-twin fences)
    if not _checkpoint_resumed(ckpt):
        m = _cms_manifest(registry_dir)
        absorbed_stream = m["hwm"] is not None and m["hwm"] >= 0
        parts_dir = os.path.join(registry_dir, "parts")
        live_stream = os.path.isdir(parts_dir) and any(
            (mm := _re.fullmatch(r"bid=(-?\d+)", d)) and int(mm.group(1)) >= 0
            for d in os.listdir(parts_dir)
        )
        if absorbed_stream or live_stream:
            from .similarity import CompactionFenceError

            raise CompactionFenceError(
                f"fresh checkpoint {ckpt} against maintained CMS "
                f"registry {registry_dir} (hwm={m['hwm']}, live stream "
                f"bids present: {live_stream}): the stream would assign "
                "batch ids from 0, colliding with batches this registry "
                "already carries — absorbed partials would be silently "
                "excluded and swept, live ones silently overwritten. "
                "Reuse the original checkpoint directory, or build a "
                "fresh registry for a new stream."
            )

    def append(batch_df: DataFrame, batch_id: int) -> None:
        cms_append(spark, registry_dir, batch_df, batch_id)

    from .similarity import _run_append_stream

    return _run_append_stream(source, append, ckpt, timeout_s)


def _cms_incremental_oracle() -> str:
    # identical to sk_cms_heavy_hitters' oracle BY DESIGN: cell sums
    # are associative, so the merged-partials sketch is bit-equal to
    # the monolithic one — the driver proves merge-exactness by
    # hashing both paths against one SQL
    return ORACLES["sk_cms_heavy_hitters"]


# Registered in round 12 alongside sim_lsh_incremental (built + locally
# oracle-proven in r11; the decorator was deferred only for the r11
# window cap). Oracle equality was pinned locally by
# tests/test_sketches.py's driver-grade compare before the first
# driver check, so registration is evidence-only.
@query("sk_cms_incremental", _cms_incremental_oracle())
def sk_cms_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter report from an INCREMENTALLY MERGED sketch: split
    the corpus (doc_id mod 2), sketch each half independently, merge
    cell-wise, and report exactly like sk_cms_heavy_hitters (through
    the shared cms_report surface). Because cell sums are associative
    the output is IDENTICAL to the monolithic query — the oracle is
    literally the same SQL, so the driver check proves
    MERGE-EXACTNESS: per-shard / per-day / per-batch sketches combine
    without reprocessing raw data and lose nothing. This is
    cms_append's arithmetic — the machinery test asserts the persisted
    registry path (cms_registry_build on half 0 + cms_append of half 1
    + cms_registry_sketch) serves exactly this merged sketch.

    Scale shape: each half collapses map-side to <= DEPTH*WIDTH cells
    before any shuffle; the merge is a constant-size aggregation. The
    exact-tf side (true_cnt, kept to report the one-sided error bound)
    is the only corpus-width shuffle, exactly as in the monolithic
    query; a pure-sketch pipeline skips it. At 100 TB: yesterday's
    documents are never re-tokenized — vocabulary statistics stream in
    at constant per-batch cost, the dd_incremental story for
    frequency sketches."""
    docs = load_table(spark, sf_dir, "documents")
    halves = [docs.filter(F.col("doc_id") % 2 == r) for r in (0, 1)]
    merged = (
        cms_partial(halves[0])
        .unionByName(cms_partial(halves[1]))
        .groupBy("d", "bucket")
        .agg(F.sum("cell").cast("bigint").alias("cell"))
    )
    toks = docs.select(F.explode(T.lower_tokens(F.col("text"))).alias("tok"))
    tf = toks.groupBy("tok").agg(F.count("*").cast("bigint").alias("tf"))
    return cms_report(tf, merged)
