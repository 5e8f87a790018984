"""Oracle-checked text-analysis queries over `documents` (SURVEY.md §2B
extension surface: token counting, quality scoring, language ID,
fingerprinting). DuckDB SQL mirrors functions/text.py exactly."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..functions import text as T
from ..session import load_table, local_checkpoint
from .registry import query

_TOKS = r"regexp_split_to_array(trim(text), '\s+')"
_LTOKS = r"regexp_split_to_array(trim(lower(text)), '\s+')"


def _sql_count_in(words: tuple[str, ...]) -> str:
    inlist = ", ".join(f"'{w}'" for w in words)
    return f"len(list_filter({_LTOKS}, t -> t IN ({inlist})))"


@query(
    "tx_token_stats",
    f"""
SELECT doc_id,
       len({_TOKS}) AS n_ws_tokens,
       len(regexp_extract_all(text, '{T.BPE_TOKEN_RE}')) AS n_bpe_tokens,
       length(text) AS n_chars_measured,
       ROUND(CAST(length(replace(text, ' ', '')) AS DOUBLE) / len({_TOKS}), 6)
         AS avg_token_len
FROM documents
""",
)
def tx_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + BPE-ish regex tokens."""
    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    return docs.select(
        "doc_id",
        T.token_count(t).alias("n_ws_tokens"),
        F.size(T.bpe_tokens(t)).alias("n_bpe_tokens"),
        F.length(t).alias("n_chars_measured"),
        F.round(
            F.length(F.replace(t, F.lit(" "), F.lit(""))).cast("double")
            / T.token_count(t),
            6,
        ).alias("avg_token_len"),
    )


_STOP_EN = _sql_count_in(T.STOPWORDS["en"])

_QUALITY_SQL = f"""
ROUND(0.4 * LEAST(CAST(len({_TOKS}) AS DOUBLE) / 100.0, 1.0)
    + 0.3 * LEAST(CAST({_STOP_EN} AS DOUBLE) / len({_LTOKS}) * 5.0, 1.0)
    + 0.2 * CAST(length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS DOUBLE) / GREATEST(length(text), 1)
    + 0.1 * (1.0 - CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE) / GREATEST(length(text), 1)), 6)
"""


@query(
    "tx_quality",
    f"""
SELECT doc_id,
       ROUND(CAST({_STOP_EN} AS DOUBLE) / len({_LTOKS}), 6) AS stop_ratio,
       ROUND(CAST(length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS DOUBLE) / GREATEST(length(text), 1), 6) AS alpha_ratio,
       ROUND(CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE) / GREATEST(length(text), 1), 6) AS punct_ratio,
       {_QUALITY_SQL} AS quality_score
FROM documents
""",
)
def tx_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length / stopword / alphabetic / punctuation."""
    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    return docs.select(
        "doc_id",
        F.round(T.stopword_ratio(t), 6).alias("stop_ratio"),
        F.round(T.alpha_ratio(t), 6).alias("alpha_ratio"),
        F.round(T.punct_ratio(t), 6).alias("punct_ratio"),
        T.quality_score(t).alias("quality_score"),
    )


def _sql_lang_id() -> str:
    c = {k: _sql_count_in(v) for k, v in T.STOPWORDS.items()}
    cjk = r"length(regexp_replace(text, '[\x{4e00}-\x{9fff}]', '', 'g')) < length(text)"
    return f"""
CASE WHEN {cjk} THEN 'zh'
     WHEN {c['en']} >= {c['de']} AND {c['en']} >= {c['es']} AND {c['en']} >= {c['fr']} THEN 'en'
     WHEN {c['de']} >= {c['es']} AND {c['de']} >= {c['fr']} THEN 'de'
     WHEN {c['es']} >= {c['fr']} THEN 'es'
     ELSE 'fr' END
"""


@query(
    "tx_lang_id",
    f"""
SELECT doc_id, lang, {_sql_lang_id()} AS lang_pred,
       lang = ({_sql_lang_id()}) AS is_match
FROM documents
""",
)
def tx_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID vs the labeled lang column."""
    docs = load_table(spark, sf_dir, "documents")
    pred = T.lang_id(F.col("text"))
    return docs.select(
        "doc_id", "lang", pred.alias("lang_pred"), (F.col("lang") == pred).alias("is_match")
    )


@query(
    "tx_fingerprint",
    f"""
SELECT doc_id,
       CAST(list_dot_product(
         list_transform({_TOKS}, t -> ascii(t[1]) * 31 + length(t)),
         range(1, len({_TOKS}) + 1)) AS BIGINT) AS fp
FROM documents
""",
)
def tx_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-weighted rolling-hash document fingerprint."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", T.fingerprint(F.col("text")).alias("fp"))


PREP_MIN_QUALITY = 0.5

_NORM_SHA_SQL = T.NORM_SHA_SQL  # one spelling, shared with the dedup layer


@query(
    "tx_corpus_prep",
    f"""
WITH enriched AS (
  SELECT doc_id, source,
         {_QUALITY_SQL} AS q,
         {_sql_lang_id()} AS lang_pred,
         len({_TOKS}) AS n_tok,
         {_NORM_SHA_SQL} AS sha
  FROM documents
),
filtered AS (SELECT * FROM enriched WHERE q >= {PREP_MIN_QUALITY}),
kept AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY sha ORDER BY doc_id) AS rn
    FROM filtered
  ) WHERE rn = 1
)
SELECT lang_pred, source,
       COUNT(*) AS n_docs_kept,
       CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
       CAST(SUM(CAST(ROUND(q * 1000000) AS BIGINT)) // COUNT(*)
            AS BIGINT) AS avg_quality_micros
FROM kept GROUP BY lang_pred, source
""",
)
def tx_corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed training-data cleaning pipeline in ONE plan:
    quality-score -> threshold filter -> language ID -> normalized
    exact dedup (keep lowest doc_id per digest) -> per-(lang, source)
    corpus stats. Shape at 100 TB: the enrichment is a narrow
    projection (no shuffle), dedup shuffles once on the 256-bit digest
    (window partitions are duplicate groups — tiny by construction),
    and the final agg shuffles pre-combined (lang, source) partials.
    The average is emitted in exact integer micro-units (floor) so the
    hash is engine-neutral."""
    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    norm = F.regexp_replace(F.trim(F.lower(t)), r"\s+", " ")
    # tokenize ONCE (codegen can't CSE the split across lambda
    # boundaries; feeding the array to the *_from variants is ~2x)
    with_toks = docs.select("doc_id", "source", "text", T.lower_tokens(t).alias("lt"))
    lt = F.col("lt")
    enriched = with_toks.select(
        "doc_id",
        "source",
        T.quality_score_from(t, lt).alias("q"),
        T.lang_id_from(t, lt).alias("lang_pred"),
        F.size(lt).alias("n_tok"),
        F.sha2(norm, 256).alias("sha"),
    )
    filtered = enriched.filter(F.col("q") >= PREP_MIN_QUALITY)
    w = Window.partitionBy("sha").orderBy("doc_id")
    kept = filtered.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return kept.groupBy("lang_pred", "source").agg(
        F.count("*").alias("n_docs_kept"),
        F.sum("n_tok").cast("bigint").alias("total_tokens"),
        F.expr(
            "(SUM(CAST(ROUND(q * 1000000) AS BIGINT))) DIV COUNT(*)"
        ).alias("avg_quality_micros"),
    )


@query(
    "tx_lang_agg",
    """
SELECT lang, source, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(CAST(n_chars AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_chars
FROM documents GROUP BY lang, source
""",
)
def tx_lang_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition stats by language and source."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.expr("CAST(SUM(CAST(n_chars AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)").alias(
            "avg_chars"
        ),
    )


@query(
    "tx_dataset_split",
    """
WITH assigned AS (
  SELECT doc_id, lang,
         CASE WHEN substr(md5(text), 1, 1) BETWEEN '0' AND 'b' THEN 'train'
              WHEN substr(md5(text), 1, 1) IN ('c', 'd') THEN 'val'
              ELSE 'test' END AS split
  FROM documents
)
SELECT split, lang, COUNT(*) AS n_docs, MIN(doc_id) AS min_doc_id
FROM assigned GROUP BY split, lang
""",
)
def tx_dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic content-hash train/val/test split (12/2/2 of the
    16 md5 first-nibbles -> 75%/12.5%/12.5%): reproducible across
    engines, runs, and cluster sizes — unlike rng-based sampling — and
    stable under re-partitioning because the assignment depends only on
    document bytes. The shape every training-data pipeline needs for
    leakage-free eval sets; near-dup-aware splitting would route
    dd_neardup_components keepers through the same hash."""
    docs = load_table(spark, sf_dir, "documents")
    nib = F.substring(F.md5("text"), 1, 1)
    split = (
        F.when(nib.between("0", "b"), "train")
        .when(nib.isin("c", "d"), "val")
        .otherwise("test")
    )
    return (
        docs.select("doc_id", "lang", split.alias("split"))
        .groupBy("split", "lang")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("min_doc_id"))
    )


@query(
    "tx_hash_sample",
    """
SELECT doc_id, lang, n_chars
FROM documents
WHERE substr(md5(text), 1, 1) IN ('0', '1')
""",
)
def tx_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 12.5% sample by content hash (md5 first nibble in
    {0,1}): the reproducible-sampling primitive for eval subsets and
    A/B slices. A pure narrow filter — at 100 TB it fuses into the scan
    with no shuffle, and the same predicate selects the same documents
    on any engine or cluster."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.filter(
        F.substring(F.md5("text"), 1, 1).isin("0", "1")
    ).select("doc_id", "lang", "n_chars")


PACK_TOKEN_BUDGET = 512


PACK_BLOCK_DOCS = 256  # docs per independent packing block (doc_id DIV this)

_TX_PACK_ORACLE = f"""
WITH RECURSIVE d AS (
  SELECT doc_id,
         CAST(len(regexp_split_to_array(trim(lower(text)), '\\s+')) AS INT)
           AS n_tok,
         doc_id // {PACK_BLOCK_DOCS} AS blk,
         ROW_NUMBER() OVER (PARTITION BY doc_id // {PACK_BLOCK_DOCS}
                            ORDER BY doc_id) AS rn
  FROM documents
),
walk AS (
  SELECT blk, rn, doc_id, n_tok, 0 AS bin_no, n_tok AS used
  FROM d WHERE rn = 1
  UNION ALL
  SELECT e.blk, e.rn, e.doc_id, e.n_tok,
         CASE WHEN w.used > 0 AND w.used + e.n_tok > {PACK_TOKEN_BUDGET}
              THEN w.bin_no + 1 ELSE w.bin_no END,
         CASE WHEN w.used > 0 AND w.used + e.n_tok > {PACK_TOKEN_BUDGET}
              THEN e.n_tok ELSE w.used + e.n_tok END
  FROM walk w JOIN d e ON e.blk = w.blk AND e.rn = w.rn + 1
)
SELECT blk::VARCHAR || '-' || bin_no::VARCHAR AS bin_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
       MIN(doc_id) AS first_doc_id
FROM walk GROUP BY 1
"""


@query("tx_pack_sequences", _TX_PACK_ORACLE)
def tx_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequence packing: walk documents in doc_id order and
    assign each to the current bin until adding it would exceed
    PACK_TOKEN_BUDGET whitespace tokens, then open a new bin — the
    pretraining-prep operator that turns a corpus into fixed-budget
    training sequences. Bin assignment is a RESETTABLE running sum
    (whether a doc opens a new bin depends on every prior assignment),
    not expressible with plain window SQL — but, like TTL dedup,
    walkable by a recursive CTE, so the driver hash-checks it.

    Packing blocks are FIXED doc_id ranges (doc_id DIV PACK_BLOCK_DOCS)
    rather than Spark partitions: an earlier formulation keyed bins by
    spark_partition_id over repartitionByRange, whose sampled
    boundaries change with cluster size/data layout — fixed blocks make
    bin ids reproducible across engines AND cluster sizes (the same
    determinism contract as the md5-nibble samplers). At 100 TB a
    global sequential pack would serialize the corpus; block-local
    packing wastes at most one bin tail per PACK_BLOCK_DOCS docs and
    every block packs in parallel (one shuffle keyed on blk)."""
    docs = load_table(spark, sf_dir, "documents")
    slim = docs.select(
        "doc_id",
        F.size(T.lower_tokens(F.col("text"))).alias("n_tok"),
        F.expr(f"doc_id DIV {PACK_BLOCK_DOCS}").alias("blk"),
    )

    def pack(pdf):
        pdf = pdf.sort_values("doc_id")
        blk = int(pdf["blk"].iloc[0])
        bin_no, used, bins = 0, 0, []
        for n in pdf["n_tok"]:
            n = int(n)
            if used > 0 and used + n > PACK_TOKEN_BUDGET:
                bin_no += 1
                used = 0
            bins.append(f"{blk}-{bin_no}")
            used += n
        out = pdf[["doc_id", "n_tok"]].copy()
        out["bin_id"] = bins
        return out

    packed = slim.groupBy("blk").applyInPandas(
        pack, "doc_id bigint, n_tok int, bin_id string"
    )
    return packed.groupBy("bin_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("total_tokens"),
        F.min("doc_id").alias("first_doc_id"),
    )


# Per-language sampling rates in 16ths (md5 first nibble < cutoff):
# downsample dominant languages, keep the tail whole.
STRATA_CUTOFFS = {"en": 4, "de": 8, "es": 8, "fr": 8, "zh": 16}


@query(
    "tx_stratified_sample",
    f"""
WITH cut AS (
  SELECT doc_id, lang, n_chars,
         CASE lang WHEN 'en' THEN {STRATA_CUTOFFS['en']}
                   WHEN 'de' THEN {STRATA_CUTOFFS['de']}
                   WHEN 'es' THEN {STRATA_CUTOFFS['es']}
                   WHEN 'fr' THEN {STRATA_CUTOFFS['fr']}
                   ELSE {STRATA_CUTOFFS['zh']} END AS cutoff,
         strpos('0123456789abcdef', substr(md5(text), 1, 1)) - 1 AS nib
  FROM documents
)
SELECT lang, COUNT(*) AS n_sampled, CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM cut WHERE nib < cutoff GROUP BY lang
""",
)
def tx_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: per-language rates expressed
    as md5-nibble cutoffs (en 4/16 = 25%, de/es/fr 50%, zh 100%) — the
    corpus-rebalancing primitive, reproducible across engines and runs
    because membership depends only on content bytes. Narrow filter +
    pre-combined agg: no extra shuffle beyond the final group."""
    docs = load_table(spark, sf_dir, "documents")
    cutoff = F.coalesce(
        *[
            F.when(F.col("lang") == lang, F.lit(cut))
            for lang, cut in STRATA_CUTOFFS.items()
            if lang != "zh"
        ],
        F.lit(STRATA_CUTOFFS["zh"]),
    )
    nib = F.expr("locate(substring(md5(text), 1, 1), '0123456789abcdef') - 1")
    return (
        docs.withColumn("keep", nib < cutoff)
        .filter("keep")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_sampled"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
    )


DOMAIN_CAP_K = 20  # max docs kept per source domain


@query(
    "tx_domain_cap",
    f"""
SELECT doc_id, source, rk FROM (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
  FROM documents
) WHERE rk <= {DOMAIN_CAP_K}
""",
)
def tx_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain document cap (keep <= K docs per source): the
    anti-boilerplate balancing step every crawl-derived corpus needs —
    without it one mega-domain dominates the token mix. Selection is
    deterministic by md5(doc_id) hash order, so the kept set is
    reproducible across engines, runs, and cluster sizes (no RNG).

    Scale shape: rank-per-key with a rank<=K predicate compiles to
    WindowGroupLimit (Spark 3.5+) — each map task keeps only its local
    top-K per source BEFORE the exchange, so the shuffle carries
    O(K x sources x tasks), not the corpus, and a hot domain with 10^9
    docs still moves only K rows per task."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.select("doc_id", "source")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= DOMAIN_CAP_K)
    )


WEIGHTED_SAMPLE_K = 10  # kept docs per language
# 32-bit hash + 2^32 scale: w * 2^32 stays < 2^63 for any w < 2^31 (2 GiB
# of chars — no real document), where the earlier 48-bit formulation
# overflowed BIGINT at w >= 2^15 (a routine 32 KB doc): Spark would wrap
# negative (silently inverting the sample) while DuckDB raises, so the
# bound is load-bearing, not cosmetic. 32 uniform bits are ample for u.
_PRIORITY_SCALE = 1 << 32


@query(
    "tx_weighted_sample",
    f"""
SELECT doc_id, lang, n_chars, priority FROM (
  SELECT doc_id, lang, n_chars,
         CAST(n_chars AS BIGINT) * {_PRIORITY_SCALE}
           // (CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) + 1)
           AS priority,
         ROW_NUMBER() OVER (
           PARTITION BY lang
           ORDER BY CAST(n_chars AS BIGINT) * {_PRIORITY_SCALE}
                      // (CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) + 1)
                      DESC, doc_id) AS rk
  FROM documents
) WHERE rk <= {WEIGHTED_SAMPLE_K}
""",
)
def tx_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-proportional sampling without RNG: priority sampling
    (Duffield, Lund & Thorup 2007) — each doc gets priority w/u with
    w = n_chars and u uniform in (0,1] derived from its content hash;
    the top-K priorities per language form a sample where inclusion
    probability is proportional to length. All arithmetic is exact
    BIGINT (u is the 32-bit md5 prefix + 1; the ratio is one integer
    floor-division; w * 2^32 < 2^63 for every real document — see
    _PRIORITY_SCALE), so ranking is bit-identical across engines — no
    ln()/pow() libm surface, the usual cross-engine hazard of the
    equivalent A-ES exponential-keys scheme.

    Scale shape: priority is a narrow per-row projection on the scan;
    rank<=K compiles to WindowGroupLimit, so each map task forwards at
    most K rows per language into the single exchange."""
    docs = load_table(spark, sf_dir, "documents")
    h = F.conv(F.substring(F.md5("text"), 1, 8), 16, 10).cast("bigint")
    pr = docs.select(
        "doc_id",
        "lang",
        "n_chars",
        (
            (F.col("n_chars").cast("bigint") * F.lit(_PRIORITY_SCALE))
            .cast("bigint")
        ).alias("_num"),
        (h + F.lit(1)).alias("_den"),
    ).select(
        "doc_id",
        "lang",
        "n_chars",
        F.expr("_num DIV _den").alias("priority"),
    )
    w = Window.partitionBy("lang").orderBy(F.desc("priority"), F.asc("doc_id"))
    return (
        pr.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= WEIGHTED_SAMPLE_K)
        .select("doc_id", "lang", "n_chars", "priority")
    )


@query(
    "tx_unigram_scores",
    f"""
WITH toks AS (
  SELECT doc_id, UNNEST(list_distinct({_LTOKS})) AS tok FROM documents
),
df AS (SELECT tok, COUNT(*) AS dfreq FROM toks GROUP BY tok)
SELECT t.doc_id,
       COUNT(*) AS n_distinct_toks,
       CAST(SUM(d.dfreq) AS BIGINT) AS sum_dfreq,
       CAST((SUM(d.dfreq) * 1000000) // COUNT(*) AS BIGINT)
         AS mean_dfreq_micros
FROM toks t JOIN df d ON t.tok = d.tok
GROUP BY t.doc_id
""",
)
def tx_unigram_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-statistical document scoring: the mean document-frequency
    of a document's distinct tokens — the cheap unigram stand-in for a
    language-model quality filter (gibberish and boilerplate sit at the
    frequency extremes). Two-phase: token DF (map-side-combined count
    on the token key) joins back onto the exploded tokens on the SAME
    key, so the exchange is reused; per-doc aggregation is the only
    other shuffle. Integer micro-units; no floats, no libm."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(F.array_distinct(T.lower_tokens(F.col("text")))).alias("tok"),
    )
    df = toks.groupBy("tok").agg(F.count("*").alias("dfreq"))
    return (
        toks.join(df, "tok")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_distinct_toks"),
            F.sum("dfreq").cast("bigint").alias("sum_dfreq"),
            F.expr("CAST((SUM(dfreq) * 1000000) DIV COUNT(*) AS BIGINT)").alias(
                "mean_dfreq_micros"
            ),
        )
    )


@query(
    "tx_repetition",
    f"""
WITH toks AS (
  SELECT doc_id,
         UNNEST(range(1, len({_LTOKS}) + 1)) AS pos,
         UNNEST({_LTOKS}) AS tok
  FROM documents
),
flagged AS (
  SELECT doc_id, pos, tok,
         CASE WHEN tok = LAG(tok) OVER (PARTITION BY doc_id ORDER BY pos)
              THEN 0 ELSE 1 END AS new_run
  FROM toks
),
runs AS (
  SELECT doc_id, tok,
         SUM(new_run) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS UNBOUNDED PRECEDING) AS run_id
  FROM flagged
),
run_lens AS (
  SELECT doc_id, COUNT(*) AS run_len FROM runs GROUP BY doc_id, run_id
)
SELECT t.doc_id,
       CAST(MAX(r.max_run) AS BIGINT) AS max_token_run,
       CAST((COUNT(DISTINCT t.tok) * 1000000) // COUNT(*) AS BIGINT)
         AS distinct_ratio_micros
FROM toks t
JOIN (SELECT doc_id, MAX(run_len) AS max_run FROM run_lens GROUP BY doc_id) r
  ON t.doc_id = r.doc_id
GROUP BY t.doc_id
""",
)
def tx_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality signals: longest same-token run
    (gaps-and-islands over position-exploded tokens) and the
    distinct-token ratio — the standard filters for degenerate
    repetitious text. All work shuffles once on doc_id; every window
    and aggregation reuses that partitioning."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.posexplode(T.lower_tokens(F.col("text"))).alias("pos0", "tok"),
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok")
    wd = Window.partitionBy("doc_id").orderBy("pos")
    flagged = toks.withColumn(
        "new_run",
        F.when(F.col("tok") == F.lag("tok").over(wd), 0).otherwise(1),
    )
    runs = flagged.withColumn(
        "run_id",
        F.sum("new_run").over(wd.rowsBetween(Window.unboundedPreceding, 0)),
    )
    run_lens = runs.groupBy("doc_id", "run_id").agg(F.count("*").alias("run_len"))
    max_runs = run_lens.groupBy("doc_id").agg(F.max("run_len").alias("max_run"))
    stats = toks.groupBy("doc_id").agg(
        F.countDistinct("tok").alias("n_distinct"),
        F.count("*").alias("n_toks"),
    )
    return stats.join(max_runs, "doc_id").select(
        "doc_id",
        F.col("max_run").cast("bigint").alias("max_token_run"),
        F.expr("CAST((n_distinct * 1000000) DIV n_toks AS BIGINT)").alias(
            "distinct_ratio_micros"
        ),
    )


@query(
    "tx_redact",
    """
SELECT doc_id,
       len(regexp_extract_all(text, '[0-9]+')) AS n_redactions,
       sha256(regexp_replace(text, '[0-9]+', '<NUM>', 'g')) AS redacted_sha,
       length(regexp_replace(text, '[0-9]+', '<NUM>', 'g')) AS redacted_len
FROM documents
""",
)
def tx_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pattern redaction (numbers -> <NUM> placeholder): the
    PII-scrubbing shape — count matches, replace globally, digest the
    redacted text for downstream dedup. Pure narrow regexp projection;
    swap the pattern for emails/phones/keys in a real pipeline (the
    digit class is what this synthetic corpus actually contains)."""
    docs = load_table(spark, sf_dir, "documents")
    redacted = F.regexp_replace(F.col("text"), "[0-9]+", "<NUM>")
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("text"), F.lit("[0-9]+"), 0)).alias(
            "n_redactions"
        ),
        F.sha2(redacted, 256).alias("redacted_sha"),
        F.length(redacted).alias("redacted_len"),
    )


EVAL_MOD = 100  # docs with doc_id % EVAL_MOD == EVAL_REM form the eval set
EVAL_REM = 7
SHINGLE_N = 3  # token-shingle width for contamination overlap


@query(
    "tx_decontaminate",
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
eval_sh AS (
  SELECT DISTINCT sh FROM sh WHERE doc_id % {EVAL_MOD} = {EVAL_REM}
),
hits AS (
  SELECT s.doc_id, COUNT(DISTINCT s.sh) AS n_hits
  FROM sh s JOIN eval_sh e USING (sh)
  WHERE s.doc_id % {EVAL_MOD} <> {EVAL_REM}
  GROUP BY s.doc_id
)
SELECT d.doc_id,
       GREATEST(len(regexp_split_to_array(trim(lower(d.text)), '\\s+'))
                - {SHINGLE_N - 1}, 0) AS n_shingles,
       CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_eval_hits,
       CAST(COALESCE(h.n_hits, 0) > 0 AS INTEGER) AS is_contaminated
FROM documents d LEFT JOIN hits h USING (doc_id)
WHERE d.doc_id % {EVAL_MOD} <> {EVAL_REM}
""",
)
def tx_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training documents that share any
    token shingle with a held-out eval set (the n-gram-overlap scrub
    every serious pretraining pipeline runs before training; docs with
    doc_id % EVAL_MOD == EVAL_REM stand in for the benchmark).

    Scale shape: the eval set is tiny next to the corpus (benchmarks are
    KBs-to-MBs vs 100 TB), so its distinct shingles BROADCAST — the
    training-side shingle stream is never shuffled for the join; the
    only wide exchange is the per-doc hit aggregation, whose input is
    just the matched rows (rare by construction). Training shingles are
    deliberately NOT pre-deduplicated: a corpus-wide distinct would
    shuffle the full exploded stream, while countDistinct after the
    broadcast join dedups only hits."""
    docs = load_table(spark, sf_dir, "documents")
    is_eval = (F.col("doc_id") % EVAL_MOD) == EVAL_REM
    toks = docs.select("doc_id", T.lower_tokens(F.col("text")).alias("t"))
    sh = toks.select(
        "doc_id",
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
    eval_sh = sh.filter(is_eval).select("sh").distinct()
    hits = (
        sh.filter(~is_eval)
        .join(F.broadcast(eval_sh), "sh")
        .groupBy("doc_id")
        .agg(F.count_distinct("sh").alias("n_hits"))
    )
    return (
        docs.filter(~is_eval)
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.greatest(
                T.token_count(F.col("text")) - (SHINGLE_N - 1), F.lit(0)
            ).alias("n_shingles"),
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("bigint").alias("n_eval_hits"),
            (F.coalesce(F.col("n_hits"), F.lit(0)) > 0).cast("int").alias(
                "is_contaminated"
            ),
        )
    )


@query(
    "tx_mixing_weights",
    r"""
WITH per_src AS (
  SELECT source,
         COUNT(*) AS n_docs,
         CAST(SUM(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT)
           AS n_tokens
  FROM documents GROUP BY source
),
tot AS (
  SELECT CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
         COUNT(*) AS n_sources
  FROM per_src
)
SELECT s.source, s.n_docs, s.n_tokens,
       CAST((s.n_tokens * 1000000) // t.total_tokens AS BIGINT)
         AS token_share_micros,
       CAST((t.total_tokens * 1000000) // (t.n_sources * s.n_tokens) AS BIGINT)
         AS weight_micros
FROM per_src s, tot t
""",
)
def tx_mixing_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixing weights: per-source sampling multipliers that would
    equalize token contribution across sources (weight = uniform target
    share / actual share — the degenerate single-knob form of the
    mixture tuning in Pile/DoReMi-style pretraining recipes).

    One map-side-combinable aggregation over the corpus (per-source doc
    and token counts); the grand totals come from an UNPARTITIONED
    window over the already-aggregated per-source table — a single-task
    stage, but over O(n_sources) rows, so it is harmless at any corpus
    size and keeps the 100 TB input scanned exactly once (an agg-branch
    formulation re-scanned documents: the two aggregate subtrees prune
    differently, so Catalyst cannot ReusedExchange them). Integer
    micro-units (floor-div) keep the output engine-exact."""
    docs = load_table(spark, sf_dir, "documents")
    per_src = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(T.token_count(F.col("text"))).cast("bigint").alias("n_tokens"),
    )
    w_all = Window.partitionBy()
    tot = per_src.select(
        "*",
        F.sum("n_tokens").over(w_all).cast("bigint").alias("total_tokens"),
        F.count(F.lit(1)).over(w_all).alias("n_sources"),
    )
    return tot.select(
        "source",
        "n_docs",
        "n_tokens",
        F.expr("CAST((n_tokens * 1000000) DIV total_tokens AS BIGINT)").alias(
            "token_share_micros"
        ),
        F.expr(
            "CAST((total_tokens * 1000000) DIV (n_sources * n_tokens) AS BIGINT)"
        ).alias("weight_micros"),
    )


TOP_TERMS_K = 5


@query(
    "tx_top_terms",
    f"""
WITH toks AS (
  SELECT doc_id, lang, UNNEST({_LTOKS}) AS tok FROM documents
),
tf AS (SELECT lang, tok, COUNT(*) AS tf FROM toks GROUP BY lang, tok),
df AS (SELECT tok, COUNT(DISTINCT doc_id) AS dfreq FROM toks GROUP BY tok),
scored AS (
  SELECT tf.lang, tf.tok,
         CAST(tf.tf AS BIGINT) AS tf,
         CAST(df.dfreq AS BIGINT) AS dfreq,
         CAST((tf.tf * 1000000) // df.dfreq AS BIGINT) AS score_micros
  FROM tf JOIN df ON tf.tok = df.tok
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY lang
                               ORDER BY score_micros DESC, tok) AS rnk
  FROM scored
)
SELECT lang, tok, tf, dfreq, score_micros, rnk
FROM ranked WHERE rnk <= {TOP_TERMS_K}
""",
)
def tx_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF-style distinctive terms per language: term frequency
    within the language weighted by inverse global document frequency
    (integer micro-units — tf*1e6 DIV df — instead of tf*ln(N/df), so
    the score is exact and engine-portable; the ranking is identical
    for any monotone idf). Two shuffles on the token key (tf agg, df
    agg) that AQE lines up, then a per-language top-k window. The
    window partitions on lang (low cardinality) but only over the
    POST-AGGREGATION (lang, term) rows — vocabulary-sized, not
    corpus-sized — so the skewed key never sees raw documents.
    Reference scope: text analysis extension (SURVEY.md SS2B)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "lang", F.explode(T.lower_tokens(F.col("text"))).alias("tok")
    )
    tf = toks.groupBy("lang", "tok").agg(F.count("*").cast("bigint").alias("tf"))
    dfreq = toks.groupBy("tok").agg(
        F.countDistinct("doc_id").cast("bigint").alias("dfreq")
    )
    scored = tf.join(dfreq, "tok").select(
        "lang",
        "tok",
        "tf",
        "dfreq",
        F.expr("CAST((tf * 1000000) DIV dfreq AS BIGINT)").alias("score_micros"),
    )
    w = Window.partitionBy("lang").orderBy(
        F.desc("score_micros"), F.asc("tok")
    )
    return scored.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= TOP_TERMS_K
    )


# --- top-p quality-mass corpus selection ----------------------------------

TOPP_PCT = 80  # keep best-quality docs until 80% of each lang's token mass
_TOPP_BUCKETS = 20  # score buckets for the two-pass distributed prefix sum

_TX_TOPP_ORACLE = f"""
WITH scored AS (
  SELECT doc_id, lang, CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
         {_QUALITY_SQL} AS quality_score
  FROM documents
),
c AS (
  SELECT doc_id, lang, n_tokens, quality_score,
         CAST(SUM(n_tokens) OVER (
           PARTITION BY lang ORDER BY quality_score DESC, doc_id
           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens,
         CAST(SUM(n_tokens) OVER (PARTITION BY lang) AS BIGINT) AS lang_tokens
  FROM scored
)
SELECT doc_id, lang, n_tokens, quality_score, cum_tokens,
       (cum_tokens * 100 <= lang_tokens * {TOPP_PCT}) AS is_kept
FROM c
"""


@query("tx_quality_topp", _TX_TOPP_ORACLE)
def tx_quality_topp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-p corpus selection: per language, keep the highest-quality
    documents until TOPP_PCT% of that language's token mass is covered
    (integer mass compare — no float accumulation can diverge).

    The oracle states it as one running-sum window per language, but a
    per-lang window means ONE reducer per language at 100 TB. This
    implementation computes the identical cumulative sum distributed:
    (1) bucket docs by quality-score range (scores are rounded to 6
    digits, so bucket boundaries are engine-stable), (2) aggregate
    per-(lang, bucket) token sums — a few hundred rows, collected and
    prefix-summed on the driver (bounded by lang x bucket count, never
    corpus size), (3) running-sum WITHIN each (lang, bucket) partition
    + broadcast-joined offset. Same two-pass shape as the manifest file
    numbering (operators/manifest.py A2)."""
    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    scored = docs.select(
        "doc_id",
        "lang",
        T.token_count(t).cast("bigint").alias("n_tokens"),
        T.quality_score(t).alias("quality_score"),
    )
    b = F.least(
        F.floor(F.col("quality_score") * _TOPP_BUCKETS), F.lit(_TOPP_BUCKETS)
    ).cast("int")
    # r15: lazy localCheckpoint (the tx_lm_bigram item-9 shape) — the
    # doc-cardinality scored frame's FIRST consumer is the per-bucket
    # collect, a full-frame agg job the materialization rides; the
    # final windowed join then reads it back instead of re-running
    # token_count + quality_score over the corpus.  Interleaved in-JVM
    # minima: 2.257 -> 1.599 s sf0.1; 5.397 -> 3.502 s at 100x.
    scored = local_checkpoint(scored.withColumn("b", b), eager=False)
    per_bucket = (
        scored.groupBy("lang", "b").agg(F.sum("n_tokens").alias("bt")).collect()
    )
    # driver-side prefix over lang x bucket rows (bounded, tiny)
    offs = []
    langs = {r["lang"] for r in per_bucket}
    for lang in langs:
        rows = sorted(
            (r for r in per_bucket if r["lang"] == lang),
            key=lambda r: -r["b"],  # higher score bucket = earlier in order
        )
        total = sum(r["bt"] for r in rows)
        acc = 0
        for r in rows:
            offs.append((lang, r["b"], acc, total))
            acc += r["bt"]
    off_df = scored.sparkSession.createDataFrame(
        offs, "lang string, b int, off bigint, lang_tokens bigint"
    )
    w = (
        Window.partitionBy("lang", "b")
        .orderBy(F.desc("quality_score"), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        scored.join(F.broadcast(off_df), ["lang", "b"])
        .withColumn("cum_tokens", F.sum("n_tokens").over(w) + F.col("off"))
        .select(
            "doc_id",
            "lang",
            "n_tokens",
            "quality_score",
            "cum_tokens",
            (
                F.col("cum_tokens") * 100
                <= F.col("lang_tokens") * TOPP_PCT
            ).alias("is_kept"),
        )
    )


# --- Gopher-style threshold rule filters ----------------------------------

# integer-exact rule thresholds (Rae et al. 2021 "Gopher" rules adapted
# to this corpus's ranges so each rule discriminates at sf0.01)
GOPHER_MIN_TOKENS, GOPHER_MAX_TOKENS = 30, 10_000
GOPHER_MIN_WORDLEN_X10, GOPHER_MAX_WORDLEN_X10 = 42, 100  # mean chars/token x10
GOPHER_MIN_ALPHA_PCT = 80  # % tokens containing a letter
GOPHER_MIN_STOPWORDS = 1  # distinct stopwords present (5-word list, sparse synthetic vocab)
GOPHER_MAX_DUP_PCT = 70  # % non-distinct tokens

_GOPHER_STOP_INLIST = ", ".join(f"'{w}'" for w in T.STOPWORDS["en"])

_TX_GOPHER_ORACLE = f"""
WITH m AS (
  SELECT doc_id,
    CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
    CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_chars_nospace,
    CAST(len(list_filter({_TOKS}, t -> regexp_matches(t, '[A-Za-z]'))) AS BIGINT) AS n_alpha_tokens,
    CAST(len(list_distinct(list_filter({_LTOKS}, t -> t IN ({_GOPHER_STOP_INLIST})))) AS BIGINT) AS n_distinct_stop,
    CAST(len(list_distinct({_LTOKS})) AS BIGINT) AS n_distinct
  FROM documents
)
SELECT doc_id, n_tokens,
  (n_tokens BETWEEN {GOPHER_MIN_TOKENS} AND {GOPHER_MAX_TOKENS}) AS r_len,
  (n_chars_nospace * 10 BETWEEN n_tokens * {GOPHER_MIN_WORDLEN_X10}
                            AND n_tokens * {GOPHER_MAX_WORDLEN_X10}) AS r_wordlen,
  (n_alpha_tokens * 100 >= n_tokens * {GOPHER_MIN_ALPHA_PCT}) AS r_alpha,
  (n_distinct_stop >= {GOPHER_MIN_STOPWORDS}) AS r_stop,
  ((n_tokens - n_distinct) * 100 <= n_tokens * {GOPHER_MAX_DUP_PCT}) AS r_dup,
  ((n_tokens BETWEEN {GOPHER_MIN_TOKENS} AND {GOPHER_MAX_TOKENS})
   AND (n_chars_nospace * 10 BETWEEN n_tokens * {GOPHER_MIN_WORDLEN_X10}
                                 AND n_tokens * {GOPHER_MAX_WORDLEN_X10})
   AND (n_alpha_tokens * 100 >= n_tokens * {GOPHER_MIN_ALPHA_PCT})
   AND (n_distinct_stop >= {GOPHER_MIN_STOPWORDS})
   AND ((n_tokens - n_distinct) * 100 <= n_tokens * {GOPHER_MAX_DUP_PCT})) AS pass_all
FROM m
"""


@query("tx_gopher_rules", _TX_GOPHER_ORACLE)
def tx_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style hard rule filters — the thresholded counterpart of
    tx_quality's soft score. Every rule is an INTEGER comparison
    (counts cross-multiplied against percent/x10 thresholds), so no
    float ratio can diverge between engines. One narrow projection:
    the token arrays are staged once (lambda boundaries defeat
    codegen CSE — see functions/text.py lower_tokens) and all five
    rules + the conjunction read the same staged counts. Pure
    map-side; filter pushes to the scan when composed."""
    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    staged = docs.select(
        "doc_id",
        T.ws_tokens(t).alias("tk"),
        T.lower_tokens(t).alias("ltk"),
        F.length(F.replace(t, F.lit(" "), F.lit(""))).cast("bigint").alias(
            "n_chars_nospace"
        ),
    ).select(
        "doc_id",
        F.size("tk").cast("bigint").alias("n_tokens"),
        "n_chars_nospace",
        F.size(F.filter(F.col("tk"), lambda x: x.rlike("[A-Za-z]")))
        .cast("bigint")
        .alias("n_alpha_tokens"),
        F.size(
            F.array_distinct(
                F.filter(F.col("ltk"), lambda x: x.isin(*T.STOPWORDS["en"]))
            )
        )
        .cast("bigint")
        .alias("n_distinct_stop"),
        F.size(F.array_distinct("ltk")).cast("bigint").alias("n_distinct"),
    )
    r_len = F.col("n_tokens").between(GOPHER_MIN_TOKENS, GOPHER_MAX_TOKENS)
    r_wordlen = (F.col("n_chars_nospace") * 10).between(
        F.col("n_tokens") * GOPHER_MIN_WORDLEN_X10,
        F.col("n_tokens") * GOPHER_MAX_WORDLEN_X10,
    )
    r_alpha = F.col("n_alpha_tokens") * 100 >= F.col("n_tokens") * GOPHER_MIN_ALPHA_PCT
    r_stop = F.col("n_distinct_stop") >= GOPHER_MIN_STOPWORDS
    r_dup = (
        (F.col("n_tokens") - F.col("n_distinct")) * 100
        <= F.col("n_tokens") * GOPHER_MAX_DUP_PCT
    )
    return staged.select(
        "doc_id",
        "n_tokens",
        r_len.alias("r_len"),
        r_wordlen.alias("r_wordlen"),
        r_alpha.alias("r_alpha"),
        r_stop.alias("r_stop"),
        r_dup.alias("r_dup"),
        (r_len & r_wordlen & r_alpha & r_stop & r_dup).alias("pass_all"),
    )


# --- BM25 lexical retrieval ------------------------------------------------

# Three fixed retrieval queries over the corpus vocabulary; query 1 mixes
# the rare term 'dup' (df ~5% of docs) with a common one, exercising the
# idf contrast. Integer ids join against embedding queries in the hybrid
# fusion op (operators/similarity.py sim_hybrid_rrf).
BM25_QUERIES: tuple[tuple[int, tuple[str, ...]], ...] = (
    (0, ("hash", "join", "fast")),
    (1, ("dup", "merge")),
    (2, ("window", "agg", "stream")),
)
BM25_TOP_K = 10

_BM25_QTERM_VALUES = ", ".join(
    f"({qid}, '{t}')" for qid, terms in BM25_QUERIES for t in terms
)

# BM25 with k1=1.2, b=0.75 in exact integer arithmetic. Overflow-safe
# factoring: every operand stays < 2^63 up to ~10^12 docs / 10^8 tokens
# per doc (the earlier single-fraction form 22*tf*L*1e6 // (...) wraps
# BIGINT once l_total*tf exceeds ~4e11 — Spark wraps SILENTLY, so the
# safe form is load-bearing, not cosmetic):
#   avgdl  = L // N                       (floor; >=100 in any real corpus,
#                                          so the floor costs <1%)
#   d9m    = 9000*dl // avgdl             (milli-units of 9*dl/avgdl)
#   tf_m   = 22e6*tf // (10000*tf + 3000 + d9m)
#          ~ tf(k1+1)/(tf + k1(1-b+b*dl/avgdl)) in milli-units, <= 2200
#   idf_m  ~ (N - df + 0.5)/(df + 0.5) -> (2(N-df)+1)*1000 // (2df+1)
#   score_mu = SUM(idf_m * tf_m)          (milli x milli = micro, exact
#                                          product, no further division)
# The idf is the raw Robertson ratio (no log): a monotone surrogate that
# keeps the score a pure BIGINT so both engines hash identically.
_BM25_RANKED_SQL = f"""
base AS (
  SELECT doc_id, {_LTOKS} AS tk, CAST(len({_LTOKS}) AS BIGINT) AS dl
  FROM documents
),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(dl) AS BIGINT) // CAST(COUNT(*) AS BIGINT) AS avgdl
  FROM base
),
qterms AS (SELECT * FROM (VALUES {_BM25_QTERM_VALUES}) AS v(query_id, tok)),
tf AS (
  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf, MAX(dl) AS dl
  FROM (SELECT doc_id, dl, UNNEST(tk) AS tok FROM base)
  WHERE tok IN (SELECT tok FROM qterms)
  GROUP BY doc_id, tok
),
dfreq AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS dfreq FROM tf GROUP BY tok),
term_scores AS (
  SELECT q.query_id, t.doc_id,
         ((2 * (s.n_docs - d.dfreq) + 1) * 1000) // (2 * d.dfreq + 1)
           AS idf_m,
         (22000000 * t.tf)
           // (10000 * t.tf + 3000 + (9000 * t.dl) // s.avgdl)
           AS tf_m
  FROM tf t
  JOIN dfreq d USING (tok)
  JOIN qterms q USING (tok)
  CROSS JOIN stats s
),
doc_scores AS (
  SELECT query_id, doc_id,
         CAST(SUM(idf_m * tf_m) AS BIGINT) AS score_mu
  FROM term_scores GROUP BY query_id, doc_id
),
bm25_ranked AS (
  SELECT query_id, doc_id, score_mu,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY score_mu DESC, doc_id
         ) AS BIGINT) AS rank
  FROM doc_scores
  QUALIFY rank <= {BM25_TOP_K}
)"""


@query("tx_bm25", f"WITH {_BM25_RANKED_SQL}\nSELECT * FROM bm25_ranked")
def tx_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k lexical retrieval (k1=1.2, b=0.75) in exact integer
    micro-units — the retrieval primitive for hard-negative mining and
    eval-set construction over a training corpus.

    Plan shape for 100 TB: tokens are filtered to the (tiny, broadcast)
    query-term set BEFORE the tf aggregation, so the only corpus-sized
    shuffle is the (doc_id, tok) partial-combinable count of MATCHING
    tokens; df and corpus stats (N, L) are one-row/vocabulary-sized and
    broadcast back. Top-k per query avoids the single-reducer per-query
    window via the two-pass trick (local top-k per physical partition,
    then a window over the <= k * n_partitions survivors) — same shape
    as the manifest file numbering (operators/manifest.py A2). No
    floats, no libm: both engines floor-divide nonneg BIGINTs, and the
    milli-unit factoring (see _BM25_RANKED_SQL comment) keeps every
    intermediate < 2^63 up to ~10^12 docs — Spark wraps BIGINT
    silently, so the bound is a correctness property, not tidiness.
    Reference scope: text-analysis extension (SURVEY.md §2B); the
    reference engine has no retrieval op (SURVEY.md §2A)."""
    all_terms = sorted({t for _, terms in BM25_QUERIES for t in terms})
    qdf_rows = [(qid, t) for qid, terms in BM25_QUERIES for t in terms]
    qdf = spark.createDataFrame(qdf_rows, "query_id int, tok string")

    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id", T.lower_tokens(F.col("text")).alias("tk")
    ).withColumn("dl", F.size("tk").cast("bigint"))
    stats = base.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.expr("CAST(SUM(dl) AS BIGINT) DIV CAST(COUNT(*) AS BIGINT)").alias(
            "avgdl"
        ),
    )
    tf = (
        base.select("doc_id", "dl", F.explode("tk").alias("tok"))
        .filter(F.col("tok").isin(all_terms))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").cast("bigint").alias("tf"), F.max("dl").alias("dl"))
    )
    dfreq = tf.groupBy("tok").agg(F.count("*").cast("bigint").alias("dfreq"))
    term_scores = (
        tf.join(F.broadcast(dfreq), "tok")
        .join(F.broadcast(qdf), "tok")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf_m",
            F.expr("((2 * (n_docs - dfreq) + 1) * 1000) DIV (2 * dfreq + 1)"),
        )
        .withColumn(
            "tf_m",
            F.expr(
                "(22000000 * tf)"
                " DIV (10000 * tf + 3000 + (9000 * dl) DIV avgdl)"
            ),
        )
    )
    doc_scores = term_scores.groupBy("query_id", "doc_id").agg(
        F.expr("CAST(SUM(idf_m * tf_m) AS BIGINT)").alias("score_mu")
    )
    # two-pass per-query top-k: local top-k per physical partition is a
    # superset of the global top-k, so the final window only ever sees
    # <= k * n_partitions rows per query (never one reducer per query).
    local = doc_scores.withColumn("p", F.spark_partition_id())
    w_local = Window.partitionBy("query_id", "p").orderBy(
        F.desc("score_mu"), F.asc("doc_id")
    )
    survivors = (
        local.withColumn("r", F.row_number().over(w_local))
        .filter(F.col("r") <= BM25_TOP_K)
        .drop("r", "p")
    )
    w_global = Window.partitionBy("query_id").orderBy(
        F.desc("score_mu"), F.asc("doc_id")
    )
    return survivors.withColumn(
        "rank", F.row_number().over(w_global).cast("bigint")
    ).filter(F.col("rank") <= BM25_TOP_K)


# --- bigram-LM quality bucketing (CCNet shape) -----------------------------

_LM_BUCKET_WIDTH = 50_000  # score_mu in [0, 1e6] -> 21 coarse buckets

_TX_LM_ORACLE = f"""
WITH toks AS (SELECT doc_id, lang, {_LTOKS} AS tk FROM documents),
bg AS (
  SELECT doc_id, lang, tk[i] AS w1, tk[i + 1] AS w2
  FROM (SELECT doc_id, lang, tk, UNNEST(range(1, len(tk))) AS i FROM toks)
),
c2 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2 FROM bg GROUP BY w1, w2),
c1 AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS c1 FROM bg GROUP BY w1),
scored AS (
  SELECT b.doc_id, b.lang,
         CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         CAST(SUM((c2.c2 * 1000000) // c1.c1) // COUNT(*) AS BIGINT)
           AS score_mu
  FROM bg b JOIN c2 USING (w1, w2) JOIN c1 USING (w1)
  GROUP BY b.doc_id, b.lang
),
ranked AS (
  SELECT doc_id, lang, n_bigrams, score_mu,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY score_mu DESC, doc_id) AS rnk,
         COUNT(*) OVER (PARTITION BY lang) AS tot
  FROM scored
)
SELECT doc_id, lang, n_bigrams, score_mu,
       CASE WHEN rnk * 3 <= tot THEN 'head'
            WHEN rnk * 3 <= tot * 2 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM ranked
"""


@query("tx_lm_bigram", _TX_LM_ORACLE)
def tx_lm_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style language-model quality bucketing: score each document
    by its mean bigram probability under a corpus-trained MLE bigram LM
    (micro-units: mean over bigrams of c(w1,w2)*1e6 // c(w1·)), then cut
    each language into head / middle / tail thirds by score rank —
    the published CCNet shape (Wenzek et al. 2020) with the perplexity
    sort replaced by an integer mean-probability sort so the oracle
    hashes identically (a monotone transform either way for ranking).

    100 TB notes: the bigram tables here are vocabulary-sized and
    broadcast; on open-vocabulary text you hash (w1,w2) into 2^22
    buckets first (CCNet's trick) and the SAME plan applies with the
    hash as the join key — partial-combinable counts, one shuffle each.
    The per-lang tercile rank avoids a one-reducer-per-language window
    with the bucketed two-pass prefix sum (tx_quality_topp shape):
    coarse score buckets -> per-(lang, bucket) counts prefix-summed on
    the driver (bounded by langs x 21, never corpus size) -> rank =
    within-bucket row_number + broadcast offset."""
    docs = load_table(spark, sf_dir, "documents")
    # r15: eager localCheckpoint — the tokenized per-doc frame feeds the
    # c2 agg, the c1 agg and the scoring spine (3 branches of job 1);
    # tokenize runs once instead of 3x.  Linear per-doc rows (token
    # arrays, same byte class as the input text), never the
    # corpus x n-gram bigram stream.  Interleaved in-JVM A/B minima:
    # 3.029 (old) -> 2.198 (scored ckpt only) -> 1.812 s (this + scored).
    base = local_checkpoint(
        docs.select(
            "doc_id", "lang", T.lower_tokens(F.col("text")).alias("tk")
        ).filter(F.size("tk") >= 2)
    )
    bg = base.select(
        "doc_id",
        "lang",
        F.explode(
            F.expr(
                "transform(sequence(1, size(tk) - 1),"
                " i -> struct(tk[i - 1] AS w1, tk[i] AS w2))"
            )
        ).alias("b"),
    ).select("doc_id", "lang", "b.w1", "b.w2")
    c2 = bg.groupBy("w1", "w2").agg(F.count("*").cast("bigint").alias("c2"))
    c1 = bg.groupBy("w1").agg(F.count("*").cast("bigint").alias("c1"))
    lm = F.broadcast(c2.join(c1, "w1"))
    scored = (
        bg.join(lm, ["w1", "w2"])
        .groupBy("doc_id", "lang")
        .agg(
            F.count("*").cast("bigint").alias("n_bigrams"),
            F.expr(
                "CAST(SUM((c2 * 1000000) DIV c1) DIV COUNT(*) AS BIGINT)"
            ).alias("score_mu"),
        )
        .withColumn(
            "b", (F.col("score_mu") / _LM_BUCKET_WIDTH).cast("int")
        )
    )
    # r15: lazy localCheckpoint — the doc-cardinality scored frame's
    # FIRST consumer is the per_bucket collect (a full-frame agg
    # job), so the materialization rides that job; the final ranked
    # join then reads it back instead of re-running the whole
    # tokenize -> bigram -> count -> score pipeline a second time.
    scored = local_checkpoint(scored, eager=False)
    per_bucket = (
        scored.groupBy("lang", "b").agg(F.count("*").alias("cnt")).collect()
    )
    offs = []
    for lang in {r["lang"] for r in per_bucket}:
        rows = sorted(
            (r for r in per_bucket if r["lang"] == lang),
            key=lambda r: -r["b"],  # higher score bucket ranks earlier
        )
        tot = sum(r["cnt"] for r in rows)
        acc = 0
        for r in rows:
            offs.append((lang, r["b"], acc, tot))
            acc += r["cnt"]
    off_df = scored.sparkSession.createDataFrame(
        offs, "lang string, b int, off bigint, tot bigint"
    )
    w = Window.partitionBy("lang", "b").orderBy(
        F.desc("score_mu"), F.asc("doc_id")
    )
    ranked = scored.join(F.broadcast(off_df), ["lang", "b"]).withColumn(
        "rnk", F.row_number().over(w) + F.col("off")
    )
    return ranked.select(
        "doc_id",
        "lang",
        "n_bigrams",
        "score_mu",
        F.when(F.col("rnk") * 3 <= F.col("tot"), "head")
        .when(F.col("rnk") * 3 <= F.col("tot") * 2, "middle")
        .otherwise("tail")
        .alias("bucket"),
    )


# --- DSIR-style importance weighting ---------------------------------------

# Target-domain stand-in: the sources whose unigram distribution defines
# "high quality" (DSIR's target corpus — e.g. Wikipedia in the paper).
DSIR_TARGETS = ("src0", "src1", "src2")
_DSIR_IN = ", ".join(f"'{s}'" for s in DSIR_TARGETS)


@query(
    "tx_dsir_weights",
    f"""
WITH toks AS (
  SELECT doc_id, source, UNNEST(string_split(text, ' ')) AS tok FROM documents
),
vocab AS (
  SELECT tok, COUNT(*) AS c_r,
         COUNT(*) FILTER (WHERE source IN ({_DSIR_IN})) AS c_t
  FROM toks GROUP BY tok
),
tot AS (
  SELECT COUNT(*) AS v, CAST(SUM(c_r) AS BIGINT) AS n_r,
         CAST(SUM(c_t) AS BIGINT) AS n_t
  FROM vocab
),
ratio AS (
  SELECT tok,
         CAST(FLOOR((ln(c_t + 1) - ln(n_t + v) - ln(c_r + 1) + ln(n_r + v))
                    * 1000000) AS BIGINT) AS r_mu
  FROM vocab, tot
),
dt AS (SELECT doc_id, tok, COUNT(*) AS c FROM toks GROUP BY doc_id, tok)
SELECT dt.doc_id,
       CAST(SUM(dt.c * ratio.r_mu) AS BIGINT) AS weight_micros,
       CAST(SUM(dt.c * ratio.r_mu) AS BIGINT) >= 0 AS selected
FROM dt JOIN ratio USING (tok)
GROUP BY dt.doc_id
""",
)
def tx_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-shaped importance weights (Xie et al. 2023): per-document
    log-likelihood ratio between a smoothed unigram LM of the TARGET
    domain (DSIR_TARGETS sources) and the RAW corpus LM; documents with
    weight >= 0 look more target-like than raw-like and are `selected`
    for importance resampling.

    Engine-portable numerics: each token's Laplace-smoothed log ratio
    ln((c_t+1)/(N_t+V)) - ln((c_r+1)/(N_r+V)) is floored to integer
    micro-units FIRST, then the per-doc sum is pure integer arithmetic
    — order-independent, so Spark's partial aggregation and DuckDB's
    serial sum cannot diverge on float association.

    Accepted residual risk (r4 ADVICE): ln is not IEEE
    correctly-rounded, so JVM Math.log and DuckDB's libm can disagree
    in the last ulp; a disagreement only surfaces if a token's true
    log-ratio lies within ~1 ulp (~1e-10 relative) of a 1e-6 flooring
    boundary — per-run flip probability ~1e-5 over this vocab. The
    exact-integer alternative (cross-multiplying smoothed likelihoods)
    can reproduce the SIGN portably but not the log magnitude the DSIR
    weight sums, so the 1-ulp exposure is kept and documented rather
    than changing the paper's definition.

    Scale: two token-keyed shuffles (vocab counts, per-doc token
    counts — both map-side combinable), one 1-row totals broadcast,
    one equi-join on tok (hot/stopword tokens are exactly the AQE
    skew-join case), and a doc_id-keyed final agg. No collect, no
    window, no cartesian; vocab is the only intermediate bigger than
    the output and it shrinks with Zipf."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "source", F.explode(F.split("text", " ")).alias("tok")
    )
    vocab = toks.groupBy("tok").agg(
        F.count("*").alias("c_r"),
        F.count(F.when(F.col("source").isin(*DSIR_TARGETS), 1)).alias("c_t"),
    )
    tot = vocab.agg(
        F.count("*").alias("v"),
        F.sum("c_r").alias("n_r"),
        F.sum("c_t").alias("n_t"),
    )
    ratio = vocab.join(F.broadcast(tot)).select(
        "tok",
        F.floor(
            (
                F.log(F.col("c_t") + 1)
                - F.log(F.col("n_t") + F.col("v"))
                - F.log(F.col("c_r") + 1)
                + F.log(F.col("n_r") + F.col("v"))
            )
            * 1_000_000
        )
        .cast("bigint")
        .alias("r_mu"),
    )
    dt = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("c"))
    w = F.sum(F.col("c") * F.col("r_mu")).cast("bigint")
    return (
        dt.join(ratio, "tok")
        .groupBy("doc_id")
        .agg(w.alias("weight_micros"), (w >= 0).alias("selected"))
    )


# --- temperature-weighted source mixing ------------------------------------


@query(
    "tx_temperature_mix",
    """
WITH toks AS (
  SELECT source, UNNEST(string_split(text, ' ')) AS tok FROM documents
),
per_src AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(FLOOR(sqrt(COUNT(*)) * 1000) AS BIGINT) AS sq
  FROM toks GROUP BY source
),
tot AS (
  SELECT CAST(SUM(n_tokens) AS BIGINT) AS n_total,
         CAST(SUM(sq) AS BIGINT) AS sq_total
  FROM per_src
)
SELECT source, n_tokens,
       CAST(FLOOR(CAST(sq AS DOUBLE) / sq_total * 1000000) AS BIGINT)
         AS weight_micros,
       CAST(FLOOR(CAST(sq AS DOUBLE) / sq_total
                  / (CAST(n_tokens AS DOUBLE) / n_total) * 1000000) AS BIGINT)
         AS multiplier_micros
FROM per_src, tot
""",
)
def tx_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source mixing (the multilingual/pretraining
    sampling scheme of Arivazhagan et al. 2019 / GPT-3's data curation):
    sample source s with probability proportional to (token share)^alpha,
    flattening the head and boosting the tail relative to natural
    frequency. alpha = 0.5 EXACTLY because sqrt is the one power IEEE
    requires correctly rounded — both engines produce bit-identical
    sq = floor(sqrt(n)*1000) from the same integer counts, and every
    later step is either integer arithmetic or a single correctly-
    rounded double division chain written identically on both sides
    (order-dependent float SUMS are confined to integers).
    multiplier_micros = (temperature share / natural share) * 1e6 is
    the per-source upsampling factor a mixing loader consumes.

    Scale: one token-keyed combinable count shuffle, a source-count
    aggregate (rows = #sources), and a 1-row totals broadcast — the
    corpus is scanned once and nothing wide ever forms."""
    docs = load_table(spark, sf_dir, "documents")
    per_src = (
        docs.select("source", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("source")
        .agg(F.count("*").alias("n_tokens"))
        .withColumn(
            "sq", F.floor(F.sqrt(F.col("n_tokens")) * 1000).cast("bigint")
        )
    )
    tot = per_src.agg(
        F.sum("n_tokens").alias("n_total"), F.sum("sq").alias("sq_total")
    )
    t_share = F.col("sq").cast("double") / F.col("sq_total")
    n_share = F.col("n_tokens").cast("double") / F.col("n_total")
    return per_src.join(F.broadcast(tot)).select(
        "source",
        "n_tokens",
        F.floor(t_share * 1_000_000).cast("bigint").alias("weight_micros"),
        F.floor(t_share / n_share * 1_000_000)
        .cast("bigint")
        .alias("multiplier_micros"),
    )


# --- BPE vocabulary induction: adjacent-pair counting -----------------------

BPE_TOP_PAIRS = 50


@query(
    "tx_bpe_pairs",
    rf"""
WITH toks AS (
  SELECT UNNEST(regexp_split_to_array(trim(lower(text)), '\s+')) AS w
  FROM documents
),
wf AS (
  SELECT w, COUNT(*) AS wf FROM toks WHERE length(w) >= 2 GROUP BY w
),
pairs AS (
  SELECT substr(w, CAST(i AS INT), 2) AS pair, wf
  FROM wf, LATERAL (SELECT UNNEST(range(1, length(w))) AS i) t
),
agg AS (
  SELECT pair, CAST(SUM(wf) AS BIGINT) AS pair_count FROM pairs GROUP BY pair
)
SELECT pair, pair_count,
       ROW_NUMBER() OVER (ORDER BY pair_count DESC, pair) AS rank
FROM agg
QUALIFY rank <= {BPE_TOP_PAIRS}
""",
)
def tx_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One BPE vocabulary-induction step (Sennrich et al. 2016): count
    adjacent character pairs across the corpus, weighted by word
    frequency — the argmax pair is the next BPE merge. Exact integer
    counts, so the oracle check is trivially portable.

    Scale shape: the corpus-sized work is ONE map-side-combinable word
    count (tokens never leave their partition before partial agg); pair
    explosion runs over the DISTINCT-WORD table — vocabulary-sized,
    orders of magnitude smaller than the corpus and bounded by
    Heaps' law regardless of corpus size. The final top-50 is a
    TakeOrdered (per-partition heaps + driver merge of 50-row heads,
    never a single-reducer global sort); the 50-row window after limit
    only ranks the already-tiny head."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(T.lower_tokens(F.col("text"))).alias("w")
    ).filter(F.length("w") >= 2)
    wf = toks.groupBy("w").agg(F.count("*").alias("wf"))
    pairs = wf.select(
        "wf",
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair"),
    )
    agg = pairs.groupBy("pair").agg(F.sum("wf").cast("bigint").alias("pair_count"))
    head = agg.orderBy(F.desc("pair_count"), F.asc("pair")).limit(BPE_TOP_PAIRS)
    w = Window.orderBy(F.desc("pair_count"), F.asc("pair"))
    return head.withColumn("rank", F.row_number().over(w))


# --- hashed linear quality classifier ---------------------------------------

_CLF_FEATS_SPARK = (
    "concat(tk, CASE WHEN size(tk) >= 2 THEN "
    "transform(sequence(1, size(tk) - 1), "
    "i -> concat(element_at(tk, i), '_', element_at(tk, i + 1))) "
    "ELSE array() END)"
)


@query(
    "tx_quality_classifier",
    r"""
WITH tk AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS tk
  FROM documents
),
feats AS (
  SELECT doc_id,
         UNNEST(list_concat(tk,
           list_transform(range(1, len(tk)),
             i -> tk[CAST(i AS INT)] || '_' || tk[CAST(i AS INT) + 1]))) AS f
  FROM tk
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_features,
       CAST(SUM(CAST(('0x' || substr(md5(f), 1, 8)) AS BIGINT) % 2001 - 1000)
            AS BIGINT) AS score,
       SUM(CAST(('0x' || substr(md5(f), 1, 8)) AS BIGINT) % 2001 - 1000) >= 0
         AS keep
FROM feats GROUP BY doc_id
""",
)
def tx_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filtering, fasttext-shaped (Joulin et al.
    2017): a linear classifier over hashed unigram + consecutive-bigram
    features. Weights here are a deterministic md5-derived stand-in for
    trained parameters (integer in [-1000, 1000], honest fake — the
    plumbing, not the model, is the operator), so score and keep/drop
    label are exactly oracle-checkable.

    Scale shape: the hashing trick means NO vocabulary table and NO
    join anywhere — each feature's weight is computed inline from its
    own bytes, so scoring is a stateless projection (explode + weight
    expr) followed by one map-side-combinable per-doc sum: the classic
    reason production quality filters (CCNet, fasttext) scale linearly.
    Per-doc feature fan-out is ~2x token count; the only shuffle is the
    per-doc partial-agg merge, O(docs) rows."""
    docs = load_table(spark, sf_dir, "documents")
    feats = (
        docs.select(
            "doc_id",
            T.lower_tokens(F.col("text")).alias("tk"),
        )
        .select("doc_id", F.explode(F.expr(_CLF_FEATS_SPARK)).alias("f"))
    )
    w = F.conv(F.substring(F.md5("f"), 1, 8), 16, 10).cast("bigint") % 2001 - 1000
    return feats.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_features"),
        F.sum(w).cast("bigint").alias("score"),
        (F.sum(w) >= 0).alias("keep"),
    )


# --- dataset card (single-row corpus summary) --------------------------------


@query(
    "tx_dataset_card",
    r"""
WITH t AS (
  SELECT doc_id, lang, source, text,
         len(regexp_split_to_array(trim(text), '\s+')) AS n_tok,
         length(text) AS n_chars
  FROM documents
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(COUNT(*) - COUNT(DISTINCT md5(text)) AS BIGINT) AS n_exact_dups,
       CAST((SUM(n_tok) * 1000000) // COUNT(*) AS BIGINT) AS mean_tokens_mu
FROM t
""",
)
def tx_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset card: the single-row governance summary (docs, sources,
    languages, token/char volume, exact-duplicate count, mean doc
    length in micro-units) a training-data release ships alongside the
    corpus — the cheap always-on health check before any curation run.

    Scale shape: ONE scan, one aggregate; the distinct counts are
    low-cardinality (source/lang) plus one md5-projection distinct for
    the dup count (at 100 TB swap that one for approx_count_distinct —
    same note as q_profile_stats). No joins, no windows."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "lang",
        "source",
        F.md5("text").alias("h"),
        F.size(T.ws_tokens(F.col("text"))).alias("n_tok"),
        F.length("text").alias("n_chars"),
    )
    return t.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.countDistinct("source").cast("bigint").alias("n_sources"),
        F.countDistinct("lang").cast("bigint").alias("n_langs"),
        F.sum("n_tok").cast("bigint").alias("total_tokens"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        (F.count("*") - F.countDistinct("h")).cast("bigint").alias("n_exact_dups"),
        F.expr("(SUM(n_tok) * 1000000) DIV COUNT(*)")
        .cast("bigint")
        .alias("mean_tokens_mu"),
    )


DRIFT_TOP_K = 50


@query(
    "tx_corpus_drift",
    f"""
WITH toks AS (
  SELECT doc_id % 2 AS cohort, UNNEST({_LTOKS}) AS tok FROM documents
),
cnt AS (
  SELECT tok,
         CAST(COUNT(*) FILTER (cohort = 0) AS BIGINT) AS n1,
         CAST(COUNT(*) FILTER (cohort = 1) AS BIGINT) AS n2
  FROM toks GROUP BY tok
),
tot AS (
  SELECT CAST(SUM(n1) AS BIGINT) AS t1, CAST(SUM(n2) AS BIGINT) AS t2 FROM cnt
)
SELECT tok, n1, n2,
       CAST(FLOOR(
         (CAST(n1 AS DOUBLE) * CAST(t2 AS DOUBLE)
          - CAST(n2 AS DOUBLE) * CAST(t1 AS DOUBLE))
         * (CAST(n1 AS DOUBLE) * CAST(t2 AS DOUBLE)
            - CAST(n2 AS DOUBLE) * CAST(t1 AS DOUBLE))
         / (CAST(t1 AS DOUBLE) * CAST(t2 AS DOUBLE)
            * CAST(n1 + n2 AS DOUBLE))
         * 1000000) AS BIGINT) AS chi2_micros
FROM cnt, tot
ORDER BY chi2_micros DESC, tok LIMIT {DRIFT_TOP_K}
""",
)
def tx_corpus_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    f"""Corpus drift report: the {DRIFT_TOP_K} tokens whose frequency
    shifts most between two corpus cohorts (modeled as doc_id parity —
    in production, the previous vs the incoming crawl snapshot),
    ranked by per-token two-sample chi-square contribution. This is
    the distribution-shift gate a training-data pipeline runs before
    admitting a new dump: a sudden top-drift token ("viagra", a
    template artifact, a new boilerplate string) is the cheapest
    tripwire for crawl regressions.

    Portability: counts are exact BIGINTs; the chi-square term
    (n1*T2 - n2*T1)^2 / (T1*T2*(n1+n2)) is evaluated in DOUBLE with an
    identical expression tree in both engines (products of <2^53
    integers are exactly representable; the one rounding per op is
    IEEE-deterministic), and the ranking surface is FLOOR(term * 1e6)
    BIGINT — no ln/libm, no ROUND tie modes.

    Scale shape: one exploded-token scan -> map-side-combined
    (tok, cohort-filtered) counts (single token-keyed exchange); the
    totals are a second aggregate over token-cardinality rows (a
    1-row broadcast back); top-K is TakeOrderedAndProject — no global
    sort, no window."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        (F.col("doc_id") % 2).alias("cohort"),
        F.explode(T.lower_tokens(F.col("text"))).alias("tok"),
    )
    cnt = toks.groupBy("tok").agg(
        F.count(F.when(F.col("cohort") == 0, 1)).cast("bigint").alias("n1"),
        F.count(F.when(F.col("cohort") == 1, 1)).cast("bigint").alias("n2"),
    )
    tot = cnt.agg(
        F.sum("n1").cast("bigint").alias("t1"),
        F.sum("n2").cast("bigint").alias("t2"),
    )
    term = (
        "(CAST(n1 AS DOUBLE) * CAST(t2 AS DOUBLE)"
        " - CAST(n2 AS DOUBLE) * CAST(t1 AS DOUBLE))"
    )
    chi2 = F.expr(
        f"CAST(FLOOR({term} * {term}"
        " / (CAST(t1 AS DOUBLE) * CAST(t2 AS DOUBLE)"
        "    * CAST(n1 + n2 AS DOUBLE))"
        " * 1000000) AS BIGINT)"
    )
    return (
        cnt.crossJoin(F.broadcast(tot))
        .select("tok", "n1", "n2", chi2.alias("chi2_micros"))
        .orderBy(F.desc("chi2_micros"), F.asc("tok"))
        .limit(DRIFT_TOP_K)
    )


# --- Gopher repetition fractions ---------------------------------------------

_REP_NCHARS = r"length(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'))"

_TX_REP_NGRAM_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, {_LTOKS} AS t, {_REP_NCHARS} AS nchars FROM documents
),
g2 AS (
  SELECT doc_id,
         UNNEST(list_transform(range(1, len(t)),
                i -> t[i] || ' ' || t[i+1])) AS g
  FROM toks WHERE len(t) >= 2
),
c2 AS (SELECT doc_id, g, CAST(COUNT(*) AS BIGINT) AS cnt
       FROM g2 GROUP BY doc_id, g),
m2 AS (SELECT doc_id, MAX(cnt) AS mx FROM c2 GROUP BY doc_id),
top2 AS (
  SELECT c.doc_id, m.mx AS top2_cnt, MIN(c.g) AS top2_gram
  FROM c2 c JOIN m2 m ON c.doc_id = m.doc_id AND c.cnt = m.mx
  GROUP BY c.doc_id, m.mx
),
g5 AS (
  SELECT doc_id,
         UNNEST(list_transform(range(1, len(t) - 3),
                i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' '
                     || t[i+3] || ' ' || t[i+4])) AS g
  FROM toks WHERE len(t) >= 5
),
c5 AS (SELECT doc_id, g, CAST(COUNT(*) AS BIGINT) AS cnt
       FROM g5 GROUP BY doc_id, g),
d5 AS (
  SELECT doc_id, CAST(SUM(cnt * length(g)) AS BIGINT) AS dup5_chars
  FROM c5 WHERE cnt >= 2 GROUP BY doc_id
)
SELECT t.doc_id,
       CAST(COALESCE(p.top2_cnt, 0) AS BIGINT) AS top2_cnt,
       p.top2_gram,
       CAST(COALESCE(p.top2_cnt * length(p.top2_gram), 0) * 1000000
            // GREATEST(t.nchars, 1) AS BIGINT) AS top2_frac_mu,
       CAST(COALESCE(d.dup5_chars, 0) AS BIGINT) AS dup5_chars,
       CAST(COALESCE(d.dup5_chars, 0) * 1000000
            // GREATEST(t.nchars, 1) AS BIGINT) AS dup5_frac_mu
FROM toks t
LEFT JOIN top2 p ON t.doc_id = p.doc_id
LEFT JOIN d5 d ON t.doc_id = d.doc_id
"""


def _rep_grams(toks: DataFrame, n: int) -> DataFrame:
    """All overlapping word n-grams per doc (occurrences kept, unlike
    ``shingles``' distinct sets — repetition is what we are counting)."""
    return toks.filter(F.size("t") >= n).select(
        "doc_id", F.explode(T.word_grams_prefiltered(n)).alias("g")
    )


@query("tx_rep_ngram", _TX_REP_NGRAM_ORACLE)
def tx_rep_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher repetition signals (Rae et al. 2021, Table A1): the
    fraction of characters covered by the most frequent word 2-gram
    and by all duplicated word 5-grams — the signature "repetitious
    document" filters (thresholds 0.20 / 0.15 in the paper) that
    catch keyword-stuffed and template-looped pages which per-token
    ratios miss. Fractions are integer micro-units over the
    normalized character count. Accounting note: ALL occurrences of a
    duplicated gram are counted, including the first, and overlapping
    windows are not merged — a deliberate upper-bound variant (cheap:
    no positional bookkeeping), stricter than DataTrove's
    find_all_duplicate, which excludes the first occurrence and skips
    overlaps; values can therefore exceed 1e6 on degenerate all-repeat
    docs, and thresholds must be calibrated to THIS column, not lifted
    verbatim from the Gopher paper. Consumers threshold, not sum. The
    most-frequent 2-gram ties break to the lexicographically smallest
    gram so both engines pick the identical witness.

    Scale design: two (doc_id, gram)-keyed map-side-combinable count
    aggs (the gram key space is bounded by document length, not
    corpus size), one per-doc max agg, and doc_id-keyed equi-joins —
    no corpus-wide vocabulary, no windows, no pair joins; every
    shuffle key contains doc_id so skew is bounded by the longest
    single document."""
    return rep_ngram_report(load_table(spark, sf_dir, "documents"))


def rep_ngram_report(docs: DataFrame) -> DataFrame:
    """Core of tx_rep_ngram over any (doc_id, text) frame — factored
    so crafted-fixture tests can drive degenerate repetition shapes
    the corpus fixture does not contain."""
    # r15: eager localCheckpoint — toks feeds the 2-gram agg, the 5-gram
    # agg and the final join spine (3 parallel branches of ONE job, so
    # eager, not lazy: lazy would race the branches into recomputing the
    # subtree concurrently).  Per-doc token arrays, linear in corpus.
    # Interleaved in-JVM A/B minima: 2.454 -> 1.496 s.
    toks = local_checkpoint(
        docs.select(
            "doc_id",
            T.lower_tokens("text").alias("t"),
            F.length(T.norm_text("text")).alias("nchars"),
        )
    )
    c2 = _rep_grams(toks, 2).groupBy("doc_id", "g").agg(
        F.count("*").cast("bigint").alias("cnt")
    )
    m2 = c2.groupBy("doc_id").agg(F.max("cnt").alias("mx"))
    top2 = (
        c2.join(m2, "doc_id")
        .filter(F.col("cnt") == F.col("mx"))
        .groupBy("doc_id", F.col("mx").alias("top2_cnt"))
        .agg(F.min("g").alias("top2_gram"))
    )
    d5 = (
        _rep_grams(toks, 5)
        .groupBy("doc_id", "g")
        .agg(F.count("*").cast("bigint").alias("cnt"))
        .filter(F.col("cnt") >= 2)
        .groupBy("doc_id")
        .agg(F.sum(F.col("cnt") * F.length("g")).cast("bigint").alias("dup5_chars"))
    )
    return (
        toks.join(top2, "doc_id", "left")
        .join(d5, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("top2_cnt", F.lit(0)).cast("bigint").alias("top2_cnt"),
            "top2_gram",
            F.expr(
                "CAST(COALESCE(top2_cnt * length(top2_gram), 0) * 1000000"
                " DIV GREATEST(nchars, 1) AS BIGINT)"
            ).alias("top2_frac_mu"),
            F.coalesce("dup5_chars", F.lit(0)).cast("bigint").alias("dup5_chars"),
            F.expr(
                "CAST(COALESCE(dup5_chars, 0) * 1000000"
                " DIV GREATEST(nchars, 1) AS BIGINT)"
            ).alias("dup5_frac_mu"),
        )
    )


# --- per-document keyword extraction -----------------------------------------

KEYWORDS_K = 3


@query(
    "tx_keywords",
    f"""
WITH toks AS (
  SELECT doc_id, UNNEST({_LTOKS}) AS tok FROM documents
),
tf AS (
  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks GROUP BY doc_id, tok
),
df AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY tok
),
scored AS (
  SELECT t.doc_id, t.tok, t.tf, d.df,
         CAST((t.tf * 1000000) // d.df AS BIGINT) AS score_mu,
         ROW_NUMBER() OVER (PARTITION BY t.doc_id
                            ORDER BY (t.tf * 1000000) // d.df DESC, t.tok)
           AS rk
  FROM tf t JOIN df d ON t.tok = d.tok
)
SELECT doc_id, CAST(rk AS BIGINT) AS rk, tok, tf, df, score_mu
FROM scored WHERE rk <= {KEYWORDS_K}
""",
)
def tx_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-DOCUMENT keyword extraction: the top-KEYWORDS_K tokens by integer
    tf·1e6 DIV df — each doc's topical signature, the signal topic
    balancing and curriculum bucketing key on. Distinct from
    tx_top_terms, which ranks a per-LANGUAGE vocabulary after
    aggregation; here the window partitions by doc_id over the full
    (doc, token) tf table. Ties break lexicographically; (doc, tok) is
    unique after the tf agg so ranking is total and deterministic.

    Scale shape: tf is one (doc_id, tok)-keyed map-side-combinable
    count, materialized ONCE via localCheckpoint (the
    materialize-before-reuse pattern of operators/manifest.py:109 —
    without it the df agg and the scoring branch each replay the
    corpus scan+tokenize, the dominant cost; with a naive
    count-window-over-tok instead, the hottest token funnels
    O(n_docs) rows through ONE task: windows get no partial
    aggregation and no AQE skew splitting, a straggler/OOM on any
    Zipf corpus). From the checkpoint: df = groupBy(tok).count()
    (map-side combinable — each task emits one partial row per
    distinct token, so the "the"-row shuffle is n_partitions rows,
    not n_docs) and an equi-join back, which AQE CAN skew-split.
    The per-doc top-K plans as WindowGroupLimit — rank partitions
    are single documents, so no reducer ever sees more than one
    doc's vocabulary."""
    return keywords_report(load_table(spark, sf_dir, "documents"))


def keywords_report(docs: DataFrame) -> DataFrame:
    """Core of tx_keywords over any (doc_id, text) frame — factored so
    hand-computed-fixture tests can pin tf/df/score values, not just
    rank shape.

    Lifetime note: the tf localCheckpoint is EAGER — building this
    DataFrame runs the corpus scan+tokenize once, and the checkpointed
    blocks live until the returned plan's references are GC'd
    (ContextCleaner reclaims them — the same
    materialize-before-reuse lifetime operators/manifest.py:109
    accepts). Callers that only want to inspect the plan pay the scan;
    callers that execute it pay nothing extra — construction and
    execution are adjacent everywhere this query runs.  Corollary: a
    test that builds the frame TWICE (collect, then rebuild for a plan
    check) pays two scans — sf0.01 keeps that cheap; if plan-inspection
    paths ever become hot, switch to ``eager=False`` and materialize
    with an explicit count() at the single execution site instead."""
    toks = docs.select(
        "doc_id", F.explode(T.lower_tokens("text")).alias("tok")
    )
    tf = (
        toks.groupBy("doc_id", "tok")
        .agg(F.count("*").cast("bigint").alias("tf"))
        .transform(local_checkpoint)
    )
    df = tf.groupBy("tok").agg(F.count("*").cast("bigint").alias("df"))
    scored = tf.join(df, "tok").withColumn(
        "score_mu", F.expr("CAST((tf * 1000000) DIV df AS BIGINT)")
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score_mu"), F.asc("tok")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= KEYWORDS_K)
        .select("doc_id", "rk", "tok", "tf", "df", "score_mu")
    )
