"""Oracle-checked text-analysis queries over `documents` (SURVEY.md §2B
extension surface: token counting, quality scoring, language ID,
fingerprinting). DuckDB SQL mirrors functions/text.py exactly."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..functions import text as T
from ..session import load_table
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
    + 0.2 * CAST(length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS DOUBLE) / length(text)
    + 0.1 * (1.0 - CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE) / length(text)), 6)
"""


@query(
    "tx_quality",
    f"""
SELECT doc_id,
       ROUND(CAST({_STOP_EN} AS DOUBLE) / len({_LTOKS}), 6) AS stop_ratio,
       ROUND(CAST(length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS DOUBLE) / length(text), 6) AS alpha_ratio,
       ROUND(CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE) / length(text), 6) AS punct_ratio,
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
