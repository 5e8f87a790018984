"""Text-analysis expression library for the LLM-data-pipeline surface:
tokenization, quality scoring, language ID, document fingerprinting.

Everything here is built-in Catalyst expressions (split / transform /
aggregate / zip_with lambdas) — JVM-side, whole-stage-codegen-friendly,
no Python in the hot path. At 100 TB these run as narrow projections:
no shuffle, trivially parallel over input partitions.

Dialect discipline (for DuckDB oracles): regex char classes avoid
backslash-dot divergences; integer math (exact) preferred over float
where possible; float outputs rounded to 6 decimals.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

# token regex shared with oracles: words | numbers | single symbol
BPE_TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

STOPWORDS = {
    "en": ("the", "and", "is", "of", "to"),
    "de": ("der", "die", "das", "und", "ist"),
    "es": ("el", "los", "las", "y", "es"),
    "fr": ("le", "les", "et", "est", "dans"),
}

CJK_RE = r"[\x{4e00}-\x{9fff}]"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def ws_tokens(text: Column | str) -> Column:
    """Whitespace tokenization (trimmed, so no boundary empties)."""
    return F.split(F.trim(_c(text)), r"\s+")


def bpe_tokens(text: Column | str) -> Column:
    """BPE-ish tokenization: letter runs, digit runs, single symbols."""
    # group index 0 (whole match): BPE_TOKEN_RE has no capture group, and
    # PySpark's default idx=1 raises REGEX_GROUP_INDEX at runtime.
    return F.regexp_extract_all(_c(text), F.lit(BPE_TOKEN_RE), 0)


def token_count(text: Column | str) -> Column:
    return F.size(ws_tokens(text))


def _count_in_set(tokens: Column, words: tuple[str, ...]) -> Column:
    return F.size(F.filter(tokens, lambda t: t.isin(*words)))


def norm_text(text: Column | str) -> Column:
    """Canonical content normalization for exact dedup: lowercase +
    whitespace fold. THE single spelling — dd_exact_normalized,
    dd_incremental's exact layer, and tx_corpus_prep all hash this, so
    their keeper indexes agree by construction; NORM_SHA_SQL is the
    DuckDB mirror."""
    return F.regexp_replace(F.trim(F.lower(_c(text))), r"\s+", " ")


NORM_SHA_SQL = r"sha256(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'))"


def word_grams_prefiltered(n: int, t: str = "t") -> Column:
    """All overlapping word n-grams of token-array column ``t`` (one
    gram per window position, occurrences kept). CONTRACT: the caller
    must already have filtered to ``size(t) >= n`` — for shorter
    arrays ``sequence(1, size-(n-1))`` generates a DESCENDING sequence
    (sequence(1,-1) -> [1,0,-1]) whose element_at(..., 0) errors under
    ANSI mode and yields garbage grams otherwise. The pre-filtered
    shingle/repetition pipelines use this spelling to keep their plans
    free of a per-row branch; everyone else wants :func:`word_grams`.
    Shingle pipelines wrap the result in array_distinct; repetition
    counters must not."""
    return F.transform(
        F.sequence(F.lit(1), F.size(t) - (n - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(F.col(t), i + j) for j in range(n)]
        ),
    )


def word_grams(n: int, t: str = "t") -> Column:
    """All overlapping word n-grams of token-array column ``t``; the
    empty array when the input has fewer than ``n`` tokens (see
    :func:`word_grams_prefiltered` for why short arrays need the
    guard — this is the safe general-purpose spelling).

    Totality: a NULL token array ALSO yields the empty array, not NULL
    (``size(NULL)`` fails the ``>= n`` test in both legacy and ANSI
    modes, falling to the otherwise branch). Every current caller
    tokenizes non-null text first, so missing-vs-short is never
    distinguished here; a future caller that needs NULL propagation
    must add an explicit ``isNull`` branch."""
    return F.when(
        F.size(t) >= n, word_grams_prefiltered(n, t)
    ).otherwise(F.array().cast("array<string>"))


def lower_tokens(text: Column | str) -> Column:
    """Whitespace tokens of the lowercased text. Compute this ONCE into
    a column and feed the ``*_from`` variants when several text metrics
    share one projection: the split hides behind a lambda boundary, so
    whole-stage codegen does NOT common-subexpression it — measured 1.9x
    on quality+lang-ID together."""
    return F.split(F.trim(F.lower(_c(text))), r"\s+")


def stopword_ratio(text: Column | str, lang: str = "en") -> Column:
    return stopword_ratio_from(lower_tokens(text), lang)


def stopword_ratio_from(ltoks: Column, lang: str = "en") -> Column:
    return _count_in_set(ltoks, STOPWORDS[lang]) / F.size(ltoks)


def punct_ratio(text: Column | str) -> Column:
    # GREATEST(len,1): empty text yields 0.0 in both engines — bare
    # 0/0 is NULL in Spark but NaN in DuckDB (IEEE float division).
    t = _c(text)
    stripped = F.regexp_replace(t, "[.,!?;:]", "")
    return (F.length(t) - F.length(stripped)) / F.greatest(F.length(t), F.lit(1))


def alpha_ratio(text: Column | str) -> Column:
    t = _c(text)
    stripped = F.regexp_replace(t, "[A-Za-z]", "")
    return (F.length(t) - F.length(stripped)) / F.greatest(F.length(t), F.lit(1))


def quality_score(text: Column | str) -> Column:
    """Heuristic document-quality score in [0,1]: length signal,
    stopword density, alphabetic density, punctuation penalty."""
    return quality_score_from(text, lower_tokens(text))


def quality_score_from(text: Column | str, ltoks: Column) -> Column:
    """quality_score with the token array precomputed (see
    :func:`lower_tokens`). Token COUNT over lowered text equals the
    count over the original — lowering never changes whitespace."""
    t = _c(text)
    n_tok = F.size(ltoks).cast("double")
    return F.round(
        0.4 * F.least(n_tok / 100.0, F.lit(1.0))
        + 0.3 * F.least(stopword_ratio_from(ltoks) * 5.0, F.lit(1.0))
        + 0.2 * alpha_ratio(t)
        + 0.1 * (1.0 - punct_ratio(t)),
        6,
    )


def lang_id(text: Column | str) -> Column:
    """n-gram/stopword-heuristic language ID over {en,de,es,fr,zh}:
    any CJK char -> zh; otherwise argmax of per-language stopword hits
    with deterministic tie order en > de > es > fr."""
    return lang_id_from(text, lower_tokens(text))


def lang_id_from(text: Column | str, ltoks: Column) -> Column:
    """lang_id with the token array precomputed (see lower_tokens)."""
    counts = {k: _count_in_set(ltoks, v) for k, v in STOPWORDS.items()}
    cjk = F.length(F.regexp_replace(_c(text), CJK_RE, "")) < F.length(_c(text))
    en, de, es, fr = counts["en"], counts["de"], counts["es"], counts["fr"]
    return (
        F.when(cjk, "zh")
        .when((en >= de) & (en >= es) & (en >= fr), "en")
        .when((de >= es) & (de >= fr), "de")
        .when(es >= fr, "es")
        .otherwise("fr")
    )


def fingerprint(text: Column | str) -> Column:
    """Deterministic rolling-hash-style document fingerprint: each
    whitespace token maps to ascii(first char)*31 + len, weighted by
    its 1-based position, summed. Exact integer math — identical in
    any engine, order-defined, and multiset+position sensitive."""
    toks = ws_tokens(_c(text))
    vals = F.transform(
        toks,
        lambda t: (F.ascii(F.substring(t, 1, 1)) * 31 + F.length(t)).cast("bigint"),
    )
    weighted = F.zip_with(
        vals,
        F.sequence(F.lit(1).cast("bigint"), F.size(toks).cast("bigint")),
        lambda v, i: v * i,
    )
    return F.aggregate(weighted, F.lit(0).cast("bigint"), lambda a, x: a + x)
