"""Reference-simulation tests for text operators whose state makes
them non-SQL-expressible (sequence packing)."""

from __future__ import annotations

import pyspark.sql.functions as F

from ftp_blueprints_spark.plans.text_queries import PACK_TOKEN_BUDGET, tx_pack_sequences


def test_pack_sequences_respects_budget_and_covers_corpus(spark, sf_oracle):
    """Every bin holds <= PACK_TOKEN_BUDGET tokens unless it contains a
    single oversized document; every document is packed exactly once;
    bins are contiguous doc_id runs (greedy order preserved)."""
    from ftp_blueprints_spark.functions.text import lower_tokens
    from ftp_blueprints_spark.session import load_table

    bins = tx_pack_sequences(spark, sf_oracle).collect()
    docs = load_table(spark, sf_oracle, "documents")
    n_docs = docs.count()
    assert sum(r["n_docs"] for r in bins) == n_docs
    for r in bins:
        assert r["total_tokens"] <= PACK_TOKEN_BUDGET or r["n_docs"] == 1, (
            f"bin {r['bin_id']} over budget with {r['n_docs']} docs"
        )
    # greedy utilization sanity: mean fill of multi-doc bins >= 50%
    multi = [r for r in bins if r["n_docs"] > 1]
    if multi:
        fill = sum(r["total_tokens"] for r in multi) / (
            len(multi) * PACK_TOKEN_BUDGET
        )
        assert fill >= 0.5, f"mean fill {fill:.2f}"


def test_pack_sequences_matches_driver_simulation(spark, sf_oracle):
    """Block-local greedy packing == a driver-side simulation over the
    same doc_id-ordered block contents (blocks are fixed doc_id ranges,
    so the simulation needs no knowledge of Spark partitioning)."""
    from ftp_blueprints_spark.functions.text import lower_tokens
    from ftp_blueprints_spark.plans.text_queries import PACK_BLOCK_DOCS
    from ftp_blueprints_spark.session import load_table

    docs = load_table(spark, sf_oracle, "documents")
    rows = (
        docs.select("doc_id", F.size(lower_tokens(F.col("text"))).alias("n_tok"))
        .collect()
    )
    by_blk: dict = {}
    for r in sorted(rows, key=lambda r: r["doc_id"]):
        by_blk.setdefault(r["doc_id"] // PACK_BLOCK_DOCS, []).append(
            (r["doc_id"], r["n_tok"])
        )
    want = {}
    for blk, docs_in_blk in by_blk.items():
        bin_no, used = 0, 0
        for doc_id, n in docs_in_blk:
            if used > 0 and used + n > PACK_TOKEN_BUDGET:
                bin_no += 1
                used = 0
            want.setdefault(f"{blk}-{bin_no}", []).append((doc_id, n))
            used += n
    want_stats = {
        b: (len(v), sum(n for _, n in v), min(d for d, _ in v))
        for b, v in want.items()
    }
    got = {
        r["bin_id"]: (r["n_docs"], r["total_tokens"], r["first_doc_id"])
        for r in tx_pack_sequences(spark, sf_oracle).collect()
    }
    assert got == want_stats


def test_quality_topp_kept_is_score_prefix_and_window_is_bucketed(spark, sf_oracle):
    """(1) Per language the kept set must be exactly a prefix of the
    (quality desc, doc_id) order — no gaps. (2) The running-sum window
    must partition on (lang, bucket), not lang alone: the per-lang
    sequential region is a score bucket, so no one-reducer-per-language
    bottleneck at scale."""
    from ftp_blueprints_spark.plans.text_queries import tx_quality_topp

    df = tx_quality_topp(spark, sf_oracle)
    plan = df._jdf.queryExecution().executedPlan().toString()
    spec = plan[plan.index("Window") :][:400]
    assert "lang" in spec and "b#" in spec, spec
    rows = df.collect()
    import collections

    by_lang = collections.defaultdict(list)
    for r in rows:
        by_lang[r["lang"]].append(r)
    for lang, members in by_lang.items():
        members.sort(key=lambda r: (-r["quality_score"], r["doc_id"]))
        flags = [r["is_kept"] for r in members]
        assert flags == sorted(flags, reverse=True), f"kept not a prefix for {lang}"
        # cumulative token count is consistent with the sort order
        acc = 0
        for r in members:
            acc += r["n_tokens"]
            assert r["cum_tokens"] == acc


def test_gopher_rules_is_pure_narrow_scan(spark, sf_oracle):
    """All five rules + conjunction must evaluate in one map-side
    projection over the scan: no Exchange, no Join, no Window — and
    every rule must discriminate (some pass, some fail) at sf0.01."""
    from ftp_blueprints_spark.plans.text_queries import tx_gopher_rules

    df = tx_gopher_rules(spark, sf_oracle)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Join" not in plan
    assert "Window" not in plan
    rows = df.collect()
    n_pass = sum(r["pass_all"] for r in rows)
    assert 0 < n_pass < len(rows)
    for rule in ("r_len", "r_wordlen", "r_stop", "r_dup"):
        vals = {r[rule] for r in rows}
        assert vals == {True, False}, f"{rule} does not discriminate"


def test_bm25_rare_term_dominates_and_ranks_dense(spark, sf_oracle):
    """For the query mixing rare 'dup' with near-ubiquitous 'merge',
    every top-ranked doc must contain 'dup' (its idf is ~200x larger),
    and ranks must be dense 1..k per query."""
    from ftp_blueprints_spark.plans.text_queries import (
        BM25_QUERIES,
        BM25_TOP_K,
        tx_bm25,
    )
    from ftp_blueprints_spark.session import load_table

    res = tx_bm25(spark, sf_oracle).collect()
    by_q = {}
    for r in res:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {qid for qid, _ in BM25_QUERIES}
    for qid, rows in by_q.items():
        ranks = sorted(r["rank"] for r in rows)
        assert ranks == list(range(1, len(rows) + 1))
        assert len(rows) <= BM25_TOP_K
        scores = [r["score_mu"] for r in sorted(rows, key=lambda r: r["rank"])]
        assert scores == sorted(scores, reverse=True) or all(
            s1 >= s2 for s1, s2 in zip(scores, scores[1:])
        )
    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_oracle, "documents")
        .filter(F.col("doc_id").isin([r["doc_id"] for r in by_q[1]]))
        .collect()
    }
    for r in by_q[1]:
        assert "dup" in docs[r["doc_id"]].lower().split(), (
            f"doc {r['doc_id']} ranked {r['rank']} for the rare-term "
            "query but does not contain 'dup'"
        )


def test_lm_bigram_buckets_are_score_ordered_thirds(spark, sf_oracle):
    """Per language: head/middle/tail partition the docs into thirds
    (sizes differ by <= 1) and bucket membership is monotone in score."""
    from ftp_blueprints_spark.plans.text_queries import tx_lm_bigram

    rows = tx_lm_bigram(spark, sf_oracle).collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rs in by_lang.items():
        counts = {"head": 0, "middle": 0, "tail": 0}
        scores = {"head": [], "middle": [], "tail": []}
        for r in rs:
            counts[r["bucket"]] += 1
            scores[r["bucket"]].append(r["score_mu"])
        assert max(counts.values()) - min(counts.values()) <= 1, (lang, counts)
        if scores["head"] and scores["middle"]:
            assert min(scores["head"]) >= max(scores["middle"])
        if scores["middle"] and scores["tail"]:
            assert min(scores["middle"]) >= max(scores["tail"])


def test_hybrid_rrf_fuses_both_systems(spark, sf_oracle):
    """RRF output scores must equal the sum of the per-system reciprocal
    ranks, and a doc found by both systems must outrank a doc found at
    the same single-system rank by only one."""
    from ftp_blueprints_spark.operators.similarity import RRF_K, sim_hybrid_rrf

    rows = sim_hybrid_rrf(spark, sf_oracle).collect()
    assert rows
    for r in rows:
        assert r["in_text"] or r["in_vec"]
        # rrf_mu bounds: one system -> <= 1e6//61; both -> <= 2*(1e6//61)
        hi = (2 if (r["in_text"] and r["in_vec"]) else 1) * (
            1_000_000 // (RRF_K + 1)
        )
        lo_single = 1_000_000 // (RRF_K + 10)
        assert lo_single <= r["rrf_mu"] <= hi
    both = [r for r in rows if r["in_text"] and r["in_vec"]]
    single = [r for r in rows if not (r["in_text"] and r["in_vec"])]
    if both and single:
        assert max(r["rrf_mu"] for r in both) > min(
            r["rrf_mu"] for r in single
        )


def test_bpe_pairs_shape(spark, sf_oracle):
    from ftp_blueprints_spark.plans import text_queries as TQ

    rows = TQ.tx_bpe_pairs(spark, sf_oracle).collect()
    assert len(rows) == TQ.BPE_TOP_PAIRS
    assert [r.rank for r in sorted(rows, key=lambda r: r.rank)] == list(
        range(1, TQ.BPE_TOP_PAIRS + 1)
    )
    counts = [r.pair_count for r in sorted(rows, key=lambda r: r.rank)]
    assert counts == sorted(counts, reverse=True)
    assert all(len(r.pair) == 2 for r in rows)


def test_quality_classifier_feature_count_and_label(spark, sf_oracle):
    from ftp_blueprints_spark.plans import text_queries as TQ
    import pyspark.sql.functions as F

    out = TQ.tx_quality_classifier(spark, sf_oracle)
    # n_features = unigrams + bigrams = 2 * n_tokens - 1 for every doc
    docs = spark.read.parquet(f"{sf_oracle}/documents.parquet").select(
        "doc_id",
        F.size(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("n_tok"),
    )
    j = out.join(docs, "doc_id").collect()
    assert len(j) > 0
    for r in j:
        assert r.n_features == 2 * r.n_tok - 1
        assert r.keep == (r.score >= 0)
    # the fake model must actually split the corpus, not constant-label it
    labels = {r.keep for r in j}
    assert labels == {True, False}


def test_domain_cap_enforces_k_and_keeps_saturated_domains_full(spark, sf_oracle):
    """No source exceeds DOMAIN_CAP_K kept docs, and any source with
    more than K docs in the corpus keeps EXACTLY K (the cap trims, it
    never under-fills)."""
    from ftp_blueprints_spark.plans import text_queries as TQ

    kept = TQ.tx_domain_cap(spark, sf_oracle).groupBy("source").count()
    totals = (
        spark.read.parquet(f"{sf_oracle}/documents.parquet")
        .groupBy("source")
        .count()
        .withColumnRenamed("count", "total")
    )
    rows = kept.join(totals, "source").collect()
    assert rows
    for r in rows:
        assert r["count"] <= TQ.DOMAIN_CAP_K
        if r["total"] >= TQ.DOMAIN_CAP_K:
            assert r["count"] == TQ.DOMAIN_CAP_K, r["source"]


def test_weighted_sample_overrepresents_heavy_docs(spark, sf_oracle):
    """Priority sampling selects proportionally to weight: the mean
    n_chars of the kept docs must exceed the corpus mean (longer docs
    are over-represented by construction)."""
    from ftp_blueprints_spark.plans import text_queries as TQ

    got = TQ.tx_weighted_sample(spark, sf_oracle)
    sample_mean = got.agg(F.avg("n_chars")).collect()[0][0]
    corpus_mean = (
        spark.read.parquet(f"{sf_oracle}/documents.parquet")
        .agg(F.avg("n_chars"))
        .collect()[0][0]
    )
    assert sample_mean > corpus_mean


def test_corpus_drift_top_token_is_true_argmax(spark, sf_oracle):
    """The reported top drift token must be the genuine argmax of the
    chi-square contribution, recomputed driver-side from raw cohort
    counts, and every reported contribution must be non-negative and
    non-increasing."""
    from collections import Counter

    from ftp_blueprints_spark.plans import text_queries as TQ

    rows = TQ.tx_corpus_drift(spark, sf_oracle).collect()
    assert rows and all(r.chi2_micros >= 0 for r in rows)
    assert all(
        rows[i].chi2_micros >= rows[i + 1].chi2_micros for i in range(len(rows) - 1)
    )
    docs = spark.read.parquet(f"{sf_oracle}/documents.parquet").select(
        "doc_id", "text"
    ).collect()
    c = [Counter(), Counter()]
    for r in docs:
        c[r.doc_id % 2].update(r.text.strip().lower().split())
    t1, t2 = sum(c[0].values()), sum(c[1].values())
    import math

    def chi2_micros(tok):
        n1, n2 = c[0].get(tok, 0), c[1].get(tok, 0)
        d = float(n1) * float(t2) - float(n2) * float(t1)
        return math.floor(d * d / (float(t1) * float(t2) * float(n1 + n2)) * 1e6)

    vocab = set(c[0]) | set(c[1])
    best = max(chi2_micros(t) for t in vocab)
    assert rows[0].chi2_micros == best


def test_weighted_sample_priority_survives_long_docs(spark):
    """Regression (r6 review): the 48-bit formulation overflowed BIGINT
    for any doc with n_chars >= 2^15 (Spark wrapped negative, silently
    inverting the sample; DuckDB raised). The 32-bit scale must yield
    a positive, exactly-reproducible priority for a 40 KB document."""
    import hashlib

    from ftp_blueprints_spark.plans.text_queries import _PRIORITY_SCALE

    text = "long document " * 3000  # 42000 chars
    df = spark.createDataFrame(
        [(1, text, len(text))], "doc_id long, text string, n_chars long"
    )
    got = df.selectExpr(
        f"CAST(n_chars AS BIGINT) * {_PRIORITY_SCALE}"
        " DIV (CAST(CONV(SUBSTRING(MD5(text), 1, 8), 16, 10) AS BIGINT) + 1)"
        " AS priority"
    ).collect()[0]["priority"]
    h = int(hashlib.md5(text.encode()).hexdigest()[:8], 16)
    want = len(text) * _PRIORITY_SCALE // (h + 1)
    assert got == want and got > 0


def test_empty_text_ratios_are_zero_not_null(spark, sf_oracle):
    """Empty documents must score 0.0, not NULL/NaN: bare len/len
    division is 0/0 — NULL in Spark but NaN in DuckDB (IEEE float
    ops), a cross-engine hash divergence the GREATEST(len,1) guard
    closes. Nothing in the fixture contract forbids empty docs."""
    import duckdb

    from ftp_blueprints_spark.functions import text as T

    row = (
        spark.range(1)
        .select(F.lit("").alias("text"))
        .select(
            T.alpha_ratio("text").alias("a"),
            T.punct_ratio("text").alias("p"),
            T.quality_score("text").alias("q"),
        )
        .collect()[0]
    )
    assert row["a"] == 0.0 and row["p"] == 0.0
    assert row["q"] is not None and row["q"] == row["q"]  # not NULL/NaN

    from ftp_blueprints_spark.plans.text_queries import _QUALITY_SQL

    con = duckdb.connect()
    (q,) = con.execute(
        f"SELECT {_QUALITY_SQL} AS s FROM (SELECT '' AS text) documents"
    ).fetchone()
    assert q == row["q"], f"oracle {q} != spark {row['q']} on empty text"


def test_registry_rejects_duplicate_names():
    """A second @query under an existing name must raise at import
    time — plain dict assignment silently shadowed q_unpivot for two
    rounds (the part-based unpivot vanished from the driver contract
    with no error)."""
    import pytest as _pytest

    from ftp_blueprints_spark.plans.registry import QUERIES, query

    name = next(iter(QUERIES))
    with _pytest.raises(ValueError, match="duplicate query registration"):
        query(name)(lambda spark, sf_dir: None)


def test_rep_ngram_crafted_fractions(spark):
    """Hand-computed Gopher repetition fractions on degenerate docs the
    corpus fixture lacks: a looped 2-gram doc, an all-distinct doc, an
    all-same-token doc (fraction > 1e6 by overlap accounting), and a
    single-token doc (no 2-grams at all)."""
    from ftp_blueprints_spark.plans.text_queries import rep_ngram_report

    docs = spark.createDataFrame(
        [
            (1, "a b a b a b"),
            (2, "x y z w v u t s"),
            (3, "q q q q q q q q q q"),
            (4, "solo"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in rep_ngram_report(docs).collect()}
    # doc 1: 'a b' x3 beats 'b a' x2; 3 * len('a b')=9 chars over 11.
    assert (out[1].top2_gram, out[1].top2_cnt) == ("a b", 3)
    assert out[1].top2_frac_mu == 9 * 1_000_000 // 11
    assert out[1].dup5_chars == 0  # both 5-grams occur once
    # doc 2: all 2-grams distinct -> cnt 1, tie breaks to smallest gram.
    assert out[2].top2_cnt == 1
    toks2 = "x y z w v u t s".split()
    assert out[2].top2_gram == min(
        f"{a} {b}" for a, b in zip(toks2, toks2[1:])
    )
    assert out[2].dup5_chars == 0
    # doc 3: 'q q' x9, 9*3=27 chars over 19 -> exceeds 1e6 (documented).
    assert (out[3].top2_gram, out[3].top2_cnt) == ("q q", 9)
    assert out[3].top2_frac_mu == 27 * 1_000_000 // 19
    assert out[3].top2_frac_mu > 1_000_000
    # 'q q q q q' occurs 6 times, 6*9=54 chars over 19.
    assert out[3].dup5_chars == 54
    assert out[3].dup5_frac_mu == 54 * 1_000_000 // 19
    # doc 4: no 2-grams -> zeroed signals, null witness.
    assert (out[4].top2_cnt, out[4].top2_gram, out[4].top2_frac_mu) == (0, None, 0)
    assert (out[4].dup5_chars, out[4].dup5_frac_mu) == (0, 0)


def test_keywords_rank_contract(spark, sf_oracle):
    """Every doc emits at most KEYWORDS_K rows with contiguous ranks
    from 1; scores are non-increasing in rank and ties are ordered
    lexicographically by token."""
    from ftp_blueprints_spark.plans.text_queries import KEYWORDS_K, tx_keywords

    rows = tx_keywords(spark, sf_oracle).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert by_doc
    for doc, rs in by_doc.items():
        rs.sort(key=lambda r: r.rk)
        assert 1 <= len(rs) <= KEYWORDS_K
        assert [r.rk for r in rs] == list(range(1, len(rs) + 1))
        for a, b in zip(rs, rs[1:]):
            assert (-a.score_mu, a.tok) <= (-b.score_mu, b.tok)


def test_keywords_hand_computed(spark):
    """Pin the actual tf/df/score arithmetic on a crafted corpus (the
    rank-contract test checks shape only — a shared misconception in
    both engines would pass it AND the oracle). apple: tf 2 in doc 1,
    df 1 -> 2e6; banana: df 2 -> 5e5 in both docs; durian tf 3 df 1 ->
    3e6. Single-scan property after the r9 rewrite: the corpus is
    scanned+tokenized exactly once, EAGERLY, by the tf localCheckpoint;
    the final plan then reads the checkpoint RDD twice (scoring branch
    + df agg) and contains no corpus scan at all."""
    from ftp_blueprints_spark.plans.text_queries import keywords_report

    docs = spark.createDataFrame(
        [
            (1, "Apple banana APPLE"),
            (2, "banana cherry"),
            (3, "durian durian durian"),
        ],
        "doc_id long, text string",
    )
    out = {(r.doc_id, r.rk): (r.tok, r.tf, r.df, r.score_mu)
           for r in keywords_report(docs).collect()}
    assert out == {
        (1, 1): ("apple", 2, 1, 2_000_000),
        (1, 2): ("banana", 1, 2, 500_000),
        (2, 1): ("cherry", 1, 1, 1_000_000),
        (2, 2): ("banana", 1, 2, 500_000),
        (3, 1): ("durian", 3, 1, 3_000_000),
    }
    plan = (
        keywords_report(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # Both post-checkpoint consumers read the materialized tf RDD; the
    # corpus scan/tokenize (explode) happened once, outside this plan.
    assert plan.count("Scan ExistingRDD") == 2, plan
    assert "FileScan" not in plan and "Generate explode" not in plan, plan


def test_keywords_df_is_not_a_window(spark):
    """Zipf-shaped fixture: one stopword in EVERY doc. The r8 plan
    computed df as count(*) OVER (PARTITION BY tok) — a window
    partition is one task with no partial aggregation and no AQE skew
    splitting, so the stopword funnels O(n_docs) rows through one
    reducer at scale. The r9 plan must (a) still produce the exact df
    for the hot token and (b) contain NO aggregate window at all: df
    comes from a map-side-combinable groupBy feeding a skew-splittable
    equi-join; the only window is the per-doc row_number rank."""
    import re

    from ftp_blueprints_spark.plans.text_queries import keywords_report

    n = 64
    docs = spark.createDataFrame(
        [(i, f"the uniq{i} uniq{i} uniq{i}") for i in range(n)],
        "doc_id long, text string",
    )
    rows = keywords_report(docs).collect()
    by_key = {(r.doc_id, r.tok): r for r in rows}
    for i in range(n):
        hot = by_key[(i, "the")]
        assert (hot.tf, hot.df) == (1, n)
        uniq = by_key[(i, f"uniq{i}")]
        assert (uniq.tf, uniq.df, uniq.rk) == (3, 1, 1)
    plan = (
        keywords_report(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    windows = re.findall(r"Window \[.*", plan)
    assert windows, plan
    for w in windows:
        assert "row_number()" in w and "doc_id" in w, w
        assert "count(" not in w, w


def test_word_grams_short_arrays_are_empty(spark):
    """The exported helper must be total: below n tokens the gram list
    is empty, not a descending-sequence error (ANSI: element_at(_, 0))
    or garbage grams. The unguarded spelling is a separate, contract-
    documented function used only by pre-filtered pipelines."""
    import ftp_blueprints_spark.functions.text as T

    df = spark.createDataFrame(
        [(0, []), (1, ["a"]), (2, ["a", "b"]), (3, ["a", "b", "c"])],
        "doc_id long, t array<string>",
    )
    got = {r.doc_id: r.g for r in
           df.select("doc_id", T.word_grams(2).alias("g")).collect()}
    assert got == {0: [], 1: [], 2: ["a b"], 3: ["a b", "b c"]}
