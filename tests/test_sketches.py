"""Count-min sketch properties beyond the oracle parity check: the
one-sided error bound and cell-wise mergeability (the reason to use a
sketch instead of exact counts at 100 TB — per-shard sketches add up).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from ftp_blueprints_spark.functions import text as T
from ftp_blueprints_spark.operators import sketches as S
from ftp_blueprints_spark.session import load_table


def _tf(docs):
    toks = docs.select(F.explode(T.lower_tokens(F.col("text"))).alias("tok"))
    return toks.groupBy("tok").agg(F.count("*").cast("bigint").alias("tf"))


def test_cms_never_undercounts(spark, sf_oracle):
    out = S.sk_cms_heavy_hitters(spark, sf_oracle)
    rows = out.collect()
    assert len(rows) > 0
    assert all(r["never_undercounts"] for r in rows)
    assert all(r["cms_est"] >= r["true_cnt"] for r in rows)


def test_cms_sketch_is_constant_size(spark, sf_oracle):
    docs = load_table(spark, sf_oracle, "documents")
    sk = S.cms_sketch(_tf(docs))
    assert sk.count() <= S.CMS_DEPTH * S.CMS_WIDTH


def test_cms_sketches_merge_cellwise(spark, sf_oracle):
    """sketch(A) + sketch(B) == sketch(A u B) cell-for-cell: the
    distributive property that lets per-shard / per-day sketches
    combine without reprocessing raw data."""
    docs = load_table(spark, sf_oracle, "documents")
    a = docs.filter(F.col("doc_id") % 2 == 0)
    b = docs.filter(F.col("doc_id") % 2 == 1)
    merged = (
        S.cms_sketch(_tf(a))
        .unionByName(S.cms_sketch(_tf(b)))
        .groupBy("d", "bucket")
        .agg(F.sum("cell").cast("bigint").alias("cell"))
    )
    whole = S.cms_sketch(_tf(docs))
    diff = merged.join(whole, ["d", "bucket"], "full").filter(
        (merged["cell"].isNull())
        | (whole["cell"].isNull())
        | (merged["cell"] != whole["cell"])
    )
    assert diff.count() == 0


def test_bloom_no_false_negatives(spark, sf_oracle):
    """Every exactly-contaminated doc must be bloom-flagged (the
    one-sided Bloom guarantee); false positives are allowed but counted."""
    out = S.sk_bloom_decontaminate(spark, sf_oracle).collect()
    assert len(out) > 0
    for r in out:
        if r["is_contaminated_exact"] == 1:
            assert r["bloom_flagged"] == 1, f"false negative at doc {r['doc_id']}"


def test_bloom_flags_doc_whose_only_overlap_repeats(spark):
    """Regression: a training doc whose ONLY contaminated shingle
    occurs TWICE must still be bloom-flagged. Before the per-(doc,
    shingle) dedup, each occurrence fanned out its own BLOOM_K probe
    rows, the matched-row count hit 2*BLOOM_K != BLOOM_K, and the
    membership equality read a true hit as a miss — a false negative
    through the exact plan the driver checks."""
    from ftp_blueprints_spark.plans.text_queries import EVAL_MOD, EVAL_REM

    eval_id = EVAL_REM  # doc_id % EVAL_MOD == EVAL_REM -> eval set
    train_id = EVAL_REM + 1
    docs = spark.createDataFrame(
        [
            (eval_id, "foo bar baz"),
            # the shingle "foo bar baz" occurs twice; no other overlap
            (train_id, "foo bar baz qux foo bar baz"),
        ],
        "doc_id bigint, text string",
    )
    rows = {r["doc_id"]: r for r in S.bloom_decontaminate(docs).collect()}
    r = rows[train_id]
    assert r["is_contaminated_exact"] == 1
    assert r["bloom_flagged"] == 1, "repeated-shingle contamination missed"


def test_kmv_estimate_tracks_exact_distinct(spark, sf_oracle):
    """KMV estimate vs exact distinct-shingle count per source: with
    K=64 the stderr is ~12.7%, so mean relative error must stay well
    under 2 sigma and every group must engage the estimator path
    (n_kept == K) on this corpus."""
    from ftp_blueprints_spark.session import load_table

    est = {r["source"]: r for r in S.sk_kmv_distinct(spark, sf_oracle).collect()}
    docs = load_table(spark, sf_oracle, "documents")
    exact = {
        r["source"]: r["d"]
        for r in S._shingles(docs, keys=("source",))
        .groupBy("source")
        .agg(F.count_distinct("sh").alias("d"))
        .collect()
    }
    assert set(est) == set(exact)
    errs = [
        abs(est[s]["est_distinct"] - exact[s]) / exact[s] for s in exact
    ]
    assert all(r["n_kept"] == S.KMV_K for r in est.values())
    assert sum(errs) / len(errs) <= 0.25, f"mean rel err {sum(errs)/len(errs):.3f}"
    assert max(errs) <= 0.6, f"max rel err {max(errs):.3f}"
