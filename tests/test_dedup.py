"""Accuracy tests for the probabilistic dedup operators: MinHash-LSH
candidate recall vs the exact df-capped n-gram Jaccard ground truth,
SimHash sanity, and skew-cap behavior.
"""

from __future__ import annotations

import pytest

import pyspark.sql.functions as F

from ftp_blueprints_spark.operators import dedup as D


@pytest.mark.slow  # >10 s measured (r16 durations profile)
def test_minhash_lsh_recall_vs_exact_jaccard(spark, sf_oracle):
    """Every exact-Jaccard pair at threshold 0.3 should surface as an
    LSH candidate with high probability: with 8 bands x 4 rows, a pair
    at J=0.3 collides with p = 1-(1-0.3^4)^8 ~ 6% per band-row config,
    but observed duplicate pairs in this corpus have J >> threshold
    (exact copies J=1 collide with certainty). Assert recall over the
    actual ground-truth pairs."""
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in D.dd_ngram_jaccard(spark, sf_oracle).collect()
    }
    assert exact, "ground truth unexpectedly empty at sf0.01"
    cand = {
        (r["doc_a"], r["doc_b"])
        for r in D.dd_minhash_lsh(spark, sf_oracle).collect()
    }
    recall = len(exact & cand) / len(exact)
    assert recall >= 0.9, f"MinHash-LSH recall = {recall:.3f}"


def test_minhash_est_jaccard_tracks_exact(spark, sf_oracle):
    """For candidate pairs that are exact-Jaccard pairs, the signature
    estimate should be within 0.25 of the true Jaccard (32 perms ->
    stderr ~ sqrt(J(1-J)/32) <= 0.09; 0.25 is ~3 sigma)."""
    exact = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in D.dd_ngram_jaccard(spark, sf_oracle).collect()
    }
    est = {
        (r["doc_a"], r["doc_b"]): r["est_jaccard"]
        for r in D.dd_minhash_lsh(spark, sf_oracle).collect()
    }
    both = set(exact) & set(est)
    assert both
    for pair in both:
        assert abs(exact[pair] - est[pair]) <= 0.25, (
            f"{pair}: exact={exact[pair]:.3f} est={est[pair]:.3f}"
        )


def test_simhash_banding_is_complete_at_threshold(spark, sf_oracle):
    """Pigeonhole completeness: the chunk-bucket join must find EVERY
    pair within Hamming distance HAMMING_THRESHOLD (4 chunks, <=3 bit
    errors -> at least one clean chunk). Ground truth is a driver-side
    exact all-pairs scan over the collected 64-bit signatures."""
    sigs = {r["doc_id"]: r["simhash"] for r in D.simhash(
        __import__("ftp_blueprints_spark.session", fromlist=["load_table"]).load_table(
            spark, sf_oracle, "documents"
        )
    ).collect()}
    ids = sorted(sigs)
    mask = (1 << 64) - 1
    want = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            if bin((sigs[a] ^ sigs[b]) & mask).count("1") <= D.HAMMING_THRESHOLD:
                want.add((a, b))
    got = {
        (r["doc_a"], r["doc_b"]) for r in D.dd_simhash(spark, sf_oracle).collect()
    }
    assert got == want, f"missing={want - got} extra={got - want}"


def test_capped_shingles_drop_hot_keys(spark, sf_oracle):
    """The df cap actually removes high-frequency shingles from the
    join input (bounding per-key fan-out)."""
    from ftp_blueprints_spark.session import load_table

    docs = load_table(spark, sf_oracle, "documents")
    capped = D.capped_shingles(docs, 3, max_df=5)
    max_df = (
        capped.groupBy("s").agg(F.count("*").alias("df"))
        .agg(F.max("df").alias("m")).collect()[0]["m"]
    )
    assert max_df <= 5


def test_semantic_dedup_plan_is_cluster_bounded(spark, sf_oracle):
    """dd_semantic's quadratic must be cluster-scoped: the pair join is
    an equi-join on cid (never a cartesian), the centroid assignment is
    the literal-projection argmax (no Window anywhere), and exactly the
    earlier-in-cluster neighbors mark duplicates."""
    df = D.dd_semantic(spark, sf_oracle)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" not in plan
    rows = df.collect()
    assert len(rows) == 500
    kept = sum(r["is_kept"] for r in rows)
    assert 0 < kept < 500  # non-trivial: some dupes, some keepers
    # every cluster keeps at least its lowest member
    import collections
    by_cid = collections.defaultdict(list)
    for r in rows:
        by_cid[r["cid"]].append(r)
    for cid, members in by_cid.items():
        lowest = min(m["vec_id"] for m in members)
        assert next(m for m in members if m["vec_id"] == lowest)["is_kept"]


def test_span_dedup_clean_text_identity(spark, sf_oracle):
    """A doc with zero duplicated spans must reassemble to its original
    text (spans partition the token stream), so clean_sha == sha256(text);
    a doc with dup spans must differ. Also: dup span count is globally
    consistent — total spans minus distinct span texts."""
    from ftp_blueprints_spark.session import load_table

    res = D.dd_span_dedup(spark, sf_oracle)
    docs = load_table(spark, sf_oracle, "documents").select(
        "doc_id", F.sha2("text", 256).alias("orig_sha")
    )
    j = res.join(docs, "doc_id").collect()
    assert all(
        (r["clean_sha"] == r["orig_sha"]) == (r["n_dup_spans"] == 0) for r in j
    )
    assert sum(r["n_dup_spans"] for r in j) > 0  # non-trivial corpus

def test_connected_keepers_truncates_lineage_and_converges(spark):
    """The min-label-propagation loop must not regrow lineage per round:
    edges are localCheckpointed once and each round's labels are
    localCheckpointed, so the final plan reads cached RDDs — NOT a
    re-derivation of the pair-generation pipeline (at 100 TB, a lineage
    that re-runs LSH bucketing every iteration is a scale-killer).
    A 5-node chain (diameter 4 > the 2-4 typical rounds) proves
    convergence is driven by the change-count, not a fixed round count."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11)], ["doc_a", "doc_b"]
    )
    docs = spark.createDataFrame(
        [(i,) for i in [1, 2, 3, 4, 5, 10, 11, 99]], ["doc_id"]
    )
    lab = D.connected_keepers(pairs, docs)
    got = {r["doc_id"]: r["keeper"] for r in lab.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10, 99: 99}
    plan = lab._jdf.queryExecution().executedPlan().toString()
    # localCheckpoint materializes as an RDD scan; the original input
    # lineage (createDataFrame's LocalTableScan / parquet) must be gone
    assert "ExistingRDD" in plan
    assert "LocalTableScan" not in plan


def test_lsh_census_broadcast_guard_paths_agree(spark):
    """The census size guard (dedup.py lsh_candidates broadcast_census):
    on a mass-duplicated fixture both the hinted-broadcast path and the
    AQE fallback must produce identical candidate pairs, the hinted
    plan must carry the broadcast on the census join, and the fallback
    plan must NOT hard-code it (strategy left to AQE runtime stats —
    the correct behavior when the census could exceed driver memory)."""
    # 40 docs in 8 clusters of 5 near-identical texts -> every cluster
    # is a dense LSH bucket; plus a hot 600-copy cluster that must be
    # dropped by the 2..MAX_LSH_BUCKET rule on BOTH paths.
    rows = [
        (cid * 10 + i, f"cluster {cid} shared shingle text body " * 5 + f"tail{i}")
        for cid in range(8)
        for i in range(5)
    ]
    rows += [(1000 + i, "hot duplicated body everywhere " * 6) for i in range(600)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    sh = D.capped_shingles(docs, 3, max_df=10_000)  # keep hot shingles: the
    # bucket cap, not the shingle-df cap, must be what drops the 600-cluster
    sig = D.minhash_signatures(sh).cache()
    try:
        hinted = D.lsh_candidates(sig, broadcast_census=True)
        fallback = D.lsh_candidates(sig, broadcast_census=False)
        got_h = {(r["doc_a"], r["doc_b"]) for r in hinted.collect()}
        got_f = {(r["doc_a"], r["doc_b"]) for r in fallback.collect()}
        assert got_h == got_f and got_h, "paths disagree or empty"
        # no pair from the 600-copy hot cluster survives the bucket cap
        assert not any(a >= 1000 and b >= 1000 for a, b in got_h)
        plan_h = hinted._jdf.queryExecution().optimizedPlan().toString()
        plan_f = fallback._jdf.queryExecution().optimizedPlan().toString()
        assert "ResolvedHint" in plan_h or "broadcast" in plan_h.lower()
        assert "ResolvedHint" not in plan_f
        # On this small fixture AQE still broadcasts the census at
        # runtime, so the absence of the hint alone doesn't prove the
        # shuffled branch WORKS. Disable broadcast joins entirely and
        # re-run the fallback: the census join must now execute as a
        # real shuffled join (SortMergeJoin/ShuffledHashJoin) with the
        # same candidate pairs — this is the census-bigger-than-driver
        # 100 TB code path actually running, not just being reachable.
        thr = "spark.sql.autoBroadcastJoinThreshold"
        aqe_thr = "spark.sql.adaptive.autoBroadcastJoinThreshold"
        old_thr = spark.conf.get(thr)
        try:  # typed conf: .get with a default validates the default
            old_aqe = spark.conf.get(aqe_thr)
        except Exception:
            old_aqe = None
        try:
            spark.conf.set(thr, "-1")
            spark.conf.set(aqe_thr, "-1")
            shuffled = D.lsh_candidates(sig, broadcast_census=False)
            got_s = {(r["doc_a"], r["doc_b"]) for r in shuffled.collect()}
            assert got_s == got_h
            plan_s = (
                shuffled._jdf.queryExecution().executedPlan().toString()
            )
            assert (
                "SortMergeJoin" in plan_s or "ShuffledHashJoin" in plan_s
            ), plan_s
            # The CENSUS join (keyed on band, bh) must not be broadcast
            # here.  A blanket no-BroadcastHashJoin assert is too wide:
            # the cached `sig` subtree upstream was planned BEFORE this
            # test disabled the thresholds, so its joins may legitimately
            # still render as broadcasts (capped_shingles' anti-join is
            # deliberately unhinted — AQE decides it from runtime stats,
            # see its docstring).  Anchor the assert to the census keys.
            import re as _re

            census_bhj = _re.search(
                r"BroadcastHashJoin \[band", plan_s
            )
            assert census_bhj is None, plan_s
        finally:
            spark.conf.set(thr, old_thr)
            if old_aqe is not None:
                spark.conf.set(aqe_thr, old_aqe)
            else:
                spark.conf.unset(aqe_thr)
    finally:
        sig.unpersist()


def test_quality_keeper_is_best_in_cluster(spark, sf_oracle):
    """Every cluster elects exactly one keeper; the keeper carries the
    cluster's max lexical-diversity score, ties broken to the lowest
    doc_id; multi-member clusters exist so the election is exercised."""
    rows = D.dd_quality_keeper(spark, sf_oracle).collect()
    by_cluster: dict[int, list] = {}
    for r in rows:
        by_cluster.setdefault(r.cluster, []).append(r)
    assert any(len(v) > 1 for v in by_cluster.values())
    for members in by_cluster.values():
        keepers = {r.keeper for r in members}
        assert len(keepers) == 1
        k = keepers.pop()
        kept = [r for r in members if r.is_kept]
        assert len(kept) == 1 and kept[0].doc_id == k
        mx = max(r.lex_mu for r in members)
        assert kept[0].lex_mu == mx
        assert k == min(r.doc_id for r in members if r.lex_mu == mx)


def test_quality_keeper_partition_matches_components(spark, sf_oracle):
    """dd_quality_keeper only changes the SURVIVOR, never the clusters:
    its cluster ids are exactly dd_neardup_components' min-label
    keepers, doc for doc."""
    qk = {r.doc_id: r.cluster for r in D.dd_quality_keeper(spark, sf_oracle).collect()}
    comp = {
        r.doc_id: r.keeper for r in D.dd_neardup_components(spark, sf_oracle).collect()
    }
    assert qk == comp


def test_incremental_statuses_consistent(spark, sf_oracle):
    """Statuses partition the batch; refs point the right way (corpus
    refs are corpus ids, batch refs are EARLIER batch ids, kept docs
    self-reference); the fixture exercises all three statuses."""
    rows = D.dd_incremental(spark, sf_oracle).collect()
    seen = {r.status for r in rows}
    assert seen == {"kept", "dup_corpus", "dup_batch"}
    for r in rows:
        assert r.doc_id % D.INCR_BATCH_MOD == 0
        if r.status == "kept":
            assert r.dedup_ref == r.doc_id
        elif r.status == "dup_corpus":
            assert r.dedup_ref % D.INCR_BATCH_MOD != 0
        else:
            assert r.dedup_ref % D.INCR_BATCH_MOD == 0
            assert r.dedup_ref < r.doc_id


def test_incremental_exact_layer_crafted(spark):
    """The corpus fixture has zero exact duplicates, so the exact-hash
    layer is driven here with a crafted snapshot: batch doc 2 is a
    byte-twin of corpus doc 1 (dup_corpus via hash), batch doc 6 twins
    batch doc 4 (dup_batch via hash), batch doc 8 is novel."""
    norm = spark.createDataFrame(
        [(1, "h_a"), (2, "h_a"), (4, "h_b"), (6, "h_b"), (8, "h_c"), (3, "h_d")],
        "doc_id long, h string",
    )
    pairs = spark.createDataFrame([], "doc_a long, doc_b long")
    out = {r.doc_id: r for r in D.incremental_classify(norm, pairs).collect()}
    assert set(out) == {2, 4, 6, 8}
    assert (out[2].status, out[2].dedup_ref) == ("dup_corpus", 1)
    assert (out[4].status, out[4].dedup_ref) == ("kept", 4)
    assert (out[6].status, out[6].dedup_ref) == ("dup_batch", 4)
    assert (out[8].status, out[8].dedup_ref) == ("kept", 8)


def test_incremental_corpus_ref_beats_batch_ref(spark):
    """A doc that is both an exact batch-twin and a near-dup of a
    corpus doc classifies as dup_corpus (corpus layer wins), and the
    ref is the smallest corpus partner."""
    norm = spark.createDataFrame(
        [(2, "h_x"), (6, "h_x"), (3, "h_y"), (5, "h_z")], "doc_id long, h string"
    )
    pairs = spark.createDataFrame([(3, 6), (5, 6)], "doc_a long, doc_b long")
    out = {r.doc_id: r for r in D.incremental_classify(norm, pairs).collect()}
    assert (out[6].status, out[6].dedup_ref) == ("dup_corpus", 3)
    assert (out[2].status, out[2].dedup_ref) == ("kept", 2)


def test_incremental_classify_randomized_vs_naive(spark):
    """Property test for incremental_classify's precedence rules on
    randomized snapshots: tiny hash alphabets (mass collisions), random
    near-dup pair graphs, batch/corpus interleavings. The naive
    reference walks the rules directly: corpus layer (exact OR near)
    beats batch layer; within a layer the ref is the smallest
    qualifying partner; batch partners must be strictly earlier."""
    import random

    rng = random.Random(20260815)
    for trial in range(4):
        n = rng.randint(4, 40)
        ids = rng.sample(range(1, 400), n)
        alphabet = [f"h{k}" for k in range(rng.choice([2, 3, 8]))]
        norm_rows = [(i, rng.choice(alphabet)) for i in ids]
        pair_rows = set()
        for _ in range(rng.randint(0, n)):
            a, b = rng.sample(ids, 2)
            pair_rows.add((min(a, b), max(a, b)))
        norm = spark.createDataFrame(norm_rows, "doc_id long, h string")
        pairs = spark.createDataFrame(
            sorted(pair_rows) or [], "doc_a long, doc_b long"
        )
        got = {
            r.doc_id: (r.status, r.dedup_ref)
            for r in D.incremental_classify(norm, pairs).collect()
        }
        h_of = dict(norm_rows)
        nbrs: dict[int, set[int]] = {}
        for a, b in pair_rows:
            nbrs.setdefault(a, set()).add(b)
            nbrs.setdefault(b, set()).add(a)
        m = D.INCR_BATCH_MOD
        want = {}
        for i in ids:
            if i % m != 0:
                continue
            corpus_refs = [
                j for j in ids if j % m != 0 and h_of[j] == h_of[i] and j != i
            ] + [j for j in nbrs.get(i, ()) if j % m != 0]
            batch_refs = [
                j for j in ids if j % m == 0 and h_of[j] == h_of[i] and j < i
            ] + [j for j in nbrs.get(i, ()) if j % m == 0 and j < i]
            if corpus_refs:
                want[i] = ("dup_corpus", min(corpus_refs))
            elif batch_refs:
                want[i] = ("dup_batch", min(batch_refs))
            else:
                want[i] = ("kept", i)
        assert got == want, f"trial {trial}: {got} != {want}"


def test_quality_elect_randomized_vs_naive(spark):
    """Randomized election shapes the fixture lacks: all-tied clusters,
    singletons, duplicate scores across clusters, keeper-by-tiebreak.
    The Spark election (max score, min id among maxima) must equal a
    direct Python argmax for every cluster."""
    import random

    rng = random.Random(20260815)
    for trial in range(4):
        rows = []
        next_id = 1
        for c in range(rng.randint(1, 12)):
            size = rng.choice([1, 1, 2, 3, 9])
            for _ in range(size):
                rows.append((next_id, c, rng.choice([0, 5, 5, 7])))
                next_id += rng.randint(1, 3)
        cs = spark.createDataFrame(rows, "doc_id long, cluster long, lex_mu long")
        got = {
            r.doc_id: (r.cluster, r.lex_mu, r.keeper, r.is_kept)
            for r in D.quality_elect(cs).collect()
        }
        by_cluster: dict[int, list] = {}
        for i, c, s in rows:
            by_cluster.setdefault(c, []).append((i, s))
        want = {}
        for c, members in by_cluster.items():
            mx = max(s for _, s in members)
            keeper = min(i for i, s in members if s == mx)
            for i, s in members:
                want[i] = (c, s, keeper, i == keeper)
        assert got == want, f"trial {trial}"
