"""Count-min sketch properties beyond the oracle parity check: the
one-sided error bound and cell-wise mergeability (the reason to use a
sketch instead of exact counts at 100 TB — per-shard sketches add up).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

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


# --- incremental CMS registry (the maintained sketch artifact) ----------------


def _cells(df):
    return {(r["d"], r["bucket"]): r["cell"] for r in df.collect()}


def test_cms_incremental_matches_oracle_locally(spark, sf_oracle):
    """Pre-proof of the round-12 registration: sk_cms_incremental's
    merged-partials plan vs the MONOLITHIC query's oracle under the
    driver's own comparison — the driver check will prove
    merge-exactness by hashing both paths against one SQL."""
    import pytest

    pytest.importorskip("duckdb")
    from tests.oracle_util import compare_query

    compare_query(
        spark, S.sk_cms_incremental, S._cms_incremental_oracle(), sf_oracle
    )


def test_cms_registry_serves_merged_sketch_exactly_once(spark, sf_oracle, tmp_path):
    """The persisted registry end-to-end: build on half 0, append half 1
    as bid 1, and require (1) the served merged sketch equals the
    monolithic whole-corpus sketch cell-for-cell (and the
    sk_cms_incremental rows), (2) a replay of a committed bid leaves
    serving bit-identical, (3) compaction preserves the served sketch
    exactly while absorbing the live bids, and (4) — the guarantee the
    index families can only heal or fence — a replay of an ALREADY
    ABSORBED bid re-creates its parts dir yet serving stays
    bit-identical at once (manifest exclusion), and the next compact
    deletes the residue without re-absorbing it."""
    import os

    docs = load_table(spark, sf_oracle, "documents")
    reg = str(tmp_path / "cms")
    half0 = docs.filter(F.col("doc_id") % 2 == 0)
    half1 = docs.filter(F.col("doc_id") % 2 == 1)

    half0_dir = tmp_path / "half0"
    half0.write.mode("overwrite").parquet(str(half0_dir / "documents.parquet"))
    S.cms_registry_build(spark, str(half0_dir), reg)
    S.cms_append(spark, reg, half1, batch_id=1)

    whole = _cells(S.cms_sketch(_tf(docs)))
    served = _cells(S.cms_registry_sketch(spark, reg))
    assert served == whole  # (1)

    S.cms_append(spark, reg, half1, batch_id=1)  # replay committed bid
    assert _cells(S.cms_registry_sketch(spark, reg)) == whole  # (2)

    assert S.cms_compact(spark, reg) is True
    assert _cells(S.cms_registry_sketch(spark, reg)) == whole  # (3)
    assert not os.path.isdir(os.path.join(reg, "parts", "bid=-1"))  # base partial
    assert not os.path.isdir(os.path.join(reg, "parts", "bid=1"))
    assert S.cms_compact(spark, reg) is False  # nothing to fold

    # (4) replay AFTER absorb: the unhealable case for summed cells
    S.cms_append(spark, reg, half1, batch_id=1)
    assert os.path.isdir(os.path.join(reg, "parts", "bid=1"))  # residue lands
    assert _cells(S.cms_registry_sketch(spark, reg)) == whole  # excluded at once
    assert S.cms_compact(spark, reg) is True  # sweeps the residue
    assert not os.path.isdir(os.path.join(reg, "parts", "bid=1"))
    assert _cells(S.cms_registry_sketch(spark, reg)) == whole

    # registry keeps accepting appends after compaction
    S.cms_append(spark, reg, half1.limit(3), batch_id=2)
    merged2 = _cells(S.cms_registry_sketch(spark, reg))
    assert sum(merged2.values()) > sum(whole.values())


def test_cms_incremental_machinery_equals_query(spark, sf_oracle, tmp_path):
    """The registry path serves exactly the sk_cms_incremental merged
    sketch, so the (round-12) driver evidence covers the persisted
    machinery too: plugging the served cells into the est join
    reproduces the query rows bit-for-bit."""
    docs = load_table(spark, sf_oracle, "documents")
    reg = str(tmp_path / "cms")
    half0_dir = tmp_path / "half0"
    docs.filter(F.col("doc_id") % 2 == 0).write.mode("overwrite").parquet(
        str(half0_dir / "documents.parquet")
    )
    S.cms_registry_build(spark, str(half0_dir), reg)
    S.cms_append(spark, reg, docs.filter(F.col("doc_id") % 2 == 1), batch_id=1)

    served = S.cms_registry_sketch(spark, reg)
    got = {tuple(r) for r in S.cms_report(_tf(docs), served).collect()}
    want = {tuple(r) for r in S.sk_cms_incremental(spark, sf_oracle).collect()}
    assert got == want and got


def test_cms_compact_crash_at_commit_point(spark, sf_oracle, tmp_path, monkeypatch):
    """The snapshot-pointer swap: kill the compact at the manifest
    rename (the single commit point) and require the OLD snapshot still
    served bit-identically with the half-built consolidated dir being
    unreferenced garbage; the next compact completes the fold and
    sweeps the leftovers. Also: an empty batch short-circuits to an
    empty partial and writes nothing."""
    import os

    import pytest

    docs = load_table(spark, sf_oracle, "documents")
    reg = str(tmp_path / "cms")
    half0_dir = tmp_path / "half0"
    docs.filter(F.col("doc_id") % 2 == 0).write.mode("overwrite").parquet(
        str(half0_dir / "documents.parquet")
    )
    S.cms_registry_build(spark, str(half0_dir), reg)
    S.cms_append(spark, reg, docs.filter(F.col("doc_id") % 2 == 1), batch_id=1)
    whole = _cells(S.cms_registry_sketch(spark, reg))

    class Boom(Exception):
        pass

    real_rename = os.rename

    def boom(src, dst):
        if os.path.basename(dst) == S._CMS_MANIFEST and str(src).startswith(reg):
            raise Boom(src)
        return real_rename(src, dst)

    monkeypatch.setattr(os, "rename", boom)
    with pytest.raises(Boom):
        S.cms_compact(spark, reg)
    monkeypatch.undo()

    # old snapshot intact; the new consolidated dir is garbage
    assert _cells(S.cms_registry_sketch(spark, reg)) == whole
    assert S._cms_manifest(reg)["tag"] is None  # commit never happened
    leftovers = [d for d in os.listdir(reg) if d.startswith("consolidated.")]
    assert leftovers  # the orphaned fold output

    assert S.cms_compact(spark, reg) is True  # completes and sweeps
    assert _cells(S.cms_registry_sketch(spark, reg)) == whole
    m = S._cms_manifest(reg)
    assert m["hwm"] == 1 and m["base"] is True  # -1 and 1 both absorbed
    assert [
        d for d in os.listdir(reg) if d.startswith("consolidated.")
    ] == [f"consolidated.{m['tag']}"]

    # empty batch: no bid dir, no serving change
    empty = spark.createDataFrame([], docs.schema)
    out = S.cms_append(spark, reg, empty, batch_id=9)
    assert out.count() == 0
    assert not os.path.isdir(os.path.join(reg, "parts", "bid=9"))
    assert _cells(S.cms_registry_sketch(spark, reg)) == whole


def test_cms_build_idempotent_after_compact(spark, sf_oracle, tmp_path):
    """r11 review: compaction absorbs and sweeps the build's bid=-1
    partial, so a pipeline restart's cms_registry_build must recognize
    the manifest's base flag instead of re-sketching the whole corpus
    (and landing residue). Serving must be unchanged and no bid=-1 dir
    re-created."""
    import os

    docs = load_table(spark, sf_oracle, "documents")
    reg = str(tmp_path / "cms")
    half0_dir = tmp_path / "half0"
    docs.filter(F.col("doc_id") % 2 == 0).write.mode("overwrite").parquet(
        str(half0_dir / "documents.parquet")
    )
    S.cms_registry_build(spark, str(half0_dir), reg)
    assert S.cms_compact(spark, reg) is True
    assert not os.path.isdir(os.path.join(reg, "parts", "bid=-1"))
    before = _cells(S.cms_registry_sketch(spark, reg))

    S.cms_registry_build(spark, str(half0_dir), reg)  # the restart
    assert not os.path.isdir(os.path.join(reg, "parts", "bid=-1"))
    assert _cells(S.cms_registry_sketch(spark, reg)) == before


def test_cms_compact_pins_fold_to_listed_bids(spark, sf_oracle, tmp_path, monkeypatch):
    """r11 review: a NEW bid landed by a concurrent append AFTER
    compact lists the live bids but BEFORE the fold's Spark action must
    be neither folded nor watermarked — it stays live and serving stays
    exact. The unpinned version read parts/ lazily at action time,
    folding the newcomer into consolidated while leaving it outside
    the absorbed state: every one of its cells double-counted forever.
    The race is injected deterministically through _next_tag, which
    cms_compact calls between the listing and the write."""
    from ftp_blueprints_spark.operators import similarity as SIM

    docs = load_table(spark, sf_oracle, "documents")
    reg = str(tmp_path / "cms")
    half0_dir = tmp_path / "half0"
    half0 = docs.filter(F.col("doc_id") % 2 == 0)
    half1 = docs.filter(F.col("doc_id") % 2 == 1)
    half0.write.mode("overwrite").parquet(str(half0_dir / "documents.parquet"))
    S.cms_registry_build(spark, str(half0_dir), reg)

    real_next_tag = SIM._next_tag

    def racy_tag(d):
        # the concurrent append: a fresh bid lands mid-compact
        S.cms_append(spark, reg, half1, batch_id=5)
        return real_next_tag(d)

    monkeypatch.setattr(SIM, "_next_tag", racy_tag)
    assert S.cms_compact(spark, reg) is True
    monkeypatch.undo()

    m = S._cms_manifest(reg)
    assert m["hwm"] == -1  # only the listed build bid was absorbed
    import os

    assert os.path.isdir(os.path.join(reg, "parts", "bid=5"))  # stays live
    whole = _cells(S.cms_sketch(_tf(docs)))
    assert _cells(S.cms_registry_sketch(spark, reg)) == whole  # exactly once

    # the next compact absorbs the straggler normally
    assert S.cms_compact(spark, reg) is True
    assert S._cms_manifest(reg)["hwm"] == 5
    assert _cells(S.cms_registry_sketch(spark, reg)) == whole


@pytest.mark.slow  # >10 s measured (r16 durations profile)
def test_cms_registry_random_schedule_property(spark, sf_oracle, tmp_path_factory):
    """Randomized-schedule property for the maintained sketch registry
    (the test_index_schedule pattern applied to the exactly-once
    artifact): starting from a built registry, for ANY schedule of
    {append chunk c (re-drawing = an at-least-once REPLAY),
    re-build (restart idempotency), compact, crash-compact killed at
    the manifest commit point or during the post-commit sweep}, the
    served merged sketch equals the exact python-side merge of the base
    partial plus each appended chunk counted EXACTLY ONCE — at every
    step, with no degraded window at all: the index families tolerate
    bounded dup residue between fold and heal, the registry's manifest
    exclusion must never show even one double-counted cell. Also: the
    manifest always names an existing consolidated dir, and a final
    compact leaves no foreign consolidated dirs behind.

    r12 adds the RACED-compact op (the CAS fence under random schedule
    positions): a real second compact runs to completion inside the
    loser's fold window (injected through _next_tag), and the loser
    must end LOUDLY — CompactionFenceError at the compare-and-swap, or
    a missing-file error where the winner's sweep already removed the
    loser's lazily-bound fold inputs — never a silent publish; serving
    must remain exact immediately after, from the winner's snapshot.

    r14: the harness itself was falsified — its first generator used
    the chunk INDEX as the bid, so the draw append(c=1), compact,
    append(c=0) introduced a brand-new bid BELOW the published hwm,
    which the watermark excludes BY DESIGN (sketches.py's documented
    contract: absorption state is a range, monotonicity is what makes
    it sound; replays of absorbed bids are indistinguishable from this
    at append time, so the engine cannot refuse it loudly — the stream
    twin's monotonic batch ids + fresh-checkpoint refusal are the
    enforcement point). The harness now assigns each chunk a MONOTONIC
    bid at first append, exactly as a checkpointed stream would, and
    replays reuse their original bid — the second time this suite's
    own harness was corrected against the engine's contract (the
    exact-dedup pending-bid episode is the first, r12 notes)."""
    import os
    import shutil

    import pytest

    hypothesis = pytest.importorskip("hypothesis")
    from hypothesis import HealthCheck, given, settings, strategies as st

    from ftp_blueprints_spark.operators import similarity as SIM
    from ftp_blueprints_spark.session import load_table

    N_CHUNKS = 3
    docs = load_table(spark, sf_oracle, "documents")
    base_docs = docs.filter(F.col("doc_id") % 4 == 0)
    base_dir = tmp_path_factory.mktemp("cms_sched_base")
    base_docs.write.mode("overwrite").parquet(
        str(base_dir / "documents.parquet")
    )
    template = str(base_dir / "reg")
    S.cms_registry_build(spark, str(base_dir), template)

    chunk_dfs, chunk_cells = {}, {}
    for c in range(N_CHUNKS):
        df = docs.filter(F.col("doc_id") % 4 == c + 1)
        chunk_dfs[c] = df
        chunk_cells[c] = _cells(S.cms_partial(df))
    base_cells = _cells(S.cms_registry_sketch(spark, template))

    real_rename, real_rmtree = os.rename, shutil.rmtree

    class Boom(Exception):
        pass

    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
    )
    @given(st.data())
    def run(data):
        reg = os.path.join(str(tmp_path_factory.mktemp("cms_sched")), "reg")
        shutil.copytree(template, reg)
        appended: set[int] = set()
        # chunk -> bid, assigned monotonically at FIRST append (the
        # stream contract); replays reuse their bid
        bid_of: dict[int, int] = {}

        def expected():
            out = dict(base_cells)
            for c in appended:
                for k, v in chunk_cells[c].items():
                    out[k] = out.get(k, 0) + v
            return out

        def check():
            assert _cells(S.cms_registry_sketch(spark, reg)) == expected()
            m = S._cms_manifest(reg)
            if m["tag"] is not None:  # pointer never dangles
                assert os.path.isdir(os.path.join(reg, f"consolidated.{m['tag']}"))

        for _ in range(data.draw(st.integers(min_value=2, max_value=6))):
            op = data.draw(
                st.sampled_from(
                    ["append", "append", "compact", "crash", "rebuild", "race"]
                )
            )
            if op == "append":
                c = data.draw(st.integers(0, N_CHUNKS - 1))
                if c not in bid_of:
                    bid_of[c] = max(bid_of.values(), default=-1) + 1
                S.cms_append(spark, reg, chunk_dfs[c], batch_id=bid_of[c])
                appended.add(c)  # replays land idempotently or excluded
            elif op == "rebuild":
                S.cms_registry_build(spark, str(base_dir), reg)
            elif op == "compact":
                S.cms_compact(spark, reg)
            elif op == "race":
                # a real second compact wins inside the loser's fold
                # window; the loser must end loudly, serving stays
                # exact from the winner's snapshot
                state = {"raced": False}

                def racy_tag(d, _state=state):
                    SIM._next_tag = real_next_tag
                    _state["raced"] = True
                    S.cms_compact(spark, reg)  # the winner
                    return real_next_tag(d)

                real_next_tag = SIM._next_tag
                SIM._next_tag = racy_tag
                loser_published = False
                try:
                    S.cms_compact(spark, reg)  # the loser
                    loser_published = True
                except SIM.CompactionFenceError:
                    assert state["raced"]
                except Exception as e:  # winner swept the fold inputs
                    assert state["raced"]
                    msg = str(e)
                    assert (
                        "FileNotFound" in msg
                        or "does not exist" in msg
                        or "PATH_NOT_FOUND" in msg
                    ), f"raced compact failed but not loudly: {msg[:200]}"
                finally:
                    SIM._next_tag = real_next_tag
                # completing is only legal when there was nothing to
                # fold (sweep-only compacts never reach _next_tag, so
                # the hook never fired); a loser that published AFTER
                # the winner ran is the silent-clobber bug the fence
                # exists to prevent
                assert not (loser_published and state["raced"]), (
                    "loser compact published silently despite the race"
                )
            else:  # crash-compact at the commit point or mid-sweep
                point = data.draw(st.sampled_from(["commit", "sweep"]))
                if point == "commit":

                    def boom_rename(src, dst):
                        if os.path.basename(dst) == S._CMS_MANIFEST and str(
                            src
                        ).startswith(reg):
                            raise Boom(src)
                        return real_rename(src, dst)

                    os.rename = boom_rename
                else:
                    state = {"n": 0}

                    def boom_rmtree(path, *a, **kw):
                        if str(path).startswith(reg):
                            state["n"] += 1
                            if state["n"] == 1:
                                raise Boom(path)
                        return real_rmtree(path, *a, **kw)

                    shutil.rmtree = boom_rmtree
                try:
                    S.cms_compact(spark, reg)
                except Boom:
                    pass
                finally:
                    os.rename, shutil.rmtree = real_rename, real_rmtree
            check()

        # final compact converges: exact serving, no foreign dirs
        S.cms_compact(spark, reg)
        check()
        m = S._cms_manifest(reg)
        cons = [d for d in os.listdir(reg) if d.startswith("consolidated.")]
        assert cons == ([f"consolidated.{m['tag']}"] if m["tag"] else [])

    run()


def test_cms_append_all_null_texts_is_a_noop(spark, sf_oracle, tmp_path):
    """r12 ADVICE: the failure mode of an "empty" batch is an empty
    PARTIAL, not an empty input — a non-empty batch whose texts all
    tokenize to nothing (every text NULL: lower_tokens(NULL) explodes
    to zero rows) writes no bid dir under dynamic overwrite, and an
    unguarded read-back would fail the stream with PATH_NOT_FOUND on a
    semantically no-op batch. The guard must watch the thing WRITTEN."""
    import os

    docs = load_table(spark, sf_oracle, "documents")
    reg = str(tmp_path / "cms")
    half0_dir = tmp_path / "half0"
    docs.filter(F.col("doc_id") % 2 == 0).write.mode("overwrite").parquet(
        str(half0_dir / "documents.parquet")
    )
    S.cms_registry_build(spark, str(half0_dir), reg)
    before = _cells(S.cms_registry_sketch(spark, reg))

    nulls = docs.limit(3).withColumn("text", F.lit(None).cast("string"))
    assert nulls.count() == 3  # non-empty INPUT...
    out = S.cms_append(spark, reg, nulls, batch_id=7)
    assert out.count() == 0  # ...empty PARTIAL, returned not raised
    assert not os.path.isdir(os.path.join(reg, "parts", "bid=7"))
    assert _cells(S.cms_registry_sketch(spark, reg)) == before


def test_cms_stream_fresh_checkpoint_refused(spark, sf_oracle, tmp_path):
    """r12 ADVICE (medium) + review: a stream started with a FRESH
    checkpoint must be refused loudly, before any batch lands, when
    the registry already carries stream batches in EITHER state —
    absorbed (hwm >= 0: the new stream's ids restart at 0, below the
    watermark, so every partial it lands is silently excluded and
    swept) or still live (parts/bid>=0: the new stream's dynamic
    overwrites silently replace the old stream's partials). A
    base-only compacted registry (hwm == -1) must NOT be refused —
    bids start at 0, strictly above everything present — or the
    documented build -> compact -> stream lifecycle is unreachable."""
    import os

    from ftp_blueprints_spark.operators.similarity import CompactionFenceError

    docs = load_table(spark, sf_oracle, "documents")
    half0_dir = tmp_path / "half0"
    docs.filter(F.col("doc_id") % 2 == 0).write.mode("overwrite").parquet(
        str(half0_dir / "documents.parquet")
    )

    # ABSORBED case: build + appended batch + compact -> hwm = 1
    reg_a = str(tmp_path / "cms_absorbed")
    S.cms_registry_build(spark, str(half0_dir), reg_a)
    S.cms_append(
        spark, reg_a, docs.filter(F.col("doc_id") % 2 == 1), batch_id=1
    )
    assert S.cms_compact(spark, reg_a) is True
    assert S._cms_manifest(reg_a)["hwm"] == 1
    fresh_ckpt = str(tmp_path / "fresh_ckpt_a")  # never created
    before = _cells(S.cms_registry_sketch(spark, reg_a))
    with pytest.raises(CompactionFenceError, match="fresh checkpoint"):
        S.run_incremental_cms_stream(
            spark, reg_a, docs, timeout_s=5, checkpoint_dir=fresh_ckpt
        )
    # refused BEFORE any batch landed and before the checkpoint existed
    assert not os.path.isdir(fresh_ckpt)
    parts = os.path.join(reg_a, "parts")
    assert not os.path.isdir(parts) or not any(
        d.startswith("bid=") for d in os.listdir(parts)
    )
    assert _cells(S.cms_registry_sketch(spark, reg_a)) == before
    # an existing-but-EMPTY checkpoint dir is equally fresh (r12
    # review: ids still assign from 0) — still refused
    os.makedirs(fresh_ckpt)
    with pytest.raises(CompactionFenceError, match="fresh checkpoint"):
        S.run_incremental_cms_stream(
            spark, reg_a, docs, timeout_s=5, checkpoint_dir=fresh_ckpt
        )

    # LIVE case: an uncompacted registry with a standing stream batch
    # (hwm still None) — a fresh stream would overwrite bid=0
    reg_l = str(tmp_path / "cms_live")
    S.cms_registry_build(spark, str(half0_dir), reg_l)
    S.cms_append(
        spark, reg_l, docs.filter(F.col("doc_id") % 2 == 1), batch_id=0
    )
    with pytest.raises(CompactionFenceError, match="fresh checkpoint"):
        S.run_incremental_cms_stream(
            spark,
            reg_l,
            docs,
            timeout_s=5,
            checkpoint_dir=str(tmp_path / "fresh_ckpt_l"),
        )

    # BASE-ONLY case: build + compact (hwm = -1) must start cleanly —
    # drive a real one-file stream through and require its batch served
    reg_b = str(tmp_path / "cms_base")
    S.cms_registry_build(spark, str(half0_dir), reg_b)
    assert S.cms_compact(spark, reg_b) is True
    assert S._cms_manifest(reg_b)["hwm"] == -1
    base_cells = _cells(S.cms_registry_sketch(spark, reg_b))
    src_dir = tmp_path / "stream_src"
    docs.filter(F.col("doc_id") % 2 == 1).select("doc_id", "text").coalesce(
        1
    ).write.mode("overwrite").parquet(str(src_dir))
    source = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src_dir))
    )
    S.run_incremental_cms_stream(
        spark,
        reg_b,
        source,
        timeout_s=120,
        checkpoint_dir=str(tmp_path / "fresh_ckpt_b"),
    )
    assert os.path.isdir(os.path.join(reg_b, "parts", "bid=0"))
    whole = _cells(S.cms_sketch(_tf(docs)))
    assert _cells(S.cms_registry_sketch(spark, reg_b)) == whole
    assert base_cells != whole  # the streamed half actually contributed


def test_cms_compact_cas_fence_refuses_concurrent_publish(
    spark, sf_oracle, tmp_path, monkeypatch
):
    """r12 fence (r11 VERDICT task 4): a second writer publishing the
    manifest between this compact's fold-input listing and its own
    publish must make THIS compact fail loudly at the compare-and-swap,
    leaving the winner's snapshot untouched and this compact's
    consolidated dir as sweepable garbage — never last-publish-wins
    silently orphaning the winner's work. The race is injected through
    the deterministic _next_tag hook (called between the listing and
    the fold write)."""
    import os

    from ftp_blueprints_spark.operators import similarity as SIM

    docs = load_table(spark, sf_oracle, "documents")
    reg = str(tmp_path / "cms")
    half0_dir = tmp_path / "half0"
    docs.filter(F.col("doc_id") % 2 == 0).write.mode("overwrite").parquet(
        str(half0_dir / "documents.parquet")
    )
    S.cms_registry_build(spark, str(half0_dir), reg)
    served_before = _cells(S.cms_registry_sketch(spark, reg))

    real_next_tag = SIM._next_tag

    def racer_wins(d):
        # the concurrent writer: folds the same live set and publishes
        # first (a real consolidated dir + a real manifest swap)
        racer_tag = real_next_tag(reg)
        S.cms_registry_sketch(spark, reg).write.mode("overwrite").parquet(
            os.path.join(reg, f"consolidated.{racer_tag}")
        )
        S._cms_publish_manifest(
            reg, {"tag": racer_tag, "hwm": -1, "base": True}
        )
        return real_next_tag(d)

    monkeypatch.setattr(SIM, "_next_tag", racer_wins)
    with pytest.raises(SIM.CompactionFenceError, match="changed"):
        S.cms_compact(spark, reg)
    monkeypatch.undo()

    # the winner's snapshot is intact and serving is unchanged
    m = S._cms_manifest(reg)
    assert m["hwm"] == -1 and m["base"] is True
    assert os.path.isdir(os.path.join(reg, f"consolidated.{m['tag']}"))
    assert _cells(S.cms_registry_sketch(spark, reg)) == served_before
    # the loser's fold output is unreferenced garbage...
    orphans = [
        d
        for d in os.listdir(reg)
        if d.startswith("consolidated.") and d != f"consolidated.{m['tag']}"
    ]
    assert orphans
    # ...and the next clean compact sweeps it without changing serving
    assert S.cms_compact(spark, reg) is True
    assert _cells(S.cms_registry_sketch(spark, reg)) == served_before
    assert [
        d for d in os.listdir(reg) if d.startswith("consolidated.")
    ] == [f"consolidated.{S._cms_manifest(reg)['tag']}"]


def test_cms_compact_sweep_withdraws_when_publish_superseded(
    spark, sf_oracle, tmp_path, monkeypatch
):
    """The post-write half of the r12 fence: when a second writer's
    publish lands immediately AFTER this compact's rename (the window
    the compare-and-swap cannot see), the destructive sweep must
    withdraw loudly — otherwise it would garbage-collect the winning
    writer's just-published consolidated dir as "non-current"."""
    import json
    import os

    from ftp_blueprints_spark.operators import similarity as SIM

    docs = load_table(spark, sf_oracle, "documents")
    reg = str(tmp_path / "cms")
    half0_dir = tmp_path / "half0"
    docs.filter(F.col("doc_id") % 2 == 0).write.mode("overwrite").parquet(
        str(half0_dir / "documents.parquet")
    )
    S.cms_registry_build(spark, str(half0_dir), reg)
    served_before = _cells(S.cms_registry_sketch(spark, reg))

    real_rename = os.rename
    state = {"fired": False, "racer_tag": None}

    def rename_then_racer(src, dst):
        real_rename(src, dst)
        if (
            os.path.basename(dst) == S._CMS_MANIFEST
            and str(src).startswith(reg)
            and not state["fired"]
        ):
            # the racer wins the publish race right after ours lands
            state["fired"] = True
            racer_tag = SIM._next_tag(reg)
            S.cms_registry_sketch(spark, reg).write.mode(
                "overwrite"
            ).parquet(os.path.join(reg, f"consolidated.{racer_tag}"))
            with open(os.path.join(reg, S._CMS_MANIFEST), "w") as fh:
                json.dump({"tag": racer_tag, "hwm": -1, "base": True}, fh)
            state["racer_tag"] = racer_tag

    monkeypatch.setattr(os, "rename", rename_then_racer)
    with pytest.raises(SIM.CompactionFenceError, match="before the sweep"):
        S.cms_compact(spark, reg)
    monkeypatch.undo()

    # the racer's snapshot survives the withdrawal intact
    m = S._cms_manifest(reg)
    assert m["tag"] == state["racer_tag"]
    assert os.path.isdir(os.path.join(reg, f"consolidated.{m['tag']}"))
    assert _cells(S.cms_registry_sketch(spark, reg)) == served_before
    # recovery: the next clean compact sweeps every orphan
    S.cms_compact(spark, reg)
    assert _cells(S.cms_registry_sketch(spark, reg)) == served_before
    assert [
        d for d in os.listdir(reg) if d.startswith("consolidated.")
    ] == [f"consolidated.{S._cms_manifest(reg)['tag']}"]


def test_cms_build_refused_below_watermark(spark, sf_oracle, tmp_path):
    """r12 fence: a registry that has absorbed appended batches but
    never a base partial must refuse cms_registry_build — bid -1 would
    land at or below the hwm, be excluded from serving, and be swept:
    the corpus partial silently lost."""
    from ftp_blueprints_spark.operators.similarity import CompactionFenceError

    docs = load_table(spark, sf_oracle, "documents")
    reg = str(tmp_path / "cms")
    import os

    os.makedirs(reg)
    S.cms_append(
        spark, reg, docs.filter(F.col("doc_id") % 2 == 1), batch_id=0
    )
    assert S.cms_compact(spark, reg) is True  # hwm=0, base stays False
    m = S._cms_manifest(reg)
    assert m["hwm"] == 0 and m["base"] is False

    half0_dir = tmp_path / "half0"
    docs.filter(F.col("doc_id") % 2 == 0).write.mode("overwrite").parquet(
        str(half0_dir / "documents.parquet")
    )
    with pytest.raises(CompactionFenceError, match="no base partial"):
        S.cms_registry_build(spark, str(half0_dir), reg)


def test_cms_stale_reader_frame_fails_loudly_after_compact(
    spark, sf_oracle, tmp_path
):
    """Pins cms_registry_sketch's reader contract (r11 VERDICT task 5):
    a frame acquired BEFORE a compact is bound to the swept snapshot's
    files, so its first action after the commit must fail LOUDLY with a
    missing-path error — never silently serve stale or partial cells.
    A frame re-acquired after the compact serves the identical sketch."""
    docs = load_table(spark, sf_oracle, "documents")
    reg = str(tmp_path / "cms")
    half0_dir = tmp_path / "half0"
    docs.filter(F.col("doc_id") % 2 == 0).write.mode("overwrite").parquet(
        str(half0_dir / "documents.parquet")
    )
    S.cms_registry_build(spark, str(half0_dir), reg)
    S.cms_append(
        spark, reg, docs.filter(F.col("doc_id") % 2 == 1), batch_id=1
    )
    before = _cells(S.cms_registry_sketch(spark, reg))

    stale = S.cms_registry_sketch(spark, reg)  # plan bound pre-compact
    assert S.cms_compact(spark, reg) is True  # sweeps the bid dirs

    with pytest.raises(Exception) as ei:
        stale.collect()
    msg = str(ei.value)
    assert (
        "FileNotFound" in msg
        or "does not exist" in msg
        or "PATH_NOT_FOUND" in msg
    ), f"stale read failed but not loudly-missing: {msg[:300]}"
    assert not isinstance(ei.value, AssertionError)
    # a fresh frame serves the identical post-compact sketch
    assert _cells(S.cms_registry_sketch(spark, reg)) == before
