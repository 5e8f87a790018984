"""Batch/streaming equivalence tests: the Structured Streaming runners
must produce the same results as the batch window queries the driver
hash-checks (the incremental-execution contract).
"""

from __future__ import annotations

import pytest

import pyspark.sql.functions as F

from ftp_blueprints_spark.streaming import events as E


def _rows(df) -> set:
    return {tuple(r) for r in df.collect()}


def test_streaming_tumbling_equals_batch(spark, sf_oracle):
    batch = _rows(E.ev_tumbling_counts(spark, sf_oracle))
    E.run_to_memory(
        E.stream_tumbling_counts(spark, sf_oracle), "t_tumbling", "complete"
    )
    streamed = _rows(spark.table("t_tumbling"))
    assert streamed == batch


def test_streaming_session_equals_batch(spark, sf_oracle):
    batch = _rows(E.ev_session_windows(spark, sf_oracle))
    E.run_to_memory(
        E.stream_session_windows(spark, sf_oracle), "t_session", "complete"
    )
    streamed = _rows(spark.table("t_session"))
    assert streamed == batch


def test_streaming_dedup_one_row_per_key(spark, sf_oracle):
    """dropDuplicatesWithinWatermark keeps exactly one row per
    (user_id, event_type) when all data fits one watermark horizon...
    it may keep MORE when duplicates span horizons; assert the lower
    bound == distinct keys and that every kept row is a real event."""
    E.run_to_memory(E.stream_dedup(spark, sf_oracle), "t_dedup", "append")
    kept = spark.table("t_dedup")
    n_keys = (
        E.ev_dedup_first(spark, sf_oracle).count()
    )
    kept_keys = kept.select("user_id", "event_type").distinct().count()
    assert kept_keys == n_keys
    assert kept.count() >= n_keys
    # every kept row exists in the source
    from ftp_blueprints_spark.session import load_table

    src = load_table(spark, sf_oracle, "events").select("event_id").distinct()
    assert kept.join(src, "event_id", "left_anti").count() == 0


def test_stream_stream_join_equals_batch(spark, sf_oracle):
    """Watermarked stream-stream interval join drains to exactly the
    batch interval-join result (append mode: joined rows emit once
    both watermarks pass the match window)."""
    batch = _rows(E.ev_view_click_join(spark, sf_oracle))
    E.run_to_memory(
        E.stream_view_click_join(spark, sf_oracle), "t_ss_join", "append"
    )
    streamed = _rows(spark.table("t_ss_join"))
    assert streamed == batch
    assert len(batch) > 0


def _ttl_reference(spark, sf_oracle, ttl_us) -> set:
    """Driver-side simulation of TTL-renewal dedup (ground truth)."""
    from ftp_blueprints_spark.session import load_table

    ev = (
        load_table(spark, sf_oracle, "events")
        .select("user_id", "event_type", "event_id", F.unix_micros("ts").alias("ts_us"))
        .collect()
    )
    by_key: dict = {}
    for r in ev:
        by_key.setdefault((r["user_id"], r["event_type"]), []).append(
            (r["ts_us"], r["event_id"])
        )
    want = set()
    for (uid, etype), rows in by_key.items():
        last = None
        for t, eid in sorted(rows):
            if last is None or t - last > ttl_us:
                want.add((uid, etype, eid, t))
                last = t
    return want


def test_ttl_dedup_batch_matches_reference(spark, sf_oracle):
    want = _ttl_reference(spark, sf_oracle, E.TTL_DEDUP_TTL_US)
    got = _rows(E.ev_ttl_dedup(spark, sf_oracle))
    assert got == want


def test_ttl_dedup_renews_window():
    """Semantics: acceptance renews suppression — t=0 kept, t=10 dropped
    (within TTL of kept t=0), t=20 kept (20-0 > 15) even though only 10
    after the DROPPED t=10. lag()-based dedup gets this wrong."""
    kept, last = E._ttl_scan([0, 10, 20], [1, 2, 3], None, 15)
    assert kept == [(1, 0), (3, 20)] and last == 20


def test_ttl_group_scan_is_chunk_order_invariant():
    """applyInPandasWithState delivers a group in arbitrary Arrow-sized
    chunks with no ordering guarantee. The group scan must therefore be
    invariant to how the rows are split and ordered across chunks: an
    event at t=10 arriving in a LATER chunk than a kept t=40 event must
    still be kept (it precedes t=40 in event time), which a
    chunk-at-a-time scan wrongly suppresses. Ties on ts_us must break
    by event_id, matching ttl_dedup_batch."""
    import pandas as pd

    def chunk(rows):
        return pd.DataFrame(rows, columns=["ts_us", "event_id"])

    # Global time order: (0,id1) keep, (10,id2) keep (>ttl after 0),
    # (10,id3) drop (tie loses to id2), (40,id4) keep.
    rows = [(0, 1), (10, 2), (10, 3), (40, 4)]
    want = ([(1, 0), (2, 10), (4, 40)], 40)
    one_chunk = E._ttl_group_scan(iter([chunk(rows)]), None, 5)
    assert one_chunk == want
    # Same rows, adversarial split: the t=10 pair lands in a chunk
    # AFTER t=40, and within the first chunk rows are ts-descending.
    split = [chunk([(40, 4), (0, 1)]), chunk([(10, 3), (10, 2)])]
    assert E._ttl_group_scan(iter(split), None, 5) == want
    # Carried state from a previous micro-batch still suppresses: with
    # last_kept=30, only t=40 clears the TTL (40-30 > 5).
    assert E._ttl_group_scan(iter(split), 30, 5) == ([(4, 40)], 40)


def test_ttl_dedup_stream_matches_batch(spark, sf_oracle):
    """applyInPandasWithState path == grouped-map batch path."""
    batch = _rows(E.ev_ttl_dedup(spark, sf_oracle))
    E.run_to_memory(E.stream_ttl_dedup(spark, sf_oracle), "t_ttl", "append")
    streamed = _rows(spark.table("t_ttl"))
    assert streamed == batch


def test_ttl_dedup_stream_matches_batch_with_tiny_arrow_chunks(spark, sf_oracle):
    """End-to-end proof of the multi-chunk group path: with
    maxRecordsPerBatch forced to 8, the fixture's larger keys (up to 24
    events per (user_id, event_type)) are delivered to
    applyInPandasWithState split across several Arrow chunks — the
    exact condition under which the old per-chunk scan produced a
    wrong kept set. The streamed result must still equal the batch
    operator."""
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key)
    spark.conf.set(key, "8")
    try:
        batch = _rows(E.ev_ttl_dedup(spark, sf_oracle))
        E.run_to_memory(
            E.stream_ttl_dedup(spark, sf_oracle), "t_ttl_chunks", "append"
        )
        streamed = _rows(spark.table("t_ttl_chunks"))
    finally:
        spark.conf.set(key, old)
    assert streamed == batch


_EV_STREAM_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, "
    "event_type string, value double"
)


def _quartile_parts(spark, sf_oracle, n_parts: int = 4):
    """The events table + its chronological ``n_parts``-way split
    (quartile cut on ts, so (ts, event_id) ties never straddle a
    part boundary)."""
    from ftp_blueprints_spark.session import load_table

    ev = load_table(spark, sf_oracle, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    qt = [i / n_parts for i in range(1, n_parts)]
    bounds = ev.selectExpr("unix_micros(ts) AS us").approxQuantile("us", qt, 0.0)
    lo = [None, *bounds]
    hi = [*bounds, None]
    parts = []
    for a, b in zip(lo, hi):
        part = ev
        if a is not None:
            part = part.filter(F.unix_micros("ts") > a)
        if b is not None:
            part = part.filter(F.unix_micros("ts") <= b)
        parts.append(part)
    return ev, parts


def _land_part(src_dir, i, part) -> None:
    """Write one split file with an ascending mtime (FileStreamSource
    orders new files by modification time, so file i = micro-batch i)."""
    import os

    out = str(src_dir / f"part{i}")
    part.coalesce(1).write.mode("overwrite").parquet(out)
    for f in os.listdir(out):
        os.utime(os.path.join(out, f), (1_700_000_000 + i, 1_700_000_000 + i))


def _ev_file_stream(spark, src_dir):
    return (
        spark.readStream.schema(_EV_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(str(src_dir))
    )


def _chrono_source(spark, sf_oracle, tmp_path, n_parts: int = 4):
    """Chronologically split events + a maxFilesPerTrigger=1 stream:
    the fixture lands in ``n_parts`` time-quartile files with ascending
    mtimes, so an availableNow drain runs one micro-batch per file —
    real incremental execution, not a single-batch drain."""
    ev, parts = _quartile_parts(spark, sf_oracle, n_parts)
    src_dir = tmp_path / "ev_parts"
    for i, part in enumerate(parts):
        _land_part(src_dir, i, part)
    return ev, _ev_file_stream(spark, src_dir)


def _assert_multi_batch(q, n: int = 4) -> None:
    n_batches = sum(
        1 for p in q.recentProgress if p.numInputRows and p.numInputRows > 0
    )
    assert n_batches >= n, f"expected >={n} micro-batches, saw {n_batches}"


def test_ttl_dedup_multi_microbatch(spark, sf_oracle, tmp_path):
    """Real incremental execution: split events into four chronological
    files, feed them through maxFilesPerTrigger=1 + availableNow so the
    stream runs MULTIPLE micro-batches (asserted from query progress),
    and require the drained kept set to equal the batch operator — i.e.
    per-key last-kept state provably carries across micro-batch
    boundaries, which the single-file drain tests never exercise."""
    ev, source = _chrono_source(spark, sf_oracle, tmp_path)
    q = E.run_to_memory(
        E.stream_ttl_dedup(spark, sf_oracle, source=source), "t_ttl_mb", "append"
    )
    _assert_multi_batch(q)
    batch = _rows(E.ttl_dedup_batch(ev))
    streamed = _rows(spark.table("t_ttl_mb"))
    assert streamed == batch


def test_session_windows_multi_microbatch(spark, sf_oracle, tmp_path):
    """Session merge under real incremental execution: a session whose
    events span micro-batch boundaries must still merge into ONE window
    (session_window state carries across batches); drained complete-
    mode output equals the batch operator exactly."""
    _, source = _chrono_source(spark, sf_oracle, tmp_path)
    q = E.run_to_memory(
        E.stream_session_windows(spark, sf_oracle, source=source),
        "t_session_mb",
        "complete",
    )
    _assert_multi_batch(q)
    batch = _rows(E.ev_session_windows(spark, sf_oracle))
    streamed = _rows(spark.table("t_session_mb"))
    assert streamed == batch


@pytest.mark.slow  # >10 s measured (r16 durations profile)
def test_view_click_join_multi_microbatch(spark, sf_oracle, tmp_path):
    """Stream-stream interval join under real incremental execution: a
    click arriving micro-batches after its view must still pair (the
    view waits in watermark-bounded join state); the drained append
    output equals the batch interval join row-for-row."""
    _, source = _chrono_source(spark, sf_oracle, tmp_path)
    q = E.run_to_memory(
        E.stream_view_click_join(spark, sf_oracle, source=source),
        "t_ss_join_mb",
        "append",
    )
    _assert_multi_batch(q)
    batch = _rows(E.ev_view_click_join(spark, sf_oracle))
    streamed = _rows(spark.table("t_ss_join_mb"))
    assert streamed == batch
    # the multi-batch discipline is only meaningful if some pairs really
    # do span micro-batches: views from earlier quartiles must appear
    assert len(batch) > 0


def test_watermark_in_plan(spark, sf_oracle):
    """The streaming plans actually carry the watermark (state bound)."""
    plan = E.stream_tumbling_counts(spark, sf_oracle)._jdf.queryExecution().analyzed().toString()
    assert "EventTimeWatermark" in plan


def test_late_data_accounting_consistency(spark, sf_oracle):
    """ev_late_data invariants: per-type late <= total; totals match the
    raw table; batch 0 (no prior watermark) can never contribute late
    rows, so strictly fewer than all events are late."""
    import pyspark.sql.functions as F
    from ftp_blueprints_spark.streaming import events as EV

    rows = EV.ev_late_data(spark, sf_oracle).collect()
    total = sum(r.n_events for r in rows)
    late = sum(r.n_late for r in rows)
    raw = spark.read.parquet(f"{sf_oracle}/events.parquet").count()
    assert total == raw
    assert 0 <= late < total
    for r in rows:
        assert r.n_late <= r.n_events
        if r.n_late == 0:
            assert r.max_lateness_us is None
        else:
            assert r.max_lateness_us > 0


@pytest.mark.slow  # >10 s measured (r16 durations profile)
def test_late_data_matches_live_watermark_drops(spark, sf_oracle, tmp_path):
    """ev_late_data's micro-batch watermark model must be BIT-EXACT
    against the real engine: feed the events table through readStream
    in LATE_BATCH_N-sized files (maxFilesPerTrigger=1, chronological
    mtimes), dedup on the unique event_id under the same 10-minute
    watermark, and require (a) the live query's summed
    numRowsDroppedByWatermark and (b) the emitted row count to equal
    the model's totals."""
    import os
    from ftp_blueprints_spark.session import load_table

    model = E.ev_late_data(spark, sf_oracle).collect()
    model_late = sum(r.n_late for r in model)
    model_total = sum(r.n_events for r in model)

    ev = load_table(spark, sf_oracle, "events").select(
        "event_id", "ts", "event_type"
    )
    src_dir = tmp_path / "late_parts"
    n = model_total
    n_files = (n + E.LATE_BATCH_N - 1) // E.LATE_BATCH_N
    for i in range(n_files):
        part = ev.filter(
            (F.col("event_id") >= i * E.LATE_BATCH_N)
            & (F.col("event_id") < (i + 1) * E.LATE_BATCH_N)
        )
        out = str(src_dir / f"part{i:03d}")
        part.coalesce(1).write.mode("overwrite").parquet(out)
        for f in os.listdir(out):
            os.utime(os.path.join(out, f), (1_700_000_000 + i, 1_700_000_000 + i))
    source = (
        spark.readStream.schema("event_id bigint, ts timestamp, event_type string")
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(str(src_dir))
    )
    deduped = source.withWatermark("ts", "10 minutes").dropDuplicates(["event_id"])
    q = (
        deduped.writeStream.format("memory")
        .queryName("t_late_live")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    dropped = sum(
        int(so["numRowsDroppedByWatermark"])
        for p in q.recentProgress
        for so in p["stateOperators"]
    )
    n_batches = sum(
        1 for p in q.recentProgress if p.numInputRows and p.numInputRows > 0
    )
    assert n_batches >= n_files  # real multi-batch incremental run
    emitted = spark.table("t_late_live").count()
    assert dropped == model_late
    assert emitted == model_total - model_late


def test_foreachbatch_idempotent_sink_exactly_once(spark, sf_oracle, tmp_path):
    """The exactly-once sink pattern: foreachBatch + a batchId-keyed
    idempotent write (overwrite into a per-batch directory). Spark's
    guarantee is at-least-once DELIVERY of each micro-batch; writing
    deterministically under the batch id turns redelivery into a no-op.
    Simulate a redelivery by re-running one batch's write and require
    the drained sink to equal the batch query row-for-row anyway."""
    ev, source = _chrono_source(spark, sf_oracle, tmp_path)
    out_root = tmp_path / "sink"
    out_root.mkdir()
    calls: list[int] = []

    def write_batch(df, batch_id: int) -> None:
        calls.append(batch_id)
        dest = str(out_root / f"batch={batch_id}")
        df.write.mode("overwrite").parquet(dest)
        if batch_id == 1:  # simulated at-least-once redelivery
            df.write.mode("overwrite").parquet(dest)

    q = (
        source.filter("event_type = 'purchase'")
        .writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert len(set(calls)) >= 4, calls  # real multi-batch execution
    got = {
        tuple(r)
        for r in spark.read.parquet(str(out_root)).drop("batch").collect()
    }
    want = {
        tuple(r) for r in ev.filter("event_type = 'purchase'").collect()
    }
    assert got == want


def test_funnel_multi_microbatch(spark, sf_oracle, tmp_path):
    """Funnel stage latching under real incremental execution: the
    view/click/purchase firsts latch across micro-batch boundaries (a
    click qualifying against a view from two batches earlier must still
    advance the funnel).  Snapshots are versioned by n_seen; the latest
    per user aggregates to exactly the batch query's stage counts."""
    _, source = _chrono_source(spark, sf_oracle, tmp_path)
    q = E.run_to_memory(
        E.stream_funnel(spark, sf_oracle, source=source), "t_funnel_mb", "update"
    )
    _assert_multi_batch(q)
    latest = {}
    for r in spark.table("t_funnel_mb").collect():
        if r["user_id"] not in latest or r["n_seen"] > latest[r["user_id"]]["n_seen"]:
            latest[r["user_id"]] = r
    got = (
        sum(1 for r in latest.values() if r["t_view"] >= 0),
        sum(1 for r in latest.values() if r["t_click"] >= 0),
        sum(1 for r in latest.values() if r["t_buy"] >= 0),
    )
    b = E.ev_funnel(spark, sf_oracle).collect()[0]
    assert got == (b["n_viewed"], b["n_clicked"], b["n_purchased"])
    # the driver fixture never completes a funnel (no click lands within
    # 30 min of a first view at sf0.01) — stage progression across
    # batches is proven on the crafted fixture below
    assert got[0] > 0


@pytest.mark.slow  # >10 s measured (r16 durations profile)
def test_funnel_multi_microbatch_crafted_progression(spark, tmp_path):
    """Cross-batch funnel latching on a CRAFTED event log where stages
    genuinely complete: views early, qualifying clicks ~10 min later,
    purchases ~1 h after that, so the chrono quartile split places a
    user's stages in DIFFERENT micro-batches.  Streaming must equal
    batch on all three counts, honor both window cutoffs, and at least
    one user's snapshots must show the click latching in a LATER batch
    than the view (state provably carried forward)."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)

    def ev(eid, minutes, uid, et):
        return (eid, t0 + dt.timedelta(minutes=minutes), uid, et)

    rows, eid = [], 0
    for u in range(1, 7):  # complete funnels
        for m, et in [(u, "view"), (u + 10, "click"), (u + 70, "purchase")]:
            eid += 1
            rows.append(ev(eid, m, u, et))
    for u in range(7, 10):  # view only
        eid += 1
        rows.append(ev(eid, u, u, "view"))
    eid += 1; rows.append(ev(eid, 1, 10, "view"))
    eid += 1; rows.append(ev(eid, 46, 10, "click"))  # 45 min: too late
    eid += 1; rows.append(ev(eid, 2, 11, "view"))
    eid += 1; rows.append(ev(eid, 12, 11, "click"))
    eid += 1; rows.append(ev(eid, 12 + 25 * 60, 11, "purchase"))  # >24h late
    eid += 1; rows.append(ev(eid, 5, 12, "click"))  # click without view
    crafted = tmp_path / "crafted"
    crafted.mkdir()
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    ).withColumn("value", F.lit(0.0)).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(crafted / "events.parquet"))

    _, source = _chrono_source(spark, str(crafted), tmp_path)
    q = E.run_to_memory(
        E.stream_funnel(spark, str(crafted), source=source),
        "t_funnel_crafted",
        "update",
    )
    _assert_multi_batch(q)
    snaps = spark.table("t_funnel_crafted").collect()
    latest = {}
    for r in snaps:
        if r["user_id"] not in latest or r["n_seen"] > latest[r["user_id"]]["n_seen"]:
            latest[r["user_id"]] = r
    got = (
        sum(1 for r in latest.values() if r["t_view"] >= 0),
        sum(1 for r in latest.values() if r["t_click"] >= 0),
        sum(1 for r in latest.values() if r["t_buy"] >= 0),
    )
    b = E.ev_funnel(spark, str(crafted)).collect()[0]
    assert got == (b["n_viewed"], b["n_clicked"], b["n_purchased"]) == (11, 7, 6)
    # cross-batch progression: some user has an earlier snapshot with
    # the view latched but not the click, and a later one with both
    progressed = False
    by_user = {}
    for r in snaps:
        by_user.setdefault(r["user_id"], []).append(r)
    for rs in by_user.values():
        rs.sort(key=lambda r: r["n_seen"])
        saw_view_only = any(r["t_view"] >= 0 and r["t_click"] < 0 for r in rs)
        saw_click = any(r["t_click"] >= 0 for r in rs)
        if saw_view_only and saw_click:
            progressed = True
            break
    assert progressed, "no user advanced a funnel stage across micro-batches"


def test_scd2_multi_microbatch(spark, sf_oracle, tmp_path):
    """Incremental SCD2 MERGE equivalence: runs closed across
    micro-batch boundaries carry the exact validity stamps of the batch
    lag/lead plan, and the final open snapshots equal the batch
    is_current rows — the batch/incremental equivalence users assume of
    a warehouse dimension build."""
    ev, source = _chrono_source(spark, sf_oracle, tmp_path)
    q = E.run_to_memory(
        E.stream_scd2(spark, sf_oracle, source=source), "t_scd2_mb", "update"
    )
    _assert_multi_batch(q)
    rows = spark.table("t_scd2_mb").collect()
    closed = {
        (r["user_id"], r["state"], r["valid_from_us"], r["valid_to_us"],
         r["n_events"], r["is_current"])
        for r in rows if not r["is_current"]
    }
    open_latest = {}
    for r in rows:
        if r["is_current"]:
            k = r["user_id"]
            if k not in open_latest or (
                (r["run_no"], r["n_events"])
                > (open_latest[k]["run_no"], open_latest[k]["n_events"])
            ):
                open_latest[k] = r
    opened = {
        (r["user_id"], r["state"], r["valid_from_us"], r["valid_to_us"],
         r["n_events"], r["is_current"])
        for r in open_latest.values()
    }
    batch = {
        (r["user_id"], r["state"], r["valid_from_us"], r["valid_to_us"],
         r["n_events"], r["is_current"])
        for r in E.ev_scd2_history(spark, sf_oracle).collect()
    }
    assert closed | opened == batch
    assert closed and opened  # both classes actually exercised


def test_last_touch_multi_microbatch(spark, sf_oracle, tmp_path):
    """LOCF attribution across micro-batch boundaries: a purchase whose
    credited touch arrived in an earlier batch must still attribute
    (the touch register persists in state); drained append output
    equals the batch window plan row-for-row, including 'organic'
    fallbacks."""
    _, source = _chrono_source(spark, sf_oracle, tmp_path)
    q = E.run_to_memory(
        E.stream_last_touch(spark, sf_oracle, source=source),
        "t_lt_mb",
        "append",
    )
    _assert_multi_batch(q)
    cols = ["purchase_id", "user_id", "touch_id", "channel", "touch_age_us"]
    streamed = {tuple(r[c] for c in cols) for r in spark.table("t_lt_mb").collect()}
    batch = {
        tuple(r[c] for c in cols)
        for r in E.ev_last_touch_attribution(spark, sf_oracle).collect()
    }
    assert streamed == batch
    assert any(t[3] == "organic" for t in batch) and any(
        t[3] != "organic" for t in batch
    )


def test_fixture_commit_order_matches_event_time(spark, sf_oracle):
    """stream_scd2's equivalence argument requires per-user COMMIT order
    (event_id) to agree with EVENT-TIME order (the chrono harness splits
    by ts): assert it on the fixture so any regeneration that introduces
    an inversion fails loudly here instead of silently diverging the
    streaming fold from the batch lag/lead plan."""
    from pyspark.sql import Window

    ev = spark.read.parquet(f"{sf_oracle}/events.parquet")
    w_id = Window.partitionBy("user_id").orderBy("event_id")
    w_ts = Window.partitionBy("user_id").orderBy("ts", "event_id")
    mism = (
        ev.select(
            "user_id",
            "event_id",
            F.row_number().over(w_id).alias("rn_commit"),
            F.row_number().over(w_ts).alias("rn_time"),
        )
        .filter(F.col("rn_commit") != F.col("rn_time"))
        .count()
    )
    assert mism == 0, f"{mism} events where commit order != event-time order"


def test_rank_picks_randomized_vs_naive(spark):
    """Property test for the distributed bucketed rank-pick
    (events.rank_picks): on randomized data — heavy value duplication,
    skewed groups, multiple coinciding targets — the picked element per
    (group, label) must equal a naive driver-side sort.  This is the
    only check of the bucketing/offset/tie machinery that isn't routed
    through the two driver-hash-checked consumers (MAD/winsorize),
    whose fixed fixtures can't reach e.g. a rank landing on a bucket
    boundary or every-value-equal groups."""
    import random

    from ftp_blueprints_spark.streaming.events import rank_picks

    rng = random.Random(20260815)
    targets = {
        "median_lo": lambda n: (n + 1) // 2,
        "p25": lambda n: max(1, (n + 3) // 4),
        "first": lambda n: 1,
        "last": lambda n: n,
    }
    for trial in range(4):
        rows = []
        eid = 0
        for g in range(rng.randint(1, 5)):
            n = rng.choice([1, 2, 3, 17, 400, 1500])
            # heavy duplication: values from a tiny domain, plus one
            # constant-only group shape in some trials
            domain = rng.choice([1, 3, 1000])
            for _ in range(n):
                eid += 1
                rows.append((f"g{g}", rng.randint(0, domain), eid))
        df = spark.createDataFrame(rows, "grp string, v long, id long")
        got = {
            (g, which): v
            for g, which, v in rank_picks(df, "grp", "v", "id", targets)
        }
        by_group: dict = {}
        for g, v, i in rows:
            by_group.setdefault(g, []).append((v, i))
        want = {}
        for g, vals in by_group.items():
            vals.sort()
            for which, fn in targets.items():
                want[(g, which)] = vals[fn(len(vals)) - 1][0]
        assert got == want, f"trial {trial}: {got} != {want}"


def test_cdc_compact_multi_microbatch(spark, sf_oracle, tmp_path):
    """Incremental upsert compaction: per-key max-event_id state
    accumulates across micro-batches; the final snapshot per key (max
    n_changes), tombstones dropped, equals the batch ev_cdc_compact
    row-for-row — the MERGE-INTO equivalence every Hudi/Delta-style
    ingest pipeline assumes."""
    _, source = _chrono_source(spark, sf_oracle, tmp_path)
    q = E.run_to_memory(
        E.stream_cdc_compact(spark, sf_oracle, source=source),
        "t_cdc_mb",
        "update",
    )
    _assert_multi_batch(q)
    latest = {}
    for r in spark.table("t_cdc_mb").collect():
        k = r["user_id"]
        if k not in latest or r["n_changes"] > latest[k]["n_changes"]:
            latest[k] = r
    streamed = {
        (r["user_id"], r["n_changes"], r["last_type"], r["last_ts_us"],
         r["last_value_cu"])
        for r in latest.values() if r["last_type"] != "error"
    }
    batch = {
        (r["user_id"], r["n_changes"], r["last_type"], r["last_ts_us"],
         r["last_value_cu"])
        for r in E.ev_cdc_compact(spark, sf_oracle).collect()
    }
    assert streamed == batch
    # tombstoned keys were really exercised: some latest snapshot IS an
    # error (dropped above, matching the batch filter)
    assert any(r["last_type"] == "error" for r in latest.values())


def test_sliding_avg_multi_microbatch(spark, sf_oracle, tmp_path):
    """Sliding-window merge under real incremental execution: each
    event feeds two window states, and windows straddling a micro-batch
    boundary keep merging partial (sum, count) pairs; the integer
    micro-unit average computed at drain time equals the batch query
    exactly (associative state merge + emit-time division)."""
    _, source = _chrono_source(spark, sf_oracle, tmp_path)
    q = E.run_to_memory(
        E.stream_sliding_avg(spark, sf_oracle, source=source),
        "t_sliding_mb",
        "complete",
    )
    _assert_multi_batch(q)
    streamed = _rows(spark.table("t_sliding_mb"))
    batch = _rows(E.ev_sliding_avg(spark, sf_oracle))
    assert streamed == batch


def test_trending_topk_foreachbatch_leaderboard(spark, sf_oracle, tmp_path):
    """The stream-native top-k pattern: windowed counts as streaming
    state, rank re-derived per micro-batch in foreachBatch, leaderboard
    published as an overwrite snapshot. The final snapshot after an
    availableNow drain equals the batch ev_trending_topk row-for-row,
    and the publisher demonstrably ran once per micro-batch."""
    _, source = _chrono_source(spark, sf_oracle, tmp_path)
    sink = str(tmp_path / "leaderboard")
    q = E.run_trending_topk_stream(spark, sf_oracle, sink, source=source)
    _assert_multi_batch(q)
    snapshot = _rows(spark.read.parquet(sink))
    batch = _rows(E.ev_trending_topk(spark, sf_oracle))
    assert snapshot == batch
    assert len(batch) > 0


def test_markov_transitions_multi_microbatch(spark, sf_oracle, tmp_path):
    """Per-key last-event state carry: a user's first event of a batch
    must pair with their last event of an earlier batch. Summing the
    drained per-batch pair counts and renormalizing reproduces the
    batch lead() transition matrix exactly; the pair-count identity
    (sum n == events - users) independently proves no cross-batch edge
    was dropped, since users' event runs really span the quartiles."""
    ev, source = _chrono_source(spark, sf_oracle, tmp_path)
    q = E.run_to_memory(
        E.stream_markov_transitions(spark, sf_oracle, source=source),
        "t_mkv_mb",
        "append",
    )
    _assert_multi_batch(q)
    pairs: dict = {}
    for r in spark.table("t_mkv_mb").collect():
        k = (r["from_type"], r["to_type"])
        pairs[k] = pairs.get(k, 0) + r["n"]
    totals: dict = {}
    for (a, _), n in pairs.items():
        totals[a] = totals.get(a, 0) + n
    streamed = {
        (a, b, n, (n * 1_000_000) // totals[a]) for (a, b), n in pairs.items()
    }
    batch = _rows(E.ev_markov_transitions(spark, sf_oracle))
    assert streamed == batch
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    # every user contributes (their event count - 1) transitions
    assert (
        spark.table("t_mkv_mb").agg(F.sum("n")).collect()[0][0]
        == n_events - n_users
    )


@pytest.mark.slow  # >10 s measured (r16 durations profile)
def test_incremental_dedup_index_multi_microbatch(spark, tmp_path):
    """dd_incremental's docstring claims the standing corpus is touched
    only through a MAINTAINED (hash, keeper) index. Prove the
    maintenance: stream three doc_id-ordered micro-batches of crafted
    docs through run_incremental_exact_stream's foreachBatch-updated
    index and require the drained classification to equal the batch
    twin (incremental_classify with no near-dup pairs) — dup_corpus AND
    dup_batch decisions provably carry across micro-batch boundaries,
    including a twin whose first copy arrived two micro-batches
    earlier."""
    import os

    from ftp_blueprints_spark.operators import dedup as D

    corpus = spark.createDataFrame(
        [(1, "A"), (3, "B"), (5, "C")], "doc_id long, h string"
    )
    files = [
        [(2, "A"), (4, "X"), (6, "X")],  # corpus twin; kept; same-batch twin
        [(8, "X"), (10, "Y")],  # twin of batch-0 doc; kept
        [(12, "Y"), (14, "B"), (16, "Z")],  # batch-1 twin; corpus twin; kept
    ]
    src_dir = tmp_path / "incr_parts"
    for i, rows in enumerate(files):
        out = str(src_dir / f"part{i}")
        spark.createDataFrame(rows, "doc_id long, h string").coalesce(
            1
        ).write.mode("overwrite").parquet(out)
        for f in os.listdir(out):
            os.utime(os.path.join(out, f), (1_700_000_000 + i,) * 2)
    source = (
        spark.readStream.schema("doc_id long, h string")
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(str(src_dir))
    )
    out_dir = str(tmp_path / "incr_out")
    index_dir = str(tmp_path / "incr_idx")
    q = D.run_incremental_exact_stream(spark, corpus, source, index_dir, out_dir)
    _assert_multi_batch(q, 3)
    streamed = {
        (r.doc_id, r.status, r.dedup_ref)
        for r in spark.read.parquet(out_dir).collect()
    }
    norm = corpus.unionAll(
        spark.createDataFrame(
            [r for rows in files for r in rows], "doc_id long, h string"
        )
    )
    pairs = spark.createDataFrame([], "doc_a long, doc_b long")
    expected = {
        (r.doc_id, r.status, r.dedup_ref)
        for r in D.incremental_classify(norm, pairs).collect()
    }
    assert streamed == expected
    assert streamed == {
        (2, "dup_corpus", 1),
        (4, "kept", 4),
        (6, "dup_batch", 4),
        (8, "dup_batch", 4),
        (10, "kept", 10),
        (12, "dup_batch", 10),
        (14, "dup_corpus", 3),
        (16, "kept", 16),
    }
    # foreachBatch is at-least-once: REPLAY the last micro-batch (its
    # index append already committed) and require both the drained
    # classification and the index to be bit-identical afterwards —
    # the idempotence that makes the recovery story sound.
    out_df = spark.read.parquet(out_dir)
    last_bid = max(r.bid for r in out_df.select("bid").distinct().collect())
    last_docs = {
        r.doc_id for r in out_df.filter(F.col("bid") == last_bid).collect()
    }
    idx_before = {
        tuple(r) for r in spark.read.parquet(index_dir).collect()
    }
    replay = spark.createDataFrame(
        [r for rows in files for r in rows if r[0] in last_docs],
        "doc_id long, h string",
    )
    D._incremental_microbatch(replay, last_bid, index_dir, out_dir)
    streamed_after = {
        (r.doc_id, r.status, r.dedup_ref)
        for r in spark.read.parquet(out_dir).collect()
    }
    idx_after = {tuple(r) for r in spark.read.parquet(index_dir).collect()}
    assert streamed_after == streamed
    assert idx_after == idx_before
    # RESTART: a fresh invocation re-seeds ONLY the corpus partition
    # (dynamic overwrite) — the batch-learned partitions must survive,
    # or a recovered run misclassifies a twin of a pre-restart doc.
    # Same checkpoint, one new file: doc 18 twins batch-0 doc 4 ('X'),
    # doc 20 is novel.
    out4 = str(src_dir / "part3")
    spark.createDataFrame(
        [(18, "X"), (20, "W")], "doc_id long, h string"
    ).coalesce(1).write.mode("overwrite").parquet(out4)
    for f in os.listdir(out4):
        os.utime(os.path.join(out4, f), (1_700_000_003,) * 2)
    source2 = (
        spark.readStream.schema("doc_id long, h string")
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(str(src_dir))
    )
    D.run_incremental_exact_stream(spark, corpus, source2, index_dir, out_dir)
    after_restart = {
        (r.doc_id, r.status, r.dedup_ref)
        for r in spark.read.parquet(out_dir).collect()
    }
    assert after_restart == streamed | {(18, "dup_batch", 4), (20, "kept", 20)}


def test_dwell_time_spell_accounting(spark, sf_oracle):
    """Spell count conservation: every event opens a spell except each
    user's last (open) one, so sum(n_spells) = |events| - |users|; all
    dwell totals are non-negative and the mean is the exact floor-div
    of total by count."""
    from ftp_blueprints_spark.session import load_table
    from ftp_blueprints_spark.streaming.events import ev_dwell_time

    ev = load_table(spark, sf_oracle, "events")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    rows = ev_dwell_time(spark, sf_oracle).collect()
    assert sum(r.n_spells for r in rows) == n_events - n_users
    for r in rows:
        assert r.total_dwell_us >= 0
        assert r.avg_dwell_us == r.total_dwell_us // r.n_spells


def test_dwell_time_multi_microbatch(spark, sf_oracle, tmp_path):
    """Per-key last-event state carry for spell durations: a user's
    first event of a batch must CLOSE the spell opened by their last
    event of an earlier batch. Summing the drained per-batch partials
    per event_type and floor-dividing reproduces the batch aggregate
    exactly; the spell-count identity (sum n_spells == events - users)
    independently proves no cross-batch spell was dropped, since
    users' event runs really span the quartile files."""
    ev, source = _chrono_source(spark, sf_oracle, tmp_path)
    q = E.run_to_memory(
        E.stream_dwell_time(spark, sf_oracle, source=source),
        "t_dwell_mb",
        "append",
    )
    _assert_multi_batch(q)
    agg: dict = {}
    for r in spark.table("t_dwell_mb").collect():
        n, tot = agg.get(r["event_type"], (0, 0))
        agg[r["event_type"]] = (n + r["n_spells"], tot + r["total_dwell_us"])
    streamed = {(t, n, tot, tot // n) for t, (n, tot) in agg.items()}
    batch = _rows(E.ev_dwell_time(spark, sf_oracle))
    assert streamed == batch
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert sum(n for n, _ in agg.values()) == n_events - n_users


def test_dwell_time_restart_safe(spark, sf_oracle, tmp_path):
    """Recovery: drain the first three quartile files to a parquet sink
    with a durable checkpoint, STOP, then start a fresh query on the
    same source dir + checkpoint after the fourth file lands. The
    recovered run must resume from per-user state (each user's open
    spell at the stop point closes against their first post-restart
    event) — the summed output over both runs equals the batch
    aggregate, and the conservation identity fails if any cross-restart
    spell was dropped or double-counted (the parquet sink's transaction
    log makes redelivered batches a no-op)."""
    ev, parts = _quartile_parts(spark, sf_oracle)
    src_dir = tmp_path / "dwell_parts"
    sink = str(tmp_path / "dwell_sink")
    ckpt = str(tmp_path / "dwell_ckpt")

    def drain() -> None:
        q = (
            E.stream_dwell_time(
                spark, sf_oracle, source=_ev_file_stream(spark, src_dir)
            )
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError("dwell restart drain timed out")

    for i, part in enumerate(parts[:3]):
        _land_part(src_dir, i, part)
    drain()  # run 1: three micro-batches, then the query STOPS
    mid = spark.read.parquet(sink).count()
    _land_part(src_dir, 3, parts[3])
    drain()  # run 2: fresh query object, same checkpoint — recovery
    assert spark.read.parquet(sink).count() > mid  # batch 4 really ran
    agg: dict = {}
    for r in spark.read.parquet(sink).collect():
        n, tot = agg.get(r["event_type"], (0, 0))
        agg[r["event_type"]] = (n + r["n_spells"], tot + r["total_dwell_us"])
    streamed = {(t, n, tot, tot // n) for t, (n, tot) in agg.items()}
    batch = _rows(E.ev_dwell_time(spark, sf_oracle))
    assert streamed == batch
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert sum(n for n, _ in agg.values()) == n_events - n_users


def test_dwell_group_scan_is_chunk_order_invariant():
    """Like _ttl_group_scan: the dwell scan must concat + sort ALL
    Arrow chunks before pairing, because applyInPandasWithState hands a
    group over as arbitrarily split, arbitrarily ordered chunks — a
    per-chunk pairing would close spells against the wrong neighbor.
    Ties on ts_us break by event_id, matching the batch lead() order."""
    import pandas as pd

    def chunk(rows):
        return pd.DataFrame(rows, columns=["ts_us", "event_id", "event_type"])

    # global order: (0,v) -> (10,c) -> (10,p) -> (40,v): spells
    # view 10us (0->10), click 0us (10->10), purchase 30us (10->40)
    rows = [(0, 1, "view"), (10, 2, "click"), (10, 3, "purchase"),
            (40, 4, "view")]
    want_agg = {"view": (1, 10), "click": (1, 0), "purchase": (1, 30)}
    want_tail = (40, 4, "view")
    agg, tail = E._dwell_group_scan(iter([chunk(rows)]), None)
    assert (agg, tail) == (want_agg, want_tail)
    # adversarial split: the t=40 row arrives FIRST, the t=10 tie pair
    # arrives id-descending in a later chunk
    split = [chunk([(40, 4, "view"), (0, 1, "view")]),
             chunk([(10, 3, "purchase"), (10, 2, "click")])]
    assert E._dwell_group_scan(iter(split), None) == (want_agg, want_tail)
    # carried state closes the open spell from a previous batch: a
    # carried (45, 5, 'click')... must pair with this batch's first row
    agg2, tail2 = E._dwell_group_scan(
        iter([chunk([(100, 9, "view")])]), (45, 5, "click")
    )
    assert agg2 == {"click": (1, 55)}
    assert tail2 == (100, 9, "view")
    # empty delivery: no output, carried state unchanged
    assert E._dwell_group_scan(iter([chunk([])]), (45, 5, "click")) == (
        None, (45, 5, "click"),
    )
    # precondition guard (r9 advice): an arrival BELOW the carried
    # state would close a spell backwards — must fail loudly, not emit
    # a negative dwell attributed to the carried type
    import pytest as _pytest

    with _pytest.raises(ValueError, match="out-of-order"):
        E._dwell_group_scan(iter([chunk([(44, 9, "view")])]), (45, 5, "click"))
    with _pytest.raises(ValueError, match="out-of-order"):  # ts tie, lower id
        E._dwell_group_scan(iter([chunk([(45, 4, "view")])]), (45, 5, "click"))
    # strictly-below only: (ts tie, higher id) is the legal shape —
    # the batch lead() orders ties by event_id, so this 0-us spell is
    # exactly what the batch plan computes
    agg3, _ = E._dwell_group_scan(iter([chunk([(45, 6, "view")])]), (45, 5, "click"))
    assert agg3 == {"click": (1, 0)}


def test_concurrency_hand_computed_and_bucketed(spark):
    """Pin the sweep-line arithmetic on a crafted timeline (the parity
    test could pass on a shared misconception): overlapping spans
    stack, a span ending exactly when another starts does NOT overlap
    it (half-open), and the peak may straddle a prefix-sum bucket
    boundary — the offset join must carry it. Plan: the point-stream
    window partitions by (event_type, bucket), never event_type alone
    (the one-task-per-type funnel)."""
    import re

    from ftp_blueprints_spark.streaming.events import (
        CONCURRENCY_BUCKET_US,
        CONCURRENCY_SESSION_US,
        ev_concurrency,
    )
    import ftp_blueprints_spark.streaming.events as E2

    D = CONCURRENCY_SESSION_US
    B = CONCURRENCY_BUCKET_US
    rows = [
        # type 'a': three nested opens -> peak 3; a fourth at exactly
        # the first's end must NOT count it (half-open boundary)
        (1, "a", 0), (2, "a", 1), (3, "a", 2), (4, "a", D),
        # type 'b': peak straddles a bucket boundary — two spans open
        # late in bucket 0, still open when a third starts in bucket 1
        (5, "b", B - D // 2), (6, "b", B - D // 3), (7, "b", B + 1000),
    ]
    docs = spark.createDataFrame(
        [(eid, t, us) for eid, t, us in rows],
        "event_id long, event_type string, us long",
    ).selectExpr(
        "event_id", "event_type", "timestamp_micros(us) AS ts",
        "CAST(1.0 AS DOUBLE) AS value", "CAST(event_id AS LONG) AS user_id",
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        docs.write.mode("overwrite").parquet(f"{d}/events.parquet")
        out = {r.event_type: (r.max_concurrent, r.n_events)
               for r in ev_concurrency(spark, d).collect()}
        plan = (
            ev_concurrency(spark, d)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    assert out == {"a": (3, 4), "b": (3, 3)}
    # every point-stream window spec carries BOTH keys; the tiny
    # per-bucket offset window is the only event_type-alone partition
    # and it reads the aggregated bucket table, not raw points
    specs = re.findall(r"windowspecdefinition\([^)]*\)", plan)
    assert any("bucket" in s for s in specs), plan


def _conc_sentinels(spark, ev):
    """Two far-future flush events: sentinel A advances the watermark
    past every real bucket's end; sentinel B's micro-batch then runs
    with that watermark so the event-time timeouts demonstrably fire in
    a DATA batch (no reliance on trailing no-data batches). Both use a
    reserved type the assertions exclude."""
    max_us = ev.agg(F.max(F.unix_micros("ts"))).collect()[0][0]
    margin = (
        E.CONCURRENCY_SESSION_US + E.CONCURRENCY_BUCKET_US
        + 2 * 3600 * 1_000_000  # > the 1 h watermark delay
    )
    mk = lambda i, us: (10_000_000 + i, us)
    return [
        spark.createDataFrame(
            [mk(i, max_us + margin * (i + 1))], "event_id long, us long"
        ).selectExpr(
            "event_id", "timestamp_micros(us) AS ts",
            "CAST(event_id AS LONG) AS user_id",
            "'__flush__' AS event_type", "CAST(0.0 AS DOUBLE) AS value",
        ).select("event_id", "ts", "user_id", "event_type", "value")
        for i in range(2)
    ]


def _conc_expected(ev) -> set:
    return {
        tuple(r)
        for r in E.concurrency_per_bucket(E.concurrency_points(ev)).collect()
    }


def _conc_drained(df) -> set:
    return {
        tuple(r) for r in df.filter(F.col("event_type") != "__flush__").collect()
    }


@pytest.mark.slow  # >10 s measured (r16 durations profile)
def test_concurrency_stream_finalizes_buckets(spark, sf_oracle, tmp_path):
    """The streaming-native concurrency operator under real incremental
    execution: four chronological quartile files plus two flush
    sentinels run as separate micro-batches; every real (event_type,
    bucket) must finalize exactly once with (local_max, total, n_pts)
    equal to the batch sweep's per-bucket intermediates — i.e. the
    buffered-points state provably carries partial buckets across
    micro-batch boundaries and the watermark-timeout emission computes
    the same local sweep the batch window does."""
    ev, parts = _quartile_parts(spark, sf_oracle)
    src_dir = tmp_path / "conc_parts"
    for i, part in enumerate(parts):
        _land_part(src_dir, i, part)
    for j, s in enumerate(_conc_sentinels(spark, ev)):
        _land_part(src_dir, 4 + j, s)
    q = E.run_to_memory(
        E.stream_concurrency(
            spark, sf_oracle, source=_ev_file_stream(spark, src_dir)
        ),
        "t_conc_mb",
        "append",
    )
    _assert_multi_batch(q, 5)
    assert _conc_drained(spark.table("t_conc_mb")) == _conc_expected(ev)


@pytest.mark.slow  # >10 s measured (r16 durations profile)
def test_concurrency_stream_restart_safe(spark, sf_oracle, tmp_path):
    """Recovery: drain the first three quartile files with a durable
    checkpoint, STOP, then land the fourth file plus the flush
    sentinels and start a fresh query on the same checkpoint. Buckets
    buffered (not yet finalized) at the stop point must survive the
    restart and finalize with the correct sweep — the combined output
    equals the batch per-bucket rows, and a bucket lost or replayed by
    recovery would break set equality (the parquet sink's transaction
    log makes redelivered batches a no-op)."""
    ev, parts = _quartile_parts(spark, sf_oracle)
    src_dir = tmp_path / "conc_restart_parts"
    sink = str(tmp_path / "conc_sink")
    ckpt = str(tmp_path / "conc_ckpt")

    def drain() -> None:
        q = (
            E.stream_concurrency(
                spark, sf_oracle, source=_ev_file_stream(spark, src_dir)
            )
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError("concurrency restart drain timed out")

    for i, part in enumerate(parts[:3]):
        _land_part(src_dir, i, part)
    drain()  # run 1: three micro-batches, then the query STOPS
    mid = spark.read.parquet(sink).count()
    _land_part(src_dir, 3, parts[3])
    for j, s in enumerate(_conc_sentinels(spark, ev)):
        _land_part(src_dir, 4 + j, s)
    drain()  # run 2: fresh query object, same checkpoint — recovery
    assert spark.read.parquet(sink).count() > mid  # post-restart emits
    assert _conc_drained(spark.read.parquet(sink)) == _conc_expected(ev)


def test_concurrency_bucketed_equals_naive_property():
    """Randomized-vs-naive: the bucketed two-pass prefix sum (local
    sweep per bucket via _concurrency_finalize + offset = cumulative
    preceding totals — exactly ev_concurrency's plan algebra and
    stream_concurrency's finalization) must equal a single global
    naive sweep for ANY event multiset: duplicate timestamps, spans
    crossing many buckets, peaks on bucket boundaries."""
    from hypothesis import given, settings, strategies as st

    S = E.CONCURRENCY_SESSION_US
    B = E.CONCURRENCY_BUCKET_US

    @settings(max_examples=300, deadline=None)
    @given(
        st.lists(
            # cluster starts around bucket edges so straddles/ties occur
            st.one_of(
                st.integers(min_value=0, max_value=3 * B),
                st.sampled_from(
                    [0, B - 1, B, B + 1, B - S, B - S + 1, 2 * B, 2 * B - S]
                ),
            ),
            min_size=1,
            max_size=60,
        )
    )
    def check(starts):
        pts = [(us, 1) for us in starts] + [(us + S, -1) for us in starts]
        # naive: one global sweep in (us, delta) order, delta -1 first
        run, naive_max = 0, None
        for _, d in sorted(pts):
            run += d
            naive_max = run if naive_max is None else max(naive_max, run)
        # bucketed: per-bucket local sweep + preceding-totals offset
        buckets: dict = {}
        for us, d in pts:
            buckets.setdefault(us // B, []).append((us, d))
        offset, bucketed_max = 0, None
        for b in sorted(buckets):
            us_l = [u for u, _ in buckets[b]]
            d_l = [d for _, d in buckets[b]]
            mx, tot, n = E._concurrency_finalize(us_l, d_l)
            assert n == len(buckets[b])
            cand = offset + mx
            bucketed_max = (
                cand if bucketed_max is None else max(bucketed_max, cand)
            )
            offset += tot
        assert offset == 0  # every span closes
        assert bucketed_max == naive_max

    check()


@pytest.mark.slow  # >10 s measured (r16 durations profile)
def test_incremental_ivf_stream_multi_microbatch_and_restart(spark, sf_oracle, tmp_path):
    """The incremental ANN index under REAL streaming maintenance:
    build an IVF index on the corpus half, stream the snapshot half as
    three vec_id-ordered micro-batches through the foreachBatch
    ivf_append twin, and require the served lists to hold exactly
    corpus ∪ snapshot with every appended vector in the list its direct
    frozen-centroid assignment names. Then prove the recovery story:
    a direct replay of the last committed batch leaves the lists
    bit-identical (dynamic (bid, cid) overwrite), and a RESTART on the
    same checkpoint after a fourth file lands processes only the new
    file while earlier appends survive."""
    import os

    from ftp_blueprints_spark.operators import similarity as S
    from ftp_blueprints_spark.session import load_table

    emb = load_table(spark, sf_oracle, "embeddings")
    corpus = emb.filter(F.col("vec_id") % 2 == 0)
    snap_rows = (
        emb.filter(F.col("vec_id") % 2 == 1)
        .select("vec_id", "embedding", "label")
        .orderBy("vec_id")
        .collect()
    )
    corpus.write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    idx = S.ivf_build(spark, str(tmp_path), index_dir=str(tmp_path / "idx"))

    third = len(snap_rows) // 3
    chunks = [snap_rows[:third], snap_rows[third:2 * third], snap_rows[2 * third:]]
    src_dir = tmp_path / "emb_parts"

    def land(i, rows):
        out = str(src_dir / f"part{i}")
        spark.createDataFrame(
            [(r["vec_id"], r["embedding"], r["label"]) for r in rows],
            emb.select("vec_id", "embedding", "label").schema,
        ).coalesce(1).write.mode("overwrite").parquet(out)
        for f in os.listdir(out):
            os.utime(os.path.join(out, f), (1_700_000_000 + i,) * 2)

    for i, rows in enumerate(chunks):
        land(i, rows)

    def src():
        return (
            spark.readStream.schema(emb.select("vec_id", "embedding", "label").schema)
            .option("maxFilesPerTrigger", "1")
            .option("recursiveFileLookup", "true")
            .parquet(str(src_dir))
        )

    ckpt = str(tmp_path / "ivf_ckpt")
    q = S.run_incremental_ivf_stream(spark, idx, src(), checkpoint_dir=ckpt)
    _assert_multi_batch(q, 3)

    cents = spark.read.parquet(os.path.join(idx, "centroids"))
    snap_df = emb.filter(F.col("vec_id") % 2 == 1)
    direct = {
        (r["vec_id"], r["cid"])
        for r in S.ivf_assign(snap_df, cents, round_digits=6).collect()
    }
    served = S.ivf_lists_with_appends(spark, idx)
    appended = {
        (r["vec_id"], r["cid"])
        for r in served.filter(F.col("vec_id") % 2 == 1).collect()
    }
    assert appended == direct
    assert served.count() == emb.count()  # corpus ∪ snapshot, nothing else

    # replay idempotency: re-append the LAST committed batch directly
    def lists_key(df):
        return {
            (r["vec_id"], r["cid"], tuple(r["embedding"]))
            for r in df.collect()
        }

    lists_before = lists_key(served)
    last_bid = max(
        r["bid"]
        for r in spark.read.parquet(os.path.join(idx, "appends"))
        .select("bid").distinct().collect()
    )
    replay_df = spark.createDataFrame(
        [(r["vec_id"], r["embedding"], r["label"]) for r in chunks[-1]],
        emb.select("vec_id", "embedding", "label").schema,
    )
    S.ivf_append(spark, idx, replay_df, batch_id=last_bid)
    assert lists_key(S.ivf_lists_with_appends(spark, idx)) == lists_before

    # restart: land NEW vectors (ids beyond the fixture), same checkpoint
    new_rows = [
        (1_000_000 + i, r["embedding"], r["label"])
        for i, r in enumerate(snap_rows[:5])
    ]
    out4 = str(src_dir / "part3")
    spark.createDataFrame(
        new_rows, emb.select("vec_id", "embedding", "label").schema
    ).coalesce(1).write.mode("overwrite").parquet(out4)
    for f in os.listdir(out4):
        os.utime(os.path.join(out4, f), (1_700_000_003,) * 2)
    S.run_incremental_ivf_stream(spark, idx, src(), checkpoint_dir=ckpt)
    final = S.ivf_lists_with_appends(spark, idx)
    assert final.count() == emb.count() + len(new_rows)
    assert final.filter(F.col("vec_id") >= 1_000_000).count() == len(new_rows)
    # earlier appends untouched by the restarted run
    assert {
        (r["vec_id"], r["cid"])
        for r in final.filter(
            (F.col("vec_id") % 2 == 1) & (F.col("vec_id") < 1_000_000)
        ).collect()
    } == direct


@pytest.mark.slow  # >10 s measured (r16 durations profile)
def test_incremental_ivfpq_stream_multi_microbatch_and_restart(
    spark, sf_oracle, tmp_path
):
    """The compressed maintained index under REAL streaming maintenance
    (the IVF twin's proof set one level down): build an IVFPQ index on
    the corpus half, stream the snapshot half as three vec_id-ordered
    micro-batches through the foreachBatch ivfpq_append twin, and
    require the served codes to hold exactly corpus ∪ snapshot with
    every appended row equal to its direct frozen-centroid +
    frozen-codebook encode. Then the recovery story: a direct replay of
    the last committed batch leaves the codes bit-identical (dynamic
    (bid, cid) overwrite — the multi-bid layout that caught the
    session-conf wipe bug on the IVF side), and a RESTART on the same
    checkpoint after a fourth file lands processes only the new file
    while earlier appends survive."""
    import os

    from ftp_blueprints_spark.operators import similarity as S
    from ftp_blueprints_spark.session import load_table

    emb = load_table(spark, sf_oracle, "embeddings")
    corpus = emb.filter(F.col("vec_id") % 2 == 0)
    snap_rows = (
        emb.filter(F.col("vec_id") % 2 == 1)
        .select("vec_id", "embedding", "label")
        .orderBy("vec_id")
        .collect()
    )
    corpus.write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    idx = S.ivfpq_build(spark, str(tmp_path), index_dir=str(tmp_path / "idx"))

    third = len(snap_rows) // 3
    chunks = [snap_rows[:third], snap_rows[third:2 * third], snap_rows[2 * third:]]
    src_dir = tmp_path / "emb_parts"
    schema = emb.select("vec_id", "embedding", "label").schema

    def land(i, rows):
        out = str(src_dir / f"part{i}")
        spark.createDataFrame(
            [(r["vec_id"], r["embedding"], r["label"]) for r in rows], schema
        ).coalesce(1).write.mode("overwrite").parquet(out)
        for f in os.listdir(out):
            os.utime(os.path.join(out, f), (1_700_000_000 + i,) * 2)

    for i, rows in enumerate(chunks):
        land(i, rows)

    def src():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .option("recursiveFileLookup", "true")
            .parquet(str(src_dir))
        )

    ckpt = str(tmp_path / "pq_ckpt")
    q = S.run_incremental_ivfpq_stream(spark, idx, src(), checkpoint_dir=ckpt)
    _assert_multi_batch(q, 3)

    cents = spark.read.parquet(os.path.join(idx, "centroids"))
    books_q = S._load_books_q(spark, idx)
    snap_df = emb.filter(F.col("vec_id") % 2 == 1)
    direct = {
        (r["cand_id"], r["cid"], tuple(r["codes"]))
        for r in S.pq_encode_qerr(
            S._residuals(snap_df, cents), books_q, emb_col="residual"
        )
        .select(F.col("vec_id").alias("cand_id"), "cid", "codes")
        .collect()
    }
    served = S.ivfpq_codes_with_appends(spark, idx)
    appended = {
        (r["cand_id"], r["cid"], tuple(r["codes"]))
        for r in served.filter(F.col("cand_id") % 2 == 1).collect()
    }
    assert appended == direct
    assert served.count() == emb.count()  # corpus ∪ snapshot, nothing else

    # replay idempotency: re-append the LAST committed batch directly
    def codes_key(df):
        return {
            (r["cand_id"], r["cid"], tuple(r["codes"])) for r in df.collect()
        }

    codes_before = codes_key(served)
    last_bid = max(
        r["bid"]
        for r in spark.read.parquet(os.path.join(idx, "code_appends"))
        .select("bid").distinct().collect()
    )
    replay_df = spark.createDataFrame(
        [(r["vec_id"], r["embedding"], r["label"]) for r in chunks[-1]], schema
    )
    S.ivfpq_append(spark, idx, replay_df, batch_id=last_bid)
    assert codes_key(S.ivfpq_codes_with_appends(spark, idx)) == codes_before

    # restart: land NEW vectors (ids beyond the fixture), same checkpoint
    new_rows = [
        (1_000_000 + i, r["embedding"], r["label"])
        for i, r in enumerate(snap_rows[:5])
    ]
    out4 = str(src_dir / "part3")
    spark.createDataFrame(new_rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(out4)
    for f in os.listdir(out4):
        os.utime(os.path.join(out4, f), (1_700_000_003,) * 2)
    S.run_incremental_ivfpq_stream(spark, idx, src(), checkpoint_dir=ckpt)
    final = S.ivfpq_codes_with_appends(spark, idx)
    assert final.count() == emb.count() + len(new_rows)
    assert final.filter(F.col("cand_id") >= 1_000_000).count() == len(new_rows)
    # earlier appends untouched by the restarted run
    assert {
        (r["cand_id"], r["cid"], tuple(r["codes"]))
        for r in final.filter(
            (F.col("cand_id") % 2 == 1) & (F.col("cand_id") < 1_000_000)
        ).collect()
    } == direct


@pytest.mark.slow  # >10 s measured (r16 durations profile)
def test_incremental_lsh_stream_multi_microbatch_and_restart(
    spark, sf_oracle, tmp_path
):
    """The LSH maintained index under REAL streaming maintenance (the
    IVF twin's proof set for the third family): build the sig index on
    the corpus half, stream the snapshot half as three vec_id-ordered
    micro-batches through the foreachBatch ann_lsh_append twin, and
    require the served sigs to hold exactly corpus ∪ snapshot with
    every appended row equal to its direct frozen-plane hashing. Then
    the recovery story: a direct replay of the last committed batch
    leaves the sigs bit-identical (dynamic (bid, band) overwrite — the
    multi-bid layout that caught the session-conf wipe bug on the IVF
    side), and a RESTART on the same checkpoint after a fourth file
    lands processes only the new file while earlier appends survive."""
    import os

    from ftp_blueprints_spark.operators import similarity as S
    from ftp_blueprints_spark.session import load_table

    emb = load_table(spark, sf_oracle, "embeddings")
    corpus = emb.filter(F.col("vec_id") % 2 == 0)
    snap_rows = (
        emb.filter(F.col("vec_id") % 2 == 1)
        .select("vec_id", "embedding", "label")
        .orderBy("vec_id")
        .collect()
    )
    corpus.write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    idx = S.ann_lsh_build(spark, str(tmp_path), index_dir=str(tmp_path / "idx"))

    third = len(snap_rows) // 3
    chunks = [snap_rows[:third], snap_rows[third:2 * third], snap_rows[2 * third:]]
    src_dir = tmp_path / "emb_parts"
    schema = emb.select("vec_id", "embedding", "label").schema

    def land(i, rows):
        out = str(src_dir / f"part{i}")
        spark.createDataFrame(
            [(r["vec_id"], r["embedding"], r["label"]) for r in rows], schema
        ).coalesce(1).write.mode("overwrite").parquet(out)
        for f in os.listdir(out):
            os.utime(os.path.join(out, f), (1_700_000_000 + i,) * 2)

    for i, rows in enumerate(chunks):
        land(i, rows)

    def src():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .option("recursiveFileLookup", "true")
            .parquet(str(src_dir))
        )

    ckpt = str(tmp_path / "lsh_ckpt")
    q = S.run_incremental_lsh_stream(spark, idx, src(), checkpoint_dir=ckpt)
    _assert_multi_batch(q, 3)

    snap_df = emb.filter(F.col("vec_id") % 2 == 1)
    direct = {
        (r["vec_id"], r["band"], r["sig"])
        for r in S.band_signatures(
            snap_df, S.ANN_BANDS, S.ANN_ROWS, quantize=True
        )
        .select("vec_id", "band", "sig")
        .collect()
    }
    served = S.ann_lsh_sigs_with_appends(spark, idx)
    appended = {
        (r["vec_id"], r["band"], r["sig"])
        for r in served.filter(F.col("vec_id") % 2 == 1).collect()
    }
    assert appended == direct
    # corpus ∪ snapshot, one row per band, nothing else
    assert served.count() == emb.count() * S.ANN_BANDS

    # replay idempotency: re-append the LAST committed batch directly
    def sigs_key(df):
        return {(r["vec_id"], r["band"], r["sig"]) for r in df.collect()}

    sigs_before = sigs_key(served)
    last_bid = max(
        r["bid"]
        for r in spark.read.parquet(os.path.join(idx, "appends"))
        .select("bid").distinct().collect()
    )
    replay_df = spark.createDataFrame(
        [(r["vec_id"], r["embedding"], r["label"]) for r in chunks[-1]], schema
    )
    S.ann_lsh_append(spark, idx, replay_df, batch_id=last_bid)
    assert sigs_key(S.ann_lsh_sigs_with_appends(spark, idx)) == sigs_before

    # restart: land NEW vectors (ids beyond the fixture), same checkpoint
    new_rows = [
        (1_000_000 + i, r["embedding"], r["label"])
        for i, r in enumerate(snap_rows[:5])
    ]
    out4 = str(src_dir / "part3")
    spark.createDataFrame(new_rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(out4)
    for f in os.listdir(out4):
        os.utime(os.path.join(out4, f), (1_700_000_003,) * 2)
    S.run_incremental_lsh_stream(spark, idx, src(), checkpoint_dir=ckpt)
    final = S.ann_lsh_sigs_with_appends(spark, idx)
    assert final.count() == (emb.count() + len(new_rows)) * S.ANN_BANDS
    assert (
        final.filter(F.col("vec_id") >= 1_000_000).count()
        == len(new_rows) * S.ANN_BANDS
    )
    # earlier appends untouched by the restarted run
    assert {
        (r["vec_id"], r["band"], r["sig"])
        for r in final.filter(
            (F.col("vec_id") % 2 == 1) & (F.col("vec_id") < 1_000_000)
        ).collect()
    } == direct


def test_dwell_group_scan_property_vs_naive():
    """Property: for ANY event multiset (duplicate timestamps included),
    ANY chunking, ANY within-chunk order, and ANY legal carried state,
    _dwell_group_scan equals the naive reference — sort globally by
    (ts, event_id), prepend carried, pair adjacent rows, attribute each
    spell to the type being left. Generalizes the hand-crafted
    chunk-order fixtures."""
    import pandas as pd
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=50),  # ts_us (ties likely)
                st.sampled_from(["view", "click", "buy"]),
            ),
            min_size=1,
            max_size=25,
        ),
        st.randoms(use_true_random=False),
        st.booleans(),
    )
    def check(raw, rnd, with_carried):
        rows = [(ts, 1000 + i, ty) for i, (ts, ty) in enumerate(raw)]
        carried = None
        if with_carried:
            lo = min(r[:2] for r in rows)
            # legal carried: strictly below the batch minimum (ts, id)
            carried = (max(lo[0] - 1, 0), 1, "buy") if lo[0] > 0 else None
        # naive reference
        ordered = sorted(rows)
        if carried is not None:
            ordered = [carried, *ordered]
        want: dict = {}
        for (us_a, _, ty_a), (us_b, _, _) in zip(ordered, ordered[1:]):
            n, tot = want.get(ty_a, (0, 0))
            want[ty_a] = (n + 1, tot + (us_b - us_a))
        want_tail = ordered[-1]
        # adversarial delivery: shuffled rows, random chunk boundaries
        shuffled = rows[:]
        rnd.shuffle(shuffled)
        chunks, i = [], 0
        while i < len(shuffled):
            step = rnd.randint(1, len(shuffled) - i)
            chunks.append(shuffled[i:i + step])
            i += step
        if rnd.random() < 0.3:
            chunks.insert(rnd.randint(0, len(chunks)), [])  # empty chunk
        pdfs = [
            pd.DataFrame(c, columns=["ts_us", "event_id", "event_type"])
            for c in chunks
        ]
        agg, tail = E._dwell_group_scan(iter(pdfs), carried)
        assert (agg, tail) == (want, want_tail)

    check()


@pytest.mark.slow  # >10 s measured (r16 durations profile)
def test_concurrency_stream_tolerates_out_of_order_within_horizon(
    spark, tmp_path
):
    """Pin the disorder-tolerance claim the chronological harness never
    exercises: stream_concurrency buffers and re-sorts points at
    finalization, so arrival order across micro-batches may be
    ARBITRARY for any event whose start bucket has not yet finalized.
    Crafted delivery: batch 0 carries the LATEST events, so the
    watermark entering batch 1 (B+41min - 1h = B-19min) is HOURS above
    most of batch 1's rows — this passes only because
    applyInPandasWithState does not pre-filter sub-watermark input and
    the in-flight bucket-0 state absorbs them; the operative lateness
    boundary is bucket finalization, not the raw 1 h delay (the
    no-resurrection and atomic-straddle tests pin the other side of
    that boundary). Finalized buckets must equal the batch sweep's
    per-bucket rows exactly."""
    import os

    B = E.CONCURRENCY_BUCKET_US
    MIN = 60 * 1_000_000
    # events (type, us): cluster around the first bucket boundary B
    evs = [
        ("a", 5 * MIN), ("a", 20 * MIN), ("b", 10 * MIN),
        ("a", B - 10 * MIN), ("b", B - 5 * MIN),  # spans cross into bucket 1
        ("a", B + 5 * MIN), ("b", B + 15 * MIN),
        ("a", B + 40 * MIN), ("b", B + 41 * MIN),
    ]
    rows = [
        (i + 1, ty, us, i + 1, 1.0) for i, (ty, us) in enumerate(evs)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, event_type string, us long, user_id long, value double"
    ).selectExpr(
        "event_id", "timestamp_micros(us) AS ts", "user_id", "event_type", "value"
    )
    expected = {
        tuple(r)
        for r in E.concurrency_per_bucket(E.concurrency_points(ev)).collect()
    }
    # delivery: batch 0 = the LATEST rows, batch 1 = rows ~30-45 min
    # OLDER than batch 0's max (inside the 1 h horizon), batch 2+3 =
    # far-future flush sentinels
    late_first = ev.filter(F.unix_micros("ts") > B)      # newest rows first
    older_second = ev.filter(F.unix_micros("ts") <= B)   # out-of-order batch
    src_dir = tmp_path / "ooo_parts"
    max_us = B + 41 * MIN
    margin = E.CONCURRENCY_SESSION_US + B + 2 * 3600 * 1_000_000
    sentinels = [
        spark.createDataFrame(
            [(10_000 + j, max_us + margin * (j + 1))], "event_id long, us long"
        ).selectExpr(
            "event_id", "timestamp_micros(us) AS ts",
            "CAST(event_id AS LONG) AS user_id",
            "'__flush__' AS event_type", "CAST(0.0 AS DOUBLE) AS value",
        ).select("event_id", "ts", "user_id", "event_type", "value")
        for j in range(2)
    ]
    parts = [
        late_first.select("event_id", "ts", "user_id", "event_type", "value"),
        older_second.select("event_id", "ts", "user_id", "event_type", "value"),
        *sentinels,
    ]
    for i, p in enumerate(parts):
        _land_part(src_dir, i, p)
    q = E.run_to_memory(
        E.stream_concurrency(
            spark, "", source=_ev_file_stream(spark, src_dir)
        ),
        "t_conc_ooo",
        "append",
    )
    _assert_multi_batch(q, 4)
    got = {
        tuple(r)
        for r in spark.table("t_conc_ooo")
        .filter(F.col("event_type") != "__flush__")
        .collect()
    }
    assert got == expected


@pytest.mark.slow  # >10 s measured (r16 durations profile)
def test_concurrency_stream_never_resurrects_finalized_bucket(spark, tmp_path):
    """applyInPandasWithState does not pre-filter sub-watermark rows, so
    without a guard a row arriving AFTER its bucket finalized would
    re-create the key's state and emit the bucket a SECOND time in
    append mode — double-counting downstream. Deliver bucket-0 events,
    advance the watermark past bucket 0's end (it finalizes), then
    deliver a very late bucket-0 row: the finalized row set must not
    change, and (type 'a', bucket 0) must appear exactly once."""
    B = E.CONCURRENCY_BUCKET_US
    MIN = 60 * 1_000_000

    def frame(rows):
        return spark.createDataFrame(
            rows, "event_id long, event_type string, us long"
        ).selectExpr(
            "event_id", "timestamp_micros(us) AS ts",
            "CAST(event_id AS LONG) AS user_id", "event_type",
            "CAST(1.0 AS DOUBLE) AS value",
        ).select("event_id", "ts", "user_id", "event_type", "value")

    margin = E.CONCURRENCY_SESSION_US + B + 2 * 3600 * 1_000_000
    src_dir = tmp_path / "resur_parts"
    parts = [
        frame([(1, "a", 5 * MIN), (2, "a", 20 * MIN)]),      # bucket 0
        frame([(3, "__flush__", 10 * margin)]),              # wm >> bucket 0
        frame([(4, "__flush__", 11 * margin)]),              # finalize fires
        frame([(5, "a", 8 * MIN)]),                          # LATE bucket-0 row
        frame([(6, "__flush__", 12 * margin)]),
        frame([(7, "__flush__", 13 * margin)]),              # would re-fire
    ]
    for i, p in enumerate(parts):
        _land_part(src_dir, i, p)
    E.run_to_memory(
        E.stream_concurrency(spark, "", source=_ev_file_stream(spark, src_dir)),
        "t_conc_resur",
        "append",
    )
    out = [
        tuple(r)
        for r in spark.table("t_conc_resur")
        .filter(F.col("event_type") != "__flush__")
        .collect()
    ]
    # exactly the two original events' buckets, each emitted once:
    # bucket 0 holds both +1s and (2,1): local_max 2; the -1s land in
    # their 30-min-later positions (same bucket 0 here)
    a0 = [r for r in out if r[0] == "a" and r[1] == 0]
    assert len(a0) == 1
    assert a0[0] == ("a", 0, 2, 0, 4)  # peak 2, net 0, 4 points
    assert len(out) == len(set(out))  # no bucket emitted twice


def test_ttl_group_scan_property_vs_naive():
    """Property sibling of the dwell-scan property: for ANY event
    multiset, chunking, within-chunk order, and carried last-kept
    state, _ttl_group_scan equals the naive reference — sort by
    (ts_us, event_id), keep a row iff no prior KEPT row lies within
    ttl, seeded from the carried timestamp."""
    import pandas as pd
    from hypothesis import given, settings, strategies as st

    TTL = 7

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(
            st.integers(min_value=0, max_value=40),  # ts_us, ties likely
            min_size=1,
            max_size=25,
        ),
        st.one_of(st.none(), st.integers(min_value=-10, max_value=40)),
        st.randoms(use_true_random=False),
    )
    def check(ts_list, carried, rnd):
        rows = [(ts, 500 + i) for i, ts in enumerate(ts_list)]
        # naive reference
        last = carried
        want_kept = []
        for ts, eid in sorted(rows):
            if last is None or ts - last > TTL:
                want_kept.append((eid, ts))
                last = ts
        want = (want_kept, last)
        # adversarial delivery
        shuffled = rows[:]
        rnd.shuffle(shuffled)
        chunks, i = [], 0
        while i < len(shuffled):
            step = rnd.randint(1, len(shuffled) - i)
            chunks.append(shuffled[i:i + step])
            i += step
        pdfs = [
            pd.DataFrame(c, columns=["ts_us", "event_id"]) for c in chunks
        ]
        assert E._ttl_group_scan(iter(pdfs), carried, TTL) == want

    check()


@pytest.mark.slow  # >10 s measured (r16 durations profile)
def test_concurrency_stream_drops_straddling_late_event_atomically(
    spark, tmp_path
):
    """The late-drop rule must be per-EVENT, not per-point: a late
    event whose +1 sits in a FINALIZED bucket but whose -1 lands in a
    LIVE one must vanish entirely — a point-level guard would absorb
    the orphan -1 and corrupt the live bucket's (total, n_pts).
    Timeline: bucket-0 events finalize (watermark at B+30min), then a
    late event at B-10min arrives (its -1 would land at B+20min in
    live bucket 1) alongside an on-time bucket-1 event. Finalized rows
    must equal the batch sweep over the NON-late events only, and the
    live bucket's points must balance."""
    B = E.CONCURRENCY_BUCKET_US
    MIN = 60 * 1_000_000

    def frame(rows):
        return spark.createDataFrame(
            rows, "event_id long, event_type string, us long"
        ).selectExpr(
            "event_id", "timestamp_micros(us) AS ts",
            "CAST(event_id AS LONG) AS user_id", "event_type",
            "CAST(1.0 AS DOUBLE) AS value",
        ).select("event_id", "ts", "user_id", "event_type", "value")

    far = 100 * B
    parts = [
        frame([(1, "a", 5 * MIN), (2, "a", 20 * MIN)]),      # bucket 0
        frame([(3, "__flush__", B + 90 * MIN)]),             # wm -> B+30min
        # late straddler (start bucket 0 — finalized; -1 in bucket 1)
        # plus an on-time bucket-1 event (ts > wm)
        frame([(4, "a", B - 10 * MIN), (5, "a", B + 40 * MIN)]),
        frame([(6, "__flush__", far)]),
        frame([(7, "__flush__", far + B)]),
        frame([(8, "__flush__", far + 2 * B)]),
    ]
    src_dir = tmp_path / "straddle_parts"
    for i, p in enumerate(parts):
        _land_part(src_dir, i, p)
    E.run_to_memory(
        E.stream_concurrency(spark, "", source=_ev_file_stream(spark, src_dir)),
        "t_conc_straddle",
        "append",
    )
    got = {
        tuple(r)
        for r in spark.table("t_conc_straddle")
        .filter(F.col("event_type") != "__flush__")
        .collect()
    }
    # batch sweep over the events the stream legally kept (no late one)
    kept = frame([(1, "a", 5 * MIN), (2, "a", 20 * MIN), (5, "a", B + 40 * MIN)])
    expected = {
        tuple(r)
        for r in E.concurrency_per_bucket(E.concurrency_points(kept)).collect()
    }
    assert got == expected
    assert ("a", 0, 2, 0, 4) in got      # original bucket intact
    assert ("a", 1, 1, 0, 2) in got      # live bucket balanced: no orphan -1


@pytest.mark.slow  # >10 s measured (r16 durations profile)
def test_incremental_cms_stream_multi_microbatch_and_restart(
    spark, sf_oracle, tmp_path
):
    """The maintained sketch registry under REAL streaming maintenance:
    build on the corpus half (doc_id % 2 = 0), stream the other half as
    three doc_id-ordered micro-batches through the foreachBatch
    cms_append twin, and require the served merged sketch to equal the
    monolithic whole-corpus sketch cell-for-cell. Then the recovery
    story: a direct replay of the last committed batch leaves serving
    bit-identical (deterministic partial under a dynamic bid
    overwrite), and a RESTART on the same checkpoint after a fourth
    file lands processes only the new file — the earlier partials and
    the merge-exactness survive."""
    import os

    from ftp_blueprints_spark.operators import sketches as K
    from ftp_blueprints_spark.session import load_table

    docs = load_table(spark, sf_oracle, "documents")
    half0 = docs.filter(F.col("doc_id") % 2 == 0)
    half1_rows = (
        docs.filter(F.col("doc_id") % 2 == 1).orderBy("doc_id").collect()
    )
    reg = str(tmp_path / "cms")
    half0_dir = tmp_path / "half0"
    half0.write.mode("overwrite").parquet(str(half0_dir / "documents.parquet"))
    K.cms_registry_build(spark, str(half0_dir), reg)

    third = len(half1_rows) // 3
    chunks = [
        half1_rows[:third],
        half1_rows[third : 2 * third],
        half1_rows[2 * third :],
    ]
    src_dir = tmp_path / "doc_parts"
    schema = docs.schema

    def land(i, rows):
        out = str(src_dir / f"part{i}")
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(out)
        for f in os.listdir(out):
            os.utime(os.path.join(out, f), (1_700_000_000 + i,) * 2)

    for i, rows in enumerate(chunks):
        land(i, rows)

    def src():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .option("recursiveFileLookup", "true")
            .parquet(str(src_dir))
        )

    ckpt = str(tmp_path / "cms_ckpt")
    q = K.run_incremental_cms_stream(spark, reg, src(), checkpoint_dir=ckpt)
    _assert_multi_batch(q, 3)

    def cells(df):
        return {(r["d"], r["bucket"]): r["cell"] for r in df.collect()}

    whole = cells(K.cms_partial(docs))  # the monolithic sketch
    assert cells(K.cms_registry_sketch(spark, reg)) == whole

    # replay idempotency: re-append the LAST committed batch directly
    last_bid = max(
        int(d.split("=")[1])
        for d in os.listdir(os.path.join(reg, "parts"))
        if d.startswith("bid=")
    )
    K.cms_append(
        spark, reg, spark.createDataFrame(chunks[-1], schema), batch_id=last_bid
    )
    assert cells(K.cms_registry_sketch(spark, reg)) == whole

    # restart: land a NEW file (fresh doc_ids), same checkpoint
    new_rows = [
        r.asDict() | {"doc_id": 1_000_000 + i}
        for i, r in enumerate(half1_rows[:5])
    ]
    out4 = str(src_dir / "part3")
    spark.createDataFrame(new_rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(out4)
    for f in os.listdir(out4):
        os.utime(os.path.join(out4, f), (1_700_000_003,) * 2)
    K.run_incremental_cms_stream(spark, reg, src(), checkpoint_dir=ckpt)

    extra = cells(K.cms_partial(spark.createDataFrame(new_rows, schema)))
    want = dict(whole)
    for k, v in extra.items():
        want[k] = want.get(k, 0) + v
    assert cells(K.cms_registry_sketch(spark, reg)) == want
