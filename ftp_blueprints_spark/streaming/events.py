"""Streaming slice over the `events` table (SURVEY.md §2B streaming
row; milestone 6): tumbling/sliding/session windows, watermarking,
stateful dedup.

Two layers:

1. **Batch-mode window queries** (driver-checked against DuckDB):
   the exact window semantics — tumbling `window(ts, ...)`, sliding
   windows, `session_window`, keep-first dedup — run as batch
   DataFrames so every result is hash-checkable. These are the same
   expressions Structured Streaming executes incrementally.
2. **Streaming runners** (`stream_*`): the identical plans through
   `readStream` -> `withWatermark` -> windowed agg /
   `dropDuplicatesWithinWatermark` -> memory sink with an
   availableNow trigger. tests/test_streaming.py asserts the
   streaming results equal the batch results — the
   batch/streaming-equivalence contract Structured Streaming
   guarantees for append-able aggregations.

Scale design: windowed aggregations shuffle on (window, keys) with
map-side partial aggregation; watermarks bound state (late rows
beyond the watermark are dropped instead of growing state forever);
session windows use Spark's built-in session merge rather than a
per-user collect. Timestamps are emitted as epoch microseconds
(BIGINT) so hashes are engine- and timezone-neutral.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..plans.registry import query
from ..session import load_table, local_checkpoint

SESSION_GAP = "30 minutes"
SESSION_GAP_US = 30 * 60 * 1_000_000


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


_DSUM_VALUE = "CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)"


@query(
    "ev_tumbling_counts",
    f"""
SELECT epoch_us(time_bucket(INTERVAL '1 hour', ts)) AS window_start,
       event_type,
       COUNT(*) AS n_events,
       {_DSUM_VALUE} AS total_value
FROM events
GROUP BY 1, 2
""",
)
def ev_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows x event_type: the canonical streaming
    aggregation shape (shuffle keyed on (window, type), partial agg
    map-side). Batch execution of the exact streaming expression."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.expr(_DSUM_VALUE).alias("total_value"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@query(
    "ev_sliding_avg",
    """
WITH expanded AS (
  SELECT UNNEST([time_bucket(INTERVAL '1 hour', ts),
                 time_bucket(INTERVAL '1 hour', ts) - INTERVAL '1 hour']) AS w_start,
         value
  FROM events
)
SELECT epoch_us(w_start) AS window_start,
       COUNT(*) AS n_events,
       CAST((SUM(CAST(ROUND(value * 10000) AS BIGINT)) * 100) // COUNT(*)
            AS BIGINT) AS avg_value_micros
FROM expanded GROUP BY 1
""",
)
def ev_sliding_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (2-hour length, 1-hour slide): every event lands
    in exactly two windows. The oracle mirrors the expansion with an
    UNNEST over the two window starts. The average is emitted in exact
    integer micro-units: both engines integer-divide (Spark DIV ==
    DuckDB // — both truncate toward zero, agreeing for any sign; the
    earlier FLOOR((x*100.0)/n) oracle form diverged on negative
    non-divisible sums AND lost exactness past 2^53)."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.expr(
                "(SUM(CAST(ROUND(value * 10000) AS BIGINT)) * 100) DIV COUNT(*)"
            ).alias("avg_value_micros"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start"),
            "n_events",
            "avg_value_micros",
        )
    )


@query(
    "ev_session_windows",
    f"""
WITH flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL '{SESSION_GAP}'
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
numbered AS (
  SELECT *, SUM(new_session) OVER (
      PARTITION BY user_id ORDER BY ts
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
  FROM flagged
)
SELECT user_id,
       epoch_us(MIN(ts)) AS session_start,
       epoch_us(MAX(ts)) + {SESSION_GAP_US} AS session_end,
       COUNT(*) AS n_events
FROM numbered GROUP BY user_id, session_no
""",
)
def ev_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows with a 30-minute gap (session_window —
    Spark merges overlapping per-key sessions; end = last event + gap).
    Oracle rebuilds identical sessions with gaps-and-islands SQL."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.session_window("ts", SESSION_GAP).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("session_start"),
            F.unix_micros(F.col("w.end")).alias("session_end"),
            "n_events",
        )
    )


@query(
    "ev_dedup_first",
    """
SELECT user_id, event_type,
       epoch_us(MIN(ts)) AS first_ts,
       COUNT(*) - 1 AS n_dropped_later
FROM events
GROUP BY user_id, event_type
""",
)
def ev_dedup_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-first dedup by (user_id, event_type) — the deterministic
    batch statement of what dropDuplicatesWithinWatermark computes on
    a stream (state = one row per key within the watermark horizon).
    n_dropped_later is COUNT(*) - 1: one row per key SURVIVES, so a
    key with a single event drops nothing (kept + dropped = total
    reconciles against stream_dedup's kept set)."""
    ev = _events(spark, sf_dir)
    return ev.groupBy("user_id", "event_type").agg(
        F.unix_micros(F.min("ts")).alias("first_ts"),
        (F.count("*") - 1).alias("n_dropped_later"),
    )


# --- Structured Streaming runners ------------------------------------------


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`events` through readStream, normalized to the batch path's rows.

    The fixture's physical ``ts`` encoding has drifted across rounds
    (TIMESTAMP(NANOS) then TIMESTAMP(MICROS)); a streaming source needs
    an explicit schema, so resolve the batch reader's dtype through the
    SHARED policy helper (session.events_ts_dtype — one place to fix
    the next encoding drift) and declare the matching streaming schema:
    NANOS reads as a nanosecond LONG and truncates to microseconds,
    MICROS reads as TIMESTAMP_NTZ and casts to session-zoned TIMESTAMP
    (value-identical under the UTC session).
    """
    from ..session import EVENTS_NS_TO_US, events_ts_dtype

    batch_ts = events_ts_dtype(spark, sf_dir)
    schema = (
        f"event_id bigint, ts {batch_ts}, user_id bigint, "
        "event_type string, value double, props string"
    )
    # streaming file source wants a directory: point at sf_dir and
    # glob-filter to the events file
    raw = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if batch_ts == "bigint":
        return raw.withColumn("ts", F.expr(EVENTS_NS_TO_US))
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def stream_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ev_tumbling_counts as a real stream: watermark + tumbling agg.
    The 1-hour watermark bounds state; with an availableNow trigger and
    complete/append semantics the final result equals the batch query."""
    ev = read_events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.expr(_DSUM_VALUE).alias("total_value"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def stream_sliding_avg(
    spark: SparkSession, sf_dir: str, source: DataFrame | None = None
) -> DataFrame:
    """ev_sliding_avg as a real stream: watermark + sliding (2h/1h)
    windowed aggregation — every event updates exactly two window
    states.  Partial counts/sums merge associatively across
    micro-batches, and the integer micro-unit average is computed only
    at emit time from the merged (sum, count), so a complete-mode drain
    equals the batch query bit-for-bit regardless of how the rows were
    batched — the equivalence test feeds the chronological quartile
    harness to prove windows straddling a batch boundary keep merging."""
    ev = (
        source if source is not None else read_events_stream(spark, sf_dir)
    ).withWatermark("ts", "1 hour")
    return (
        ev.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.expr(
                "(SUM(CAST(ROUND(value * 10000) AS BIGINT)) * 100) DIV COUNT(*)"
            ).alias("avg_value_micros"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start"),
            "n_events",
            "avg_value_micros",
        )
    )


def stream_session_windows(
    spark: SparkSession, sf_dir: str, source: DataFrame | None = None
) -> DataFrame:
    """ev_session_windows as a real stream (stateful session merge).

    ``source`` overrides the default single-file events stream so the
    multi-micro-batch test can feed chronologically split files and
    prove open sessions merge across micro-batch boundaries."""
    ev = (
        source if source is not None else read_events_stream(spark, sf_dir)
    ).withWatermark("ts", "1 hour")
    return (
        ev.groupBy(F.session_window("ts", SESSION_GAP).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("session_start"),
            F.unix_micros(F.col("w.end")).alias("session_end"),
            "n_events",
        )
    )


def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming dedup: one surviving row per
    (user_id, event_type) within the watermark horizon."""
    ev = read_events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    return ev.dropDuplicatesWithinWatermark(["user_id", "event_type"])


# --- custom stateful operator: TTL-renewal dedup ----------------------------
#
# Keep an event iff the last KEPT event of its (user_id, event_type) is
# more than TTL older. Unlike dropDuplicatesWithinWatermark (suppress
# every later duplicate inside the horizon), acceptance here RENEWS the
# suppression window, so which rows survive depends recursively on the
# kept set — not expressible with lag()/windows or portable SQL, which
# is exactly the case applyInPandasWithState exists for. The driver
# entry IS hash-checked — DuckDB's recursive CTE + LATERAL walks the
# per-key kept chain exactly (_EV_TTL_ORACLE below); tests/
# test_streaming.py additionally checks both execution paths.

TTL_DEDUP_TTL_US = 30 * 60 * 1_000_000  # 30 minutes

_TTL_OUT_SCHEMA = "user_id bigint, event_type string, event_id bigint, ts_us bigint"
_TTL_STATE_SCHEMA = "last_kept_us bigint"


def _ttl_scan(ts_us, event_ids, last_kept, ttl_us):
    """Linear keep/renew scan (shared by both execution paths)."""
    kept = []
    for t, eid in zip(ts_us, event_ids):
        if last_kept is None or t - last_kept > ttl_us:
            kept.append((eid, t))
            last_kept = t
    return kept, last_kept


def _ttl_group_scan(pdf_iter, last_kept, ttl_us):
    """One group's keep/renew result from an iterator of Arrow chunks.

    Chunks arrive in ARBITRARY order and split points (the Arrow batch
    size, not any semantic boundary), so the scan must concat the whole
    group and sort once by (ts_us, event_id) — sorting chunks
    independently would judge a later-chunk early event against a kept
    timestamp from its future. The event_id tiebreak mirrors
    ttl_dedup_batch so streaming and batch agree on ts ties."""
    import pandas as pd

    pdf = pd.concat(list(pdf_iter)).sort_values(["ts_us", "event_id"])
    return _ttl_scan(pdf["ts_us"], pdf["event_id"], last_kept, ttl_us)


def ttl_dedup_batch(ev: DataFrame, ttl_us: int = TTL_DEDUP_TTL_US) -> DataFrame:
    """Batch execution: ONE shuffle on the key (repartition by
    (user_id, event_type) + sort within partitions by key, ts) then a
    single mapInPandas pass whose keep/renew state carries across Arrow
    batches inside each partition. A grouped-map applyInPandas computes
    the same thing but pays a per-group pandas round-trip — with many
    small keys that overhead dominates (measured ~9x slower at sf0.1);
    the partition-sorted scan costs per ROW, not per group."""

    def gen(batches):
        import numpy as np

        last_key = None
        last_kept = None
        for pdf in batches:
            uids = pdf["user_id"].to_numpy()
            types = pdf["event_type"].to_numpy()
            ts = pdf["ts_us"].to_numpy()
            keep = np.zeros(len(pdf), dtype=bool)
            for i in range(len(pdf)):
                k = (uids[i], types[i])
                if k != last_key:
                    last_key, last_kept = k, None
                if last_kept is None or ts[i] - last_kept > ttl_us:
                    keep[i] = True
                    last_kept = ts[i]
            yield pdf.loc[keep, ["user_id", "event_type", "event_id", "ts_us"]]

    slim = ev.select(
        "user_id", "event_type", "event_id", F.unix_micros("ts").alias("ts_us")
    )
    ranged = slim.repartition("user_id", "event_type").sortWithinPartitions(
        "user_id", "event_type", "ts_us", "event_id"
    )
    return ranged.mapInPandas(gen, _TTL_OUT_SCHEMA)


_EV_TTL_ORACLE = f"""
WITH RECURSIVE ev AS (
  SELECT user_id, event_type, event_id, epoch_us(ts) AS us,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts, event_id) AS rn
  FROM events
),
keep AS (
  SELECT user_id, event_type, event_id, us FROM ev WHERE rn = 1
  UNION ALL
  SELECT nxt.user_id, nxt.event_type, nxt.event_id, nxt.us
  FROM keep k, LATERAL (
    SELECT e.user_id, e.event_type, e.event_id, e.us
    FROM ev e
    WHERE e.user_id = k.user_id AND e.event_type = k.event_type
      AND e.us > k.us + {TTL_DEDUP_TTL_US}
    ORDER BY e.us, e.event_id LIMIT 1
  ) nxt
)
SELECT user_id, event_type, event_id, us AS ts_us FROM keep
"""


@query("ev_ttl_dedup", _EV_TTL_ORACLE)
def ev_ttl_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TTL-renewal dedup over events (see module comment). The kept set
    is defined recursively (each acceptance renews the suppression
    window), which no window/lag SQL expresses — but DuckDB's recursive
    CTE + LATERAL walks the per-key kept chain exactly: anchor = each
    key's first event, step = the next event more than TTL after the
    last kept one. That turns the custom stateful operator from
    rows-only into a full driver hash-check. The batch scan sorts with
    an event_id tiebreak so ties are deterministic in both engines."""
    return ttl_dedup_batch(_events(spark, sf_dir))


def stream_ttl_dedup(
    spark: SparkSession,
    sf_dir: str,
    ttl_us: int = TTL_DEDUP_TTL_US,
    source: DataFrame | None = None,
) -> DataFrame:
    """Streaming execution via applyInPandasWithState: per-key state is
    the last kept timestamp (bounded: one bigint per live key); the
    event-time timeout retires keys once the watermark passes their
    suppression window, so state never grows with history.

    ``source`` overrides the default single-file events stream — the
    multi-micro-batch integration test feeds chronologically split
    files through maxFilesPerTrigger=1 so per-key state demonstrably
    carries across micro-batches (correct as long as arrival is
    time-ordered per key, which a time-partitioned source guarantees;
    with out-of-order arrival beyond the watermark the streaming kept
    set can diverge from batch, the standard streaming caveat)."""
    import pandas as pd

    def scan(key, pdf_iter, state):
        if state.hasTimedOut:
            state.remove()
            return iter(())
        last = state.get[0] if state.exists else None
        rows, last = _ttl_group_scan(pdf_iter, last, ttl_us)
        if last is not None:
            state.update((int(last),))
            state.setTimeoutTimestamp(int(last) // 1000 + ttl_us // 1000)
        return iter(
            [
                pd.DataFrame(
                    [(key[0], key[1], eid, t) for eid, t in rows],
                    columns=["user_id", "event_type", "event_id", "ts_us"],
                )
            ]
        )

    ev = (
        source if source is not None else read_events_stream(spark, sf_dir)
    ).withWatermark("ts", "1 hour")
    slim = ev.select(
        "user_id", "event_type", "event_id", F.unix_micros("ts").alias("ts_us"), "ts"
    )
    return slim.groupBy("user_id", "event_type").applyInPandasWithState(
        scan,
        outputStructType=_TTL_OUT_SCHEMA,
        stateStructType=_TTL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="EventTimeTimeout",
    )


def run_to_memory(
    stream_df: DataFrame,
    name: str,
    output_mode: str = "complete",
    timeout_s: int = 300,
):
    """Drain a stream into an in-memory table with availableNow (process
    everything, then stop); returns after the query terminates. The
    bounded wait turns a wedged drain into a loud failure instead of
    hanging the caller (and the whole test suite) indefinitely."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise TimeoutError(
            f"stream '{name}' did not drain within {timeout_s}s"
        )
    return q


FUNNEL_CLICK_WINDOW_US = 30 * 60 * 1_000_000  # view -> click within 30 min
FUNNEL_BUY_WINDOW_US = 24 * 3600 * 1_000_000  # click -> purchase within 24 h


@query(
    "ev_funnel",
    f"""
WITH v AS (
  SELECT user_id, MIN(epoch_us(ts)) AS t_view
  FROM events WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, MIN(epoch_us(e.ts)) AS t_click
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click'
    AND epoch_us(e.ts) > v.t_view
    AND epoch_us(e.ts) <= v.t_view + {FUNNEL_CLICK_WINDOW_US}
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, MIN(epoch_us(e.ts)) AS t_buy
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase'
    AND epoch_us(e.ts) > c.t_click
    AND epoch_us(e.ts) <= c.t_click + {FUNNEL_BUY_WINDOW_US}
  GROUP BY e.user_id
)
SELECT (SELECT COUNT(*) FROM v) AS n_viewed,
       (SELECT COUNT(*) FROM c) AS n_clicked,
       (SELECT COUNT(*) FROM p) AS n_purchased
""",
)
def ev_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (view -> click within 30 min -> purchase within
    24 h): per-stage min-timestamp chaining, every step an equi-join +
    agg keyed on user_id — at 100 TB each stage shuffles once on the
    same key, so the exchanges line up; no window over the full event
    stream is needed."""
    ev = _events(spark, sf_dir).select(
        "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    v = ev.filter(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("us").alias("t_view")
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(
            (F.col("us") > F.col("t_view"))
            & (F.col("us") <= F.col("t_view") + FUNNEL_CLICK_WINDOW_US)
        )
        .groupBy("user_id")
        .agg(F.min("us").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(
            (F.col("us") > F.col("t_click"))
            & (F.col("us") <= F.col("t_click") + FUNNEL_BUY_WINDOW_US)
        )
        .groupBy("user_id")
        .agg(F.min("us").alias("t_buy"))
    )
    return (
        v.agg(F.count("*").alias("n_viewed"))
        .crossJoin(c.agg(F.count("*").alias("n_clicked")))
        .crossJoin(p.agg(F.count("*").alias("n_purchased")))
    )


_FUNNEL_STATE_SCHEMA = "t_view long, t_click long, t_buy long, n_seen long"
_FUNNEL_OUT_SCHEMA = (
    "user_id long, n_seen long, t_view long, t_click long, t_buy long"
)


def stream_funnel(
    spark: SparkSession, sf_dir: str, source: DataFrame | None = None
) -> DataFrame:
    """Streaming twin of ev_funnel via applyInPandasWithState: per-user
    state is the funnel triple (first view; first qualifying click;
    first qualifying purchase — -1 = not reached) plus an event counter
    that versions the emitted snapshots.  Each micro-batch emits one
    snapshot row per ACTIVE user (update semantics); the test keeps the
    max-n_seen row per user and aggregates the stage counts, which must
    equal the batch query's single row.

    Equivalence argument: the batch stages chain MIN timestamps
    (first view -> first click in (t_view, t_view+30m] -> first
    purchase in (t_click, t_click+24h]), and a chronological sequential
    scan latches exactly those firsts — so streaming equals batch
    whenever per-user arrival is time-ordered (the chrono-split
    harness; the standard CDC/event-log delivery contract).  State is
    three bigints + a counter per live user — bounded."""
    import pandas as pd

    def scan(key, pdf_iter, state):
        if state.hasTimedOut:  # NoTimeout: never fires; loud if it did
            state.remove()
            return iter(())
        t_view, t_click, t_buy, n = (
            state.get if state.exists else (-1, -1, -1, 0)
        )
        pdf = pd.concat(list(pdf_iter)).sort_values(["ts_us", "event_id"])
        for et, ts in zip(pdf["event_type"], pdf["ts_us"]):
            n += 1
            ts = int(ts)
            if et == "view":
                if t_view < 0:
                    t_view = ts
            elif et == "click":
                if (
                    t_view >= 0
                    and t_click < 0
                    and t_view < ts <= t_view + FUNNEL_CLICK_WINDOW_US
                ):
                    t_click = ts
            elif et == "purchase":
                if (
                    t_click >= 0
                    and t_buy < 0
                    and t_click < ts <= t_click + FUNNEL_BUY_WINDOW_US
                ):
                    t_buy = ts
        state.update((int(t_view), int(t_click), int(t_buy), int(n)))
        return iter(
            [
                pd.DataFrame(
                    [(key[0], n, t_view, t_click, t_buy)],
                    columns=["user_id", "n_seen", "t_view", "t_click", "t_buy"],
                )
            ]
        )

    ev = source if source is not None else read_events_stream(spark, sf_dir)
    slim = ev.select(
        "user_id", "event_type", "event_id", F.unix_micros("ts").alias("ts_us")
    )
    return slim.groupBy("user_id").applyInPandasWithState(
        scan,
        outputStructType=_FUNNEL_OUT_SCHEMA,
        stateStructType=_FUNNEL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf="NoTimeout",
    )


# --- stream-stream interval join -------------------------------------------

ATTRIB_WINDOW_US = 6 * 3600 * 1_000_000  # view -> click attribution horizon


@query(
    "ev_view_click_join",
    f"""
SELECT v.event_id AS view_id,
       c.event_id AS click_id,
       v.user_id,
       epoch_us(v.ts) AS view_us,
       epoch_us(c.ts) AS click_us,
       epoch_us(c.ts) - epoch_us(v.ts) AS delay_us
FROM events v JOIN events c
  ON v.user_id = c.user_id
 AND c.ts >= v.ts
 AND epoch_us(c.ts) <= epoch_us(v.ts) + {ATTRIB_WINDOW_US}
WHERE v.event_type = 'view' AND c.event_type = 'click'
""",
)
def ev_view_click_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time interval join (click attribution): every click within
    6 h after a view by the same user. Batch twin of the stream-stream
    join in stream_view_click_join — the same plan Structured Streaming
    runs incrementally with watermark-bounded state. The equi-key
    (user_id) makes this a hash join with the time range as a post-join
    filter: ONE shuffle of each side keyed on user_id, never a
    cartesian — at 100 TB the range predicate costs nothing extra
    because rows already meet co-partitioned on the join key."""
    ev = _events(spark, sf_dir)
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        "user_id",
        F.unix_micros("ts").alias("view_us"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user_id"),
        F.unix_micros("ts").alias("click_us"),
    )
    return (
        v.join(
            c,
            (F.col("user_id") == F.col("c_user_id"))
            & (F.col("click_us") >= F.col("view_us"))
            & (F.col("click_us") <= F.col("view_us") + ATTRIB_WINDOW_US),
        )
        .select(
            "view_id",
            "click_id",
            "user_id",
            "view_us",
            "click_us",
            (F.col("click_us") - F.col("view_us")).alias("delay_us"),
        )
    )


def stream_view_click_join(
    spark: SparkSession, sf_dir: str, source: DataFrame | None = None
) -> DataFrame:
    """ev_view_click_join as a real stream-stream inner join: both
    sides through readStream with event-time watermarks; the join
    condition carries the time bound, so Spark keeps only 7 h of
    per-key state on each side (watermark + interval) instead of the
    whole history — the canonical watermarked interval-join pattern.

    ``source`` overrides the default single-file events stream so the
    multi-micro-batch test can prove buffered join state matches
    across micro-batch boundaries (a view arriving batches before its
    click must still pair)."""
    ev = source if source is not None else read_events_stream(spark, sf_dir)
    v = (
        ev.filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            "user_id",
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", "1 hour")
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    return v.join(
        c,
        # horizon derived from ATTRIB_WINDOW_US — a hardcoded interval
        # here silently forked from the batch twin's constant on tuning
        F.expr(
            "user_id = c_user_id AND click_ts >= view_ts "
            f"AND click_ts <= view_ts + interval {ATTRIB_WINDOW_US} microseconds"
        ),
    ).select(
        "view_id",
        "click_id",
        "user_id",
        F.unix_micros("view_ts").alias("view_us"),
        F.unix_micros("click_ts").alias("click_us"),
        (F.unix_micros("click_ts") - F.unix_micros("view_ts")).alias("delay_us"),
    )


_WEEK_US = 7 * 86400 * 1_000_000


@query(
    "ev_cohort_retention",
    f"""
WITH wk AS (
  SELECT user_id, epoch_us(ts) // {_WEEK_US} AS w FROM events
),
first_seen AS (
  SELECT user_id, MIN(w) AS cohort_w FROM wk GROUP BY user_id
),
activity AS (
  SELECT DISTINCT e.user_id, f.cohort_w, e.w - f.cohort_w AS week_offset
  FROM wk e JOIN first_seen f ON e.user_id = f.user_id
)
SELECT cohort_w * {_WEEK_US} AS cohort_week_us, week_offset,
       COUNT(*) AS n_active_users
FROM activity GROUP BY 1, 2
""",
)
def ev_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-seen week, counted in
    each later activity week — the product-analytics staple. Weeks are
    integer epoch-microsecond buckets (Spark's tumbling window aligns
    to 1970, DuckDB's time_bucket to 2000-01-03 — portable arithmetic
    sidesteps both origins). Shuffles: first-seen agg and the activity
    join share the user_id key (one exchange reused), then the tiny
    (cohort, offset) agg."""
    ev = _events(spark, sf_dir)
    wk = ev.select("user_id", F.expr(f"unix_micros(ts) DIV {_WEEK_US}").alias("w"))
    first_seen = wk.groupBy("user_id").agg(F.min("w").alias("cohort_w"))
    activity = (
        wk.join(first_seen, "user_id")
        .select(
            "user_id", "cohort_w", (F.col("w") - F.col("cohort_w")).alias("week_offset")
        )
        .distinct()
    )
    return activity.groupBy(
        (F.col("cohort_w") * _WEEK_US).alias("cohort_week_us"), "week_offset"
    ).agg(F.count("*").alias("n_active_users"))


# --- watermark late-data accounting -----------------------------------------

LATE_BATCH_N = 1000  # micro-batch model: events per batch in arrival order
LATE_DELAY_US = 10 * 60 * 1_000_000  # withWatermark("ts", "10 minutes")


@query(
    "ev_late_data",
    f"""
WITH ev AS (
  SELECT event_id, event_type, epoch_us(ts) AS ts_us,
         event_id // {LATE_BATCH_N} AS batch_id
  FROM events
),
bmax AS (
  SELECT batch_id, MAX(ts_us) AS bmax FROM ev GROUP BY batch_id
),
wm AS (
  -- (x // 1000) * 1000: EventTimeWatermarkExec collects max event time
  -- in MILLISECONDS, so the real engine's watermark is ms-truncated
  SELECT batch_id,
         (MAX(bmax) OVER (ORDER BY batch_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
          // 1000) * 1000 - {LATE_DELAY_US} AS wm_us
  FROM bmax
),
flagged AS (
  SELECT e.event_type, e.ts_us, w.wm_us,
         (w.wm_us IS NOT NULL AND e.ts_us < w.wm_us) AS late
  FROM ev e JOIN wm w USING (batch_id)
)
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CASE WHEN late THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
       MAX(CASE WHEN late THEN wm_us - ts_us END) AS max_lateness_us
FROM flagged GROUP BY event_type
""",
)
def ev_late_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark late-data accounting: how many events would a
    10-minute watermark drop, per event_type? Models Structured
    Streaming's actual contract — the watermark advances BETWEEN
    micro-batches (batch b's rows are filtered against the max event
    time seen through batch b-1, minus the delay;
    `numRowsDroppedByWatermark` is the metric this query makes
    queryable). Arrival order is event_id; batches are LATE_BATCH_N
    events each. The running max is millisecond-truncated before the
    delay is subtracted because EventTimeWatermarkExec collects event
    time stats in ms — so the model is bit-exact against the real
    engine (tests/test_streaming.py proves it on a live readStream
    query's numRowsDroppedByWatermark).

    Scale shape: per-batch max is a map-side-combinable agg (corpus
    touched once, narrow projection); the running max runs over the
    1000x-smaller batch-summary table (the only ordered scan, same
    two-pass prefix pattern as tx_pack_sequences — at extreme scale it
    shards into per-range prefix maxes); the flag join broadcasts the
    tiny watermark table back onto events, so events never shuffle at
    all. Final agg is over event_type — map-side combinable."""
    ev = _events(spark, sf_dir).select(
        "event_id",
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
        # integer floor-division, mirroring the oracle's `event_id // N`
        # exactly (float division + cast is exact at these magnitudes but
        # a needless float surface in an otherwise integer model)
        F.expr(f"event_id DIV {LATE_BATCH_N}").alias("batch_id"),
    )
    bmax = ev.groupBy("batch_id").agg(F.max("ts_us").alias("bmax"))
    w = Window.orderBy("batch_id").rowsBetween(Window.unboundedPreceding, -1)
    run_max = F.max("bmax").over(w)
    wm = bmax.select(
        "batch_id",
        (run_max - run_max % 1000 - LATE_DELAY_US).alias("wm_us"),
    )
    flagged = ev.join(F.broadcast(wm), "batch_id").select(
        "event_type",
        "ts_us",
        "wm_us",
        (F.col("wm_us").isNotNull() & (F.col("ts_us") < F.col("wm_us"))).alias(
            "late"
        ),
    )
    return flagged.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(F.when(F.col("late"), 1).otherwise(0)).cast("bigint").alias("n_late"),
        F.max(F.when(F.col("late"), F.col("wm_us") - F.col("ts_us"))).alias(
            "max_lateness_us"
        ),
    )


# --- gap-filled hourly resample ---------------------------------------------

_HOUR_US = 3_600_000_000


@query(
    "ev_gap_fill",
    f"""
WITH ev AS (
  SELECT event_type, epoch_us(time_bucket(INTERVAL '1 hour', ts)) AS h
  FROM events
),
counts AS (
  SELECT event_type, h, COUNT(*) AS n FROM ev GROUP BY event_type, h
),
bounds AS (SELECT MIN(h) AS lo, MAX(h) AS hi FROM ev),
types AS (SELECT DISTINCT event_type FROM ev),
spine AS (
  SELECT t.event_type, UNNEST(range(b.lo, b.hi + {_HOUR_US}, {_HOUR_US})) AS h
  FROM types t CROSS JOIN bounds b
)
SELECT s.event_type, s.h AS window_start,
       CAST(COALESCE(c.n, 0) AS BIGINT) AS n_events
FROM spine s
LEFT JOIN counts c ON c.event_type = s.event_type AND c.h = s.h
""",
)
def ev_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly resample: every (event_type, hour) bucket
    between the corpus min and max hour, zero-filled where no events
    landed — the densify/resample primitive dashboards and downstream
    window models (which assume regular spacing) need; plain windowed
    counts silently skip empty buckets.

    Scale shape: the corpus-sized work is one map-side-combinable
    (type, hour) count; the spine is generated (sequence + explode)
    from a 1-row bounds agg crossed with the distinct-type table —
    types x hours rows, orders of magnitude smaller than events — and
    the fill is a left join of that small spine against the
    already-aggregated counts (broadcast-able at any corpus size since
    both sides are bucket-cardinality, never event-cardinality)."""
    ev = _events(spark, sf_dir).select(
        "event_type",
        # True FLOOR to the hour via pmod (always-nonnegative modulus):
        # the oracle's time_bucket floors, but Spark's DIV TRUNCATES
        # toward zero, which for a pre-1970 (negative-µs) timestamp
        # lands one bucket high; us - pmod(us, h) floors for any sign.
        F.expr(f"unix_micros(ts) - pmod(unix_micros(ts), {_HOUR_US})").alias(
            "h"
        ),
    )
    counts = ev.groupBy("event_type", "h").agg(F.count("*").alias("n"))
    # bounds/types derive from the already-aggregated counts (bucket
    # cardinality), not from ev — reading them off the raw stream cost
    # two EXTRA full corpus scans (3 FileScans in the physical plan)
    counts = counts.transform(local_checkpoint)
    bounds = counts.agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
    types = counts.select("event_type").distinct()
    spine = types.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        F.explode(
            F.sequence(F.col("lo"), F.col("hi"), F.lit(_HOUR_US).cast("bigint"))
        ).alias("h"),
    )
    return spine.join(counts, ["event_type", "h"], "left").select(
        "event_type",
        F.col("h").alias("window_start"),
        F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n_events"),
    )


# --- CDC log compaction (keep-latest + tombstones) --------------------------


@query(
    "ev_cdc_compact",
    """
WITH ordered AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us,
         CAST(ROUND(value * 10000) AS BIGINT) AS value_cu,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn,
         COUNT(*) OVER (PARTITION BY user_id) AS n_changes
  FROM events
)
SELECT user_id, CAST(n_changes AS BIGINT) AS n_changes,
       event_type AS last_type, ts_us AS last_ts_us, value_cu AS last_value_cu
FROM ordered WHERE rn = 1 AND event_type <> 'error'
""",
)
def ev_cdc_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC log compaction: treat events as a change log keyed by
    user_id (event_id = commit order), keep only each key's LATEST
    change, and drop keys whose latest change is a tombstone
    ('error' here) — the merge/compaction step every incremental
    ingest pipeline (Hudi/Delta-style upsert semantics) runs.

    Scale shape: implemented as groupBy(user_id) + max_by(state,
    event_id), which partial-aggregates MAP-SIDE — each partition
    collapses to one candidate row per key before the single shuffle,
    so the exchange carries O(keys), not O(changes). (The oracle's
    window formulation is the semantic twin; a window would shuffle
    every change row.) Tombstone filtering happens after the agg on
    key-cardinality rows."""
    ev = _events(spark, sf_dir).select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
        F.round(F.col("value") * 10_000).cast("bigint").alias("value_cu"),
    )
    last = ev.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n_changes"),
        F.max_by(
            F.struct("event_type", "ts_us", "value_cu"), F.col("event_id")
        ).alias("s"),
    )
    return last.filter(F.col("s.event_type") != "error").select(
        "user_id",
        "n_changes",
        F.col("s.event_type").alias("last_type"),
        F.col("s.ts_us").alias("last_ts_us"),
        F.col("s.value_cu").alias("last_value_cu"),
    )


_CDC_STATE_SCHEMA = (
    "n_changes long, last_eid long, last_type string, last_ts_us long, "
    "last_value_cu long"
)
_CDC_OUT_SCHEMA = (
    "user_id long, n_changes long, last_type string, last_ts_us long, "
    "last_value_cu long"
)


def stream_cdc_compact(
    spark: SparkSession, sf_dir: str, source: DataFrame | None = None
) -> DataFrame:
    """Streaming twin of ev_cdc_compact (incremental Hudi/Delta-style
    upsert compaction): per-key state is the change count plus the
    max-event_id change seen so far; every micro-batch emits the
    compacted snapshot for keys it touched (update semantics — exactly
    what a MERGE INTO target table would hold after that batch).
    Tombstoned keys (latest change = 'error') still emit snapshots so
    a downstream DELETE can act on them; the drained-output test
    filters them like the batch plan does.

    Equivalence argument: max_by(event_id) is order-insensitive WITHIN
    a batch and max-combines across batches, so unlike the SCD2 fold
    this twin is correct under ANY per-key arrival order — the state
    merge is commutative.  The test still drives the chrono harness so
    the snapshots demonstrably accumulate across micro-batches."""
    import pandas as pd

    cols = ["user_id", "n_changes", "last_type", "last_ts_us", "last_value_cu"]

    def scan(key, pdf_iter, state):
        if state.hasTimedOut:
            state.remove()
            return iter(())
        n, eid, typ, ts, val = (
            state.get if state.exists else (0, -1, "", -1, 0)
        )
        for pdf in pdf_iter:
            n += len(pdf)
            j = pdf["event_id"].idxmax()
            if int(pdf["event_id"][j]) > eid:
                eid = int(pdf["event_id"][j])
                typ = str(pdf["event_type"][j])
                ts = int(pdf["ts_us"][j])
                val = int(pdf["value_cu"][j])
        state.update((int(n), int(eid), typ, int(ts), int(val)))
        return iter(
            [pd.DataFrame([(key[0], n, typ, ts, val)], columns=cols)]
        )

    ev = source if source is not None else read_events_stream(spark, sf_dir)
    slim = ev.select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
        F.round(F.col("value") * 10_000).cast("bigint").alias("value_cu"),
    )
    return slim.groupBy("user_id").applyInPandasWithState(
        scan,
        outputStructType=_CDC_OUT_SCHEMA,
        stateStructType=_CDC_STATE_SCHEMA,
        outputMode="update",
        timeoutConf="NoTimeout",
    )


# --- forward fill (last observation carried forward) ------------------------


@query(
    "ev_fill_forward",
    """
SELECT event_id, user_id,
       LAST_VALUE(CASE WHEN event_type = 'purchase'
                       THEN CAST(ROUND(value * 10000) AS BIGINT) END
                  IGNORE NULLS)
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS last_purchase_cu
FROM events
""",
)
def ev_fill_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward fill (LOCF): carry each user's last observed purchase
    amount forward onto every subsequent event — the standard
    time-series densify step before feature extraction, where most
    rows have no fresh observation. NULL until the user's first
    purchase, exactly as LOCF defines.

    Scale shape: one exchange keyed on user_id, one running
    last-non-null frame per key (Spark's last(ignorenulls) over an
    UNBOUNDED PRECEDING row frame is an O(1)-per-row running
    accumulator, not a per-row rescan). Amounts are integer cents x100
    so the fill is exactly engine-portable."""
    ev = _events(spark, sf_dir)
    sampled = F.when(
        F.col("event_type") == "purchase",
        F.round(F.col("value") * 10_000).cast("bigint"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.last(sampled, ignorenulls=True).over(w).alias("last_purchase_cu"),
    )


# --- robust outlier detection (median / MAD) --------------------------------

MAD_K = 5  # Hampel-style threshold: |v - median| > MAD_K * MAD

# Value-range buckets per group for the distributed rank-pick: caps the
# rows any single window task must sort at ~n/1024 (vs n for a whole-
# group window) and bounds both driver collects at groups x 1025 rows.
_RANK_PICK_BUCKETS = 1024


def rank_picks(
    df: DataFrame,
    group_col: str,
    val_col: str,
    id_col: str,
    targets: dict,
    stats: dict | None = None,
) -> list:
    """Pick, per group, the element at one or more GLOBAL ranks under
    the deterministic order (val, id) — distributed, without ever
    sorting a whole group in one task.

    ``targets`` maps an output label to ``fn(n) -> rank`` (1-based,
    exact integer arithmetic so it reproduces the oracle's CEIL).
    Returns one row per (group, label): (group_col, ``_which`` label,
    val_col).

    This is the bucketed two-pass prefix rank proven in
    tx_quality_topp (plans/text_queries.py), specialized to rank
    SELECTION: a `row_number().over(partitionBy(group))` rank-pick is
    correct but funnels each group's FULL row set through one task's
    sort — with ~5 event types that serializes n/5 rows per task, the
    worst measured 100x exponent in SCALEPROBE r6 (0.616).  Instead:

    1. per-group min/max (map-side-combinable agg; collect is
       group-cardinality) fixes 1024 equal integer value buckets;
    2. per-(group, bucket) counts (same shape; collect is bounded by
       groups x 1025 regardless of n) prefix-sum on the driver to
       locate, for each target rank r, the ONE bucket holding it and
       the local rank r - offset;
    3. a row_number window over (group, bucket, label) — each
       partition is ~n/1024 rows — picks that local rank.

    Bucketing by value preserves the (val, id) order across buckets
    (equal values share a bucket), so bucket-local rank + driver
    offset IS the global rank and the picked element is identical to
    the single-window formulation (oracles unchanged).

    The picked rows come back as a driver-side list of (group, label,
    value) tuples (group x target cardinality — a constant-bounded
    collect, same policy as the centroid collects): callers broadcast
    a literal DataFrame built from them, so the plans that CONSUME a
    median/bound never re-execute the rank-pick passes, and a chained
    pick (MAD's deviation median over ``values ⋈ value-median``)
    scans the base table instead of recursively re-running the first
    pick's window.

    ``stats`` optionally supplies {group: (vmin, vmax)} when the
    caller already knows the value range analytically (MAD's
    deviations span [0, max(med-vmin, vmax-med)]) — skipping the
    min/max job.  A conservative over-wide range only coarsens the
    buckets, never changes the picked element.  Callers should
    localCheckpoint ``df`` first: each pass then reads cached blocks
    instead of re-running the upstream scan."""
    if stats is None:
        stats = {}
        for r in df.groupBy(group_col).agg(
            F.min(val_col).alias("_vmin"), F.max(val_col).alias("_vmax")
        ).collect():
            # NULL group guard: the create_map literal lookup below
            # cannot represent a NULL key — a null group would be
            # silently dropped from the median/bound joins, diverging
            # from the window formulation and the DuckDB oracle (both
            # treat NULL as a group).  Fail loudly instead; callers
            # with nullable group columns must coalesce to a sentinel
            # first.  Costs nothing: this rides the min/max collect
            # that already runs.
            if r[group_col] is None:
                raise ValueError(
                    f"rank_picks: NULL in group column {group_col!r}; "
                    "coalesce to a sentinel before calling"
                )
            stats[r[group_col]] = (int(r["_vmin"]), int(r["_vmax"]))
    if not stats:
        return []
    if None in stats:
        raise ValueError(
            f"rank_picks: NULL group key in supplied stats for {group_col!r}"
        )
    widths = {
        g: (vmin, (vmax - vmin) // _RANK_PICK_BUCKETS + 1)
        for g, (vmin, vmax) in stats.items()
    }
    # group-keyed constants ride as ONE map literal inside the
    # projection (ivf_assign's literal-vs-join pattern): a broadcast
    # join of a 5-row table costs a build job + exchange per pass,
    # which at sf0.1 is the dominant cost of the whole operator.
    # group_map is total over the groups present in df by
    # construction (stats covers them), so no null branch is needed.
    def group_map(vals: dict) -> "F.Column":
        args = []
        for g, v in vals.items():
            args.extend((F.lit(g), F.lit(int(v))))
        return F.create_map(*args)[F.col(group_col)].cast("bigint")

    b = (
        df.withColumn("_vmin", group_map({g: w[0] for g, w in widths.items()}))
        .withColumn("_w", group_map({g: w[1] for g, w in widths.items()}))
        .withColumn("_b", F.expr(f"({val_col} - _vmin) DIV _w"))
    )
    cnts = b.groupBy(group_col, "_b").count().collect()
    per: dict = {}
    for r in cnts:
        per.setdefault(r[group_col], []).append((int(r["_b"]), int(r["count"])))
    picks: dict = {}  # which -> {group: (bucket, local_rank)}
    for g, lst in per.items():
        lst.sort()
        n = sum(c for _, c in lst)
        for which, fn in targets.items():
            rank = fn(n)
            off = 0
            for bb, c in lst:
                if off + c >= rank:
                    picks.setdefault(which, {})[g] = (bb, rank - off)
                    break
                off += c
    # one pass over the target buckets only: prune with the bucket
    # maps, rank within (group, bucket) — each window partition holds
    # ~n/1024 rows — then label rows whose local rank matches a target
    # (a row can satisfy several labels when ranks coincide).
    conds = {}
    for which, bygroup in picks.items():
        b_map = group_map({g: t[0] for g, t in bygroup.items()})
        rn_map = group_map({g: t[1] for g, t in bygroup.items()})
        conds[which] = (F.col("_b") == b_map, F.col("_lrn") == rn_map)
    in_target = None
    for bucket_cond, _ in conds.values():
        in_target = bucket_cond if in_target is None else (in_target | bucket_cond)
    w = Window.partitionBy(group_col, "_b").orderBy(F.asc(val_col), F.asc(id_col))
    labels = F.array_compact(
        F.array(
            *[
                F.when(bc & rc, F.lit(which))
                for which, (bc, rc) in conds.items()
            ]
        )
    )
    picked = (
        b.filter(in_target)
        .withColumn("_lrn", F.row_number().over(w))
        .select(group_col, F.explode(labels).alias("_which"), val_col)
        .collect()
    )
    return [(r[group_col], r["_which"], int(r[val_col])) for r in picked]


@query(
    "ev_mad_outliers",
    f"""
WITH cents AS (
  SELECT event_id, event_type,
         CAST(ROUND(value * 10000) AS BIGINT) AS v_cu
  FROM events
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                               ORDER BY v_cu, event_id) AS rn,
            COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM cents
),
med AS (
  SELECT event_type, v_cu AS med_cu FROM ranked
  WHERE rn = CAST(CEIL(n / 2.0) AS BIGINT)
),
dev AS (
  SELECT c.event_id, c.event_type, c.v_cu, ABS(c.v_cu - m.med_cu) AS d_cu,
         m.med_cu
  FROM cents c JOIN med m USING (event_type)
),
dranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                               ORDER BY d_cu, event_id) AS rn,
            COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM dev
),
mad AS (
  SELECT event_type, d_cu AS mad_cu FROM dranked
  WHERE rn = CAST(CEIL(n / 2.0) AS BIGINT)
)
SELECT d.event_id, d.event_type, d.v_cu, d.med_cu, a.mad_cu,
       d.d_cu > {MAD_K} * a.mad_cu AS is_outlier
FROM dev d JOIN mad a USING (event_type)
""",
)
def ev_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection (Hampel rule): flag values more than
    MAD_K median-absolute-deviations from their group median — the
    data-cleaning filter that, unlike mean/stddev z-scores, is not
    itself corrupted by the outliers it hunts.

    Exact-integer all the way: values in integer cents x100, medians
    are LOWER medians (the rank-ceil(n/2) element under a
    deterministic (value, event_id) order), so both engines pick the
    identical element — no interpolated-median float divergence.

    Scale shape (r7 rewrite, VERDICT r6 task 2): two rank-pick passes
    (value median, then deviation median), each through the bucketed
    prefix rank of ``rank_picks`` — the r6 formulation's
    `row_number().over(partitionBy(event_type))` was correct but
    serialized each group's full sort in one task (worst measured 100x
    exponent, 0.616).  Now every window partition holds ~n/1024 rows;
    the median rows stay group-cardinality and broadcast back onto
    events for the flag join."""
    # one materialization of the projected stream; every rank-pick pass
    # (and the final flag join) reads the cached blocks instead of
    # re-running the parquet scan + projection per job
    cents = _events(spark, sf_dir).select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 10_000).cast("bigint").alias("v_cu"),
    ).transform(local_checkpoint, eager=False)
    spark = cents.sparkSession

    # ceil(n/2) in exact integer arithmetic = the oracle's
    # CEIL(n / 2.0) (n/2.0 is exact in double for any corpus n)
    lower = {"m": lambda n: (n + 1) // 2}
    stats = {
        r["event_type"]: (int(r["_vmin"]), int(r["_vmax"]))
        for r in cents.groupBy("event_type")
        .agg(F.min("v_cu").alias("_vmin"), F.max("v_cu").alias("_vmax"))
        .collect()
    }
    med_rows = rank_picks(cents, "event_type", "v_cu", "event_id", lower, stats)
    med_val = {g: v for g, _, v in med_rows}
    med = spark.createDataFrame(
        [(g, v) for g, v in med_val.items()], "event_type string, med_cu bigint"
    )
    dev = cents.join(F.broadcast(med), "event_type").select(
        "event_id",
        "event_type",
        "v_cu",
        "med_cu",
        F.abs(F.col("v_cu") - F.col("med_cu")).alias("d_cu"),
    )
    # deviation range is known analytically from the value range + the
    # median — no second min/max job
    dev_stats = {
        g: (0, max(med_val[g] - vmin, vmax - med_val[g]))
        for g, (vmin, vmax) in stats.items()
    }
    mad_rows = rank_picks(dev, "event_type", "d_cu", "event_id", lower, dev_stats)
    mad = spark.createDataFrame(
        [(g, v) for g, _, v in mad_rows], "event_type string, mad_cu bigint"
    )
    return dev.join(F.broadcast(mad), "event_type").select(
        "event_id",
        "event_type",
        "v_cu",
        "med_cu",
        "mad_cu",
        (F.col("d_cu") > MAD_K * F.col("mad_cu")).alias("is_outlier"),
    )


# --- rate-spike anomaly detection -------------------------------------------

SPIKE_TRAIL_H = 24  # trailing baseline window (hours)
SPIKE_FACTOR = 3  # spike iff count > FACTOR x trailing hourly mean


@query(
    "ev_rate_spike",
    f"""
WITH ev AS (
  SELECT event_type, epoch_us(time_bucket(INTERVAL '1 hour', ts)) AS h
  FROM events
),
counts AS (
  SELECT event_type, h, COUNT(*) AS n FROM ev GROUP BY event_type, h
),
bounds AS (SELECT MIN(h) AS lo, MAX(h) AS hi FROM ev),
types AS (SELECT DISTINCT event_type FROM ev),
spine AS (
  SELECT t.event_type, UNNEST(range(b.lo, b.hi + {_HOUR_US}, {_HOUR_US})) AS h
  FROM types t CROSS JOIN bounds b
),
dense AS (
  SELECT s.event_type, s.h, CAST(COALESCE(c.n, 0) AS BIGINT) AS n
  FROM spine s
  LEFT JOIN counts c ON c.event_type = s.event_type AND c.h = s.h
),
trailed AS (
  SELECT event_type, h, n,
         SUM(n) OVER w AS trail_sum,
         COUNT(*) OVER w AS trail_n
  FROM dense
  WINDOW w AS (PARTITION BY event_type ORDER BY h
               ROWS BETWEEN {SPIKE_TRAIL_H} PRECEDING AND 1 PRECEDING)
)
SELECT event_type, h AS window_start, n AS n_events,
       CAST(trail_sum AS BIGINT) AS trail_sum,
       (trail_n = {SPIKE_TRAIL_H}
        AND n * {SPIKE_TRAIL_H} > {SPIKE_FACTOR} * trail_sum) AS is_spike
FROM trailed
""",
)
def ev_rate_spike(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rate-spike anomaly detection: flag hours where an event type's
    count exceeds SPIKE_FACTOR x its own trailing-24h hourly mean —
    the alerting primitive over operational event streams. The mean
    compare is an integer cross-multiply (n * 24 > 3 * trail_sum), so
    no division and no float surface; hours with an incomplete
    baseline (first day per type) are never flagged.

    Scale shape: composes the gap-fill spine (dense hourly series is
    what makes a ROWS window a true time window — missing hours would
    silently stretch the baseline) with one bucket-cardinality window
    per type. Event rows aggregate map-side to (type, hour) counts
    before any window; the windowed table is hours x types, orders of
    magnitude smaller than the stream."""
    dense = ev_gap_fill(spark, sf_dir).select(
        "event_type", F.col("window_start").alias("h"), F.col("n_events").alias("n")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(-SPIKE_TRAIL_H, -1)
    )
    trailed = dense.select(
        "event_type",
        "h",
        "n",
        F.sum("n").over(w).alias("trail_sum"),
        F.count("*").over(w).alias("trail_n"),
    )
    return trailed.select(
        "event_type",
        F.col("h").alias("window_start"),
        F.col("n").alias("n_events"),
        F.col("trail_sum").cast("bigint").alias("trail_sum"),
        (
            (F.col("trail_n") == SPIKE_TRAIL_H)
            & (F.col("n") * SPIKE_TRAIL_H > SPIKE_FACTOR * F.col("trail_sum"))
        ).alias("is_spike"),
    )


# --- winsorization (percentile clipping) ------------------------------------

WINSOR_LO = 0.05
WINSOR_HI = 0.95


@query(
    "ev_winsorize",
    f"""
WITH cents AS (
  SELECT event_id, event_type,
         CAST(ROUND(value * 10000) AS BIGINT) AS v_cu
  FROM events
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                               ORDER BY v_cu, event_id) AS rn,
            COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM cents
),
lo AS (
  SELECT event_type, v_cu AS lo_cu FROM ranked
  WHERE rn = GREATEST(1, CAST(CEIL(n * {WINSOR_LO}) AS BIGINT))
),
hi AS (
  SELECT event_type, v_cu AS hi_cu FROM ranked
  WHERE rn = CAST(CEIL(n * {WINSOR_HI}) AS BIGINT)
)
SELECT c.event_id, c.event_type, c.v_cu,
       GREATEST(l.lo_cu, LEAST(h.hi_cu, c.v_cu)) AS clipped_cu,
       (c.v_cu < l.lo_cu OR c.v_cu > h.hi_cu) AS was_clipped
FROM cents c
JOIN lo l USING (event_type)
JOIN hi h USING (event_type)
""",
)
def ev_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization: clip each group's values into its own
    [p5, p95] band — the tail-taming normalization step feature
    pipelines run before scaling, complementing ev_mad_outliers
    (which flags; this repairs). Bounds are DISCRETE rank-picked
    elements (row rank ceil(n*p) under a deterministic order), so both
    engines select the identical integer-cents element — no
    interpolated-percentile float surface.

    Scale shape (r7 rewrite, VERDICT r6 task 2): BOTH bound ranks come
    out of one bucketed prefix-rank pass (``rank_picks`` — window
    partitions of ~n/1024 rows instead of one whole-group sort per
    event_type); bound rows are group-cardinality and broadcast back
    onto events.  The rank arithmetic is exact integer ceil
    (ceil(n*p) = (n*p_pct + 99) DIV 100), reproducing the oracle's
    CEIL(n * 0.05) decimal arithmetic for any n."""
    cents = _events(spark, sf_dir).select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 10_000).cast("bigint").alias("v_cu"),
    ).transform(local_checkpoint)
    spark = cents.sparkSession
    lo_pct = int(round(WINSOR_LO * 100))
    hi_pct = int(round(WINSOR_HI * 100))
    picked = rank_picks(
        cents,
        "event_type",
        "v_cu",
        "event_id",
        {
            "lo": lambda n: max(1, (n * lo_pct + 99) // 100),
            "hi": lambda n: (n * hi_pct + 99) // 100,
        },
    )
    lo = spark.createDataFrame(
        [(g, v) for g, which, v in picked if which == "lo"],
        "event_type string, lo_cu bigint",
    )
    hi = spark.createDataFrame(
        [(g, v) for g, which, v in picked if which == "hi"],
        "event_type string, hi_cu bigint",
    )
    return (
        cents.join(F.broadcast(lo), "event_type")
        .join(F.broadcast(hi), "event_type")
        .select(
            "event_id",
            "event_type",
            "v_cu",
            F.greatest(
                F.col("lo_cu"), F.least(F.col("hi_cu"), F.col("v_cu"))
            ).alias("clipped_cu"),
            ((F.col("v_cu") < F.col("lo_cu")) | (F.col("v_cu") > F.col("hi_cu"))).alias(
                "was_clipped"
            ),
        )
    )


# --- Markov transition matrix over user event sequences ---------------------


@query(
    "ev_markov_transitions",
    """
WITH seq AS (
  SELECT user_id, event_type,
         LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next_type
  FROM events
),
trans AS (
  SELECT event_type AS from_type, next_type AS to_type,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM seq WHERE next_type IS NOT NULL
  GROUP BY event_type, next_type
),
tot AS (
  SELECT from_type, CAST(SUM(n) AS BIGINT) AS n_from
  FROM trans GROUP BY from_type
)
SELECT t.from_type, t.to_type, t.n,
       CAST((t.n * 1000000) // o.n_from AS BIGINT) AS p_mu
FROM trans t JOIN tot o USING (from_type)
""",
)
def ev_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: P(next event type | current), the sequence-modeling
    baseline behind next-action prediction and funnel diagnostics.
    Probabilities in integer micro-units (count * 1e6 floor-div row
    total) — exact in both engines.

    Scale shape: ONE exchange keyed on user_id for the lead() window
    (sessions sort within their key), then the transition count is
    map-side combinable over a |types|^2-cardinality key space; the
    normalizing join runs on the tiny transition matrix itself."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    trans = seq.groupBy(
        F.col("event_type").alias("from_type"), F.col("next_type").alias("to_type")
    ).agg(F.count("*").cast("bigint").alias("n"))
    tot = trans.groupBy("from_type").agg(F.sum("n").alias("n_from"))
    return trans.join(tot, "from_type").select(
        "from_type",
        "to_type",
        "n",
        F.expr("(n * 1000000) DIV n_from").alias("p_mu"),
    )


_MKV_STATE_SCHEMA = "last_ts_us long, last_eid long, last_type string"
_MKV_OUT_SCHEMA = "from_type string, to_type string, n long"


def stream_markov_transitions(
    spark: SparkSession, sf_dir: str, source: DataFrame | None = None
) -> DataFrame:
    """Streaming twin of ev_markov_transitions' transition-counting
    core: per-user state is the latest event (max (ts_us, event_id)),
    so a user's first event of a micro-batch pairs with their last
    event of an EARLIER batch — the cross-batch edge a stateless
    per-batch lead() would silently drop.  Emits per-(user, batch)
    transition counts in append mode; summing the drained output over
    (from_type, to_type) reproduces the batch lead() pair counts
    exactly (the normalizing p_mu join is a finishing step over the
    tiny matrix, recomputed identically by the equivalence test).

    Equivalence needs per-key event-time order to agree with arrival
    order across batches; the chronological harness guarantees it (and
    ties never straddle a split because the quartile cut is on ts).
    Within a batch the group scan concats + sorts all Arrow chunks
    first — the chunk-order-invariance rule applyInPandasWithState
    demands (tests/test_streaming.py::test_ttl_group_scan...)."""
    import pandas as pd

    def scan(key, pdf_iter, state):
        if state.hasTimedOut:
            state.remove()
            return iter(())
        pdf = pd.concat(list(pdf_iter), ignore_index=True)
        if not len(pdf):
            return iter(())
        pdf = pdf.sort_values(["ts_us", "event_id"], ignore_index=True)
        types = list(pdf["event_type"])
        if state.exists:
            _, _, last_type = state.get
            types = [last_type, *types]
        j = len(pdf) - 1
        state.update(
            (
                int(pdf["ts_us"].iloc[j]),
                int(pdf["event_id"].iloc[j]),
                str(pdf["event_type"].iloc[j]),
            )
        )
        pairs: dict = {}
        for a, b in zip(types, types[1:]):
            pairs[(a, b)] = pairs.get((a, b), 0) + 1
        if not pairs:
            return iter(())
        return iter(
            [
                pd.DataFrame(
                    [(a, b, n) for (a, b), n in pairs.items()],
                    columns=["from_type", "to_type", "n"],
                )
            ]
        )

    ev = source if source is not None else read_events_stream(spark, sf_dir)
    slim = ev.select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("ts_us")
    )
    return slim.groupBy("user_id").applyInPandasWithState(
        scan,
        outputStructType=_MKV_OUT_SCHEMA,
        stateStructType=_MKV_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


# --- SCD2 history build (type-2 dimension from a change log) ----------------


@query(
    "ev_scd2_history",
    """
WITH c AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY event_id)
           AS prev_type
  FROM events
),
runs AS (
  SELECT user_id, event_id, event_type, ts_us,
         SUM(CASE WHEN prev_type IS NULL OR prev_type <> event_type
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY event_id
                 ROWS UNBOUNDED PRECEDING) AS run_no
  FROM c
),
hist AS (
  SELECT user_id, run_no,
         MIN(event_type) AS state,
         arg_min(ts_us, event_id) AS valid_from_us,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM runs GROUP BY user_id, run_no
)
SELECT user_id, state, valid_from_us,
       LEAD(valid_from_us) OVER (PARTITION BY user_id ORDER BY run_no)
         AS valid_to_us,
       n_events,
       LEAD(valid_from_us) OVER (PARTITION BY user_id ORDER BY run_no)
         IS NULL AS is_current
FROM hist
""",
)
def ev_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension build from a change log: treat
    events as per-user state changes in commit order (event_id), fold
    consecutive runs of the same state into one history row, and stamp
    each row with its validity interval [valid_from, valid_to) — NULL
    valid_to marks the current row. This is the dimension-table side of
    every warehouse MERGE pipeline (Kimball SCD2), stated as one
    declarative plan instead of a per-key UPDATE loop.

    Scale shape: ONE exchange keyed on user_id serves the whole query —
    the lag/run-numbering windows partition by user_id, the
    (user_id, run_no) aggregation is clustered-satisfied by the same
    hash partitioning (no second exchange; partial agg map-side), and
    the final lead window reuses it again. At 100 TB of changes the
    plan moves each change row exactly once."""
    ev = _events(spark, sf_dir).select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("ts_us")
    )
    by_commit = Window.partitionBy("user_id").orderBy("event_id")
    run = (
        ev.withColumn("prev_type", F.lag("event_type").over(by_commit))
        .withColumn(
            "chg",
            (
                F.col("prev_type").isNull()
                | (F.col("prev_type") != F.col("event_type"))
            ).cast("bigint"),
        )
        .withColumn(
            "run_no",
            F.sum("chg").over(by_commit.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    hist = run.groupBy("user_id", "run_no").agg(
        F.min("event_type").alias("state"),
        F.min_by("ts_us", "event_id").alias("valid_from_us"),
        F.count("*").cast("bigint").alias("n_events"),
    )
    by_run = Window.partitionBy("user_id").orderBy("run_no")
    return hist.select(
        "user_id",
        "state",
        "valid_from_us",
        F.lead("valid_from_us").over(by_run).alias("valid_to_us"),
        "n_events",
        F.lead("valid_from_us").over(by_run).isNull().alias("is_current"),
    )


_SCD2_STATE_SCHEMA = (
    "state string, run_no long, valid_from_us long, n_events long"
)
_SCD2_OUT_SCHEMA = (
    "user_id long, state string, valid_from_us long, valid_to_us long, "
    "n_events long, is_current boolean, run_no long"
)


def stream_scd2(
    spark: SparkSession, sf_dir: str, source: DataFrame | None = None
) -> DataFrame:
    """Streaming twin of ev_scd2_history (incremental SCD2 MERGE): per
    user the state is the OPEN run (state value, run number, valid_from,
    event count).  A state change CLOSES the open run — emitted exactly
    once, stamped valid_to = the new run's valid_from, is_current=false
    — and every micro-batch additionally emits a snapshot of the open
    run (is_current=true) so the drained output always contains the
    dimension's current rows; the test keeps the max-(run_no, n_events)
    open snapshot per user.

    Equivalence argument: the batch plan folds runs in COMMIT order
    (event_id); the harness's chronological split preserves per-user
    commit order (asserted against the fixtures — and real CDC streams
    deliver in commit order by contract), so the sequential fold closes
    exactly the runs the batch lag/lead windows produce, with identical
    validity stamps.  This is the batch/incremental equivalence SCD2
    users assume and rarely test."""
    import pandas as pd

    cols = [
        "user_id", "state", "valid_from_us", "valid_to_us",
        "n_events", "is_current", "run_no",
    ]

    def scan(key, pdf_iter, state):
        if state.hasTimedOut:
            state.remove()
            return iter(())
        cur, run_no, vf, n = (
            state.get if state.exists else (None, 0, -1, 0)
        )
        out = []
        pdf = pd.concat(list(pdf_iter)).sort_values("event_id")
        for et, ts in zip(pdf["event_type"], pdf["ts_us"]):
            ts = int(ts)
            if cur is None:
                cur, run_no, vf, n = et, 1, ts, 1
            elif et == cur:
                n += 1
            else:
                out.append((key[0], cur, vf, ts, n, False, run_no))
                cur, run_no, vf, n = et, run_no + 1, ts, 1
        state.update((cur, int(run_no), int(vf), int(n)))
        out.append((key[0], cur, vf, None, n, True, run_no))
        return iter([pd.DataFrame(out, columns=cols)])

    ev = source if source is not None else read_events_stream(spark, sf_dir)
    slim = ev.select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("ts_us")
    )
    return slim.groupBy("user_id").applyInPandasWithState(
        scan,
        outputStructType=_SCD2_OUT_SCHEMA,
        stateStructType=_SCD2_STATE_SCHEMA,
        outputMode="update",
        timeoutConf="NoTimeout",
    )


# --- last-touch attribution -------------------------------------------------

ATTRIB_TOUCH_US = 6 * 3600 * 1_000_000  # purchase attributes to a touch <= 6h old


@query(
    "ev_last_touch_attribution",
    f"""
WITH seq AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us,
         LAST_VALUE(CASE WHEN event_type IN ('view', 'click')
                         THEN event_id END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS touch_id,
         LAST_VALUE(CASE WHEN event_type IN ('view', 'click')
                         THEN event_type END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS touch_type,
         LAST_VALUE(CASE WHEN event_type IN ('view', 'click')
                         THEN epoch_us(ts) END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS touch_us
  FROM events
)
SELECT event_id AS purchase_id, user_id,
       CASE WHEN touch_us IS NOT NULL
                 AND ts_us - touch_us <= {ATTRIB_TOUCH_US}
            THEN touch_id END AS touch_id,
       CASE WHEN touch_us IS NOT NULL
                 AND ts_us - touch_us <= {ATTRIB_TOUCH_US}
            THEN touch_type ELSE 'organic' END AS channel,
       CASE WHEN touch_us IS NOT NULL
                 AND ts_us - touch_us <= {ATTRIB_TOUCH_US}
            THEN ts_us - touch_us END AS touch_age_us
FROM seq WHERE event_type = 'purchase'
""",
)
def ev_last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution: each purchase credits the most
    recent view/click by the same user within ATTRIB_TOUCH_US, else
    'organic'. Unlike the interval join (ev_view_click_join: ALL touches
    in the window), this is the as-of/LOCF shape — exactly one credited
    touch per purchase, resolved by a running last-non-null frame, so no
    join and no pair blow-up for hyperactive users.

    Scale shape: one exchange keyed on user_id; the three running
    frames share one window spec (single sort, single pass); the
    purchase filter happens after the frame so every touch is visible
    to it but only purchase rows survive to the output."""
    ev = _events(spark, sf_dir).select(
        "event_id", "user_id", "event_type", F.unix_micros("ts").alias("ts_us")
    )
    is_touch = F.col("event_type").isin("view", "click")
    frame = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    seq = ev.select(
        "event_id",
        "user_id",
        "event_type",
        "ts_us",
        F.last(F.when(is_touch, F.col("event_id")), ignorenulls=True)
        .over(frame)
        .alias("touch_id"),
        F.last(F.when(is_touch, F.col("event_type")), ignorenulls=True)
        .over(frame)
        .alias("touch_type"),
        F.last(F.when(is_touch, F.col("ts_us")), ignorenulls=True)
        .over(frame)
        .alias("touch_us"),
    )
    attributed = (
        F.col("touch_us").isNotNull()
        & ((F.col("ts_us") - F.col("touch_us")) <= ATTRIB_TOUCH_US)
    )
    return seq.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.when(attributed, F.col("touch_id")).alias("touch_id"),
        F.when(attributed, F.col("touch_type")).otherwise("organic").alias("channel"),
        F.when(attributed, F.col("ts_us") - F.col("touch_us")).alias("touch_age_us"),
    )


_LT_STATE_SCHEMA = "touch_id long, touch_type string, touch_us long"
_LT_OUT_SCHEMA = (
    "purchase_id long, user_id long, touch_id long, channel string, "
    "touch_age_us long"
)


def stream_last_touch(
    spark: SparkSession, sf_dir: str, source: DataFrame | None = None
) -> DataFrame:
    """Streaming twin of ev_last_touch_attribution: per-user state is
    the most recent touch (id, type, timestamp — the LOCF register the
    batch query's last-non-null frame computes).  Purchases emit their
    attribution row immediately (append semantics — the credited touch
    precedes the purchase in event order, so the row is final the
    moment it is produced); views/clicks just overwrite the register.

    Equivalence argument: the batch frame is UNBOUNDED PRECEDING TO
    1 PRECEDING over (ts, event_id) order — exactly 'the register as of
    just before this row' under a sequential scan.  Ties in ts cannot
    split across micro-batches (the chrono harness cuts at timestamp
    boundaries), so streaming output equals batch row-for-row whenever
    per-user arrival is time-ordered.  State is one touch per live
    user — bounded."""
    import pandas as pd

    cols = ["purchase_id", "user_id", "touch_id", "channel", "touch_age_us"]

    def scan(key, pdf_iter, state):
        if state.hasTimedOut:
            state.remove()
            return iter(())
        tid, ttype, tus = state.get if state.exists else (-1, "", -1)
        out = []
        pdf = pd.concat(list(pdf_iter)).sort_values(["ts_us", "event_id"])
        for eid, et, ts in zip(
            pdf["event_id"], pdf["event_type"], pdf["ts_us"]
        ):
            eid, ts = int(eid), int(ts)
            if et == "purchase":
                if tus >= 0 and ts - tus <= ATTRIB_TOUCH_US:
                    out.append((eid, key[0], tid, ttype, ts - tus))
                else:
                    out.append((eid, key[0], None, "organic", None))
            elif et in ("view", "click"):
                tid, ttype, tus = eid, et, ts
        state.update((int(tid), ttype, int(tus)))
        return iter([pd.DataFrame(out, columns=cols)])

    ev = source if source is not None else read_events_stream(spark, sf_dir)
    slim = ev.select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("ts_us")
    )
    return slim.groupBy("user_id").applyInPandasWithState(
        scan,
        outputStructType=_LT_OUT_SCHEMA,
        stateStructType=_LT_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


# --- windowed trending top-k ------------------------------------------------

TRENDING_K = 3


@query(
    "ev_trending_topk",
    f"""
WITH cnt AS (
  SELECT epoch_us(time_bucket(INTERVAL '1 hour', ts)) AS window_start,
         event_type,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
)
SELECT window_start, event_type, n, rk FROM (
  SELECT window_start, event_type, n,
         ROW_NUMBER() OVER (PARTITION BY window_start
                            ORDER BY n DESC, event_type) AS rk
  FROM cnt
) WHERE rk <= {TRENDING_K}
""",
)
def ev_trending_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trending dashboard: the top-{TRENDING_K} event types per hourly
    window by count — the leaderboard aggregation behind every
    "what's hot right now" feature.

    Scale shape: the (window, type) count partial-aggregates map-side
    (type cardinality bounds the shuffle, not the event count), and the
    per-window rank<=K compiles to WindowGroupLimit, so even the ranked
    exchange carries at most K + ties per window per task. The same
    expression runs incrementally under Structured Streaming as
    aggregate -> foreachBatch rank (stream-native top-k needs the
    arbitrary-state operator; the batch statement is the driver-checked
    contract)."""
    ev = _events(spark, sf_dir)
    counts = ev.groupBy(
        F.window("ts", "1 hour").alias("w"), "event_type"
    ).agg(F.count("*").cast("bigint").alias("n"))
    return _trending_rank(counts)


def _trending_rank(counts: DataFrame) -> DataFrame:
    """rank<=K per window over a (w, event_type, n) count table — shared
    by the batch query and the foreachBatch leaderboard publisher so the
    two paths cannot drift."""
    w = Window.partitionBy("w").orderBy(F.desc("n"), F.asc("event_type"))
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TRENDING_K)
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start"),
            "event_type",
            "n",
            "rk",
        )
    )


def run_trending_topk_stream(
    spark: SparkSession,
    sf_dir: str,
    sink_dir: str,
    source: DataFrame | None = None,
    timeout_s: int = 300,
):
    """ev_trending_topk as a live leaderboard: the stream-native top-k
    pattern the batch docstring promises.  Rank is not an incremental
    aggregation, so the stream keeps only the (window, type) COUNT state
    (complete mode — merge-friendly, cardinality |windows| x |types|)
    and each micro-batch re-ranks that state in foreachBatch, publishing
    the refreshed leaderboard snapshot with an idempotent overwrite (the
    batchId-keyed redelivery story is covered by the foreachBatch sink
    test; here the snapshot is whole-replace, so redelivery is a no-op
    by construction).  After an availableNow drain the last published
    snapshot equals the batch query row-for-row.

    Returns the terminated StreamingQuery; the snapshot lives in
    ``sink_dir`` as parquet."""
    ev = (
        source if source is not None else read_events_stream(spark, sf_dir)
    ).withWatermark("ts", "1 hour")
    counts = ev.groupBy(
        F.window("ts", "1 hour").alias("w"), "event_type"
    ).agg(F.count("*").cast("bigint").alias("n"))

    def publish(batch_df: DataFrame, batch_id: int) -> None:
        _trending_rank(batch_df).write.mode("overwrite").parquet(sink_dir)

    q = (
        counts.writeStream.foreachBatch(publish)
        .outputMode("complete")
        .option("checkpointLocation", f"{sink_dir}_ckpt")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise TimeoutError(
            f"trending leaderboard did not drain within {timeout_s}s"
        )
    return q


# --- per-state dwell time ----------------------------------------------------


@query(
    "ev_dwell_time",
    """
WITH seq AS (
  SELECT event_type, ts,
         LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts
  FROM events
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_spells,
       CAST(SUM(epoch_us(next_ts) - epoch_us(ts)) AS BIGINT) AS total_dwell_us,
       CAST(SUM(epoch_us(next_ts) - epoch_us(ts)) // COUNT(*) AS BIGINT)
         AS avg_dwell_us
FROM seq WHERE next_ts IS NOT NULL
GROUP BY event_type
""",
)
def ev_dwell_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-in-state analytics: how long users DWELL in each event
    type before their next action — the duration complement of
    ev_markov_transitions' P(next | current) (which counts hops but
    not how long each state holds). A spell is the interval from an
    event to the same user's next event, attributed to the state being
    left; each user's last event is an open spell and is excluded in
    both engines. Durations are epoch-microsecond BIGINT differences —
    exact cross-engine, no interval arithmetic.

    Scale shape: the same single user_id-keyed exchange as the Markov
    operator serves the lead() window (per-user sequences sort within
    their key); the spell aggregation is then map-side combinable over
    an |event types|-cardinality key space — the exchange after the
    window carries |types| rows, nothing user-scale."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    seq = ev.select(
        "event_type",
        F.unix_micros("ts").alias("us"),
        F.lead(F.unix_micros("ts")).over(w).alias("next_us"),
    ).filter(F.col("next_us").isNotNull())
    return seq.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_spells"),
        F.sum(F.col("next_us") - F.col("us")).cast("bigint").alias("total_dwell_us"),
        F.expr("SUM(next_us - us) DIV COUNT(*)")
        .cast("bigint")
        .alias("avg_dwell_us"),
    )


_DWELL_STATE_SCHEMA = "last_ts_us long, last_eid long, last_type string"
_DWELL_OUT_SCHEMA = "event_type string, n_spells long, total_dwell_us long"


def _dwell_group_scan(pdf_iter, carried):
    """Pure core of the dwell-time state scan, factored (like
    _ttl_group_scan) so chunk-order invariance is directly testable:
    concat + sort ALL Arrow chunks before pairing — chunks arrive in
    arbitrary order and sizes, so any per-chunk pairing would attribute
    spells to the wrong events. Returns (per-type {type: (n, total)},
    new carried (ts_us, event_id, event_type)) — or (None, carried)
    for an empty group delivery."""
    import pandas as pd

    pdf = pd.concat(list(pdf_iter), ignore_index=True)
    if not len(pdf):
        return None, carried
    pdf = pdf.sort_values(["ts_us", "event_id"], ignore_index=True)
    rows = list(
        zip(
            (int(v) for v in pdf["ts_us"]),
            (int(v) for v in pdf["event_id"]),
            (str(v) for v in pdf["event_type"]),
        )
    )
    if carried is not None:
        head = (int(carried[0]), int(carried[1]), str(carried[2]))
        if rows[0][:2] < head[:2]:
            # The carried state is the max (ts_us, event_id) already
            # PAIRED in an earlier batch; an arrival below it would
            # close a spell backwards (negative dwell attributed to
            # the carried type) with no way to retract the already-
            # emitted partials in append mode.  The chronological-
            # harness precondition is violated — fail loudly instead
            # of corrupting the aggregate.
            raise ValueError(
                "stream_dwell_time: out-of-order arrival "
                f"{rows[0][:2]} predates carried state {head[:2]}; "
                "per-key cross-batch event-time order is a "
                "precondition of the dwell twin"
            )
        rows = [head, *rows]
    agg: dict = {}
    for (us_a, _, ty_a), (us_b, _, _) in zip(rows, rows[1:]):
        n, tot = agg.get(ty_a, (0, 0))
        agg[ty_a] = (n + 1, tot + (us_b - us_a))
    return agg, rows[-1]


def stream_dwell_time(
    spark: SparkSession, sf_dir: str, source: DataFrame | None = None
) -> DataFrame:
    """Streaming twin of ev_dwell_time's spell-closing core: per-user
    state is the latest event (max (ts_us, event_id) seen so far), so a
    user's first event of a micro-batch CLOSES the spell opened by
    their last event of an earlier batch — the cross-batch edge a
    stateless per-batch lead() would silently drop (each user's final
    event overall stays an open spell, held in state and never
    emitted, matching the batch plan's next_ts IS NOT NULL filter).
    Emits per-(event_type, batch) partial (n_spells, total_dwell_us)
    rows in append mode; summing the drained output per event_type and
    floor-dividing reproduces the batch aggregate exactly — the same
    partials-then-finish contract as stream_markov_transitions, whose
    state layout this shares.

    Equivalence needs per-key event-time order to agree with arrival
    order across batches; the chronological harness guarantees it (the
    quartile cut is on ts, so (ts, event_id) ties never straddle a
    split).  Within a batch the group scan concats + sorts all Arrow
    chunks first — the chunk-order-invariance rule
    applyInPandasWithState demands."""
    import pandas as pd

    def scan(key, pdf_iter, state):
        if state.hasTimedOut:
            state.remove()
            return iter(())
        carried = tuple(state.get) if state.exists else None
        agg, tail = _dwell_group_scan(pdf_iter, carried)
        if agg is None:
            return iter(())
        state.update((int(tail[0]), int(tail[1]), str(tail[2])))
        if not agg:
            return iter(())
        return iter(
            [
                pd.DataFrame(
                    [(t, n, tot) for t, (n, tot) in agg.items()],
                    columns=["event_type", "n_spells", "total_dwell_us"],
                )
            ]
        )

    ev = source if source is not None else read_events_stream(spark, sf_dir)
    slim = ev.select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("ts_us")
    )
    return slim.groupBy("user_id").applyInPandasWithState(
        scan,
        outputStructType=_DWELL_OUT_SCHEMA,
        stateStructType=_DWELL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


# --- peak concurrency (sweep line over fixed-duration sessions) --------------

CONCURRENCY_SESSION_US = 30 * 60 * 1_000_000  # each event opens a 30-min span
CONCURRENCY_BUCKET_US = 6 * 60 * 60 * 1_000_000  # 6 h prefix-sum blocks


@query(
    "ev_concurrency",
    f"""
WITH pts AS (
  SELECT event_type, epoch_us(ts) AS us, 1 AS delta FROM events
  UNION ALL
  SELECT event_type, epoch_us(ts) + {CONCURRENCY_SESSION_US}, -1 FROM events
),
run AS (
  SELECT event_type,
         SUM(delta) OVER (PARTITION BY event_type
                          ORDER BY us, delta
                          ROWS UNBOUNDED PRECEDING) AS open
  FROM pts
)
SELECT event_type,
       CAST(MAX(open) AS BIGINT) AS max_concurrent,
       CAST(COUNT(*) / 2 AS BIGINT) AS n_events
FROM run GROUP BY event_type
""",
)
def ev_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrency per event type: the maximum number of
    simultaneously open fixed-duration sessions (each event opens a
    [ts, ts+30min) span) — the capacity-planning number a serving or
    ingestion fleet is sized by. Sweep line: +1/-1 boundary points,
    running sum in (us, delta) order (delta -1 sorts first, so a span
    ending exactly when another starts never overlaps it — half-open
    semantics, identical in the oracle), max of the running sum.

    Scale shape: the textbook plan is one cumulative-sum window
    partitioned by event_type — a single task per type funneling
    O(n_events) rows (the tx_keywords-class skew trap). Here the
    running sum is the two-pass bucketed prefix sum the repo already
    uses for A2 numbering and top-p selection: (1) local cumsum +
    per-bucket max within (type, 6h-bucket) partitions — parallel,
    each partition bounded by a time slice; (2) bucket offsets = a
    cumsum over the per-bucket TOTALS (one row per (type, bucket) —
    bounded by calendar span / 6 h, thousands of rows at any corpus
    size, fine for a single-task window); local max + preceding-bucket
    offset then aggregates per type map-side. No task ever sees more
    than one bucket's boundary points.

    No batch-equivalence streaming twin, by design (unlike the per-key
    stateful ev_* ops): a running max over a GLOBAL time order is not
    per-key incremental state — an event's -1 point lands SESSION_US
    after its +1, so within-bucket arrival order is never time order
    across micro-batches, and any carried (sum, max) pair is wrong the
    moment a later batch back-fills an earlier us. The streaming-NATIVE
    form is :func:`stream_concurrency` below — buffer-until-watermark
    bucket finalization whose finalized rows equal this sweep's
    per-bucket intermediates (:func:`concurrency_per_bucket`), with the
    tiny offsets reduction left as a downstream batch step."""
    ev = _events(spark, sf_dir)
    per_bucket = concurrency_per_bucket(concurrency_points(ev))
    # offsets: cumulative total of all PRECEDING buckets of the type —
    # a window over the tiny per-bucket table, not the point stream
    off_w = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = per_bucket.withColumn(
        "offset", F.coalesce(F.sum("total").over(off_w), F.lit(0))
    )
    return offs.groupBy("event_type").agg(
        F.max(F.col("offset") + F.col("local_max"))
        .cast("bigint")
        .alias("max_concurrent"),
        F.expr("CAST(SUM(n_pts) DIV 2 AS BIGINT)").alias("n_events"),
    )


def concurrency_points(ev: DataFrame) -> DataFrame:
    """The +1/-1 sweep-line boundary points of an events frame, with
    their 6 h prefix-sum bucket — factored from ev_concurrency so the
    streaming twin test can rebuild the identical point stream."""
    us = F.unix_micros("ts")
    starts = ev.select(
        "event_type", us.alias("us"), F.lit(1).alias("delta")
    )
    ends = ev.select(
        "event_type",
        (us + F.lit(CONCURRENCY_SESSION_US)).alias("us"),
        F.lit(-1).alias("delta"),
    )
    return starts.unionAll(ends).withColumn(
        "bucket", F.expr(f"us DIV {CONCURRENCY_BUCKET_US}")
    )


def concurrency_per_bucket(pts: DataFrame) -> DataFrame:
    """Per-(event_type, bucket) sweep intermediates: max of the LOCAL
    running sum, the bucket's net total, and its point count — pass 1
    of ev_concurrency's two-pass bucketed prefix sum, and the exact
    surface stream_concurrency's finalized buckets must reproduce."""
    local_w = (
        Window.partitionBy("event_type", "bucket")
        .orderBy(F.asc("us"), F.asc("delta"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = pts.withColumn("run", F.sum("delta").over(local_w))
    return local.groupBy("event_type", "bucket").agg(
        F.max("run").alias("local_max"),
        F.sum("delta").alias("total"),
        F.count("*").alias("n_pts"),
    )


@query(
    "ev_concurrency_buckets",
    f"""
WITH pts AS (
  SELECT event_type, epoch_us(ts) AS us, 1 AS delta FROM events
  UNION ALL
  SELECT event_type, epoch_us(ts) + {CONCURRENCY_SESSION_US}, -1 FROM events
),
run AS (
  SELECT event_type, us // {CONCURRENCY_BUCKET_US} AS bucket, delta,
         SUM(delta) OVER (PARTITION BY event_type, us // {CONCURRENCY_BUCKET_US}
                          ORDER BY us, delta
                          ROWS UNBOUNDED PRECEDING) AS lrun
  FROM pts
)
SELECT event_type,
       CAST(bucket AS BIGINT) AS bucket,
       CAST(MAX(lrun) AS BIGINT) AS local_max,
       CAST(SUM(delta) AS BIGINT) AS total,
       CAST(COUNT(*) AS BIGINT) AS n_pts
FROM run GROUP BY event_type, bucket
""",
)
def ev_concurrency_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pass 1 of ev_concurrency's bucketed sweep as its own
    oracle-checked surface: per (event_type, 6h-bucket) the local
    running-sum max, net total, and point count.  Registered (r10) so
    the DRIVER's hash evidence covers the exact rows
    stream_concurrency's watermark-finalized buckets must reproduce —
    the twin equality tests then chain to an oracle-checked surface
    instead of an internal intermediate.  Same plan as the parent
    query's first pass: (type, bucket)-partitioned local window (no
    per-type funnel), map-side-combinable per-bucket aggregation."""
    per = concurrency_per_bucket(concurrency_points(_events(spark, sf_dir)))
    return per.select(
        "event_type",
        F.col("bucket").cast("bigint").alias("bucket"),
        F.col("local_max").cast("bigint").alias("local_max"),
        F.col("total").cast("bigint").alias("total"),
        F.col("n_pts").cast("bigint").alias("n_pts"),
    )


_CONC_STATE_SCHEMA = "pus array<bigint>, delta array<bigint>"
_CONC_OUT_SCHEMA = (
    "event_type string, bucket bigint, local_max bigint, "
    "total bigint, n_pts bigint"
)


def _concurrency_finalize(pus, deltas):
    """Sweep a finalized bucket's buffered boundary points: sort by
    (us, delta) — delta -1 before +1 on ties, the half-open rule — and
    return (local_max, total, n_pts), the concurrency_per_bucket row."""
    pts = sorted(zip((int(u) for u in pus), (int(d) for d in deltas)))
    run = 0
    mx = None
    for _, d in pts:
        run += d
        mx = run if mx is None or run > mx else mx
    return mx, run, len(pts)


def stream_concurrency(
    spark: SparkSession, sf_dir: str, source: DataFrame | None = None
) -> DataFrame:
    """Streaming-NATIVE peak concurrency: the bucket-finalization
    operator ev_concurrency's docstring specifies.  Each event explodes
    into its two sweep-line points (+1 at ts, -1 at ts+SESSION_US);
    state is keyed by (event_type, 6h-bucket) and buffers that ONE
    bucket's points until the event-time watermark passes the bucket's
    end, then emits the bucket's (local_max, total, n_pts) row once and
    drops the state.  Finalized rows equal concurrency_per_bucket's
    batch intermediates exactly (the equivalence the twin tests prove,
    restart included); the global answer is the tiny downstream
    offsets+max reduction ev_concurrency runs over the same rows —
    calendar-bounded, one row per (type, bucket), a batch afterthought.

    Finalization at bucket_end needs no SESSION_US grace: every point
    landing in bucket K derives from an event with ts <= bucket_end(K)
    (a start point's ts IS its us; an end point's ts is its us minus
    SESSION_US), so once the watermark passes bucket_end(K) the
    watermark contract says no K-point can still arrive.  State is
    bounded per key by one bucket's points, and the number of live
    keys by |types| x (1 + (SESSION_US + watermark delay) /
    BUCKET_US) — a constant per type, never history-growing.  Unlike
    the per-key twins this tolerates ARBITRARY arrival order for any
    event whose start bucket has not yet finalized (points are
    buffered and re-sorted at finalization, no carried running state
    to corrupt) — the property the batch sweep's global time order
    otherwise forecloses.  The operative lateness boundary is bucket
    FINALIZATION, not the raw watermark delay: applyInPandasWithState
    does not pre-filter sub-watermark input rows, so even rows hours
    below the watermark are absorbed while their bucket is in flight;
    an event whose start bucket already finalized is dropped whole
    (both sweep points, atomically — see the rule in scan())."""
    import pandas as pd

    def scan(key, pdf_iter, state):
        etype, bucket = key[0], int(key[1])
        if state.hasTimedOut:
            if not state.exists:  # pragma: no cover - defensive
                state.remove()
                return iter(())
            pus, deltas = state.get
            mx, tot, n = _concurrency_finalize(pus, deltas)
            state.remove()
            return iter(
                [
                    pd.DataFrame(
                        [(etype, bucket, mx, tot, n)],
                        columns=[
                            "event_type", "bucket", "local_max",
                            "total", "n_pts",
                        ],
                    )
                ]
            )
        end_ms = ((bucket + 1) * CONCURRENCY_BUCKET_US) // 1000
        wm = state.getCurrentWatermarkMs()
        if state.exists:
            pus, deltas = list(state.get[0]), list(state.get[1])
        else:
            pus, deltas = [], []
        # Late-event drop rule — PER EVENT, decided from the point
        # itself so both of an event's points (delivered in the same
        # micro-batch, seeing the same watermark) get the SAME verdict
        # even though they land in different bucket groups: drop iff
        # the watermark has passed the end of the event's START bucket
        # (start_us = pus for a +1, pus - SESSION for a -1).  Why this
        # exact rule:
        # * applyInPandasWithState does NOT pre-filter sub-watermark
        #   input rows (verified by the out-of-order test), so an
        #   in-flight bucket absorbs arbitrary disorder — rows are
        #   kept as long as their start bucket has not finalized;
        # * without the guard, a row arriving AFTER its bucket
        #   finalized would resurrect the key and emit the bucket a
        #   second time in append mode (double-counted downstream);
        # * a per-POINT guard (the first spelling of this fix) would
        #   half-drop an event whose +1 sits in a finalized bucket but
        #   whose -1 lands in a live one, leaving an unmatched -1 that
        #   corrupts the live bucket's total/n_pts — the atomic
        #   per-event rule cannot (wm >= end(start) is evaluated
        #   identically in both groups).
        # Only sub-watermark events can be dropped: an on-time event
        # has ts > wm and ts < end(start bucket), so wm < end.
        for pdf in pdf_iter:
            for u, d in zip(pdf["pus"], pdf["delta"]):
                u, d = int(u), int(d)
                start_us = u - (CONCURRENCY_SESSION_US if d < 0 else 0)
                start_end_ms = (
                    (start_us // CONCURRENCY_BUCKET_US + 1)
                    * CONCURRENCY_BUCKET_US
                ) // 1000
                if wm >= start_end_ms:
                    continue
                pus.append(u)
                deltas.append(d)
        if not pus:  # every delivered event was late — nothing to hold
            return iter(())
        state.update((pus, deltas))
        # setTimeoutTimestamp must exceed the current watermark; a
        # bucket first seen at/under it finalizes on the next advance
        state.setTimeoutTimestamp(max(end_ms, wm + 1))
        return iter(())

    ev = (
        source if source is not None else read_events_stream(spark, sf_dir)
    ).withWatermark("ts", "1 hour")
    us = F.unix_micros("ts")
    pts = (
        ev.select(
            "event_type",
            "ts",
            F.explode(
                F.array(
                    F.struct(
                        us.alias("pus"),
                        F.lit(1).cast("bigint").alias("delta"),
                    ),
                    F.struct(
                        (us + F.lit(CONCURRENCY_SESSION_US)).alias("pus"),
                        F.lit(-1).cast("bigint").alias("delta"),
                    ),
                )
            ).alias("pt"),
        )
        .select(
            "event_type",
            "ts",
            F.col("pt.pus").alias("pus"),
            F.col("pt.delta").alias("delta"),
        )
        .withColumn("bucket", F.expr(f"pus DIV {CONCURRENCY_BUCKET_US}"))
    )
    return pts.groupBy("event_type", "bucket").applyInPandasWithState(
        scan,
        outputStructType=_CONC_OUT_SCHEMA,
        stateStructType=_CONC_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="EventTimeTimeout",
    )
