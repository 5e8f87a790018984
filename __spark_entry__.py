"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All queries live in ftp_blueprints_spark/ and self-register into
plans.registry; this module just re-exports the registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

# Importing these modules registers every query + oracle pair.
from ftp_blueprints_spark.plans import relational  # noqa: F401,E402
from ftp_blueprints_spark.plans.registry import ORACLES, QUERIES  # noqa: E402

try:  # optional surfaces — keep entry importable even mid-build
    from ftp_blueprints_spark.plans import manifest_queries  # noqa: F401
except ImportError:
    pass
try:
    from ftp_blueprints_spark.operators import dedup  # noqa: F401
except ImportError:
    pass
try:
    from ftp_blueprints_spark.operators import similarity  # noqa: F401
except ImportError:
    pass
try:
    from ftp_blueprints_spark.plans import text_queries  # noqa: F401
except ImportError:
    pass
try:
    from ftp_blueprints_spark.operators import multimodal  # noqa: F401
except ImportError:
    pass
try:
    from ftp_blueprints_spark.streaming import events as _streaming_events  # noqa: F401
except ImportError:
    pass
try:
    from ftp_blueprints_spark.plans import udf_queries  # noqa: F401
except ImportError:
    pass
try:
    from ftp_blueprints_spark.operators import sketches  # noqa: F401
except ImportError:
    pass


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return QUERIES["q01_pricing_summary"](spark, "/root/testdata/sf0.001")


# The driver records correctness rows in queries() order and caps the file
# at 50 rows per round.  Round-4 window plan (VERDICT r3 tasks 1 and 3):
#   rank 0 — the 11 queries that have NEVER had driver evidence (passed only
#            the local tests/test_oracle_parity.py equivalent through r3);
#   rank 1 — the 8 ev_* queries, all ERR in r3 on the TIMESTAMP_NTZ fixture
#            drift, now fixed in session.load_table — first possible green;
#   rank 2 — the three relational queries that regressed with the same drift
#            (green r2, fail r3): as-of pair + time-range window;
#   rank 3+ — re-verification rotation over the already-green families,
#            whatever fits under row 50.
_NEVER_DRIVER_CHECKED = {
    "dd_semantic": 0,
    "dd_span_dedup": 0,
    "sim_kmeans": 0,
    "sim_pq_topk": 0,
    "sim_chunk_retrieval": 0,
    "sk_bloom_decontaminate": 0,
    "tx_quality_topp": 0,
    "tx_gopher_rules": 0,
    "tx_bm25": 0,
    "tx_lm_bigram": 0,
    "tx_top_terms": 0,
}
_FAMILY_RANK = {
    "ev_": 1,  # fixed this round; never green before
    "dd_": 3,
    "sim_": 4,
    "tx_": 5,
    "mm_": 6,
    "udf_": 7,
    "udtf_": 7,
    "sk_": 7,
}
_EARLY_NAMES = {
    **_NEVER_DRIVER_CHECKED,
    # NTZ-regressed in r3 (green r2) — re-prove right after the ev_ family
    "q_asof_join": 2,
    "q_asof_tolerance": 2,
    "q_window_time_range": 2,
    # new in r4 (cluster-balanced diversity sample, DSIR importance
    # weights, KMV distinct sketch): first driver evidence this round,
    # ahead of re-verification
    "sim_cluster_sample": 2,
    "tx_dsir_weights": 2,
    "sk_kmv_distinct": 2,
    "mm_phash_neardup": 2,
    "tx_temperature_mix": 2,
    "q_salted_join": 2,
    # upgraded from rows-only to oracle-checked in r4 — first hash-check
    "ev_ttl_dedup": 2,
    "tx_pack_sequences": 2,
    "dd_minhash_lsh": 2,
    "dd_simhash": 2,
    # real-FTP listing pair: green r3, distinct rank (ADVICE r3) so their
    # window placement is enforced by rank, not module-import-order tiebreak
    "mf_real_listing_connector": 8,
    "mf_real_listing_datasource": 8,
    # headline relational queries re-verified each round (whatever of
    # these still fits under row 50 after the families above)
    "q01_pricing_summary": 9,
    "q03_shipping_priority": 9,
    "q05_region_volume": 9,
    "q_window_rank": 9,
}


def _rank(name: str) -> int:
    if name in _EARLY_NAMES:
        return _EARLY_NAMES[name]
    for prefix, rank in _FAMILY_RANK.items():
        if name.startswith(prefix):
            return rank
    return 100


def _ordered(names: list[str]) -> list[str]:
    order = {n: i for i, n in enumerate(names)}  # registration order tiebreak
    return sorted(names, key=lambda n: (_rank(n), order[n]))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {n: QUERIES[n] for n in _ordered(list(QUERIES))}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted for non-SQL ops)."""
    return {n: ORACLES[n] for n in _ordered(list(QUERIES)) if n in ORACLES}
