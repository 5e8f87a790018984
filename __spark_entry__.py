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


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return QUERIES["q01_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted for non-SQL ops)."""
    return dict(ORACLES)
