"""Local replica of the driver's DuckDB-oracle comparison: row count +
schema width + order-insensitive exact value comparison. Stricter than
needed (exact cell equality after canonicalization) so that passing
here implies passing the driver's value-hash check."""

from __future__ import annotations

import datetime
import math

import duckdb


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.execute(sql).fetchdf()


def _canon_cell(x) -> str:
    # Deliberately does NOT equate 3.0 with 3: the driver's value hash
    # distinguishes float from int representation (round-1 q_json_events
    # failed the driver while passing a laxer local canon) — engine-side
    # casts must align the types, not the comparator.
    if x is None:
        return "NULL"
    if isinstance(x, float):
        if math.isnan(x):
            return "NULL"
        return repr(x)
    if isinstance(x, (datetime.datetime, datetime.date)):
        return x.isoformat()
    try:
        import numpy as np

        if isinstance(x, np.floating):
            return _canon_cell(float(x))
        if isinstance(x, np.integer):
            return repr(int(x))
        if isinstance(x, np.ndarray):
            return "[" + ",".join(_canon_cell(v) for v in x.tolist()) + "]"
        if isinstance(x, np.bool_):
            return repr(bool(x))
    except ImportError:
        pass
    if isinstance(x, list):
        return "[" + ",".join(_canon_cell(v) for v in x) + "]"
    if x != x:  # pandas NaT / NA
        return "NULL"
    return repr(x)


def canonical_rows(pdf) -> list[tuple]:
    cols = sorted(pdf.columns)
    rows = [
        tuple(_canon_cell(row[c]) for c in cols)
        for _, row in pdf[cols].iterrows()
    ]
    return sorted(rows)


def compare_query(spark, query_fn, oracle_sqltext: str, sf_dir: str) -> None:
    spark_pdf = query_fn(spark, sf_dir).toPandas()
    oracle_pdf = run_oracle(oracle_sqltext, sf_dir)
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"column mismatch: spark={sorted(spark_pdf.columns)} "
        f"oracle={sorted(oracle_pdf.columns)}"
    )
    assert len(spark_pdf) == len(oracle_pdf), (
        f"row count mismatch: spark={len(spark_pdf)} oracle={len(oracle_pdf)}"
    )
    s_rows = canonical_rows(spark_pdf)
    o_rows = canonical_rows(oracle_pdf)
    if s_rows != o_rows:
        diffs = [
            (a, b) for a, b in zip(s_rows, o_rows) if a != b
        ][:5]
        raise AssertionError(f"value mismatch; first diffs (spark, oracle): {diffs}")
