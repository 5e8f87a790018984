"""Cross-engine properties for the adaptive-width phash contract and
the compaction tag discipline — pure-python/DuckDB (no Spark session),
so they pin the cross-engine derivations cheaply on every run.
"""

from __future__ import annotations

import pytest

duckdb = pytest.importorskip("duckdb")
pytest.importorskip("hypothesis")  # match the sibling property file

from hypothesis import given, settings, strategies as st

from ftp_blueprints_spark.operators.multimodal import phash_width_for


@settings(max_examples=300, deadline=None)
@given(st.integers(min_value=1, max_value=10**15))
def test_phash_width_for_equals_oracle_formula(n):
    """mm_phash_neardup_wide's correctness hinges on BOTH engines
    deriving the same band width from the same corpus count: python's
    phash_width_for and the oracle's GREATEST(10, LENGTH(BIN(n - 1))).
    This property is why the function is the INTEGER bit-length: the
    original float ceil(log2 n) spelling differs at n = 2^49 + 1
    (fractional part ~2^-49 sinks below the double ulp near 49, so the
    correctly rounded log2 is exactly 49 and ceil under-sizes the
    band) — asserted explicitly below so the regression can never
    sneak back, plus 300 random draws over fifteen decades."""
    sql = duckdb.sql(f"SELECT GREATEST(10, LENGTH(BIN({n} - 1)))").fetchone()[0]
    assert phash_width_for(n) == sql
    assert phash_width_for(n) == max(10, max(n - 1, 1).bit_length())


def test_phash_width_for_float_log2_counterexample():
    """The concrete divergence the r11 review found: at n = 2^49 + 1
    the float spelling yields 49, the true ceil(log2 n) is 50."""
    import math

    n = 2**49 + 1
    assert math.ceil(math.log2(n)) == 49  # the float trap, pinned
    assert phash_width_for(n) == 50  # the integer derivation is right
    sql = duckdb.sql(f"SELECT GREATEST(10, LENGTH(BIN({n} - 1)))").fetchone()[0]
    assert phash_width_for(n) == sql


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.integers(min_value=0, max_value=10**19),  # crashed-tag suffixes
            st.text(
                alphabet="abcdef.", min_size=1, max_size=8
            ),  # non-numeric residue (e.g. "deadbeef")
        ),
        max_size=8,
    )
)
def test_next_tag_monotone_over_any_crash_residue(tmp_path_factory, suffixes):
    """_next_tag must exceed EVERY numeric tag already under the index
    dir regardless of what combination of crashed backups/tmps/appends
    is present (and ignore non-numeric residue) — the property behind
    'a clock step backwards can never rank a stale backup newest'."""
    import os

    from ftp_blueprints_spark.operators.similarity import _next_tag

    idx = tmp_path_factory.mktemp("idx")
    for i, s in enumerate(suffixes):
        prefix = ["lists.old.", "appends.folding.", "lists.compacting."][i % 3]
        os.makedirs(idx / f"{prefix}{s}", exist_ok=True)
    tag = _next_tag(str(idx))
    assert len(tag) == 20 and tag.isdigit()
    numeric = [int(s) for s in suffixes if isinstance(s, int) or str(s).isdigit()]
    assert all(int(tag) > x for x in numeric)


def test_phash_saturation_warning_threshold():
    """r11 VERDICT task 7 (the deprecation-steering story): the legacy
    fixed-width guard must stay silent exactly while the adaptive
    sizing fits inside the widest fixed band (width_for(n) <= 10, i.e.
    n <= 1024) and fire PhashSaturationWarning for every corpus past
    it — the point where mm_phash_neardup_wide would size every band
    wider than the 48-bit layout can represent."""
    import warnings

    from ftp_blueprints_spark.operators import multimodal as mm
    from ftp_blueprints_spark.operators.multimodal import (
        PhashSaturationWarning,
        _warn_if_phash_saturating,
    )

    mm._PHASH_WARN_FIRED = False
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # silence is the assertion
        for n in (1, 500, 1024):
            _warn_if_phash_saturating(n)
    for n in (1025, 10**6, 10**8):
        # the warning is once-per-process (r12 advice); reset the flag
        # so each threshold case is checked independently
        mm._PHASH_WARN_FIRED = False
        with pytest.warns(PhashSaturationWarning, match="undersized"):
            _warn_if_phash_saturating(n)
    # and the enforcement itself: a second call past the threshold is
    # silent without a reset, even under an "always"/"error" filter
    with warnings.catch_warnings():
        warnings.simplefilter("error", PhashSaturationWarning)
        _warn_if_phash_saturating(10**8)
