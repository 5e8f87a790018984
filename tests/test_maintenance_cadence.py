"""Retrain-cadence calibration (r13 VERDICT task 6): the documented
thresholds in MAINTENANCE.md ("Retrain cadence: calibrated defaults")
computed on the sf0.1 fixtures, end-to-end through the real append
path. Per family: build on the even half, append the ODD half (a
same-distribution batch — the trigger must stay quiet), then append a
CONSTRUCTED drifted batch (the trigger must fire). This is the
measurement the runbook's defaults rest on: the same-distribution
batch sits inside the training yardstick's own cross-cid spread, the
drifted one does not.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from ftp_blueprints_spark.operators import similarity as S
from ftp_blueprints_spark.session import load_table

SF01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


@pytest.fixture(scope="module")
def halves(spark, tmp_path_factory):
    """Even-half fixture dir + the odd half as the no-drift batch."""
    if not os.path.isdir(SF01):
        pytest.skip(f"sf0.1 fixtures not found at {SF01}")
    emb = load_table(spark, SF01, "embeddings").select("vec_id", "embedding")
    half_dir = tmp_path_factory.mktemp("cadence_half")
    emb.filter(F.col("vec_id") % 2 == 0).write.mode("overwrite").parquet(
        str(half_dir / "embeddings.parquet")
    )
    odd = emb.filter(F.col("vec_id") % 2 == 1).localCheckpoint(eager=True)
    return str(half_dir), odd


def _shift_ids(df, offset=10_000_000):
    return df.withColumn("vec_id", F.col("vec_id") + F.lit(offset))


def test_ivf_cadence_thresholds_on_sf01(spark, halves, tmp_path):
    """IVF: the odd half of the SAME corpus must not alarm (its mean
    cosine drift sits inside the training CV); a negated batch — every
    vector pointing away from the space the centroids were trained on
    — must. The computed threshold is the documented max(CV, 1%)."""
    half_dir, odd = halves
    idx = S.ivf_build(spark, half_dir, index_dir=str(tmp_path / "ivf"))

    quiet = S.ivf_retrain_due(S.ivf_append(spark, idx, odd, batch_id=0))
    # the threshold IS the training space's own spread, and on real
    # fixtures it dominates the 1% floor — the documented calibration
    assert quiet["threshold"] >= S.DRIFT_REL_FLOOR
    assert abs(quiet["rel_drift"]) < quiet["threshold"]
    assert quiet["due"] is False

    drifted = _shift_ids(
        odd.withColumn(
            "embedding",
            F.expr("transform(embedding, x -> -x)"),
        )
    )
    loud = S.ivf_retrain_due(S.ivf_append(spark, idx, drifted, batch_id=1))
    assert loud["rel_drift"] <= -loud["threshold"]
    assert loud["due"] is True


def test_ivfpq_cadence_thresholds_on_sf01(spark, halves, tmp_path):
    """IVFPQ: the odd half must not alarm; a scaled batch (3x vectors
    -> ~9x residual energy against the frozen codebooks) must — the
    POSITIVE qerr direction the runbook documents."""
    half_dir, odd = halves
    idx = S.ivfpq_build(spark, half_dir, index_dir=str(tmp_path / "ivfpq"))

    quiet = S.ivfpq_retrain_due(S.ivfpq_append(spark, idx, odd, batch_id=0))
    assert quiet["threshold"] >= S.DRIFT_REL_FLOOR
    assert abs(quiet["rel_drift"]) < quiet["threshold"]
    assert quiet["due"] is False

    drifted = _shift_ids(
        odd.withColumn(
            "embedding",
            F.expr("transform(embedding, x -> x * cast(3.0 as float))"),
        )
    )
    loud = S.ivfpq_retrain_due(S.ivfpq_append(spark, idx, drifted, batch_id=1))
    assert loud["rel_drift"] >= loud["threshold"]
    assert loud["due"] is True


def test_lsh_cadence_thresholds_on_sf01(spark, halves, tmp_path):
    """LSH: the odd half must not reach the 2x collision-cost ratio; a
    degenerate batch (one vector repeated — every row in one bucket
    per band) must blow far past it. Also pins the growth trigger's
    arithmetic: lsh_rows_for vs the published marker width."""
    half_dir, odd = halves
    idx = S.ann_lsh_build(spark, half_dir, index_dir=str(tmp_path / "lsh"))

    quiet = S.lsh_retrain_due(S.ann_lsh_append(spark, idx, odd, batch_id=0))
    assert quiet["max_ratio"] < quiet["threshold_ratio"] == 2.0
    assert quiet["due"] is False

    # one vector repeated: every row lands in ONE bucket per band, so
    # batch density = (m-1)/2 pairs/row — m = 6000 clears 2x even
    # against the theoretical max training density at sf0.1 (all 2500
    # standing rows colliding would be ~1250 pairs/row)
    one = odd.orderBy("vec_id").limit(1).select("embedding")
    clones = (
        spark.range(6000)
        .select((F.col("id") + 20_000_000).alias("vec_id"))
        .crossJoin(F.broadcast(one))
    )
    loud = S.lsh_retrain_due(S.ann_lsh_append(spark, idx, clones, batch_id=1))
    assert loud["max_ratio"] >= 2.0
    assert loud["due"] is True

    # growth trigger (drift-independent): the build hashes at the
    # fixed ANN_ROWS, which sf0.1's corpus has already outgrown —
    # lsh_rows_for demands more bits than the published marker width,
    # so the trigger is DUE on the fixed-width build...
    _bands, width0 = S._lsh_index_width(idx)
    n_base = (
        spark.read.parquet(os.path.join(idx, "sigs"))
        .filter(F.col("band") == 0)
        .count()
    )
    assert width0 == S.ANN_ROWS
    assert S.lsh_rows_for(n_base) > width0  # due: corpus outgrew width

    # ...and goes QUIET after the width-adaptive re-hash on the exact
    # served corpus (even half + both appended batches)
    emb = load_table(spark, SF01, "embeddings").select("vec_id", "embedding")
    corpus = (
        emb.filter(F.col("vec_id") % 2 == 0)
        .unionByName(odd)
        .unionByName(clones.select("vec_id", "embedding"))
    )
    assert S.ann_lsh_retrain(spark, idx, corpus) is True
    _bands, width1 = S._lsh_index_width(idx)
    n_served = (
        spark.read.parquet(os.path.join(idx, "sigs"))
        .filter(F.col("band") == 0)
        .count()
    )
    assert S.lsh_rows_for(n_served) <= width1  # quiet: width refreshed
