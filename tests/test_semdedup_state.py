"""Persisted semdedup state artifact: build → incremental admit →
append, with the frozen-quantizer contract past the sign-bit cap.

Load-bearing assertions:
- the persisted state (sign-bit config) is EXACTLY
  ``semdedup_kept_state``'s in-session output, and
  ``incremental_from_state`` reproduces ``semdedup_incremental``
  decision-for-decision — the artifact is a serialization of the
  existing lane, not a new algorithm;
- with the COMPOSITE quantizer (ivf_cells > 0), a fresh session's
  frozen re-derivation (broadcast-argmin against persisted centers)
  assigns every kept vector the same bucket the build wrote — the
  centers in meta.json are sufficient to re-home any future batch;
- append=True makes batch N+1 see batch N's accepted vectors.
"""

import pyspark.sql.functions as F

from aws_csp_datapipeline_spark.catalog import load_table
from aws_csp_datapipeline_spark.functions import semdedup_state as SS
from aws_csp_datapipeline_spark.functions.similarity import (
    semdedup_incremental,
    semdedup_kept_state,
)


def test_state_build_matches_in_session_kept_state(spark, sf_oracle, tmp_path):
    e = load_table(spark, sf_oracle, "embeddings")
    existing = e.filter(F.col("vec_id") < 250)
    sd = str(tmp_path / "sd_state")
    meta = SS.build_semdedup_state(
        existing, "embedding", "vec_id", sd, threshold=0.45,
        sign_bits=6, ivf_cells=0,
    )
    persisted = {
        (r["id"], r["bucket"])
        for r in spark.read.parquet(sd + "/state").collect()
    }
    in_session = {
        (r["vec_id"], r["bucket"])
        for r in semdedup_kept_state(
            existing, "embedding", "vec_id", 0.45, 6
        ).collect()
    }
    assert persisted == in_session
    assert meta["n_kept"] == len(in_session)


def test_incremental_from_state_matches_in_session(spark, sf_oracle, tmp_path):
    e = load_table(spark, sf_oracle, "embeddings")
    existing = e.filter(F.col("vec_id") < 250)
    incoming = e.filter(F.col("vec_id") >= 250)
    sd = str(tmp_path / "sd_state2")
    SS.build_semdedup_state(
        existing, "embedding", "vec_id", sd, threshold=0.45,
        sign_bits=6, ivf_cells=0,
    )
    from_state = {
        (r["vec_id"], r["bucket"], r["accepted"])
        for r in SS.incremental_from_state(spark, sd, incoming).collect()
    }
    in_session = {
        (r["vec_id"], r["bucket"], r["accepted"])
        for r in semdedup_incremental(
            semdedup_kept_state(existing, "embedding", "vec_id", 0.45, 6),
            incoming, "embedding", "vec_id", threshold=0.45, sign_bits=6,
        ).collect()
    }
    assert from_state == in_session
    assert from_state  # non-vacuous


def test_frozen_composite_quantizer_rehomes_identically(
    spark, sf_oracle, tmp_path
):
    """ivf_cells > 0: a fresh 'session' re-deriving buckets from the
    persisted centers must assign every kept vector its build-time
    bucket (the frozen-quantizer rule extended to semdedup)."""
    e = load_table(spark, sf_oracle, "embeddings")
    sd = str(tmp_path / "sd_state3")
    meta = SS.build_semdedup_state(
        e, "embedding", "vec_id", sd, threshold=0.45,
        sign_bits=2, ivf_cells=4,
    )
    assert meta["ivf_cells"] == 4 and len(meta["centers"]) == 4
    rehomed = {
        (r["__id"], r["__bucket"])
        for r in SS._frozen_cells_and_units(
            spark, e, SS.read_state_meta(sd)
        ).collect()
    }
    persisted = {
        (r["id"], r["bucket"])
        for r in spark.read.parquet(sd + "/state").collect()
    }
    assert persisted <= rehomed  # every kept row re-homes to its bucket


def test_append_makes_next_batch_see_accepted(spark, sf_oracle, tmp_path):
    e = load_table(spark, sf_oracle, "embeddings")
    existing = e.filter(F.col("vec_id") < 250)
    batch1 = e.filter(F.col("vec_id").between(250, 349))
    sd = str(tmp_path / "sd_state4")
    SS.build_semdedup_state(
        existing, "embedding", "vec_id", sd, threshold=0.45,
        sign_bits=6, ivf_cells=0,
    )
    n_kept0 = SS.read_state_meta(sd)["n_kept"]
    out1 = SS.incremental_from_state(spark, sd, batch1, append=True)
    accepted1 = [r["vec_id"] for r in out1.filter("accepted").collect()]
    assert accepted1
    assert SS.read_state_meta(sd)["n_kept"] == n_kept0 + len(accepted1)
    # batch 2 = exact copies of batch-1-ACCEPTED vectors under new ids:
    # every copy must now be rejected (cosine 1.0 against the appended
    # rows) — proof the append is live state, not a side file
    batch2 = e.filter(F.col("vec_id").isin(accepted1)).select(
        (F.col("vec_id") + 10_000).alias("vec_id"), "embedding"
    )
    out2 = SS.incremental_from_state(spark, sd, batch2)
    assert out2.filter("accepted").count() == 0
