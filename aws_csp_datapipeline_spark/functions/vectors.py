"""Vector-column utilities for embedding pipelines: L2 normalization
and scalar (int8-range) quantization — pure array expressions, no
Python, oracle-expressible."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from aws_csp_datapipeline_spark.functions.similarity import dot, _as_double


def l2_normalize(vec: Column, decimals: int = 4) -> Column:
    """Unit-L2 vector, elementwise-rounded so engines agree exactly.
    The norm is bound once through a single-element wrapper (same
    codegen trick as the shingle builder) instead of being
    re-evaluated per element."""
    v = _as_double(vec)
    return F.element_at(
        F.transform(
            F.array(F.sqrt(dot(v, v))),
            # + 0.0 folds IEEE -0.0 (from rounding tiny negatives)
            # into +0.0 so engines hash identically
            lambda nrm: F.transform(
                v, lambda x: F.round(x / nrm, decimals) + F.lit(0.0)
            ),
        ),
        1,
    )


def quantize_uint8(vec: Column) -> Column:
    """Per-vector min-max scalar quantization to 0..255 ints — the
    4×-compression trick for ANN candidate storage. FLOOR keeps
    Spark/DuckDB cast semantics identical; the max element maps to
    255 via the epsilon-stretched scale."""
    v = _as_double(vec)
    mn = F.array_min(v)
    mx = F.array_max(v)
    rng = mx - mn
    return F.when(rng == 0, F.transform(v, lambda _: F.lit(0))).otherwise(
        F.transform(
            v,
            lambda x: F.least(
                F.lit(255),
                F.floor((x - mn) * F.lit(255.999) / rng).cast("int"),
            ),
        )
    )
