"""Grouped-map Pandas operators (applyInPandas) — the per-group
escape hatch for logic that needs a whole group in memory at once.
Used sparingly (SURVEY.md §2.10: UDFs are the slow path); groups are
Arrow-shipped whole, so the group size — not the corpus size — bounds
executor memory."""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame


def round_half_away(v: float, decimals: int) -> float:
    """ROUND half-away-from-zero, matching SQL ROUND in both engines.
    Python's round() (and numpy's) is half-to-even and diverges at
    exact scaled midpoints (100.03125 → 100.0312 vs SQL's 100.0313) —
    every oracle-matched UDF must round through this one helper."""
    import math

    scale = 10.0**decimals
    s = v * scale
    return (math.floor(s + 0.5) if v >= 0 else -math.floor(-s + 0.5)) / scale


def zscore_per_group(
    df: DataFrame, group_col: str, value_col: str, id_col: str, decimals: int = 4
) -> DataFrame:
    """Per-group z-score normalization of ``value_col`` (sample
    stddev). Groups of size 1 get NULL. Output: (id, group, z)."""

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf[value_col]
        s = v.std(ddof=1)
        m = v.mean()
        z = ((v - m) / s).round(decimals) if s and s == s else pd.Series(
            [float("nan")] * len(v), index=v.index
        )
        out = pd.DataFrame(
            {id_col: pdf[id_col], group_col: pdf[group_col], "z": z}
        )
        # NaN → None so the engine emits SQL NULL like the oracle
        return out.where(out.notna(), None)

    return df.select(id_col, group_col, value_col).groupBy(group_col).applyInPandas(
        per_group, schema=f"{id_col} long, {group_col} long, z double"
    )


def count_above_threshold_cogrouped(
    values: DataFrame,
    thresholds: DataFrame,
    key_col: str,
    value_col: str,
    thresh_col: str,
) -> DataFrame:
    """Cogrouped-map Pandas (``cogroup().applyInPandas``): pair each
    key's value rows with its threshold rows in one Arrow-batched
    function — the two-sided per-group escape hatch (the shape custom
    per-entity logic takes when it needs BOTH a fact slice and a
    config/model slice). Output: (key, n_above)."""

    def per_key(vals: pd.DataFrame, ths: pd.DataFrame) -> pd.DataFrame:
        if len(vals) == 0 or len(ths) == 0:
            return pd.DataFrame({key_col: pd.Series(dtype="int64"),
                                 "n_above": pd.Series(dtype="int64")})
        t = ths[thresh_col].iloc[0]
        return pd.DataFrame(
            {key_col: [vals[key_col].iloc[0]],
             "n_above": [int((vals[value_col] > t).sum())]}
        )

    return (
        values.select(key_col, value_col)
        .groupBy(key_col)
        .cogroup(thresholds.select(key_col, thresh_col).groupBy(key_col))
        .applyInPandas(per_key, schema=f"{key_col} long, n_above long")
    )


def trimmed_mean_grouped_agg(
    df: DataFrame, group_col: str, value_col: str, trim_frac: float = 0.1
) -> DataFrame:
    """Grouped-aggregate pandas UDF (the GROUPED_AGG lane — Spark's
    UDAF surface for Python): per-group trimmed mean of an integer
    column, dropping floor(n*trim_frac) values from each tail.

    Engine-portable determinism: the trim is MULTISET-based (sort by
    value inside the UDF, drop the k smallest/largest values — which
    rows carry tied values is irrelevant to the surviving multiset),
    and the surviving sum is integer-exact, so the final division is
    bit-identical to the oracle's window formulation. The UDF receives
    each group as one Arrow batch; group size, not corpus size, bounds
    executor memory — same contract as applyInPandas, but Catalyst
    treats it as a real aggregate (partial shuffle of whole groups,
    usable inside groupBy().agg alongside built-ins).

    Groups where the trim consumes everything (trim_frac >= 0.5 and
    n <= 2k) return NULL — callers wanting the oracle's exact
    group-disappears semantics should keep trim_frac < 0.5."""
    import pandas as pd  # noqa: F811 (module-level import is above)

    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def tmean(v: pd.Series) -> float:
        s = v.sort_values().to_numpy()
        k = int(len(s) * trim_frac)
        kept = s[k: len(s) - k]
        if len(kept) == 0:
            return None
        m = float(kept.sum()) / len(kept)
        return round_half_away(m, 4)

    return df.groupBy(group_col).agg(
        tmean(F.col(value_col)).alias("trimmed_mean")
    )


def ewma_per_group(
    df: DataFrame,
    group_col: str,
    order_cols: list[str],
    value_col: str,
    id_col: str,
    alpha: float = 0.2,
    decimals: int = 4,
) -> DataFrame:
    """Per-group exponentially-weighted moving average — the
    inherently-recursive window (y_t = α·x_t + (1−α)·y_{t−1}) that SQL
    windows cannot express without recursion, so it is the textbook
    grouped-map applyInPandas case: one Arrow batch per group, an
    O(n) python loop inside, per-group state never crossing executor
    boundaries.

    The loop applies EXACTLY ``alpha*x + (1-alpha)*y`` per step in
    float64, the same operation order as the recursive-CTE oracle, so
    both engines walk identical IEEE sequences and the ROUND(…,
    decimals) hashes match exactly. (pandas ``ewm(adjust=False)`` is
    NOT usable here: its update loop skips the arithmetic when the
    carried mean already equals the next value, which diverges from
    the always-compute recursion by ulps and can flip the rounding at
    4-decimal half-boundaries.) NULL values poison the remainder of
    the group exactly like the oracle's ``α·NULL + (1−α)·y``:
    NaN propagates through the float recursion and is emitted as SQL
    NULL. Groups shuffle once on ``group_col``; at 100 TB the group
    key widens to (user, day) to bound per-group state, seeding each
    day from the prior day's closing value."""

    import math

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols, kind="mergesort")
        xs = pdf[value_col].astype("float64").to_numpy()
        y = None
        out = []
        for x in xs:
            y = float(x) if y is None else alpha * float(x) + (1 - alpha) * y
            out.append(None if math.isnan(y) else round_half_away(y, decimals))
        return pd.DataFrame(
            {id_col: pdf[id_col], group_col: pdf[group_col], "ewma": out}
        )

    cols = [id_col, group_col, value_col, *order_cols]
    narrow = df.select(*dict.fromkeys(cols))
    # Derive the id/group output types from the input schema instead of
    # hardcoding long — a string or date group key must round-trip with
    # its real type, not silently miscast through Arrow.
    from pyspark.sql.types import DoubleType, StructField, StructType

    in_fields = {f.name: f for f in narrow.schema.fields}
    out_schema = StructType(
        [
            StructField(id_col, in_fields[id_col].dataType),
            StructField(group_col, in_fields[group_col].dataType),
            StructField("ewma", DoubleType()),
        ]
    )
    return narrow.groupBy(group_col).applyInPandas(per_group, schema=out_schema)
