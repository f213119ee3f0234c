"""Custom stateful streaming operators (applyInPandasWithState).

The reference has no stream processor (SURVEY.md §2.9); these provide
the stateful layer a production ingest pipeline adds on top of the
file-source micro-batches: per-key running aggregates that survive
across batches, with explicit state schema and timeout handling.
State is per-key and bounded (a fixed-width tuple), so executor
memory scales with key cardinality, not event volume.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double, max_value double"
STATE_SCHEMA = "n long, total double, mx double"


def _update_user_totals(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
):
    """Running per-user totals across micro-batches. Emits the updated
    running row for every batch the key appears in."""
    if state.exists:
        n, total, mx = state.get
    else:
        n, total, mx = 0, 0.0, float("-inf")
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            mx = max(mx, float(pdf["value"].max()))
    state.update((n, total, mx))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [total],
            "max_value": [mx],
        }
    )


def running_user_totals(events_stream: DataFrame) -> DataFrame:
    """Stateful per-user running totals over a stream:
    ``groupBy(user_id).applyInPandasWithState(...)`` — Arrow-batched
    per key-group, state checkpointed with the query."""
    return (
        events_stream.groupBy("user_id")
        .applyInPandasWithState(
            _update_user_totals,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def batch_user_totals(events: DataFrame) -> DataFrame:
    """The batch twin of running_user_totals — what the final state
    must equal after the stream drains (the test contract)."""
    return events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("total_value"),
        F.max("value").alias("max_value"),
    )


class _RunningTotalsProcessor:
    """StatefulProcessor for ``transformWithStateInPandas`` — the
    Spark 4 successor to applyInPandasWithState: named state variables
    (ValueState/ListState/MapState) with per-state TTL, timers, and
    initial-state hydration, instead of one opaque state tuple.
    Same contract as ``_update_user_totals``: running per-user
    (count, sum, max) emitted on every batch the key appears in."""

    def init(self, handle):
        self._totals = handle.getValueState(
            "totals", "n long, total double, mx double"
        )

    def handleInputRows(self, key, rows, timerValues):
        import pandas as pd

        if self._totals.exists():
            n, total, mx = self._totals.get()
        else:
            n, total, mx = 0, 0.0, float("-inf")
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
            if len(pdf):
                mx = max(mx, float(pdf["value"].max()))
        self._totals.update((n, total, mx))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [total],
                "max_value": [mx],
            }
        )

    def close(self):
        pass


def make_running_totals_processor():
    """Build the processor wrapped in the pyspark base class (kept in
    a factory so importing this module never requires the streaming
    API at import time)."""
    from pyspark.sql.streaming import StatefulProcessor

    class RunningTotalsProcessor(_RunningTotalsProcessor, StatefulProcessor):
        pass

    return RunningTotalsProcessor()


def have_transform_with_state() -> bool:
    """transformWithStateInPandas runs its state server through a
    protobuf-backed driver worker; without the protobuf package the
    query crashes at initialization, so the capability is gated the
    same way as the jar-gated connectors (sources/formats.py)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def running_user_totals_tws(events_stream: DataFrame) -> DataFrame:
    """``transformWithStateInPandas`` twin of ``running_user_totals``:
    identical semantics through the Spark 4 named-state API, so the
    batch-equality contract (`batch_user_totals`) pins both stateful
    surfaces. Requires the protobuf package at runtime (see
    ``have_transform_with_state``); the applyInPandasWithState twin
    is the no-extra-dependency path."""
    if not have_transform_with_state():
        raise NotImplementedError(
            "transformWithStateInPandas needs the 'protobuf' package "
            "(pip install protobuf), which is not available here; use "
            "running_user_totals (applyInPandasWithState) instead"
        )
    return events_stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=make_running_totals_processor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="update",
        timeMode="none",
    )
