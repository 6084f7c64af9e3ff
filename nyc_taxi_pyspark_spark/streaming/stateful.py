"""Custom stateful streaming operators via applyInPandasWithState.

The shape a 100 TB event pipeline needs when windowed aggregation isn't
enough: arbitrary per-key state carried across micro-batches (running
profiles, dedup sets, CDC merge state). ``running_totals_per_user`` is the
reference implementation of the pattern — per-user running count + sum,
emitting one updated row per key per batch.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, sum_value_cents bigint"
STATE_SCHEMA = "n bigint, cents bigint, n_finite bigint"


def _totals_row(user_id, n: int, cents: int, n_fin: int) -> pd.DataFrame:
    # all-dirty key ⇒ NULL sum, exactly like SQL SUM over an all-NULL
    # group (the oracle's SUM(try_cast(...))); cents=0 would be a value
    # the input never summed to.
    return pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "sum_value_cents": pd.array(
                [cents if n_fin > 0 else None], dtype="Int64"
            ),
        }
    )


def _update(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, cents, n_fin = state.get if state.exists else (0, 0, 0)
    for pdf in pdfs:
        n += len(pdf)
        # exact integer cents — state stays order-independent and portable.
        # the finite mask mirrors SQL SUM's NULL-skipping extended by the
        # engine's dirty-data contract (NULL/NaN/Inf events count toward
        # n_events but add no cents); without it a single such row kills
        # the whole streaming query with IntCastingNaNError. n_finite
        # tracks whether ANY finite value was seen so an all-dirty key can
        # emit SQL's NULL rather than a fabricated 0.
        raw = pdf["value"] * 100
        fin = raw[np.isfinite(raw)]
        n_fin += len(fin)
        cents += int(fin.round().astype("int64").sum())
    state.update((n, cents, n_fin))
    yield _totals_row(user_id, n, cents, n_fin)


def running_totals_per_user(events: DataFrame) -> DataFrame:
    """Stateful per-user running totals across micro-batches (update mode)."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )


class RunningTotalsProcessor:
    """Spark 4 ``transformWithStateInPandas`` twin of
    ``running_totals_per_user`` — the successor API to
    applyInPandasWithState: state is TYPED and NAMED (a ValueState per
    composable piece instead of one positional tuple), the same processor
    can hold list/map state side-by-side, and timers/TTL are first-class
    on the handle. Semantics here are identical to the GroupState form
    (per-user running count + exact integer cents), so the two APIs are
    directly comparable and the catalog query's oracle is the same batch
    GROUP BY."""

    def init(self, handle) -> None:
        self._totals = handle.getValueState("totals", STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        (user_id,) = key
        n, cents, n_fin = (
            self._totals.get() if self._totals.exists() else (0, 0, 0)
        )
        for pdf in rows:
            n += len(pdf)
            raw = pdf["value"] * 100  # same finite mask as _update
            fin = raw[np.isfinite(raw)]
            n_fin += len(fin)
            cents += int(fin.round().astype("int64").sum())
        self._totals.update((n, cents, n_fin))
        yield _totals_row(user_id, n, cents, n_fin)

    def close(self) -> None:
        pass


def running_totals_tws(events: DataFrame) -> DataFrame:
    """Per-user running totals via transformWithStateInPandas (update
    mode, processing-time semantics)."""
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    # subclass lazily so import of this module never requires the API
    proc = type(
        "RunningTotalsStatefulProcessor",
        (StatefulProcessor,),
        dict(RunningTotalsProcessor.__dict__),
    )()
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=proc,
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )


EWMA_OUTPUT_SCHEMA = (
    "user_id bigint, n_events bigint, value double, ewma double, "
    "deviation double"
)
EWMA_STATE_SCHEMA = "vals array<double>, n bigint"
_EWMA_LAGS = 8


def _ewma_update(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Ordered-history state: a ring buffer of the user's last 8 values
    (most recent first) carried across micro-batches — the state SHAPE
    running_totals_per_user cannot express (totals are order-free; an
    EWMA needs the recency ORDER of its history). Rows are processed in
    (ts, event_id) order within each batch; the last processed event's
    trailing-8 dyadic EWMA (weights 128..1 over lags 1..8, /255 — the
    exact arithmetic of catalog events_ewma_anomaly) is emitted per
    batch once the buffer is full."""
    (user_id,) = key
    if state.exists:
        vals, n = list(state.get[0]), int(state.get[1])
    else:
        vals, n = [], 0
    last = None
    for pdf in pdfs:
        for row in pdf.sort_values(["ts", "event_id"]).itertuples():
            v = float(row.value)
            if len(vals) >= _EWMA_LAGS:
                num = 0.0
                for j in range(_EWMA_LAGS):
                    num = num + vals[j] * (2 ** (_EWMA_LAGS - 1 - j))
                ewma = num / 255.0
                last = (v, ewma, v - ewma)
            vals.insert(0, v)
            del vals[_EWMA_LAGS:]
            n += 1
    state.update((vals, n))
    if last is not None:
        v, ewma, dev = last
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "value": [v],
                "ewma": [ewma],
                "deviation": [dev],
            }
        )


def ewma_monitor_per_user(events: DataFrame) -> DataFrame:
    """Stateful per-user trailing-EWMA monitor across micro-batches."""
    return (
        events.select("user_id", "ts", "event_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _ewma_update,
            EWMA_OUTPUT_SCHEMA,
            EWMA_STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )
