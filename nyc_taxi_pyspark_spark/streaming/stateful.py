"""Custom stateful streaming operators via applyInPandasWithState.

The shape a 100 TB event pipeline needs when windowed aggregation isn't
enough: arbitrary per-key state carried across micro-batches (running
profiles, dedup sets, CDC merge state). ``running_totals_per_user`` is the
reference implementation of the pattern — per-user running count + sum,
emitting one updated row per key per batch.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, sum_value_cents bigint"
STATE_SCHEMA = "n bigint, cents bigint"


def _update(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, cents = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        # exact integer cents — state stays order-independent and portable
        cents += int((pdf["value"] * 100).round().astype("int64").sum())
    state.update((n, cents))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "sum_value_cents": [cents]}
    )


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
        n, cents = (
            self._totals.get() if self._totals.exists() else (0, 0)
        )
        for pdf in rows:
            n += len(pdf)
            cents += int(
                (pdf["value"] * 100).round().astype("int64").sum()
            )
        self._totals.update((n, cents))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "sum_value_cents": [cents],
            }
        )

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
