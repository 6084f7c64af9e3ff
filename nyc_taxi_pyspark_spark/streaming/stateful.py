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
