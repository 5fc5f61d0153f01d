"""Custom stateful streaming operator via applyInPandasWithState.

Running per-user usage totals (event count, value sum, last-seen ts)
maintained as explicit group state across micro-batches — the streaming
twin of the reference's per-user lifetime indicator table, and the
pattern for any custom stateful operator Spark lacks natively.

State is per user_id: bounded by the user population, partitioned by
the grouping key, checkpointed with the stream — no driver state.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double, last_ts timestamp"
STATE_SCHEMA = "n_events long, total_value double, last_ts timestamp"


def _update_user_state(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        n, total, last = state.get
    else:
        n, total, last = 0, 0.0, None
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        batch_max = pdf["ts"].max()
        last = batch_max if last is None else max(last, batch_max)
    state.update((n, total, last))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total], "last_ts": [last]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user lifetime totals, re-emitted for users seen each batch."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _update_user_state,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
