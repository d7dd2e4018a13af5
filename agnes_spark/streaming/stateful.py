"""Custom stateful streaming operators.

Two levels:
- `streaming_dedup` — the engine-native path (streaming
  dropDuplicates keeps the seen-key set in the state store, bounded by
  the watermark).
- `running_user_stats` — the escape hatch for genuinely custom state:
  applyInPandasWithState with an explicit state schema and timeout,
  emitting an updated aggregate per user per micro-batch.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_dedup(events: DataFrame, key_cols: list[str], watermark_col: str, delay: str) -> DataFrame:
    """Exact streaming dedup on key_cols. The watermark bounds the
    state store: a key older than the watermark can be evicted because
    a duplicate that late would be dropped by the watermark anyway."""
    return events.withWatermark(watermark_col, delay).dropDuplicates(
        key_cols + [watermark_col]
    )


_OUT_SCHEMA = "user_id bigint, n_events bigint, total_value double"
_STATE_SCHEMA = "n bigint, total double"


def _update_user(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    if state.exists:
        n, total = state.get
    else:
        n, total = 0, 0.0
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum) maintained in explicit group state
    — the template for custom stateful operators the built-in
    aggregates can't express (per-key models, CEP, decaying counters).
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
