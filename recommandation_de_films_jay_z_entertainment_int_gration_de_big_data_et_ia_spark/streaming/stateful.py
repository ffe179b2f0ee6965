"""Custom stateful streaming operators via ``applyInPandasWithState``.

The engine's escape hatch for operators Spark's built-in windows can't
express: arbitrary per-key state machines with Arrow-batched user code.
Demonstrated with a running per-user event counter (state = one long per
key — bounded, no timeout) whose availableNow drain must equal the batch
groupBy count (tests/test_streaming.py).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame


def running_user_counts(events: DataFrame) -> DataFrame:
    """Per-user running event count as an update stream."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update_counts(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n = state.get[0] if state.exists else 0
        for pdf in pdfs:
            n += len(pdf)
        state.update((n,))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n]})

    return events.groupBy("user_id").applyInPandasWithState(
        update_counts,
        outputStructType="user_id long, n_events long",
        stateStructType="n long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
