"""Custom stateful streaming operators (``applyInPandasWithState``).

The built-in windowed aggregations (windows.py) cover time-bucketed
state; this module is the escape hatch for operator state Spark's
built-ins can't express — here a running per-user aggregate that
survives across micro-batches via the state store (checkpointed,
exactly-once), the streaming analog of the reference's
"index follows writes" invariant (``/root/reference/app.py:771-773``)
where derived per-entity state stays current as events arrive.

Scale notes: state is partitioned by the grouping key across the
cluster's state stores — no driver state, no global barrier. Each
micro-batch shuffles only that batch's rows to their key's partition
(plus the state-store read), so throughput is bounded by the batch
volume, not the accumulated history.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, n_events long, sum_value double, max_value double"
)
STATE_SCHEMA = "n long, s double, m double"


def _update_user_totals(
    key, pdfs: Iterator, state: GroupState
) -> Iterator:
    """Fold this batch's rows for one user into the persisted state."""
    import pandas as pd

    n, s, m = state.get if state.exists else (0, 0.0, float("-inf"))
    for pdf in pdfs:
        vals = pdf["value"].astype(float)
        n += len(pdf)
        s += float(vals.sum())
        if len(vals):
            m = max(m, float(vals.max()))
    state.update((n, s, m))
    (user_id,) = key
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "sum_value": [s],
            "max_value": [m],
        }
    )


def running_user_totals(events_stream: DataFrame) -> DataFrame:
    """Per-user running (count, sum, max) over the whole stream.

    Emits one updated row per user per micro-batch; state lives in
    the checkpointed state store, so totals continue across restarts.
    """
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
