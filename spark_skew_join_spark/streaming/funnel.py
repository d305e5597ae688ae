"""Streaming conversion funnel: incremental per-user stage tracking via
``applyInPandasWithState``.

The stateful-streaming counterpart of ``operators/funnel.py`` — the
per-user funnel is a tiny state machine (first time each stage was
reached strictly after the previous stage), so state is k integers per
user regardless of event volume.  Events are processed in event-time
order WITHIN each micro-batch (sorted before folding); the greedy fold
over time-sorted events computes exactly the batch operator's
min-after-previous-stage times, so a replay of the full history in any
number of in-order batches reproduces the batch funnel bit-for-bit
(parity-tested).  Late events that precede an already-committed stage
time are ignored — the documented semantics of an online funnel
(handle genuinely late data upstream with a watermark + delayed
trigger if needed).

Scale: state is O(stages) per user, keyed by user — Spark's state
store shards by the group key; a billion users is a billion tiny rows
of state, no per-user history retained.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame


def streaming_funnel(events: DataFrame, id_col: str, type_col: str,
                     ts_col: str, stages: Sequence[str]) -> DataFrame:
    """(id_col, reached, t_1..t_k) per user, updated every micro-batch;
    unreached stages carry -1.  ``ts_col`` must be integral (epoch
    micros); ``events`` is a grouped-state-capable streaming DataFrame."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    k = len(stages)
    if k == 0:
        raise ValueError("streaming_funnel: need at least one stage")
    id_type = events.schema[id_col].dataType.simpleString()
    out_schema = (
        f"{id_col} {id_type}, reached int, "
        + ", ".join(f"t_{i + 1} bigint" for i in range(k))
    )
    state_schema = ", ".join(f"t_{i + 1} bigint" for i in range(k))
    stage_idx = {s: i for i, s in enumerate(stages)}

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        times = list(state.get) if state.exists else [-1] * k
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col)
            for t, ts in zip(pdf[type_col], pdf[ts_col]):
                i = stage_idx.get(t)
                if i is None or times[i] != -1:
                    continue
                prev_ok = i == 0 or (times[i - 1] != -1 and ts > times[i - 1])
                if prev_ok:
                    times[i] = int(ts)
        state.update(tuple(times))
        reached = sum(1 for t in times if t != -1)
        yield pd.DataFrame(
            {id_col: [key[0]], "reached": [reached],
             **{f"t_{i + 1}": [times[i]] for i in range(k)}}
        )

    return events.groupBy(id_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
