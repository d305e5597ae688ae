"""Streaming drift monitoring: per-key CUSUM as grouped state.

The online sibling of ``operators/timeseries.py::cusum_scan`` — a
long-running pipeline watches a metric per key (error rate per
endpoint, latency per shard, token-length per source) and needs the
alarm DURING the stream, not after.  Unlike the batch scan, an online
CUSUM cannot use the window mean as its target (it isn't known yet),
so ``target`` and ``slack`` are explicit parameters — exactly how
Page's scheme is deployed (target = the in-control level from history,
e.g. a batch ``profile_table``/``cusum_scan`` run).

State per key is four numbers (s, smax, imax, n) — constant in stream
length.  The fold order is the ARRIVAL order within the stream (the
standard online-CUSUM semantics); feed an event-time-sorted stream or
accept arrival-order detection, as with any online monitor.  A parity
test pins stream-final state ≡ the batch fold with the same explicit
target over the same delivery order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def streaming_cusum(
    events: DataFrame,
    key_col: str,
    value_col: str,
    target: float,
    slack: float = 0.0,
    threshold: float = 0.0,
) -> DataFrame:
    """(key, n_events, cusum, cusum_max, argmax_idx, alarm) re-emitted
    on every trigger a key appears in; ``alarm`` latches via cusum_max."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    key_type = events.schema[key_col].dataType.simpleString()
    out_schema = (
        f"{key_col} {key_type}, n_events bigint, cusum double, "
        "cusum_max double, argmax_idx bigint, alarm boolean"
    )
    t, sl = float(target), float(slack)

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        if state.exists:
            s, smax, imax, n = state.get
        else:
            s, smax, imax, n = 0.0, 0.0, 0, 0
        for pdf in pdfs:
            for y in pdf[value_col].astype(float):
                n += 1
                s = max(0.0, s + (y - t - sl))
                if s > smax:
                    smax, imax = s, n
        state.update((s, smax, imax, n))
        yield pd.DataFrame({
            key_col: [key[0]], "n_events": [n], "cusum": [s],
            "cusum_max": [smax], "argmax_idx": [imax],
            "alarm": [smax > threshold],
        })

    return events.select(key_col, value_col).groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType="s double, smax double, imax bigint, n bigint",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
