"""Streaming SCD2 fact-interval maintenance — the incremental twin of
``pipeline/triples.fact_intervals``: observations of (fact, day) arrive in
micro-batches (a continuous recrawl), per-fact state tracks the OPEN
validity run, and an interval is emitted exactly when a later observation
closes it (gap > GAP_DAYS). The batch operator recomputes the whole
gaps-and-islands table per snapshot; this one maintains it forever with
one small state row per fact.

Scale posture: state = three longs per DISTINCT fact (bounded by the fact
universe, not the observation stream); partitioning is on the fact key —
the same key the batch aggregate shuffles on. A hot fact (a headline
entity re-observed every crawl cycle) is ONE state row updated per batch,
never a skew key. Closed intervals are append-only output — exactly the
Iceberg-style fact-history table the batch job writes, built
incrementally.

Determinism: within a micro-batch days are sorted before the walk, so
emission is independent of arrival order inside the batch; across batches
the walk order is the stream order, which is the crawl's own time order —
the restart test pins both (state survives the checkpoint, a closed
interval is never re-emitted, the open run closes correctly after
restart).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

GAP_DAYS = 7

OBS_SCHEMA = T.StructType(
    [
        T.StructField("fact_key", T.StringType()),
        T.StructField("day", T.LongType()),
    ]
)

INTERVAL_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("fact_key", T.StringType()),
        T.StructField("valid_from_day", T.LongType()),
        T.StructField("valid_to_day", T.LongType()),
        T.StructField("n_obs", T.LongType()),
    ]
)
INTERVAL_STATE_SCHEMA = T.StructType(
    [
        T.StructField("run_start", T.LongType()),
        T.StructField("last_day", T.LongType()),
        T.StructField("n_obs", T.LongType()),
    ]
)


def _interval_update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    days = sorted(int(d) for pdf in pdfs for d in pdf["day"])
    if state.exists:
        rs, ld, n = state.get
    else:
        rs = ld = n = None
    closed: list[tuple[int, int, int]] = []
    for d in days:
        if rs is None:
            rs, ld, n = d, d, 1
        elif d - ld > GAP_DAYS:
            closed.append((rs, ld, n))
            rs, ld, n = d, d, 1
        else:
            # late arrivals inside the gap extend observation count; the
            # run end only moves forward
            ld = max(ld, d)
            n += 1
    state.update((rs, ld, n))
    if closed:
        yield pd.DataFrame(
            {
                "fact_key": [key[0]] * len(closed),
                "valid_from_day": [c[0] for c in closed],
                "valid_to_day": [c[1] for c in closed],
                "n_obs": [c[2] for c in closed],
            }
        )


def interval_closer(observations: DataFrame) -> DataFrame:
    """Streaming (fact_key, day) -> one row per CLOSED validity interval
    (a later observation arrived more than GAP_DAYS after the run's end).
    The still-open run lives in state and is emitted by the batch that
    eventually closes it — or never, matching SCD2 current-row
    semantics."""
    return observations.groupBy("fact_key").applyInPandasWithState(
        _interval_update,
        outputStructType=INTERVAL_OUTPUT_SCHEMA,
        stateStructType=INTERVAL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_fact_intervals(
    spark: Any,
    src_dir: str,
    out_dir: str,
    checkpoint_dir: str,
):
    """File-source stream of observations -> closed-interval parquet
    append. State (the open run per fact) survives restarts through
    ``checkpoint_dir``: a re-run closes runs opened before the
    interruption without re-emitting anything already closed."""
    obs = (
        spark.readStream.schema(OBS_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(src_dir)
    )
    return (
        interval_closer(obs)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
