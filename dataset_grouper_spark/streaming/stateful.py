"""Custom stateful streaming operator: running byte-capped packing.

The streaming analogue of operators/packing.py — per group, admit
arriving rows while the group's accumulated byte total stays below the
limit, maintaining the running total in stream state
(``applyInPandasWithState``). This is the reference's MergeWithLimitFn
cap rule (beam_transforms.py:42-52: accept iff accumulated + size <
limit) applied continuously over an unbounded stream, which the
batch-only reference cannot express at all.

State per group: (admitted_count, admitted_bytes). Arrival order within
a micro-batch is made deterministic by sorting on the order column.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "group_id string, admitted long, admitted_bytes long, dropped long"
)
STATE_SCHEMA = "admitted long, admitted_bytes long"


def streaming_cap_pack(
    keyed: DataFrame,
    size_col: str,
    order_col: str,
    limit: int,
) -> DataFrame:
    """Per group, continuously: admit rows while the running byte sum
    stays < limit; emit (group_id, admitted, admitted_bytes, dropped)
    after each micro-batch. ``keyed`` must be a streaming DataFrame
    with a group_id column.
    """

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            admitted, admitted_bytes = state.get
        else:
            admitted, admitted_bytes = 0, 0
        dropped = 0
        # concatenate the WHOLE micro-batch before sorting: Arrow
        # delivers a group's batch as multiple chunks, and sorting each
        # chunk independently admits in chunk-arrival order, not
        # order_col order — wrong and nondeterministic whenever a
        # group's batch spans a chunk boundary. The materialized frame
        # is bounded by the group's rows in ONE micro-batch.
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            batch = pd.concat(chunks).sort_values(order_col)
            for sz in batch[size_col].astype("int64"):
                if admitted_bytes + int(sz) < limit:
                    admitted += 1
                    admitted_bytes += int(sz)
                else:
                    dropped += 1
        state.update((admitted, admitted_bytes))
        yield pd.DataFrame(
            {
                "group_id": [key[0]],
                "admitted": [admitted],
                "admitted_bytes": [admitted_bytes],
                "dropped": [dropped],
            }
        )

    return keyed.groupBy("group_id").applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
