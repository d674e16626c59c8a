"""Streaming heavy hitters — Misra-Gries summaries carried in stream
state, hash-sharded over the item domain.

The streaming twin of ``ops.approx_heavy_hitters`` (the mergeable batch
MG summary): the unbounded item stream is shuffled once on
``shard = pmod(xxhash64(item), n_shards)``, and each shard maintains ONE
Misra-Gries summary of at most ``k`` counters in the state store. An
item belongs to exactly one shard, so there is no cross-shard merge
step — the global answer is the union of shard summaries, and the MG
guarantee composes per shard: every reported count is a lower bound
within ``n_shard/(k+1)`` of the truth, and any item with true frequency
above that bound is guaranteed present.

Feeding micro-batches into an MG summary in arrival order IS the MG
algorithm (it is a one-pass streaming algorithm); carrying the counter
dict across micro-batches in ``applyInPandasWithState`` state changes
nothing about the guarantee.

100 TB design: state is O(k) per shard — ``n_shards * k`` counters
TOTAL, independent of stream length and item cardinality; this is the
bounded-state answer to "top talkers forever" that a raw
``groupBy(item).count()`` stream (state per distinct item, unbounded)
cannot give. Each micro-batch is pre-aggregated vectorized
(``value_counts``) so the Python merge touches each distinct item once
per batch, not each row.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# items/counts as parallel arrays (state schemas cannot hold maps),
# n = total weight seen by this shard (the error-bound denominator),
# seq = explicit per-shard micro-batch counter (ADVICE r5: batch_seq
# used to alias the cumulative weight n, whose recency ordering only
# held for strictly-positive integer weights).
STATE_SCHEMA = "items array<string>, counts array<long>, n long, seq long"


def _mg_merge(counters: dict[str, int], vc: "pd.Series", k: int) -> None:
    """Fold a (item -> weight) batch into an MG summary in place —
    the SAME weighted decrement rule as the batch summary, via the
    shared ops.mg_fold_item (one implementation of the guarantee, not
    two copies that can drift)."""
    from ..ops import mg_fold_item

    for item, w in vc.items():
        mg_fold_item(counters, item, int(w), k)


def stream_heavy_hitters(
    stream: DataFrame,
    item_col: str,
    k: int = 32,
    n_shards: int = 8,
) -> DataFrame:
    """Maintain per-shard MG(k) summaries across micro-batches.

    Emits the full current summary of a shard every micro-batch it
    receives data (update mode): rows
    ``(shard, item, count_lb, n_shard, batch_seq)``. The latest
    snapshot per shard (max batch_seq) is the live answer; ``count_lb``
    is the MG lower bound and ``n_shard/(k+1)`` its worst-case
    undercount.
    """
    out_schema = T.StructType(
        [
            T.StructField("shard", T.IntegerType()),
            T.StructField("item", T.StringType()),
            T.StructField("count_lb", T.LongType()),
            T.StructField("n_shard", T.LongType()),
            T.StructField("batch_seq", T.LongType()),
        ]
    )

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.exists:
            items, counts, n, seq = state.get
            counters = dict(zip(items, (int(c) for c in counts)))
        else:
            counters, n, seq = {}, 0, 0
        for pdf in pdfs:
            vc = pdf["_item"].value_counts(sort=False)
            n += int(vc.sum())
            _mg_merge(counters, vc, k)
        seq += 1  # true batch counter: recency holds for ANY weights
        state.update(
            (list(counters), [int(v) for v in counters.values()], int(n),
             int(seq))
        )
        shard = int(key[0])
        yield pd.DataFrame(
            {
                "shard": shard,
                "item": list(counters),
                "count_lb": [int(v) for v in counters.values()],
                "n_shard": int(n),
                "batch_seq": int(seq),
            }
        )

    sharded = stream.select(
        F.pmod(F.xxhash64(F.col(item_col).cast("string")), F.lit(n_shards))
        .cast("int")
        .alias("shard"),
        F.col(item_col).cast("string").alias("_item"),
    )
    return sharded.groupBy("shard").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def latest_snapshot(summary: DataFrame) -> DataFrame:
    """Reduce the update-mode emission history to the final summary:
    for each shard, keep only rows from its highest batch_seq.

    A max-per-group window (not a self-join: joining a memory-sink
    table against its own aggregate trips Spark's self-join resolution)
    — the emission history is tiny (k rows per shard per batch), so the
    per-shard window is nowhere near a scale concern."""
    w = W.partitionBy("shard")
    return (
        summary.withColumn("_max_seq", F.max("batch_seq").over(w))
        .filter(F.col("batch_seq") == F.col("_max_seq"))
        .select("shard", "item", "count_lb", "n_shard")
    )
