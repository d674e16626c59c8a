"""Incremental (streaming) MinHash-LSH near-duplicate detection.

The streaming twin of ``llm.dedup.minhash_near_dup``: documents arrive
on a stream, and each is checked against every previously-seen doc
that shares a band bucket — the accumulated LSH index lives in the
state store, partitioned by (band, bucket).

Design for scale:

* Signatures are computed PER ROW with column expressions (shingle
  array -> hashed array -> k array_min's) — identical hash
  construction to the batch operator (pinned by test), but with no
  groupBy: a streaming aggregation feeding the stateful op would be a
  chained-stateful topology with append-mode caveats; row-wise needs
  none of that.
* The state key is the band bucket, so the stream shuffles once on
  (band, bucket) and each bucket's member list lives on one partition
  — the same co-location the batch operator gets from its bucket
  join. State per bucket is (ids, signatures): 8(1+k) bytes per
  member, capped at ``max_bucket_size`` members (the cap is the
  streaming analog of the batch star guard: a degenerate bucket stops
  absorbing members but KEEPS flagging new arrivals against the
  stored sample, so boilerplate floods cannot grow state unboundedly).
* Verification is the signature-estimated Jaccard (fraction of
  agreeing min-hashes) — exact shingle verification would require
  storing shingle sets in state (O(doc) per member instead of O(k)).
  The estimate's standard error is ~1/sqrt(k) (k=32 -> ~0.18); batch
  re-verification of flagged pairs is the exactness path.
* A pair sharing several band buckets is emitted once per bucket
  (at-least-once flagging); consumers dedup on (id_a, id_b) — the
  registry query does exactly that.
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..llm.dedup import _shingles


def rowwise_signature(
    text_col, n_hashes: int = 32, shingle_len: int = 3
) -> F.Column:
    """Per-row MinHash signature as a pure column expression — the same
    (xxhash64 shingle -> seeded re-hash -> min) construction as
    llm.dedup.minhash_signatures, so batch and stream signatures are
    bit-identical (tested)."""
    sh = F.transform(
        _shingles(text_col, shingle_len), lambda s: F.xxhash64(s)
    )
    return F.array(
        *[
            F.array_min(F.transform(sh, lambda x: F.xxhash64(x, F.lit(k))))
            for k in range(n_hashes)
        ]
    )


def band_buckets(sig_col, n_hashes: int, bands: int) -> F.Column:
    """Array of (band, bucket) structs — identical bucket hash to the
    batch operator's banding."""
    rows = n_hashes // bands
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.struct(
            b.cast("int").alias("band"),
            F.xxhash64(
                F.array_join(
                    F.transform(
                        F.slice(sig_col, b * rows + 1, rows),
                        lambda x: x.cast("string"),
                    ),
                    ",",
                )
            ).alias("bucket"),
        ),
    )


_OUT_SCHEMA = T.StructType(
    [
        T.StructField("id_a", T.LongType()),
        T.StructField("id_b", T.LongType()),
        T.StructField("band", T.IntegerType()),
        T.StructField("est_jaccard", T.DoubleType()),
    ]
)
_STATE_SCHEMA = "ids array<bigint>, sigs array<bigint>"


def streaming_near_dup(
    stream: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 32,
    bands: int = 8,
    shingle_len: int = 3,
    jaccard_threshold: float = 0.5,
    max_bucket_size: int = 256,
) -> DataFrame:
    """Stream of candidate near-dup pairs (id_a < id_b, one row per
    shared band bucket, est_jaccard = matching-minhash fraction >=
    threshold). New docs are compared against the bucket's accumulated
    members AND against each other within the micro-batch, then added
    to state (up to ``max_bucket_size`` per bucket)."""
    sig = rowwise_signature(F.col(text_col), n_hashes, shingle_len)
    banded = stream.select(
        F.col(id_col).alias("__id"), sig.alias("__sig")
    ).select(
        "__id",
        "__sig",
        F.explode(band_buckets(F.col("__sig"), n_hashes, bands)).alias("bb"),
    ).select(
        F.col("bb.band").alias("band"),
        F.col("bb.bucket").alias("bucket"),
        "__id",
        "__sig",
    )

    def update(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        band = int(key[0])
        ids: list[int]
        sigs: list[int]
        if state.exists:
            stored_ids, stored_sigs = state.get
            ids = list(stored_ids)
            sigs = list(stored_sigs)
        else:
            ids, sigs = [], []
        batch = pd.concat(list(pdfs), ignore_index=True)
        # determinism: arrival order within a micro-batch is not
        # guaranteed; id order is
        batch = batch.sort_values("__id")
        out = []
        for _, row in batch.iterrows():
            nid = int(row["__id"])
            nsig = [int(x) for x in row["__sig"]]
            n_members = len(ids)
            for j in range(n_members):
                oid = ids[j]
                if oid == nid:
                    continue
                osig = sigs[j * n_hashes : (j + 1) * n_hashes]
                m = sum(1 for a, b in zip(nsig, osig) if a == b)
                est = m / n_hashes
                if est >= jaccard_threshold:
                    a, b = (oid, nid) if oid < nid else (nid, oid)
                    out.append((a, b, band, est))
            if n_members < max_bucket_size:
                ids.append(nid)
                sigs.extend(nsig)
        state.update((ids, sigs))
        yield pd.DataFrame(
            out, columns=["id_a", "id_b", "band", "est_jaccard"]
        )

    return banded.groupBy("band", "bucket").applyInPandasWithState(
        update,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
