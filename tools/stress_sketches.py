"""Scale stress for the round-5 operators: Bloom/CMS sketches,
bloom-prefiltered join, bigram LM, hashed classifier, weighted sample.

Same philosophy as tools/stress.py: synthesize a 10M-row events table
and a 100k-doc corpus by exploding sf0.1 with perturbed keys (no
testdata mutation, output in /tmp), then check the plans still run flat
— no memory blowups, no single-task stages, runtimes scaling with data
not with stage count.

Run:  python tools/stress_sketches.py [events_replicas] [doc_replicas]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kafka_stream_aggregator_spark.llm.pipeline import bigram_logprob
from kafka_stream_aggregator_spark.session import get_spark
from kafka_stream_aggregator_spark.sketches import (
    bloom_build,
    bloom_prefilter,
    cms_build,
    cms_estimate,
)
from kafka_stream_aggregator_spark.tables import load_table


def tt(label, thunk):
    t0 = time.time()
    n = thunk()
    print(f"{label:45s} {time.time() - t0:7.1f}s  ({n:,} rows)")


def main() -> None:
    ev_reps = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    doc_reps = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    spark = get_spark("stress-sketches")

    base = load_table(spark, "/root/testdata/sf0.1", "events")
    ev_dir = tempfile.mkdtemp(prefix="stress_sk_events_")
    r = F.explode(F.sequence(F.lit(0), F.lit(ev_reps - 1))).alias("r")
    (
        base.select("*", r)
        .select(
            (F.col("event_id") + F.col("r") * 1_000_000).alias("event_id"),
            (F.col("user_id") + F.col("r") * 10_000).alias("user_id"),
            "event_type",
            "value",
        )
        .write.mode("overwrite")
        .parquet(ev_dir)
    )
    ev = spark.read.parquet(ev_dir)
    n_ev = ev.count()
    print(f"events: {n_ev:,} rows")

    docs = load_table(spark, "/root/testdata/sf0.1", "documents")
    doc_dir = tempfile.mkdtemp(prefix="stress_sk_docs_")
    rd = F.explode(F.sequence(F.lit(0), F.lit(doc_reps - 1))).alias("r")
    (
        docs.select("*", rd)
        .select(
            (F.col("doc_id") + F.col("r") * 1_000_000).alias("doc_id"),
            # perturb text per replica so vocab isn't a pure 20x copy
            F.concat(F.col("text"), F.lit(" rep"), F.col("r").cast("string")).alias(
                "text"
            ),
            "lang",
            "n_chars",
        )
        .write.mode("overwrite")
        .parquet(doc_dir)
    )
    dd = spark.read.parquet(doc_dir)
    print(f"documents: {dd.count():,} rows")

    # 1. Bloom: build over ~1% of users, prefilter the 10M-row stream.
    # Both hash tiers: portable (md5, oracle-replayable) vs xx64
    # (xxhash64, the production default).
    hot = ev.select("user_id").distinct().filter(F.col("user_id") % 100 == 0)
    M, K = 1 << 22, 4
    for hasher in ("portable", "xx64"):
        blooms = {}
        tt(
            f"bloom_build[{hasher}] (1% users, m=2^22)",
            lambda: blooms.setdefault(
                "b",
                bloom_build(hot, "user_id", M, K, hasher=hasher).localCheckpoint(
                    eager=True
                ),
            ).count(),
        )
        tt(
            f"bloom_prefilter[{hasher}] ({n_ev/1e6:.0f}M rows, k={K})",
            lambda: bloom_prefilter(
                ev, "user_id", blooms["b"], M, K, hasher=hasher
            ).count(),
        )

    # 2. CMS over the full event stream, both hash tiers
    for hasher in ("portable", "xx64"):
        sks = {}
        tt(
            f"cms_build[{hasher}] (10M rows, 4x4096)",
            lambda: sks.setdefault(
                "s",
                cms_build(ev, "user_id", 4, 4096, hasher=hasher).localCheckpoint(
                    eager=True
                ),
            ).count(),
        )
        heavy = ev.groupBy("user_id").count().orderBy(F.desc("count")).limit(100)
        tt(
            f"cms_estimate[{hasher}] (top-100 users)",
            lambda: cms_estimate(
                heavy, "user_id", sks["s"], 4, 4096, hasher=hasher
            ).count(),
        )

    # 3. Weighted sample per event_type over 10M rows
    from kafka_stream_aggregator_spark.sketches import portable_u64
    from pyspark.sql import Window as W

    w = W.partitionBy("event_type").orderBy(F.col("pri").desc(), "event_id")
    u_portable = (
        (portable_u64(F.col("event_id"), salt="ws") % F.lit(9007199254740992)) + 1
    ) / F.lit(9007199254740992.0)
    u_xx64 = (
        (F.pmod(F.xxhash64("event_id", F.lit("ws")), F.lit(9007199254740992)) + 1)
        / F.lit(9007199254740992.0)
    )

    def weighted(u):
        def run():
            return (
                ev.select(
                    "event_id",
                    "event_type",
                    (F.log(u) / (F.col("value") + 1e9)).alias("pri"),
                )
                .withColumn("rk", F.row_number().over(w))
                .filter(F.col("rk") <= 100)
                .count()
            )

        return run

    tt("weighted sample[portable] (10M, top-100/type)", weighted(u_portable))
    tt("weighted sample[xx64] (10M, top-100/type)", weighted(u_xx64))

    # 4. Bigram LM over the exploded corpus
    tt(
        f"bigram_logprob ({doc_reps * 5000 / 1000:.0f}k docs)",
        lambda: bigram_logprob(dd, "doc_id", "text").count(),
    )

    print("done")


if __name__ == "__main__":
    main()
