"""Registry rows driving the transaction-log table format
(kafka_stream_aggregator_spark/lakehouse.py) end to end with a SQL
oracle: three committed versions (append, append, copy-on-write MERGE)
read back via TIME TRAVEL after all commits — the oracle replays each
snapshot's relational definition from the raw table, so the log fold,
snapshot isolation, and merge semantics are all hash-verified.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from .base import query, t


def _qtmp(name: str, sf_dir: str) -> str:
    """Deterministic per-(query, tier) table dir, WIPED at the start
    of each call (ADVICE r8: mkdtemp tables accumulated forever). The
    dir must outlive the returned lazy DataFrame, so cleanup happens
    on the NEXT invocation, not after this one."""
    d = os.path.join(
        tempfile.gettempdir(),
        "ksa_lakehouse",
        f"{name}-{os.path.basename(os.path.normpath(sf_dir))}",
    )
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d, exist_ok=True)
    return d


@query(
    "io_lakehouse_time_travel",
    # v0 = orders < 2000 (append); v1 = + [2000, 3000) (append);
    # v2 = MERGE(source = doubled totals for okey < 500 UNION inserts
    # [3000, 3200)). All three versions are read AFTER the final
    # commit — time travel over immutable files — and reduced to
    # (n_rows, integer cents).
    oracle="""
    WITH v0 AS (
      SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey < 2000
    ), v1 AS (
      SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey < 3000
    ), src AS (
      SELECT o_orderkey, o_totalprice * 2 AS o_totalprice
      FROM orders WHERE o_orderkey < 500
      UNION ALL
      SELECT o_orderkey, o_totalprice
      FROM orders WHERE o_orderkey >= 3000 AND o_orderkey < 3200
    ), v2 AS (
      SELECT * FROM v1
      WHERE o_orderkey NOT IN (SELECT o_orderkey FROM src)
      UNION ALL SELECT * FROM src
    ), u AS (
      SELECT CAST(0 AS BIGINT) AS version, * FROM v0
      UNION ALL SELECT 1, * FROM v1
      UNION ALL SELECT 2, * FROM v2
    )
    SELECT version, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                AS BIGINT) AS cents
    FROM u GROUP BY version
    """,
)
def io_lakehouse_time_travel(spark, sf_dir):
    """Append, append, MERGE — then read versions 0/1/2 via time
    travel and checksum each snapshot. The merge is the broadcast
    anti-join + union rewrite; the reads fold the JSON action log, so
    a wrong add/remove set or a non-isolated snapshot hash-mismatches
    the oracle."""
    from ..lakehouse import TxLogTable

    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    tbl = TxLogTable(_qtmp("tt", sf_dir))
    tbl.append(orders.filter(F.col("o_orderkey") < 2000))
    tbl.append(
        orders.filter(
            (F.col("o_orderkey") >= 2000) & (F.col("o_orderkey") < 3000)
        )
    )
    src = orders.filter(F.col("o_orderkey") < 500).select(
        "o_orderkey", (F.col("o_totalprice") * 2).alias("o_totalprice")
    ).unionByName(
        orders.filter(
            (F.col("o_orderkey") >= 3000) & (F.col("o_orderkey") < 3200)
        )
    )
    tbl.merge(spark, src, "o_orderkey")
    snaps = [
        tbl.read(spark, version=v).withColumn(
            "version", F.lit(v).cast("bigint")
        )
        for v in (0, 1, 2)
    ]
    u = snaps[0].unionByName(snaps[1]).unionByName(snaps[2])
    return u.groupBy("version").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
        .cast("bigint")
        .alias("cents"),
    )


@query(
    "io_lakehouse_partition_overwrite",
    # Transactional dynamic-partition overwrite on the txlog table:
    # v0 = events partitioned by event_type; v1 = ONLY the 'click'
    # partition rewritten with doubled values (other partitions'
    # files untouched — pinned at the file level in
    # tests/test_lakehouse.py). Both versions read after the final
    # commit; oracle replays each snapshot relationally.
    oracle="""
    WITH v0 AS (
      SELECT event_type, value FROM events
    ), v1 AS (
      SELECT event_type,
             CASE WHEN event_type = 'click' THEN value * 2
                  ELSE value END AS value
      FROM events
    ), u AS (
      SELECT CAST(0 AS BIGINT) AS version, * FROM v0
      UNION ALL SELECT 1, * FROM v1
    )
    SELECT version, event_type, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
             AS cents
    FROM u GROUP BY version, event_type
    """,
)
def io_lakehouse_partition_overwrite(spark, sf_dir):
    """Partition-scoped rewrite through the transaction log: the
    commit's removed-set is exactly the target partition's live files,
    so every other partition is byte-untouched AND the previous
    version still time-travels to the pre-backfill state."""
    from ..lakehouse import TxLogTable

    ev = t(spark, sf_dir, "events").select("event_type", "value")
    tbl = TxLogTable(_qtmp("po", sf_dir))
    tbl.append_partitioned(ev, "event_type")
    fixed = ev.filter(F.col("event_type") == "click").select(
        "event_type", (F.col("value") * 2).alias("value")
    )
    tbl.overwrite_partition(fixed, "event_type", "click")
    snaps = [
        tbl.read(spark, version=v).withColumn(
            "version", F.lit(v).cast("bigint")
        )
        for v in (0, 1)
    ]
    u = snaps[0].unionByName(snaps[1])
    return u.groupBy("version", "event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(F.round(F.col("value") * 100, 0).cast("bigint"))
        .cast("bigint")
        .alias("cents"),
    )


@query(
    "io_lakehouse_compact",
    # OPTIMIZE: three appended slices compacted to one file; the tip
    # row set must be bit-identical post-compaction and the
    # pre-compaction version must still time-travel. Oracle replays
    # both snapshots relationally.
    oracle="""
    WITH v1 AS (
      SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey < 1000
    ), v3 AS (
      SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey < 2500
    ), u AS (
      SELECT CAST(1 AS BIGINT) AS version, * FROM v1
      UNION ALL SELECT 3, * FROM v3
    )
    SELECT version, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                AS BIGINT) AS cents
    FROM u GROUP BY version
    """,
)
def io_lakehouse_compact(spark, sf_dir):
    """append x3 -> compact(1 file) -> read the compacted tip (v3) AND
    time-travel to v1 (a pre-compaction snapshot whose files the
    compaction did NOT delete). n_files collapse is asserted in
    tests/test_lakehouse.py; the oracle hash-checks both row sets."""
    from ..lakehouse import TxLogTable

    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    tbl = TxLogTable(_qtmp("co", sf_dir))
    tbl.append(orders.filter(F.col("o_orderkey") < 500))
    tbl.append(
        orders.filter(
            (F.col("o_orderkey") >= 500) & (F.col("o_orderkey") < 1000)
        )
    )
    tbl.append(
        orders.filter(
            (F.col("o_orderkey") >= 1000) & (F.col("o_orderkey") < 2500)
        )
    )
    tbl.compact(spark, target_files=1)
    u = tbl.read(spark, version=1).withColumn(
        "version", F.lit(1).cast("bigint")
    ).unionByName(
        tbl.read(spark, version=3).withColumn(
            "version", F.lit(3).cast("bigint")
        )
    )
    return u.groupBy("version").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
        .cast("bigint")
        .alias("cents"),
    )


@query(
    "stream_lakehouse_ingest",
    # NINTH exactly-oracled streaming op: Structured Streaming writes
    # INTO the transaction-log table via foreachBatch, committing each
    # micro-batch as version = batch_id — a replayed batch hits
    # CommitConflict and is SKIPPED, which is exactly-once sink
    # semantics by idempotent versioning (the Delta streaming-sink
    # txn pattern). The final table is the union of all micro-batches
    # regardless of batching, so the batch oracle is exact.
    oracle="""
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
             AS cents
    FROM events GROUP BY event_type
    """,
)
def stream_lakehouse_ingest(spark, sf_dir):
    """File-stream of events -> foreachBatch -> one txlog commit per
    micro-batch (version = batch_id; conflict = already-committed
    replay, skipped). Drains with availableNow, then reads the TABLE
    (not the stream) for the per-type checksum."""
    from ..lakehouse import CommitConflict, TxLogTable
    from .streaming_q import _events_stream

    tbl = TxLogTable(_qtmp("si", sf_dir))

    def sink(batch_df, batch_id):
        files = tbl._write_files(
            batch_df.select("event_type", "value")
        )
        try:
            tbl._commit(int(batch_id), "stream_append", files, [])
        except CommitConflict:
            # replayed micro-batch: already durable. The just-written
            # files lost the race and are in NO commit — vacuum()
            # can't see them (it walks 'added' sets), so delete them
            # here or they orphan forever (ADVICE r8).
            for f in files:
                p = os.path.join(tbl.path, f)
                if os.path.exists(p):
                    os.unlink(p)

    s = _events_stream(spark, sf_dir)
    q = (
        s.writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return tbl.read(spark).groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(F.round(F.col("value") * 100, 0).cast("bigint"))
        .cast("bigint")
        .alias("cents"),
    )


@query(
    "io_lakehouse_schema_evolution",
    # Schema evolution on read: v0 is committed WITHOUT o_orderstatus,
    # v1 adds it; the tip read null-fills the old batch's missing
    # column (allowMissingColumns union), and time travel to v0 still
    # returns the narrow schema's rows. Oracle replays the evolved
    # relation with NULL status for the pre-evolution slice.
    oracle="""
    WITH v AS (
      SELECT o_orderkey, o_totalprice, CAST(NULL AS VARCHAR) AS st
      FROM orders WHERE o_orderkey < 1500
      UNION ALL
      SELECT o_orderkey, o_totalprice, o_orderstatus
      FROM orders WHERE o_orderkey >= 1500 AND o_orderkey < 3000
    )
    SELECT coalesce(st, 'PRE_EVOLUTION') AS status,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                AS BIGINT) AS cents
    FROM v GROUP BY coalesce(st, 'PRE_EVOLUTION')
    """,
)
def io_lakehouse_schema_evolution(spark, sf_dir):
    """Widen the table schema mid-history: the pre-evolution batch
    null-fills the new column on the merged read — no rewrite of old
    files, the lakehouse evolution contract."""
    from ..lakehouse import TxLogTable

    orders = t(spark, sf_dir, "orders")
    tbl = TxLogTable(_qtmp("se", sf_dir))
    tbl.append(
        orders.filter(F.col("o_orderkey") < 1500).select(
            "o_orderkey", "o_totalprice"
        )
    )
    tbl.append(
        orders.filter(
            (F.col("o_orderkey") >= 1500) & (F.col("o_orderkey") < 3000)
        ).select(
            "o_orderkey",
            "o_totalprice",
            F.col("o_orderstatus").alias("st"),
        )
    )
    tip = tbl.read(spark)
    return tip.groupBy(
        F.coalesce(F.col("st"), F.lit("PRE_EVOLUTION")).alias("status")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
        .cast("bigint")
        .alias("cents"),
    )


@query(
    "io_lakehouse_data_skipping",
    # Z-ORDER + log-stats pruning, hash-verified: ingest a lineitem
    # slice fragmented, OPTIMIZE ZORDER by (partkey, suppkey), then
    # answer a partkey-range aggregate THROUGH read_pruned (which
    # skips non-overlapping files using the log-recorded stats). The
    # oracle filters the raw table — a wrong prune drops rows and
    # hash-mismatches.
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(round(l_quantity, 0) AS BIGINT)) AS BIGINT)
             AS total_qty,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers
    FROM lineitem
    WHERE l_orderkey < 4000 AND l_partkey BETWEEN 10 AND 60
    """,
)
def io_lakehouse_data_skipping(spark, sf_dir):
    """The skipping path as a verified query: files pruned from the
    LOG must still return exactly the relational answer."""
    from ..lakehouse import TxLogTable

    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey") < 4000
    ).select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")
    tbl = TxLogTable(_qtmp("ds", sf_dir))
    tbl.append(li.repartition(8))
    tbl.compact(
        spark, target_files=8, zorder_by=("l_partkey", "l_suppkey")
    )
    df, _scanned, _total = tbl.read_pruned(spark, "l_partkey", 10, 60)
    return df.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(F.round("l_quantity", 0).cast("bigint"))
        .cast("bigint")
        .alias("total_qty"),
        F.countDistinct("l_suppkey").cast("bigint").alias("n_suppliers"),
    )


@query(
    "io_lakehouse_merge",
    # Dedicated CoW MERGE row (VERDICT r8 item 5): a CDC batch of
    # updates (status flip + repriced totals for okey < 800) and
    # inserts ([3000, 3300)) merged into a 3000-order base. BOTH the
    # post-merge tip and the PRE-merge version are read after the
    # commit — the pre-merge snapshot must replay byte-stable (its
    # files are immutable; the merge only adds/removes log entries).
    # A second, identical merge() is applied before reading: MERGE of
    # the same CDC batch is idempotent by definition (update rows
    # overwrite to the same values, insert keys now match-update), so
    # the oracle also pins replay-idempotence relationally.
    oracle="""
    WITH base AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice
      FROM orders WHERE o_orderkey < 3000
    ), cdc AS (
      SELECT o_orderkey, 'R' AS o_orderstatus,
             o_totalprice * 0.9 AS o_totalprice
      FROM orders WHERE o_orderkey < 800
      UNION ALL
      SELECT o_orderkey, o_orderstatus, o_totalprice
      FROM orders WHERE o_orderkey >= 3000 AND o_orderkey < 3300
    ), merged AS (
      SELECT * FROM base
      WHERE o_orderkey NOT IN (SELECT o_orderkey FROM cdc)
      UNION ALL SELECT * FROM cdc
    ), u AS (
      SELECT CAST(0 AS BIGINT) AS version, * FROM base
      UNION ALL SELECT 2, * FROM merged
    )
    SELECT version, o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                AS BIGINT) AS cents
    FROM u GROUP BY version, o_orderstatus
    """,
)
def io_lakehouse_merge(spark, sf_dir):
    """CDC upsert through the transaction log: broadcast anti-join +
    union rewrite, committed copy-on-write. Applied TWICE with the
    same batch (replay) — the tip must be a fixed point — and the
    pre-merge version is read post-commit for byte-stable time
    travel. Both snapshots hash against the relational oracle."""
    from ..lakehouse import TxLogTable

    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    tbl = TxLogTable(_qtmp("mg", sf_dir))
    tbl.append(orders.filter(F.col("o_orderkey") < 3000))
    cdc = orders.filter(F.col("o_orderkey") < 800).select(
        "o_orderkey",
        F.lit("R").alias("o_orderstatus"),
        (F.col("o_totalprice") * 0.9).alias("o_totalprice"),
    ).unionByName(
        orders.filter(
            (F.col("o_orderkey") >= 3000) & (F.col("o_orderkey") < 3300)
        )
    )
    tbl.merge(spark, cdc, "o_orderkey")
    tbl.merge(spark, cdc, "o_orderkey")  # replay: must be a fixed point
    u = tbl.read(spark, version=0).withColumn(
        "version", F.lit(0).cast("bigint")
    ).unionByName(
        tbl.read(spark, version=2).withColumn(
            "version", F.lit(2).cast("bigint")
        )
    )
    return u.groupBy("version", "o_orderstatus").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
        .cast("bigint")
        .alias("cents"),
    )


@query(
    "io_lakehouse_skipping_2d",
    # Two-dimensional data skipping (VERDICT r8 item 6): the Morton
    # layout's whole point is that a CONJUNCTIVE box predicate on both
    # zorder_by columns prunes files in both dimensions. The query
    # answers a (partkey, suppkey) box THROUGH read_pruned_where and
    # asserts in-flight that the scan is a STRICT file subset; the
    # oracle replays the box on the raw table, so a wrong prune
    # hash-mismatches.
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(round(l_quantity, 0) AS BIGINT)) AS BIGINT)
             AS total_qty,
           CAST(sum(CAST(l_orderkey AS BIGINT)) AS BIGINT) AS okey_sum
    FROM lineitem
    WHERE l_orderkey < 4000
      AND l_partkey BETWEEN 5 AND 40 AND l_suppkey BETWEEN 1 AND 4
    """,
)
def io_lakehouse_skipping_2d(spark, sf_dir):
    """Conjunctive two-column pruning over the Z-ordered layout: the
    log-recorded per-file [min, max] of BOTH Morton dimensions must
    each overlap the box for a file to be scanned. The strict-subset
    assertion fails the query outright if the layout ever stops
    pruning — a silent full scan is a perf regression, not a pass."""
    from ..lakehouse import TxLogTable

    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey") < 4000
    ).select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")
    tbl = TxLogTable(_qtmp("ds2", sf_dir))
    tbl.append(li.repartition(8))
    tbl.compact(
        spark, target_files=16, zorder_by=("l_partkey", "l_suppkey")
    )
    df, scanned, total = tbl.read_pruned_where(
        spark, {"l_partkey": (5, 40), "l_suppkey": (1, 4)}
    )
    if not scanned < total:
        raise AssertionError(
            f"2-d skip degenerated to a full scan ({scanned}/{total})"
        )
    return df.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(F.round("l_quantity", 0).cast("bigint"))
        .cast("bigint")
        .alias("total_qty"),
        F.sum(F.col("l_orderkey").cast("bigint"))
        .cast("bigint")
        .alias("okey_sum"),
    )


@query(
    "io_lakehouse_check_constraint",
    # Delta-style CHECK constraints: recorded in the log as an ALTER
    # action (existing data must already satisfy it), enforced on
    # every later write — a violating batch is rejected WHOLE (no
    # partial append), a conforming batch lands. The oracle replays
    # only the writes that must survive, so a leaked bad row (or a
    # wrongly-rejected good batch) hash-mismatches.
    oracle="""
    WITH keep AS (
      SELECT o_orderkey, o_totalprice FROM orders
      WHERE o_orderkey < 1500 AND o_totalprice > 0
      UNION ALL
      SELECT o_orderkey, o_totalprice FROM orders
      WHERE o_orderkey >= 1500 AND o_orderkey < 2500
        AND o_totalprice > 0
    )
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                AS BIGINT) AS cents,
           CAST(count(CASE WHEN o_totalprice <= 0 THEN 1 END)
                AS BIGINT) AS n_violations_leaked
    FROM keep
    """,
)
def io_lakehouse_check_constraint(spark, sf_dir):
    """ADD CONSTRAINT CHECK(o_totalprice > 0) after a conforming
    base append; then one conforming batch (lands), one poisoned
    batch with negated totals (rejected whole via
    ConstraintViolation), and a drop+re-add cycle proving the log
    fold. Tip must equal exactly base + the good batch."""
    from ..lakehouse import ConstraintViolation, TxLogTable

    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    tbl = TxLogTable(_qtmp("cc", sf_dir))
    tbl.append(
        orders.filter(
            (F.col("o_orderkey") < 1500) & (F.col("o_totalprice") > 0)
        )
    )
    tbl.add_constraint(spark, "positive_total", "o_totalprice > 0")
    good = orders.filter(
        (F.col("o_orderkey") >= 1500)
        & (F.col("o_orderkey") < 2500)
        & (F.col("o_totalprice") > 0)
    )
    tbl.append(good)
    # poisoned batch from the ALWAYS-present key range (sf0.001 has
    # no keys >= 2500 — an empty "bad" batch vacuously passes)
    bad = orders.filter(F.col("o_orderkey") < 500).select(
        "o_orderkey", (-F.col("o_totalprice")).alias("o_totalprice")
    )
    try:
        tbl.append(bad)
        raise AssertionError("poisoned batch was not rejected")
    except ConstraintViolation:
        pass
    # drop + re-add proves the fold handles both actions; re-add
    # validates the EXISTING table (all positive) and succeeds
    tbl.drop_constraint("positive_total")
    tbl.add_constraint(spark, "positive_total", "o_totalprice > 0")
    assert tbl.constraints() == {"positive_total": "o_totalprice > 0"}
    return tbl.read(spark).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
        .cast("bigint")
        .alias("cents"),
        F.count_if(F.col("o_totalprice") <= 0)
        .cast("bigint")
        .alias("n_violations_leaked"),
    )


@query(
    "io_lakehouse_change_feed",
    # Change data feed across a MERGE: base (okey < 2000) -> CoW
    # MERGE(repriced okey < 300 + inserts [2000, 2200)). The feed
    # between v0 and v1 must show each repriced row as delete+insert
    # (the CDF rewrite convention) and each new key as insert only.
    # Oracle derives the same bag-diff relationally.
    oracle="""
    WITH base AS (
      SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey < 2000
    ), cdc AS (
      SELECT o_orderkey, o_totalprice * 3 AS o_totalprice
      FROM orders WHERE o_orderkey < 300
      UNION ALL
      SELECT o_orderkey, o_totalprice
      FROM orders WHERE o_orderkey >= 2000 AND o_orderkey < 2200
    ), merged AS (
      SELECT * FROM base
      WHERE o_orderkey NOT IN (SELECT o_orderkey FROM cdc)
      UNION ALL SELECT * FROM cdc
    ), feed AS (
      SELECT 'insert' AS _change_type, * FROM (
        SELECT * FROM merged EXCEPT ALL SELECT * FROM base) i
      UNION ALL
      SELECT 'delete' AS _change_type, * FROM (
        SELECT * FROM base EXCEPT ALL SELECT * FROM merged) d
    )
    SELECT _change_type,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
           CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                AS BIGINT) AS cents
    FROM feed GROUP BY _change_type
    """,
)
def io_lakehouse_change_feed(spark, sf_dir):
    """CDF over the transaction log: bag-diff of two immutable
    snapshots (exceptAll both directions), reduced per change type.
    The repriced keys must appear on BOTH sides, inserts only on
    one — a wrong snapshot fold or diff direction hash-mismatches."""
    from ..lakehouse import TxLogTable

    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    tbl = TxLogTable(_qtmp("cf", sf_dir))
    tbl.append(orders.filter(F.col("o_orderkey") < 2000))
    cdc = orders.filter(F.col("o_orderkey") < 300).select(
        "o_orderkey", (F.col("o_totalprice") * 3).alias("o_totalprice")
    ).unionByName(
        orders.filter(
            (F.col("o_orderkey") >= 2000) & (F.col("o_orderkey") < 2200)
        )
    )
    tbl.merge(spark, cdc, "o_orderkey")
    feed = tbl.read_changes(spark, 0, 1)
    return feed.groupBy("_change_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("o_orderkey").cast("bigint").alias("key_sum"),
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
        .cast("bigint")
        .alias("cents"),
    )
