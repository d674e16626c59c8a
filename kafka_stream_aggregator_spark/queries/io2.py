"""Storage-layout I/O operators, part 2.

Covers the remaining file-format and table-layout surface beyond
udf_io.py's csv/json/parquet/jdbc round-trips:

- ORC round-trip (Spark-native columnar alternative to parquet).
- Hive-style partitioned parquet write + partition-pruned read — THE
  directory-layout pattern for 100 TB datasets: a filter on the
  partition column never touches non-matching files at all (pruned at
  planning time, asserted in tests/test_plans.py).
- Deterministic train/val/test corpus split via md5 bucketing — the
  standard reproducible-split idiom for training-data pipelines (the
  split is a pure function of the row key, stable across runs, engines
  and cluster sizes; no sampling state).

Reference parity: the reference persists aggregates through a columnar
sink (SURVEY.md §2.A R10-R11); ORC/partitioned-parquet are the Spark
generalizations of that persistence surface.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .base import query, t


@query(
    "io_orc_roundtrip",
    oracle="""
    SELECT l_linestatus, count(*) AS n,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2)
                AS DOUBLE) AS rev
    FROM lineitem WHERE l_quantity < 10 GROUP BY l_linestatus
    """,
)
def io_orc_roundtrip(spark, sf_dir):
    """ORC sink + ORC scan preserve content exactly (predicate pushdown
    and column pruning apply to ORC scans the same as parquet)."""
    d = tempfile.mkdtemp(prefix="orc_rt_")
    t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") < 10).select(
        "l_linestatus", "l_extendedprice"
    ).write.mode("overwrite").orc(d)
    return (
        spark.read.orc(d)
        .groupBy("l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("rev"),
        )
    )


@query(
    "io_partitioned_pruning",
    oracle="""
    SELECT l_linestatus, count(*) AS n, round(sum(l_quantity), 6) AS qty
    FROM lineitem WHERE l_returnflag = 'R' GROUP BY l_linestatus
    """,
)
def io_partitioned_pruning(spark, sf_dir):
    """Hive-layout partitioned write + partition-pruned scan.

    ``partitionBy(l_returnflag)`` writes one directory per flag value;
    the subsequent filter on the partition column is resolved against
    directory names at PLANNING time (scan shows it under
    PartitionFilters with zero data filters), so at 100 TB a query over
    one partition reads only that partition's files — no I/O on the
    rest. This is the coarse-grained pruning tier that sits above
    parquet row-group min/max skipping.

    The write is cached so repeated calls (bench passes, parity runs)
    re-measure the pruned READ, not the write. The cache tag folds in a
    CONTENT fingerprint of the source files (name, size, mtime), not
    just the path — if the dataset at sf_dir is regenerated, the tag
    changes and the partitioned copy is rewritten instead of silently
    serving stale data.
    """
    import hashlib

    src = os.path.join(sf_dir, "lineitem.parquet")
    fp = hashlib.md5(sf_dir.encode())
    paths = [src]
    if os.path.isdir(src):
        paths = sorted(
            os.path.join(src, f) for f in os.listdir(src) if not f.startswith(".")
        )
    for p in paths:
        if os.path.exists(p):
            st = os.stat(p)
            fp.update(f"{p}|{st.st_size}|{st.st_mtime_ns}".encode())
    tag = fp.hexdigest()[:12]
    d = os.path.join(tempfile.gettempdir(), f"ksa_part_lineitem_{tag}")
    # content-fingerprint tags are unbounded across testdata
    # regenerations; sweep cache dirs untouched for >24h (keeps the
    # concurrently-live sf0.001/sf0.01/sf0.1 caches, drops orphans)
    import glob as _g
    import shutil as _sh
    import time as _time

    for stale in _g.glob(
        os.path.join(tempfile.gettempdir(), "ksa_part_lineitem_*")
    ):
        try:
            if stale != d and _time.time() - os.stat(stale).st_mtime > 86400:
                _sh.rmtree(stale, ignore_errors=True)
        except OSError:
            pass
    marker = os.path.join(d, "_SUCCESS")
    if not os.path.exists(marker):
        t(spark, sf_dir, "lineitem").select(
            "l_linestatus", "l_quantity", "l_returnflag"
        ).write.mode("overwrite").partitionBy("l_returnflag").parquet(d)
    import glob as _glob

    if not _glob.glob(os.path.join(d, "*", "*.parquet")):
        # an empty source writes no partition directories; the pruned
        # read on such a layout has no schema to infer — the correct
        # result is the empty aggregate
        return spark.createDataFrame(
            [], "l_linestatus string, n bigint, qty double"
        )
    return (
        spark.read.parquet(d)
        .filter(F.col("l_returnflag") == "R")
        .groupBy("l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 6).alias("qty"),
        )
    )


# First hex nibble of md5(key) -> 16 equiprobable buckets; 12/2/2 split.
_TRAIN = "0123456789ab"
_VAL = "cd"
_TEST = "ef"


@query(
    "doc_train_split",
    oracle=f"""
    SELECT CASE
             WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
               IN ({",".join(repr(c) for c in _TRAIN)}) THEN 'train'
             WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
               IN ({",".join(repr(c) for c in _VAL)}) THEN 'val'
             ELSE 'test'
           END AS split,
           count(*) AS n_docs,
           round(avg(length(text)), 6) AS avg_len
    FROM documents GROUP BY 1
    """,
)
def doc_train_split(spark, sf_dir):
    """Deterministic train/val/test split by md5 of the document key.

    The split is a pure function of doc_id — reproducible across runs,
    engines, partitionings and cluster sizes, and adding documents never
    reassigns existing ones (unlike randomSplit, whose assignment
    depends on partition layout). At 100 TB this is a narrow projection
    + one cheap hash per row, fully codegen'd, no shuffle beyond the
    final tiny aggregate; the split column can also be used as a
    partitionBy key at write time so each corpus lands in its own
    directory tree.
    """
    nib = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    split = (
        F.when(nib.isin(*_TRAIN), F.lit("train"))
        .when(nib.isin(*_VAL), F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        t(spark, sf_dir, "documents")
        .select(split.alias("split"), F.length("text").alias("len"))
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("len"), 6).alias("avg_len"),
        )
    )


@query(
    "io_text_roundtrip",
    oracle="""
    SELECT o_orderpriority AS line, count(*) AS n
    FROM orders WHERE o_orderkey < 8000 GROUP BY o_orderpriority
    """,
)
def io_text_roundtrip(spark, sf_dir):
    """Plain-text sink + line source (spark.read.text): one string column
    per line, the lowest-common-denominator interchange format."""
    d = tempfile.mkdtemp(prefix="txt_rt_")
    t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 8000).select(
        F.col("o_orderpriority").alias("value")
    ).write.mode("overwrite").text(d)
    return (
        spark.read.text(d)
        .groupBy(F.col("value").alias("line"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select("line", "n")
    )


def _zorder_sql_terms(xe: str, ye: str, bits: int) -> str:
    terms = []
    for i in range(bits):
        terms.append(f"((({xe} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({ye} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


@query(
    "fn_zorder_key",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           CAST({_zorder_sql_terms('(l_partkey % 1024)', '(l_suppkey % 1024)', 10)}
                AS BIGINT) AS zkey
    FROM lineitem WHERE l_orderkey < 2000
    """,
)
def fn_zorder_key(spark, sf_dir):
    """Morton/Z-order key over two dimensions (ops.zorder_key_2d) —
    the write-time clustering key that makes parquet min/max skipping
    work on BOTH columns; pure shift/and/or column algebra."""
    from ..ops import zorder_key_2d

    li = t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 2000)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        zorder_key_2d(
            F.col("l_partkey") % 1024, F.col("l_suppkey") % 1024, bits=10
        ).alias("zkey"),
    )


@query(
    "io_compact_small_files",
    # Content must survive compaction exactly: the oracle aggregates
    # the ORIGINAL table; the query aggregates the compacted copy.
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents
    """,
)
def io_compact_small_files(spark, sf_dir):
    """Small-file compaction — the table-maintenance op every
    long-running 100 TB pipeline needs: a fragmented write (4x the
    compaction target here; in production, thousands of per-micro-batch
    or per-task files) is rewritten into data-sized files. Small files
    are the classic silent killer at scale: each adds a scan task +
    namenode/liststore entry, and a 100k-file table schedules 100k
    tasks to read 100 GB.

    Compaction = read + repartition(target) + rewrite; the target
    count comes from ops.data_sized_partitions (bytes-per-file), the
    same sizing rule the CPU-heavy stages use. The query asserts the
    file count dropped to the target AND returns content aggregates
    the oracle checks against the ORIGINAL — compaction must be
    byte-lossless on the data while reshaping the layout."""
    import glob
    import shutil

    from ..ops import data_sized_partitions

    # reclaim dirs left by previous runs (the compacted copy must
    # outlive this call — the returned DataFrame reads it lazily — so
    # each run sweeps its predecessors instead of itself)
    for stale in glob.glob(
        os.path.join(tempfile.gettempdir(), "ksa_frag_docs_*")
    ) + glob.glob(os.path.join(tempfile.gettempdir(), "ksa_compact_docs_*")):
        shutil.rmtree(stale, ignore_errors=True)

    run_id = uuid.uuid4().hex[:8]
    frag = os.path.join(tempfile.gettempdir(), f"ksa_frag_docs_{run_id}")
    d = t(spark, sf_dir, "documents")
    # fragment count derives from the compaction target so the
    # "compaction shrinks the file count" invariant holds at EVERY
    # scale tier (a constant shard count is overtaken by the
    # data-sized target once the table outgrows shards x file size)
    target = data_sized_partitions(d, bytes_per_partition=4 << 20, floor=1)
    d.repartition(max(16, 4 * target)).write.mode("overwrite").parquet(frag)
    n_frag = len(glob.glob(os.path.join(frag, "*.parquet")))
    compacted = os.path.join(tempfile.gettempdir(), f"ksa_compact_docs_{run_id}")
    spark.read.parquet(frag).repartition(target).write.mode("overwrite").parquet(
        compacted
    )
    shutil.rmtree(frag, ignore_errors=True)  # fragments served their purpose
    n_comp = len(glob.glob(os.path.join(compacted, "*.parquet")))
    # shrink invariant: when the table was actually fragmented
    # (n_frag > target) compaction must reduce the file count to the
    # target; a degenerate table (empty, or already at/below target —
    # e.g. the all-empty floor tier writes one empty file) has nothing
    # to shrink. Explicit raises, not assert: `python -O` strips
    # asserts and would silently drop the invariant (ADVICE r5).
    if n_comp > max(target, 1):
        raise RuntimeError(
            f"compaction missed target: {n_comp} files > target {target} "
            f"(from {n_frag} fragments)"
        )
    if n_frag > target and not n_comp < n_frag:
        raise RuntimeError(
            f"compaction did not shrink: {n_frag} fragments -> {n_comp} files"
        )

    c = spark.read.parquet(compacted)
    return c.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )


@query(
    "io_merge_upsert",
    # MERGE semantics replayed relationally: updates override matched
    # keys, inserts append, untouched rows survive. The oracle builds
    # the same update set and merges with a full outer join.
    oracle="""
    WITH updates AS (
      SELECT doc_id,
             'UPDATED:' || lang AS lang,
             n_chars + 1000000 AS n_chars
      FROM documents WHERE doc_id % 7 = 0
      UNION ALL
      SELECT doc_id + 10000000 AS doc_id, 'new' AS lang, 42 AS n_chars
      FROM documents WHERE doc_id % 97 = 0
    ), merged AS (
      SELECT coalesce(u.doc_id, b.doc_id) AS doc_id,
             coalesce(u.lang, b.lang) AS lang,
             coalesce(u.n_chars, b.n_chars) AS n_chars
      FROM (SELECT doc_id, lang, n_chars FROM documents) b
      FULL OUTER JOIN updates u USING (doc_id)
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(n_chars) AS BIGINT) AS chars,
           CAST(min(doc_id) AS BIGINT) AS min_id
    FROM merged GROUP BY lang
    """,
)
def io_merge_upsert(spark, sf_dir):
    """Snapshot MERGE/upsert without a lakehouse format (no Delta/
    Iceberg jars in this environment — docs/COVERAGE.md): base ⟕⟖
    updates full-outer on the key, update wins on match, insert on
    no-match, untouched rows pass through; the merged relation is the
    new snapshot (in production: written partition-overwrite, exactly
    as streaming/rollup.maintain_rollup does for its idempotent
    streaming variant).

    100 TB shape: MERGE decomposes into anti-join + union-all —
    base rows NOT in the update set pass through, and the update set
    (which already carries the post-merge values for both updates and
    inserts) is appended. The anti-join IS broadcast-able (unlike a
    full outer join, which Spark cannot broadcast), so small-update
    CDC — the normal case — touches the base in one map-side pass
    with zero shuffle."""
    base = t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    updates = (
        base.filter(F.col("doc_id") % 7 == 0)
        .select(
            "doc_id",
            F.concat(F.lit("UPDATED:"), F.col("lang")).alias("lang"),
            (F.col("n_chars") + 1000000).alias("n_chars"),
        )
        .unionByName(
            base.filter(F.col("doc_id") % 97 == 0).select(
                (F.col("doc_id") + 10000000).alias("doc_id"),
                F.lit("new").alias("lang"),
                F.lit(42).cast("long").alias("n_chars"),
            )
        )
    )
    untouched = base.join(
        F.broadcast(updates.select("doc_id")), "doc_id", "left_anti"
    )
    merged = untouched.unionByName(updates)
    return merged.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("n_chars").cast("bigint").alias("chars"),
        F.min("doc_id").cast("bigint").alias("min_id"),
    )


@query(
    "io_scd2_build",
    # Slowly-Changing-Dimension Type 2 from a change stream: per user,
    # collapse consecutive same-type events and emit validity intervals
    # [valid_from, valid_to) with an is_current flag — the lakehouse
    # dimension-history build. Epochs as doubles (ns-precision parity),
    # (ts, event_id) total order.
    oracle="""
    WITH o AS (
      SELECT user_id, event_type, epoch(ts) AS tse, event_id,
             lag(event_type) OVER w AS prev_type
      FROM events WHERE user_id < 100
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch(ts), event_id)
    ), chg AS (
      SELECT user_id, event_type, tse, event_id
      FROM o WHERE prev_type IS NULL OR event_type <> prev_type
    )
    SELECT user_id, event_type,
           round(tse, 6) AS valid_from,
           round(lead(tse) OVER w2, 6) AS valid_to,
           (lead(tse) OVER w2 IS NULL) AS is_current
    FROM chg
    WINDOW w2 AS (PARTITION BY user_id ORDER BY tse, event_id)
    """,
)
def io_scd2_build(spark, sf_dir):
    """SCD Type-2 dimension build from an event stream: per user,
    consecutive events with the same type collapse into one validity
    interval [valid_from, valid_to), the last interval open
    (is_current) — the standard lakehouse history table that
    io_merge_upsert then maintains incrementally. Two windows, BOTH
    partitioned by the dimension key (never global): lag() marks type
    changes, lead() over the change rows closes each interval. At
    100 TB the user partitioning is the natural shuffle and each
    user's history is tiny; ties on ts break on event_id so the
    interval set is deterministic cross-engine (epoch doubles keep
    ns precision — floored seconds would misorder same-second
    events)."""
    ev = (
        t(spark, sf_dir, "events")
        .filter(F.col("user_id") < 100)
        .select(
            "user_id",
            "event_type",
            F.col("ts").cast("double").alias("tse"),
            "event_id",
        )
    )
    w = W.partitionBy("user_id").orderBy("tse", "event_id")
    chg = ev.withColumn("prev_type", F.lag("event_type").over(w)).filter(
        F.col("prev_type").isNull()
        | (F.col("event_type") != F.col("prev_type"))
    )
    w2 = W.partitionBy("user_id").orderBy("tse", "event_id")
    nxt = F.lead("tse").over(w2)
    return chg.select(
        "user_id",
        "event_type",
        F.round("tse", 6).alias("valid_from"),
        F.round(nxt, 6).alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


@query(
    "io_dynamic_partition_overwrite",
    # Dynamic partition overwrite: rewriting ONE partition must leave
    # every other partition's files untouched (static overwrite would
    # truncate the whole table — the classic production data-loss
    # trap). The overwritten partition (min event_type) is replaced by
    # its even-event_id half; the read-back aggregate proves the other
    # partitions survived in full. Pure integer counts/sums.
    oracle="""
    WITH tgt AS (
      SELECT min(event_type) AS tt FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(user_id) AS BIGINT) AS sum_user
    FROM events CROSS JOIN tgt
    WHERE event_type <> tt OR event_id % 2 = 0
    GROUP BY event_type ORDER BY event_type
    """,
)
def io_dynamic_partition_overwrite(spark, sf_dir):
    """Partition-level in-place rewrite with
    partitionOverwriteMode=dynamic — the idempotent-backfill primitive
    (re-run one day/partition of a 100 TB table without touching the
    rest; INSERT OVERWRITE ... PARTITION semantics). Plan: one
    partitioned write, one dynamic-overwrite write of the replacement
    slice, one partition-pruned read-back aggregate. The single-row
    min(event_type) collect is driver-side config, not data movement
    (the BPE-argmax precedent)."""
    import glob
    import shutil

    for stale in glob.glob(
        os.path.join(tempfile.gettempdir(), "ksa_dynpo_*")
    ):
        shutil.rmtree(stale, ignore_errors=True)
    run_id = uuid.uuid4().hex[:8]
    d = os.path.join(tempfile.gettempdir(), f"ksa_dynpo_{run_id}")
    ev = t(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type"
    )
    ev.write.partitionBy("event_type").mode("overwrite").parquet(d)
    row = ev.agg(F.min("event_type").alias("tt")).collect()[0]
    target = row["tt"]
    if target is not None:
        repl = ev.filter(
            (F.col("event_type") == target) & (F.col("event_id") % 2 == 0)
        )
        repl.write.partitionBy("event_type").mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).parquet(d)
    if not glob.glob(os.path.join(d, "*", "*.parquet")):
        # empty source: no partition directories were ever written
        return spark.createDataFrame(
            [], "event_type string, n_rows bigint, sum_user bigint"
        )
    back = spark.read.parquet(d)
    return (
        back.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("user_id").cast("bigint").alias("sum_user"),
        )
        .orderBy("event_type")
    )
