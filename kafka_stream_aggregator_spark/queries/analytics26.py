"""Round-8 wave 35: graph modularity, Yule-Walker AR(2) fit, and a
zlib compression-ratio quality screen (the classic gibberish/
boilerplate detector from the Gopher/RefinedWeb rule banks, measured
for real with DEFLATE instead of proxies).

Determinism: modularity reduces to exact integer (e_c, d_c, m) per
community with one closing chain per row; AR(2) uses the Ljung-Box
BIGINT co-moment pattern; the compression op is registered
self-checked (zlib output is platform-deterministic for a fixed level
but has no SQL twin) with an exact byte-level replay test.
"""

from __future__ import annotations

import pandas as pd  # noqa: F401 — resolves pandas_udf type hints

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .base import query, t
from .graph2 import _EDGE_SQL, _edges


# --------------------------------------------------------------------------
# Newman modularity of the modal-event-type partition
# --------------------------------------------------------------------------


@query(
    "graph_modularity",
    # Q = sum_c (e_c/m - (d_c/2m)^2) over the co-occurrence graph
    # (graph2._edges) with communities = each user's MODAL event type
    # ((count DESC, type ASC) argmax — deterministic). e_c, d_c, m are
    # exact integers; one closing chain per community row.
    oracle=f"""
    WITH e AS (
      {_EDGE_SQL}
    ), m AS (
      SELECT CAST(count(*) AS BIGINT) AS m FROM e
    ), uc AS (
      SELECT user_id, event_type AS community FROM (
        SELECT user_id, event_type,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY count(*) DESC, event_type)
                 AS rn
        FROM events WHERE user_id < 120
        GROUP BY user_id, event_type) z
      WHERE rn = 1
    ), deg AS (
      SELECT u, CAST(count(*) AS BIGINT) AS d FROM (
        SELECT ua AS u FROM e UNION ALL SELECT ub FROM e) x
      GROUP BY u
    ), dc AS (
      SELECT uc.community, CAST(count(*) AS BIGINT) AS n_nodes,
             CAST(sum(coalesce(deg.d, 0)) AS BIGINT) AS deg_sum
      FROM uc LEFT JOIN deg ON uc.user_id = deg.u
      GROUP BY uc.community
    ), ec AS (
      SELECT a.community, CAST(count(*) AS BIGINT) AS e_within
      FROM e
      JOIN uc a ON e.ua = a.user_id
      JOIN uc b ON e.ub = b.user_id AND a.community = b.community
      GROUP BY a.community
    )
    SELECT dc.community, dc.n_nodes, dc.deg_sum,
           CAST(coalesce(ec.e_within, 0) AS BIGINT) AS e_within,
           round(CAST(coalesce(ec.e_within, 0) AS DOUBLE) / m.m
                 - (CAST(dc.deg_sum AS DOUBLE) / (2 * m.m))
                   * (CAST(dc.deg_sum AS DOUBLE) / (2 * m.m)), 6)
             AS q_contrib
    FROM dc LEFT JOIN ec ON dc.community = ec.community
    CROSS JOIN m
    """,
)
def graph_modularity(spark, sf_dir):
    """Per-community modularity contribution: the edge list and the
    modal-type labels are each ONE fact-bounded aggregate; e_c/d_c
    close on vertex- and edge-keyed equi joins (never pair
    enumeration); Q is a per-row chain on exact integers."""
    ev = t(spark, sf_dir, "events").filter(F.col("user_id") < 120)
    e = _edges(spark, sf_dir)
    m = e.agg(F.count(F.lit(1)).cast("bigint").alias("m"))
    uc = (
        ev.groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("user_id").orderBy(
                    F.desc("c"), F.col("event_type")
                )
            ),
        )
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("community"))
    )
    deg = (
        e.select(F.col("ua").alias("u"))
        .unionAll(e.select(F.col("ub").alias("u")))
        .groupBy("u")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    )
    dc = (
        uc.join(deg, uc.user_id == deg.u, "left")
        .groupBy("community")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
            F.sum(F.coalesce(F.col("d"), F.lit(0)))
            .cast("bigint")
            .alias("deg_sum"),
        )
    )
    a = uc.select(
        F.col("user_id").alias("ua"), F.col("community").alias("ca")
    )
    b = uc.select(
        F.col("user_id").alias("ub"), F.col("community").alias("cb")
    )
    ec = (
        e.join(F.broadcast(a), "ua")
        .join(F.broadcast(b), "ub")
        .filter(F.col("ca") == F.col("cb"))
        .groupBy(F.col("ca").alias("community"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("e_within"))
    )
    j = dc.join(ec, "community", "left").crossJoin(F.broadcast(m))
    ew = F.coalesce(F.col("e_within"), F.lit(0))
    half = F.col("deg_sum").cast("double") / (2 * F.col("m"))
    return j.select(
        "community",
        "n_nodes",
        "deg_sum",
        ew.cast("bigint").alias("e_within"),
        F.round(ew.cast("double") / F.col("m") - half * half, 6).alias(
            "q_contrib"
        ),
    )


# --------------------------------------------------------------------------
# Yule-Walker AR(2) fit of the hourly count series
# --------------------------------------------------------------------------


@query(
    "ts_yule_walker_ar2",
    # AR(2) coefficients from the lag-1/lag-2 sample autocorrelations
    # of the hourly count series (Ljung-Box BIGINT co-moment pattern):
    # r_k = (x_k - mu*(h_k+t_k) + (n-k)*mu^2) / (sq - n*mu^2),
    # phi1 = r1(1-r2)/(1-r1^2), phi2 = (r2-r1^2)/(1-r1^2).
    oracle="""
    WITH hourly AS (
      SELECT event_type,
             CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hr,
             count(*) AS c
      FROM events GROUP BY 1, 2
    ), lagged AS (
      SELECT event_type, c,
             lag(c, 1) OVER w AS c1,
             lag(c, 2) OVER w AS c2
      FROM hourly WINDOW w AS (PARTITION BY event_type ORDER BY hr)
    ), m AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(c) AS BIGINT) AS s,
             CAST(sum(c * c) AS BIGINT) AS sq,
             CAST(sum(c * c1) AS BIGINT) AS x1,
             CAST(sum(CASE WHEN c1 IS NOT NULL THEN c1 END) AS BIGINT) AS h1,
             CAST(sum(CASE WHEN c1 IS NOT NULL THEN c END) AS BIGINT) AS t1,
             CAST(sum(c * c2) AS BIGINT) AS x2,
             CAST(sum(CASE WHEN c2 IS NOT NULL THEN c2 END) AS BIGINT) AS h2,
             CAST(sum(CASE WHEN c2 IS NOT NULL THEN c END) AS BIGINT) AS t2
      FROM lagged GROUP BY event_type
    ), r AS (
      SELECT event_type, n,
             (x1 - (CAST(s AS DOUBLE)/n)*(h1+t1)
               + (n-1)*(CAST(s AS DOUBLE)/n)*(CAST(s AS DOUBLE)/n))
             / (sq - n*(CAST(s AS DOUBLE)/n)*(CAST(s AS DOUBLE)/n)) AS r1,
             (x2 - (CAST(s AS DOUBLE)/n)*(h2+t2)
               + (n-2)*(CAST(s AS DOUBLE)/n)*(CAST(s AS DOUBLE)/n))
             / (sq - n*(CAST(s AS DOUBLE)/n)*(CAST(s AS DOUBLE)/n)) AS r2
      FROM m
      WHERE n > 2 AND sq - n*(CAST(s AS DOUBLE)/n)*(CAST(s AS DOUBLE)/n) > 0
    )
    SELECT event_type, n,
           round(r1, 6) AS r1, round(r2, 6) AS r2,
           round(r1 * (1 - r2) / (1 - r1 * r1), 6) AS phi1,
           round((r2 - r1 * r1) / (1 - r1 * r1), 6) AS phi2
    FROM r WHERE 1 - r1 * r1 <> 0
    """,
)
def ts_yule_walker_ar2(spark, sf_dir):
    """Yule-Walker AR(2): one hour-grain aggregate, two lags over the
    bounded hourly relation, BIGINT co-moments, closed-form phi
    chains — no residual or float series ever accumulates."""
    ev = t(spark, sf_dir, "events")
    hr = F.floor(F.col("ts").cast("double") / 3600).cast("bigint")
    hourly = ev.groupBy("event_type", hr.alias("hr")).agg(
        F.count(F.lit(1)).alias("c")
    )
    w = W.partitionBy("event_type").orderBy("hr")
    lagged = hourly.select(
        "event_type",
        "c",
        F.lag("c", 1).over(w).alias("c1"),
        F.lag("c", 2).over(w).alias("c2"),
    )
    m = lagged.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("c").cast("bigint").alias("s"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("sq"),
        F.sum(F.col("c") * F.col("c1")).cast("bigint").alias("x1"),
        F.sum(F.when(F.col("c1").isNotNull(), F.col("c1")))
        .cast("bigint")
        .alias("h1"),
        F.sum(F.when(F.col("c1").isNotNull(), F.col("c")))
        .cast("bigint")
        .alias("t1"),
        F.sum(F.col("c") * F.col("c2")).cast("bigint").alias("x2"),
        F.sum(F.when(F.col("c2").isNotNull(), F.col("c2")))
        .cast("bigint")
        .alias("h2"),
        F.sum(F.when(F.col("c2").isNotNull(), F.col("c")))
        .cast("bigint")
        .alias("t2"),
    )
    mu = F.col("s").cast("double") / F.col("n")
    den = F.col("sq") - F.col("n") * mu * mu
    r1 = (
        F.col("x1") - mu * (F.col("h1") + F.col("t1")) + (F.col("n") - 1) * mu * mu
    ) / den
    r2 = (
        F.col("x2") - mu * (F.col("h2") + F.col("t2")) + (F.col("n") - 2) * mu * mu
    ) / den
    r = (
        m.filter((F.col("n") > 2) & (den > 0))
        .select("event_type", "n", r1.alias("r1"), r2.alias("r2"))
        .filter(1 - F.col("r1") * F.col("r1") != 0)
    )
    one_m = 1 - F.col("r1") * F.col("r1")
    return r.select(
        "event_type",
        "n",
        F.round("r1", 6).alias("r1"),
        F.round("r2", 6).alias("r2"),
        F.round(F.col("r1") * (1 - F.col("r2")) / one_m, 6).alias("phi1"),
        F.round((F.col("r2") - F.col("r1") * F.col("r1")) / one_m, 6).alias(
            "phi2"
        ),
    )


# --------------------------------------------------------------------------
# zlib compression-ratio quality screen (self-checked)
# --------------------------------------------------------------------------


@query(
    "doc_compression_ratio",
    # No SQL twin: DEFLATE has no DuckDB expression, so this is a
    # rows-only registry row with an exact byte-level replay test
    # (tests/test_analytics26.py pins every per-doc ratio against
    # Python zlib directly). Ratios are per-row chains; the per-source
    # mean uses the exact-decimal chain.
    oracle=None,
)
def doc_compression_ratio(spark, sf_dir):
    """The real Gopher/RefinedWeb compressibility screen: zlib level-6
    ratio per document via an Arrow-batched pandas UDF (bytes in,
    2 ints out), then a per-source report — highly compressible text
    (< 0.4) is repetitive boilerplate, high ratio (> 0.9) is
    gibberish/random. Map-only over documents + one bounded
    aggregate."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("struct<raw_len: bigint, comp_len: bigint>")
    def comp_lens(texts: pd.Series) -> pd.DataFrame:
        import zlib

        raw, comp = [], []
        for s in texts:
            b = (s or "").encode("utf-8")
            raw.append(len(b))
            comp.append(len(zlib.compress(b, 6)))
        return pd.DataFrame({"raw_len": raw, "comp_len": comp})

    d = t(spark, sf_dir, "documents").select(
        "source", comp_lens(F.col("text")).alias("cl")
    )
    ratio = F.col("cl.comp_len").cast("double") / F.col("cl.raw_len")
    rows = d.filter(F.col("cl.raw_len") > 0).select(
        "source",
        F.round(ratio, 6).cast("decimal(10,6)").alias("r"),
    )
    return (
        rows.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.round(
                F.sum("r").cast("double") / F.count(F.lit(1)), 6
            ).alias("mean_ratio"),
            F.count_if(F.col("r") < 0.4).cast("bigint").alias("n_repetitive"),
            F.count_if(F.col("r") > 0.9).cast("bigint").alias("n_gibberish"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Video frame-sample + resize pipeline — EXACTLY oracled
# --------------------------------------------------------------------------


@query(
    "video_frame_pipeline",
    # The multimodal video path (sample_video_frames -> resize_frames)
    # driven end-to-end with an EXACT SQL oracle: payloads are
    # synthesized from the pure integer formula
    # byte[fi*192 + j] = (mid*31 + fi*7 + j) % 256 (24 frames of
    # 16x12 grayscale), so the engine's stride-3/max-6 sampling and
    # 16x12 -> 8x6 nearest-neighbor resize (ys = 2*row, xs = 2*col)
    # reduce to an integer checksum DuckDB replays with unnest ranges.
    # This upgrades the video plumbing from self-checked to
    # oracle-verified.
    oracle="""
    WITH media AS (
      SELECT doc_id AS media_id FROM documents WHERE doc_id < 40
    ), fi AS (
      SELECT unnest([0, 3, 6, 9, 12, 15]) AS frame_idx
    ), ys AS (
      SELECT unnest([0, 2, 4, 6, 8, 10]) AS y
    ), xs AS (
      SELECT unnest([0, 2, 4, 6, 8, 10, 12, 14]) AS x
    )
    SELECT media_id, CAST(frame_idx AS INTEGER) AS frame_idx,
           CAST(8 AS INTEGER) AS width, CAST(6 AS INTEGER) AS height,
           CAST(sum((media_id * 31 + frame_idx * 7 + (y * 16 + x)) % 256)
                AS BIGINT) AS checksum
    FROM media CROSS JOIN fi CROSS JOIN ys CROSS JOIN xs
    GROUP BY media_id, frame_idx
    """,
)
def video_frame_pipeline(spark, sf_dir):
    """Raw-frame video pipeline, oracle-verified: synthesize
    deterministic 24-frame 16x12 payloads per media id (mapInPandas),
    fan out every 3rd frame capped at 6 (sample_video_frames), resize
    each to 8x6 by nearest neighbor (resize_frames), emit per-frame
    byte checksums. The payload formula is pure integer arithmetic, so
    the SQL oracle replays sampling + resize + checksum exactly —
    the Arrow plumbing (binary columns, in-batch fan-out, per-frame
    rows) is the production shape for real codecs."""
    import numpy as np

    from ..llm.multimodal import resize_frames, sample_video_frames

    W_, H_, NF = 16, 12, 24
    fsz = W_ * H_

    def synth(batches):
        for pdf in batches:
            rows = []
            for mid in pdf["doc_id"]:
                idx = np.arange(NF * fsz, dtype=np.int64)
                fi = idx // fsz
                j = idx % fsz
                b = ((int(mid) * 31 + fi * 7 + j) % 256).astype(np.uint8)
                rows.append((mid, b.tobytes()))
            yield pd.DataFrame(rows, columns=["media_id", "payload"])

    media = (
        t(spark, sf_dir, "documents")
        .select("doc_id")
        .filter(F.col("doc_id") < 40)
        .repartition(8)
        .mapInPandas(synth, "media_id long, payload binary")
    )
    frames = sample_video_frames(media, frame_size=fsz, stride=3, max_frames=6)
    resized = resize_frames(frames, src_w=W_, src_h=H_, dst_w=8, dst_h=6)

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("bigint")
    def bytesum(frames_col: pd.Series) -> pd.Series:
        return pd.Series(
            [
                int(np.frombuffer(bytes(b), dtype=np.uint8).sum())
                if b is not None
                else None
                for b in frames_col
            ],
            dtype="Int64",
        )

    return resized.select(
        "media_id",
        "frame_idx",
        "width",
        "height",
        bytesum(F.col("frame")).alias("checksum"),
    )
