"""TOML pipeline runner (R13 config parity) tests."""

from __future__ import annotations

import textwrap

from kafka_stream_aggregator_spark.plans.toml_runner import (
    load_spec,
    run_pipeline,
)


def test_env_overlay(tmp_path):
    p = tmp_path / "c.toml"
    p.write_text(
        textwrap.dedent(
            """
            [source]
            kind = "rate"
            rows_per_second = 10
            """
        )
    )
    spec = load_spec(str(p), env={"APP_SOURCE__ROWS_PER_SECOND": "99"})
    assert spec["source"]["rows_per_second"] == 99


def test_run_mode_overlay(tmp_path):
    """config.rs:54-68 layering: default.toml < {RUN_MODE}.toml < APP_*
    env — overlay file optional, later layers win, deep-merged."""
    (tmp_path / "default.toml").write_text(
        textwrap.dedent(
            """
            debug = true
            [source]
            kind = "rate"
            rows_per_second = 10
            [sink]
            kind = "console"
            """
        )
    )
    (tmp_path / "production.toml").write_text(
        textwrap.dedent(
            """
            debug = false
            [source]
            rows_per_second = 500
            """
        )
    )
    base = str(tmp_path / "default.toml")
    # default RUN_MODE=development: overlay file absent -> base only
    spec = load_spec(base, env={})
    assert spec["debug"] is True and spec["source"]["rows_per_second"] == 10
    # RUN_MODE=production: overlay wins where set, base preserved elsewhere
    spec = load_spec(base, env={"RUN_MODE": "production"})
    assert spec["debug"] is False
    assert spec["source"]["rows_per_second"] == 500
    assert spec["source"]["kind"] == "rate"
    assert spec["sink"]["kind"] == "console"
    # env layer beats the overlay (config.rs:62)
    spec = load_spec(
        base,
        env={"RUN_MODE": "production", "APP_SOURCE__ROWS_PER_SECOND": "77"},
    )
    assert spec["source"]["rows_per_second"] == 77
    # a RUN_MODE with no overlay file is fine (required(false), config.rs:60)
    spec = load_spec(base, env={"RUN_MODE": "staging"})
    assert spec["source"]["rows_per_second"] == 10


def test_batch_pipeline_ewma(spark, sf_dir, tmp_path):
    p = tmp_path / "batch.toml"
    p.write_text(
        textwrap.dedent(
            f"""
            [pipeline]
            name = "batch-ewma"

            [source]
            kind = "parquet"
            dir = "{sf_dir}"
            table = "events"

            [[transform]]
            kind = "filter"
            predicate = "event_type = 'click'"

            [[transform]]
            kind = "indicator"
            name = "EWMA"
            period = 5

            [sink]
            kind = "return"
            """
        )
    )
    df = run_pipeline(spark, str(p))
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) >= {"window_start", "window_end", "n_rows", "ewma"}
    assert all(r["ewma"] > 0 for r in rows)


def test_streaming_pipeline_from_config(spark, sf_dir, tmp_path):
    from kafka_stream_aggregator_spark.tables import load_table

    src = str(tmp_path / "in")
    load_table(spark, sf_dir, "events").write.parquet(src)
    p = tmp_path / "stream.toml"
    p.write_text(
        textwrap.dedent(
            f"""
            [pipeline]
            name = "agg-producer"

            [source]
            kind = "file-stream"
            path = "{src}"
            schema = "events"

            [[transform]]
            kind = "indicator"
            name = "EWMA"
            period = 5
            group_cols = ["event_type"]

            [sink]
            kind = "memory"
            name = "toml_agg_out"
            """
        )
    )
    q = run_pipeline(spark, str(p))
    q.awaitTermination()
    out = spark.table("toml_agg_out")
    assert out.count() > 900
    assert set(out.columns) == {
        "event_type", "window_start", "window_end", "n_rows", "ewma",
    }


def test_raw_producer_passthrough_config(spark, sf_dir, tmp_path):
    """The shipped raw-producer config: file-stream passthrough with a
    marker column into a parquet sink (R1-R4 analogue)."""
    import os

    from kafka_stream_aggregator_spark.tables import load_table

    src = str(tmp_path / "in")
    load_table(spark, sf_dir, "events").write.parquet(src)
    env = {
        "APP_SOURCE__PATH": src,
        "APP_SINK__PATH": str(tmp_path / "out"),
        "APP_SINK__CHECKPOINT": str(tmp_path / "ckpt"),
    }
    old = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    try:
        q = run_pipeline(spark, "configs/raw_producer.toml")
        q.awaitTermination()
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
    out = spark.read.parquet(str(tmp_path / "out"))
    assert out.count() == spark.read.parquet(src).count()
    assert out.filter("ingest_marker = 'raw-producer'").count() == out.count()
