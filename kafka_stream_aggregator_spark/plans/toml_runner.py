"""Config-driven pipelines (R13 parity).

The reference wires its services from layered TOML
(services/kstream-agg-rs/src/config.rs:54-68: default.toml + RUN_MODE
overlay + APP_* env overrides; indicator kind/period in
config/agg-producer/config/default.toml). This runner reproduces that
surface declaratively: a TOML spec describes source -> transforms ->
sink, and assembles the corresponding DataFrame / streaming query. Env
overrides use the same APP_ prefix idea: APP_SECTION__KEY=value.
"""

from __future__ import annotations

import os
import tomllib
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..indicators import windowed_ewma
from ..ops import dedup_keep_first, sessionize
from ..schemas import EVENTS_SCHEMA, TRADE_SCHEMA
from ..streaming.pipeline import streaming_windowed_ewma
from ..streaming.sources import file_stream, kafka_stream, rate_stream

SCHEMAS = {"events": EVENTS_SCHEMA, "trades": TRADE_SCHEMA}


def _deep_merge(base: dict[str, Any], overlay: dict[str, Any]) -> dict[str, Any]:
    out = dict(base)
    for k, v in overlay.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def load_spec(path: str, env: dict[str, str] | None = None) -> dict[str, Any]:
    """Layered config, full R13 parity (config.rs:54-68):

    1. the named TOML file (``config/default.toml`` analogue),
    2. an OPTIONAL ``{RUN_MODE}.toml`` overlay in the same directory —
       RUN_MODE defaults to "development" (config.rs:56); a missing
       overlay file is fine (``required(false)``, config.rs:60),
    3. ``APP_SECTION__KEY`` environment overrides (config.rs:62).
    """
    with open(path, "rb") as f:
        spec = tomllib.load(f)
    env = dict(os.environ if env is None else env)
    run_mode = env.get("RUN_MODE", "development")
    overlay_path = os.path.join(os.path.dirname(path), f"{run_mode}.toml")
    if os.path.abspath(overlay_path) != os.path.abspath(path) and os.path.exists(
        overlay_path
    ):
        with open(overlay_path, "rb") as f:
            spec = _deep_merge(spec, tomllib.load(f))
    for key, val in env.items():
        if not key.startswith("APP_"):
            continue
        parts = key[4:].lower().split("__")
        if len(parts) != 2:
            continue
        section, field = parts
        if section in spec and isinstance(spec[section], dict):
            spec[section][field] = _coerce(val, spec[section].get(field))
    return spec


def _coerce(val: str, like: Any) -> Any:
    if isinstance(like, bool):
        return val.lower() in ("1", "true", "yes")
    if isinstance(like, int):
        return int(val)
    if isinstance(like, float):
        return float(val)
    return val


def build_source(spark: SparkSession, spec: dict[str, Any]) -> DataFrame:
    src = spec["source"]
    kind = src["kind"]
    if kind == "parquet":  # batch
        from ..tables import load_table

        if "table" in src:
            return load_table(spark, src["dir"], src["table"])
        from ..tables import _normalize

        return _normalize(spark.read.parquet(src["path"]))
    if kind == "file-stream":
        return file_stream(
            spark,
            src["path"],
            SCHEMAS[src["schema"]],
            fmt=src.get("format", "parquet"),
            max_files_per_trigger=src.get("max_files_per_trigger"),
        )
    if kind == "kafka":
        return kafka_stream(
            spark,
            src["brokers"],
            src["topic"],
            starting_offsets=src.get("starting_offsets", "earliest"),
            max_offsets_per_trigger=src.get("max_offsets_per_trigger"),
        )
    if kind == "rate":
        return rate_stream(spark, src.get("rows_per_second", 10))
    raise ValueError(f"unknown source kind {kind!r}")


def apply_transforms(df: DataFrame, spec: dict[str, Any]) -> DataFrame:
    for tr in spec.get("transform", []):
        kind = tr["kind"]
        if kind == "select":
            df = df.select(*tr["columns"])
        elif kind == "filter":
            df = df.filter(tr["predicate"])
        elif kind == "with_column":
            df = df.withColumn(tr["name"], F.expr(tr["expr"]))
        elif kind == "dedup":
            df = dedup_keep_first(df, tr["keys"], tr["order_by"])
        elif kind == "sessionize":
            df = sessionize(
                df,
                ts_col=tr.get("ts_col", "ts"),
                by=tr.get("by", "user_id"),
                gap_seconds=tr.get("gap_seconds", 1800),
            )
        elif kind == "indicator":
            # reference config surface: kind = "EWMA", options.period
            # (config.rs:6-16; only EWMA is implemented there, main.rs:111)
            if tr.get("name", "EWMA").upper() != "EWMA":
                raise ValueError(f"unknown indicator {tr.get('name')!r}")
            args = dict(
                ts_col=tr.get("ts_col", "ts"),
                value_col=tr.get("value_col", "value"),
                order_cols=tuple(tr.get("order_cols", ("ts", "event_id"))),
                group_cols=tuple(tr.get("group_cols", ())),
                period_minutes=tr.get("period", 5),
                emit_positive_only=tr.get("emit_positive_only", True),
            )
            df = (
                streaming_windowed_ewma(
                    df, watermark=tr.get("watermark", "10 minutes"), **args
                )
                if df.isStreaming
                else windowed_ewma(df, **args)
            )
        else:
            raise ValueError(f"unknown transform kind {kind!r}")
    return df


def run_pipeline(spark: SparkSession, spec_path: str, env=None):
    """Assemble and (for streams) start the pipeline. Returns the
    DataFrame for batch sinks, or the started StreamingQuery."""
    spec = load_spec(spec_path, env)
    df = apply_transforms(build_source(spark, spec), spec)
    sink = spec.get("sink", {"kind": "return"})
    kind = sink["kind"]
    if kind == "return":
        return df
    if not df.isStreaming:
        if kind == "parquet":
            df.write.mode(sink.get("mode", "overwrite")).parquet(sink["path"])
            return df
        raise ValueError(f"unsupported batch sink {kind!r}")
    w = df.writeStream.outputMode(sink.get("output_mode", "append"))
    if kind == "memory":
        w = w.format("memory").queryName(sink["name"])
    elif kind == "parquet":
        w = (
            w.format("parquet")
            .option("path", sink["path"])
            .option("checkpointLocation", sink["checkpoint"])
        )
    elif kind == "kafka":
        df2 = df.select(F.to_json(F.struct(*df.columns)).alias("value"))
        w = (
            df2.writeStream.format("kafka")
            .option("kafka.bootstrap.servers", sink["brokers"])
            .option("topic", sink["topic"])
            .option("checkpointLocation", sink["checkpoint"])
        )
    elif kind == "console":
        w = w.format("console")
    else:
        raise ValueError(f"unknown sink kind {kind!r}")
    if sink.get("available_now", True):
        w = w.trigger(availableNow=True)
    elif "processing_time" in sink:
        w = w.trigger(processingTime=sink["processing_time"])
    return w.start()
