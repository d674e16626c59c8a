"""R12 parity: W3C trace-context propagation through Kafka headers.

The reference injects/extracts the ``traceparent`` header around every
produce/consume (registry_handler.rs:10-48 HeaderInjector/HeaderExtractor,
consumer.rs, producer.rs) so spans line up across services. Spark's Kafka
connector exposes the same headers as a column —
``array<struct<key:string, value:binary>>`` read with
``.option("includeHeaders", "true")`` and written back verbatim — so
propagation is plain column algebra: no UDF, no per-record Python, and
it composes with any streaming or batch plan.

Span identity is DERIVED (xxhash64 of the payload + a caller salt), not
random: Spark re-executes tasks on failure and speculatively, so a
random span id would differ between attempts of the same record;
content-derived ids make trace emission idempotent under replay, which
is the same property the upsert sink gives row delivery.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TRACEPARENT = "traceparent"
_VERSION = "00"
_FLAG_SAMPLED = "01"

# headers column schema used by the Spark Kafka source/sink
HEADERS_TYPE = "array<struct<key:string,value:binary>>"


def _hex(col: Column, width: int) -> Column:
    """Low ``width`` hex chars of a long, zero-padded (hex() drops
    leading zeros; trace ids must be fixed-width)."""
    return F.lpad(F.lower(F.hex(col)), width, "0").substr(-width, width)


def derive_trace_id(*cols: Column | str, salt: str = "") -> Column:
    """128-bit trace id (32 hex chars) derived from the given columns:
    two independent 64-bit lanes via distinct hash salts."""
    lo = F.xxhash64(F.lit("trace_lo" + salt), *cols)
    hi = F.xxhash64(F.lit("trace_hi" + salt), *cols)
    return F.concat(_hex(hi, 16), _hex(lo, 16))


def derive_span_id(*cols: Column | str, salt: str = "") -> Column:
    """64-bit span id (16 hex chars)."""
    return _hex(F.xxhash64(F.lit("span" + salt), *cols), 16)


def format_traceparent(trace_id: Column, span_id: Column) -> Column:
    """``00-<32 hex>-<16 hex>-01`` (W3C trace-context level 1)."""
    return F.concat_ws(
        "-", F.lit(_VERSION), trace_id, span_id, F.lit(_FLAG_SAMPLED)
    )


def set_header(headers: Column, key: str, value: Column) -> Column:
    """Functional upsert of one Kafka header: drop any existing entries
    for ``key`` (the reference's Injector prepends, and its Extractor
    returns the first match — net effect is replacement; we replace
    outright), then append the new entry. NULL headers arrays are
    treated as empty."""
    cleaned = F.filter(
        F.coalesce(headers, F.array().cast(HEADERS_TYPE)),
        lambda h: h.key != F.lit(key),
    )
    entry = F.struct(
        F.lit(key).alias("key"), value.cast("binary").alias("value")
    )
    return F.concat(cleaned, F.array(entry))


def get_header(headers: Column, key: str) -> Column:
    """First header value for ``key`` as a string (Extractor::get
    semantics), NULL when absent or when the headers column is NULL."""
    matches = F.filter(
        F.coalesce(headers, F.array().cast(HEADERS_TYPE)),
        lambda h: h.key == F.lit(key),
    )
    return F.try_element_at(matches, F.lit(1)).getField("value").cast("string")


def inject_traceparent(
    df: DataFrame,
    *,
    id_cols: list[str],
    headers_col: str = "headers",
    salt: str = "",
) -> DataFrame:
    """Producer side (producer.rs:42-96 parity): stamp every row's
    ``headers`` with a traceparent whose trace id is derived from
    ``id_cols``. Rows that already carry a traceparent (an upstream
    service started the trace) keep their trace id and get a fresh
    child span id; rows without one start a new trace."""
    cols = [F.col(c) for c in id_cols]
    headers = F.col(headers_col) if headers_col in df.columns else F.lit(None).cast(
        HEADERS_TYPE
    )
    existing = get_header(headers, TRACEPARENT)
    trace_id = F.coalesce(
        F.regexp_extract(existing, r"^[0-9a-f]{2}-([0-9a-f]{32})-", 1),
        derive_trace_id(*cols, salt=salt),
    )
    tp = format_traceparent(trace_id, derive_span_id(*cols, salt=salt))
    return df.withColumn(headers_col, set_header(headers, TRACEPARENT, tp))


def extract_traceparent(
    df: DataFrame,
    *,
    headers_col: str = "headers",
    trace_id_col: str = "trace_id",
    span_id_col: str = "parent_span_id",
) -> DataFrame:
    """Consumer side (consumer.rs HeaderExtractor parity): parse the
    incoming traceparent into trace-id / parent-span-id columns; both
    NULL when the header is absent or malformed."""
    tp = get_header(F.col(headers_col), TRACEPARENT)
    pat = r"^[0-9a-f]{2}-([0-9a-f]{32})-([0-9a-f]{16})-[0-9a-f]{2}$"
    valid = F.when(tp.rlike(pat), tp)
    return df.withColumns(
        {
            trace_id_col: F.regexp_extract(valid, pat, 1),
            span_id_col: F.regexp_extract(valid, pat, 2),
        }
    ).withColumns(
        # regexp_extract returns '' on NULL input; normalize to NULL
        {
            c: F.when(F.col(c) != "", F.col(c))
            for c in (trace_id_col, span_id_col)
        }
    )
