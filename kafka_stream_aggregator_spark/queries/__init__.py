"""Query registry assembly — importing the modules registers everything."""

from . import (  # noqa: F401
    aggs,
    events,
    joins,
    llm,
    scalars,
    setops,
    streaming_q,
    tpch,
    udf_io,
    windows,
)
from .base import REGISTRY, QuerySpec

__all__ = ["REGISTRY", "QuerySpec"]
