"""Query registry assembly — importing the modules registers everything."""

from . import (  # noqa: F401
    analytics,
    aggs,
    events,
    indicators_q,
    joins,
    llm,
    scalars,
    setops,
    streaming_q,
    tpch,
    tpch2,
    tpch3,
    udf_io,
    windows,
)
from .base import REGISTRY, QuerySpec

__all__ = ["REGISTRY", "QuerySpec"]
