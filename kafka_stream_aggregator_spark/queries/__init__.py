"""Query registry assembly — importing the modules registers everything."""

from . import aggs, events, joins, llm, scalars, setops, tpch, windows  # noqa: F401
from .base import REGISTRY, QuerySpec

__all__ = ["REGISTRY", "QuerySpec"]
