"""Query registry assembly — importing the modules registers everything."""

from . import (  # noqa: F401
    analytics,
    analytics2,
    analytics3,
    analytics4,
    analytics5,
    analytics6,
    analytics7,
    analytics8,
    analytics9,
    analytics10,
    analytics11,
    analytics12,
    analytics13,
    analytics14,
    analytics15,
    analytics16,
    analytics17,
    analytics18,
    analytics19,
    analytics20,
    analytics21,
    analytics22,
    analytics23,
    analytics24,
    analytics25,
    analytics26,
    analytics27,
    analytics28,
    analytics29,
    analytics30,
    analytics31,
    analytics32,
    analytics33,
    analytics34,
    analytics35,
    analytics36,
    analytics37,
    analytics38,
    analytics39,
    analytics40,
    analytics41,
    aggs,
    corpus,
    corpus2,
    corpus3,
    corpus4,
    corpus5,
    events,
    geo,
    geo2,
    graph2,
    indicators_q,
    io2,
    io3,
    io4,
    io5,
    io6,
    joins,
    lakehouse_q,
    llm,
    llm2,
    ml2,
    ml3,
    ml4,
    ml5,
    pipeline_rules,
    scalars,
    setops,
    sketches,
    sqlfront,
    sketches2,
    sketches3,
    stats,
    surface2,
    surface3,
    textml,
    streaming_q,
    streaming_q2,
    tpch,
    tpch2,
    trading,
    trading3,
    tpch3,
    tpch4,
    udf_io,
    windows,
    # wave 55/56 import LAST: bucket-1 window ordering drains
    # never-verdicted queries in REGISTRATION (= import) order, and
    # a new wave must not jump the older backlog (VERDICT r10 item 3)
    analytics42,
    analytics43,
)
from .base import REGISTRY, QuerySpec

# The correctness driver samples the FIRST 50 registry entries (in dict
# iteration order) for its oracle gate. Since round 6 the ordering is
# GENERATED from driver history (tools/gen_window.py -> _window.py,
# VERDICT r5 item 8): queries with no driver verdict yet come first
# (their driver row is the durable record), then stalest verdicts
# first. Anything registered after the last generation is not in the
# list yet and is ordered at the very front here, so a forgotten
# regeneration can only make NEW queries sample sooner, never drop one.
try:
    from ._window import WINDOW_ORDER as _WINDOW_ORDER
except ImportError:  # first generation bootstrap
    _WINDOW_ORDER = []

import os as _os

# tools/gen_window.py sets SPARK_GRAFT_NO_REORDER=1 so it can observe
# TRUE registration order. Round 9's window regenerated against the
# already-reordered registry (this flag was set but never honored here),
# which let each round's new additions inherit the front positions of
# the previous window and jump the never-verdicted backlog (VERDICT r9
# top finding).
_NO_REORDER = _os.environ.get("SPARK_GRAFT_NO_REORDER") == "1"


def _reorder_registry() -> None:
    listed = [n for n in _WINDOW_ORDER if n in REGISTRY]
    unlisted = [n for n in REGISTRY if n not in set(listed)]
    ordered = {n: REGISTRY[n] for n in unlisted + listed}
    REGISTRY.clear()
    REGISTRY.update(ordered)


if not _NO_REORDER:
    _reorder_registry()

__all__ = ["REGISTRY", "QuerySpec"]
