"""Distributed graph traversal primitives.

The iterative shapes here follow the same discipline as the near-dup
connected-components loop (llm/dedup.py): each round is one shuffle
keyed on the frontier node, `localCheckpoint` truncates lineage so k
rounds cost k stages rather than an exponentially replanned DAG, and
all state lives in DataFrames (never the driver).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_hop_reach(edges: DataFrame, seeds: DataFrame, k: int) -> DataFrame:
    """(seed, node) pairs for every node within <= k hops of a seed.

    ``edges``: (src, dst) directed edge list (pass both directions for
    an undirected graph). ``seeds``: one ``seed`` column; a seed is at
    distance 0 of itself and is included in its own reach set.

    Labeled multi-source BFS: the reach relation starts as
    (seed, seed) and each round adds ``reach |><| edges`` on
    ``node = src``, deduplicating with a distinct. The per-round
    shuffle is keyed on the frontier node; total state is bounded by
    |seeds| x |V|, so callers keep the seed set small (or partition
    seed batches). Joining the FULL reach set each round (not just the
    newest frontier) trades a little join width for idempotent rounds
    — distinct() makes re-expansion of already-settled nodes a no-op,
    which also makes the loop safe under speculative re-execution.
    For small k this is at most a 2x overhead versus frontier-only
    expansion; a frontier/visited split becomes worthwhile only for
    deep traversals (k >> diameter of the expanding ball).
    """
    if k < 0:
        raise ValueError(f"k must be >= 0, got {k}")
    if k >= 1:
        # Each round's eager localCheckpoint on `reach` launches one
        # job, and WITHOUT this the whole edge-construction subtree
        # (often a join + distinct + union) would re-execute inside
        # every one of those k jobs. Materialize edges once; k jobs
        # then read the checkpointed blocks. Measured on the
        # customer-supplier graph at sf1 (k=2, same-session A/B):
        # 19.5-27.3 s uncached vs 10.9-11.2 s cached.
        edges = edges.localCheckpoint()
    reach = seeds.select(
        F.col("seed"), F.col("seed").alias("node")
    ).distinct()
    for _ in range(k):
        expanded = (
            reach.join(edges, reach.node == edges.src)
            .select("seed", F.col("dst").alias("node"))
        )
        reach = reach.unionByName(expanded).distinct().localCheckpoint()
    return reach
