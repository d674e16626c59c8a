"""Training-data pipeline operators: repetition signals, benchmark
decontamination, deterministic stratified sampling, sequence packing.

The standard pre-training corpus hygiene steps (Gopher / C4 /
RefinedWeb lineage) expressed Spark-first:

* repetition_signals — per-doc duplicate-word and top-bigram fractions
  (the Gopher "repetition" filters). Pure explode + codegen aggs.
* decontaminate — n-gram overlap of the training corpus against an
  evaluation/benchmark set (GPT-3-style 13-gram decontamination,
  parameterized n). The eval side is distinct n-grams — small — and
  broadcast; the training side streams through one explode. No
  all-pairs anything.
* stratified_sample — deterministic per-stratum downsampling for data
  mixing, keyed on a multiplicative integer hash of the id so the
  sample is reproducible across engines and runs (no rand(), no seed
  state). Pure filter: no shuffle at all until the caller aggregates.
* pack_sequences — first-fit-decreasing packing of documents into
  fixed token budgets (training sequence packing). Packing is
  inherently sequential per bin set, so it shards by id hash and packs
  each shard independently with applyInPandas — the standard
  scale compromise (each shard's bins are locally FFD-optimal).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# 2^32 and Knuth's multiplicative constant: engine-portable integer
# hash for deterministic sampling (both Spark and DuckDB compute
# (id * K) % 2^32 exactly in BIGINT arithmetic).
_SAMPLE_MOD = 1 << 32
_SAMPLE_MULT = 2654435761


def _words(text_col) -> F.Column:
    return F.split(F.lower(F.trim(text_col)), r"\s+")


def word_ngrams(text_col, n: int) -> F.Column:
    """Array of word n-grams (space-joined); empty when the doc has
    fewer than ``n`` words — mirrors DuckDB's
    list_transform(range(1, len-n+2), ...) so oracles line up."""
    toks = _words(text_col)
    ln = F.size(toks)
    return F.when(
        ln >= n,
        F.transform(
            F.sequence(F.lit(1), ln - n + 1),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def repetition_signals(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Per-doc repetition stats: dup_word_frac (1 - distinct/total
    words) and top_bigram_frac (share of the most frequent word
    bigram) — the Gopher-style repetition filters.

    Two explode branches (words, bigrams) that share the scan and run
    as concurrent stages; both reduce with codegen count/countDistinct
    map-side partials, so shuffle volume is O(docs), not O(tokens).
    Docs with fewer than 2 words have no bigrams and are dropped (the
    oracle's inner join does the same).
    """
    words = df.select(
        F.col(id_col), F.explode(_words(F.col(text_col))).alias("__w")
    )
    wstats = words.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("__nw"),
        F.countDistinct("__w").alias("__ndw"),
    )
    bigrams = df.select(
        F.col(id_col), F.explode(word_ngrams(F.col(text_col), 2)).alias("__bg")
    )
    bstats = (
        bigrams.groupBy(id_col, "__bg")
        .agg(F.count(F.lit(1)).alias("__c"))
        .groupBy(id_col)
        .agg(F.max("__c").alias("__top"), F.sum("__c").alias("__tot"))
    )
    return wstats.join(bstats, id_col).select(
        id_col,
        F.round(1.0 - F.col("__ndw") / F.col("__nw"), 6).alias("dup_word_frac"),
        F.round(F.col("__top") / F.col("__tot"), 6).alias("top_bigram_frac"),
    )


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 13,
) -> DataFrame:
    """Benchmark decontamination: for each training doc, the number of
    its distinct word n-grams that appear anywhere in the eval set.
    Returns (id, n_overlap) for contaminated docs only (n_overlap >= 1).

    Scale shape: the eval/benchmark side reduces to DISTINCT n-grams —
    benchmarks are thousands of documents, so this side is broadcast-
    small even when the training side is 100 TB; the training side is
    a single explode that streams through a broadcast hash join (no
    shuffle of the corpus). If the eval set ever outgrew broadcast,
    dropping the hint falls back to a shuffle join on the n-gram key
    with the same semantics.
    """
    ev = (
        eval_df.select(
            F.explode(F.array_distinct(word_ngrams(F.col(text_col), n))).alias(
                "__ng"
            )
        )
        .distinct()
    )
    tr = train.select(
        F.col(id_col),
        F.explode(F.array_distinct(word_ngrams(F.col(text_col), n))).alias("__ng"),
    )
    return (
        tr.join(F.broadcast(ev), "__ng")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )


def sample_keep(id_col, rate_col) -> F.Column:
    """Deterministic keep-predicate for stratified sampling: keep iff
    (id * 2654435761) mod 2^32 < floor(rate * 2^32). Multiplicative
    hashing spreads sequential ids uniformly; identical integer math in
    Spark and DuckDB (and any engine with 64-bit ints), so samples are
    reproducible across engines — unlike rand(seed), whose stream is
    engine- and partitioning-dependent."""
    h = (F.col(id_col).cast("bigint") * F.lit(_SAMPLE_MULT)) % F.lit(_SAMPLE_MOD)
    return h < F.floor(rate_col * F.lit(float(_SAMPLE_MOD))).cast("bigint")


def stratified_sample(
    df: DataFrame, id_col: str, rate_col
) -> DataFrame:
    """Rows kept by the deterministic per-stratum sampler. ``rate_col``
    is any Column of keep-rates in [0, 1] (typically a CASE over the
    stratum column or a broadcast-joined rates table). Pure filter —
    zero shuffles, trivially pushed below downstream ops."""
    return df.filter(sample_keep(id_col, rate_col))


_PACK_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("shard", T.IntegerType()),
        T.StructField("bin_id", T.IntegerType()),
        T.StructField("n_tokens", T.LongType()),
    ]
)


def pack_sequences(
    df: DataFrame,
    id_col: str,
    count_col: str,
    budget: int,
    n_shards: int = 64,
) -> DataFrame:
    """First-fit-decreasing sequence packing: assign each doc to a bin
    such that each bin's token sum stays <= ``budget`` (a doc larger
    than the budget gets a bin of its own — the caller decides whether
    to truncate or drop). Output: (doc_id, shard, bin_id, n_tokens).

    Bin packing is sequential by nature, so the corpus is sharded by a
    hash of the id and each shard packs independently inside one
    applyInPandas group — Arrow-batched, no Python in any other stage.
    Bins are only meaningful within a shard: (shard, bin_id) is the
    global bin key. Deterministic: FFD over (count desc, id asc).
    At 100 TB, n_shards scales with the cluster (each shard's doc list
    must fit one task's memory — ids and counts only, ~16 B/doc).
    """

    def _pack(pdf):
        import pandas as pd

        pdf = pdf.sort_values(
            ["__cnt", "__id"], ascending=[False, True], kind="mergesort"
        )
        caps: list[int] = []  # remaining capacity per bin
        assign: list[int] = []
        for cnt in pdf["__cnt"]:
            placed = -1
            for i, cap in enumerate(caps):
                if cnt <= cap:
                    placed = i
                    break
            if placed < 0:
                caps.append(max(budget - int(cnt), 0))
                placed = len(caps) - 1
            else:
                caps[placed] -= int(cnt)
            assign.append(placed)
        return pd.DataFrame(
            {
                "doc_id": pdf["__id"].astype("int64"),
                "shard": pdf["__shard"].astype("int32"),
                "bin_id": pd.Series(assign, index=pdf.index, dtype="int32"),
                "n_tokens": pdf["__cnt"].astype("int64"),
            }
        )

    prepped = df.select(
        F.col(id_col).cast("bigint").alias("__id"),
        F.col(count_col).cast("bigint").alias("__cnt"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards))
        .cast("int")
        .alias("__shard"),
    )
    return prepped.groupBy("__shard").applyInPandas(_pack, _PACK_SCHEMA)
