"""Distributed BPE (byte-pair-encoding) merge training.

Classic BPE trains on the word-frequency table, not the raw corpus:
the corpus reduces once to ``(word, count)`` (one shuffle, vocabulary-
sized — the same reduction unigram_logprob uses), and every merge
iteration then works on that table:

  1. explode each word's adjacent symbol pairs, weighted by the word
     count (pure codegen: transform + explode),
  2. one bounded groupBy summing pair weights,
  3. take the argmax pair (deterministic tiebreak: support desc, then
     lexicographic) — a TakeOrdered of 1 row to the driver,
  4. rebuild every word's symbol array with the winning pair merged
     left-to-right non-overlapping (a higher-order ``aggregate`` fold —
     JVM-side, no UDF), localCheckpoint, repeat.

Driver involvement is O(merges) tiny rows — the same
driver-in-the-loop shape as llm.dedup.cluster_near_dups (label
propagation): each iteration is one distributed pass over the vocab
relation; at 100 TB the vocab table (millions of distinct words) stays
comfortably distributed and each iteration is one bounded shuffle on
pair keys.

Merge semantics are pinned against a pure-Python reference
implementation in tests/test_bpe.py (same tiebreaks, same
left-to-right fold), since 20 data-dependent iterations are not
SQL-expressible for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END = "</w>"


def words_with_counts(df: DataFrame, text_col: str) -> DataFrame:
    """Corpus -> (word, count) with the word as a symbol array of
    single characters plus the end-of-word marker."""
    w = df.select(
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("w")
    ).filter(F.col("w") != "")
    vocab = w.groupBy("w").agg(F.count(F.lit(1)).alias("cnt"))
    return vocab.select(
        F.concat(F.split(F.col("w"), ""), F.array(F.lit(END))).alias("sym"),
        "cnt",
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    pairs = vocab.filter(F.size("sym") >= 2).select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(sym) - 1),"
                " i -> struct(sym[i-1] AS l, sym[i] AS r))"
            )
        ).alias("p"),
        "cnt",
    )
    return pairs.groupBy("p.l", "p.r").agg(F.sum("cnt").alias("support"))


def _merge_pair(vocab: DataFrame, left: str, right: str) -> DataFrame:
    """Merge (left, right) -> left||right in every symbol array,
    left-to-right non-overlapping, as a JVM-side fold."""
    l, r = F.lit(left), F.lit(right)
    merged = F.concat(l, r)
    return vocab.select(
        F.aggregate(
            "sym",
            F.array().cast("array<string>"),
            lambda acc, x: F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == l)
                & (x == r),
                F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
            ).otherwise(F.concat(acc, F.array(x))),
        ).alias("sym"),
        "cnt",
    )


def train_bpe(
    df: DataFrame, text_col: str, n_merges: int = 20
) -> list[tuple[int, str, str, int]]:
    """Learn ``n_merges`` BPE merges; returns
    [(rank, left, right, support), ...] in learned order."""
    vocab = words_with_counts(df, text_col).localCheckpoint(eager=True)
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        top = (
            _pair_counts(vocab)
            .orderBy(F.desc("support"), "l", "r")
            .limit(1)
            .collect()
        )
        if not top or top[0]["support"] < 2:
            break
        l, r, s = top[0]["l"], top[0]["r"], int(top[0]["support"])
        merges.append((rank, l, r, s))
        vocab = _merge_pair(vocab, l, r).localCheckpoint(eager=True)
    return merges


def reference_bpe(texts: list[str], n_merges: int = 20):
    """Pure-Python reference with identical semantics (for tests)."""
    from collections import Counter

    vocab: Counter = Counter()
    for t in texts:
        for w in t.strip().lower().split():
            vocab[tuple(list(w) + [END])] += 1
    merges = []
    for rank in range(1, n_merges + 1):
        pairs: Counter = Counter()
        for sym, cnt in vocab.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += cnt
        if not pairs:
            break
        # argmax with (support desc, lexicographic asc) tiebreak
        (l, r), s = min(pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if s < 2:
            break
        merges.append((rank, l, r, s))
        new_vocab: Counter = Counter()
        for sym, cnt in vocab.items():
            out = []
            for x in sym:
                if out and out[-1] == l and x == r:
                    out[-1] = l + r
                else:
                    out.append(x)
            new_vocab[tuple(out)] += cnt
        vocab = new_vocab
    return merges
