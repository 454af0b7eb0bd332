"""BPE tokenizer-merge training as a driver-coordinated Spark loop
(SURVEY.md §2.I — LLM-pipeline tokenization; the genuinely iterative op
the §3.1 oracle contract exempts, graded rows-only + golden-tested).

Classic byte-pair-encoding over the corpus word-frequency dictionary:
start from character sequences, repeatedly (1) count adjacent symbol
pairs weighted by word frequency, (2) pick the globally most frequent
pair (deterministic tie-break: count desc, then left/right asc), and
(3) greedily merge that pair left-to-right in every word.

Spark-first shape — per merge round:

- pair counting is ``transform(sequence(...))`` + explode + a
  map-side-combinable sum: one small shuffle of (pair, count) partials.
- the argmax is a top-1 ``TakeOrderedAndProject`` + a 1-row collect
  (bounded driver traffic, same contract as the IVF/k-means trainers).
- the merge rewrite is a JVM-side ``aggregate()`` fold over each word's
  symbol array — scan-local, no Python round-trip, no shuffle.

Greedy-fold correctness: appending ``merged = left||right`` can never
re-trigger the (left, right) test on the next element because
``merged == left`` would require an empty right symbol, so the simple
"if last(acc)==left and x==right then replace-last else append" fold IS
left-to-right non-overlapping BPE merging (e.g. 'aaa' under ('a','a')
→ ['aa','a'], 'aab' under ('a','b') → ['a','ab']).

100 TB: the word-frequency dict is orders of magnitude smaller than the
corpus (vocabulary, not tokens — ~1e7-1e8 rows at web scale), built by
one exact map-side-combinable count. Every round shuffles only pair
partials (bounded by vocab × avg word length), and the per-round
rewrite is embarrassingly parallel. Lineage is cut with
``localCheckpoint`` every few rounds (the pointer-doubling precedent in
operators/hierarchy.py).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _merge_fold(left: str, right: str):
    """Factory (not a closure with default args — CLAUDE.md HOF-arity
    pitfall) returning the aggregate() merge lambda for one pair."""
    merged = left + right

    def fold(acc, x):
        return F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x)))

    return fold


def train_bpe_local(
    word_counts: list[tuple[str, int]], n_merges: int
) -> list[tuple[int, str, str, int]]:
    """Driver-local BPE training over an already-aggregated (word, count)
    dictionary — the path every production tokenizer trainer takes: the
    corpus scan is distributed, the *vocabulary* fits one machine (a
    10M-type web vocab is ~100 MB). Same greedy semantics and tie-break
    as the distributed loop; the two paths are equality-tested."""
    seqs: list[tuple[list[str], int]] = [(list(w), int(c)) for w, c in word_counts]
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, cnt in seqs:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + cnt
        if not counts:
            break
        # argmax with the same total order as the distributed loop:
        # count desc, then (left, right) asc
        (left, right), n = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, left, right, n))
        merged = left + right
        for idx, (syms, cnt) in enumerate(seqs):
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            seqs[idx] = (out, cnt)
    return merges


def train_bpe(
    words: DataFrame,
    n_merges: int,
    word_col: str = "word",
    count_col: str = "cnt",
    checkpoint_every: int = 8,
    local_vocab_cap: int = 2_000_000,
) -> list[tuple[int, str, str, int]]:
    """Train ``n_merges`` BPE merges over a (word, count) dictionary.

    Returns [(rank, left, right, pair_count), ...] in merge order.
    Stops early if no adjacent pair remains. Deterministic for a given
    dictionary regardless of partitioning: pair counts are exact BIGINT
    sums and the argmax tie-break is total.

    When the dictionary holds ≤ ``local_vocab_cap`` distinct words it is
    collected and trained driver-side (bounded collect, the IVF-trainer
    contract) — vocabularies are bounded even at 100 TB corpus scale, so
    this is the expected path; the distributed per-round loop below is
    the honest fallback for pathological vocabularies."""
    if words.limit(local_vocab_cap + 1).count() <= local_vocab_cap:
        rows = words.select(word_col, count_col).collect()
        return train_bpe_local([(r[0], r[1]) for r in rows], n_merges)
    syms = words.select(
        F.col(count_col).alias("cnt"),
        F.split(F.col(word_col), "").alias("syms"),
    ).persist()
    syms.count()  # materialize before the loop (and pin round inputs)

    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        pairs = (
            syms.filter(F.size("syms") >= 2)
            .select(
                "cnt",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(syms) - 1),"
                        " i -> struct(element_at(syms, i) AS l,"
                        "             element_at(syms, i + 1) AS r))"
                    )
                ).alias("p"),
            )
            .groupBy("p.l", "p.r")
            .agg(F.sum("cnt").alias("n"))
        )
        top = pairs.orderBy(F.desc("n"), F.asc("l"), F.asc("r")).limit(1).collect()
        if not top:
            break
        left, right, n = top[0]["l"], top[0]["r"], int(top[0]["n"])
        merges.append((rank, left, right, n))

        rewritten = syms.select(
            "cnt",
            F.aggregate(
                "syms",
                F.array().cast("array<string>"),
                _merge_fold(left, right),
            ).alias("syms"),
        )
        if (rank + 1) % checkpoint_every == 0:
            rewritten = rewritten.localCheckpoint(eager=True)
        old = syms
        syms = rewritten.persist()
        syms.count()
        old.unpersist()

    syms.unpersist()
    return merges


def bpe_merges_df(
    spark: SparkSession, words: DataFrame, n_merges: int
) -> DataFrame:
    """train_bpe as a DataFrame: (rank INT, left, right, pair_count)."""
    merges = train_bpe(words, n_merges)
    return spark.createDataFrame(
        merges, schema="rank int, left string, right string, pair_count bigint"
    )


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Encode one word with a trained merge table: repeatedly apply the
    LOWEST-rank applicable merge (the standard BPE encode order — merge
    priority is training order, not left-to-right discovery)."""
    syms = list(word)
    while len(syms) >= 2:
        best_rank, best_i = None, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_encode_udf(merges: list[tuple[int, str, str, int]]):
    """Arrow-batched encoder over a token-array column: returns a pandas
    UDF mapping array<string> words → flat array<string> BPE tokens.
    The merge table rides the closure (small — vocab-bounded — the
    broadcast-variable equivalent for a Python UDF); per-batch word
    memoization exploits the Zipf repeat rate so each distinct word is
    encoded once per Arrow batch."""
    ranks = {(left, right): rank for rank, left, right, _ in merges}

    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, StringType

    @pandas_udf(ArrayType(StringType()))
    def encode(words: pd.Series) -> pd.Series:
        memo: dict[str, list[str]] = {}

        def enc_doc(ws):
            out: list[str] = []
            for w in ws:
                toks = memo.get(w)
                if toks is None:
                    toks = encode_word(w, ranks)
                    memo[w] = toks
                out.extend(toks)
            return out

        return words.map(enc_doc)

    return encode
