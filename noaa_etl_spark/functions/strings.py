"""String-similarity scalar functions beyond the JVM built-ins.

Spark ships `levenshtein` (used by the exact fuzzy joins in
operators/fuzzy.py) but no Jaro-Winkler; this provides it as an
Arrow-batched pandas UDF, calibrated BIT-EXACTLY against DuckDB's
`jaro_winkler_similarity` (standard Jaro with the 0.7 boost threshold,
p = 0.1, prefix cap 4; empty strings score 0.0 even against each other
— the one DuckDB quirk). 300+ randomized pairs verified exact in
tests/test_algorithms.py, which is what lets q_fuzzy_rank grade
float-equal cross-engine.

This is deliberately the documented slow path: per-row Python inside
an Arrow batch. Use it on BOUNDED candidate sets (post-blocking pairs
from the fuzzy join's prefix filter, dim-table ranking), never as a
corpus-scale scan predicate — the 100 TB pattern is block first
(operators/fuzzy.py), verify/score the survivors here.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType


def _jaro(s1: str, s2: str) -> float:
    if len(s1) == 0 or len(s2) == 0:
        return 0.0
    if s1 == s2:
        return 1.0
    n1, n2 = len(s1), len(s2)
    window = max(n1, n2) // 2 - 1
    if window < 0:
        window = 0
    m1 = [False] * n1
    m2 = [False] * n2
    m = 0
    for i, c in enumerate(s1):
        lo, hi = max(0, i - window), min(n2, i + window + 1)
        for j in range(lo, hi):
            if not m2[j] and s2[j] == c:
                m1[i] = m2[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(n1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    return (m / n1 + m / n2 + (m - t) / m) / 3.0


def jaro_winkler_py(s1: str, s2: str, p: float = 0.1, max_l: int = 4) -> float:
    """Plain-Python Jaro-Winkler, the single source of truth the UDF
    wraps (and tests compare against DuckDB)."""
    if s1 is None or s2 is None:
        return None  # type: ignore[return-value]
    j = _jaro(s1, s2)
    if j > 0.7:
        l = 0
        for a, b in zip(s1[:max_l], s2[:max_l]):
            if a != b:
                break
            l += 1
        j = j + l * p * (1.0 - j)
    return j


# DoubleType() instance, not the "double" DDL string: string return
# types are parsed through the active SparkContext, which would make
# this module unimportable before a session exists (pytest collection,
# driver import — same class of bug as module-level Columns).
@pandas_udf(DoubleType())
def _jw_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series(
        [jaro_winkler_py(x, y) for x, y in zip(a, b)], dtype="float64"
    )


def jaro_winkler(a: Column | str, b: Column | str) -> Column:
    """Column form: jaro_winkler(col_a, col_b) → double in [0, 1]."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return _jw_udf(a, b)
