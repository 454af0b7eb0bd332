"""Round-13 operator tests: independent Python replays (the
ratio_metric_delta precedent) and brute-force equivalences for the new
queries, beyond the oracle parity the driver checks."""

import hashlib
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from noaa_etl_spark.io import load_table
from tests.conftest import SF_SMALL


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def test_logrank_numpy_replay(spark):
    """Replay the entire log-rank computation in plain Python from the
    same md5-planted lifetimes and require bit-adjacent agreement on
    every statistic (the folds are ordered, so tolerance is 0 for the
    integers and ~1e-12 relative for the doubles)."""
    from noaa_etl_spark.queries.temporal import q_logrank_test

    row = q_logrank_test(spark, SF_SMALL).collect()[0]

    users = [
        r["user_id"]
        for r in load_table(spark, SF_SMALL, "events")
        .filter(F.col("user_id").isNotNull())
        .select("user_id")
        .distinct()
        .collect()
    ]
    lives = []
    for u in users:
        treat = _md5(f"lr:{u}")[0] < "8"
        h = int(_md5(f"lrd:{u}")[:12], 16)
        dur = 1 + (h % 40) + (8 if treat else 0)
        lives.append((min(dur, 30), dur <= 30, treat))
    n1_total = sum(1 for _, _, t in lives if t)
    n0_total = len(lives) - n1_total
    grid = {}
    for t, died, treat in lives:
        g = grid.setdefault(t, [0, 0, 0, 0])  # dd1 dd0 cc1 cc0
        idx = (0 if died else 2) + (0 if treat else 1)
        g[idx] += 1
    ts = sorted(grid)
    # at-risk via desc cumsum
    n1 = n0 = 0
    atrisk = {}
    for t in sorted(ts, reverse=True):
        dd1, dd0, cc1, cc0 = grid[t]
        n1 += dd1 + cc1
        n0 += dd0 + cc0
        atrisk[t] = (n1, n0)
    o1 = 0
    e1 = v1 = 0.0
    for t in ts:
        dd1, dd0, _, _ = grid[t]
        if dd1 + dd0 == 0:
            continue
        a1, a0 = atrisk[t]
        ntot = a1 + a0
        r = a1 / ntot
        d = float(dd1 + dd0)
        o1 += dd1
        e1 += d * r
        if ntot > 1:
            v1 += d * r * (1.0 - r) * ((ntot - (dd1 + dd0)) / (ntot - 1))
    z = (o1 - e1) / math.sqrt(v1)
    assert row["n1_total"] == n1_total and row["n0_total"] == n0_total
    assert row["o1"] == o1
    assert abs(row["e1"] - e1) < 1e-9 * max(1.0, abs(e1))
    assert abs(row["var_o1"] - v1) < 1e-9 * max(1.0, abs(v1))
    assert abs(row["z"] - z) < 1e-9 * max(1.0, abs(z))
    assert row["reject_95"] == (z * z > 3.841458820694124)
    # The planted +8-day treatment effect must be detectable: arm 1
    # dies LESS than expected under H0 (o1 < e1) by construction.
    assert row["o1"] < row["e1"]


def test_ewma_irregular_closed_form_equals_recurrence(spark):
    """The closed form sum(v*exp(-(T-t)/tau)) must equal the sequential
    recurrence s_i = v_i + exp(-dt/tau)*s_{i-1} — the algebraic identity
    the operator's scale story rests on — on real fixture rows."""
    from noaa_etl_spark.queries.temporal import q_ewma_irregular

    got = {
        r["user_id"]: (r["n_events"], r["decay_score"])
        for r in q_ewma_irregular(spark, SF_SMALL).collect()
    }
    rows = (
        load_table(spark, SF_SMALL, "events")
        .filter(F.col("user_id").isNotNull())
        .select("user_id", F.unix_micros("ts").alias("t"), "value")
        .collect()
    )
    per_user = {}
    for r in rows:
        per_user.setdefault(r["user_id"], []).append((r["t"], r["value"]))
    tau = 86400000000.0
    for u, evs in per_user.items():
        evs.sort()
        s = 0.0
        prev_t = None
        for t, v in evs:
            decay = 1.0 if prev_t is None else math.exp(-(t - prev_t) / tau)
            s = v + decay * s
            prev_t = t
        n, score = got[u]
        assert n == len(evs)
        assert abs(score - s) < 1e-3 * max(1.0, abs(s)), (u, score, s)


def test_sorted_neighborhood_equals_bruteforce(spark):
    """SNM pairs == the brute-force definition {(a,b): 0 < pos_b-pos_a
    <= w and lev <= 2} under the identical total order, on a synthetic
    corpus with planted tail typos, repeated names, and singletons."""
    from noaa_etl_spark.queries.etl import q_sorted_neighborhood_dedup

    got = {
        (r["id_a"], r["id_b"], r["dist"])
        for r in q_sorted_neighborhood_dedup(spark, SF_SMALL).collect()
    }

    cust = load_table(spark, SF_SMALL, "customer").select(
        F.col("c_custkey").alias("k"), F.col("c_name").alias("name")
    ).collect()
    rows = [(r["k"], r["name"]) for r in cust]
    for k, name in list(rows):
        if _md5(f"snm:{k}")[:2] < "40":
            rows.append((k + 10_000_000, name[:-1]))
    rows.sort(key=lambda x: (x[1], x[0]))

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    expect = set()
    w = 8
    for i in range(len(rows)):
        for j in range(i + 1, min(i + w + 1, len(rows))):
            d = lev(rows[i][1], rows[j][1])
            if d <= 2:
                expect.add((rows[i][0], rows[j][0], d))
    assert got == expect
    assert len(expect) > 0  # the planted twins guarantee matches


def test_source_entropy_numpy_replay(spark):
    """Entropy report replayed in Python; effective source count must
    satisfy 1 <= eff <= n_sources (Jensen bound)."""
    from noaa_etl_spark.queries.sampling import q_source_entropy

    row = q_source_entropy(spark, SF_SMALL).collect()[0]
    docs = load_table(spark, SF_SMALL, "documents").select("source", "text").collect()
    per = {}
    for r in docs:
        n_tok = len(r["text"].split(" "))
        d, t = per.get(r["source"], (0, 0))
        per[r["source"]] = (d + 1, t + n_tok)
    docs_total = sum(d for d, _ in per.values())
    tokens_total = sum(t for _, t in per.values())
    h_docs = sum(
        -(d / docs_total) * math.log(d / docs_total)
        for d, _ in (per[s] for s in sorted(per))
    )
    h_tokens = sum(
        -(t / tokens_total) * math.log(t / tokens_total)
        for _, t in (per[s] for s in sorted(per))
    )
    assert row["n_sources"] == len(per)
    assert row["docs_total"] == docs_total
    assert row["tokens_total"] == tokens_total
    assert abs(row["h_docs"] - h_docs) < 1e-8
    assert abs(row["h_tokens"] - h_tokens) < 1e-8
    for eff, h in (
        (row["eff_sources_docs"], row["h_docs"]),
        (row["eff_sources_tokens"], row["h_tokens"]),
    ):
        assert 1.0 - 1e-9 <= eff <= len(per) + 1e-9
        assert abs(eff - math.exp(h)) < 1e-5


def test_cuped_numpy_replay(spark):
    """Replay CUPED end-to-end in numpy from the raw fixture rows (own
    day/cents/dollar quantization, own md5 arms) and require bit-
    adjacent agreement; variance reduction must equal corr(x,y)^2 and
    sit in [0, 1]."""
    from noaa_etl_spark.queries.profiling import q_cuped_adjustment

    row = q_cuped_adjustment(spark, SF_SMALL).collect()[0]
    ev = (
        load_table(spark, SF_SMALL, "events")
        .filter(F.col("user_id").isNotNull())
        .select("user_id", F.unix_micros("ts").alias("t"), "value")
        .collect()
    )
    per_day = {}
    for r in ev:
        day = r["t"] // 86400000000
        cents = math.floor(r["value"] * 100)
        k = (r["user_id"], day)
        per_day[k] = per_day.get(k, 0) + cents
    days = [d for _, d in per_day]
    mid = (min(days) + max(days) + 1) // 2
    xy = {}
    for (u, d), c in per_day.items():
        x, y = xy.get(u, (0, 0))
        if d < mid:
            x += c
        else:
            y += c
        xy[u] = (x, y)
    xs = np.array([x // 100 for x, _ in xy.values()], dtype=np.float64)
    ys = np.array([y // 100 for _, y in xy.values()], dtype=np.float64)
    treats = np.array([_md5(f"cuped:{u}")[0] < "8" for u in xy], dtype=bool)
    n = len(xs)
    cov_n = (xs * ys).sum() - xs.sum() * ys.sum() / n
    varx_n = (xs * xs).sum() - xs.sum() ** 2 / n
    vary_n = (ys * ys).sum() - ys.sum() ** 2 / n
    theta = cov_n / varx_n
    assert row["n"] == n
    assert row["n_a"] == int(treats.sum())
    assert abs(row["theta"] - theta) < 1e-9 * max(1.0, abs(theta))
    assert abs(row["var_y"] - vary_n / (n - 1)) < 1e-6 * vary_n
    red = (cov_n * cov_n / varx_n) / vary_n
    assert abs(row["var_reduction"] - red) < 1e-9
    assert 0.0 <= row["var_reduction"] <= 1.0
    assert abs(
        row["var_y_cuped"] - (vary_n - cov_n * cov_n / varx_n) / (n - 1)
    ) < 1e-6 * vary_n
    da = ys[treats].mean() - ys[~treats].mean()
    dx = xs[treats].mean() - xs[~treats].mean()
    assert abs(row["diff_raw"] - da) < 1e-9 * max(1.0, abs(da))
    assert abs(row["diff_cuped"] - (da - theta * dx)) < 1e-9 * max(
        1.0, abs(da - theta * dx)
    )


def test_line_dedup_replay_and_properties(spark):
    """Replay the global first-occurrence line dedup in Python: same
    survivors, same reassembly hashes; every distinct line survives
    exactly once corpus-wide."""
    from noaa_etl_spark.queries.text import q_line_dedup_global

    got = {
        r["doc_id"]: (r["n_kept"], r["kept_md5"])
        for r in q_line_dedup_global(spark, SF_SMALL).collect()
    }
    docs = (
        load_table(spark, SF_SMALL, "documents").select("doc_id", "text").collect()
    )
    winners = {}
    for r in sorted(docs, key=lambda r: r["doc_id"]):
        toks = r["text"].split(" ")
        for i in range((len(toks) + 9) // 10):
            line = " ".join(toks[i * 10 : i * 10 + 10])
            key = r["doc_id"] * 1048576 + i
            if line not in winners or key < winners[line]:
                winners[line] = key
    per_doc = {}
    for line, key in winners.items():
        per_doc.setdefault(key // 1048576, []).append((key % 1048576, line))
    expect = {}
    for d, lines in per_doc.items():
        lines.sort()
        text = " ".join(l for _, l in lines)
        expect[d] = (len(lines), hashlib.md5(text.encode()).hexdigest())
    assert got == expect
    # every distinct line survives exactly once corpus-wide
    assert sum(n for n, _ in got.values()) == len(winners)


def test_rolling_corr_numpy_replay(spark):
    """Rolling correlation replayed with numpy over the same daily
    integer series; values in [-1, 1]; the n=1 first row is NULL."""
    from noaa_etl_spark.queries.temporal import q_rolling_corr

    rows = sorted(
        q_rolling_corr(spark, SF_SMALL).collect(), key=lambda r: r["day"]
    )
    days = [r["day"] for r in rows]
    assert days == sorted(set(days))
    xs = {r["day"]: r["x"] for r in rows}
    ys = {r["day"]: r["y"] for r in rows}
    for r in rows:
        win = [d for d in days if r["day"] - 6 <= d <= r["day"]]
        n = len(win)
        assert r["n"] == n
        x = np.array([xs[d] for d in win], dtype=np.float64)
        y = np.array([ys[d] for d in win], dtype=np.float64)
        vx = n * (x * x).sum() - x.sum() ** 2
        vy = n * (y * y).sum() - y.sum() ** 2
        if n > 1 and vx > 0 and vy > 0:
            corr = (n * (x * y).sum() - x.sum() * y.sum()) / (
                math.sqrt(vx) * math.sqrt(vy)
            )
            assert abs(r["corr7"] - corr) < 1e-9, (r["day"], r["corr7"], corr)
            assert -1.0 - 1e-12 <= r["corr7"] <= 1.0 + 1e-12
        else:
            assert r["corr7"] is None
