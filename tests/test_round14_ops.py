"""Round-14 operator tests: independent Python replays (the
ratio_metric_delta precedent) and structural properties for the new
eval/correlation/feature-engineering queries, beyond the oracle parity
the driver checks."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from noaa_etl_spark.io import load_table
from tests.conftest import SF_SMALL


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _score48(user_id) -> int:
    return int(_md5(f"cal:{user_id}")[:12], 16)


def _labeled_events(spark):
    rows = (
        load_table(spark, SF_SMALL, "events")
        .filter(F.col("user_id").isNotNull())
        .select("user_id", "event_type", "value")
        .collect()
    )
    return [
        (_score48(r["user_id"]), 1 if r["event_type"] == "click" else 0, r["value"])
        for r in rows
    ]


def test_classification_report_replay(spark):
    """Confusion counts at each threshold replayed from the raw md5
    scores must match exactly; prec/rec/f1 are single chains over those
    integers so equality is exact too."""
    from noaa_etl_spark.queries.profiling import (
        CLS_THRESHOLDS,
        q_classification_report,
    )

    ev = _labeled_events(spark)
    got = {r["thr"]: r for r in q_classification_report(spark, SF_SMALL).collect()}
    assert set(got) == set(CLS_THRESHOLDS)
    for thr in CLS_THRESHOLDS:
        tp = sum(1 for s, y, _ in ev if s // 2**28 >= thr and y == 1)
        fp = sum(1 for s, y, _ in ev if s // 2**28 >= thr and y == 0)
        fn = sum(1 for s, y, _ in ev if s // 2**28 < thr and y == 1)
        tn = sum(1 for s, y, _ in ev if s // 2**28 < thr and y == 0)
        r = got[thr]
        assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (tp, fp, fn, tn)
        if tp + fp:
            assert r["prec"] == tp / (tp + fp)
        if tp + fn:
            assert r["rec"] == tp / (tp + fn)
        if tp + fp and tp + fn:
            p, rc = tp / (tp + fp), tp / (tp + fn)
            if p + rc > 0:
                assert abs(r["f1"] - 2.0 * p * rc / (p + rc)) < 1e-15


def test_cohens_kappa_replay(spark):
    """kappa replayed with the textbook po/pe formula from raw counts."""
    from noaa_etl_spark.queries.profiling import q_cohens_kappa

    ev = _labeled_events(spark)
    r = q_cohens_kappa(spark, SF_SMALL).collect()[0]
    tp = sum(1 for s, y, _ in ev if s >= 2**47 and y == 1)
    fp = sum(1 for s, y, _ in ev if s >= 2**47 and y == 0)
    fn = sum(1 for s, y, _ in ev if s < 2**47 and y == 1)
    tn = sum(1 for s, y, _ in ev if s < 2**47 and y == 0)
    n = tp + fp + fn + tn
    assert (r["tp"], r["fp"], r["fn"], r["tn"], r["n"]) == (tp, fp, fn, tn, n)
    po = (tp + tn) / n
    pe = ((tp + fp) / n) * ((tp + fn) / n) + ((fn + tn) / n) * ((fp + tn) / n)
    assert abs(r["po"] - po) < 1e-15 and abs(r["pe"] - pe) < 1e-15
    assert abs(r["kappa"] - (po - pe) / (1 - pe)) < 1e-12


def test_mcnemar_replay(spark):
    """Discordant-pair counts + the chi-square replayed per event."""
    from noaa_etl_spark.queries.profiling import q_mcnemar_test

    ev = _labeled_events(spark)
    r = q_mcnemar_test(spark, SF_SMALL).collect()[0]
    a = b = 0
    for s, y, v in ev:
        c1 = 1 if s >= 2**47 else 0
        c2 = 1 if math.floor(v * 100) >= 5000 else 0
        if c1 == y and c2 != y:
            a += 1
        if c1 != y and c2 == y:
            b += 1
    assert (r["n_disc_a"], r["n_disc_b"]) == (a, b)
    if a + b:
        assert abs(r["chi2"] - (a - b) ** 2 / (a + b)) < 1e-9
        assert r["reject_95"] == ((a - b) ** 2 / (a + b) > 3.841458820694124)


def test_target_encode_loo_replay(spark):
    """LOO encodings replayed from the raw category sums: the row's own
    target must be excluded (the leakage property), and the smoothed
    form must shrink toward the global mean."""
    from noaa_etl_spark.queries.etl import q_target_encode_loo

    rows = q_target_encode_loo(spark, SF_SMALL).collect()
    by_cat = {}
    total = cnt = 0
    for r in rows:
        by_cat.setdefault(r["cat"], []).append(r["cents"])
        total += r["cents"]
        cnt += 1
    gm = total / cnt
    for r in rows:
        vals = by_cat[r["cat"]]
        s, n = sum(vals), len(vals)
        if n > 1:
            assert r["te_loo"] == (s - r["cents"]) / (n - 1)
        else:
            assert r["te_loo"] is None
        expect = ((s - r["cents"]) + 10.0 * gm) / ((n - 1) + 10.0)
        assert abs(r["te_smooth"] - expect) < 1e-9


def test_grouped_kfold_partition(spark):
    """Folds partition the corpus: per-fold users and events sum to the
    corpus totals (a user double-counted across folds — the leakage
    failure — would inflate the user sum)."""
    from noaa_etl_spark.queries.sampling import q_grouped_kfold

    ev = load_table(spark, SF_SMALL, "events").filter(F.col("user_id").isNotNull())
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    rows = q_grouped_kfold(spark, SF_SMALL).collect()
    assert sum(r["n_events"] for r in rows) == n_events
    assert sum(r["n_users"] for r in rows) == n_users
    for r in rows:
        assert r["click_rate"] == r["n_clicks"] / r["n_events"]


def _daily_xy(spark):
    from noaa_etl_spark.queries.temporal import rolling_corr_daily

    return [
        (r["x"], r["y"])
        for r in rolling_corr_daily(load_table(spark, SF_SMALL, "events")).collect()
    ]


def test_spearman_replay(spark):
    """rho replayed with explicit midranks (rank average over ties)."""
    from noaa_etl_spark.queries.temporal import q_spearman_corr

    xy = _daily_xy(spark)
    r = q_spearman_corr(spark, SF_SMALL).collect()[0]
    assert r["n_days"] == len(xy)

    def midranks(vals):
        order = sorted(range(len(vals)), key=lambda i: vals[i])
        ranks = [0.0] * len(vals)
        i = 0
        while i < len(order):
            j = i
            while j + 1 < len(order) and vals[order[j + 1]] == vals[order[i]]:
                j += 1
            mid = (i + j) / 2 + 1
            for k in range(i, j + 1):
                ranks[order[k]] = mid
            i = j + 1
        return ranks

    ra = midranks([x for x, _ in xy])
    rb = midranks([y for _, y in xy])
    n = len(xy)
    ma, mb = sum(ra) / n, sum(rb) / n
    cov = sum((a - ma) * (b - mb) for a, b in zip(ra, rb))
    va = sum((a - ma) ** 2 for a in ra)
    vb = sum((b - mb) ** 2 for b in rb)
    assert abs(r["rho"] - cov / math.sqrt(va * vb)) < 1e-9


def test_kendall_tau_replay(spark):
    """tau-b replayed by brute-force pair classification."""
    from noaa_etl_spark.queries.temporal import q_kendall_tau

    xy = _daily_xy(spark)
    r = q_kendall_tau(spark, SF_SMALL).collect()[0]
    C = D = tx = ty = 0
    for i in range(len(xy)):
        for j in range(i + 1, len(xy)):
            (x1, y1), (x2, y2) = xy[i], xy[j]
            if (x1 < x2 and y1 < y2) or (x1 > x2 and y1 > y2):
                C += 1
            elif (x1 < x2 and y1 > y2) or (x1 > x2 and y1 < y2):
                D += 1
            elif x1 == x2 and y1 != y2:
                tx += 1
            elif y1 == y2 and x1 != x2:
                ty += 1
    assert (r["n_conc"], r["n_disc"], r["n_tie_x"], r["n_tie_y"]) == (C, D, tx, ty)
    assert r["n_pairs"] == len(xy) * (len(xy) - 1) // 2
    denom = math.sqrt(C + D + tx) * math.sqrt(C + D + ty)
    if denom:
        assert abs(r["tau_b"] - (C - D) / denom) < 1e-12


def test_neyman_allocation_props(spark):
    """Weights sum to 1, allocations floor under the budget, and the
    sd/weight chain replays from raw per-stratum moments."""
    from noaa_etl_spark.queries.sampling import q_neyman_allocation

    rows = q_neyman_allocation(spark, SF_SMALL).collect()
    assert abs(sum(r["w_h"] for r in rows) - 1.0) < 1e-9
    assert sum(r["alloc"] for r in rows) <= 1000
    ev = load_table(spark, SF_SMALL, "events").select("event_type", "value").collect()
    by = {}
    for r in ev:
        by.setdefault(r["event_type"], []).append(math.floor(r["value"] * 100))
    for r in rows:
        vals = by[r["event_type"]]
        n, s, ss = len(vals), sum(vals), sum(v * v for v in vals)
        sd = math.sqrt((n * ss - s * s) / (n * (n - 1))) if n > 1 else 0.0
        assert r["n_h"] == n
        assert abs(r["sd_h"] - sd) < 1e-9
        assert r["alloc"] == math.floor(1000.0 * r["w_h"])


def test_rouge_replay(spark):
    """ROUGE recalls replayed with Python set arithmetic on the two
    lowest-doc_id documents per source."""
    from noaa_etl_spark.queries.text import q_rouge_eval

    docs = (
        load_table(spark, SF_SMALL, "documents")
        .select("source", "doc_id", "text")
        .collect()
    )
    by_src = {}
    for r in docs:
        by_src.setdefault(r["source"], []).append((r["doc_id"], r["text"]))
    got = {r["source"]: r for r in q_rouge_eval(spark, SF_SMALL).collect()}
    for src, items in by_src.items():
        items.sort()
        if len(items) < 2:
            assert src not in got
            continue
        ref, cand = items[0][1].split(" "), items[1][1].split(" ")
        r1_ref = set(ref)
        r1_ov = len(set(cand) & r1_ref)
        ref2 = {" ".join(ref[i : i + 2]) for i in range(len(ref) - 1)}
        cand2 = {" ".join(cand[i : i + 2]) for i in range(len(cand) - 1)}
        r = got[src]
        assert (r["r1_overlap"], r["r1_ref"]) == (r1_ov, len(r1_ref))
        assert r["rouge1"] == r1_ov / len(r1_ref)
        assert (r["r2_overlap"], r["r2_ref"]) == (len(cand2 & ref2), len(ref2))
        if ref2:
            assert r["rouge2"] == len(cand2 & ref2) / len(ref2)


def test_isotonic_matches_reference_pav(spark):
    """The minimax closed form must equal the classic sequential
    pool-adjacent-violators fit (weighted), be monotone nondecreasing,
    and preserve level-set weighted means."""
    from noaa_etl_spark.queries.profiling import q_isotonic_calibration

    rows = sorted(
        q_isotonic_calibration(spark, SF_SMALL).collect(), key=lambda r: r["s10"]
    )
    assert rows
    # reference weighted PAV
    blocks = []  # (sum_c, sum_n)
    for r in rows:
        blocks.append([r["c"], r["n"]])
        while len(blocks) > 1 and blocks[-2][0] * blocks[-1][1] >= blocks[-1][0] * blocks[-2][1]:
            c2, n2 = blocks.pop()
            blocks[-1][0] += c2
            blocks[-1][1] += n2
    # expand blocks back to per-bucket values
    ref = []
    it = iter(rows)
    for c, n in blocks:
        taken = 0
        vals = []
        while taken < n:
            r = next(it)
            taken += r["n"]
            vals.append(r)
        ref.extend([c / n] * len(vals))
    got = [r["iso_rate"] for r in rows]
    assert len(ref) == len(got)
    for g, e in zip(got, ref):
        assert abs(g - e) < 1e-12
    # monotone
    for a, b in zip(got, got[1:]):
        assert a <= b + 1e-15
    # global weighted mean preserved
    tot_n = sum(r["n"] for r in rows)
    assert abs(
        sum(g * r["n"] for g, r in zip(got, rows)) / tot_n
        - sum(r["c"] for r in rows) / tot_n
    ) < 1e-12
