"""Round-15 second-session operator tests: independent Python replays
for the new battery / ML-primitive / corpus-law queries (ANOVA,
Kruskal-Wallis, diff-in-diff, decision stump, 2-feature OLS, Heaps'
law, gap regularity) plus batch==stream equality for twins #48-#50 —
beyond the oracle parity the driver checks."""

import hashlib
import math

import numpy as np
import pandas as pd

from tests.conftest import SF_SMALL


def _events_pdf():
    return pd.read_parquet(f"{SF_SMALL}/events.parquet")


def _arm(user_id) -> str:
    return (
        "A"
        if hashlib.md5(f"ab:{user_id}".encode()).hexdigest()[0] < "8"
        else "B"
    )


# ---------------------------------------------------------------- OLS


def test_multiple_regression_matches_numpy(spark):
    from noaa_etl_spark.queries.etl import q_multiple_regression

    row = q_multiple_regression(spark, SF_SMALL).collect()[0]
    li = pd.read_parquet(f"{SF_SMALL}/lineitem.parquet")
    x1 = np.floor(li.l_quantity + 0.5)
    x2 = np.floor(li.l_discount * 100 + 0.5)
    y = np.floor(li.l_extendedprice)
    X = np.column_stack([np.ones(len(li)), x1, x2])
    b, *_ = np.linalg.lstsq(X, y, rcond=None)
    assert row["n"] == len(li)
    assert abs(row["b0"] - b[0]) < 1e-4
    assert abs(row["b1"] - b[1]) < 1e-6
    assert abs(row["b2"] - b[2]) < 1e-6
    yhat = X @ b
    r2 = 1 - ((y - yhat) ** 2).sum() / ((y - y.mean()) ** 2).sum()
    assert abs(row["r2"] - r2) < 1e-5


# ---------------------------------------------------------------- ANOVA


def test_anova_matches_numpy(spark):
    from noaa_etl_spark.queries.profiling import q_one_way_anova

    row = q_one_way_anova(spark, SF_SMALL).collect()[0]
    ev = _events_pdf()
    cents = np.floor(ev.value * 100)
    g = ev.event_type
    grand = cents.mean()
    ssb = sum(
        len(cents[g == t]) * (cents[g == t].mean() - grand) ** 2
        for t in g.unique()
    )
    ssw = sum(
        ((cents[g == t] - cents[g == t].mean()) ** 2).sum() for t in g.unique()
    )
    k, n = g.nunique(), len(ev)
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert row["k"] == k and row["n"] == n
    assert abs(row["ssb"] - ssb) < max(1e-3, abs(ssb) * 1e-9)
    assert abs(row["ssw"] - ssw) < max(1e-3, abs(ssw) * 1e-9)
    assert abs(row["f_stat"] - f) < 1e-5


# ---------------------------------------------------------------- KW


def test_kruskal_matches_midrank_replay(spark):
    from noaa_etl_spark.queries.profiling import q_kruskal_wallis

    row = q_kruskal_wallis(spark, SF_SMALL).collect()[0]
    ev = _events_pdf()
    cents = np.floor(ev.value * 100).astype(np.int64)
    ranks = pd.Series(cents).rank(method="average").values
    n = len(cents)
    groups = ev.event_type.values
    h = 12.0 / (n * (n + 1)) * sum(
        ranks[groups == t].sum() ** 2 / (groups == t).sum()
        for t in np.unique(groups)
    ) - 3 * (n + 1)
    _, t_counts = np.unique(cents, return_counts=True)
    c = 1 - (t_counts**3 - t_counts).sum() / (n**3 - n)
    assert row["n"] == n
    assert abs(row["h"] - h) < 1e-6
    assert abs(row["h_adj"] - h / c) < 1e-6
    assert row["reject_95"] == (round(h / c, 6) > 9.487729)


# ---------------------------------------------------------------- DiD


def test_did_matches_replay(spark):
    from noaa_etl_spark.queries.profiling import q_diff_in_diff

    row = q_diff_in_diff(spark, SF_SMALL).collect()[0]
    ev = _events_pdf()
    cents = np.floor(ev.value * 100)
    arm = ev.user_id.map(_arm).values
    t_us = ev.ts.astype("datetime64[ns]").astype("int64") // 1000
    post = t_us >= 1705363200000000
    cells = {}
    for a in ("A", "B"):
        for p in (0, 1):
            m = (arm == a) & (post.values == bool(p))
            cells[f"{a}{p}"] = cents[m]
    did = (cells["B1"].mean() - cells["B0"].mean()) - (
        cells["A1"].mean() - cells["A0"].mean()
    )
    var_sum = sum(c.var(ddof=1) / len(c) for c in cells.values())
    assert row["n_a0"] == len(cells["A0"]) and row["n_b1"] == len(cells["B1"])
    assert abs(row["did"] - did) < 1e-6
    assert abs(row["z"] - did / math.sqrt(var_sum)) < 1e-5


# ---------------------------------------------------------------- stump


def test_stump_matches_bruteforce(spark):
    from noaa_etl_spark.queries.profiling import q_decision_stump

    row = q_decision_stump(spark, SF_SMALL).collect()[0]
    ev = _events_pdf()
    bucket = np.minimum(np.floor(ev.value * 100).astype(np.int64) // 50, 1023)
    y = (ev.event_type == "purchase").astype(int).values

    def ent(n, p):
        if n == 0:
            return 0.0
        out = 0.0
        for q in (p, n - p):
            if q > 0:
                out -= (q / n) * math.log(q / n)
        return out

    n_tot, p_tot = len(y), int(y.sum())
    best = None
    for k in sorted(set(bucket)):
        left = bucket <= k
        nl, pl = int(left.sum()), int(y[left].sum())
        nr, pr = n_tot - nl, p_tot - pl
        if nl == 0 or nr == 0:
            continue
        gain = round(
            ent(n_tot, p_tot)
            - (nl / n_tot) * ent(nl, pl)
            - (nr / n_tot) * ent(nr, pr),
            6,
        )
        if best is None or gain > best[0] or (gain == best[0] and k < best[1]):
            best = (gain, k, nl, pl, nr, pr)
    assert row["split_bucket"] == best[1]
    assert row["n_left"] == best[2] and row["pos_left"] == best[3]
    assert row["n_right"] == best[4] and row["pos_right"] == best[5]
    assert abs(row["gain"] - best[0]) < 2e-6


# ---------------------------------------------------------------- heaps


def test_heaps_matches_replay(spark):
    from noaa_etl_spark.queries.text import q_heaps_law

    row = q_heaps_law(spark, SF_SMALL).collect()[0]
    docs = pd.read_parquet(f"{SF_SMALL}/documents.parquet").sort_values("doc_id")
    seen, pts = set(), []
    cn = 0
    for _, r in docs.iterrows():
        toks = r["text"].split(" ")
        cn += len(toks)
        seen.update(toks)
        if r["doc_id"] % 7 == 0 and cn > 0 and len(seen) > 0:
            pts.append((math.log(cn), math.log(len(seen))))
    xs = np.array([p[0] for p in pts])
    ys = np.array([p[1] for p in pts])
    k = len(pts)
    slope = (k * (xs * ys).sum() - xs.sum() * ys.sum()) / (
        k * (xs * xs).sum() - xs.sum() ** 2
    )
    intercept = (ys.sum() - slope * xs.sum()) / k
    assert row["n_points"] == k
    assert abs(row["beta"] - slope) < 1e-5
    assert abs(row["ln_k"] - intercept) < 1e-4
    # natural-language-ish corpus: sublinear vocabulary growth
    assert 0.0 < row["beta"] < 1.0


# ---------------------------------------------------------------- gaps


def test_gap_regularity_matches_replay(spark):
    from noaa_etl_spark.queries.temporal import q_gap_regularity

    rows = {r["user_id"]: r for r in q_gap_regularity(spark, SF_SMALL).collect()}
    ev = _events_pdf().sort_values(["user_id", "ts", "event_id"])
    checked = 0
    for uid, grp in ev.groupby("user_id"):
        t = grp.ts.astype("datetime64[ns]").astype("int64").values // 1000  # micros
        if len(t) < 2:
            assert uid not in rows
            continue
        g = np.diff(t) // 1_000_000
        r = rows[uid]
        assert r["n_gaps"] == len(g)
        mean = g.sum() / len(g)
        assert abs(r["mean_gap_s"] - mean) < 1e-6
        if len(g) > 1 and g.sum() > 0:
            cv = math.sqrt(max(g.var(ddof=1), 0.0)) / mean
            assert abs(r["cv"] - cv) < 1e-5
            assert r["is_regular"] == (len(g) >= 20 and round(cv, 6) < 0.5)
        checked += 1
        if checked >= 25:
            break


# ---------------------------------------------------------------- twins


def test_stream_kruskal_equals_batch(spark):
    from noaa_etl_spark.queries.profiling import q_kruskal_wallis
    from noaa_etl_spark.queries.streaming import q_stream_kruskal

    b = q_kruskal_wallis(spark, SF_SMALL).collect()[0].asDict()
    s = q_stream_kruskal(spark, SF_SMALL).collect()[0].asDict()
    assert b == s


def test_stream_did_equals_batch(spark):
    from noaa_etl_spark.queries.profiling import q_diff_in_diff
    from noaa_etl_spark.queries.streaming import q_stream_diff_in_diff

    b = q_diff_in_diff(spark, SF_SMALL).collect()[0].asDict()
    s = q_stream_diff_in_diff(spark, SF_SMALL).collect()[0].asDict()
    assert b == s


def test_stream_heaps_equals_batch(spark):
    from noaa_etl_spark.queries.streaming import q_stream_heaps
    from noaa_etl_spark.queries.text import q_heaps_law

    b = q_heaps_law(spark, SF_SMALL).collect()[0].asDict()
    s = q_stream_heaps(spark, SF_SMALL).collect()[0].asDict()
    assert b == s


# ---------------------------------------------------------------- wilcoxon


def test_wilcoxon_matches_midrank_replay(spark):
    from noaa_etl_spark.queries.profiling import q_wilcoxon_signed_rank

    row = q_wilcoxon_signed_rank(spark, SF_SMALL).collect()[0]
    ev = _events_pdf()
    cents = np.floor(ev.value * 100).astype(np.int64)
    t_us = ev.ts.astype("datetime64[ns]").astype("int64") // 1000
    pre = pd.Series(np.where(t_us < 1705363200000000, cents, 0)).groupby(
        ev.user_id.values
    ).sum()
    post = pd.Series(np.where(t_us >= 1705363200000000, cents, 0)).groupby(
        ev.user_id.values
    ).sum()
    d = (post - pre)[lambda s: s != 0]
    ranks = d.abs().rank(method="average")
    n = len(d)
    w_plus = ranks[d > 0].sum()
    assert row["n_nonzero"] == n
    assert row["w2_plus"] == int(round(2 * w_plus))
    _, t_counts = np.unique(d.abs().values, return_counts=True)
    mean = n * (n + 1) / 4
    var = n * (n + 1) * (2 * n + 1) / 24 - (t_counts**3 - t_counts).sum() / 48
    z = (w_plus - mean) / math.sqrt(var)
    assert abs(row["z"] - z) < 1e-5
    assert row["reject_95"] == (abs(round(z, 6)) > 1.959964)


# ---------------------------------------------------------------- bonferroni


def test_pairwise_bonferroni_matches_welch_replay(spark):
    from noaa_etl_spark.queries.profiling import q_pairwise_arms_bonferroni

    rows = {
        (r["grp_a"], r["grp_b"]): r
        for r in q_pairwise_arms_bonferroni(spark, SF_SMALL).collect()
    }
    ev = _events_pdf()
    cents = np.floor(ev.value * 100)
    groups = sorted(ev.event_type.unique())
    assert len(rows) == len(groups) * (len(groups) - 1) // 2
    for i, a in enumerate(groups):
        for b in groups[i + 1 :]:
            xa, xb = cents[ev.event_type == a], cents[ev.event_type == b]
            z = (xb.mean() - xa.mean()) / math.sqrt(
                xa.var(ddof=1) / len(xa) + xb.var(ddof=1) / len(xb)
            )
            r = rows[(a, b)]
            assert abs(r["z"] - z) < 1e-5
            assert r["reject_bonf"] == (abs(round(z, 6)) > 2.807034)


# ---------------------------------------------------------------- cramers v


def test_cramers_v_consistent_with_chi_square(spark):
    """V must equal sqrt(chi2_rounded / (N*min(r-1,c-1))) with the chi2
    matching q_chi_square_independence's grid statistic exactly (same
    grid, same term rendering)."""
    from noaa_etl_spark.queries.profiling import (
        q_chi_square_independence,
        q_cramers_v,
    )

    v_row = q_cramers_v(spark, SF_SMALL).collect()[0]
    chi_row = q_chi_square_independence(spark, SF_SMALL).collect()[0]
    assert v_row["chi2"] == chi_row["chi2"]
    expect = math.sqrt(
        v_row["chi2"]
        / (v_row["n_total"] * min(v_row["n_rows"] - 1, v_row["n_cols"] - 1))
    )
    assert abs(v_row["v"] - expect) < 1e-6
    assert 0.0 <= v_row["v"] <= 1.0


# ---------------------------------------------------------------- tukey


def test_tukey_fences_matches_replay(spark):
    from noaa_etl_spark.queries.windows import q_tukey_fences

    rows = {r["event_type"]: r for r in q_tukey_fences(spark, SF_SMALL).collect()}
    ev = _events_pdf()
    for t, grp in ev.groupby("event_type"):
        v = grp.value.values
        q1, q3 = np.quantile(v, 0.25), np.quantile(v, 0.75)
        lo, hi = q1 - 1.5 * (q3 - q1), q3 + 1.5 * (q3 - q1)
        r = rows[t]
        assert r["n"] == len(v)
        assert abs(r["q1"] - q1) < 1e-5 and abs(r["q3"] - q3) < 1e-5
        assert r["n_low"] == int((v < lo).sum())
        assert r["n_high"] == int((v > hi).sum())


# ---------------------------------------------------------------- twins 51-53


def test_stream_ols_equals_batch(spark):
    from noaa_etl_spark.queries.etl import q_multiple_regression
    from noaa_etl_spark.queries.streaming import q_stream_multiple_regression

    b = q_multiple_regression(spark, SF_SMALL).collect()[0].asDict()
    s = q_stream_multiple_regression(spark, SF_SMALL).collect()[0].asDict()
    assert b == s


def test_stream_stump_equals_batch(spark):
    from noaa_etl_spark.queries.profiling import q_decision_stump
    from noaa_etl_spark.queries.streaming import q_stream_decision_stump

    b = q_decision_stump(spark, SF_SMALL).collect()[0].asDict()
    s = q_stream_decision_stump(spark, SF_SMALL).collect()[0].asDict()
    assert b == s


def test_stream_wilcoxon_equals_batch(spark):
    from noaa_etl_spark.queries.profiling import q_wilcoxon_signed_rank
    from noaa_etl_spark.queries.streaming import q_stream_wilcoxon

    b = q_wilcoxon_signed_rank(spark, SF_SMALL).collect()[0].asDict()
    s = q_stream_wilcoxon(spark, SF_SMALL).collect()[0].asDict()
    assert b == s


# ---------------------------------------------------------------- levene


def test_levene_matches_brown_forsythe_replay(spark):
    """F is scale-invariant, so the doubled-z rendering must reproduce
    the classic Brown-Forsythe F on |x - median_g| exactly."""
    from noaa_etl_spark.queries.profiling import q_levene_test

    row = q_levene_test(spark, SF_SMALL).collect()[0]
    ev = _events_pdf()
    cents = np.floor(ev.value * 100)
    g = ev.event_type
    z = pd.Series(index=ev.index, dtype=float)
    for t in g.unique():
        z[g == t] = (cents[g == t] - cents[g == t].median()).abs()
    grand = z.mean()
    ssb = sum(len(z[g == t]) * (z[g == t].mean() - grand) ** 2 for t in g.unique())
    ssw = sum(((z[g == t] - z[g == t].mean()) ** 2).sum() for t in g.unique())
    k, n = g.nunique(), len(ev)
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert row["k"] == k and row["n"] == n
    assert abs(row["f_stat"] - f) < 1e-5
    # doubled-z scale: reported SS are exactly 4x the classic ones
    assert abs(row["ssb"] - 4 * ssb) < max(1e-2, 4 * ssb * 1e-9)
    assert abs(row["ssw"] - 4 * ssw) < max(1e-2, 4 * ssw * 1e-9)


# ---------------------------------------------------------------- MK


def test_mann_kendall_matches_pairwise_replay(spark):
    from noaa_etl_spark.queries.profiling import q_mann_kendall

    row = q_mann_kendall(spark, SF_SMALL).collect()[0]
    orders = pd.read_parquet(f"{SF_SMALL}/orders.parquet")
    days = (
        orders.o_orderdate.astype("datetime64[ns]").dt.floor("D").value_counts().sort_index()
    )
    y = days.values
    n = len(y)
    s = sum(
        np.sign(y[j] - y[i]) for i in range(n) for j in range(i + 1, n)
    )
    _, t_counts = np.unique(y, return_counts=True)
    var = (
        n * (n - 1) * (2 * n + 5) - (t_counts * (t_counts - 1) * (2 * t_counts + 5)).sum()
    ) / 18
    if s > 0:
        zz = (s - 1) / math.sqrt(var)
    elif s < 0:
        zz = (s + 1) / math.sqrt(var)
    else:
        zz = 0.0
    assert row["n_days"] == n
    assert row["s_stat"] == int(s)
    assert abs(row["z"] - zz) < 1e-5
    assert row["reject_95"] == (abs(round(zz, 6)) > 1.959964)


# ---------------------------------------------------------------- cronbach


def test_cronbach_matches_numpy(spark):
    from noaa_etl_spark.queries.profiling import q_cronbach_alpha

    row = q_cronbach_alpha(spark, SF_SMALL).collect()[0]
    ev = _events_pdf()
    dollars = np.floor(ev.value)
    items = []
    for t in ("click", "view", "purchase"):
        x = pd.Series(np.where(ev.event_type == t, dollars, 0)).groupby(
            ev.user_id.values
        ).sum()
        items.append(x)
    X = pd.concat(items, axis=1).fillna(0)
    k = 3
    vi = X.var(ddof=1)
    vt = X.sum(axis=1).var(ddof=1)
    alpha = k / (k - 1) * (1 - vi.sum() / vt)
    assert row["n_users"] == len(X)
    assert abs(row["alpha"] - alpha) < 1e-6
    assert abs(row["var_total"] - vt) < max(1e-3, vt * 1e-9)


# ---------------------------------------------------------------- twins 54-56


def test_stream_levene_equals_batch(spark):
    from noaa_etl_spark.queries.profiling import q_levene_test
    from noaa_etl_spark.queries.streaming import q_stream_levene

    b = q_levene_test(spark, SF_SMALL).collect()[0].asDict()
    s = q_stream_levene(spark, SF_SMALL).collect()[0].asDict()
    assert b == s


def test_stream_mann_kendall_equals_batch(spark):
    from noaa_etl_spark.queries.profiling import q_mann_kendall
    from noaa_etl_spark.queries.streaming import q_stream_mann_kendall

    b = q_mann_kendall(spark, SF_SMALL).collect()[0].asDict()
    s = q_stream_mann_kendall(spark, SF_SMALL).collect()[0].asDict()
    assert b == s


def test_stream_cronbach_equals_batch(spark):
    from noaa_etl_spark.queries.profiling import q_cronbach_alpha
    from noaa_etl_spark.queries.streaming import q_stream_cronbach

    b = q_cronbach_alpha(spark, SF_SMALL).collect()[0].asDict()
    s = q_stream_cronbach(spark, SF_SMALL).collect()[0].asDict()
    assert b == s


# ---------------------------------------------------------------- friedman


def test_friedman_matches_replay(spark):
    from noaa_etl_spark.queries.profiling import q_friedman_test

    row = q_friedman_test(spark, SF_SMALL).collect()[0]
    ev = _events_pdf()
    cents = np.floor(ev.value * 100).astype(np.int64)
    cell = (
        pd.DataFrame({"u": ev.user_id, "t": ev.event_type, "x": cents})
        .groupby(["u", "t"])
        .x.sum()
        .unstack()
    )
    complete = cell.dropna()
    n, k = len(complete), 5
    ranks = complete.rank(axis=1, method="average")
    rj = ranks.sum(axis=0)
    a1 = (ranks**2).values.sum()
    c1 = n * k * (k + 1) ** 2 / 4
    chi2 = (k - 1) * ((rj**2).sum() - n * n * k * (k + 1) ** 2 / 4) / (a1 - c1)
    assert row["n_blocks"] == n
    assert abs(row["chi2"] - chi2) < 1e-5
    assert row["reject_95"] == (round(chi2, 6) > 9.487729)


# ---------------------------------------------------------------- twin 57


def test_stream_gap_regularity_equals_batch(spark):
    """The segment-boundary reconstruction must reproduce the batch
    per-user gap census EXACTLY (every row, every moment)."""
    from noaa_etl_spark.queries.streaming import q_stream_gap_regularity
    from noaa_etl_spark.queries.temporal import q_gap_regularity

    b = {r["user_id"]: r.asDict() for r in q_gap_regularity(spark, SF_SMALL).collect()}
    s = {
        r["user_id"]: r.asDict()
        for r in q_stream_gap_regularity(spark, SF_SMALL).collect()
    }
    assert b == s


# ---------------------------------------------------------------- page-hinkley


def test_page_hinkley_matches_replay(spark):
    from noaa_etl_spark.queries.temporal import q_page_hinkley

    row = q_page_hinkley(spark, SF_SMALL).collect()[0]
    orders = pd.read_parquet(f"{SF_SMALL}/orders.parquet")
    days = (
        orders.o_orderdate.astype("datetime64[ns]").dt.floor("D").value_counts().sort_index()
    )
    y = days.values.astype(float)
    t = cum = m = minm = ph = 0.0
    for v in y:
        t += 1.0
        cum += v
        m += v - cum / t
        minm = min(minm, m)
        ph = max(ph, m - minm)
    assert row["n_days"] == len(y)
    assert abs(row["final_m"] - m) < 1e-6
    assert abs(row["ph_stat"] - ph) < 1e-6
    assert row["alarm"] == (round(ph, 6) > 100.0)


# ---------------------------------------------------------------- local cc


def test_clustering_coefficient_matches_bruteforce(spark):
    from noaa_etl_spark.queries.scale import q_clustering_coefficient

    rows = q_clustering_coefficient(spark, SF_SMALL).collect()
    li = pd.read_parquet(f"{SF_SMALL}/lineitem.parquet")
    li = li[li.l_quantity >= 45]
    adj = {}
    for _, grp in li.groupby("l_orderkey"):
        parts = sorted(set(grp.l_partkey))
        for i, u in enumerate(parts):
            for v in parts[i + 1 :]:
                adj.setdefault(u, set()).add(v)
                adj.setdefault(v, set()).add(u)
    for r in rows:
        node = r["node"]
        nb = adj[node]
        d = len(nb)
        tri = sum(
            1
            for x in nb
            for y_ in nb
            if x < y_ and y_ in adj.get(x, set())
        )
        assert r["degree"] == d
        assert r["n_triangles"] == tri, node
        assert abs(r["local_cc"] - 2 * tri / (d * (d - 1))) < 1e-6
    # output deterministically ordered by (degree desc, node)
    keys = [(-r["degree"], r["node"]) for r in rows]
    assert keys == sorted(keys)


# ---------------------------------------------------------------- norms


def test_embedding_norm_audit_matches_numpy(spark):
    from noaa_etl_spark.queries.similarity import q_embedding_norm_audit

    rows = {r["label"]: r for r in q_embedding_norm_audit(spark, SF_SMALL).collect()}
    emb = pd.read_parquet(f"{SF_SMALL}/embeddings.parquet")
    for label, grp in emb.groupby("label"):
        V = np.stack(grp.embedding.values).astype(np.float64)
        norms = np.sqrt((V * V).sum(axis=1))
        qn = np.floor(norms * 1e6 + 0.5).astype(np.int64)
        r = rows[label]
        assert r["n_vecs"] == len(grp)
        assert abs(r["min_norm_u"] - qn.min()) <= 1
        assert abs(r["max_norm_u"] - qn.max()) <= 1
        assert abs(r["mean_norm"] - qn.mean() / 1e6) < 1e-5


def test_stream_page_hinkley_equals_batch(spark):
    from noaa_etl_spark.queries.streaming import q_stream_page_hinkley
    from noaa_etl_spark.queries.temporal import q_page_hinkley

    b = q_page_hinkley(spark, SF_SMALL).collect()[0].asDict()
    s = q_stream_page_hinkley(spark, SF_SMALL).collect()[0].asDict()
    assert b == s


def test_stream_norm_audit_equals_batch(spark):
    from noaa_etl_spark.queries.similarity import q_embedding_norm_audit
    from noaa_etl_spark.queries.streaming import q_stream_norm_audit

    b = {r["label"]: r.asDict() for r in q_embedding_norm_audit(spark, SF_SMALL).collect()}
    s = {r["label"]: r.asDict() for r in q_stream_norm_audit(spark, SF_SMALL).collect()}
    assert b == s


# ---------------------------------------------------------------- ttc


def test_time_to_convert_matches_replay(spark):
    from noaa_etl_spark.queries.temporal import q_funnel_time_to_convert

    rows = {r["stage"]: r for r in q_funnel_time_to_convert(spark, SF_SMALL).collect()}
    ev = _events_pdf()
    t_us = ev.ts.astype("datetime64[ns]").astype("int64") // 1000
    firsts = (
        pd.DataFrame({"u": ev.user_id, "t": t_us, "ty": ev.event_type})
        .groupby(["u", "ty"])
        .t.min()
        .unstack()
    )
    for stage, a, b in (
        ("view_to_click", "view", "click"),
        ("click_to_purchase", "click", "purchase"),
    ):
        f = firsts.dropna(subset=[a, b])
        lat = ((f[b] - f[a]) // 1_000_000)[lambda s: s >= 0]
        r = rows[stage]
        assert r["n_converted"] == len(lat)
        assert abs(r["median_s"] - np.quantile(lat, 0.5)) < 1e-5
        assert abs(r["p90_s"] - np.quantile(lat, 0.9)) < 1e-5


# ---------------------------------------------------------------- simpson


def test_simpson_check_consistent_with_post_strat(spark):
    """ate_ps must equal q_post_stratification's estimate and the
    reversal flag must be the sign disagreement of the two rounded
    estimates."""
    from noaa_etl_spark.queries.profiling import (
        q_post_stratification,
        q_simpson_check,
    )

    s_row = q_simpson_check(spark, SF_SMALL).collect()[0]
    ps_row = q_post_stratification(spark, SF_SMALL).collect()[0]
    assert s_row["ate_ps"] == ps_row["ate_ps"]
    assert s_row["n_strata"] == ps_row["n_strata"]
    p, a = s_row["pooled_diff"], s_row["ate_ps"]
    assert s_row["reversal"] == ((p > 0 and a < 0) or (p < 0 and a > 0))
    assert s_row["n_pos"] + s_row["n_neg"] <= s_row["n_strata"]


# ---------------------------------------------------------------- twin 60


def test_stream_tukey_equals_batch(spark):
    from noaa_etl_spark.queries.streaming import q_stream_tukey
    from noaa_etl_spark.queries.windows import q_tukey_fences

    b = {r["event_type"]: r.asDict() for r in q_tukey_fences(spark, SF_SMALL).collect()}
    s = {r["event_type"]: r.asDict() for r in q_stream_tukey(spark, SF_SMALL).collect()}
    assert b == s


# ---------------------------------------------------------------- slo


def test_slo_burn_matches_replay(spark):
    from noaa_etl_spark.queries.temporal import q_error_budget_slo

    rows = {r["hour_idx"]: r for r in q_error_budget_slo(spark, SF_SMALL).collect()}
    ev = _events_pdf()
    t_us = ev.ts.astype("datetime64[ns]").astype("int64") // 1000
    hour = t_us // 3_600_000_000
    df = pd.DataFrame({"h": hour, "err": (ev.event_type == "error").astype(int)})
    hourly = df.groupby("h").agg(n=("err", "size"), n_err=("err", "sum"))
    for h, r in hourly.iterrows():
        row = rows[h]
        assert row["n"] == r.n and row["n_err"] == r.n_err
        in6 = hourly[(hourly.index >= h - 5) & (hourly.index <= h)]
        b1 = round(r.n_err / r.n / 0.22, 6)
        b6 = round(in6.n_err.sum() / in6.n.sum() / 0.22, 6)
        assert abs(row["burn_1h"] - b1) < 1e-9
        assert abs(row["burn_6h"] - b6) < 1e-9
        assert row["page_alert"] == (b1 > 1.0 and b6 > 1.0)


# ---------------------------------------------------------------- twin 61


def test_stream_simpson_equals_batch(spark):
    from noaa_etl_spark.queries.profiling import q_simpson_check
    from noaa_etl_spark.queries.streaming import q_stream_simpson

    b = q_simpson_check(spark, SF_SMALL).collect()[0].asDict()
    s = q_stream_simpson(spark, SF_SMALL).collect()[0].asDict()
    assert b == s


# ---------------------------------------------------------------- multidelim


def test_csv_multichar_delim_roundtrip_lossless(spark):
    from noaa_etl_spark.queries.sources import q_csv_multichar_delim

    rows = q_csv_multichar_delim(spark, SF_SMALL).collect()
    cust = pd.read_parquet(f"{SF_SMALL}/customer.parquet")
    assert sum(r["n_cust"] for r in rows) == len(cust)
    by_seg = cust.groupby("c_mktsegment").c_acctbal
    for r in rows:
        assert r["min_bal"] == by_seg.min()[r["c_mktsegment"]]
        assert r["max_bal"] == by_seg.max()[r["c_mktsegment"]]


# ---------------------------------------------------------------- waterfall


def test_metric_waterfall_telescopes(spark):
    """volume + rate + mix (unrounded identity) must reconstruct the
    exact integer delta for every type."""
    from noaa_etl_spark.queries.etl import q_metric_waterfall

    for r in q_metric_waterfall(spark, SF_SMALL).collect():
        if r["volume_effect"] is None or r["rate_effect"] is None:
            continue
        rate0 = r["r0"] / r["n0"]
        rate1 = r["r1"] / r["n1"]
        dn = r["n1"] - r["n0"]
        total = dn * rate0 + r["n0"] * (rate1 - rate0) + dn * (rate1 - rate0)
        assert abs(total - r["delta_cents"]) < 1e-6 * max(1, abs(r["delta_cents"]))
        assert abs(r["volume_effect"] - dn * rate0) < 1e-5


# ---------------------------------------------------------------- twin 62


def test_stream_clustering_equals_batch(spark):
    from noaa_etl_spark.queries.scale import q_clustering_coefficient
    from noaa_etl_spark.queries.streaming import q_stream_clustering_coefficient

    b = [r.asDict() for r in q_clustering_coefficient(spark, SF_SMALL).collect()]
    s = [r.asDict() for r in q_stream_clustering_coefficient(spark, SF_SMALL).collect()]
    assert b == s


# ---------------------------------------------------------------- strength


def test_seasonality_strength_matches_replay(spark):
    from noaa_etl_spark.queries.temporal import q_seasonality_strength

    rows = {r["event_type"]: r for r in q_seasonality_strength(spark, SF_SMALL).collect()}
    ev = _events_pdf()
    t_us = ev.ts.astype("datetime64[ns]").astype("int64") // 1000
    day = t_us // 86_400_000_000
    cents = np.floor(ev.value * 100).astype(np.int64)
    df = pd.DataFrame({"ty": ev.event_type, "d": day, "c": cents})
    daily = df.groupby(["ty", "d"]).c.sum().reset_index()
    for ty, grp in daily.groupby("ty"):
        y = grp.c.values.astype(float)
        dow = (grp.d.values + 4) % 7
        smean = pd.Series(y).groupby(dow).transform("mean").values
        r_ = y - smean
        vd = y.var()
        vr = ((r_ - r_.mean()) ** 2).mean()
        row = rows[ty]
        assert row["n_days"] == len(y)
        assert abs(row["var_daily"] - vd) < max(0.02, vd * 1e-9)
        assert abs(row["strength"] - max(0.0, 1 - vr / vd)) < 1e-5


# ---------------------------------------------------------------- twins 63-65


def test_stream_waterfall_equals_batch(spark):
    from noaa_etl_spark.queries.etl import q_metric_waterfall
    from noaa_etl_spark.queries.streaming import q_stream_metric_waterfall

    b = [r.asDict() for r in q_metric_waterfall(spark, SF_SMALL).collect()]
    s = [r.asDict() for r in q_stream_metric_waterfall(spark, SF_SMALL).collect()]
    assert b == s


def test_stream_seasonality_equals_batch(spark):
    from noaa_etl_spark.queries.streaming import q_stream_seasonality
    from noaa_etl_spark.queries.temporal import q_seasonality_strength

    b = [r.asDict() for r in q_seasonality_strength(spark, SF_SMALL).collect()]
    s = [r.asDict() for r in q_stream_seasonality(spark, SF_SMALL).collect()]
    assert b == s


def test_stream_ttc_equals_batch(spark):
    from noaa_etl_spark.queries.streaming import q_stream_funnel_ttc
    from noaa_etl_spark.queries.temporal import q_funnel_time_to_convert

    b = {r["stage"]: r.asDict() for r in q_funnel_time_to_convert(spark, SF_SMALL).collect()}
    s = {r["stage"]: r.asDict() for r in q_stream_funnel_ttc(spark, SF_SMALL).collect()}
    assert b == s


# ---------------------------------------------------------------- bounce/apdex


def test_bounce_rate_matches_replay(spark):
    from noaa_etl_spark.queries.temporal import q_bounce_rate

    rows = {r["day_idx"]: r for r in q_bounce_rate(spark, SF_SMALL).collect()}
    ev = _events_pdf().sort_values(["user_id", "ts", "event_id"])
    t_us = ev.ts.astype("datetime64[ns]").astype("int64") // 1000
    ev = ev.assign(t=t_us.values)
    total, bounce = {}, {}
    for _, grp in ev.groupby("user_id"):
        cur = []
        prev = None
        sessions = []
        for t in grp.t.values:
            if prev is None or t - prev > 1_800_000_000:
                if cur:
                    sessions.append(cur)
                cur = [t]
            else:
                cur.append(t)
            prev = t
        if cur:
            sessions.append(cur)
        for sess in sessions:
            d = sess[0] // 86_400_000_000
            total[d] = total.get(d, 0) + 1
            if len(sess) == 1:
                bounce[d] = bounce.get(d, 0) + 1
    for d, r in rows.items():
        assert r["n_sessions"] == total[d]
        assert r["n_bounce"] == bounce.get(d, 0)


def test_apdex_matches_replay(spark):
    from noaa_etl_spark.queries.temporal import q_apdex_score

    rows = {r["event_type"]: r for r in q_apdex_score(spark, SF_SMALL).collect()}
    ev = _events_pdf()
    for ty, grp in ev.groupby("event_type"):
        sat = int((grp.value <= 50.0).sum())
        tol = int(((grp.value > 50.0) & (grp.value <= 200.0)).sum())
        r = rows[ty]
        assert r["n_satisfied"] == sat and r["n_tolerating"] == tol
        assert abs(r["apdex"] - (sat + tol / 2) / len(grp)) < 1e-6


# ---------------------------------------------------------------- CA trend


def test_cochran_armitage_matches_replay(spark):
    from noaa_etl_spark.queries.profiling import q_cochran_armitage

    row = q_cochran_armitage(spark, SF_SMALL).collect()[0]
    ev = _events_pdf()
    s = np.minimum(np.floor(ev.value / 50).astype(np.int64), 4)
    y = (ev.event_type == "purchase").astype(int).values
    n_i = pd.Series(1, index=ev.index).groupby(s).sum()
    r_i = pd.Series(y).groupby(s.values).sum()
    sc = n_i.index.values
    N, R = n_i.sum(), r_i.sum()
    t = N * (sc * r_i.values).sum() - R * (sc * n_i.values).sum()
    p = R / N
    var = p * (1 - p) * (N * (sc * sc * n_i.values).sum() - (sc * n_i.values).sum() ** 2)
    z = t / math.sqrt(var)
    assert row["n"] == N and row["r"] == R
    assert abs(row["z"] - z) < 1e-5
    assert row["reject_95"] == (abs(round(z, 6)) > 1.959964)


# ---------------------------------------------------------------- MCC


def test_mcc_matches_replay(spark):
    from noaa_etl_spark.queries.profiling import q_mcc_score

    row = q_mcc_score(spark, SF_SMALL).collect()[0]
    ev = _events_pdf()
    y = (ev.event_type == "purchase").astype(int).values
    pred = (ev.value >= 100.0).astype(int).values
    tp = int(((y == 1) & (pred == 1)).sum())
    fp = int(((y == 0) & (pred == 1)).sum())
    fn = int(((y == 1) & (pred == 0)).sum())
    tn = int(((y == 0) & (pred == 0)).sum())
    mcc = (tp * tn - fp * fn) / math.sqrt(
        (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)
    )
    assert (row["tp"], row["fp"], row["fn"], row["tn"]) == (tp, fp, fn, tn)
    assert abs(row["mcc"] - mcc) < 1e-6
    assert -1.0 <= row["mcc"] <= 1.0


# ---------------------------------------------------------------- twins 66-67


def test_stream_bounce_equals_batch(spark):
    """Session stitching must reproduce the batch sessionization
    exactly — every day's session and bounce counts."""
    from noaa_etl_spark.queries.streaming import q_stream_bounce_rate
    from noaa_etl_spark.queries.temporal import q_bounce_rate

    b = {r["day_idx"]: r.asDict() for r in q_bounce_rate(spark, SF_SMALL).collect()}
    s = {r["day_idx"]: r.asDict() for r in q_stream_bounce_rate(spark, SF_SMALL).collect()}
    assert b == s


def test_stream_apdex_equals_batch(spark):
    from noaa_etl_spark.queries.streaming import q_stream_apdex
    from noaa_etl_spark.queries.temporal import q_apdex_score

    b = [r.asDict() for r in q_apdex_score(spark, SF_SMALL).collect()]
    s = [r.asDict() for r in q_stream_apdex(spark, SF_SMALL).collect()]
    assert b == s


# ---------------------------------------------------------------- twins 68-70


def test_stream_slo_equals_batch(spark):
    from noaa_etl_spark.queries.streaming import q_stream_error_budget
    from noaa_etl_spark.queries.temporal import q_error_budget_slo

    b = {r["hour_idx"]: r.asDict() for r in q_error_budget_slo(spark, SF_SMALL).collect()}
    s = {r["hour_idx"]: r.asDict() for r in q_stream_error_budget(spark, SF_SMALL).collect()}
    assert b == s


def test_stream_mcc_equals_batch(spark):
    from noaa_etl_spark.queries.profiling import q_mcc_score
    from noaa_etl_spark.queries.streaming import q_stream_mcc

    b = q_mcc_score(spark, SF_SMALL).collect()[0].asDict()
    s = q_stream_mcc(spark, SF_SMALL).collect()[0].asDict()
    assert b == s


def test_stream_ca_equals_batch(spark):
    from noaa_etl_spark.queries.profiling import q_cochran_armitage
    from noaa_etl_spark.queries.streaming import q_stream_cochran_armitage

    b = q_cochran_armitage(spark, SF_SMALL).collect()[0].asDict()
    s = q_stream_cochran_armitage(spark, SF_SMALL).collect()[0].asDict()
    assert b == s
