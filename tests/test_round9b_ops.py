"""Focused semantics tests for the second round-9 widening batch:
graph_bfs_hops, agg_heavy_hitters, text_unigram_perplexity,
embed_gram_matrix, events_seasonal_profile. Each runs on a hand-built
fixture with an independently computed expected answer (the DuckDB
oracle covers fixture-scale parity; these pin edge semantics the
fixtures may never exercise: unreachable components, Misra–Gries
decrement pressure, the exact LM math, numpy Gramian parity, and the
day-of-week alignment).
"""

from __future__ import annotations

import datetime
import math

import numpy as np

from data_collection_ieee_spark.operators.aggregates import agg_heavy_hitters
from data_collection_ieee_spark.operators.graph import graph_bfs_hops
from data_collection_ieee_spark.operators.similarity import embed_gram_matrix
from data_collection_ieee_spark.operators.streaming_shaped import (
    events_seasonal_profile,
)
from data_collection_ieee_spark.operators.text_analysis import (
    text_unigram_perplexity,
)


def _write(df, tmp_path, name):
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / f"{name}.parquet"))


def test_bfs_hops_and_unreachable_component(spark, tmp_path):
    # component A: s1 (hub, degree 2) — c1, c2;  component B: s2 — c3.
    # orders give cust per orderkey; lineitem gives supp per orderkey.
    orders = spark.createDataFrame(
        [(10, 1), (11, 2), (12, 3)], "o_orderkey long, o_custkey long"
    )
    lineitem = spark.createDataFrame(
        [(10, 1), (11, 1), (12, 2)], "l_orderkey long, l_suppkey long"
    )
    _write(orders, tmp_path, "orders")
    _write(lineitem, tmp_path, "lineitem")
    got = {
        (r["hop"], r["side"]): r["n_nodes"]
        for r in graph_bfs_hops(spark, str(tmp_path)).collect()
    }
    assert got == {
        (0, "supplier"): 1,  # the hub s1 itself
        (1, "customer"): 2,  # c1, c2 one hop away
        (-1, "customer"): 1,  # c3 unreachable from s1's component
        (-1, "supplier"): 1,  # s2 unreachable
    }


def test_heavy_hitters_exact_under_decrement_pressure(spark, tmp_path):
    # 600 distinct rare tokens (3x the K=200 counters, forcing constant
    # Misra–Gries decrements) + two genuinely heavy tokens. The MG
    # candidate stage may emit junk; the verify pass must return
    # EXACTLY the > N/200 set with exact counts.
    rare = " ".join(f"r{i}" for i in range(600))  # 600 singleton tokens
    rows = [
        (1, "hot " * 50 + rare, "en", "s", 0),  # hot x50
        (2, "warm " * 10 + "hot " * 50, "en", "s", 0),  # hot x50, warm x10
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    _write(df, tmp_path, "documents")
    # token totals: 600 rare + 100 hot + 10 warm + 2 trailing '' from
    # "hot "*50 split -> actually 'hot '*50 + rare has no trailing
    # empty; row 2 ends with 'hot ' -> one '' token. Compute exactly:
    toks = []
    for _, text, *_ in rows:
        toks.extend(text.split(" "))
    total = len(toks)
    from collections import Counter

    exact = {t: c for t, c in Counter(toks).items() if c * 200 > total}
    got = {
        r["token"]: (r["cnt"], r["share"])
        for r in agg_heavy_hitters(spark, str(tmp_path)).collect()
    }
    assert set(got) == set(exact)
    for t, c in exact.items():
        assert got[t][0] == c
        assert abs(got[t][1] - round(c / total, 6)) < 1e-9


def test_unigram_perplexity_matches_closed_form(spark, tmp_path):
    # corpus: doc1 = "a a b", doc2 = "b c"; counts a=2 b=2 c=1 total=5
    rows = [(1, "a a b", "en", "s", 0), (2, "b c", "en", "s", 0)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    _write(df, tmp_path, "documents")
    p = {"a": 2 / 5, "b": 2 / 5, "c": 1 / 5}
    want = {
        1: -(math.log(p["a"]) * 2 + math.log(p["b"])) / 3,
        2: -(math.log(p["b"]) + math.log(p["c"])) / 2,
    }
    got = {
        r["doc_id"]: (r["n_tokens"], r["cross_entropy"])
        for r in text_unigram_perplexity(spark, str(tmp_path)).collect()
    }
    assert got[1][0] == 3 and got[2][0] == 2
    assert abs(got[1][1] - round(want[1], 6)) < 1e-9
    assert abs(got[2][1] - round(want[2], 6)) < 1e-9


def test_gram_matrix_matches_numpy(spark, tmp_path):
    rng = np.random.RandomState(7)
    x = rng.randn(40, 8).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id long, embedding array<float>",
    )
    _write(df, tmp_path, "embeddings")
    want = x.astype(np.float64).T @ x.astype(np.float64)
    got = {(r["i"], r["j"]): r["g"] for r in embed_gram_matrix(spark, str(tmp_path)).collect()}
    assert len(got) == 8 * 9 // 2  # upper triangle incl. diagonal
    for (i, j), g in got.items():
        assert j >= i
        assert abs(g - round(float(want[i, j]), 6)) < 1e-5


def test_seasonal_profile_dow_alignment_and_ratio(spark, tmp_path):
    # 2024-01-01 is a Monday -> dow must be 1 (Sunday=0 convention).
    mon9 = datetime.datetime(2024, 1, 1, 9, 30)
    mon10 = datetime.datetime(2024, 1, 1, 10, 15)
    rows = [
        (1, mon9, 7, "view", 2.0, "{}"),
        (2, mon9, 8, "view", 4.0, "{}"),
        (3, mon10, 7, "view", 6.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    _write(df, tmp_path, "events")
    got = {
        (r["dow"], r["hod"]): r
        for r in events_seasonal_profile(spark, str(tmp_path)).collect()
    }
    assert set(got) == {(1, 9), (1, 10)}
    c9 = got[(1, 9)]
    assert c9["n_events"] == 2
    assert abs(c9["avg_value"] - 3.0) < 1e-9
    # load_ratio = n * 168 / type_total = 2 * 168 / 3
    assert abs(c9["load_ratio"] - round(2 * 168 / 3, 6)) < 1e-9


def test_psi_drift_zero_when_halves_identical(spark, tmp_path):
    # same value multiset in both time halves -> p == q in every
    # bucket -> every PSI term is exactly (p-q)*ln(p/q) = 0.
    vals = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0, 10.0]
    rows = []
    eid = 0
    for day, _half in ((1, "p"), (20, "q")):
        for v in vals:
            rows.append(
                (eid, datetime.datetime(2024, 1, day, 12, 0), 1, "view", v, "{}")
            )
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    _write(df, tmp_path, "events")
    from data_collection_ieee_spark.operators.stats import stats_psi_drift

    got = stats_psi_drift(spark, str(tmp_path)).collect()
    assert len(got) == 1
    r = got[0]
    assert r["n_first"] == 10 and r["n_second"] == 10
    assert r["psi"] == 0.0


def test_psi_drift_flags_planted_shift(spark, tmp_path):
    # first half uniform over [0, 10); second half collapsed onto the
    # top bucket -> large positive PSI, computed against an
    # independent python mirror of the binning + floor rules.
    first = [float(i) for i in range(10)]  # 0..9 -> lo=0, hi=9
    second = [9.0] * 10
    rows = []
    eid = 0
    for day, vals in ((1, first), (20, second)):
        for v in vals:
            rows.append(
                (eid, datetime.datetime(2024, 1, day, 12, 0), 1, "view", v, "{}")
            )
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    _write(df, tmp_path, "events")
    from data_collection_ieee_spark.operators.stats import stats_psi_drift

    got = stats_psi_drift(spark, str(tmp_path)).collect()[0]
    # python mirror
    lo, hi = 0.0, 9.0
    import collections

    def bucket(v):
        return min(9, max(0, math.floor((v - lo) * 10.0 / (hi - lo))))

    cp = collections.Counter(bucket(v) for v in first)
    cq = collections.Counter(bucket(v) for v in second)
    psi = 0.0
    for b in range(10):
        p = max(cp.get(b, 0) / 10.0, 1e-6)
        q = max(cq.get(b, 0) / 10.0, 1e-6)
        psi += (p - q) * math.log(p / q)
    assert got["psi"] > 1.0  # unambiguous drift
    assert abs(got["psi"] - round(psi, 6)) < 1e-9


def test_market_basket_support_and_lift(spark, tmp_path):
    # baskets: o1={A,B,C} o2={A,B} o3={A,B} o4={C}
    # pairs >=2: only (A,B) x3.  A=1, B=2, C=3 as part keys.
    rows = [
        (1, 1), (1, 2), (1, 3),
        (2, 1), (2, 2),
        (3, 1), (3, 2),
        (4, 3),
    ]
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    _write(li, tmp_path, "lineitem")
    from data_collection_ieee_spark.operators.joins import orders_market_basket

    got = orders_market_basket(spark, str(tmp_path)).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["p1"], r["p2"], r["pair_orders"]) == (1, 2, 3)
    assert abs(r["support"] - 0.75) < 1e-9  # 3 of 4 orders
    assert abs(r["lift"] - round(3 * 4 / (3 * 3), 6)) < 1e-9


def test_benford_digits_planted_distribution(spark, tmp_path):
    # 30 orders: first digits 1 x20, 2 x6, 9 x4 — incl. boundary
    # values that a log10/floor extraction could misclassify.
    prices = (
        [10.00] * 10 + [1.23] * 5 + [100.00] * 5  # digit 1 x20
        + [2.50] * 6  # digit 2 x6
        + [0.99] * 4  # digit 9 x4 (leading zero skipped)
    )
    rows = [(i, 1, "O", p, datetime.datetime(2024, 1, 1), "1-URGENT")
            for i, p in enumerate(prices)]
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    _write(df, tmp_path, "orders")
    from data_collection_ieee_spark.operators.stats import stats_benford_digits

    got = {r["digit"]: r for r in stats_benford_digits(spark, str(tmp_path)).collect()}
    assert {d: got[d]["n"] for d in got} == {1: 20, 2: 6, 9: 4}
    assert abs(got[1]["share"] - round(20 / 30, 6)) < 1e-9
    assert abs(got[1]["benford"] - round(math.log10(2), 6)) < 1e-9
    assert abs(got[9]["deviation"]
               - round(4 / 30 - math.log10(1 + 1 / 9), 6)) < 1e-9


def test_pmi_collocations_planted_phrase(spark, tmp_path):
    # "new york" always adjacent (PMI >> 0); filler tokens independent.
    # 10 docs x "new york " + independent filler pairs to cross the
    # support floor for a low-PMI pair.
    phrase_doc = ("new york " * 5).strip()  # 5 bigram occurrences/doc
    filler_doc = "x y " * 3 + "y x " * 3  # x,y adjacent both ways
    rows = [(i, phrase_doc, "en", "s", 0) for i in range(5)] + [
        (100 + i, filler_doc.strip(), "en", "s", 0) for i in range(5)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    _write(df, tmp_path, "documents")
    from data_collection_ieee_spark.operators.text_analysis import (
        text_pmi_collocations,
    )

    got = {
        (r["w1"], r["w2"]): (r["c_ab"], r["pmi"])
        for r in text_pmi_collocations(spark, str(tmp_path)).collect()
    }
    assert ("new", "york") in got
    # python mirror for the planted phrase
    import collections

    all_bigrams = collections.Counter()
    all_uni = collections.Counter()
    for _, text, *_ in rows:
        t = text.split(" ")
        all_uni.update(t)
        all_bigrams.update(zip(t, t[1:]))
    n_pairs = sum(all_bigrams.values())
    n_uni = sum(all_uni.values())
    for (w1, w2), (c_ab, pmi) in got.items():
        assert c_ab == all_bigrams[(w1, w2)] >= 5
        want = math.log(
            (c_ab / n_pairs)
            / ((all_uni[w1] / n_uni) * (all_uni[w2] / n_uni))
        )
        assert abs(pmi - round(want, 6)) < 1e-9
    # "new york" beats the independent filler pair on PMI
    assert got[("new", "york")][1] > got[("x", "y")][1]


def test_path_trigrams_order_and_rank(spark, tmp_path):
    # user 1: view->click->purchase->view  (trigrams VCP, CPV)
    # user 2: view->click->purchase        (trigram VCP)
    rows = []
    eid = 0
    for uid, types in ((1, ["view", "click", "purchase", "view"]),
                       (2, ["view", "click", "purchase"])):
        for i, t in enumerate(types):
            rows.append(
                (eid, datetime.datetime(2024, 1, 1, 0, i), uid, t, 1.0, "{}")
            )
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    _write(df, tmp_path, "events")
    from data_collection_ieee_spark.operators.streaming_shaped import (
        events_path_trigrams,
    )

    got = [
        (r["pos"], r["e1"], r["e2"], r["e3"], r["n"])
        for r in events_path_trigrams(spark, str(tmp_path)).collect()
    ]
    got.sort()
    assert got == [
        (1, "view", "click", "purchase", 2),
        (2, "click", "purchase", "view", 1),
    ]


def test_assortativity_star_is_negative(spark, tmp_path):
    # star: supplier 1 connects to customers 1..4 (hub-leaf mixing is
    # maximally disassortative: every edge pairs degree 4 with degree 1
    # -> r undefined for constant x... so add a second component with a
    # 2-cycle pattern to give variance: s2-c5, s2-c6 (degree 2 vs 1).
    orders = spark.createDataFrame(
        [(i, i) for i in range(1, 7)], "o_orderkey long, o_custkey long"
    )
    lineitem = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 1), (5, 2), (6, 2)],
        "l_orderkey long, l_suppkey long",
    )
    df_o = orders
    df_l = lineitem
    df_o.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    df_l.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    from data_collection_ieee_spark.operators.graph import graph_assortativity

    got = graph_assortativity(spark, str(tmp_path)).collect()[0]
    # python mirror over the 12 directed edges
    deg = {"s1": 4, "s2": 2, "c1": 1, "c2": 1, "c3": 1, "c4": 1, "c5": 1, "c6": 1}
    pairs = []
    for c, s in (("c1", "s1"), ("c2", "s1"), ("c3", "s1"), ("c4", "s1"),
                 ("c5", "s2"), ("c6", "s2")):
        pairs.append((deg[c], deg[s]))
        pairs.append((deg[s], deg[c]))
    n = len(pairs)
    sx = sum(x for x, _ in pairs); sy = sum(y for _, y in pairs)
    sxy = sum(x * y for x, y in pairs)
    sxx = sum(x * x for x, _ in pairs); syy = sum(y * y for _, y in pairs)
    want = (n * sxy - sx * sy) / (
        math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)
    )
    assert got["n_directed_edges"] == n
    assert abs(got["assortativity"] - round(want, 6)) < 1e-9
    assert got["assortativity"] < 0  # hub-leaf graphs are disassortative


def test_burstiness_metronome_vs_bursty(spark, tmp_path):
    # user 1: metronome (constant 60 s gaps) -> burstiness == 0 exactly
    # user 2: bursty (five 1 s gaps, one 3600 s gap) -> large positive
    rows = []
    eid = 0
    t = datetime.datetime(2024, 1, 1)
    for i in range(7):
        rows.append((eid, t + datetime.timedelta(seconds=60 * i), 1, "view", 1.0, "{}"))
        eid += 1
    t2 = datetime.datetime(2024, 1, 2)
    offs = [0, 1, 2, 3, 4, 5, 3605]
    for o in offs:
        rows.append((eid, t2 + datetime.timedelta(seconds=o), 2, "view", 1.0, "{}"))
        eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    _write(df, tmp_path, "events")
    from data_collection_ieee_spark.operators.streaming_shaped import (
        events_interarrival_burstiness,
    )

    got = {r["user_id"]: r for r in
           events_interarrival_burstiness(spark, str(tmp_path)).collect()}
    assert got[1]["burstiness"] == 0.0
    assert got[1]["mean_gap_s"] == 60.0
    assert got[1]["min_gap_us"] == 60_000_000
    # python mirror for user 2: gaps 1,1,1,1,1,3600 seconds in micros
    gaps = [1_000_000] * 5 + [3_600_000_000]
    n = len(gaps); sg = sum(gaps); sg2 = sum(g * g for g in gaps)
    want = (n * float(sg2) - float(sg) * float(sg)) / (float(sg) * float(sg))
    assert abs(got[2]["burstiness"] - round(want, 6)) < 1e-9
    assert got[2]["mean_gap_s"] == (sg // n) / 1e6


def test_rfm_scores_and_segments(spark, tmp_path):
    # 5 customers with strictly increasing recency/frequency/monetary:
    # customer k places k orders, last on day k, each worth 100*k.
    rows = []
    ok = 0
    for k in range(1, 6):
        for j in range(k):
            rows.append(
                (ok, k, "O", 100.0 * k,
                 datetime.datetime(2024, 1, k), "1-URGENT")
            )
            ok += 1
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    _write(df, tmp_path, "orders")
    from data_collection_ieee_spark.operators.tpch import orders_rfm_segments

    got = {r["o_custkey"]: r for r in
           orders_rfm_segments(spark, str(tmp_path)).collect()}
    assert len(got) == 5
    # perfectly correlated metrics: every customer has equal r/f/m
    # scores, monotone in k; customer 5 is the champion, 1 hibernates
    for k in range(1, 6):
        r = got[k]
        assert r["r_score"] == r["f_score"] == r["m_score"], k
    assert [got[k]["r_score"] for k in range(1, 6)] == sorted(
        got[k]["r_score"] for k in range(1, 6)
    )
    assert got[5]["segment"] == "champion"
    assert got[1]["segment"] == "hibernating"
    assert got[5]["frequency"] == 5 and got[5]["monetary"] == 2500.0
