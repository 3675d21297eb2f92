"""Property-based tests (SURVEY.md §5.4): algebraic identities that must
hold for ANY input, checked over hypothesis-generated micro-frames.

Each property runs a bounded number of examples (Spark jobs are not
free) with shrinking disabled-by-deadline; the frames are tiny but
adversarial — empty strings, duplicate rows, unicode, missing columns.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from data_collection_ieee_spark.sources.articles import (
    ACM_COLUMNS,
    IEEE_COLUMNS,
    bronze_to_silver,
    merge_sources,
)

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

_token = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd"), max_codepoint=0x2FF),
    min_size=0,
    max_size=8,
)
_row = st.tuples(_token, st.integers(min_value=-50, max_value=50))
_rows = st.lists(_row, min_size=0, max_size=12)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k string, v int") if rows else (
        spark.createDataFrame([], "k string, v int")
    )


@given(a=_rows, b=_rows)
@settings(**_SETTINGS)
def test_filter_commutes_with_union(spark, a, b):
    """σ(A ∪ B) == σ(A) ∪ σ(B) — the identity that makes predicate
    pushdown through unions legal."""
    pred = F.col("v") > 0
    da, db = _df(spark, a), _df(spark, b)
    lhs = da.unionByName(db).filter(pred)
    rhs = da.filter(pred).unionByName(db.filter(pred))
    assert sorted(map(tuple, lhs.collect())) == sorted(map(tuple, rhs.collect()))


@given(rows=_rows)
@settings(**_SETTINGS)
def test_drop_duplicates_idempotent(spark, rows):
    df = _df(spark, rows)
    once = df.dropDuplicates(["k"])
    twice = once.dropDuplicates(["k"])
    assert sorted(r["k"] for r in once.collect()) == sorted(
        r["k"] for r in twice.collect()
    )
    # per-key cardinality is exactly 1
    ks = [r["k"] for r in once.collect()]
    assert len(ks) == len(set(ks))


@given(rows=_rows)
@settings(**_SETTINGS)
def test_bronze_to_silver_idempotent_and_null_normalizing(spark, rows):
    """No ""-sentinel survives silver normalization, in any column, and
    normalization never drops rows."""
    bronze_rows = [
        tuple("" if (i + v) % 3 == 0 else f"{t}{i}" for i in range(len(IEEE_COLUMNS)))
        for t, v in rows
    ]
    df = spark.createDataFrame(
        bronze_rows or [], ", ".join(f"{c} string" for c in IEEE_COLUMNS)
    )
    s1 = bronze_to_silver(df)
    for c in IEEE_COLUMNS:
        if c in s1.columns:
            assert s1.filter(F.col(c) == "").count() == 0, c
    assert s1.count() == df.count()  # normalization never drops rows


@given(a=_rows, b=_rows)
@settings(**_SETTINGS)
def test_schema_drift_union_total_and_null_padded(spark, a, b):
    """The 11-col ∪ 9-col merge keeps every row and null-pads exactly
    the columns the narrow side lacks."""
    ieee = spark.createDataFrame(
        [tuple(f"{t}{i}" for i in range(len(IEEE_COLUMNS))) for t, _ in a] or [],
        ", ".join(f"{c} string" for c in IEEE_COLUMNS),
    )
    acm = spark.createDataFrame(
        [tuple(f"{t}{i}" for i in range(len(ACM_COLUMNS))) for t, _ in b] or [],
        ", ".join(f"{c} string" for c in ACM_COLUMNS),
    )
    merged = merge_sources(bronze_to_silver(ieee), bronze_to_silver(acm))
    assert merged.count() == ieee.count() + acm.count()
    only_ieee = set(IEEE_COLUMNS) - set(ACM_COLUMNS)
    for c in only_ieee & set(merged.columns):
        # every ACM-origin row must be NULL in IEEE-only columns
        assert merged.filter(
            (F.col("indexation") == "ACM") & F.col(c).isNotNull()
        ).count() == 0


def test_win_ntile_dense_matches_naive_global_window(spark, sf_dir):
    """win_ntile_dense computes global NTILE/DENSE_RANK distributedly
    (range shuffle + collected per-partition offsets). Its correctness
    depends on the collected counts describing exactly the partitions
    the main job builds — a property a subtly-wrong variant (literal
    boundary re-derivation) violated at sf0.1 during round 4 while
    passing at sf0.01. Cross-check the full output against the naive
    single-partition window spec at whatever SF the tests run."""
    from pyspark.sql import Window

    from data_collection_ieee_spark import registry

    got = sorted(
        map(tuple, registry.QUERIES["win_ntile_dense"](spark, sf_dir).collect())
    )
    from data_collection_ieee_spark.catalog import load_table

    cu = load_table(spark, sf_dir, "customer")
    w = Window.orderBy(F.col("c_acctbal").desc(), F.col("c_custkey").asc())
    naive = sorted(
        map(
            tuple,
            cu.select(
                "c_custkey",
                "c_acctbal",
                F.ntile(4).over(w).cast("int").alias("balance_quartile"),
                F.dense_rank()
                .over(Window.orderBy("c_mktsegment"))
                .cast("int")
                .alias("segment_rank"),
            ).collect(),
        )
    )
    assert got == naive


def test_ntile4_dense_large_synthetic_with_ties(spark):
    """The round-4 sf0.1 regression class: repartitionByRange seeds its
    reservoir sample from the RDD id, so cross-job boundary agreement
    fails exactly when partitions get big enough to sample — i.e. only
    ABOVE the scale the small-SF oracles exercise. Drive the refactored
    helper with a 60k-row deterministic frame (heavy acctbal ties) and
    compare against the naive single-partition spec."""
    from pyspark.sql import Window

    from data_collection_ieee_spark.operators.windows import _ntile4_dense

    segs = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
    cu = spark.range(60_000).select(
        F.col("id").alias("c_custkey"),
        # pmod(xxhash64) gives a deterministic pseudo-random balance with
        # ~6 rows per distinct value -> plenty of cross-bucket ties
        (F.pmod(F.xxhash64("id"), F.lit(10_000)) / 100.0).alias("c_acctbal"),
        F.element_at(
            F.array(*[F.lit(s) for s in segs]),
            (F.pmod(F.xxhash64("id", F.lit(7)), F.lit(5)) + 1).cast("int"),
        ).alias("c_mktsegment"),
    )
    got = sorted(map(tuple, _ntile4_dense(cu).collect()))
    w = Window.orderBy(F.col("c_acctbal").desc(), F.col("c_custkey").asc())
    naive = sorted(
        map(
            tuple,
            cu.select(
                "c_custkey",
                "c_acctbal",
                F.ntile(4).over(w).cast("int").alias("balance_quartile"),
                F.dense_rank()
                .over(Window.orderBy("c_mktsegment"))
                .cast("int")
                .alias("segment_rank"),
            ).collect(),
        )
    )
    assert got == naive


# ---------------------------------------------------------------------------
# connected-components kernel: hot-key (giant hub) hardening (round 5)


def test_cc_10k_node_hub_component_converges(spark):
    """One 10k-node star (hub=0, spokes 1..9999: in-degree 9999 — far
    over HOT_DEGREE, so label lookups against the hub go through the
    broadcast path) plus a disjoint 4-cycle and two isolated nodes.
    Must converge inside the round cap and label every node with its
    component min."""
    from data_collection_ieee_spark.operators.dedup import connected_components

    n = 10_000
    star = [(0, s) for s in range(1, n)]
    cycle = [(20_000, 20_001), (20_001, 20_002), (20_002, 20_003), (20_003, 20_000)]
    pairs = spark.createDataFrame(star + cycle, "a_id bigint, b_id bigint")
    nodes = spark.createDataFrame(
        [(i,) for i in range(n)] + [(20_000 + i,) for i in range(4)] + [(30_000,), (30_001,)],
        "doc_id bigint",
    )
    labels = {r["doc_id"]: r["cluster_id"] for r in connected_components(spark, pairs, nodes).collect()}
    assert len(labels) == n + 6
    assert all(labels[i] == 0 for i in range(n))
    assert all(labels[20_000 + i] == 20_000 for i in range(4))
    assert labels[30_000] == 30_000 and labels[30_001] == 30_001


def test_cc_long_chain_exceeding_round_cap_in_hops(spark):
    """A 200-node path graph has diameter 199 — far beyond
    max_rounds=15 in PROPAGATION hops. Pointer jumping contracts label
    chains geometrically, so the cap must still suffice; every node
    must end at label 0 (plain propagation silently returned partial
    labels here)."""
    from data_collection_ieee_spark.operators.dedup import connected_components

    n = 200
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "a_id bigint, b_id bigint"
    )
    nodes = spark.createDataFrame([(i,) for i in range(n)], "doc_id bigint")
    labels = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(spark, pairs, nodes).collect()
    }
    assert len(labels) == n
    assert all(v == 0 for v in labels.values())


def test_cc_cold_path_matches_hot_path(spark):
    """The degree split is an execution detail: forcing every edge down
    the hot path (hot_degree=1) must give identical labels to the pure
    cold path (hot_degree=huge) on an irregular multi-component graph."""
    from data_collection_ieee_spark.operators.dedup import connected_components

    pairs_raw = [(1, 5), (5, 9), (9, 2), (40, 41), (41, 42), (7, 7), (3, 9)]
    nodes_raw = [1, 2, 3, 5, 7, 9, 40, 41, 42, 99]
    pairs = spark.createDataFrame(pairs_raw, "a_id bigint, b_id bigint")
    nodes = spark.createDataFrame([(i,) for i in nodes_raw], "doc_id bigint")
    hot = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(spark, pairs, nodes, hot_degree=1).collect()
    }
    cold = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(spark, pairs, nodes, hot_degree=10**9).collect()
    }
    expect = {1: 1, 2: 1, 3: 1, 5: 1, 9: 1, 40: 40, 41: 40, 42: 40, 7: 7, 99: 99}
    assert hot == expect
    assert cold == expect


def test_ntile_dense_null_balances_and_empty_input(spark):
    """_ntile4_dense: NULL c_acctbal rows must land in the final
    quartiles (DESC NULLS LAST), and an empty input must return an
    empty shaped frame instead of crashing on NULL percentiles."""
    from data_collection_ieee_spark.operators.windows import _ntile4_dense

    rows = [(1, 100.0, "A"), (2, 50.0, "B"), (3, None, "A"), (4, None, "B"),
            (5, 75.0, "A"), (6, 25.0, "B"), (7, 60.0, "A"), (8, 90.0, "B")]
    cu = spark.createDataFrame(rows, "c_custkey bigint, c_acctbal double, c_mktsegment string")
    got = {r["c_custkey"]: (r["balance_quartile"], r["segment_rank"]) for r in _ntile4_dense(cu).collect()}
    # order: 100,90,75,60,50,25,NULL(3),NULL(4) -> quartiles of n=8: 2 each
    assert got == {
        1: (1, 1), 8: (1, 2), 5: (2, 1), 7: (2, 1),
        2: (3, 2), 6: (3, 2), 3: (4, 1), 4: (4, 2),
    }

    empty = _ntile4_dense(cu.where("false"))
    assert empty.count() == 0
    assert [f.name for f in empty.schema.fields] == [
        "c_custkey", "c_acctbal", "balance_quartile", "segment_rank"
    ]


_edge = st.tuples(st.integers(0, 30), st.integers(0, 30))
_edges = st.lists(_edge, max_size=40)


@given(edges=_edges)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture])
def test_cc_matches_union_find_on_random_graphs(spark, edges):
    """connected_components == a driver-side union-find on arbitrary
    random graphs (self-loops, duplicate edges, isolated nodes)."""
    from data_collection_ieee_spark.operators.dedup import connected_components

    nodes = sorted({n for e in edges for n in e} | {777})  # 777 always isolated
    pairs = spark.createDataFrame(edges or [(0, 0)], "a_id bigint, b_id bigint")
    if not edges:
        pairs = pairs.where("false")
    nodes_df = spark.createDataFrame([(n,) for n in nodes], "doc_id bigint")
    got = {r["doc_id"]: r["cluster_id"]
           for r in connected_components(spark, pairs, nodes_df).collect()}

    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp: dict[int, list[int]] = {}
    for n in nodes:
        comp.setdefault(find(n), []).append(n)
    want = {m: min(ms) for ms in comp.values() for m in ms}
    assert got == want


_shingle_set = st.sets(st.integers(0, 25), min_size=1, max_size=12)
_docs = st.lists(_shingle_set, min_size=2, max_size=10)


@given(docs=_docs)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture])
def test_jaccard_paths_agree_on_random_shingle_sets(spark, docs):
    """Prefix-filter and count-join candidate generation must yield the
    same verified pair set on arbitrary small-universe shingle sets
    (high overlap by construction — the prefix theorem's stress zone)."""
    from data_collection_ieee_spark.operators.dedup import _jaccard_pairs

    sh = spark.createDataFrame(
        [(i, sorted(s)) for i, s in enumerate(docs)], "doc_id bigint, hs array<bigint>"
    )
    full = sorted(tuple(r) for r in _jaccard_pairs(spark, sh, force_prefix=False).collect())
    pref = sorted(tuple(r) for r in _jaccard_pairs(spark, sh, force_prefix=True).collect())
    assert full == pref


@given(
    docs=st.lists(
        st.lists(
            st.integers(min_value=0, max_value=5),  # tiny vocab forces dups
            min_size=0,
            max_size=14,
        ),
        min_size=0,
        max_size=6,
    )
)
@settings(**_SETTINGS)
def test_substring_spans_match_bruteforce(spark, docs):
    """_substring_spans(w=3) == a Python brute force on random tiny-vocab
    corpora: same duplicated-window positions, same maximal-span merge
    (pos gap > w breaks), same per-span window counts."""
    from collections import Counter

    from data_collection_ieee_spark.operators.dedup import _substring_spans

    w = 3
    texts = [" ".join(f"t{t}" for t in toks) for toks in docs]
    df = spark.createDataFrame(
        list(enumerate(texts)) or [(0, "")], "doc_id bigint, text string"
    )

    # brute force: count every w-gram across the corpus, then islands
    grams = Counter()
    per_doc_pos = {}
    for i, toks in enumerate(docs):
        toks = texts[i].split(" ")  # same tokenization incl. empty-text
        if len(toks) < w:
            continue
        for p in range(len(toks) - w + 1):
            g = tuple(toks[p : p + w])
            grams[g] += 1
            per_doc_pos.setdefault(i, []).append((p + 1, g))
    expected = set()
    for i, poss in per_doc_pos.items():
        dup = sorted(p for p, g in poss if grams[g] >= 2)
        if not dup:
            continue
        run = [dup[0]]
        for p in dup[1:]:
            if p - run[-1] > w:
                expected.add((i, run[0], run[-1] + w - 1, len(run)))
                run = [p]
            else:
                run.append(p)
        expected.add((i, run[0], run[-1] + w - 1, len(run)))

    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["n_dup_grams"])
        for r in _substring_spans(df, w=w).collect()
    }
    assert got == expected


@given(
    arrivals=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),  # key
            st.integers(min_value=0, max_value=50),  # minutes offset
        ),
        min_size=0,
        max_size=10,
    )
)
@settings(**_SETTINGS)
def test_watermark_chain_rounds_match_python_chain(spark, arrivals):
    """The round-based chain resolution inside dedup_within_watermark
    must equal the sequential per-key state machine (sort by ts; keep
    if > horizon past the last KEPT) for ANY arrival multiset — more
    rounds than the fixture's 2, ties included."""
    import datetime

    from data_collection_ieee_spark import catalog
    from data_collection_ieee_spark.operators.streaming_shaped import (
        _watermark_chain,
    )

    horizon_min = 10
    base = datetime.datetime(2024, 1, 1)
    rows = [
        (k, base + datetime.timedelta(minutes=m)) for k, m in arrivals
    ]
    df = (
        spark.createDataFrame(rows, "event_id bigint, ts timestamp")
        if rows
        else spark.createDataFrame([], "event_id bigint, ts timestamp")
    )
    got = {
        (r["event_id"], r["kept_ts"], r["n_dropped"])
        for r in _watermark_chain(df, horizon_min=horizon_min).collect()
    }
    catalog.release_caches()  # chain rounds persist_tracked per example

    expected = set()
    by_key = {}
    for k, ts in rows:
        by_key.setdefault(k, []).append(ts)
    for k, times in by_key.items():
        times.sort()
        kept_ts, absorbed = None, 0
        for ts in times:
            if kept_ts is None or ts > kept_ts + datetime.timedelta(minutes=horizon_min):
                if kept_ts is not None:
                    expected.add((k, kept_ts, absorbed))
                kept_ts, absorbed = ts, 0
            else:
                absorbed += 1
        if kept_ts is not None:
            expected.add((k, kept_ts, absorbed))
    assert got == expected
