"""Deterministic scale-factor generator for the heavy-query trend runs
(VERDICT r5 #2).

The driver's testdata tops out at sf0.1; "designed for 100 TB" needs at
least one measured decade, so this script synthesizes an sfN (default
sf1 = 10x the sf0.1 row counts) version of the four tables the
expensive queries touch — documents, embeddings, events, orders — with
the same schemas and distributional shape as the driver fixtures
(vocab, length ranges, near-dup/exact-dup families at the same RATE so
pair counts stay LINEAR in the corpus — cloning sf0.1 rows 10x would
square the dup-family sizes and corrupt the trend).

Everything is seeded (numpy default_rng(42)); output goes OUTSIDE the
repo and testdata (default /tmp/dcis_scale/sf1) and is regenerable, so
nothing large is ever committed. tools/scale_trend.py consumes it.

Usage: python tools/gen_scale.py [--out DIR] [--factor 10]
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# sf0.1 row counts (TESTDATA.md / observed); sfN = factor x these.
# nation/region are fixed-cardinality at every scale factor (TPC-H
# convention) and are copied from the sf0.1 fixtures verbatim.
BASE = {
    "documents": 5_000,
    "embeddings": 2_000,
    "events": 100_000,
    "orders": 150_000,
    "lineitem": 600_000,
    "customer": 15_000,
    "part": 20_000,
    "supplier": 1_000,
}
FIXED_DIMS = ("nation", "region")

# chunked-build slice: ~10M rows per generated block / row group —
# bounded generator memory at factor 1000, ≥60 scan splits for lineitem
_CHUNK = 10_000_000

# the fixture corpus vocabulary (31 tokens observed at every sf)
VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window", "zone",
]
LANGS = ["en", "en", "de", "es", "fr", "zh"]  # en-weighted like the fixture
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
STATUSES = ["O", "P", "F"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


def scaled_vocab(factor: int) -> list[str]:
    """Vocabulary for a given scale factor. Up to sf1 (factor 10) this
    is the fixture's 31 tokens verbatim (keeps the committed sf0.1→sf1
    decade byte-stable). Beyond that the vocab grows ∝ factor (numbered
    variants of the base words) so the shingle DOCUMENT-FREQUENCY
    distribution stays constant across decades — the property real
    corpora have (vocabulary grows with corpus size; Heaps' law) and
    the property the trend needs: with the vocab pinned at 31 tokens
    the ~30k-trigram space saturates and pair-candidate mass grows
    quadratically in rows as a FIXTURE artifact, which would measure
    the generator, not the plans."""
    if factor <= 10:
        return list(VOCAB)
    # trigram SPACE grows with the CUBE of vocab size, so holding the
    # per-shingle document frequency constant across a decade needs the
    # space ∝ rows ⇒ vocab multiplier = (factor/10)^(1/3) (≈2.15 for
    # sf1→sf10: 31 → 66 tokens). A ×10 vocab would overshoot the space
    # ×1000 and collapse df to ~1 — as wrong (in the fast direction)
    # as the saturated 31-token df≈900.
    mult = (factor / 10) ** (1.0 / 3.0)
    target = max(len(VOCAB) + 1, round(len(VOCAB) * mult))
    out = list(VOCAB)
    i = 1
    while len(out) < target:
        out.extend(f"{w}{i}" for w in VOCAB)
        i += 1
    return out[:target]


def gen_documents(
    rng: np.random.Generator, n: int, vocab_words: list[str] | None = None
) -> pa.Table:
    vocab = np.array(vocab_words if vocab_words is not None else VOCAB)
    lens = rng.integers(10, 100, size=n)
    texts: list[str] = []
    for i in range(n):
        if i % 100 == 1 and texts:
            # near-dup family member: ~5% token mutation of the previous
            # doc (pairs stay 0.5% of N — linear, like the fixtures)
            toks = texts[i - 1].split(" ")
            for j in range(len(toks)):
                if rng.random() < 0.05:
                    toks[j] = vocab[rng.integers(len(vocab))]
            texts.append(" ".join(toks))
        elif i % 617 == 3 and texts:
            texts.append(texts[i - 1])  # exact duplicate
        else:
            texts.append(" ".join(vocab[rng.integers(0, len(vocab), lens[i])]))
    langs = [LANGS[int(x)] for x in rng.integers(0, len(LANGS), n)]
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(texts),
            "lang": pa.array(langs),
            "source": pa.array([f"src{i % 20}" for i in range(n)]),
            "n_chars": pa.array(np.array([len(t) for t in texts], dtype=np.int64)),
        }
    )


def gen_embeddings(rng: np.random.Generator, n: int) -> pa.Table:
    vecs = rng.standard_normal((n, 64)).astype(np.float32)
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(list(vecs), type=pa.list_(pa.float32())),
            "label": pa.array(rng.integers(0, 10, n).astype(np.int32)),
        }
    )


def gen_events(rng: np.random.Generator, n: int) -> pa.Table:
    t0 = np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64)
    span = 30 * 24 * 3600 * 1_000_000
    ts = np.sort(t0 + rng.integers(0, span, n))
    return pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "ts": pa.array(ts.astype("datetime64[us]")),
            "user_id": pa.array(rng.integers(0, 15 * n // 1000, n).astype(np.int64)),
            # numpy take / char.add instead of Python list comps:
            # identical strings for the same draws, and the only way a
            # factor-1000 events build (100M rows) finishes — the list
            # comprehensions were ~100x slower and held 100M PyObjects
            "event_type": pa.array(
                np.array(EVENT_TYPES)[rng.integers(0, 5, n)]
            ),
            "value": pa.array(np.round(rng.uniform(0, 100, n), 2)),
            "props": pa.array(
                np.char.add(
                    np.char.add(
                        '{"k": ',
                        rng.integers(0, 100, n).astype("U3"),
                    ),
                    "}",
                )
            ),
        }
    )


def gen_orders(
    rng: np.random.Generator, n: int, lo: int = 0, hi: int | None = None
) -> pa.Table:
    """lo/hi: generate only the [lo, hi) key slice of an n-row table —
    key RANGES (custkey domain) stay functions of n so a chunked build
    has the same join fan-out as a monolithic one; string columns go
    through numpy take (identical values to the old list comprehension
    for the same draws, ~20x faster at 10M rows/chunk)."""
    hi = n if hi is None else hi
    m = hi - lo
    t0 = np.datetime64("1995-01-01T00:00:00", "us").astype(np.int64)
    span = int(6.5 * 365 * 24 * 3600) * 1_000_000
    days = 24 * 3600 * 1_000_000
    ts = t0 + (rng.integers(0, span // days, m)) * days
    return pa.table(
        {
            "o_orderkey": pa.array(np.arange(lo, hi, dtype=np.int64)),
            "o_custkey": pa.array(rng.integers(0, n // 10, m).astype(np.int64)),
            "o_orderstatus": pa.array(np.array(STATUSES)[rng.integers(0, 3, m)]),
            "o_totalprice": pa.array(np.round(rng.uniform(1000, 500000, m), 2)),
            "o_orderdate": pa.array(ts.astype("datetime64[us]")),
            "o_orderpriority": pa.array(
                np.array(PRIORITIES)[rng.integers(0, 5, m)]
            ),
        }
    )


_RF_LS = [("A", "F"), ("A", "O"), ("N", "F"), ("N", "O"), ("R", "F"), ("R", "O")]
_SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
_P_ADJ = ["large", "hot", "blue", "old", "dark", "shiny", "small", "new"]
_P_NOUN = ["ring", "bolt", "plate", "cog", "gear", "pin", "rod", "cap"]
_P_TYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]

_DAY_US = 24 * 3600 * 1_000_000


def gen_lineitem(
    rng: np.random.Generator, n: int, lo: int = 0, hi: int | None = None
) -> pa.Table:
    """Sliceable like gen_orders: key domains (orderkey/partkey/suppkey
    ranges) are functions of the TOTAL n, draw counts of the slice."""
    hi = n if hi is None else hi
    m = hi - lo
    t0 = np.datetime64("1995-01-02T00:00:00", "us").astype(np.int64)
    n_days = int(6.8 * 365)
    rf_ls = rng.integers(0, len(_RF_LS), m)
    return pa.table(
        {
            "l_orderkey": pa.array(rng.integers(0, n // 4, m).astype(np.int64)),
            "l_partkey": pa.array(rng.integers(0, n // 30, m).astype(np.int64)),
            "l_suppkey": pa.array(rng.integers(0, n // 600, m).astype(np.int64)),
            "l_linenumber": pa.array(rng.integers(1, 8, m).astype(np.int32)),
            "l_quantity": pa.array(rng.integers(1, 51, m).astype(np.float64)),
            "l_extendedprice": pa.array(np.round(rng.uniform(900, 105000, m), 2)),
            "l_discount": pa.array(np.round(rng.integers(0, 11, m) / 100.0, 2)),
            "l_tax": pa.array(np.round(rng.integers(0, 9, m) / 100.0, 2)),
            "l_returnflag": pa.array(np.array([p[0] for p in _RF_LS])[rf_ls]),
            "l_linestatus": pa.array(np.array([p[1] for p in _RF_LS])[rf_ls]),
            "l_shipdate": pa.array(
                (t0 + rng.integers(0, n_days, m) * _DAY_US).astype("datetime64[us]")
            ),
        }
    )


def gen_customer(rng: np.random.Generator, n: int) -> pa.Table:
    return pa.table(
        {
            "c_custkey": pa.array(np.arange(n, dtype=np.int64)),
            "c_name": pa.array([f"Customer#{i:09d}" for i in range(n)]),
            "c_nationkey": pa.array(rng.integers(0, 25, n).astype(np.int32)),
            "c_acctbal": pa.array(np.round(rng.uniform(-1000, 10000, n), 2)),
            "c_mktsegment": pa.array(
                [_SEGMENTS[int(x)] for x in rng.integers(0, 5, n)]
            ),
        }
    )


def gen_part(rng: np.random.Generator, n: int) -> pa.Table:
    names = [
        f"{_P_ADJ[int(a)]} {_P_NOUN[int(b)]}"
        for a, b in zip(rng.integers(0, 8, n), rng.integers(0, 8, n))
    ]
    return pa.table(
        {
            "p_partkey": pa.array(np.arange(n, dtype=np.int64)),
            "p_name": pa.array(names),
            "p_brand": pa.array([f"Brand#{int(x)}" for x in rng.integers(1, 26, n)]),
            "p_type": pa.array([_P_TYPES[int(x)] for x in rng.integers(0, 6, n)]),
            "p_size": pa.array(rng.integers(1, 51, n).astype(np.int32)),
            "p_retailprice": pa.array(np.round(900 + (np.arange(n) % 1000) / 10.0, 2)),
        }
    )


def gen_supplier(rng: np.random.Generator, n: int) -> pa.Table:
    return pa.table(
        {
            "s_suppkey": pa.array(np.arange(n, dtype=np.int64)),
            "s_name": pa.array([f"Supplier#{i:09d}" for i in range(n)]),
            "s_nationkey": pa.array(rng.integers(0, 25, n).astype(np.int32)),
            "s_acctbal": pa.array(np.round(rng.uniform(-1000, 10000, n), 2)),
        }
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/dcis_scale/sf1")
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument(
        "--tables",
        nargs="*",
        default=None,
        help="generate only these fact tables (dims always copied); the "
        "generator materializes each table in driver memory, so a "
        "factor-1000 full build (600M lineitem) does not fit — a "
        "documents-only sf100 for the dedup-family third decade does",
    )
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    rng = np.random.default_rng(42)
    sizes = {}
    import shutil

    for dim in FIXED_DIMS:  # fixed-cardinality at every sf: copy verbatim
        shutil.copy(
            f"/root/testdata/sf0.1/{dim}.parquet",
            os.path.join(args.out, f"{dim}.parquet"),
        )
        print(f"copied {dim} (fixed cardinality)")
    vocab_words = scaled_vocab(args.factor)
    for name, gen in (
        ("documents", lambda r, n: gen_documents(r, n, vocab_words)),
        ("embeddings", gen_embeddings),
        ("events", gen_events),
        ("orders", gen_orders),
        ("lineitem", gen_lineitem),
        ("customer", gen_customer),
        ("part", gen_part),
        ("supplier", gen_supplier),
    ):
        if args.tables is not None and name not in args.tables:
            continue  # NB: skipping advances no rng draws, so a subset
            # build is stream-identical to a full build only for a
            # PREFIX of the table order above (documents is first)
        n = BASE[name] * args.factor
        path = os.path.join(args.out, f"{name}.parquet")
        if name in ("orders", "lineitem") and n > _CHUNK:
            # factor-1000 fact tables (600M lineitem) cannot be
            # materialized as one numpy block; generate [lo, hi) slices
            # (key domains stay functions of TOTAL n) and append each
            # as its own row group — same file, bounded memory
            writer = None
            for lo in range(0, n, _CHUNK):
                hi = min(lo + _CHUNK, n)
                tbl = gen(rng, n, lo=lo, hi=hi)
                if writer is None:
                    writer = pq.ParquetWriter(path, tbl.schema)
                # same >=32-row-group floor as the monolithic branch:
                # one group per 10M-row chunk would leave mid-size
                # tables (orders at factor 100 = 15M rows) with ~2 scan
                # splits and re-create the single-row-group scan
                # serialization the cap below exists to avoid
                writer.write_table(
                    tbl, row_group_size=min(_CHUNK, max(4096, n // 32))
                )
                print(f"  {name}: rows {lo}..{hi}", flush=True)
            writer.close()
        else:
            tbl = gen(rng, n)
            # bounded row groups: parquet scan parallelism is limited by
            # row group boundaries, so a single-group 1M-row file
            # serializes every downstream scan into ONE task (observed
            # 26x on a narrow projection before this cap) — real
            # multi-file 100 TB layouts never have that property, and
            # the trend must not measure it
            pq.write_table(tbl, path, row_group_size=max(4096, n // 32))
        sizes[name] = n
        print(f"wrote {name}: {n} rows")
    # a --tables subset build must EXTEND an existing manifest (same
    # factor), not clobber the rows of previously generated tables
    mpath = os.path.join(args.out, "MANIFEST.json")
    if os.path.exists(mpath):
        prior = json.load(open(mpath))
        if prior.get("factor") == args.factor:
            sizes = {**prior.get("rows", {}), **sizes}
        elif args.tables is not None:
            # a subset rebuild at a DIFFERENT factor would leave the
            # non-regenerated tables' parquet on disk at the old scale
            # while the manifest silently omitted them — refuse instead
            raise SystemExit(
                f"refusing subset build: {args.out} holds factor="
                f"{prior.get('factor')} tables but --factor is "
                f"{args.factor}; use a fresh --out or rebuild all tables"
            )
    with open(mpath, "w") as f:
        json.dump(
            {
                "factor": args.factor,
                "seed": 42,
                "rows": sizes,
                "vocab_size": len(vocab_words),
            },
            f,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
