"""Distributed scrape-ingest harness — the Spark-native re-design of the
reference's serial Selenium loops (A1/A2, reference main.py:40-148,
mainn.py:37-106).

Reference behavior reproduced, re-architected for a cluster:

| reference | here |
|---|---|
| serial page loop, 1 browser (main.py:64) | seed DataFrame of page specs, fetched across partitions |
| `time.sleep(n)` pacing (main.py:83,91,115) | per-partition token bucket (bounded per-host rate × #partitions) |
| per-row try/except skip (main.py:117-123) | per-record parse guard, row dropped, batch continues |
| results only saved at the very end (main.py:217 — crash loses all) | bronze committed incrementally per seed shard with marker files; a rerun skips committed shards and re-fetches only the rest |
| `quote(query)` URL building (main.py:46) | same, driver-side when building seeds |

Fetching is pluggable (`fetcher(url) -> html`): production would wrap an
HTTP client; tests inject a local-fixture fetcher — no network, no
Selenium. Parsing is dependency-free regex extraction into the bronze
11-column record (SURVEY.md §1), `""` on miss, exactly like
`_safe_get_text` (main.py:165-171).
"""

from __future__ import annotations

import re
import time
from collections.abc import Callable, Iterator
from urllib.parse import quote

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_collection_ieee_spark.sources.articles import IEEE_COLUMNS

FetcherFn = Callable[[str], str]


def build_seeds(
    spark: SparkSession, base_url: str, query: str, num_pages: int, source: str
) -> DataFrame:
    """Seed page specs — the pagination cap (A10, main.py:64) expressed
    as a bounded seed set instead of a sequential loop."""
    rows = [
        (source, query, p, f"{base_url}?q={quote(query)}&page={p}")
        for p in range(1, num_pages + 1)
    ]
    return spark.createDataFrame(rows, "source string, query string, page int, url string")


class TokenBucket:
    """Per-partition rate limiter replacing the reference's hard sleeps.

    Each partition holds one bucket, so cluster-wide request rate is
    bounded by rate_per_sec × #concurrent-partitions — sized to the
    target host, not to executor count.
    """

    def __init__(self, rate_per_sec: float, capacity: float = 1.0):
        self.rate = rate_per_sec
        self.capacity = capacity
        self.tokens = capacity
        self.last = time.monotonic()

    def acquire(self) -> None:
        while True:
            now = time.monotonic()
            self.tokens = min(self.capacity, self.tokens + (now - self.last) * self.rate)
            self.last = now
            if self.tokens >= 1.0:
                self.tokens -= 1.0
                return
            time.sleep(max(0.0, (1.0 - self.tokens) / self.rate))


_ARTICLE_RE = re.compile(r"<article\b.*?</article>", re.S)


def _field(block: str, cls: str) -> str:
    """Extract one field by class marker; '' on miss (the reference's
    null sentinel, main.py:171)."""
    m = re.search(
        rf'class="{re.escape(cls)}"[^>]*>(.*?)</', block, re.S
    )
    return m.group(1).strip() if m else ""


def parse_article_page(html: str, source_tag: str) -> list[dict]:
    """Parse one result page into bronze records. Per-record failures
    drop that record only (A16 semantics, main.py:117-123)."""
    records = []
    for block in _ARTICLE_RE.findall(html):
        try:
            rec = {c: "" for c in IEEE_COLUMNS}
            rec.update(
                {
                    "journal": _field(block, "journal"),
                    "indexation": source_tag,
                    "publication": _field(block, "publication"),
                    "doi": _field(block, "doi"),
                    "titre": _field(block, "titre"),
                    "chercheurs": _field(block, "chercheurs"),
                    "laboratoires": _field(block, "laboratoires"),
                    "abstract": _field(block, "abstract"),
                    "keywords": _field(block, "keywords"),
                }
            )
            if not rec["titre"]:
                continue  # unparseable record: skip row, keep batch
            records.append(rec)
        except Exception:  # noqa: BLE001 — per-row guard by design
            continue
    return records


def scrape(
    seeds: DataFrame,
    fetcher: FetcherFn,
    rate_per_sec: float = 10.0,
) -> DataFrame:
    """seed specs → fetched+parsed bronze records, distributed.

    mapInPandas: each partition builds ONE token bucket and streams its
    pages through fetch→parse, yielding bronze batches. Page-level
    failures yield zero records (the reference's skip-and-continue),
    and Spark's task retry gives at-least-once fetch with exactly-once
    output when combined with a file-commit sink (see checkpoint()).
    """
    schema = ", ".join(f"{c} string" for c in IEEE_COLUMNS)

    def fetch_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bucket = TokenBucket(rate_per_sec)
        for pdf in batches:
            out: list[dict] = []
            for row in pdf.itertuples(index=False):
                bucket.acquire()
                try:
                    html = fetcher(row.url)
                except Exception:  # noqa: BLE001 — page fetch failed: skip page
                    continue
                out.extend(parse_article_page(html, row.source.upper()))
            if out:
                yield pd.DataFrame(out, columns=list(IEEE_COLUMNS))

    return seeds.mapInPandas(fetch_partition, schema=schema)


def scrape_to_bronze(
    seeds: DataFrame,
    fetcher: FetcherFn,
    bronze_path: str,
    rate_per_sec: float = 10.0,
    n_shards: int = 8,
) -> DataFrame:
    """Scrape with INCREMENTALLY durable bronze checkpointing — the fix
    for the reference's lose-everything failure mode (results lived only
    in one Python list until the final save, main.py:23,109,217).

    Seeds are split into `n_shards` stable shards (hash of url); each
    shard is scraped and committed as its own parquet directory guarded
    by a `_committed_<shard>` marker — the same marker protocol as
    streaming.stateful.make_batch_writer. A crash loses at most the
    in-flight shards (a single parquet write job is only job-atomic, so
    one monolithic write would lose EVERYTHING uncommitted); re-running
    the same call skips committed shards and re-fetches only the rest.
    The driver loop is over shards (orchestration), never over rows."""
    import os

    spark = seeds.sparkSession
    os.makedirs(bronze_path, exist_ok=True)
    sharded = seeds.withColumn(
        "_shard", F.pmod(F.xxhash64("url"), F.lit(n_shards)).cast("int")
    )
    for shard in range(n_shards):
        marker = os.path.join(bronze_path, f"_committed_{shard}")
        if os.path.exists(marker):
            continue  # rerun: this shard is already durably scraped
        shard_seeds = sharded.filter(F.col("_shard") == shard).drop("_shard")
        if shard_seeds.limit(1).count() == 0:
            with open(marker, "w"):
                pass
            continue
        scrape(shard_seeds, fetcher, rate_per_sec).write.mode("overwrite").parquet(
            os.path.join(bronze_path, f"shard={shard}")
        )
        with open(marker, "w"):
            pass
    return spark.read.parquet(os.path.join(bronze_path, "shard=*")).select(
        *IEEE_COLUMNS
    )
