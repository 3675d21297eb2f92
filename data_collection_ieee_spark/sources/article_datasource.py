"""Custom Spark Python DataSource for article ingestion.

`spark.read.format("article_html")` over a directory of result-page
HTML files — the reference's scrape targets (A1/A2, reference
main.py:40-148) promoted to a first-class Spark source instead of a
driver-side loop. Built on the Spark 4 Python DataSource API
(pyspark.sql.datasource), so the engine's ingest is planned like any
other scan: one input partition per page file, parsed on executors
with the same bronze semantics as the mapPartitions harness
(scraper_source.parse_article_page — "" on miss, bad records skipped).

Also ships a streaming reader: each micro-batch picks up page files
that arrived since the last committed offset (files-on-arrival for
scraped pages), so `spark.readStream.format("article_html")` feeds the
same bronze pipeline incrementally — offsets are file counts over the
lexicographically-sorted listing, making replays deterministic.

Usage:
    spark.dataSource.register(ArticleHtmlDataSource)
    df = (spark.read.format("article_html")
          .option("path", fixture_dir).option("source_tag", "IEEE").load())
"""

from __future__ import annotations

import glob
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

from data_collection_ieee_spark.sources.articles import IEEE_COLUMNS
from data_collection_ieee_spark.sources.scraper_source import parse_article_page

_SCHEMA = ", ".join(f"{c} string" for c in IEEE_COLUMNS)


def _list_pages(path: str) -> list[str]:
    return sorted(glob.glob(os.path.join(path, "*.html")))


def _parse_file(fpath: str, source_tag: str):
    with open(fpath, encoding="utf-8") as f:
        html = f.read()
    for rec in parse_article_page(html, source_tag):
        yield tuple(rec[c] for c in IEEE_COLUMNS)


class _PageFilePartition(InputPartition):
    def __init__(self, fpath: str):
        self.fpath = fpath


class ArticleHtmlReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options["path"]
        self.source_tag = options.get("source_tag", "IEEE").upper()

    def partitions(self):
        # one partition per page file: parse parallelism == page count,
        # and a task retry re-reads exactly one page
        return [_PageFilePartition(f) for f in _list_pages(self.path)]

    def read(self, partition: _PageFilePartition):
        yield from _parse_file(partition.fpath, self.source_tag)


class ArticleHtmlStreamReader(SimpleDataSourceStreamReader):
    """Files-on-arrival micro-batching: the offset is the count of page
    files already consumed from the sorted listing."""

    def __init__(self, options: dict):
        self.path = options["path"]
        self.source_tag = options.get("source_tag", "IEEE").upper()

    def initialOffset(self) -> dict:
        return {"n_consumed": 0}

    def read(self, start: dict):
        files = _list_pages(self.path)
        n0 = start["n_consumed"]
        rows = []
        for f in files[n0:]:
            rows.extend(_parse_file(f, self.source_tag))
        return iter(rows), {"n_consumed": len(files)}

    def readBetweenOffsets(self, start: dict, end: dict):
        files = _list_pages(self.path)
        rows = []
        for f in files[start["n_consumed"] : end["n_consumed"]]:
            rows.extend(_parse_file(f, self.source_tag))
        return iter(rows)


class ArticleHtmlDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "article_html"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> ArticleHtmlReader:
        return ArticleHtmlReader(self.options)

    def simpleStreamReader(self, schema) -> ArticleHtmlStreamReader:
        return ArticleHtmlStreamReader(self.options)
