"""Seed sources (SURVEY.md §2 S1/S3).

* ``read_seed_files`` — the classic text seed dir (one URL per line,
  ``\\t``-separated ``k=v`` metadata; ref ``crawl/Injector.java:61-83``):
  a plain ``spark.read.text`` producing the SEEDS schema.
* ``FeedInjector`` — the fork's HTTP collection-API seed source
  (``crawl/FeedInjector.java``): a driver-side fetch of a JSON feed turned
  into a seeds DataFrame.  Network access is not available in the sandbox,
  so the HTTP call is injectable and the default raises — the parsing and
  DataFrame plumbing are real.
"""

from __future__ import annotations

import json
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from ..schemas import SEEDS


def read_seed_files(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.text(path).withColumnRenamed("value", "line")


def _default_http_get(url: str, api_key: str | None) -> str:
    raise NotImplementedError(
        "FeedInjector needs network access; inject http_get (e.g. a "
        "requests.get wrapper) outside the sandbox."
    )


class FeedInjector:
    """Fetch a seed feed from an HTTP endpoint and shape it as seed lines.

    Feed format mirrors the reference's collection API: a JSON array of
    objects with at least ``url``; other keys become ``k=v`` seed metadata
    (``collection.seed`` is set to the url, as the withdrawn-scoring
    contract expects — ref ``scoring-withdrawn``)."""

    def __init__(self, endpoint: str, api_key: str | None = None,
                 http_get: Callable[[str, str | None], str] = _default_http_get):
        self.endpoint = endpoint
        self.api_key = api_key
        self.http_get = http_get

    def fetch_seeds(self, spark: SparkSession) -> DataFrame:
        body = self.http_get(self.endpoint, self.api_key)
        items = json.loads(body)
        lines = []
        for it in items:
            url = it.get("url")
            if not url:
                continue
            md = [f"collection.seed={url}"]
            for k, v in it.items():
                if k != "url":
                    md.append(f"{k}={v}")
            lines.append(url + "\t" + "\t".join(md))
        return spark.createDataFrame([(l,) for l in lines], SEEDS)
