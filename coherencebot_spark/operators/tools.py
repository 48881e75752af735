"""Misc reference tools (SURVEY.md §2 S11 tail; VERDICT r3 missing #5).

* :func:`dump_content_files` — ``tools/FileDumper.java:105-260``: dump each
  fetched payload to an individual file named ``<md5(url)>_<base>.<ext>``,
  plus the mimetype histogram the reference prints.  Files are written
  partition-parallel (each task writes its own rows to the shared
  directory) — no driver collect.
* :func:`parse_dmoz_rdf` — ``tools/DmozParser.java:152-398``: turn a DMOZ
  RDF dump into injector seed lines.  The reference streams the XML
  through a SAX handler; here ``spark.read.option("lineSep",
  "</ExternalPage>")`` splits the dump into one record per ExternalPage
  block, so url/topic extraction is pure JVM regexp over distributed
  splits — a 3 GB dump parses in parallel instead of through one SAX
  stream.
* :func:`resolve_urls` — ``tools/ResolveUrls.java:60-130``: probe DNS
  resolution for every distinct host of a url list.  The reference runs
  a 100-thread pool on one box; here the probe is a mapInPandas over the
  DISTINCT-host frame (the same injectable-resolver shape as
  ``operators.hostdb.update_hostdb`` — no network in this sandbox, so
  the resolver callable is required and a fake is used in tests).
* :func:`show_properties` — ``tools/ShowProperties.java:35-65``: dump
  the effective configuration as (key, value) rows; the CrawlConfig
  dataclass IS the engine's Configuration.
* ``tools/Benchmark.java`` is superseded by the repo-level ``bench.py``
  (documented in COVERAGE.md).
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import SEEDS


def dump_content_files(content: DataFrame, outdir: str,
                       formats: list[str] | None = None) -> dict[str, int]:
    """FileDumper: one file per payload, named ``md5(url)_<basename>.<fmt>``
    (``DumpFileUtil.createFileName`` shape).  ``formats`` filters like the
    reference's ``mimeTypes`` arg (None = all).  Returns the per-format
    count histogram the reference logs.

    ``outdir`` must be on a filesystem every executor can reach (the
    reference writes through the Hadoop FS API to HDFS; here tasks open
    plain paths, so on a multi-node cluster point this at the shared
    mount — on a local-mode driver any path works)."""
    os.makedirs(outdir, exist_ok=True)
    df = content.filter(F.col("bytes").isNotNull())
    if formats is not None:
        df = df.filter(F.col("fmt").isin(list(formats)))
    rows = df.select(
        F.md5(F.col("url").cast("binary")).alias("_md5"),
        F.regexp_extract("url", r"([^/?#]+)(?:[?#].*)?$", 1).alias("_base"),
        "fmt", "bytes",
    )

    out = outdir

    def write_files(it):
        for pdf in it:
            names = []
            for md5h, base, fmt, data in zip(
                    pdf["_md5"], pdf["_base"], pdf["fmt"], pdf["bytes"]):
                name = f"{md5h}_{(base or 'index')[:64]}.{fmt or 'bin'}"
                with open(os.path.join(out, name), "wb") as f:
                    f.write(bytes(data))
                names.append(name)
            yield pd.DataFrame({"file": names, "fmt": pdf["fmt"]})

    written = rows.mapInPandas(write_files, schema="file string, fmt string")
    return {r["fmt"]: r["count"]
            for r in written.groupBy("fmt").count().collect()}


def parse_dmoz_rdf(spark: SparkSession, path: str,
                   topic_pattern: str | None = None) -> DataFrame:
    """DmozParser: RDF dump → SEEDS lines (url + ``dmoz.topic`` metadata).

    ``topic_pattern`` is the ``-topic`` regex subset filter
    (``DmozParser.java:398`` topic selection pattern); blocks without an
    ExternalPage url are dropped like the handler's non-page elements."""
    blocks = (
        spark.read.option("lineSep", "</ExternalPage>").text(path)
        .select(
            F.regexp_extract(
                "value", r'<ExternalPage\s+about="([^"]+)"', 1).alias("url"),
            F.regexp_extract("value", r"<topic>([^<]*)</topic>", 1)
            .alias("topic"),
        )
        .filter(F.col("url") != "")
    )
    if topic_pattern is not None:
        blocks = blocks.filter(F.col("topic").rlike(topic_pattern))
    lines = blocks.select(
        F.concat(
            F.col("url"),
            F.when(F.col("topic") != "",
                   F.concat(F.lit("\tdmoz.topic="), F.col("topic")))
            .otherwise(F.lit("")),
        ).alias("line")
    )
    return lines.select(F.col("line").cast(SEEDS["line"].dataType).alias("line"))


# ---------------------------------------------------------------------------
# FormatCrawlStats — the fork's dashboard-record formatter
# (ref util/FormatCrawlStats.java:35-287)
# ---------------------------------------------------------------------------

def _meta_val(cell, limit: int = -1):
    """``columns[i].split("=")[1]`` — Java split truncates the value at a
    second ``=`` unless the limit-2 form is used (:223-229 vs :221)."""
    return F.element_at(F.split(cell, "=", limit), 2)


def format_crawl_stats(seed_lines: DataFrame, completion: DataFrame,
                       region: str = "local",
                       seq_col: str | None = None) -> DataFrame:
    """``util/FormatCrawlStats.java:35-210`` — merge the seed list's
    collection metadata with CrawlCompletionStats counts into one
    dashboard record per host (the tool's ``hosts.json`` rows).

    Inputs: ``seed_lines`` in the SEEDS shape (``line`` =
    ``url\\tcollection.titles=..\\tcollection.ids=..\\tcollection.seed=..
    \\torg.slug=..[\\torg.domains=a;b]``, position-based like tsvToJson
    :210-249 — lines with <5 columns or no parseable host are dropped);
    ``completion`` = ``(host, fetched, unfetched)`` from
    :func:`readdb.crawl_completion_stats` (the reference re-parses the
    same job's text output, :251-277).

    Reference semantics preserved:

    * same-host seed lines merge by APPENDING title/id/seed/domain
      arrays in line order, first line's slug/url win (:52-102);
    * ``org.domains`` absent → ``[host]`` (:231);
    * the ``=``-truncation quirk: title/id/slug values cut at a second
      ``=``, ``collection.seed`` keeps it (limit-2 split, :221);
    * allowed-host claims: a non-seed host named in some seed's
      ``org.domains`` inherits that seed host's (final) collection meta;
      the FIRST line naming it wins (:104-121 — the stored JSONArrays
      alias the seed host's, so later merges show through: final-state
      semantics);
    * completion hosts not in the seed list become records with claimed
      or ``unknown`` meta and no region (:140-161); either count
      defaults to 0 for any host the completion output names (:164-176);
      seed hosts the completion never names keep NULL counts (the
      reference leaves the JSON keys absent);
    * ``type`` = ``host`` everywhere, ``region`` (the reference's
      COHERENCEBOT_REGION env) only on seed-host records (:242-246).

    Scale shape: two groupBys on host + one broadcast-sized claims join —
    the seed list is small by construction; completion is one row per
    host.  Everything is JVM expressions (no Python row path).
    """
    seq = F.col(seq_col) if seq_col else F.monotonically_increasing_id()
    c = F.split("line", "\t")
    parsed = seed_lines.select(seq.alias("seq"), c.alias("c")) \
        .filter(F.size("c") >= 5)
    url = F.element_at("c", 1)
    host = F.try_parse_url(url, F.lit("HOST"))
    parsed = parsed.select(
        "seq",
        host.alias("host"),
        _meta_val(F.element_at("c", 2)).alias("title"),
        _meta_val(F.element_at("c", 3)).alias("cid"),
        _meta_val(F.element_at("c", 4), 2).alias("cseed"),
        _meta_val(F.element_at("c", 5)).alias("org_slug"),
        F.when(F.size("c") > 5,
               F.split(_meta_val(F.element_at("c", 6)), ";"))
         .otherwise(F.array(host)).alias("domains"),
    ).filter(F.col("host").isNotNull())

    def _ordered(col):
        return F.transform(
            F.array_sort(F.collect_list(F.struct("seq", F.col(col)
                                                 .alias("v")))),
            lambda s: s["v"])

    hosts = parsed.groupBy("host").agg(
        F.min("seq").alias("seq0"),
        F.min_by("org_slug", "seq").alias("org_slug"),
        _ordered("title").alias("collection_titles"),
        _ordered("cid").alias("collection_ids"),
        _ordered("cseed").alias("collection_seeds"),
        F.flatten(F.transform(
            F.array_sort(F.collect_list(F.struct("seq", "domains"))),
            lambda s: s["domains"])).alias("org_domains"),
    )

    # allowed-host claims: first LINE naming d (d != its own host) wins
    claims = parsed.select(
        "seq", "host", F.explode("domains").alias("allowed")) \
        .filter(F.col("allowed") != F.col("host")) \
        .groupBy("allowed").agg(F.min_by("host", "seq").alias("via_host"))
    claims = claims.join(
        hosts.select(F.col("host").alias("via_host"), "org_slug",
                     "collection_titles", "collection_ids",
                     "collection_seeds", "org_domains"),
        "via_host").drop("via_host")

    comp = completion.select(
        "host",
        F.coalesce(F.col("fetched").cast("long"), F.lit(0))
        .alias("fetched"),
        F.coalesce(F.col("unfetched").cast("long"), F.lit(0))
        .alias("unfetched"))

    seed_rows = hosts.join(F.broadcast(comp), "host", "left").select(
        "host", F.col("host").alias("id"), F.lit("host").alias("type"),
        F.lit(region).alias("region"), "collection_titles",
        "collection_ids", "collection_seeds", "org_slug", "org_domains",
        "fetched", "unfetched")

    unknown = F.array(F.lit("unknown"))
    extra = comp.join(hosts.select("host"), "host", "left_anti") \
        .join(F.broadcast(claims.withColumnRenamed("allowed", "host")),
              "host", "left").select(
        "host", F.col("host").alias("id"), F.lit("host").alias("type"),
        F.lit(None).cast("string").alias("region"),
        F.coalesce("collection_titles", unknown).alias("collection_titles"),
        F.coalesce("collection_ids", unknown).alias("collection_ids"),
        F.coalesce("collection_seeds", unknown).alias("collection_seeds"),
        F.coalesce("org_slug", F.lit("unknown")).alias("org_slug"),
        F.coalesce("org_domains", unknown).alias("org_domains"),
        "fetched", "unfetched")

    return seed_rows.unionByName(extra)


# ---------------------------------------------------------------------------
# Checker tools — URLFilterChecker / URLNormalizerChecker
# (ref net/URLFilterChecker.java:72-83, net/URLNormalizerChecker.java:77-89;
#  util/AbstractChecker.java provides the stdin/telnet front end)
# ---------------------------------------------------------------------------

def resolve_urls(urls: DataFrame, resolve_fn, url_col: str = "url",
                 summary: bool = False) -> DataFrame:
    """``tools/ResolveUrls.java:60-130`` — DNS-probe every DISTINCT host
    of a url list.  ``resolve_fn(hosts: pd.Series) -> pd.Series[bool]``
    is the injectable resolver (``InetAddress.getByName`` succeeded?) —
    same contract as the hostdb DNS hook; there is no network in this
    sandbox and no default resolver on purpose.

    Returns ``(host, resolved)`` per distinct host, or with
    ``summary=True`` the reference's closing totals line as one row
    ``(total, resolved, errored)``.  Scale shape: distinct-host
    aggregation then a mapInPandas probe over hosts only — the url list
    itself never reaches Python."""
    if resolve_fn is None:
        raise ValueError(
            "resolve_urls needs a resolver callable "
            "(hosts pd.Series -> pd.Series[bool]): real DNS requires "
            "network access — inject socket.gethostbyname there in a "
            "connected deployment, a fake in tests.")
    hosts = urls.select(
        F.try_parse_url(F.col(url_col), F.lit("HOST")).alias("host")) \
        .filter(F.col("host").isNotNull()).distinct()

    def probe(it):
        for pdf in it:
            if len(pdf):
                yield pd.DataFrame({
                    "host": pdf["host"],
                    "resolved": resolve_fn(pdf["host"]).astype(bool),
                })

    out = hosts.mapInPandas(probe, schema="host string, resolved boolean")
    if not summary:
        return out
    return out.agg(
        F.count("*").alias("total"),
        F.sum(F.col("resolved").cast("long")).alias("resolved"),
        (F.count("*") - F.sum(F.col("resolved").cast("long")))
        .alias("errored"))


def show_properties(cfg=None) -> list[tuple[str, str]]:
    """``tools/ShowProperties.java:35-65`` — dump the effective
    configuration as sorted (key, value) pairs.  The reference iterates
    the Hadoop ``Configuration``; the engine's configuration object is
    the :class:`~coherencebot_spark.config.CrawlConfig` dataclass."""
    import dataclasses

    from ..config import DEFAULT

    cfg = cfg or DEFAULT
    return sorted((f.name, str(getattr(cfg, f.name)))
                  for f in dataclasses.fields(cfg))


def check_url_filters(urls: DataFrame, chain=None,
                      url_col: str = "line") -> DataFrame:
    """URLFilterChecker.process: each input line answers ``+<url>`` when
    the filter chain keeps it, ``-<url>`` when any filter drops it.  The
    stdin/telnet loop of AbstractChecker is the front end, not the
    semantics — a DataFrame in/out is the engine's equivalent; pipe the
    result through ``collect``/``show`` for the interactive use case."""
    from ..functions.urls import URLFilterChain, with_filter_accept

    out = with_filter_accept(urls, chain or URLFilterChain(),
                             in_col=url_col, out_col="_ok")
    return out.select(
        F.col(url_col),
        F.concat(F.when(F.col("_ok"), F.lit("+")).otherwise(F.lit("-")),
                 F.col(url_col)).alias("result"))


def check_url_normalizers(urls: DataFrame, normalizers=None,
                          url_col: str = "line") -> DataFrame:
    """URLNormalizerChecker.process: each line answers its normalized
    form; a null/malformed outcome answers the empty string (:80-87).
    ``normalizers``: ordered list of objects with ``normalize(Series)``
    (the chain contract of ``functions.urls``); default = the basic
    normalizer."""
    from pyspark.sql.types import StringType

    from ..functions.urls import normalize_urls

    chain = normalizers

    @F.pandas_udf(StringType())
    def _norm(u: pd.Series) -> pd.Series:
        s = u.astype(object)
        if chain is None:
            s = normalize_urls(s)
        else:
            for n in chain:
                s = n.normalize(s)
        return s.fillna("")

    return urls.select(
        F.col(url_col), _norm(F.col(url_col)).alias("result"))


# ---------------------------------------------------------------------------
# Single-URL end-to-end checkers — ParserChecker / IndexingFiltersChecker
# (ref parse/ParserChecker.java:143-301, indexer/IndexingFiltersChecker.java:
#  143-304; util/AbstractChecker.java is the stdin/telnet front end).
# The reference runs ONE url through the real protocol + parse + indexing
# stacks and prints a text dump; the rebuild does the same through the
# engine's real fetch()/parse()/apply_chain() plans — driver-side by
# design (it is a one-row debugging tool, not a pipeline stage).
# ---------------------------------------------------------------------------

def _single_url_run(spark, url: str, cfg, backend, payload_batch_fn, t0):
    from ..operators.fetch import fetch
    from ..operators.parse import parse
    from ..schemas import FETCHLIST
    from ..status import Db

    from ..functions.urls import normalize_urls
    norm = normalize_urls(pd.Series([url])).iloc[0] or url

    host = norm.split("://", 1)[-1].split("/", 1)[0].split(":")[0]
    row = dict(url=norm, host=host, status=int(Db.UNFETCHED),
               fetch_time=t0 - 10, retries=0, fetch_interval=2_592_000,
               score=1.0, signature=None, modified_time=0, metadata=None,
               segnum=1, partition_id=0, sort_key=0)
    fl = spark.createDataFrame([row], schema=FETCHLIST)
    log, content = fetch(fl, t0, cfg, backend=backend,
                         payload_batch_fn=payload_batch_fn)
    parsed = parse(log, content, cfg)
    return norm, log, content, parsed


def check_parser(spark, url: str, cfg=None, backend=None,
                 payload_batch_fn=None, dump_text: bool = False,
                 t0: int = 1_700_000_000_000) -> str:
    """``bin/nutch parsechecker`` — fetch ONE url through the (injectable)
    protocol backend, parse it, and return the reference-shaped dump:
    contentType/signature header, then per parse row the status, title,
    outlink list and parse metadata (ParserChecker.java:269-296; the
    reference prints ParseData.toString()).  Fetch failures return the
    ``Fetch failed with protocol status: ...`` line (:210)."""
    from ..config import DEFAULT as _DEFAULT
    from ..status import Fetch, Msg

    cfg = cfg or _DEFAULT
    norm, log, content, parsed = _single_url_run(
        spark, url, cfg, backend, payload_batch_fn, t0)
    lines = [f"fetching: {norm}"]
    lrows = log.collect()
    if not lrows or lrows[0].status != int(Fetch.SUCCESS):
        names = {v: k for k, v in vars(Fetch).items() if isinstance(v, int)}
        got = names.get(lrows[0].status, lrows[0].status) if lrows \
            else "no row (time limit / breaker)"
        lines.append(f"Fetch failed with protocol status: {got}")
        return "\n".join(lines) + "\n"
    crows = {r.url: r for r in content.collect()}
    c = crows.get(norm)
    mime = f"image/{c.fmt}" if c is not None and c.fmt else \
        "application/octet-stream"
    lines.append(f"contentType: {mime}")
    prows = parsed.collect()
    me = [r for r in prows if r.url == norm
          and r.status == int(Msg.SIGNATURE)]
    links = [r for r in prows if r.status == int(Msg.LINKED)]
    if me and me[0].signature is not None:
        lines.append(f"signature: {bytes(me[0].signature).hex()}")
    lines.append(norm)
    lines.append("Status: success(1,0)")
    lines.append(f"Title: {c.caption if c is not None else ''}")
    lines.append(f"Outlinks: {len(links)}")
    for r in sorted(links, key=lambda r: r.url):
        lines.append(f"  outlink: toUrl: {r.url} anchor: {r.anchor or ''}")
    metas = [r for r in prows if r.url == norm
             and r.status == int(Msg.PARSE_META) and r.metadata]
    for r in metas:
        for k in sorted(r.metadata):
            lines.append(f"  parseMeta: {k} = {r.metadata[k]}")
    if dump_text and c is not None:
        lines.append(c.caption or "")
    return "\n".join(lines) + "\n"


def check_indexing_filters(spark, url: str, cfg=None, backend=None,
                           payload_batch_fn=None, filters=None,
                           t0: int = 1_700_000_000_000) -> str:
    """``bin/nutch indexchecker`` — ONE url through fetch → parse → the
    indexing filter chain, dumping each doc field as ``name :\\t value``
    truncated to 100 chars (IndexingFiltersChecker.java:290-302), or
    ``Document discarded by indexing filter`` when the chain rejects it
    (:288).  ``filters`` defaults to the production cycle chain
    (basic + anchor)."""
    from ..config import DEFAULT as _DEFAULT
    from ..operators.indexing import anchor_filter, apply_chain, basic_filter
    from ..sources.sinks import build_index_documents
    from ..status import Db, Fetch

    cfg = cfg or _DEFAULT
    norm, log, content, parsed = _single_url_run(
        spark, url, cfg, backend, payload_batch_fn, t0)
    lines = [f"fetching: {norm}", f"parsing: {norm}"]
    lrows = log.collect()
    if not lrows or lrows[0].status != int(Fetch.SUCCESS):
        lines.append("Fetch failed with protocol status: "
                     f"{lrows[0].status if lrows else 'none'}")
        return "\n".join(lines) + "\n"
    lr = lrows[0]
    frontier = spark.createDataFrame(
        [(norm, lr.host, int(Db.FETCHED), int(lr.fetch_time), 0,
          2_592_000, float(lr.score), None, 0, None)],
        "url string, host string, status int, fetch_time long, "
        "retries int, fetch_interval long, score float, "
        "signature binary, modified_time long, "
        "metadata map<string,string>")
    narrow = content.select("url", "image_id", "w", "h", "fmt",
                            "caption", "phash")
    docs = (build_index_documents(frontier, narrow)
            .withColumn("text", F.coalesce(F.col("caption"), F.lit("")))
            .withColumn("title", F.lit(None).cast("string"))
            .withColumn("anchors", F.lit(None).cast("array<string>")))
    chain = filters if filters is not None else [
        basic_filter(add_domain=True), anchor_filter()]
    out = apply_chain(docs.filter(~F.col("_delete")), chain).collect()
    if not out:
        lines.append("Document discarded by indexing filter")
        return "\n".join(lines) + "\n"
    d = out[0].asDict()
    d["id"] = norm
    for name in sorted(d):
        if name.startswith("_") or d[name] is None:
            continue
        s = str(d[name])
        lines.append(f"{name} :\t{s[:100]}")
    return "\n".join(lines) + "\n"
