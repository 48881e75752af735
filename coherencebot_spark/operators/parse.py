"""Parse — decode payload, extract caption/outlinks, emit updatedb rows
(SURVEY.md §2 C3-C7, SC3, F6; ref ``parse/ParseSegment.java``,
``parse/ParseOutputFormat.java:221-400``).

In the graft, "parsing" a fetched document means decoding the image
payload (validating bytes), extracting the caption (the ParseText
analogue), computing the content signature, and producing the outlink set.
The operator emits exactly what the reference's ParseOutputFormat writes
into ``crawl_parse``:

* one ``Msg.SIGNATURE`` row per parsed page (MD5 of raw bytes — the
  ``MD5Signature`` default, ``crawl/MD5Signature.java:31-37`` — computed
  JVM-side with ``F.md5``);
* one ``Msg.LINKED`` row per kept outlink, carrying OPIC cash
  (``score / n_outlinks``, × internal/external factor by host match —
  ``OPICScoringFilter.distributeScoreToOutlinks``, SC3) — pure
  ``explode`` + column arithmetic, no Python;
* one ``Msg.PARSE_META`` row per page with parse metadata (decoded image
  dims, format, phash — the graft's ParseData).

Outlink policy mirrors ``ParseOutputFormat``: normalize+filter each target,
optionally ignore internal/external links (``db.ignore.*.links``), cap per
page (``db.max.outlinks.per.page``, default 100), truncate anchors.

Truncation gate (F6, ``ParseSegment.java:176-209``): pages whose body is
shorter than the declared Content-Length are skipped; in the graft the
analogue is an image payload that fails to decode.
"""

from __future__ import annotations

from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, FloatType, IntegerType, LongType, MapType, StringType,
    StructField, StructType,
)

from ..config import CrawlConfig, DEFAULT
from ..status import Fetch, Msg
from ..functions.urls import URLFilterChain, normalize_urls

OutlinkFn = Callable[[pd.Series], pd.Series]

_OUTLINK = StructType(
    [StructField("to_url", StringType()), StructField("anchor", StringType())]
)


def parse(fetch_log: DataFrame, content: DataFrame, cfg: CrawlConfig = DEFAULT,
          outlink_fn: OutlinkFn | None = None,
          chain: URLFilterChain | None = None,
          max_outlinks_per_page: int = 100,
          outlink_source: str = "url",
          validate_fn=None,
          exemption_filter=None,
          skip_truncated: bool = True,
          urlmeta_tags=None,
          cache: list | None = None) -> DataFrame:
    """Produce the PARSE_OUT rows for updatedb.

    ``outlink_fn(col) -> Series[list[(to_url, anchor)]]`` is the outlink
    extractor (C7), applied to the ``outlink_source`` column of the parsed
    frame — ``"url"`` (default) feeds the synthetic web's deterministic
    link graph; ``"caption"`` + ``functions.outlinks.extract_outlinks_text``
    is the real-text path (the OutlinkExtractor regex port).
    Only fetch_success pages are parsed (``ParseSegment.java:92-116``
    skips non-success via the ``_fst_`` metadata check).

    ``urlmeta_tags`` is the urlmeta plugin's ``urlmeta.tags`` list
    (``plugin/urlmeta/.../URLMetaScoringFilter.java:60-77``): each listed
    key present in the parent datum's metadata is copied onto every
    outlink target's datum, so discovered urls inherit those tags in the
    frontier (updatedb's link-metadata underlay picks them up).  The
    filtered map rides the already-narrow parse batches — no extra join.
    """
    if outlink_fn is None:
        from ..synth.world import outlinks_for
        outlink_fn = outlinks_for

    if {"host", "score"}.issubset(set(content.columns)):
        # fast path: fetch carried host/score through the content frame, so
        # the byte-bearing side never shuffles (SURVEY.md §7.3 risk 5)
        parsed = content
    else:
        # resume path (content reloaded from a CONTENT-schema snapshot):
        # broadcast the lite fetch-log side — bytes still don't shuffle
        lite_cols = ["url", "host", "score"]
        if urlmeta_tags and "metadata" in fetch_log.columns:
            lite_cols.append("metadata")
        ok = fetch_log.filter(F.col("status") == int(Fetch.SUCCESS)).select(
            *lite_cols
        )
        parsed = content.join(F.broadcast(ok), "url", "inner")
    # pages with no decodable payload are skipped (F6 truncation analogue)
    parsed = parsed.filter(F.col("bytes").isNotNull())
    if skip_truncated and "truncated" in parsed.columns:
        # parser.skip.truncated (reference default TRUE,
        # ParseSegment.java): a payload http.content.limit cut off
        # mid-stream must not contribute a signature or outlinks
        parsed = parsed.filter(
            ~F.coalesce(F.col("truncated"), F.lit(False)))
    if validate_fn is not None:
        # per-row payload validation (north-rule invariant): the injected
        # fn decodes bytes and diffs pixels/caption against the reference
        # (PSNR ≥ 40 dB for lossy); failing rows are dropped exactly like
        # the reference's truncation gate.  Arrow-batched, runs fused with
        # the content scan — nothing extra shuffles.
        vf = validate_fn

        def _vmap(it):
            for pdf in it:
                yield pdf[vf(pdf)]

        parsed = parsed.mapInPandas(_vmap, schema=parsed.schema)
    # the payload bytes are consumed exactly once — the md5 signature is
    # computed here and the cached frame the three output branches
    # re-scan carries NO byte blobs (at real payload sizes the cache
    # would otherwise be ~GBs re-read per branch: pure memory-bandwidth
    # burn that scales with nothing)
    parsed = parsed.select(
        *[c for c in parsed.columns if c != "bytes"],
        F.unhex(F.md5(F.col("bytes"))).alias("_sig"),
    ).persist()
    if cache is not None:
        # let looping callers release this cycle's cache after the
        # output is materialized (otherwise one cached frame per cycle
        # pins executor storage until the context cleaner happens by)
        cache.append(parsed)

    # --- signature rows (C3: md5 of raw content, JVM-side) ---
    sig_rows = parsed.select(
        "url", "host",
        F.lit(int(Msg.SIGNATURE)).alias("status"),
        F.lit(0.0).cast(FloatType()).alias("score"),
        F.col("_sig").alias("signature"),
        F.lit(None).cast(StringType()).alias("from_url"),
        F.lit(None).cast(StringType()).alias("anchor"),
        F.lit(None).cast("map<string,string>").alias("metadata"),
    )

    # --- parse-metadata rows (graft ParseData: dims/format/phash/caption md5) ---
    meta_rows = parsed.select(
        "url", "host",
        F.lit(int(Msg.PARSE_META)).alias("status"),
        F.lit(0.0).cast(FloatType()).alias("score"),
        F.lit(None).cast("binary").alias("signature"),
        F.lit(None).cast(StringType()).alias("from_url"),
        F.lit(None).cast(StringType()).alias("anchor"),
        F.create_map(
            F.lit("img.w"), F.col("w").cast("string"),
            F.lit("img.h"), F.col("h").cast("string"),
            F.lit("img.fmt"), F.col("fmt"),
            F.lit("img.phash"), F.col("phash").cast("string"),
            F.lit("caption.md5"), F.md5(F.col("caption").cast("binary")),
        ).alias("metadata"),
    )

    # --- outlink extraction (C7) + OPIC distribution (SC3) ---
    # ParseOutputFormat.java:319-371: the outlink loop normalizes + filters
    # FIRST; only ACCEPTED links count toward the maxOutlinks cap
    # (``validCount < outlinksToStore``), and the OPIC divisor is the
    # accepted count (targets.size()) — or the RAW pre-filter count
    # (allCount = links.length) when db.score.count.filtered is set
    # (OPICScoringFilter.java:120-141).  Extraction, normalization,
    # filtering and the accepted-cap all happen in ONE Arrow stage,
    # vectorized over the whole flattened batch — no per-link window,
    # no second Python round-trip.
    olf, fchain, src_col = outlink_fn, chain, outlink_source
    cap = int(max_outlinks_per_page)
    # db.ignore.external/internal.links (ParseOutputFormat.java:283-311):
    # applied INSIDE the loop, before the accepted-count cap, so the OPIC
    # divisor counts only kept links; external drops can be exempted
    # per-target (urlfilter-ignoreexempt, ExemptionUrlFilter.filter)
    ignore_ext = bool(cfg.ignore_external_links)
    ignore_int = bool(cfg.ignore_internal_links)
    exempt_f = exemption_filter
    # extractors flagged needs_base (HTML) also receive the page-url column
    # so relative links resolve per page — same single Arrow stage
    needs_base = bool(getattr(outlink_fn, "needs_base", False))

    def extract(it):
        import numpy as np

        for pdf in it:
            links = (olf(pdf[src_col], pdf["url"]) if needs_base
                     else olf(pdf[src_col]))
            raw = [list(l or []) for l in links]
            n_all = np.fromiter((len(r) for r in raw), dtype=np.int64,
                                count=len(raw))
            flat = pd.Series(
                [t for r in raw for t, _ in r], dtype=object)
            anchors = np.array([a for r in raw for _, a in r], dtype=object)
            normed = normalize_urls(flat) if len(flat) else flat
            ok = normed.notna().to_numpy() if len(flat) else np.zeros(0, bool)
            if fchain is not None and len(flat):
                ok &= fchain.accept(normed.fillna("")).to_numpy()
            if (ignore_ext or ignore_int) and len(flat):
                from ..functions.urls import host_of

                from_hosts = pd.Series(
                    np.repeat(pdf["host"].fillna("").str.lower()
                              .to_numpy(dtype=object), n_all),
                    dtype=object,
                )
                to_hosts = host_of(normed).fillna("")
                same = (to_hosts.to_numpy(dtype=object)
                        == from_hosts.to_numpy(dtype=object))
                if ignore_ext:
                    keep_ext = same
                    if exempt_f is not None:
                        keep_ext = same | exempt_f.exempt(
                            normed.fillna("")).to_numpy()
                    ok &= keep_ext
                if ignore_int:
                    ok &= ~same
            # FLAT output — one row per KEPT link, vectorized: the former
            # per-page regroup loop built array<struct> cells in Python
            # only for the JVM to explode them again.  The accepted-count
            # cap becomes a segment-wise rank: rank_j = running count of
            # accepted links within the page, kept iff accepted and
            # rank <= cap (identical to the loop's early break).
            n_pages = len(raw)
            page_of = np.repeat(np.arange(n_pages, dtype=np.int64), n_all)
            cum = np.cumsum(ok.astype(np.int64)) if len(flat) else \
                np.zeros(0, dtype=np.int64)
            offsets = np.zeros(n_pages, dtype=np.int64)
            if n_pages:
                np.cumsum(n_all[:-1], out=offsets[1:])
            # accepted-so-far BEFORE each page start
            base = np.where(offsets > 0, cum[offsets - 1], 0) \
                if len(flat) else offsets
            rank = cum - np.repeat(base, n_all) if len(flat) else cum
            kept = ok & (rank <= cap)
            n_valid_page = np.zeros(n_pages, dtype=np.int64)
            if len(flat):
                np.add.at(n_valid_page, page_of, kept.astype(np.int64))
            kpos = np.nonzero(kept)[0]
            kpage = page_of[kpos]
            url_np = pdf["url"].to_numpy(dtype=object)
            host_np = pdf["host"].to_numpy(dtype=object)
            score_np = pdf["score"].to_numpy()
            out = {
                "url": url_np[kpage],
                "score": score_np[kpage],
                "host": host_np[kpage],
                "to_url": (normed.to_numpy(dtype=object)[kpos]
                           if len(flat) else np.array([], dtype=object)),
                "anchor": anchors[kpos] if len(flat)
                else np.array([], dtype=object),
                "n_all": n_all[kpage],
                "n_valid": n_valid_page[kpage],
            }
            if "_urlmeta" in pdf.columns:
                out["_urlmeta"] = pdf["_urlmeta"].to_numpy(
                    dtype=object)[kpage]
            yield pd.DataFrame(out)

    out_fields = [
        StructField("url", StringType()),
        StructField("score", FloatType()),
        StructField("host", StringType()),
        StructField("to_url", StringType()),
        StructField("anchor", StringType()),
        StructField("n_all", LongType()),
        StructField("n_valid", LongType()),
    ]
    src_cols = ["url", "score", "host"]
    if src_col not in src_cols:
        src_cols.append(src_col)
    if urlmeta_tags:
        # pre-filter to the listed tags so only a tiny map crosses Arrow
        tags_arr = F.array(*[F.lit(t) for t in urlmeta_tags])
        meta_src = (F.col("metadata") if "metadata" in parsed.columns
                    else F.lit(None).cast("map<string,string>"))
        parsed = parsed.withColumn(
            "_urlmeta",
            F.map_filter(
                F.coalesce(meta_src,
                           F.create_map().cast("map<string,string>")),
                lambda k, _: F.array_contains(tags_arr, k)))
        src_cols.append("_urlmeta")
        out_fields.append(
            StructField("_urlmeta", MapType(StringType(), StringType())))
    with_links = parsed.select(*src_cols).mapInPandas(
        extract,
        schema=StructType(out_fields),
    )

    meta_cols = ["_urlmeta"] if urlmeta_tags else []
    # extract already emits one flat row per kept link — no JVM explode
    ex = with_links.select(
        F.col("url").alias("from_url"),
        F.col("host").alias("from_host"),
        "score", "n_all", "n_valid", *meta_cols,
        "to_url",
        F.left(F.col("anchor"),
               F.lit(int(cfg.linkdb_max_anchor_length))).alias("anchor"),
    )

    ex = ex.withColumn("to_host", F.lower(F.expr("parse_url(to_url, 'HOST')")))

    # OPIC cash (SC3): page score / divisor, internal/external factor
    divisor = F.col("n_all") if cfg.score_count_filtered else F.col("n_valid")
    cash = (F.col("score") / divisor) * F.when(
        F.col("to_host") == F.col("from_host"), F.lit(float(cfg.score_internal))
    ).otherwise(F.lit(float(cfg.score_external)))

    inherited = (
        F.when(F.size(F.col("_urlmeta")) > 0, F.col("_urlmeta"))
        if urlmeta_tags
        else F.lit(None).cast("map<string,string>"))
    link_rows = ex.select(
        F.col("to_url").alias("url"),
        F.col("to_host").alias("host"),
        F.lit(int(Msg.LINKED)).alias("status"),
        cash.cast(FloatType()).alias("score"),
        F.lit(None).cast("binary").alias("signature"),
        "from_url",
        "anchor",
        inherited.alias("metadata"),
    )

    return sig_rows.unionByName(meta_rows).unionByName(link_rows)


def redirect_link_rows(fetch_log: DataFrame) -> DataFrame:
    """Redirect targets as ``linked`` rows (P6 default http.redirect.max=0:
    the fetcher emits STATUS_LINKED for the target instead of following —
    ``FetcherThread.java:460-478``).  Cash 0 (redirect targets inherit no
    OPIC cash in the default plugin chain)."""
    red = fetch_log.filter(
        F.col("status").isin(int(Fetch.REDIR_TEMP), int(Fetch.REDIR_PERM))
        & F.col("redirect_to").isNotNull()
        & (F.col("redirect_to") != F.col("url"))  # self-redirects dropped
    )
    return red.select(
        F.col("redirect_to").alias("url"),
        F.lower(F.expr("parse_url(redirect_to, 'HOST')")).alias("host"),
        F.lit(int(Msg.LINKED)).alias("status"),
        F.lit(0.0).cast(FloatType()).alias("score"),
        F.lit(None).cast("binary").alias("signature"),
        F.col("url").alias("from_url"),
        F.lit(None).cast(StringType()).alias("anchor"),
        F.lit(None).cast("map<string,string>").alias("metadata"),
    )
