"""CoherenceBot fork parse filters: outlink gating, PDF archiving,
field translation, page thumbnails.

* ``outlink_parse_filter`` — ``parsefilter-outlinks/.../
  OutlinkParseFilter.java:66-225``: drop outlinks that are not
  host+path descendants of the page's seed (content-meta
  ``collection.seed``, falling back to the page url), with the PDF
  exception (a ``.pdf`` outlink survives when its registered domain or
  host is listed in content-meta ``org.domains``); then drop every
  outlink whose toUrl shares an anchor that exact-matches the
  anchor-exclusion list (``db.approve.anchors`` +
  ``urlfilter.anchor.file``).  Both passes are pure Catalyst
  higher-order-function expressions over the outlinks array — no
  Python in the per-row path, nothing shuffles.

* ``archive_parse_filter`` — ``parsefilter-archive/.../
  ArchiveParseFilter.java:71-166``: archive ``application/pdf``
  payloads under ``<prefix><host>/<digest>.pdf`` (slugified path when
  no digest) and record ``file.url_archive`` in parse metadata.  The
  S3 transport is an injectable object store (the sandbox has no AWS);
  the key derivation, mime gate, digest fallback, and skip-existing
  semantics are the reference's.

* ``translate_parse_filter`` — ``parse-translate/.../
  TranslateParser.java:61-135``: batch the configured source fields
  (one per line) into a single translation call per page, skip pages
  already in the target language, cap the batch at
  ``parse.translate.max.length``, and write each translated line back
  to its target field only when it actually differs from the source.
  The AWS Translate client is an injectable ``translate(texts,
  source_lang) -> list[str]`` provider applied per Arrow batch.

* ``thumbnail_parse_filter`` — ``parse-thumb/.../
  ThumbnailParseFilter.java:75-225``: render a page thumbnail through
  an injectable service (thum.io in prod) and store it under
  ``<host>/<slug(path)>.png`` in an injectable object store, recording
  ``thumbnail`` + ``thumbnail.url_archive`` in parse metadata.  Mime
  allowlist, 4000-byte significant-content gate, meta-precedence skip,
  and skip-existing-key semantics are the reference's; the Python stage
  runs over a narrow DISTINCT (url, key) projection so payload bytes
  never enter an Arrow batch.
"""

from __future__ import annotations

from typing import Callable

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.urls import domain_col, host_col, path_col

__all__ = [
    "parse_anchor_rules", "outlink_parse_filter",
    "archive_key_col", "slugify_col", "archive_parse_filter",
    "translate_parse_filter",
    "thumbnail_key_col", "thumbnail_parse_filter",
]


def parse_anchor_rules(lines: list[str]) -> list[str]:
    """Anchor-exclusion file reader (OutlinkParseFilter.java:268-289):
    blank lines and lines starting with ``#``/space/newline skipped."""
    return [ln for ln in lines if ln and ln[0] not in " \n#"]


def _clean_anchor(anchor: Column) -> Column:
    """``anchor.trim().toLowerCase()`` then strip leading/trailing
    punctuation (OutlinkParseFilter.java:122-125).  Java ``trim`` removes
    every char <= U+0020 (newlines included) — Spark's ``F.trim`` only
    strips spaces, so spell it out."""
    trimmed = F.regexp_replace(anchor,
                               r"^[\x00-\x20]+|[\x00-\x20]+$", "")
    return F.regexp_replace(F.lower(trimmed),
                            r"^\p{P}*(.*?)\p{P}*$", "$1")


def _host_path(url: Column) -> Column:
    """``host + path``, both lowercased (OutlinkParseFilter.java:194-197);
    null when java.net.URL would throw MalformedURLException."""
    return F.concat(host_col(url), F.lower(path_col(url)))


def outlink_parse_filter(require_descendants: bool = False,
                         approve_anchors: bool = False,
                         anchor_rules: list[str] | None = None,
                         url_col: str = "url",
                         outlinks_col: str = "outlinks",
                         meta_col: str = "metadata"):
    """Build the DataFrame transform.  ``df[meta_col]`` (optional
    map<string,string>) supplies ``collection.seed`` and ``org.domains``
    exactly like the reference's content metadata."""
    rules = sorted(set(parse_anchor_rules(anchor_rules or [])))

    def _apply(df: DataFrame) -> DataFrame:
        out = F.col(outlinks_col)
        meta = (F.col(meta_col) if meta_col in df.columns
                else F.create_map().cast("map<string,string>"))

        if require_descendants:
            # seed = content-meta collection.seed else the page url;
            # backslashes normalised to '/' on BOTH sides (:183-188)
            seed = F.replace(
                F.coalesce(F.element_at(meta, "collection.seed"),
                           F.col(url_col)),
                F.lit("\\"), F.lit("/"))
            from_chk = _host_path(seed)
            allowed = F.coalesce(
                F.split(F.element_at(meta, "org.domains"), ";"),
                F.array().cast("array<string>"))

            def keep_descendant(o):
                to = F.replace(o["to_url"], F.lit("\\"), F.lit("/"))
                to_chk = _host_path(to)
                is_desc = to_chk.startswith(from_chk)
                # PDF special case (:200-216): indexOf(".pdf") > 0
                is_pdf = F.instr(to, ".pdf") > 1
                dom_ok = (F.array_contains(allowed, domain_col(host_col(to)))
                          | F.array_contains(allowed, host_col(to)))
                # malformed from/to url -> null comparisons -> reject,
                # the reference's MalformedURLException branch (:222-224);
                # a malformed SEED rejects even allowed-domain PDFs (the
                # exception fires before the pdf branch is reached)
                return F.when(from_chk.isNull(), F.lit(False)).otherwise(
                    F.coalesce(is_desc | (is_pdf & dom_ok), F.lit(False)))

            out = F.filter(out, keep_descendant)

        if approve_anchors:
            # pass 1 (:118-136): any outlink whose cleaned anchor
            # exact-matches a rule puts its toUrl on the excluded list;
            # pass 2 (:137-151): every outlink with an excluded toUrl is
            # dropped (same toUrl under a harmless anchor dies too)
            if rules:
                rule_arr = F.array(*[F.lit(r) for r in rules])

                def is_excluded(o):
                    cleaned = _clean_anchor(
                        F.coalesce(o["anchor"], F.lit("")))
                    return (cleaned != "") & F.array_contains(
                        rule_arr, cleaned)

                excluded = F.transform(
                    F.filter(out, is_excluded), lambda o: o["to_url"])
                out = F.filter(
                    out,
                    lambda o: ~F.coalesce(
                        F.array_contains(excluded, o["to_url"]),
                        F.lit(False)))

        return df.withColumn(outlinks_col, out)

    return _apply


# --- parsefilter-archive ------------------------------------------------


def slugify_col(s: Column) -> Column:
    """com.github.slugify.Slugify defaults: lowercase, runs of
    non-alphanumerics become single ``-``, trimmed at both ends."""
    return F.regexp_replace(
        F.regexp_replace(F.lower(s), r"[^a-z0-9]+", "-"), r"^-+|-+$", "")


def archive_key_col(url: Column, digest: Column,
                    s3_prefix: str = "file/coherencebot-archive/") -> Column:
    """The archive object key (ArchiveParseFilter.java:94-118):
    ``<prefix><host-ish>/<digest>.pdf``.  The reference's "host" is
    whatever precedes the first ``/`` or ``?`` after stripping the
    protocol (ports and userinfo stay in), and urls with no path at all
    fall into the ``no-host/`` bucket — kept bit-for-bit, quirks and
    all.  When the digest is null the slugified remainder substitutes."""
    no_proto = F.regexp_replace(url, r"(file://|http://|https://)", "")
    host_part = F.regexp_extract(no_proto, r"([^/\?]+)[/\?](.+)", 1)
    path_part = F.regexp_extract(no_proto, r"([^/\?]+)[/\?](.+)", 2)
    matched = host_part != ""
    name = F.coalesce(digest,
                      F.when(matched, slugify_col(path_part))
                       .otherwise(slugify_col(no_proto)))
    return F.concat(F.lit(s3_prefix),
                    F.when(matched, host_part).otherwise(F.lit("no-host")),
                    F.lit("/"), name, F.lit(".pdf"))


def archive_parse_filter(store, bucket: str,
                         s3_prefix: str = "file/coherencebot-archive/",
                         mime_col: str = "mime", url_col: str = "url",
                         bytes_col: str = "bytes",
                         digest_col: str = "digest",
                         meta_col: str = "parse_meta"):
    """Archive PDF payloads through an injectable object store.

    ``store`` implements ``exists(key) -> bool`` and ``put(key, data)``
    and must be executor-safe (broadcast-picklable); a dict-backed or
    local-directory store stands in for S3 here.  Rows gain
    ``parse_meta['file.url_archive'] = s3://<bucket>/<key>`` exactly when
    the reference would set it: supported mime, non-empty payload or
    already-archived key (:117-158)."""

    def _apply(df: DataFrame) -> DataFrame:
        digest = (F.col(digest_col) if digest_col in df.columns
                  else F.lower(F.md5(F.col(bytes_col))))
        key = archive_key_col(F.col(url_col), digest, s3_prefix)
        is_pdf = F.col(mime_col) == "application/pdf"
        df = df.withColumn("_arch_key", F.when(is_pdf, key))

        st, bkt = store, bucket

        def _archive(it):
            for pdf in it:
                archived = []
                for k, data in zip(pdf["_arch_key"], pdf["_arch_bytes"]):
                    if k is None:
                        archived.append(None)
                        continue
                    if st.exists(k):
                        archived.append(f"s3://{bkt}/{k}")
                    elif data is not None and len(data) > 0:
                        st.put(k, bytes(data))
                        archived.append(f"s3://{bkt}/{k}")
                    else:
                        archived.append(None)  # zero bytes: no meta (:151)
                out = pdf.drop(columns=["_arch_bytes"])
                out["_arch_url"] = pd.Series(archived, dtype=object)
                yield out

        narrow = df.withColumn("_arch_bytes",
                               F.when(is_pdf, F.col(bytes_col)))
        fields = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}"
            for f in narrow.schema.fields if f.name != "_arch_bytes")
        result = narrow.mapInPandas(
            _archive, schema=f"{fields}, _arch_url string")
        meta = (F.col(meta_col) if meta_col in df.columns
                else F.create_map().cast("map<string,string>"))
        return result.withColumn(
            meta_col,
            F.when(F.col("_arch_url").isNotNull(),
                   F.map_concat(meta, F.map_from_arrays(
                       F.array(F.lit("file.url_archive")),
                       F.array(F.col("_arch_url")))))
            .otherwise(meta)).drop("_arch_key", "_arch_url")

    return _apply


# --- parse-translate ----------------------------------------------------


def translate_parse_filter(translate: Callable[[list[str], list[str]],
                                               list[str]],
                           field_map: dict[str, str],
                           target_lang: str = "en",
                           max_length: int = 5000,
                           lang_col: str = "lang",
                           title_col: str = "title",
                           meta_col: str = "parse_meta"):
    """``translate(batched_texts, source_langs) -> translated_texts`` is
    the injectable provider (one string per PAGE — fields joined by
    ``\\n`` exactly like the reference batches them, :85-112).  Source
    text per field comes from ``parse_meta[field]``, falling back to the
    title column for the ``title`` field (:93-99); pages whose ``lang``
    equals the target language are passed through untouched (:74-76)."""
    fmap = dict(field_map)

    def _apply(df: DataFrame) -> DataFrame:
        meta = (F.col(meta_col) if meta_col in df.columns
                else F.create_map().cast("map<string,string>"))
        src_exprs = []
        for src in fmap:
            v = F.element_at(meta, src)
            if src == "title" and title_col in df.columns:
                v = F.coalesce(v, F.col(title_col))
            src_exprs.append(v)
        lang = (F.col(lang_col) if lang_col in df.columns
                else F.lit(None).cast("string"))
        work = df.withColumn("_tr_src", F.array(*src_exprs)) \
                 .withColumn("_tr_lang", F.coalesce(lang, F.lit("auto")))

        targets = list(fmap.values())
        tgt, maxlen, prov = target_lang, max_length, translate

        def _translate(it):
            for pdf in it:
                texts, langs, idx = [], [], []
                for i, (srcs, lg) in enumerate(
                        zip(pdf["_tr_src"].tolist(), pdf["_tr_lang"].tolist())):
                    if lg == tgt:
                        continue
                    buf = "".join(
                        s.strip().replace("\n", " ") + "\n"
                        for s in srcs
                        if s is not None and s.strip())
                    if len(buf) > maxlen:
                        buf = buf[:maxlen - 1]
                    if buf:
                        texts.append(buf)
                        langs.append(lg)
                        idx.append(i)
                translated = prov(texts, langs) if texts else []
                add = [None] * len(pdf)
                for i, src_text, out_text in zip(idx, texts, translated):
                    if not out_text:
                        continue
                    pairs = {}
                    src_lines = src_text.split("\n")
                    out_lines = out_text.split("\n")
                    # targetFields collects only fields that contributed
                    # a line, in field_map order (:88-101)
                    contributed = [
                        t for s, t in fmap.items()
                        if (pdf["_tr_src"].iloc[i][list(fmap).index(s)] or ""
                            ).strip()]
                    for j, line in enumerate(out_lines):
                        field = (contributed[j] if j < len(contributed)
                                 else "unknown")
                        if j < len(src_lines) and line == src_lines[j]:
                            continue  # unchanged -> not saved (:116-118)
                        if line:
                            pairs[field] = line
                    add[i] = pairs or None
                out = pdf.drop(columns=["_tr_src", "_tr_lang"])
                out["_tr_add"] = pd.Series(add, dtype=object)
                yield out

        fields = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}"
            for f in work.schema.fields
            if f.name not in ("_tr_src", "_tr_lang"))
        result = work.mapInPandas(
            _translate, schema=f"{fields}, _tr_add map<string,string>")
        meta_out = (F.col(meta_col) if meta_col in df.columns
                    else F.create_map().cast("map<string,string>"))
        return result.withColumn(
            meta_col,
            F.when(F.col("_tr_add").isNotNull(),
                   F.map_concat(meta_out, F.col("_tr_add")))
            .otherwise(meta_out)).drop("_tr_add")

    return _apply


# --- parse-thumb ----------------------------------------------------------


def thumbnail_key_col(url: Column) -> Column:
    """The thumbnail object key (``parse-thumb/.../
    ThumbnailParseFilter.java:124-136``): ``<host-ish>/<slug(path)>.png``.

    Same host-ish split as the archive filter (whatever precedes the
    first ``/`` or ``?`` after stripping protocol substrings — ports and
    userinfo stay in), but the plugins diverge on the no-path case: the
    archive filter buckets it under ``no-host/``, this one collapses to
    ``<urlNoProto>/<slug(urlNoProto)>.png`` (:133-135).  Both quirks are
    kept bit-for-bit."""
    no_proto = F.regexp_replace(url, r"(file://|http://|https://)", "")
    host_part = F.regexp_extract(no_proto, r"([^/\?]+)[/\?](.+)", 1)
    path_part = F.regexp_extract(no_proto, r"([^/\?]+)[/\?](.+)", 2)
    matched = host_part != ""
    return F.when(
        matched,
        F.concat(host_part, F.lit("/"), slugify_col(path_part),
                 F.lit(".png"))
    ).otherwise(
        F.concat(no_proto, F.lit("/"), slugify_col(no_proto), F.lit(".png")))


def thumbnail_parse_filter(render: Callable[[list[str]], "list[bytes]"],
                           store, bucket: str,
                           public_base: str | None = None,
                           min_content_length: int = 4000,
                           supported_mimes: tuple = ("application/pdf",),
                           mime_col: str = "mime", url_col: str = "url",
                           bytes_col: str = "bytes",
                           meta_col: str = "parse_meta"):
    """Generate page thumbnails through an injectable render service and
    object store (``parse-thumb/.../ThumbnailParseFilter.java:75-225``).

    Reference semantics kept: mime allowlist (:79-85), the ≥4000-byte
    significant-content gate (:89-94), the meta-precedence skip (a page
    whose parse meta already carries ``thumbnail`` / ``twitter:image`` /
    ``og:image`` is returned untouched — the filter does NOT copy those
    into ``thumbnail``, :103-117), skip-render when the key already
    exists (:150-158), zero-byte render results set nothing (:199-201),
    and successful rows gain ``thumbnail`` (public URL) and
    ``thumbnail.url_archive`` (``s3://<bucket>/<key>``) in parse meta
    (:216-222).

    Scale shape — better than a literal port: the render service needs
    only the URL (thum.io renders the live page; the payload is never
    sent), so the Python stage runs over a narrow DISTINCT ``(url,
    key)`` projection — payload bytes never enter an Arrow batch — and
    the per-URL results broadcast-join back (fetchlist-sized by
    construction: at most one render per fetched page per cycle).

    ``render(urls) -> list[bytes | None]`` is the thum.io stand-in;
    ``store`` implements ``exists(key) -> bool`` / ``put(key, data)``
    and must be executor-safe, exactly like the archive filter's."""
    pub = public_base or f"https://{bucket}.s3.amazonaws.com/"

    def _apply(df: DataFrame) -> DataFrame:
        meta = (F.col(meta_col) if meta_col in df.columns
                else F.create_map().cast("map<string,string>"))
        # a NULL map must read as "no thumbnail yet", not NULL-eligible
        meta = F.coalesce(meta, F.create_map().cast("map<string,string>"))
        has_thumb = (F.element_at(meta, "thumbnail").isNotNull()
                     | F.element_at(meta, "twitter:image").isNotNull()
                     | F.element_at(meta, "og:image").isNotNull())
        eligible = (F.col(mime_col).isin(*supported_mimes)
                    & (F.length(F.col(bytes_col))
                       >= int(min_content_length))
                    & ~has_thumb)
        work = df.withColumn(
            "_th_key", F.when(eligible, thumbnail_key_col(F.col(url_col))))

        st, bkt, prov, pb = store, bucket, render, pub

        def _render(it):
            for pdf in it:
                urls = pdf[url_col].tolist()
                keys = pdf["_th_key"].tolist()
                need = [u for u, k in zip(urls, keys)
                        if not st.exists(k)]
                made = dict(zip(need, prov(need))) if need else {}
                thumbs = []
                for u, k in zip(urls, keys):
                    if u in made:
                        img = made[u]
                        if img is None or len(img) == 0:
                            thumbs.append(None)   # zero bytes: no meta
                            continue
                        st.put(k, bytes(img))
                    thumbs.append(f"{pb}{k}")
                out = pdf.copy()
                out["_th_url"] = pd.Series(thumbs, dtype=object)
                yield out

        narrow = work.select(url_col, "_th_key") \
            .filter(F.col("_th_key").isNotNull()).distinct()
        rendered = narrow.mapInPandas(
            _render,
            schema=f"`{url_col}` string, _th_key string, _th_url string")
        joined = work.drop("_th_key").join(
            F.broadcast(rendered), url_col, "left")
        new_meta = F.map_concat(meta, F.map_from_arrays(
            F.array(F.lit("thumbnail"), F.lit("thumbnail.url_archive")),
            F.array(F.col("_th_url"),
                    F.concat(F.lit(f"s3://{bkt}/"), F.col("_th_key")))))
        return joined.withColumn(
            meta_col,
            F.when(F.col("_th_url").isNotNull(), new_meta).otherwise(meta)
        ).drop("_th_key", "_th_url")

    return _apply
