"""Crawl → training-corpus bridge CLI — turn a crawl workdir's fetched
image+caption payloads into a deduped, shard-manifested training corpus.

    spark-submit --py-files dist/coherencebot_spark.zip \
        scripts/build_corpus.py --workdir /data/crawl --out /data/corpus \
        --shard-bytes 1073741824 --write-shards

In the sandbox:  python scripts/build_corpus.py --workdir /tmp/crawl \
    --out /tmp/corpus

Reads every cycle's ``content/`` rows (the input-hint table shape
``image_id, bytes, w, h, fmt, caption, phash`` plus crawl columns),
drops truncated payloads, and runs the image-corpus pipeline
(``datapipe/image_corpus.py``: wellformed gates → optional caption-spam
gate → exact/near phash dedup → byte-budgeted shard manifest).  Output:
``{out}/manifest`` parquet (survivor metadata + shard assignment — no
bytes) and, with ``--write-shards``, physical webdataset-style payload
shards + indexes under ``{out}/shards``.  Prints ONE JSON audit line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(spark, workdir: str, out: str, *,
          caption_dedup: bool = False, validate_decode: bool = False,
          junk_gate: bool = False,
          max_hamming: int = 3, shard_bytes: int = 1 << 30,
          min_w: int = 64, min_h: int = 64,
          write_shards: bool = False) -> dict:
    from functools import reduce

    from pyspark.sql import functions as F

    from coherencebot_spark.datapipe.image_corpus import (
        ImageCorpusConfig, build_image_corpus, write_image_shards)
    from coherencebot_spark.sources.snapshot import SnapshotTable

    # content is a SnapshotTable with one snapshot per crawl cycle (each
    # cycle's segment, not cumulative) — union every cycle's payloads
    tbl = SnapshotTable(os.path.join(workdir, "content"), "content")
    segs = [tbl.read(spark, s["id"]) for s in tbl.history()]
    if not segs:
        raise FileNotFoundError(f"no content snapshots under {workdir}")
    content = reduce(lambda a, b: a.unionByName(b), segs)
    images = (content
              .where(~F.coalesce(F.col("truncated"), F.lit(False)))
              .select("image_id", "bytes", "w", "h", "fmt", "caption",
                      "phash", "url"))
    cfg = ImageCorpusConfig(
        caption_dedup=caption_dedup, validate_decode=validate_decode,
        junk_gate=junk_gate,
        max_hamming=max_hamming, shard_bytes=shard_bytes,
        min_w=min_w, min_h=min_h)
    corpus, audit = build_image_corpus(images, cfg)
    # manifest carries everything BUT the payload; bytes go to shards
    corpus.drop("bytes").write.mode("overwrite").parquet(
        os.path.join(out, "manifest"))
    if write_shards:
        shard_dir = os.path.join(out, "shards")
        write_image_shards(corpus, shard_dir, shard_bytes=shard_bytes)
        audit["shard_files"] = len(
            [f for f in os.listdir(shard_dir) if f.endswith(".bin")])
    return audit


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True, help="crawl workdir")
    ap.add_argument("--out", required=True, help="corpus output dir")
    ap.add_argument("--caption-dedup", action="store_true")
    ap.add_argument("--validate-decode", action="store_true")
    ap.add_argument("--junk-gate", action="store_true",
                    help="drop solid/low-entropy placeholder images by "
                         "decoded-pixel statistics")
    ap.add_argument("--max-hamming", type=int, default=3)
    ap.add_argument("--shard-bytes", type=int, default=1 << 30)
    ap.add_argument("--min-w", type=int, default=64)
    ap.add_argument("--min-h", type=int, default=64)
    ap.add_argument("--write-shards", action="store_true",
                    help="also write physical payload shards + indexes")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    from coherencebot_spark.session import build_session
    spark = build_session(master=f"local[{args.cpus}]",
                          app_name="cbspark-build-corpus")
    t0 = time.time()
    audit = build(spark, args.workdir, args.out,
                  caption_dedup=args.caption_dedup,
                  validate_decode=args.validate_decode,
                  junk_gate=args.junk_gate,
                  max_hamming=args.max_hamming,
                  shard_bytes=args.shard_bytes,
                  min_w=args.min_w, min_h=args.min_h,
                  write_shards=args.write_shards)
    audit["sec"] = round(time.time() - t0, 1)
    print(json.dumps(audit))
    spark.stop()


if __name__ == "__main__":
    main()
