"""Training-data curation CLI: the end-to-end dedup + quality pipeline
over a parquet document corpus, as a spark-submit job surface (the
LLM-pipeline twin of validate_cli.py).

    spark-submit faang_pydantics_validation_spark/jobs/dedup_cli.py \
        --input corpus.parquet --out OUT_DIR [--report] \
        [--threshold 0.8] [--num-hashes 64] [--bands 16] \
        [--min-words 5] [--min-alpha-ratio 0.5] [--langs en,de] \
        [--skip-neardup]

Stage order is ENFORCED BY THE TOOL (dedup.py's corpus-scale contract —
previously a docstring convention, now code):
  1. exact dedup    — collapse normalization-identical documents to their
                      smallest-id survivor (one hash-agg on md5 digest)
  2. near-dup       — MinHash+LSH verified group-form edges over the
                      SURVIVORS only; greedy keep-lowest-id: the member_id
                      side of every (rep_id, member_id) edge is dropped
                      (rep_id < member_id, so the smallest id of any
                      near-dup chain always survives; linear output even
                      on duplicate floods)
  3. quality filter — langid + quality features (pure Column exprs);
                      drop docs under --min-words / --min-alpha-ratio or
                      outside --langs

Outputs under --out:
    kept/           parquet of surviving documents (original columns)
    report.json     per-stage counts + parameters
One JSON summary line on stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))


def run_dedup_pipeline(
    spark,
    docs,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    num_hashes: int = 64,
    bands: int = 16,
    min_words: int = 5,
    min_alpha_ratio: float = 0.5,
    langs: list[str] | None = None,
    skip_neardup: bool = False,
) -> dict:
    """Programmatic surface (the CLI is a thin wrapper): returns
    {"kept": DataFrame, "stages": [...], "cleanup": callable}. Stage
    counts are actions — metadata-sized prints for a batch job, not part
    of any benchmarked plan. Call `cleanup()` AFTER consuming `kept`
    (collect/write) to release the pipeline's persisted intermediates —
    long-lived drivers running many corpora would otherwise accumulate
    cached blocks (the CLI consumes-then-cleans; a one-shot job can skip
    it and let session stop release everything)."""
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from faang_pydantics_validation_spark.operators import dedup as DD
    from faang_pydantics_validation_spark.operators import text as TX

    stages = []
    cache_mark = DD.cache_mark()  # scope cleanup to THIS pipeline's caches
    persisted_survivors = None

    def _release() -> None:
        # `survivors` is rebound by later stages — unpersist the HANDLE
        # that was actually persisted, then the operator-internal caches
        # registered since cache_mark.
        if persisted_survivors is not None:
            persisted_survivors.unpersist()
        DD.release_caches(cache_mark)

    try:
        n0 = docs.count()

        # 1. exact: keep each digest group's smallest id (the keep_id
        # survivor). Semi-join on the survivor ids keeps original columns.
        keep_ids = DD.exact_duplicates(docs, text_col=text_col, id_col=id_col).select(
            F.col("keep_id").alias(id_col)
        )
        survivors = docs.join(keep_ids, on=id_col, how="leftsemi").persist(
            StorageLevel.MEMORY_AND_DISK
        )
        persisted_survivors = survivors
        n1 = survivors.count()
        stages.append({"stage": "exact_dedup", "in": n0, "kept": n1})

        # 2. near-dup over survivors only. collapse_exact=False: stage 1
        # already collapsed by the SAME md5(normalized_text) digest, so every
        # internal collapse group over `survivors` would be a singleton — the
        # extra digest shuffle/persist would be pure overhead. group_form=True:
        # the drop set reads off the linear (rep_id, member_id) edges instead
        # of exploded pairs, so a pathological near-dup flood that survives
        # exact dedup cannot blow up the intermediate cardinality. The
        # max_bucket hot-bucket cap stays on too.
        n2 = n1
        if not skip_neardup:
            edges = DD.minhash_lsh_pairs(
                survivors,
                id_col=id_col,
                text_col=text_col,
                num_hashes=num_hashes,
                bands=bands,
                threshold=threshold,
                collapse_exact=False,
                group_form=True,
            )
            drop = edges.select(F.col("member_id").alias(id_col)).distinct()
            survivors = survivors.join(drop, on=id_col, how="left_anti")
            n2 = survivors.count()
            stages.append({"stage": "near_dedup_minhash", "in": n1, "kept": n2})

        # 3. quality / language filter (pure Column exprs — one scan)
        q = TX.quality_features(survivors, text_col=text_col, id_col=id_col).select(
            id_col, "n_words", "alpha_ratio"
        )
        lid = TX.language_id(survivors, text_col=text_col, id_col=id_col).select(
            id_col, "lang_guess"
        )
        keep = q.join(lid, on=id_col).where(
            (F.col("n_words") >= min_words) & (F.col("alpha_ratio") >= min_alpha_ratio)
        )
        if langs:
            keep = keep.where(F.col("lang_guess").isin(langs))
        kept = survivors.join(keep.select(id_col), on=id_col, how="leftsemi")
        n3 = kept.count()
        stages.append({"stage": "quality_langid_filter", "in": n2, "kept": n3})
    except BaseException:
        # a failed pipeline must not orphan its live mark: an unreleased
        # mark would permanently block default-scope release_caches(0)
        # for every cache registered after it in a long-lived driver.
        _release()
        raise

    # cleanup releases ONLY this pipeline's caches: the explicit survivors
    # persist plus the operator-internal ones (shingles, banded signatures)
    # registered since cache_mark — never the rest of the session
    # (serve_http dims, test fixtures), which a blanket
    # spark.catalog.clearCache() would silently evict.
    return {"kept": kept, "stages": stages, "cleanup": _release}


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="dedup + quality-filter a document corpus")
    ap.add_argument("--input", required=True, help="parquet path with (doc_id, text, ...)")
    ap.add_argument("--out", default=None, help="write kept/ parquet + report.json")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--threshold", type=float, default=0.8, help="min Jaccard for near-dup")
    ap.add_argument("--num-hashes", type=int, default=64)
    ap.add_argument("--bands", type=int, default=16)
    ap.add_argument("--min-words", type=int, default=5)
    ap.add_argument("--min-alpha-ratio", type=float, default=0.5)
    ap.add_argument("--langs", default=None, help="comma-separated lang_guess allowlist")
    ap.add_argument("--skip-neardup", action="store_true")
    ap.add_argument("--master", default=None)
    ap.add_argument("--report", action="store_true", help="print per-stage counts")
    args = ap.parse_args(argv)

    from faang_pydantics_validation_spark.session import get_spark

    spark = get_spark(master=args.master)
    t0 = time.time()
    docs = spark.read.parquet(args.input)
    res = run_dedup_pipeline(
        spark,
        docs,
        id_col=args.id_col,
        text_col=args.text_col,
        threshold=args.threshold,
        num_hashes=args.num_hashes,
        bands=args.bands,
        min_words=args.min_words,
        min_alpha_ratio=args.min_alpha_ratio,
        langs=args.langs.split(",") if args.langs else None,
        skip_neardup=args.skip_neardup,
    )
    report = {
        "stages": res["stages"],
        "params": {
            k: getattr(args, k)
            for k in ("threshold", "num_hashes", "bands", "min_words",
                      "min_alpha_ratio", "langs", "skip_neardup")
        },
        "wall_sec": round(time.time() - t0, 2),
    }
    if args.out:
        os.makedirs(args.out, exist_ok=True)
        res["kept"].write.mode("overwrite").parquet(f"{args.out}/kept")
        with open(f"{args.out}/report.json", "w") as f:
            json.dump(report, f, indent=1)
    res["cleanup"]()
    if args.report:
        for s in res["stages"]:
            print(f"{s['stage']:<24} in={s['in']:<10} kept={s['kept']}", file=sys.stderr)
    print(json.dumps({"in": res["stages"][0]["in"],
                      "kept": res["stages"][-1]["kept"],
                      "stages": len(res["stages"]),
                      "wall_sec": report["wall_sec"]}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
