"""Round-8 optimization measurement harness (bench.py is FROZEN for
measurement; this file holds the extra instrumentation the round's
evidence cites — see OPTIMIZATION_r08.md).

Replicates bench.py::query_timings methodology exactly (same session
factory, same warm-up, cold + warm-median noop-sink timing inside
cache.tracking_scope()) but:
  - runs an arbitrary subset of queries (argv names; default = the 64
    bench.py headline queries)
  - can dump .explain('formatted') per query to plans/r08/<q>_<tag>.txt
  - writes a JSON artifact under artifacts/

Usage:
  python bench_extra.py [--reps N] [--tag before|after] [--explain]
                        [--out artifacts/r08_baseline.json] [query ...]
"""
from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "extract_fulltext", "dedup_exact", "minhash_pairs", "simhash_near_dups",
    "ann_topk", "ann_lsh", "embedding_dedup", "lang_id", "quality",
    "keywords_topk", "sessionize", "events_hourly", "media_features",
    "winnow", "span_dedup", "unigram_logprob", "media_decode_jpeg",
    "media_audio", "media_video", "dsir", "gopher_filters", "url_blocklist",
    "paragraph_dedup", "corpus_prep", "line_filters", "bloom_seen",
    "feed_entries", "feed_urls", "quality_buckets", "robots_gate",
    "frontier", "bpe_vocab", "page_links", "bpe_encode", "crawl_prep",
    "quality_classifier", "ccnet_prep", "bm25_topk", "exact_substr",
    "stupid_backoff", "warc_records", "warc_extract", "dclm_prep",
    "sitemap_urls", "tokenize_pack", "pagerank", "kmv_distinct",
    "heavy_hitters", "hll_distinct", "shard_assign", "pmi_collocations",
    "chunk_text", "triangle_count", "anchor_topk", "build_postings",
    "host_rank", "sparse_dot_pairs", "nlp_summary", "nlp_sentence_scores",
    "source_meta", "api_surface", "badwords", "dedup_lines",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--tag", default=None,
                    help="write plans/r08/<q>_<tag>.txt explain dumps")
    ap.add_argument("--out", default=None)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as E
    from newspaper_spark import cache
    from newspaper_spark.operators.extract import extract_articles
    from newspaper_spark.plans.session import get_spark
    from newspaper_spark.sources.transcripts import synthetic_transcripts

    names = args.queries or HEADLINE
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    qs = E.queries()
    missing = [n for n in names if n not in qs]
    assert not missing, f"unknown queries: {missing}"

    plans_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "plans", "r08")
    if args.tag:
        os.makedirs(plans_dir, exist_ok=True)

    spark = get_spark(app_name="bench-extra", cores=cpus)
    cold, warm_med, samples_all = {}, {}, {}
    try:
        warm = synthetic_transcripts(spark, args.sf_dir).limit(cpus * 4) \
            .repartition(cpus)
        extract_articles(warm).filter("status = 'ok'").count()
        for name in names:
            spark.sparkContext.setJobDescription(name)
            if args.tag:
                with cache.tracking_scope():
                    df = qs[name](spark, args.sf_dir)
                    plan = df._jdf.queryExecution().explainString(
                        spark._jvm.org.apache.spark.sql.execution
                        .ExplainMode.fromString("formatted"))
                with open(os.path.join(
                        plans_dir, f"{name}_{args.tag}.txt"), "w") as f:
                    f.write(plan)
            samples = []
            for _ in range(1 + args.reps):
                t0 = time.time()
                with cache.tracking_scope():
                    df = qs[name](spark, args.sf_dir)
                    df.write.format("noop").mode("overwrite").save()
                samples.append(round(time.time() - t0, 3))
            cold[name] = samples[0]
            warm_med[name] = round(statistics.median(samples[1:]), 3)
            samples_all[name] = samples
            print(f"{name}: cold={samples[0]} warm_med={warm_med[name]} "
                  f"samples={samples[1:]}", flush=True)
    finally:
        spark.stop()

    result = {"sf_dir": args.sf_dir, "cpus": cpus, "reps": args.reps,
              "warm_median": warm_med, "cold": cold, "samples": samples_all,
              "warm_total": round(sum(warm_med.values()), 2)}
    print(json.dumps({"warm_total": result["warm_total"],
                      "n_queries": len(names)}))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
