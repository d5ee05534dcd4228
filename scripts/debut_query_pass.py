"""Per-query timing pass for the current round's debut queries
(_NEW_THIS_ROUND, falling back to the round-6 list when a round has
no debuts).

Same protocol as bench.py::query_timings (1 cold + median of 3 warm
reruns, each inside cache.tracking_scope(), noop sink) but restricted
to the round's debut list — optionally filtered further by name via
argv — so BENCH.md can record debut warm medians without re-running
the full per-query pass.
"""
import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

import __spark_entry__ as E  # noqa: E402
from bench import SF_DIR  # noqa: E402
from newspaper_spark import cache  # noqa: E402
from newspaper_spark.operators.extract import extract_articles  # noqa: E402
from newspaper_spark.plans.session import get_spark  # noqa: E402
from newspaper_spark.sources.transcripts import synthetic_transcripts  # noqa: E402

_R6_DEBUTS = ["quality_classifier", "ccnet_prep", "bm25_topk",
          "exact_substr", "stupid_backoff", "warc_records", "warc_extract", "dclm_prep", "sitemap_urls", "tokenize_pack", "pagerank", "kmv_distinct", "heavy_hitters", "hll_distinct", "shard_assign", "pmi_collocations", "chunk_text", "triangle_count", "anchor_topk", "build_postings", "host_rank", "sparse_dot_pairs"]

DEBUTS = [nm for nm, _ in E._NEW_THIS_ROUND] or _R6_DEBUTS

if len(sys.argv) > 1:  # restrict to named debuts
    DEBUTS = [d for d in DEBUTS if d in sys.argv[1:]]


def main():
    cores = 32
    qs = E.queries()
    spark = get_spark(app_name="debut-query-pass", cores=cores)
    cold, warm_med = {}, {}
    try:
        warm = synthetic_transcripts(spark, SF_DIR).limit(cores * 4).repartition(cores)
        extract_articles(warm).filter("status = 'ok'").count()
        for name in DEBUTS:
            samples = []
            for _ in range(4):
                t0 = time.time()
                with cache.tracking_scope():
                    df = qs[name](spark, SF_DIR)
                    df.write.format("noop").mode("overwrite").save()
                samples.append(round(time.time() - t0, 3))
            cold[name] = samples[0]
            warm_med[name] = round(statistics.median(samples[1:]), 3)
    finally:
        spark.stop()
    print(json.dumps({"sf_dir": SF_DIR, "cores": cores,
                      "cold": cold, "warm_median": warm_med}))


if __name__ == "__main__":
    main()
