"""Benchmark harness.

Runs the headline pipeline (transcripts → vectorized extraction) plus
representative operator queries at $SPARK_GRAFT_SF_DIR (default
sf0.1), on local[$SPARK_GRAFT_CPUS] (default 32), and prints ONE JSON
line:

  {"metric": "extraction_throughput_turns_per_sec", "value": <turns/s
   at full cores>, "unit": "turns/sec", "wall_seconds": ...,
   "queries": {...per-query seconds...}, "sf": ...,
   "turns_per_sec": ..., "scaling": {...}}

Scaling efficiency (north rule, sandbox proxy): the same extraction
job runs at N=8 and 4N=32 local cores in separate *subprocesses*, each
pinned with sched_setaffinity to exactly that many CPUs — so the
"8-core executor" cannot borrow the other 24 cores for JVM work, just
like a real cluster executor. efficiency = throughput(32) /
(4 × throughput(8)).

The JSON also carries the NO-FRAMEWORK CEILING: the identical
extraction kernel over the identical synthetic pages via raw
multiprocessing (pages shared copy-on-write through fork, workers
return counts — zero pipe traffic), at the same two pinned levels.
A single host clocks 8 busy cores higher than 32 busy cores (turbo /
shared memory subsystem / hypervisor steal), which separate executor
machines would not see — the ceiling quantifies exactly that
machine-imposed loss, and `efficiency_framework_relative` =
spark_efficiency / ceiling_efficiency isolates what Spark itself
costs. The first pinned run of a session is a cold-cache outlier, so
one discarded warm-up run precedes measurement and levels interleave
across reps (medians reported, raw samples included).

Set SPARK_GRAFT_BENCH_SCALING=0 to skip scaling+ceiling (driver smoke).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
_TARGET_TURNS = 60000  # enough work to amortize per-task overhead
_CEILING_TURNS = _TARGET_TURNS  # identical workload to the Spark runs


def _replication() -> int:
    env = os.environ.get("SPARK_GRAFT_BENCH_REPLICATION")
    if env:
        return int(env)
    import duckdb

    n_docs = duckdb.sql(
        f"select count(*) from '{SF_DIR}/documents.parquet'"
    ).fetchone()[0]
    return max(1, -(-_TARGET_TURNS // max(n_docs, 1)))


REPLICATION = _replication()


def _sf_from_dir(d: str) -> float:
    import re

    m = re.search(r"sf([0-9.]+)", d)
    return float(m.group(1)) if m else -1.0


def extraction_run(cores: int) -> tuple[float, int]:
    """Returns (seconds, n_turns) for the full extraction pipeline at
    the given parallelism, in a fresh SparkSession pinned to ``cores``
    CPUs (executor-equivalent resource envelope)."""
    try:
        os.sched_setaffinity(0, set(range(cores)))
    except (AttributeError, OSError):
        pass
    from newspaper_spark.operators.extract import extract_articles
    from newspaper_spark.plans.session import get_spark
    from newspaper_spark.sources.transcripts import synthetic_transcripts

    # The materialized-input cache is harness scaffolding (a real job
    # reads parquet/Iceberg); columnar-cache DECOMPRESSION inside the
    # timed section charges extraction for JVM work the harness
    # created. Storing the cache uncompressed removes it: measured
    # +5% throughput at 32 cores AND +6% at 8 (A/B, 2 interleaved
    # reps each), scaling ratio unchanged.
    extra = {"spark.sql.inMemoryColumnarStorage.compressed": "false"}
    extra.update(json.loads(os.environ.get("SPARK_GRAFT_EXTRA_CONF", "{}")))
    spark = get_spark(
        app_name=f"bench-extract-{cores}", cores=cores, extra_conf=extra
    )
    # packed mode (BENCH.md round-6 Arrow-handoff experiment): the
    # cached input holds zlib-compressed HTML (binary), stand-in for a
    # WARC-style compressed-at-rest source; the timed stage ships ~10×
    # fewer bytes across the JVM→Python Arrow boundary and decompresses
    # inside the N workers. Output byte-identical (tested).
    packed = os.environ.get("SPARK_GRAFT_BENCH_PACKED", "0") == "1"
    try:
        t = synthetic_transcripts(spark, SF_DIR, replication=REPLICATION)
        parts_mult = int(os.environ.get("SPARK_GRAFT_BENCH_PARTS_MULT", "4"))
        if packed:
            from pyspark.sql import functions as F

            from newspaper_spark.operators.extract import (
                compress_text_udf,
                extract_articles_packed,
            )

            t = t.withColumn(
                "text_z", compress_text_udf(F.col("text"))
            ).drop("text")
            run_extract = extract_articles_packed
        else:
            run_extract = extract_articles
        t = t.repartition(cores * parts_mult).cache()  # 4×cores: load balance
        n = t.count()  # materialize input before timing the extraction
        # warm-up: spin up + import-load every Python UDF worker so the
        # timed section measures steady-state throughput (what a long
        # cluster job sees), not one-time worker fork/import cost
        warm = t.limit(cores * 8).repartition(cores)
        run_extract(warm).filter("status = 'ok'").count()
        t0 = time.time()
        out = run_extract(t)
        # count(status=ok) forces full extraction of every row while
        # avoiding a driver-side collect of the texts
        n_ok = out.filter("status = 'ok'").count()
        dt = time.time() - t0
        assert n_ok > 0
        return dt, n
    finally:
        spark.stop()


# ---------------------------------------------------------------------------
# no-framework ceiling: identical kernel, identical pages, bare
# multiprocessing — measures what this MACHINE loses going 8 → 32 busy
# cores, independent of Spark
# ---------------------------------------------------------------------------

_CEILING_PAGES: list | None = None  # set pre-fork; children inherit via COW


def _build_pages(n: int) -> list:
    """The same synthetic pages synthetic_html_col builds, in Python."""
    import re as _re

    import duckdb

    from newspaper_spark.sources.transcripts import (
        _BOILER_FOOT,
        _BOILER_NAV,
        BODY_REPEAT,
        PARA_LEAD,
        PARA_WORDS,
    )

    rows = duckdb.sql(
        f"select doc_id, text, coalesce(lang, 'en') from '{SF_DIR}/documents.parquet'"
    ).fetchall()
    pat = _re.compile(r"((?:\S+ ){%d})" % PARA_WORDS)
    pages = []
    i = 0
    while len(pages) < n:
        doc_id, text, lang = rows[i % len(rows)]
        block = (
            "<p>" + PARA_LEAD
            + pat.sub(lambda m: m.group(1) + "</p><p>" + PARA_LEAD, text)
            + "</p>"
        )
        title = f"Document number {doc_id} on data systems"
        pages.append(
            '<html lang="en"><head><title>' + title + " - Example Media</title>"
            '<meta name="doc-lang" content="' + lang + '">'
            '<meta property="og:site_name" content="Example Media">'
            '<meta property="article:published_time" content="2014-12-30T00:00:00Z">'
            '<meta name="author" content="Alex Writer">'
            "</head><body>" + _BOILER_NAV + '<div class="article-body">'
            + block * BODY_REPEAT
            + "</div>" + _BOILER_FOOT + "</body></html>"
        )
        i += 1
    return pages


def _n_distinct_docs() -> int:
    import duckdb

    return duckdb.sql(
        f"select count(*) from '{SF_DIR}/documents.parquet'"
    ).fetchone()[0]


def _ceiling_worker(rng: tuple) -> int:
    from newspaper_spark.kernel.article import extract_article

    pages = _CEILING_PAGES
    n_pages = len(pages)
    n_ok = 0
    for i in range(rng[0], rng[1]):
        # modulo indexing: distinct pages built once, replicated by
        # index — the same replication the Spark input uses, without
        # paying an O(turns) page build per subprocess
        rec = extract_article(pages[i % n_pages])
        if rec.get("status") == "ok":
            n_ok += 1
    return n_ok


def ceiling_run(cores: int) -> tuple[float, int]:
    """(seconds, n_pages) for the bare-multiprocessing kernel at
    ``cores`` pinned CPUs. Pages live in a pre-fork global (COW), so
    the pool moves counts, not HTML."""
    global _CEILING_PAGES
    try:
        os.sched_setaffinity(0, set(range(cores)))
    except (AttributeError, OSError):
        pass
    import multiprocessing as mp

    n = _CEILING_TURNS
    _CEILING_PAGES = _build_pages(min(n, _n_distinct_docs()))
    n_chunks = cores * 4
    step = -(-n // n_chunks)
    ranges = [(i, min(i + step, n)) for i in range(0, n, step)]
    with mp.get_context("fork").Pool(cores) as pool:
        # warm: import the kernel in every worker before timing
        pool.map(_ceiling_worker, [(i, i + 1) for i in range(cores)])
        t0 = time.time()
        oks = pool.map(_ceiling_worker, ranges)
        dt = time.time() - t0
    assert sum(oks) > 0
    return dt, n


def query_timings(cores: int) -> tuple[dict, dict]:
    """Per-query seconds at SF_DIR: (warm_medians, cold_first_runs).

    Each timed run is wrapped in cache.tracking_scope(): operator-
    internal persists (signature/sentence/token tables) are freed as
    soon as that run's output is consumed, so query k's blocks never
    occupy memory during query k+1 (bounded-memory behavior for the
    exact session shape the driver runs) AND warm reruns rebuild their
    persists instead of reading blocks cached by the previous run —
    warm numbers measure warm-PLAN cost (JIT/codegen/worker reuse), not
    cache reads. Cold = first run (what a one-shot session pays); warm
    = median of the subsequent runs (steady-state cost in a long-lived
    session).
    """
    import statistics

    import __spark_entry__ as E
    from newspaper_spark import cache
    from newspaper_spark.operators.extract import extract_articles
    from newspaper_spark.plans.session import get_spark
    from newspaper_spark.sources.transcripts import synthetic_transcripts

    headline = [
        "extract_fulltext",
        "dedup_exact",
        "minhash_pairs",
        "simhash_near_dups",
        "ann_topk",
        "ann_lsh",
        "embedding_dedup",
        "lang_id",
        "quality",
        "keywords_topk",
        "sessionize",
        "events_hourly",
        "media_features",
        "winnow",
        "span_dedup",
        "unigram_logprob",
        "media_decode_jpeg",
        "media_audio",
        "media_video",
        "dsir",
        "gopher_filters",
        "url_blocklist",
        "paragraph_dedup",
        "corpus_prep",
        "line_filters",
        "bloom_seen",
        "feed_entries",
        "feed_urls",
        "quality_buckets",
        "robots_gate",
        "frontier",
        "bpe_vocab",
        "page_links",
        "bpe_encode",
        "crawl_prep",
        "quality_classifier",
        "ccnet_prep",
        "bm25_topk",
        "exact_substr",
        "stupid_backoff",
        "warc_records",
        "warc_extract",
        "dclm_prep",
        "sitemap_urls",
        "tokenize_pack",
        "pagerank",
        "kmv_distinct",
        "heavy_hitters",
        "hll_distinct",
        "shard_assign",
        "pmi_collocations",
        "chunk_text",
        "triangle_count",
        "anchor_topk",
        "build_postings",
        "host_rank",
        "sparse_dot_pairs",
        # round-7: the two rotation-debt queries (VERDICT r6 item 7)
        # and the round's four debuts
        "nlp_summary",
        "nlp_sentence_scores",
        "source_meta",
        "api_surface",
        "badwords",
        "dedup_lines",
    ]
    qs = E.queries()
    spark = get_spark(app_name="bench-queries", cores=cores)
    warm_reps = int(os.environ.get("SPARK_GRAFT_BENCH_QUERY_REPS", "3"))
    cold, warm_med = {}, {}
    try:
        # steady-state: fork + import every Python UDF worker once so the
        # first UDF query isn't charged the one-time startup
        warm = synthetic_transcripts(spark, SF_DIR).limit(cores * 4).repartition(cores)
        extract_articles(warm).filter("status = 'ok'").count()
        for name in headline:
            samples = []
            for _ in range(1 + warm_reps):
                t0 = time.time()
                with cache.tracking_scope():
                    df = qs[name](spark, SF_DIR)
                    df.write.format("noop").mode("overwrite").save()
                samples.append(round(time.time() - t0, 3))
            cold[name] = samples[0]
            warm_med[name] = round(statistics.median(samples[1:]), 3)
    finally:
        spark.stop()
    return warm_med, cold


def _run_sub(mode: str, cores: int) -> tuple[float, int]:
    """Run extraction/ceiling in a subprocess (affinity + fresh state)."""
    import subprocess

    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), mode, str(cores)],
        capture_output=True,
        text=True,
        check=True,
    )
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    return out["seconds"], out["n"]


def _run_pinned(cores: int) -> tuple[float, int]:
    return _run_sub("--extract-run", cores)


def main():
    if len(sys.argv) > 2 and sys.argv[1] in ("--extract-run", "--ceiling-run"):
        fn = extraction_run if sys.argv[1] == "--extract-run" else ceiling_run
        dt, n = fn(int(sys.argv[2]))
        print(json.dumps({"seconds": dt, "n": n}))
        return

    do_scaling = os.environ.get("SPARK_GRAFT_BENCH_SCALING", "1") != "0"
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "5"))

    # Host noise here is LOW-FREQUENCY (hypervisor steal / all-core
    # clock scaling drifts over minutes, ±15% and occasionally 2×), so
    # the robust protocol is PAIRED EPOCHS: each epoch runs all four
    # measurements back-to-back — spark@4N, spark@N, ceiling@4N,
    # ceiling@N — under near-identical host conditions, computes the
    # efficiency RATIOS within the epoch (where the common noise factor
    # cancels), and the artifact reports the median ratio across
    # epochs with every raw sample attached. A discarded warm-up run
    # precedes measurement (first pinned run of a session is a
    # cold-cache/JIT outlier, ~half throughput).
    import statistics

    low_cores = max(CPUS // 4, 1)
    n_turns = None
    epochs = []
    if do_scaling:
        _run_pinned(CPUS)  # discarded warm-up (cold-session outlier)
        for _ in range(reps):
            dt, n_turns = _run_pinned(CPUS)
            dt_low, _ = _run_pinned(low_cores)
            dt_ch, n_c = _run_sub("--ceiling-run", CPUS)
            dt_cl, _ = _run_sub("--ceiling-run", low_cores)
            ep = {
                "spark_high": n_turns / dt,
                "spark_low": n_turns / dt_low,
                "ceil_high": n_c / dt_ch,
                "ceil_low": n_c / dt_cl,
            }
            ep["eff"] = ep["spark_high"] / (4.0 * ep["spark_low"])
            ep["ceil_eff"] = ep["ceil_high"] / (4.0 * ep["ceil_low"])
            ep["fw_rel"] = ep["eff"] / ep["ceil_eff"]
            epochs.append(ep)
        thr_full = statistics.median(e["spark_high"] for e in epochs)
    else:
        dt, n_turns = _run_pinned(CPUS)
        thr_full = n_turns / dt
    dt_full = n_turns / thr_full

    scaling = {}
    if do_scaling:
        thr_low = statistics.median(e["spark_low"] for e in epochs)
        ceil_high = statistics.median(e["ceil_high"] for e in epochs)
        ceil_low = statistics.median(e["ceil_low"] for e in epochs)
        efficiency = statistics.median(e["eff"] for e in epochs)
        ceil_eff = statistics.median(e["ceil_eff"] for e in epochs)
        # three fw-rel estimators, all reported. The headline estimator
        # is PRE-REGISTERED in BENCH.md ("Estimator pre-registration")
        # from the host noise model alone: noise has two modes and each
        # defeats one simple estimator. MONOTONE DRIFT over the run
        # (measured: per-epoch ratios climbing 0.58→0.97 as a noisy
        # neighbor freed the host) poisons the ratio-of-medians because
        # numerator and denominator medians land in different drift
        # phases, while ISOLATED SPIKES poison the median of per-epoch
        # ratios because one bad timing ruins its whole epoch. The
        # TRIMMED MEAN of per-epoch ratios is the unique member of this
        # family robust to both (paired ratios cancel common-mode
        # drift; trimming min+max removes spike epochs), hence the
        # headline; the other two are reported alongside so the choice
        # is auditable.
        ratios = sorted(e["fw_rel"] for e in epochs)
        trimmed = ratios[1:-1] if len(ratios) >= 3 else ratios
        fw_rel = sum(trimmed) / len(trimmed)
        fw_rel_rom = efficiency / ceil_eff if ceil_eff > 0 else 0.0
        fw_rel_mor = statistics.median(e["fw_rel"] for e in epochs)
        scaling = {
            "protocol": (
                f"{reps} paired epochs (spark@{CPUS}, spark@{low_cores}, "
                f"ceiling@{CPUS}, ceiling@{low_cores} back-to-back per "
                "epoch, pinned affinity, 1 discarded warm-up). Headline "
                "fw-rel = trimmed mean of per-epoch ratios (paired "
                "ratios cancel common-mode host drift; trimming min+max "
                "removes spike epochs); the median-of-ratios and "
                "ratio-of-medians variants are reported alongside"
            ),
            "cores_low": low_cores,
            "cores_high": CPUS,
            "turns_per_sec_low": round(thr_low, 2),
            "turns_per_sec_high": round(thr_full, 2),
            "efficiency_nx4": round(efficiency, 3),
            "samples_high": [round(e["spark_high"], 1) for e in epochs],
            "samples_low": [round(e["spark_low"], 1) for e in epochs],
            "ceiling": {
                "method": "raw multiprocessing, identical kernel+pages+"
                          "workload, COW-shared input, pinned affinity",
                "turns_per_sec_low": round(ceil_low, 2),
                "turns_per_sec_high": round(ceil_high, 2),
                "efficiency_nx4": round(ceil_eff, 3),
                "samples_high": [round(e["ceil_high"], 1) for e in epochs],
                "samples_low": [round(e["ceil_low"], 1) for e in epochs],
            },
            "efficiency_per_epoch": [round(e["eff"], 3) for e in epochs],
            "fw_rel_per_epoch": [round(e["fw_rel"], 3) for e in epochs],
            "fw_rel_median_of_ratios": round(min(fw_rel_mor, 1.0), 3),
            "fw_rel_ratio_of_medians": round(min(fw_rel_rom, 1.0), 3),
            "efficiency_framework_relative": round(min(fw_rel, 1.0), 3),
        }

    queries_warm, queries_cold = query_timings(CPUS)

    result = {
        # 'value' carries the throughput the metric names; wall-clock
        # seconds for the measured run live in 'wall_seconds'
        "metric": "extraction_throughput_turns_per_sec",
        "value": round(thr_full, 2),
        "unit": "turns/sec",
        "wall_seconds": round(dt_full, 3),
        # 'queries' = warm medians (steady-state cost in a long-lived
        # session); 'queries_cold' = first run incl. one-time plan/
        # analysis cost. Per-run caches are scoped (see query_timings).
        "queries": queries_warm,
        "queries_cold": queries_cold,
        "queries_protocol": (
            "per query: 1 cold run + median of "
            "$SPARK_GRAFT_BENCH_QUERY_REPS(=3) warm reruns; each run "
            "inside cache.tracking_scope() so warm reruns rebuild "
            "operator-internal persists (warm-plan cost, not cache "
            "reads) and no blocks leak across queries"
        ),
        "sf": _sf_from_dir(SF_DIR),
        "n_turns": n_turns,
        "turns_per_sec": round(thr_full, 2),
        "scaling": scaling,
    }

    # Full detail goes to a local artifact file only; stdout's FINAL
    # line is a compact summary. The external driver keeps just the
    # last ~2000 bytes of stdout and parses the final JSON object —
    # round 5's full result outgrew that window (BENCH_r05.json
    # "parsed": null), so the headline never reached the artifact.
    detail_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "artifacts")
    os.makedirs(detail_dir, exist_ok=True)
    detail_path = os.path.join(detail_dir, "bench_full.json")
    with open(detail_path, "w") as f:
        json.dump(result, f, indent=1)

    summary = {
        "metric": result["metric"],
        "value": result["value"],
        "unit": result["unit"],
        "turns_per_sec": result["turns_per_sec"],
        "sf": result["sf"],
        "n_turns": n_turns,
        "queries": queries_warm,
        "detail": "artifacts/bench_full.json",
    }
    if scaling:
        summary["efficiency_nx4"] = scaling["efficiency_nx4"]
        summary["efficiency_framework_relative"] = (
            scaling["efficiency_framework_relative"]
        )
        summary["cores"] = [scaling["cores_low"], scaling["cores_high"]]
    # hard size guard: the whole final line must fit inside the
    # driver's stdout tail window with margin. If the per-query map
    # ever outgrows it, keep only the slowest 20 (full map is in the
    # detail file either way).
    if len(json.dumps(summary)) > 1800:
        summary["queries"] = dict(sorted(queries_warm.items(),
                                         key=lambda kv: -kv[1])[:20])
        summary["queries_truncated_to_slowest"] = 20
    line = json.dumps(summary)
    assert len(line) <= 1900, len(line)
    print(line)


if __name__ == "__main__":
    main()
