"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes the engine's operator surface (SURVEY.md §2 plus
the training-data operators); ``oracle_sql()`` gives the DuckDB-
equivalent ANSI SQL for every operator. Every hash in the dedup /
similarity family is md5-derived precisely so the oracle can
reconstruct it bit-for-bit (minhash affine rehashes, simhash bit
votes, LSH hyperplanes, the media fake-decoder dims, the quantized
k-means centroid sums). EVERY query has an exact oracle — round 3
closed the last rows-only entry (nlp_summary: the corpus provably
yields one sentence per article, and nlp_sentence_scores hash-checks
the scoring math itself on sentence-rich derived text). The
extraction kernel itself IS oracle-checked because the synthetic page
generator (newspaper_spark/sources/transcripts.py) makes its output
reconstructable in SQL.
"""
from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

SF0001 = "/root/testdata/sf0.001"

# constants mirrored from newspaper_spark.sources.transcripts
PARA_LEAD = "It was also noted that there is more to be said about this: "
TURNS_PER_CONV = 4

_STOPS_SMALL = ["the", "and", "is", "a", "of", "to", "in"]


def _spread(df, spark):
    """The sf test tables are single small parquet files → ONE input
    split, which serializes every downstream stage no matter how many
    cores exist. Spread to the session's parallelism; a no-op on real
    multi-file tables (at 100 TB inputs arrive with thousands of
    splits). Row content is unchanged, so oracle hashes are unaffected."""
    p = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < p:
        return df.repartition(p)
    return df


def _transcripts(spark, sf_dir):
    from newspaper_spark.sources.transcripts import synthetic_transcripts

    return _spread(synthetic_transcripts(spark, sf_dir), spark)


def _docs(spark, sf_dir):
    from newspaper_spark.sources.transcripts import load_table

    return _spread(load_table(spark, sf_dir, "documents"), spark)


def _synth_url_expr():
    """The deterministic article-URL Column over a documents relation."""
    path = (
        F.when(F.col("doc_id") % 5 == 0, F.concat(F.lit("/news/story/item-"), F.col("doc_id"), F.lit(".html")))
        .when(F.col("doc_id") % 5 == 1, F.concat(F.lit("/2014/12/30/breaking-topic-every-word-here-"), F.col("doc_id")))
        .when(F.col("doc_id") % 5 == 2, F.concat(F.lit("/about.html")))
        .when(F.col("doc_id") % 5 == 3, F.concat(F.lit("/gallery/video/clip-"), F.col("doc_id"), F.lit(".mp4")))
        .otherwise(F.concat(F.lit("/tag-one-two-three-four-five-"), F.col("doc_id")))
    )
    return F.concat(
        F.lit("http://site"), (F.col("doc_id") % 7).cast("string"), F.lit(".com"), path
    )


def _synth_urls(spark, sf_dir):
    """Deterministic article-URL universe derived from documents."""
    return _docs(spark, sf_dir).select(
        F.col("doc_id"), _synth_url_expr().alias("url")
    )


def _synth_urls_with(spark, sf_dir, *extra_cols):
    """_synth_urls plus additional documents columns, as ONE projection
    — the former spelling joined _synth_urls back to documents on
    doc_id, an identity equi-join (doc_id is the table's unique key)
    that cost a full shuffle/broadcast for nothing."""
    return _docs(spark, sf_dir).select(*extra_cols, _synth_url_expr().alias("url"))


_SYNTH_URL_SQL = """
    SELECT doc_id,
           'http://site' || (doc_id % 7)::VARCHAR || '.com' ||
           CASE doc_id % 5
             WHEN 0 THEN '/news/story/item-' || doc_id::VARCHAR || '.html'
             WHEN 1 THEN '/2014/12/30/breaking-topic-every-word-here-' || doc_id::VARCHAR
             WHEN 2 THEN '/about.html'
             WHEN 3 THEN '/gallery/video/clip-' || doc_id::VARCHAR || '.mp4'
             ELSE '/tag-one-two-three-four-five-' || doc_id::VARCHAR
           END AS url
    FROM documents
"""


# ---------------------------------------------------------------------------
# entry
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: transcripts → per-turn extraction, stable ordering."""
    from newspaper_spark.operators.extract import extract_articles

    transcripts = _transcripts(spark, SF0001)
    out = extract_articles(transcripts)
    return out.select(
        "conv_id", "turn_idx", "title", "text", "authors", "publish_date",
        "meta_site_name", "status",
    ).orderBy("conv_id", "turn_idx")


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def q_transcripts(spark, sf_dir):
    return _transcripts(spark, sf_dir).select(
        "conv_id", "turn_idx", "role", "tool", "ts"
    )


def q_extract_fulltext(spark, sf_dir):
    from newspaper_spark.operators.extract import extract_articles

    t = _transcripts(spark, sf_dir)
    out = extract_articles(t)
    return out.select("conv_id", "turn_idx", F.col("text").alias("extracted_text"))


def q_extract_title(spark, sf_dir):
    from newspaper_spark.operators.extract import extract_articles

    out = extract_articles(_transcripts(spark, sf_dir))
    return out.select("conv_id", "turn_idx", "title")


def q_extract_meta(spark, sf_dir):
    from newspaper_spark.operators.extract import extract_articles

    out = extract_articles(_transcripts(spark, sf_dir))
    return out.select(
        "conv_id",
        "turn_idx",
        "meta_site_name",
        F.element_at("authors", 1).alias("author1"),
        "publish_date",
        "meta_lang",
    )


def q_stopword_count(spark, sf_dir):
    from newspaper_spark.functions.columns import stopword_count_col, word_count_col

    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        stopword_count_col(F.col("text"), _STOPS_SMALL).alias("n_stop"),
        word_count_col(F.col("text")).alias("n_words"),
    )


def q_inner_trim(spark, sf_dir):
    from newspaper_spark.functions.columns import inner_trim_col

    d = _docs(spark, sf_dir)
    messy = F.concat(F.lit("  "), F.col("text"), F.lit(" \t junk\ttail  "))
    return d.select("doc_id", inner_trim_col(messy).alias("trimmed"))


def q_valid_url(spark, sf_dir):
    from newspaper_spark.operators.urlops import valid_url_udf

    u = _synth_urls(spark, sf_dir)
    return u.select("doc_id", "url", valid_url_udf(F.col("url")).alias("is_valid"))


def q_url_filetype(spark, sf_dir):
    from newspaper_spark.functions.columns import url_filetype_col

    u = _synth_urls(spark, sf_dir)
    return u.select("doc_id", url_filetype_col(F.col("url")).alias("filetype"))


def q_is_media_news(spark, sf_dir):
    from newspaper_spark.functions.columns import is_media_news_col

    u = _synth_urls(spark, sf_dir)
    return u.select("doc_id", is_media_news_col(F.col("url")).alias("is_media"))


def q_is_valid_body(spark, sf_dir):
    from newspaper_spark.functions.columns import is_valid_body_col

    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        is_valid_body_col(
            F.col("text"),
            F.lit("Some Valid Title Here"),
            F.lit("article"),
            F.col("text"),
        ).alias("valid_body"),
    )


def q_truncations(spark, sf_dir):
    from newspaper_spark.functions.columns import truncate_text, truncate_title

    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        truncate_title(F.col("text")).alias("t200"),
        F.length(truncate_text(F.col("text"))).alias("len_t"),
    )


def q_dedup_exact(spark, sf_dir):
    from newspaper_spark.operators.dedup import dedup_exact

    return dedup_exact(_docs(spark, sf_dir)).orderBy("doc_id")


def q_anti_join_seen(spark, sf_dir):
    d = _docs(spark, sf_dir)
    seen = d.filter(F.col("doc_id") % 10 == 0).select("doc_id")
    return d.join(F.broadcast(seen), "doc_id", "left_anti").select("doc_id", "source")


def q_limit_per_source(spark, sf_dir):
    d = _docs(spark, sf_dir)
    w = Window.partitionBy("source").orderBy("doc_id")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("doc_id", "source", "rn")
    )


def q_keywords_topk(spark, sf_dir):
    """nlp.py:119-150 cross-doc analog: top-10 terms per doc by
    (freq, word) desc."""
    d = _docs(spark, sf_dir)
    toks = d.select(
        "doc_id", F.explode(F.split(F.lower(F.col("text")), " ")).alias("w")
    ).filter(F.col("w") != "")
    freq = toks.groupBy("doc_id", "w").agg(F.count("*").alias("freq"))
    w10 = Window.partitionBy("doc_id").orderBy(F.desc("freq"), F.desc("w"))
    return (
        freq.withColumn("rank", F.row_number().over(w10))
        .filter(F.col("rank") <= 10)
        .select("doc_id", "w", "freq", "rank")
    )


def q_domain_counters(spark, sf_dir):
    u = _synth_urls(spark, sf_dir)
    dom = F.regexp_extract("url", r"^http://([^/]+)/", 1)
    w = Window.partitionBy(dom).orderBy("doc_id")
    return u.select(
        "doc_id", dom.alias("domain"), F.row_number().over(w).alias("n_in_domain")
    )


def q_minhash_pairs(spark, sf_dir):
    from newspaper_spark.operators.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(
        _docs(spark, sf_dir), num_hashes=8, bands=4
    ).orderBy("id_a", "id_b")


def q_sample_stratified(spark, sf_dir):
    """Deterministic per-language stratified sampling: keep iff
    md5-hash(doc_id)/2^32 < rate[lang] — reproducible, repartition-
    stable, single map-side filter (no per-stratum count jobs), and
    bit-reconstructable in SQL."""
    from newspaper_spark.operators.sampling import sample_stratified

    d = _docs(spark, sf_dir)
    rates = {"en": 0.5, "zh": 0.25, "es": 0.25, "de": 0.25, "fr": 0.25}
    return sample_stratified(
        d.select("doc_id", "lang"), "lang", rates, key_col="doc_id"
    )


def q_dedup_clusters(spark, sf_dir):
    """Near-dup CLUSTERING: connected components over the minhash-LSH
    pair graph (min-label propagation, driver loop = one O(1) aggregate
    per round), every document assigned its cluster's min-id
    representative + cluster size; singletons rep=self. The step a real
    dedup pipeline runs after pair generation to pick keepers."""
    from newspaper_spark.operators.dedup import (
        connected_components,
        minhash_lsh_pairs,
    )

    d = _docs(spark, sf_dir)
    pairs = minhash_lsh_pairs(d, num_hashes=8, bands=4)
    nodes = d.select(F.col("doc_id").alias("id"))
    comp = connected_components(pairs, nodes=nodes)
    sizes = comp.groupBy("rep").agg(F.count("*").alias("cluster_size"))
    return comp.join(sizes, "rep").select("id", "rep", "cluster_size")


def q_ngram_jaccard(spark, sf_dir):
    from newspaper_spark.operators.dedup import minhash_lsh_pairs, ngram_jaccard_pairs

    d = _docs(spark, sf_dir)
    pairs = minhash_lsh_pairs(d, num_hashes=8, bands=4)
    return ngram_jaccard_pairs(d, pairs, threshold=0.5).orderBy("id_a", "id_b")


def q_simhash(spark, sf_dir):
    from newspaper_spark.operators.dedup import simhash_table

    d = _docs(spark, sf_dir)
    return simhash_table(d).select(
        F.col("id").alias("doc_id"), F.col("sim").alias("simhash")
    )


def q_simhash_near_dups(spark, sf_dir):
    from newspaper_spark.operators.dedup import simhash_near_dups

    return simhash_near_dups(_docs(spark, sf_dir), max_hamming=8)


def q_ann_topk(spark, sf_dir):
    from newspaper_spark.operators.similarity import brute_force_topk
    from newspaper_spark.sources.transcripts import load_table

    emb = _spread(load_table(spark, sf_dir, "embeddings"), spark)
    emb_d = emb.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    queries_df = emb_d.filter(F.col("vec_id") % 50 == 0)
    return brute_force_topk(queries_df, emb_d, k=5).select(
        "query_id", "neighbor_id", "rank"
    )


EMB_DIM = 64  # embeddings.parquet vector length (TESTDATA.md)


def q_ann_lsh(spark, sf_dir):
    from newspaper_spark.operators.similarity import lsh_topk
    from newspaper_spark.sources.transcripts import load_table

    emb = _spread(load_table(spark, sf_dir, "embeddings"), spark)
    emb_d = emb.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    queries_df = emb_d.filter(F.col("vec_id") % 50 == 0)
    return lsh_topk(
        queries_df, emb_d, k=5, dim=EMB_DIM, n_planes=16, bands=4
    ).select("query_id", "neighbor_id", "rank")


def q_ann_ivf(spark, sf_dir):
    """IVF-flat ANN on TRAINED centroids: 2 rounds of distributed
    Lloyd's k-means (exact-integer quantized sums → bit-deterministic
    centroids the oracle reconstructs in SQL), then nearest-centroid
    cells, n_probe=2 query probing, exact cosine within probed cells."""
    from newspaper_spark.operators.similarity import ivf_topk, kmeans_train
    from newspaper_spark.sources.transcripts import load_table

    emb = _spread(load_table(spark, sf_dir, "embeddings"), spark)
    emb_d = emb.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    cents = kmeans_train(emb_d, dim=EMB_DIM, n_cells=16, n_iter=2)
    queries_df = emb_d.filter(F.col("vec_id") % 50 == 0)
    return ivf_topk(
        queries_df, emb_d, k=5, dim=EMB_DIM, n_cells=16, n_probe=2,
        centroids=cents,
    ).select("query_id", "neighbor_id", "rank")


def _aug_embeddings(spark, sf_dir):
    """Embeddings table + deterministic perturbed copies of every 25th
    vector: the synthetic embeddings carry no true near-dups (max
    pairwise cosine ≈ 0.48), so these seeded copies are the real
    positives — mirrored exactly in the oracle SQL."""
    from newspaper_spark.sources.transcripts import load_table

    emb = _spread(load_table(spark, sf_dir, "embeddings"), spark)
    emb_d = emb.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    pert = F.concat(
        F.array(F.element_at("embedding", 1) * 1.2 + 0.01),
        F.slice("embedding", 2, EMB_DIM - 1),
    )
    dups = emb_d.filter(F.col("vec_id") % 25 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"), pert.alias("embedding")
    )
    return emb_d.unionByName(dups)


def q_embedding_dedup(spark, sf_dir):
    from newspaper_spark.operators.similarity import embedding_dedup_pairs

    aug = _aug_embeddings(spark, sf_dir)
    # 32 planes in 4 bands of 8 bits: at threshold 0.9 the per-bit
    # agreement of a true pair is ≥0.95, so any-band recall stays ~0.99,
    # while random-pair band collisions drop 2^-4 → 2^-8 per band
    # (22.8% → 1.55% of random pairs) — measured 2.6× faster at sf0.1
    # with the identical 80-pair result. ann_lsh keeps 4-bit bands: its
    # moderate-cosine top-k neighbors NEED the high-collision regime.
    return embedding_dedup_pairs(
        aug, threshold=0.9, dim=EMB_DIM, n_planes=32, bands=4
    )


def q_semantic_clusters(spark, sf_dir):
    """SemDeDup-style semantic duplicate CLUSTERS: exact-cosine-verified
    embedding near-dup pairs (embedding_dedup's banded LSH + verify)
    fed into connected components — every vector labeled with its
    cluster's min-id representative + cluster size, singletons
    rep=self. The oracle recomputes the closure with a recursive CTE
    over the identically reconstructed pair relation."""
    from newspaper_spark.operators.dedup import connected_components
    from newspaper_spark.operators.similarity import embedding_dedup_pairs

    aug = _aug_embeddings(spark, sf_dir)
    pairs = embedding_dedup_pairs(
        aug, threshold=0.9, dim=EMB_DIM, n_planes=32, bands=4
    ).select("id_a", "id_b")
    nodes = aug.select(F.col("vec_id").alias("id"))
    comp = connected_components(pairs, nodes=nodes)
    sizes = comp.groupBy("rep").agg(F.count("*").alias("cluster_size"))
    return comp.join(sizes, "rep").select("id", "rep", "cluster_size")


def q_lang_id(spark, sf_dir):
    from newspaper_spark.operators.textstats import lang_id_col

    d = _docs(spark, sf_dir)
    return d.select("doc_id", "lang", lang_id_col(F.col("text")).alias("lang_id"))


def q_bpe_tokens(spark, sf_dir):
    """Token counting both ways (whitespace + BPE-ish sub-word
    estimate via the pre-tokenizer regex)."""
    from newspaper_spark.operators.textstats import (
        bpe_ish_token_count_col,
        token_count_col,
    )

    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        token_count_col(F.col("text")).alias("n_ws_tokens"),
        bpe_ish_token_count_col(F.col("text")).alias("n_bpe_tokens"),
    )


def q_quality(spark, sf_dir):
    from newspaper_spark.operators.textstats import quality_score_col, token_count_col

    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        token_count_col(F.col("text")).alias("n_tokens"),
        quality_score_col(F.col("text")).alias("quality"),
    )


def q_pii_scrub(spark, sf_dir):
    """PII redaction (operators/pii.py). The synthetic corpus carries no
    PII, so a deterministic email / IPv4 / phone suffix derived from
    doc_id is appended first — the scrub and the counts then exercise
    every pattern on every row. Counts are taken on the (augmented)
    original text; scrub order is email → IPv4 → phone."""
    from newspaper_spark.operators.pii import pii_scrub

    d = _docs(spark, sf_dir)
    aug = F.concat(
        F.col("text"),
        F.lit(" Contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com via 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit("."),
        ((F.col("doc_id") * 7) % 256).cast("string"),
        F.lit(" or +1 (555) 010-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    return pii_scrub(d.select("doc_id", aug.alias("text")))


def q_repetition(spark, sf_dir):
    """Gopher-style within-doc repetition signals (textstats.
    repetition_stats): TTR, duplicate-bigram fraction, top-bigram
    coverage."""
    from newspaper_spark.operators.textstats import repetition_stats

    d = _docs(spark, sf_dir)
    return repetition_stats(d.select("doc_id", "text"))


#: shared boilerplate tail for the span-dedup driver query — the
#: synthetic corpus has no cross-document sentence repetition, so a
#: realistic newsletter tail is appended to EVERY doc; C4 span dedup
#: must then strip it everywhere except the canonical (min doc_id)
#: occurrence. Mirrored verbatim in the oracle SQL.
_BOILERPLATE_TAIL = (
    ". Subscribe to our newsletter"
    ". Read more stories here"
    ". Terms of service apply"
)


def q_span_dedup(spark, sf_dir):
    """C4-style duplicate three-sentence-span removal
    (operators/span_dedup.py) over the boilerplate-augmented corpus."""
    from newspaper_spark.operators.span_dedup import span_dedup

    d = _docs(spark, sf_dir)
    aug = d.select(
        "doc_id", F.concat(F.col("text"), F.lit(_BOILERPLATE_TAIL)).alias("text")
    )
    return span_dedup(aug, span=3)


#: ≥8-token boilerplate tail for the ExactSubstr driver query: appended
#: to EVERY doc so the fully-inside-tail 8-token windows are duplicated
#: corpus-wide (canonical = min doc_id keeps its copy), while windows
#: straddling the body→tail boundary stay unique per doc and must
#: survive. Mirrored verbatim in the oracle SQL.
_ES_TAIL = (
    " Follow us on social media for breaking updates every single day"
)


def q_exact_substr(spark, sf_dir):
    """ExactSubstr duplicated-8-token-window removal (Lee et al. 2021;
    operators/span_dedup.exact_substring_dedup) over the
    tail-augmented corpus — the token-level member of the span-dedup
    family (sentence spans = C4, paragraphs = MassiveText)."""
    from newspaper_spark.operators.span_dedup import exact_substring_dedup

    d = _docs(spark, sf_dir)
    aug = d.select(
        "doc_id", F.concat(F.col("text"), F.lit(_ES_TAIL)).alias("text")
    )
    return exact_substring_dedup(aug, k=8)


def q_stupid_backoff(spark, sf_dir):
    """Stupid-Backoff bigram LM scoring (Brants et al. 2007;
    textstats.bigram_backoff_logprob): model trained on the even-doc_id
    split, every document scored — held-out docs exercise the α=0.4
    unigram-backoff path on their unseen bigrams. The bigram upgrade
    of unigram_logprob (CCNet's KenLM analog family)."""
    from newspaper_spark.operators.textstats import bigram_backoff_logprob

    d = _docs(spark, sf_dir)
    train = d.filter(F.col("doc_id") % 2 == 0)
    return bigram_backoff_logprob(d, train)


def q_warc_records(spark, sf_dir):
    """WARC archive read (sources/warc.py) — the Common Crawl input
    format every web-scale pipeline starts from. Each document is
    wrapped in a REAL WARC 1.0 ``response`` record (version line →
    headers → HTTP/1.1 200 block, octet-exact Content-Lengths),
    records are concatenated 8-to-a-file behind a leading ``warcinfo``
    record, and the Content-Length-walking mapInPandas parser
    (delimiter-bomb-safe, obs-fold aware, framing-fault error channel)
    reads every record back. The oracle reconstructs the expected
    record relation ARITHMETICALLY from the deterministic construction
    (the media_decode_jpeg pattern) — record identity, per-file
    rec_idx ordering, and the octet-exact Content-Length of the
    assembled HTTP block."""
    from newspaper_spark.sources.warc import (
        parse_warc_files,
        warc_response_record_col,
        warcinfo_record_col,
    )

    d = _docs(spark, sf_dir).select(
        "doc_id", F.coalesce(F.col("text"), F.lit("")).alias("body")
    )
    rec = warc_response_record_col(
        F.concat(
            F.lit("http://site"),
            (F.col("doc_id") % 7).cast("string"),
            F.lit(".com/doc/"),
            F.col("doc_id").cast("string"),
        ),
        F.concat(
            F.lit("2026-01-"),
            F.lpad((F.col("doc_id") % 28 + 1).cast("string"), 2, "0"),
            F.lit("T00:00:00Z"),
        ),
        F.concat(
            F.lit("<urn:uuid:"),
            F.md5(F.col("doc_id").cast("string")),
            F.lit(">"),
        ),
        F.col("body"),
    )
    files = (
        d.select(
            F.expr("CAST(doc_id DIV 8 AS BIGINT)").alias("file_id"),
            F.col("doc_id"),
            rec.alias("r"),
        )
        .groupBy("file_id")
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("doc_id", "r"))),
                    lambda x: x["r"],
                ),
            ).alias("recs")
        )
        .select(
            "file_id",
            F.concat(
                warcinfo_record_col(
                    F.concat(
                        F.lit("<urn:uuid:"),
                        F.md5(
                            F.concat(
                                F.lit("info"), F.col("file_id").cast("string")
                            )
                        ),
                        F.lit(">"),
                    ),
                    F.lit("2026-01-01T00:00:00Z"),
                ),
                F.col("recs"),
            ).alias("warc"),
        )
    )
    return parse_warc_files(files)


def q_kmv_distinct(spark, sf_dir):
    """KMV distinct-count sketch (dedup.kmv_distinct, Bar-Yossef et
    al. 2002) — the cardinality pre-estimate a 100 TB dedup plan runs
    before committing to the full shuffle. Per-source URL sketches
    (25 distinct/source at sf0.01 < k=64 → the exact small-range
    path) plus one global '__ALL__' sketch (500 > k → the real
    (k−1)·2^60/h_k estimator fires). md5-derived hashes and one IEEE
    double division make the sketch bit-deterministic; the oracle
    replays hashes, the rank-≤-k window, and the estimate exactly."""
    from newspaper_spark.operators.dedup import kmv_distinct

    # url and source both derive from the documents table and doc_id is
    # its unique key, so the former u ⋈ docs equi-join is an identity —
    # one projection replaces a full join (round 8; result unchanged)
    v = _synth_urls_with(spark, sf_dir, "source")
    per_source = kmv_distinct(v, "url", group_col="source", k=64)
    overall = kmv_distinct(v, "url", group_col=None, k=64).select(
        F.lit("__ALL__").alias("source"),
        "n_hashes",
        "kth_min_hash",
        "est_distinct",
    )
    return per_source.unionByName(overall)


def q_heavy_hitters(spark, sf_dir):
    """Count-Min heavy hitters (operators/sketches.py, Cormode &
    Muthukrishnan 2005) — the frequency sketch a 100 TB stopword /
    blocklist pass runs instead of an exact global per-token count.
    Stream = the documents' whitespace tokens plus one planted rare
    token per doc ('tok-r{doc_id%211}', so the candidate relation is
    ~8x the heavy set and the CMS actually separates). depth=3,
    width=64 — narrow on purpose so collisions OCCUR at sf0.01 and
    the min-over-rows estimate visibly overestimates while never
    underestimating; the data-relative threshold (stream/30,
    total_div=30) rides in as a broadcast single-row join derived from
    the one persisted per-token count relation — ONE pass over the
    raw stream total, no driver collect. The oracle replays counters,
    min-probe, threshold, and the exact verify."""
    from newspaper_spark.operators.sketches import cms_heavy_hitters

    d = _docs(spark, sf_dir)
    toks = d.select(
        F.explode(F.split(F.col("text"), " ")).alias("tok")
    ).unionAll(
        d.select(
            F.concat(
                F.lit("tok-r"), (F.col("doc_id") % 211).cast("string")
            ).alias("tok")
        )
    )
    return cms_heavy_hitters(toks, "tok", depth=3, width=64, total_div=30)


def q_hll_distinct(spark, sf_dir):
    """HyperLogLog cardinality sketch (operators/sketches.py,
    Flajolet et al. 2007) over the synthetic URL universe — the
    constant-memory complement to kmv_distinct (m registers per group
    vs k exact hashes): per-source sketches land in the small-range
    regime (25 distinct « m=64, flagged honestly instead of silently
    ln()-corrected — see the module docstring on cross-engine
    transcendentals) while the global '__ALL__' sketch (500 distinct)
    exercises the real harmonic-mean estimator. Scaled-integer
    register sum + one IEEE double division = bit-deterministic; the
    oracle replays buckets, rho from length(bin(rem)), the register
    max, and the estimate exactly."""
    from newspaper_spark.operators.sketches import hll_distinct

    # projection instead of the identity self-join — see q_kmv_distinct
    v = _synth_urls_with(spark, sf_dir, "source")
    per_source = hll_distinct(v, "url", group_col="source", p=6)
    overall = hll_distinct(v, "url", group_col=None, p=6).select(
        F.lit("__ALL__").alias("source"),
        "n_zero_buckets",
        "sum_scaled",
        "est_raw",
        "small_range",
    )
    return per_source.unionByName(overall)


def q_pagerank(spark, sf_dir):
    """Integer-exact damped PageRank (operators/graph.py) over a
    deterministic 3-outlink graph on the document ids (dst = (2d+1),
    (3d+2), (7d+5) mod N; self-loops dropped, duplicates collapse) —
    the link-authority primitive crawl prioritization and domain-
    quality priors use (Common Crawl ships host-level ranks for
    exactly this). Scaled-integer arithmetic with truncating division
    makes all 3 iterations bit-deterministic and order-free; the
    oracle unrolls them relationally. Completes the iterative-
    algorithm family next to dedup_clusters (connected components)."""
    from newspaper_spark.operators.graph import pagerank_int

    d = _docs(spark, sf_dir).select("doc_id")
    nn = d.agg(F.count("*").cast("long").alias("n"))
    e = (
        d.crossJoin(F.broadcast(nn))
        .select(
            F.col("doc_id").alias("src"),
            F.explode(
                F.array(
                    (F.col("doc_id") * 2 + 1) % F.col("n"),
                    (F.col("doc_id") * 3 + 2) % F.col("n"),
                    (F.col("doc_id") * 7 + 5) % F.col("n"),
                )
            ).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
    )
    return pagerank_int(e, iterations=3)


def q_tokenize_pack(spark, sf_dir):
    """Training-batch prep composition: REAL BPE train (8 merges, the
    bpe_vocab table) → doc-level encode (distinct words segmented once
    and broadcast back; raw text never shuffles) → GPT-style sequence
    packing of the BPE token counts via the two-level distributed
    prefix sum (pack_offsets, seq_len=256). This is the step between a
    prepped corpus and a training run: every doc gets its global token
    offset and the sequence window [start_seq, +n_seqs) it occupies.
    The encode relation is persisted — it feeds BOTH the packing
    branch and the n_words join-back, the multi-consumer recompute
    pattern this round's perf audit established. The oracle wraps the
    full 8-round merge replay in a prefix-sum window."""
    from newspaper_spark import cache
    from newspaper_spark.operators.bpe import (
        bpe_encode_docs,
        bpe_train,
        bpe_word_counts,
    )
    from newspaper_spark.operators.packing import pack_offsets

    d = _docs(spark, sf_dir).select("doc_id", "text")
    # Round-8 shared-scan audit: a persisted per-(doc, word) relation
    # feeding both the trainer and the encoder was probed and measured
    # NEGATIVE (executor CPU 20.4 s → 32-33 s over 3 stable probes) —
    # the duplicate explode is cheap scan-fused codegen while the
    # shared relation adds a cache write + an extra 155k-row shuffle.
    # Kept as-is on the r7 dclm lesson: the probe, not the pattern,
    # decides.
    merges = bpe_train(bpe_word_counts(d), 8)
    enc = cache.track(bpe_encode_docs(d, merges).persist())
    packed = pack_offsets(
        enc, id_col="doc_id", count_col="n_bpe_tokens", seq_len=256
    )
    return packed.join(enc.select("doc_id", "n_words"), "doc_id").select(
        "doc_id", "n_words", "n_bpe_tokens", "offset",
        "start_seq", "start_pos", "n_seqs",
    )


def q_sitemap_urls(spark, sf_dir):
    """Sitemap-protocol crawl discovery (feeds.parse_sitemaps) — the
    channel robots.txt's ``Sitemap:`` directive points at, completing
    the crawl-side source family (feeds → robots → sitemap →
    frontier). Seven per-host ``<urlset>`` documents are Column-
    assembled from the synthetic URL universe (entries in doc_id
    order, literal-text lastmod/changefreq/priority), an eighth site
    carries a ``<sitemapindex>`` over the seven hosts (kind='index'),
    and a ninth carries a DOCTYPE (the billion-laughs rejection
    channel fires → one 'dtd-rejected' error row). The oracle
    reconstructs every row arithmetically from the URL construction;
    the parse itself is a REAL stdlib ElementTree walk."""
    from newspaper_spark.operators.feeds import parse_sitemaps

    u = _synth_urls(spark, sf_dir)
    ent = F.concat(
        F.lit("<url><loc>"),
        F.col("url"),
        F.lit("</loc><lastmod>2026-02-"),
        F.lpad((F.col("doc_id") % 28 + 1).cast("string"), 2, "0"),
        F.lit("</lastmod><changefreq>daily</changefreq><priority>0."),
        (F.col("doc_id") % 9 + 1).cast("string"),
        F.lit("</priority></url>"),
    )
    sets_ = (
        u.select(
            (F.col("doc_id") % 7).alias("site_id"), F.col("doc_id"), ent.alias("e")
        )
        .groupBy("site_id")
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("doc_id", "e"))),
                    lambda x: x["e"],
                ),
            ).alias("body")
        )
        .select(
            "site_id",
            F.concat(
                F.lit(
                    '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
                ),
                F.col("body"),
                F.lit("</urlset>"),
            ).alias("xml"),
        )
    )
    idx_xml = (
        '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        + "".join(
            f"<sitemap><loc>http://site{h}.com/sitemap.xml</loc>"
            f"<lastmod>2026-01-01</lastmod></sitemap>"
            for h in range(7)
        )
        + "</sitemapindex>"
    )
    dtd_xml = (
        '<!DOCTYPE urlset [<!ENTITY x "y">]>'
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        "<url><loc>http://x</loc></url></urlset>"
    )
    extra = spark.createDataFrame(
        [(7, idx_xml), (8, dtd_xml)], "site_id long, xml string"
    )
    return parse_sitemaps(sets_.unionByName(extra))


def q_dclm_prep(spark, sf_dir):
    """DCLM-Baseline-style corpus prep composition (Li et al. 2024):
    Gopher heuristic rules → exact dedup among survivors (min-id
    canonical) → TRAINED quality-classifier gate (the hashed-n-gram NB
    of quality_classifier, trained on the full labeled exemplar split
    — classifier training is independent of the filtering, as DCLM's
    fastText exemplars are) scored ONLY on canonical survivors (dedup
    before classify, the pipeline's cost order). Output = every doc
    with per-stage attribution flags (the c4_filters/crawl_prep
    pattern): gopher_keep, is_canonical, nb_logodds/pred_hq (null when
    unscored), kept = all three gates. The oracle replays the Gopher
    rule arithmetic, the md5 canonical-keep, and the NB count tables
    end to end.

    Input enrichment (mirrored in the oracle, the paragraph_dedup
    pattern — the raw synthetic vocabulary contains none of Gopher's 8
    stopwords, so every rule-gate verdict would be a constant False):
    doc_id%11==0 docs become one SHARED rule-passing page (dedup
    provably triggers, one canonical per corpus), doc_id%3==0 docs
    stay raw (fail the stopword rule), the rest get a stopword-bearing
    suffix (pass it) — all three gates genuinely discriminate."""
    from newspaper_spark.operators.dedup import dedup_exact
    from newspaper_spark.operators.filters import gopher_filters
    from newspaper_spark.operators.quality_nb import nb_quality_scores

    dup_page = F.repeat(
        F.lit("the quick brown fox and the lazy dog have a nap "), 6
    )
    d = _docs(spark, sf_dir).select(
        "doc_id",
        F.when(F.col("doc_id") % 11 == 0, dup_page)
        .when(F.col("doc_id") % 3 == 0, F.col("text"))
        .otherwise(
            F.concat(
                F.col("text"), F.lit(" the of and with have that to be")
            )
        )
        .alias("text"),
    )
    g = gopher_filters(d).select(
        "doc_id", F.col("keep").alias("gopher_keep")
    )
    # Shared-scan persist audit (round 7, VERDICT item 4) — measured
    # NEGATIVE, composition deliberately left persist-free: the four
    # consumers of `d` share only the parquet scan + this cheap Column
    # enrichment (each stage's heavy work — gopher rule exprs, the NB
    # n-gram explode — is distinct, so there is no redundant tokenize
    # pass to elide). 3×3 job_count_probe A/B at sf0.01: baseline CPU
    # median 5.71 s / 30 jobs; persist(d) 6.96 s (breaks scan→codegen
    # fusion); persist(survivors) 6.39 s. Numbers in BENCH.md round-7
    # audit table.
    survivors = d.join(
        g.filter(F.col("gopher_keep")).select("doc_id"), "doc_id"
    )
    reps = dedup_exact(survivors).select(
        "doc_id", F.lit(True).alias("is_canonical")
    )
    labeled = d.filter(F.col("doc_id") % 2 == 0).withColumn(
        "is_pos", F.col("doc_id") % 10 == 0
    )
    scored = nb_quality_scores(
        survivors.join(reps.select("doc_id"), "doc_id"),
        labeled,
        n_buckets=1024,
    ).select("doc_id", "nb_logodds", "pred_hq")
    return (
        d.select("doc_id")
        .join(g, "doc_id", "left")
        .join(reps, "doc_id", "left")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            "gopher_keep",
            F.coalesce("is_canonical", F.lit(False)).alias("is_canonical"),
            "nb_logodds",
            "pred_hq",
            (
                F.col("gopher_keep")
                & F.coalesce("is_canonical", F.lit(False))
                & F.coalesce("pred_hq", F.lit(False))
            ).alias("kept"),
        )
    )


def q_warc_extract(spark, sf_dir):
    """End-to-end Common-Crawl shape: synthetic transcript HTML pages
    wrapped into WARC response records (4-to-a-file behind a warcinfo
    record, identity planted in WARC-Target-URI), parsed back by the
    Content-Length-walking reader, identity recovered FROM the URI,
    and the payload pushed through the full extraction kernel — the
    archive-read → extract pipeline every CC-based corpus build runs.
    The oracle is extract_fulltext's relational reconstruction
    verbatim: the WARC wrap/parse must be byte-transparent for the
    hashes to match."""
    from newspaper_spark.operators.extract import extract_articles
    from newspaper_spark.sources.warc import (
        parse_warc_files,
        warc_response_record_col,
        warcinfo_record_col,
    )

    t = _transcripts(spark, sf_dir).select("conv_id", "turn_idx", "text")
    rec = warc_response_record_col(
        F.concat(
            F.lit("http://archive.example/"),
            F.col("conv_id"),
            F.lit("/turn/"),
            F.col("turn_idx").cast("string"),
        ),
        F.lit("2026-01-01T00:00:00Z"),
        F.concat(
            F.lit("<urn:uuid:"),
            F.md5(
                F.concat(
                    F.col("conv_id"), F.lit("#"), F.col("turn_idx").cast("string")
                )
            ),
            F.lit(">"),
        ),
        F.col("text"),
    )
    files = (
        t.select(
            F.regexp_extract(F.col("conv_id"), "-(\\d+)$", 1)
            .cast("long")
            .alias("file_id"),
            F.col("turn_idx"),
            rec.alias("r"),
        )
        .groupBy("file_id")
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("turn_idx", "r"))),
                    lambda x: x["r"],
                ),
            ).alias("recs")
        )
        .select(
            "file_id",
            F.concat(
                warcinfo_record_col(
                    F.concat(
                        F.lit("<urn:uuid:"),
                        F.md5(
                            F.concat(
                                F.lit("info"), F.col("file_id").cast("string")
                            )
                        ),
                        F.lit(">"),
                    ),
                    F.lit("2026-01-01T00:00:00Z"),
                ),
                F.col("recs"),
            ).alias("warc"),
        )
    )
    pages = (
        parse_warc_files(files)
        .filter(F.col("warc_type") == "response")
        .select(
            F.regexp_extract(
                F.col("target_uri"), "^http://archive\\.example/([^/]+)/turn/", 1
            ).alias("conv_id"),
            F.regexp_extract(F.col("target_uri"), "/turn/(\\d+)$", 1)
            .cast("int")
            .alias("turn_idx"),
            F.col("payload_text").alias("text"),
        )
    )
    # the per-file groupBy upstream leaves few (AQE-coalesced)
    # partitions; rebalance so the expensive Arrow extraction stage
    # uses every core (the bench pipeline's 4×cores load-balance rule)
    pages = pages.repartition(spark.sparkContext.defaultParallelism * 4)
    out = extract_articles(pages)
    return out.select(
        "conv_id", "turn_idx", F.col("text").alias("extracted_text")
    )


#: unicode suffixes for the normalization driver query (the corpus is
#: pure ASCII): doc_id % 4 picks one — 0: decomposed e+◌́ (composes),
#:  1: vertical tab + DEL (controls, stripped), 2: Hangul jamo pair
#: (composes to 가), 3: already-NFC text (no-op path). Spark CASE and
#: oracle CASE carry the SAME literals.
_NFC_SUFFIXES = [
    " caf\u0065\u0301",   # decomposed e + combining acute: composes to \u00e9
    " x\x0by\x7fz",        # VT + DEL: stripped by CONTROL_CLASS
    " \u1100\u1161",       # Hangul jamo pair: composes to U+AC00
    " caf\u00e9",           # already NFC: the no-op path
]


def q_media_probe(spark, sf_dir):
    """Header-only dimension probing (multimodal.probe_media_dims) over
    REAL container bytes assembled in Column expressions: JPEG (SOI +
    SOF0 scanned by the marker parser), GIF (logical screen), and a
    deliberate unknown container exercising the error channel. Dims
    derive from doc_id, so the oracle reproduces the parse output with
    pure arithmetic."""
    from newspaper_spark.operators.multimodal import probe_media_dims

    d = _docs(spark, sf_dir)
    w = (F.col("doc_id") % 240 + 16).cast("int")
    h = ((F.col("doc_id") * 3) % 240 + 16).cast("int")
    hx2 = lambda c: F.lpad(F.hex(c), 2, "0")  # noqa: E731  (values < 256)
    jpeg_hex = F.concat(
        F.lit("FFD8FFC0001108"),
        F.lit("00"), hx2(h), F.lit("00"), hx2(w),
        F.lit("03011100021100031100FFD9"),
    )
    gif_hex = F.concat(
        F.lit("474946383961"),          # 'GIF89a'
        hx2(w), F.lit("00"), hx2(h), F.lit("00"),  # little-endian w, h
        F.lit("000000"),                # packed/bg/aspect, no GCT
    )
    payload_hex = (
        F.when(F.col("doc_id") % 5 == 0, gif_hex)
        .when(F.col("doc_id") % 7 == 0, F.lit("52494646"))  # 'RIFF' junk
        .otherwise(jpeg_hex)
    )
    media = d.select(
        F.col("doc_id").cast("string").alias("media_id"),
        F.unhex(payload_hex).alias("payload"),
    )
    return probe_media_dims(media)


def q_dedup_report(spark, sf_dir):
    """Pipeline observability: per-source exact-duplicate statistics
    (docs, distinct fingerprints, dup docs, dup rate) — the audit
    table a production dedup job emits next to its output. Duplicates
    are injected on a deterministic doc_id slice (every 9th doc reuses
    the text of doc_id - doc_id % 9) so rates are non-trivial."""
    d = _docs(spark, sf_dir)
    base = d.select("doc_id", "source", "text").alias("b")
    canon = d.select(
        F.col("doc_id").alias("c_id"), F.col("text").alias("c_text")
    ).alias("c")
    aug = (
        base.withColumn("canon_id", F.col("doc_id") - F.col("doc_id") % 9)
        .join(canon, F.col("canon_id") == F.col("c_id"), "left")
        .select(
            "doc_id",
            "source",
            F.when(F.col("doc_id") % 9 != 0, F.col("c_text"))
            .otherwise(F.col("text"))
            .alias("text"),
        )
    )
    from newspaper_spark.operators.dedup import normalized_text

    fp = aug.select(
        "source",
        # the SAME canonical fingerprint the dedup operator produces —
        # the audit table must never drift from what it audits
        F.md5(normalized_text(F.col("text"))).alias("fingerprint"),
    )
    per_fp = fp.groupBy("source", "fingerprint").agg(
        F.count("*").cast("long").alias("cnt")
    )
    return per_fp.groupBy("source").agg(
        F.sum("cnt").cast("long").alias("n_docs"),
        F.count("*").cast("long").alias("n_distinct"),
        F.sum(F.when(F.col("cnt") > 1, F.col("cnt") - 1).otherwise(0))
        .cast("long")
        .alias("n_dup_docs"),
        (
            F.floor(
                (
                    F.sum(F.when(F.col("cnt") > 1, F.col("cnt") - 1).otherwise(0))
                    / F.sum("cnt")
                )
                * F.lit(1000000.0)
                + F.lit(0.5)
            )
            / F.lit(1000000.0)
        ).alias("dup_rate"),
    )


def q_source_mix(spark, sf_dir):
    """Data-mixing allocation (sampling.source_mix): per-source token
    budgets + sampling rates for a 50% corpus budget, weights derived
    deterministically from the source index (idx % 3 + 1)."""
    from newspaper_spark.operators.sampling import source_mix
    from newspaper_spark.operators.textstats import token_count_col

    d = _docs(spark, sf_dir)
    counted = d.select(
        "source",
        token_count_col(F.col("text")).cast("long").alias("n_tokens"),
        (F.substring("source", 4, 10).cast("long") % 3 + 1).alias("weight"),
    )
    return source_mix(counted)


def q_tfidf_topk(spark, sf_dir):
    """Corpus-aware TF-IDF top-5 terms per doc (textstats.tfidf_topk);
    rank order uses the rounded score so the cut is engine-portable."""
    from newspaper_spark.operators.textstats import tfidf_topk

    d = _docs(spark, sf_dir)
    return tfidf_topk(d.select("doc_id", "text"), k=5)


def q_pack_offsets(spark, sf_dir):
    """GPT-style sequence packing (operators/packing.py): global token
    offsets by distributed prefix sum over id order, spans of
    256-token packed sequences."""
    from newspaper_spark.operators.packing import pack_offsets
    from newspaper_spark.operators.textstats import token_count_col

    d = _docs(spark, sf_dir)
    counted = d.select(
        "doc_id", token_count_col(F.col("text")).cast("long").alias("n_tokens")
    )
    return pack_offsets(counted, seq_len=256)


def q_shard_assign(spark, sf_dir):
    """Deterministic global training-order shuffle + token-capacity
    sharding (packing.shard_assign) — the randomize-then-shard step
    between corpus prep and the packed writer. The permutation key is
    md5-derived (reproducible from the seed, stable under task
    retries, identical in DuckDB), offsets ride the same two-level
    distributed prefix sum as pack_offsets but in (shuffle_key, id)
    order, and shard membership is the greedy document-boundary rule
    offset div 4096. The oracle replays the permutation, the running
    window, and the per-shard rank exactly."""
    from newspaper_spark.operators.packing import shard_assign
    from newspaper_spark.operators.textstats import token_count_col

    d = _docs(spark, sf_dir)
    counted = d.select(
        "doc_id", token_count_col(F.col("text")).cast("long").alias("n_tokens")
    )
    return shard_assign(counted, shard_tokens=4096, seed="shard")


def q_pmi_collocations(spark, sf_dir):
    """Adjacent-bigram PMI collocations (textstats.pmi_collocations,
    Church & Hanks 1990). The synthetic vocabulary is ~31 uniformly
    mixed words (every bigram PMI ≈ 0 — nothing to mine), so the query
    plants association structure the way dclm_prep enriches its input:
    'neural network' (always adjacent, 2× on every doc_id%3==0 doc —
    strong collocation), 'gradient descent' on doc_id%7==0 (moderate
    count, perfect association), and 'common w{doc_id%13}' on EVERY
    doc ('common' pairs with 13 different right words — high count,
    LOW association, the frequency≠association case PMI exists to
    separate). min_count=5, top_k=50 with the 6dp-rounded
    deterministic boundary. The oracle replays tokenization, bigram
    slots, marginals, and the rounded top-k cut."""
    from newspaper_spark.operators.textstats import pmi_collocations

    d = _docs(spark, sf_dir)
    enriched = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.lit(" neural network neural network"),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 7 == 0, F.lit(" gradient descent")
            ).otherwise(F.lit("")),
            F.concat(F.lit(" common w"), (F.col("doc_id") % 13).cast("string")),
        ).alias("text"),
    )
    return pmi_collocations(enriched, min_count=5, top_k=50)


def q_chunk_text(spark, sf_dir):
    """Sliding-window token chunking (operators/chunking.py) — the
    RAG/embedding prep step: 32-token windows, stride 24 (8-token
    overlap), each chunk carrying its global token offset so
    similarity hits map back into the doc. Map-only, ZERO shuffles;
    the 1 + ceil(max(n-c,0)/s) window rule, the offsets, and the
    joined window text are pure integer arithmetic + slicing, replayed
    exactly by the oracle (no floats anywhere)."""
    from newspaper_spark.operators.chunking import chunk_text

    return chunk_text(
        _docs(spark, sf_dir), chunk_tokens=32, stride=24
    )


def q_triangle_count(spark, sf_dir):
    """Per-node triangle counts (graph.triangle_count) via degree-
    ordered edge orientation (Suri & Vassilvitskii 2011) — wedge
    fan-out bounded by oriented out-degree O(sqrt E), every triangle
    counted once at its minimum-rank vertex, all-integer output.
    Graph = pagerank's deterministic 3-outlink relation treated
    undirected, plus a planted ~6-node clique on doc_id % (n div 6)
    == 3 (the modulus scales with n, so clique size — and the planted
    edge count — stays CONSTANT at any sf; its build is a broadcast
    self-join of those ~6 rows). The oracle counts triangles
    implementation-independently: the id-ordered triple join over the
    canonical a<b edge set."""
    from newspaper_spark.operators.graph import triangle_count

    d = _docs(spark, sf_dir).select("doc_id")
    nn = d.agg(F.count("*").cast("long").alias("n"))
    e = (
        d.crossJoin(F.broadcast(nn))
        .select(
            F.col("doc_id").alias("src"),
            F.explode(
                F.array(
                    (F.col("doc_id") * 2 + 1) % F.col("n"),
                    (F.col("doc_id") * 3 + 2) % F.col("n"),
                    (F.col("doc_id") * 7 + 5) % F.col("n"),
                )
            ).alias("dst"),
        )
    )
    cl = (
        d.crossJoin(F.broadcast(nn))
        .filter(F.col("doc_id") % F.expr("n div 6") == 3)
        .select(F.col("doc_id").alias("v"))
    )
    clique = (
        cl.select(F.col("v").alias("src"))
        .crossJoin(F.broadcast(cl.select(F.col("v").alias("dst"))))
        .filter(F.col("src") < F.col("dst"))
    )
    return triangle_count(e.unionAll(clique))


def q_anchor_topk(spark, sf_dir):
    """Per-target anchor-text aggregation (operators/anchors.py):
    top-2 normalized anchors per link target + total in-links — the
    cross-page link-text signal pass composing with page_links'
    per-page extraction. Link relation = pagerank's 3-outlink graph
    with 5 deterministic anchor variants keyed by (src+target)%5, two
    of which normalize to the same string ('Click  Here'/'click
    here') so the WS_CLASS+lower collapse is exercised, one empty.
    Rank order (n DESC, anchor) is total per target → the k-cut is
    engine-deterministic; the window runs over the AGGREGATED
    relation with WindowGroupLimit pushdown (kmv argument)."""
    from newspaper_spark.operators.anchors import anchor_topk

    d = _docs(spark, sf_dir).select("doc_id")
    nn = d.agg(F.count("*").cast("long").alias("n"))
    variants = F.array(
        F.lit("Click  Here"),
        F.lit("click here"),
        F.lit("Read More"),
        F.lit("homepage"),
        F.lit(""),
    )
    links = (
        d.crossJoin(F.broadcast(nn))
        .select(
            F.col("doc_id").alias("src"),
            F.explode(
                F.array(
                    (F.col("doc_id") * 2 + 1) % F.col("n"),
                    (F.col("doc_id") * 3 + 2) % F.col("n"),
                    (F.col("doc_id") * 7 + 5) % F.col("n"),
                )
            ).alias("target"),
        )
        .select(
            "target",
            F.element_at(
                variants,
                ((F.col("src") + F.col("target")) % 5 + 1).cast("int"),
            ).alias("anchor"),
        )
    )
    return anchor_topk(links, k=2)


def q_build_postings(spark, sf_dir):
    """Positional inverted-index build (operators/index.py): one row
    per (term, doc) with tf, '+'-joined delta-gap positions (the
    Elias/varint compression front-end, kept as an exact string so
    the driver canonicalizer stays array-free), and term-level df/cf
    computed from the aggregated postings relation — one corpus pass
    total. The per-(doc, term) lag window's partition is bounded by
    within-doc term repeats, never a corpus-wide key; the df/cf
    join-back is term-keyed, not broadcast (web-scale lexicon). The
    oracle replays positions, gaps (ordered string_agg), and both
    frequencies exactly — all integers and strings."""
    from newspaper_spark.operators.index import build_postings

    return build_postings(_docs(spark, sf_dir))


def q_host_rank(spark, sf_dir):
    """WEIGHTED host-level PageRank (graph.pagerank_int with
    weight_col) — the Common Crawl-style host authority rank:
    page-level outlinks project onto hosts extracted from the real
    URL strings (regexp host parse, not an id shortcut), cross-host
    edges aggregate with link-multiplicity weights, and each edge
    carries rank mass proportional to w/out_weight. The weighted
    recurrence divides rank by out_weight BEFORE the weight multiply
    (overflow-safe at hub scale, deterministic truncation) and with
    unit weights reduces exactly to the unweighted formula — one code
    path, both oracle-replayed. String-typed nodes exercise the
    any-node-type generalization."""
    from newspaper_spark.operators.graph import pagerank_int

    d = _docs(spark, sf_dir).select("doc_id")
    nn = d.agg(F.count("*").cast("long").alias("n"))
    hosts = _synth_urls(spark, sf_dir).select(
        "doc_id",
        F.regexp_extract(F.col("url"), "^https?://([^/]+)", 1).alias("host"),
    )
    # src_host rides along from the page row itself (the host regex
    # parse runs inline over the page's own URL) — the former second
    # hosts join keyed by s was an identity self-join on the unique
    # doc_id (round 8). The t-side join is genuine: t is a DIFFERENT
    # document's id, so its host needs the lookup.
    pl = (
        hosts.crossJoin(F.broadcast(nn))
        .select(
            F.col("host").alias("src_host"),
            F.explode(
                F.array(
                    (F.col("doc_id") * 2 + 1) % F.col("n"),
                    (F.col("doc_id") * 3 + 2) % F.col("n"),
                    (F.col("doc_id") * 7 + 5) % F.col("n"),
                )
            ).alias("t"),
        )
    )
    hedges = (
        pl.join(
            hosts.select(F.col("doc_id").alias("t"), F.col("host").alias("dst_host")),
            "t",
        )
        .filter(F.col("src_host") != F.col("dst_host"))
        .groupBy("src_host", "dst_host")
        .agg(F.count("*").cast("long").alias("w"))
    )
    return pagerank_int(
        hedges, "src_host", "dst_host", iterations=3, weight_col="w"
    )


def q_sparse_dot_pairs(spark, sf_dir):
    """Index-based all-pairs document similarity (index.
    sparse_dot_pairs, Bayardo et al. 2007): candidates from sharing
    an index term after the df <= 50 frequency cutoff, exact integer
    tf dot products, full deterministic pair set. The ~31-word
    synthetic vocabulary sits at df≈corpus (pure stopwords — the cut
    removes ALL of it, exercising the lever for real), so the query
    plants discriminative tokens: 'rare{d div 2}' (df=2, pairs
    consecutive docs) and 'extra{d div 4}' (df=4, groups of four) —
    within each 4-block the two rare-sharing pairs score dot 2 and
    the four extra-only pairs dot 1. Oracle replays tf, df, the cut,
    and the pair join exactly."""
    from newspaper_spark.operators.index import sparse_dot_pairs

    d = _docs(spark, sf_dir)
    enriched = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" rare"),
            F.expr("cast(doc_id div 2 as string)"),
            F.lit(" extra"),
            F.expr("cast(doc_id div 4 as string)"),
        ).alias("text"),
    )
    return sparse_dot_pairs(enriched, max_df=50, min_dot=1)


def q_normalize_text(spark, sf_dir):
    """NFC normalization + control stripping (operators/normalize.py);
    oracle via DuckDB nfc_normalize (verified identical to Python
    unicodedata on composition exclusions / Hangul / reordering)."""
    from newspaper_spark.operators.normalize import normalize_text

    d = _docs(spark, sf_dir)
    sfx = F.when(F.col("doc_id") % 4 == 0, F.lit(_NFC_SUFFIXES[0]))
    for i in (1, 2, 3):
        sfx = sfx.when(F.col("doc_id") % 4 == i, F.lit(_NFC_SUFFIXES[i]))
    aug = F.concat(F.col("text"), sfx)
    return normalize_text(d.select("doc_id", aug.alias("text")))


def q_c4_filters(spark, sf_dir):
    """C4 page-level heuristic filters (operators/filters.py). The
    synthetic corpus triggers none of the content rules, so rule-
    triggering suffixes are injected on deterministic doc_id slices
    (every 7th gets lorem ipsum, every 11th a curly brace, every 13th
    a javascript mention, every 5th a 5-sentence tail) — mirrored
    verbatim in the oracle so every rule path carries both outcomes."""
    from newspaper_spark.operators.filters import c4_filters

    d = _docs(spark, sf_dir)
    aug = F.concat(
        F.col("text"),
        F.when(F.col("doc_id") % 7 == 0, F.lit(" lorem ipsum")).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 11 == 0, F.lit(" {")).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 13 == 0, F.lit(" enable JavaScript")).otherwise(
            F.lit("")
        ),
        F.when(
            F.col("doc_id") % 5 == 0, F.lit(". One. Two. Three. Four. Five.")
        ).otherwise(F.lit("")),
    )
    return c4_filters(d.select("doc_id", aug.alias("text")))


def q_unigram_logprob(spark, sf_dir):
    """Corpus-LM quality score (textstats.unigram_logprob): mean
    unigram log10-probability of each doc under the corpus's own
    token distribution."""
    from newspaper_spark.operators.textstats import unigram_logprob

    d = _docs(spark, sf_dir)
    return unigram_logprob(d.select("doc_id", "text"))


def q_fingerprint(spark, sf_dir):
    from newspaper_spark.operators.textstats import doc_fingerprint_col

    d = _docs(spark, sf_dir)
    return d.select("doc_id", doc_fingerprint_col(F.col("text")).alias("fingerprint"))


def q_winnow(spark, sf_dir):
    """Rolling-hash winnowing fingerprints (k=8, window=16) — distinct
    window minima of the char k-gram hash sequence per doc."""
    from newspaper_spark.operators.textstats import winnowing_fingerprints

    return winnowing_fingerprints(_docs(spark, sf_dir)).select(
        F.col("id").alias("doc_id"), "fingerprint"
    )


def q_contamination(spark, sf_dir):
    """Decontamination check: corpus docs sharing winnowing fingerprints
    with an 'eval set' (every 10th doc stands in for the benchmark
    data). Shared-fingerprint equi-join — the scale-safe form of
    substring-overlap detection (never pairwise text comparison)."""
    from newspaper_spark.operators.textstats import winnowing_fingerprints

    d = _docs(spark, sf_dir)
    fps = winnowing_fingerprints(d)
    eval_fps = fps.join(
        d.filter(F.col("doc_id") % 10 == 0).select(F.col("doc_id").alias("id")),
        "id",
    ).select(F.col("fingerprint"))
    corpus_fps = fps.join(
        d.filter(F.col("doc_id") % 10 != 0).select(F.col("doc_id").alias("id")),
        "id",
    )
    hits = corpus_fps.join(eval_fps.distinct(), "fingerprint")
    return (
        hits.groupBy("id")
        .agg(F.count("*").alias("n_shared_fps"))
        .select(F.col("id").alias("doc_id"), "n_shared_fps")
    )


def q_events_hourly(spark, sf_dir):
    from newspaper_spark.sources.transcripts import load_table

    ev = _spread(load_table(spark, sf_dir, "events"), spark)
    hour = F.date_trunc("hour", F.col("ts"))
    return (
        ev.groupBy(hour.alias("hour"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
    )


def q_prepare_url(spark, sf_dir):
    """urls.py:81-99: urljoin + Pinterest-style ?url= redirect unwrap."""
    from newspaper_spark.operators.urlops import prepare_url_udf

    d = _docs(spark, sf_dir)
    raw = (
        F.when(F.col("doc_id") % 3 == 0,
               F.concat(F.lit("/rel/path-"), F.col("doc_id")))
        .when(F.col("doc_id") % 3 == 1,
              F.concat(F.lit("http://pinterest.com/pin?url=http%3A%2F%2Fnews.site.com%2Fstory-"),
                       F.col("doc_id")))
        .otherwise(F.concat(F.lit("http://news.site.com/abs-"), F.col("doc_id")))
    )
    return d.select(
        "doc_id",
        prepare_url_udf(raw, F.lit("http://news.site.com/section/page.html")).alias("prepared"),
    )


def q_link_hash(spark, sf_dir):
    """Deterministic md5 link hash (utils.py:57-73 minus time.time())."""
    from newspaper_spark.functions.columns import link_hash_col

    u = _synth_urls(spark, sf_dir)
    return u.select("doc_id", link_hash_col(F.col("url")).alias("link_hash"))


def q_dedup_url(spark, sf_dir):
    """Article uniq-by-url (source.py:319-327) — urls collide mod 100."""
    d = _docs(spark, sf_dir)
    url = F.concat(F.lit("http://site.com/news/story-"), (F.col("doc_id") % 100).cast("string"))
    cand = d.select(F.col("doc_id"), url.alias("url"))
    from pyspark.sql import Window as W

    w = W.partitionBy("url").orderBy("doc_id")
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "url")
    )


def q_pdf_skip(spark, sf_dir):
    """Media-payload sniff (network.py:75-76 analog) as a Column filter."""
    from newspaper_spark.functions.columns import is_pdf_payload

    d = _docs(spark, sf_dir)
    payload = F.when(F.col("doc_id") % 7 == 0, F.concat(F.lit("%PDF-1.4 "), F.col("text"))).otherwise(F.col("text"))
    return d.select("doc_id", is_pdf_payload(payload).alias("is_pdf"))


def q_array_ops(spark, sf_dir):
    """Set-op surface (SURVEY §2.7): union/distinct/intersect over token
    arrays — the img-set/keyword-union/tags analogs (article.py:297-300,
    379-381; extractors.py:748-771). Array results are serialized with
    array_join so the driver canonicalizer gets sortable scalars."""
    d = _docs(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    first8 = F.slice(toks, 1, 8)
    last8 = F.slice(toks, F.greatest(F.size(toks) - 7, F.lit(1)), 8)
    return d.select(
        "doc_id",
        F.array_join(F.array_sort(F.array_distinct(first8)), " ").alias("dedup_head"),
        F.array_join(F.array_sort(F.array_union(first8, last8)), " ").alias("union_head_tail"),
        F.array_join(F.array_sort(F.array_intersect(first8, last8)), " ").alias("common"),
        F.size(F.array_distinct(toks)).alias("n_unique"),
    )


def q_conversation_text(spark, sf_dir):
    """Conversation reassembly: per-conv extracted turns concatenated in
    stable turn order (north-rule ordering made visible as an operator).
    Uses the SEGMENTED two-level aggregation (operators/reassemble.py)
    so mega-conversations never materialize in one buffer; segment=2
    forces the multi-segment path even on 4-turn test conversations.
    Output is identical to the single-level groupBy+collect form, so
    the same SQL oracle covers it."""
    from newspaper_spark.operators.extract import extract_articles
    from newspaper_spark.operators.reassemble import (
        reassemble_conversations_segmented,
    )

    out = extract_articles(_transcripts(spark, sf_dir))
    return reassemble_conversations_segmented(out, segment=2)


def q_nlp_keywords(spark, sf_dir):
    """nlp.py:119-150 as pure relational ops (explode → anti-join
    stoplist → groupBy → window top-10 → rescore)."""
    import json, os

    res = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "newspaper_spark", "resources", "stopwords.json")
    with open(res, encoding="utf-8") as f:
        nlp_stops = json.load(f)["nlp-en"]
    stops_df = spark.createDataFrame([(w,) for w in nlp_stops], "w string")

    d = _docs(spark, sf_dir)
    cleaned = F.lower(F.regexp_replace(F.col("text"), r"[^\w ]", ""))
    toks = F.filter(F.split(cleaned, " "), lambda x: x != "")
    base = d.select("doc_id", toks.alias("toks"), F.size(toks).alias("num_words"))
    words = base.select(
        "doc_id", "num_words", F.explode("toks").alias("w")
    ).join(F.broadcast(stops_df), "w", "left_anti")
    freq = words.groupBy("doc_id", "w").agg(
        F.count("*").alias("freq"), F.first("num_words").alias("num_words")
    )
    win = Window.partitionBy("doc_id").orderBy(F.desc("freq"), F.desc("w"))
    return (
        freq.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= 10)
        .select(
            "doc_id", "w", "rank",
            F.round(F.col("freq") / F.col("num_words") * 1.5 + 1, 6).alias("score"),
        )
    )


def q_nlp_summary(spark, sf_dir):
    """Extractive summary over the extracted articles, through the real
    kernel (split_sentences → keywords → score_sentences → top-5 →
    positional re-sort, nlp.py:40-54 semantics). Exact oracle: the
    synthetic corpus has no sentence terminators, so the splitter
    provably yields ONE sentence per article and the summary reduces to
    the newline-stripped extracted text; the keyword union is
    reconstructed relationally. Deterministic doc subset (doc_id < 50
    recovered from conv_id/turn_idx) instead of a nondeterministic
    limit()."""
    from newspaper_spark.operators.extract import extract_articles
    from newspaper_spark.operators.nlp_ops import add_nlp

    out = extract_articles(_transcripts(spark, sf_dir))
    doc_num = (
        F.element_at(F.split("conv_id", "-"), -1).cast("int") * 4
        + F.col("turn_idx")
    )
    out = add_nlp(out.filter(doc_num < 50))
    # keywords is array<string> built from a Python set (iteration order
    # not SQL-reconstructable): sort + serialize so the driver
    # canonicalizer (pandas sort_values) gets a stable scalar column
    return out.select(
        "conv_id",
        "turn_idx",
        F.array_join(F.array_sort("keywords"), " ").alias("keywords"),
        "summary",
    )


def q_nlp_sentence_scores(spark, sf_dir):
    """Sentence scoring through the REAL kernel (nlp.py:164-208
    semantics: title/length/position/sbs/dbs features + blended total +
    most_common(5) selection), exercised on a sentence-RICH derivation
    of the corpus: every word initcap'd, a period inserted after each
    12-word run whose last word has ≥5 chars — longer than every entry
    in the splitter's abbreviation list (max 4 chars), so NONE of the
    kernel's boundary guards (abbreviation, single-letter,
    lowercase-next) can ever reject an inserted boundary, on ANY
    corpus, and the oracle reconstructs the split relationally. The feature
    math is IEEE-identical on both sides — the oracle folds the sbs/dbs
    sums left-to-right exactly as the Python kernel does."""
    from newspaper_spark.operators.nlp_ops import sentence_features_udf

    d = _docs(spark, sf_dir)
    derived = F.regexp_replace(
        F.initcap(F.col("text")), r"((?:[^ ]+ ){11}[^ ]{5,}) ", "$1. "
    )
    title = F.concat(
        F.lit("Document number "),
        F.col("doc_id").cast("string"),
        F.lit(" on data systems"),
    )
    feats = d.select(
        "doc_id",
        F.explode(
            sentence_features_udf(title, derived, F.lit("en"))
        ).alias("f"),
    )
    def r6(c):
        # explicit floor-based rounding: F.round is HALF_UP while
        # DuckDB's round() is HALF_EVEN on doubles — they disagree on
        # exact .5-at-6dp values (observed on 3 rows at sf0.01).
        # floor(x*1e6 + 0.5)/1e6 is the identical double-op sequence on
        # both engines, so identical inputs give identical outputs.
        return F.floor(F.col(c) * 1e6 + 0.5) / 1e6

    return feats.select(
        "doc_id",
        F.col("f.idx").alias("sent_idx"),
        F.col("f.sentence").alias("sentence"),
        r6("f.title_score").alias("title_score"),
        r6("f.length_score").alias("length_score"),
        r6("f.position_score").alias("position_score"),
        r6("f.sbs").alias("sbs"),
        r6("f.dbs").alias("dbs"),
        r6("f.total").alias("total"),
        F.col("f.selected").alias("selected"),
    )


def q_sessionize(spark, sf_dir):
    """Gap-based sessionization over events (window lag + running sum,
    single shuffle on user_id)."""
    from newspaper_spark.operators.sessionize import session_stats
    from newspaper_spark.sources.transcripts import load_table

    ev = _spread(load_table(spark, sf_dir, "events"), spark)
    return session_stats(ev, gap_minutes=30, tiebreak_col="event_id")


def _image_candidates(spark, sf_dir):
    """Three deterministic image candidates per document (dims from
    md5 — SQL-reconstructable), one with 'logo' in the URL."""
    d = _docs(spark, sf_dir)

    def hx2(k, pos):
        return F.conv(
            F.substring(F.md5(F.concat(F.col("text"), F.lit(f":{k}"))), pos, 2),
            16, 10,
        ).cast("int")

    parts = []
    for k in range(3):
        stem = "/logo-" if k == 1 else "/img-"
        url = F.concat(
            F.lit("http://img.example.com/"),
            F.col("doc_id").cast("string"),
            F.lit(f"{stem}{k}.jpg"),
        )
        parts.append(
            d.select(
                "doc_id",
                url.alias("img_url"),
                (40 + hx2(k, 1) * 4).alias("width"),
                (40 + hx2(k, 31) * 3).alias("height"),
            )
        )
    return parts[0].unionByName(parts[1]).unionByName(parts[2])


def q_image_score(spark, sf_dir):
    """Entropy/area image-candidate ranking (images.py:181-220 math;
    fetch oos). Top candidate per doc by calculate_area semantics."""
    from newspaper_spark.operators.images import top_image_by_area

    cands = _image_candidates(spark, sf_dir)
    return top_image_by_area(cands).select(
        F.col("id").alias("doc_id"), "img_url", "score"
    )


def q_text_entropy(spark, sf_dir):
    """Shannon entropy of the char distribution per doc — the
    image_entropy histogram math (images.py:49-55) as a relational
    aggregation."""
    from newspaper_spark.operators.images import text_entropy

    return text_entropy(_docs(spark, sf_dir)).select(
        F.col("id").alias("doc_id"), "entropy"
    )


def q_media_resize(spark, sf_dir):
    """Resize-dimension stage over the fake-decoded media (aspect-
    preserving thumbnail math; pixel resample behind the real_decode
    stub)."""
    from newspaper_spark.operators.multimodal import attach_media, resize_media

    d = _docs(spark, sf_dir)
    return resize_media(attach_media(d), target=128).select(
        "media_id", "width", "height", "resized_w", "resized_h", "error"
    )


def q_frame_sample(spark, sf_dir):
    """Frame-sampling schedule for the fake video table: indices
    0, 4, 8, … capped at 8 frames, serialized for the driver."""
    from newspaper_spark.operators.multimodal import attach_video, sample_frame_indices

    d = _docs(spark, sf_dir)
    v = attach_video(d)
    return v.select(
        "media_id",
        "n_frames",
        F.array_join(
            F.transform(
                sample_frame_indices(F.col("n_frames"), every_n=4, max_frames=8),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("frame_idx"),
    )


def q_media_features(spark, sf_dir):
    from newspaper_spark.operators.multimodal import attach_media, extract_media_features

    d = _docs(spark, sf_dir)
    media = attach_media(d)
    return extract_media_features(media).select(
        "media_id", "kind", "n_bytes", "width", "height", "n_frames", "error"
    )


def q_media_decode_real(spark, sf_dir):
    """REAL image decode end-to-end: generated binary PPM (P6) payloads
    (raster bytes = padded text bytes, so the oracle reconstructs every
    decoded value from the text column), parsed by the pure-stdlib
    decoder — not the md5 fake — then 8-band mean-intensity features."""
    from newspaper_spark.operators.multimodal import (
        attach_ppm,
        extract_media_features,
    )

    d = _docs(spark, sf_dir)
    media = attach_ppm(d)
    out = extract_media_features(media, real_decode=True)
    return out.select(
        "media_id",
        "kind",
        "n_bytes",
        "width",
        "height",
        "n_frames",
        "error",
        *[
            F.round(F.element_at("feature", i + 1).cast("double"), 6).alias(f"f{i}")
            for i in range(8)
        ],
    )


def q_media_decode_jpeg(spark, sf_dir):
    """REAL JPEG decode end-to-end, BOTH entropy paths: Column-
    assembled 16×16 grayscale JPEGs (four DC-only 8×8 blocks,
    byte-aligned custom Huffman codes, DRI=1 restarts) — even doc_ids
    get the BASELINE (SOF0) container, odd doc_ids the PROGRESSIVE
    (SOF2, single DC scan) container — run through the full
    pure-stdlib Huffman+IDCT decoder. With the all-ones quant table
    each block decodes to exactly 128 + (d+4)//8 on either path, so
    the oracle reconstructs every feature band with integer
    arithmetic (only n_bytes differs between the containers). Closes
    the reference's pixel-math gap for JPEG (reference images.py:49-74
    scores need pixels, not just dims)."""
    from newspaper_spark.operators.multimodal import (
        extract_media_features,
        jpeg_dc_gray_payload_col,
        jpeg_dc_gray_progressive_payload_col,
    )

    d = _docs(spark, sf_dir)

    def dcol(k):
        # block DC diff in [128, 254] with d % 8 != 4 (exact half-up
        # rounding + no 0xFF entropy byte) — mirrored in the oracle
        m0 = (F.col("doc_id") * 7 + F.lit(k * 31)) % 111
        q7 = F.floor(m0 / 7).cast("long")
        r = m0 % 7
        r2 = r + F.when(r >= 4, F.lit(1)).otherwise(F.lit(0))
        return (F.lit(128) + 8 * q7 + r2).cast("int")

    ds = (dcol(0), dcol(1), dcol(2), dcol(3))
    payload = F.when(
        F.col("doc_id") % 2 == 0, jpeg_dc_gray_payload_col(*ds)
    ).otherwise(jpeg_dc_gray_progressive_payload_col(*ds))
    media = d.select(
        F.col("doc_id").cast("string").alias("media_id"),
        F.lit("image").alias("kind"),
        payload.alias("payload"),
        F.length(payload).cast("long").alias("n_bytes"),
    )
    out = extract_media_features(media, real_decode=True)
    return out.select(
        "media_id",
        "kind",
        "n_bytes",
        "width",
        "height",
        "n_frames",
        "error",
        *[
            F.round(F.element_at("feature", i + 1).cast("double"), 6).alias(f"f{i}")
            for i in range(8)
        ],
    )


def q_dsir(spark, sf_dir):
    """DSIR importance-resampling scores (operators/dsir.py, Xie et
    al. 2023): hashed unigram+bigram bag-of-buckets log-ratio of a
    deterministic target slice (doc_id % 10 == 0, the "high-quality
    exemplar" stand-in) against the whole corpus. The oracle replays
    the identical md5-bucket hashing, add-one smoothing, and single
    log10-of-exact-integer-ratio arithmetic."""
    from newspaper_spark.operators.dsir import dsir_scores

    d = _docs(spark, sf_dir).select("doc_id", "text")
    # Column-predicate target (slice-of-raw): the exemplar bucket
    # distribution derives from the persisted feature counts instead
    # of a second explode+window+hash pass over the slice (round 8)
    return dsir_scores(d, F.col("doc_id") % 10 == 0, n_buckets=1024)


def q_gopher_filters(spark, sf_dir):
    """Gopher/MassiveText document-level quality rules (Rae et al.
    2021 §A1.1) with per-rule attribution flags — all thresholds
    compared in exact integer arithmetic, so the oracle replays them
    with zero float-division drift."""
    from newspaper_spark.operators.filters import gopher_filters

    return gopher_filters(_docs(spark, sf_dir).select("doc_id", "text"))


def q_line_filters(spark, sf_dir):
    """RefinedWeb-style line-wise corrections (filters.line_filters,
    Penedo et al. 2023 §G.2): documents are re-lined deterministically
    (every literal ' value ' → newline) and seeded with doc_id-gated
    boilerplate lines — a social counter (doc_id%2), an ALL-CAPS nav
    header (%3), a subscribe plea (%5), and a numeric-only line (%7) —
    so every removal class provably triggers and the 5% whole-doc drop
    rule genuinely varies with document length. The oracle replays the
    identical line segmentation and per-line predicates relationally."""
    from newspaper_spark.operators.filters import line_filters

    d = _docs(spark, sf_dir)
    m = F.col("doc_id")
    t = F.concat(
        F.replace(F.col("text"), F.lit(" value "), F.lit("\n")),
        F.when(
            m % 2 == 0,
            F.concat(
                F.lit("\n"),
                ((m * 7) % 89 + 11).cast("string"),
                F.lit(" likes"),
            ),
        ).otherwise(F.lit("")),
        F.when(m % 3 == 0, F.lit("\nREAD THE FULL STORY HERE NOW")).otherwise(
            F.lit("")
        ),
        F.when(
            m % 5 == 0,
            F.lit("\nSubscribe to our newsletter to read more today"),
        ).otherwise(F.lit("")),
        F.when(m % 7 == 0, F.lit("\n42.5%")).otherwise(F.lit("")),
    )
    return line_filters(d.select("doc_id", t.alias("text")))


def _synth_feeds(spark, sf_dir):
    """Deterministic feed-body corpus: RSS 2.0 for even doc_ids, Atom
    1.0 for odd, 1–3 entries each (doc_id % 3 + 1), titles carrying an
    &amp; entity so entity resolution is genuinely exercised, and every
    doc_id % 10 == 9 feed replaced by unclosed XML for the error
    channel."""
    d = _docs(spark, sf_dir)
    m = F.col("doc_id")
    ms = m.cast("string")
    site = (m % 7).cast("string")
    mm = F.lpad((m % 60).cast("string"), 2, "0")

    def url(j):
        return F.concat(
            F.lit("http://site"), site, F.lit(".com/feed/item-"), ms,
            F.lit(f"-{j}.html"),
        )

    def title(j):
        return F.concat(F.lit("Story "), ms, F.lit(f"-{j} &amp; more"))

    def rss_item(j):
        return F.concat(
            F.lit("<item><title>"), title(j), F.lit("</title><link>"),
            url(j), F.lit("</link><pubDate>Tue, 30 Dec 2014 10:"), mm,
            F.lit(":00 GMT</pubDate></item>"),
        )

    def atom_entry(j):
        return F.concat(
            F.lit("<entry><title>"), title(j), F.lit('</title><link href="'),
            url(j), F.lit('"/><updated>2014-12-30T10:'), mm,
            F.lit(":00Z</updated></entry>"),
        )

    def maybe(j, e):
        return F.when(m % 3 >= j, e).otherwise(F.lit(""))

    rss = F.concat(
        F.lit('<?xml version="1.0"?><rss version="2.0"><channel><title>Feed '),
        ms, F.lit("</title>"), rss_item(0), maybe(1, rss_item(1)),
        maybe(2, rss_item(2)), F.lit("</channel></rss>"),
    )
    atom = F.concat(
        F.lit('<feed xmlns="http://www.w3.org/2005/Atom"><title>Feed '),
        ms, F.lit("</title>"), atom_entry(0), maybe(1, atom_entry(1)),
        maybe(2, atom_entry(2)), F.lit("</feed>"),
    )
    xml = (
        F.when(m % 10 == 9, F.lit("<rss><channel><item><title>broken"))
        .when(m % 2 == 0, rss)
        .otherwise(atom)
    )
    return d.select(m.alias("feed_id"), xml.alias("xml"))


def q_feed_entries(spark, sf_dir):
    """Structured feed parse (operators/feeds.parse_feed_entries) — the
    feedparser analog behind newspaper.hot() (reference api.py:59-68)
    and Source feed ingestion, minus the network GET: a REAL
    xml.etree.ElementTree parse of Column-assembled RSS/Atom bodies
    (entity resolution exercised by the &amp; titles; unclosed XML
    routes to the malformed-xml error channel). The oracle reconstructs
    every entry arithmetically from the same construction."""
    from newspaper_spark.operators.feeds import parse_feed_entries

    return parse_feed_entries(_synth_feeds(spark, sf_dir))


def q_feed_urls(spark, sf_dir):
    """The reference's regex-mode feed→URL scrape
    (ContentExtractor.get_urls(regex=True), extractors.py:607-621 —
    what Source.feeds_to_articles runs on every feed body): non-greedy
    tag strip then the verbatim URL pattern, pure Catalyst. Faithful
    quirk preserved and exercised: Atom href attributes live inside
    tags and are invisible to this mode (odd doc_ids emit no rows).
    The oracle replays the identical two-regex pipeline in RE2 over the
    identically reconstructed XML."""
    from newspaper_spark.operators.feeds import feed_urls

    return feed_urls(_synth_feeds(spark, sf_dir))


def q_robots_gate(spark, sf_dir):
    """robots.txt crawl-politeness gate (operators/robots.py,
    urllib.robotparser semantics — property-verified against it in
    tests): per-host Column-assembled robots bodies exercising named
    groups beating '*', first-match-wins rule order, empty-Disallow
    allow-all rules, comment stripping, agent normalization
    ('NewsBot/1.0' → 'newsbot'), and the no-applicable-group default.
    The oracle reconstructs the verdicts arithmetically from the
    synthetic construction (the url_blocklist pattern)."""
    from newspaper_spark.operators.robots import parse_robots, robots_gate

    u = _synth_urls(spark, sf_dir).withColumn(
        "host",
        F.concat(
            F.lit("site"), (F.col("doc_id") % 7).cast("string"), F.lit(".com")
        ),
    )
    hosts = u.select((F.col("doc_id") % 7).alias("k"), "host").distinct()
    body = (
        F.when(
            F.col("k") % 3 == 0,
            F.lit(
                "User-agent: newsbot\nDisallow: /news/\nDisallow: /gallery/"
                "\n\nUser-agent: *\nDisallow: /"
            ),
        )
        .when(
            F.col("k") % 3 == 1,
            F.lit("# site robots\nUser-agent: *\nDisallow: /tag-\nDisallow:"),
        )
        .otherwise(F.lit("User-agent: other\nDisallow: /"))
    )
    rules = parse_robots(hosts.select("host", body.alias("robots")))
    return robots_gate(u, rules, "NewsBot/1.0")


def q_bpe_encode(spark, sf_dir):
    """Document-level BPE encoding (bpe.bpe_encode_docs): per-doc word
    and BPE-token counts under the same 8-merge table bpe_vocab
    trains — the number sequence packing actually consumes. Distinct
    words are segmented once and broadcast back; raw text never
    shuffles. The oracle extends the bpe_vocab replay with the
    per-(doc, word) join."""
    from newspaper_spark.operators.bpe import (
        bpe_encode_docs,
        bpe_train,
        bpe_word_counts,
    )

    d = _docs(spark, sf_dir).select("doc_id", "text")
    # duplicate-explode form kept deliberately — see the measured-
    # negative shared-scan note in q_tokenize_pack
    merges = bpe_train(bpe_word_counts(d), 8)
    return bpe_encode_docs(d, merges)


def q_page_links(spark, sf_dir):
    """DOM-mode link extraction (source_build.extract_page_links =
    get_urls(titles=True), extractors.py:591-605) over the synthetic
    pages through the REAL DOM parser: every page carries exactly the
    five boilerplate anchors (navbar News/Sports/About, footer
    Terms/Privacy) in document order, so the oracle enumerates them
    per turn."""
    from newspaper_spark.operators.source_build import extract_page_links

    t = _transcripts(spark, sf_dir).select("conv_id", "turn_idx", "text")
    return extract_page_links(t)


def q_bpe_vocab(spark, sf_dir):
    """REAL BPE tokenizer train + apply (operators/bpe.py, Sennrich et
    al. 2016): distributed word counting → 8 driver-side merge rounds
    over the bounded vocabulary (the HF/SentencePiece split; collect
    is O(vocab)) → distributed Column-only apply through the merge
    chain. Construction is EAGER (training collects word counts when
    the plan is built — same documented behavior as
    minhash_lsh_pairs(max_group_size)). The oracle replays all 8
    rounds relationally: pair counts, (max count, lexicographically
    smallest pair) argmax, and the identical single-pass sentinel
    replacement per round."""
    from newspaper_spark import cache
    from newspaper_spark.operators.bpe import (
        bpe_apply,
        bpe_train,
        bpe_word_counts,
    )

    # persisted: the trainer's collect materializes the counts, and the
    # apply pass then reads the cache instead of re-tokenizing the
    # corpus (round-8: second corpus pass removed)
    wc = cache.track(
        bpe_word_counts(_docs(spark, sf_dir).select("doc_id", "text")).persist()
    )
    merges = bpe_train(wc, 8)
    return bpe_apply(wc, merges)


def q_frontier(spark, sf_dir):
    """Per-host politeness scheduling (operators/frontier.py): each
    URL's 0-based crawl wave within its host under (priority DESC, id)
    order — the deterministic relational form of the per-host pacing
    the reference's flat ThreadPool lacks (network.py:110-135).
    Priority here = the synthetic path class (doc_id % 5). The oracle
    is the identical window in DuckDB."""
    from newspaper_spark.operators.frontier import frontier_schedule

    u = _synth_urls(spark, sf_dir).select(
        "doc_id",
        "url",
        F.concat(
            F.lit("site"), (F.col("doc_id") % 7).cast("string"), F.lit(".com")
        ).alias("host"),
        (F.col("doc_id") % 5).cast("int").alias("priority"),
    )
    return frontier_schedule(u, priority_col="priority")


def q_crawl_prep(spark, sf_dir):
    """End-to-end CRAWL-side pipeline composition — the frontier
    analog of corpus_prep: the synthetic URL universe through the
    domain-suffix blocklist, the robots.txt gate (agent newsbot, the
    q_robots_gate rule set), and the Bloom seen-URL filter
    (m=1024/k=4, seen = doc_id%4==0), with survivors scheduled into
    per-host politeness waves. Every stage is an already-individually-
    verified operator; this query proves the composition's verdicts
    and schedule stay exact end to end (wave is NULL for dropped
    URLs). All joins are id-keyed narrow verdict rows — pages never
    move."""
    from newspaper_spark.operators.bloom import bloom_seen_filter
    from newspaper_spark.operators.frontier import frontier_schedule
    from newspaper_spark.operators.robots import parse_robots, robots_gate
    from newspaper_spark.operators.urlops import url_blocklist_filter

    u = _synth_urls(spark, sf_dir).withColumn(
        "host",
        F.concat(
            F.lit("site"), (F.col("doc_id") % 7).cast("string"), F.lit(".com")
        ),
    )
    bl = url_blocklist_filter(
        u.select("doc_id", "url"), ["site2.com", "site5.com"]
    ).select("doc_id", "blocked")

    hosts = u.select((F.col("doc_id") % 7).alias("k"), "host").distinct()
    body = (
        F.when(
            F.col("k") % 3 == 0,
            F.lit(
                "User-agent: newsbot\nDisallow: /news/\nDisallow: /gallery/"
                "\n\nUser-agent: *\nDisallow: /"
            ),
        )
        .when(
            F.col("k") % 3 == 1,
            F.lit("# site robots\nUser-agent: *\nDisallow: /tag-\nDisallow:"),
        )
        .otherwise(F.lit("User-agent: other\nDisallow: /"))
    )
    rb = robots_gate(
        u,
        parse_robots(hosts.select("host", body.alias("robots"))),
        "NewsBot/1.0",
    ).select("doc_id", "allowed")

    seen = u.filter(F.col("doc_id") % 4 == 0).select("url")
    bo = bloom_seen_filter(
        u.select("doc_id", "url"), seen, m=1024, k=4
    ).select("doc_id", "possibly_seen")

    gated = (
        u.join(bl, "doc_id")
        .join(rb, "doc_id")
        .join(bo, "doc_id")
        .withColumn(
            "kept",
            ~F.col("blocked") & F.col("allowed") & ~F.col("possibly_seen"),
        )
    )
    sched = frontier_schedule(
        gated.filter("kept").select(
            "doc_id", "host", (F.col("doc_id") % 5).cast("int").alias("priority")
        ),
        priority_col="priority",
    ).select("doc_id", "wave")
    return gated.join(sched, "doc_id", "left").select(
        "doc_id", "url", "host", "blocked", "allowed", "possibly_seen",
        "kept", "wave",
    )


def q_quality_buckets(spark, sf_dir):
    """CCNet head/middle/tail corpus split (textstats.quality_buckets,
    Wenzek et al. 2020 §4.3) over the unigram-LM scores of
    unigram_logprob: fixed-bin score histogram, ONE bounded O(bins)
    window, integer-exact tertile thresholds (n·k div 3), bins
    assigned to the bucket where they start. The oracle rebuilds the
    scores and replays the histogram split relationally."""
    from newspaper_spark.operators.textstats import (
        quality_buckets,
        unigram_logprob,
    )

    scores = unigram_logprob(_docs(spark, sf_dir).select("doc_id", "text"))
    return quality_buckets(scores, score_col="mean_logprob", id_col="doc_id")


def q_quality_classifier(spark, sf_dir):
    """Trained quality classifier (operators/quality_nb.py): hashed
    unigram+bigram multinomial Naive Bayes — the DCLM/GPT-3-style
    TRAINED gate, vs dsir's importance resampling. Trains on the
    deterministic labeled split doc_id%2==0 (positive exemplars =
    doc_id%10==0, the same slice dsir uses as its target corpus) and
    scores the FULL corpus, so odd doc_ids are genuinely held out.
    The oracle replays the count tables, the one-log10-per-bucket
    exact-integer-ratio arithmetic, the class priors, and the
    unseen-bucket smoothing constant."""
    from newspaper_spark.operators.quality_nb import nb_quality_scores

    d = _docs(spark, sf_dir).select("doc_id", "text")
    labeled = d.filter(F.col("doc_id") % 2 == 0).withColumn(
        "is_pos", F.col("doc_id") % 10 == 0
    )
    return nb_quality_scores(d, labeled, n_buckets=1024)


def q_ccnet_prep(spark, sf_dir):
    """CCNet full-pipeline composition (Wenzek et al. 2020): language
    ID → PER-LANGUAGE unigram-LM scoring (each language under its own
    vocabulary/total, the paper's per-language KenLM shape) →
    per-language head/middle/tail tercile buckets. Composes lang_id,
    unigram_logprob(group_col=...) and quality_buckets(group_col=...)
    the way crawl_prep/corpus_prep compose their families; the oracle
    reuses the lang-ID fragment and replays the grouped LM + histogram
    split relationally."""
    from newspaper_spark.operators.textstats import (
        lang_id_col,
        quality_buckets,
        unigram_logprob,
    )

    d = _docs(spark, sf_dir).select(
        "doc_id", "text", lang_id_col(F.col("text")).alias("lang_id")
    )
    scores = unigram_logprob(d, group_col="lang_id")
    return quality_buckets(
        scores, score_col="mean_logprob", id_col="doc_id", group_col="lang_id"
    )


def q_bm25_topk(spark, sf_dir):
    """BM25 top-k retrieval (operators/bm25.py) — the decontamination/
    data-selection retrieval primitive. Query set = every doc_id%17==5
    document's first 6 tokens (deterministic eval-item stand-ins, so
    each query has a known planted near-match: its own source doc);
    k=5, classic Okapi k1=1.2 / b=0.75.

    The synthetic documents table has a degenerate ~31-term vocabulary
    in which every term appears in ~78% of documents, so naive BM25
    candidates are |queries| × |corpus| (measured 6.3M pairs at sf0.1
    — the embedding_dedup lesson: candidate VOLUME is what kills these
    operators). This query therefore exercises the operator's
    documented scale lever end to end: every document is enriched with
    one deterministic rare token (``tokN``, N = doc_id mod 97 → df ≈
    n_docs/97), the query carries its source document's rare token,
    and ``max_df=200`` applies the classic stopword-frequency cut
    that drops the degenerate hot terms — candidates collapse to
    ~Σ_t df_t ≈ |queries| · n_docs/97 while each query keeps its
    planted near-match. The oracle rebuilds postings, df (including
    the max_df cut), the exact-integer rational saturation, the
    one-log10 idf, and the micro-unit floor-rounded sum relationally,
    then replays the same (score desc, doc asc) top-k window."""
    from newspaper_spark.operators.bm25 import bm25_topk, _toks

    d = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.coalesce(F.col("text"), F.lit("")),
            F.lit(" tok"),
            (F.col("doc_id") % 97).cast("string"),
        ).alias("text"),
    )
    q = (
        d.filter((F.col("doc_id") % 17 == 5) & (F.length(F.trim("text")) > 0))
        .select(
            F.col("doc_id").alias("query_id"),
            F.concat(
                F.array_join(F.slice(_toks(F.col("text")), 1, 6), " "),
                F.lit(" tok"),
                (F.col("doc_id") % 97).cast("string"),
            ).alias("query_text"),
        )
    )
    return bm25_topk(d, q, k=5, max_df=200)


def q_bloom_seen(spark, sf_dir):
    """Deterministic Bloom-filter seen-URL gate (operators/bloom.py) —
    the bounded-state replacement for the exact anti-join memoize at
    crawl scale. Seen set = every doc_id % 4 == 0 URL; m=1024 bits,
    k=4 md5-derived probes, 32-bit words. The small m deliberately
    lands in the measurable-false-positive regime so the query
    exercises (and audits) FP behavior: output carries possibly_seen,
    the exact verdict, and the is_false_positive delta. The oracle
    rebuilds the identical filter relation bit-for-bit in SQL."""
    from newspaper_spark.operators.bloom import bloom_seen_filter

    u = _synth_urls(spark, sf_dir)
    seen = u.filter(F.col("doc_id") % 4 == 0).select("url")
    gated = bloom_seen_filter(u, seen, m=1024, k=4)
    exact = (F.col("doc_id") % 4 == 0).alias("exact_seen")
    return gated.select(
        "doc_id",
        "url",
        "possibly_seen",
        exact,
        (F.col("possibly_seen") & ~(F.col("doc_id") % 4 == 0)).alias(
            "is_false_positive"
        ),
    )


def q_url_blocklist(spark, sf_dir):
    """UT1-style domain-suffix URL blocklist gate
    (urlops.url_blocklist_filter): host explodes into parent-domain
    suffix candidates that join the blocklist relation — probe cost
    independent of blocklist size, no per-entry regex. The oracle
    reproduces the verdicts arithmetically from the synthetic URL
    construction (hosts are site{doc_id%7}.com)."""
    from newspaper_spark.operators.urlops import url_blocklist_filter

    u = _synth_urls(spark, sf_dir)
    return url_blocklist_filter(
        u,
        ["site2.com", "site5.com", "ads.nosuch.example"],
        url_col="url",
        id_col="doc_id",
    )


def q_paragraph_dedup(spark, sf_dir):
    """MassiveText exact paragraph dedup (span_dedup.paragraph_dedup):
    documents are re-paragraphed deterministically ('. ' → newline)
    and every doc gets one shared boilerplate paragraph appended, so
    cross-document removal provably triggers; the oracle replays the
    same segmentation + canonical-keep relationally."""
    from newspaper_spark.operators.span_dedup import paragraph_dedup

    d = _docs(spark, sf_dir)
    para = d.select(
        "doc_id",
        F.concat(
            F.replace(F.col("text"), F.lit(". "), F.lit("\n")),
            F.lit("\nFollow our updates page for more stories"),
        ).alias("text"),
    )
    return paragraph_dedup(para)


def q_media_audio(spark, sf_dir):
    """REAL audio decode end-to-end: generated 8-bit mono PCM WAV
    payloads (sample bytes = padded text bytes) parsed by the pure-
    stdlib RIFF/PCM decoder — the audio member of the multimodal
    family — then 8-band mean-amplitude features the oracle
    reconstructs from the text column alone."""
    from newspaper_spark.operators.multimodal import (
        attach_wav,
        extract_audio_features,
    )

    media = attach_wav(_docs(spark, sf_dir))
    out = extract_audio_features(media)
    return out.select(
        "media_id",
        "kind",
        "n_bytes",
        "n_samples",
        "sample_rate",
        "n_channels",
        "error",
        *[
            F.round(F.element_at("feature", i + 1).cast("double"), 6).alias(f"f{i}")
            for i in range(8)
        ],
    )


def q_media_video(spark, sf_dir):
    """REAL video decode end-to-end: Column-assembled AVI/MJPEG
    containers (4 DC-only JPEG frames per doc) parsed by the RIFF
    walker, frames decoded by the real JPEG decoder under the
    every-2nd/max-4 sampling schedule (frames 0 and 2) — the video
    member of the multimodal family. Every decoded pixel is
    128 + (d+4)//8, so the oracle reconstructs the sampled-frame
    feature bands with integer arithmetic."""
    from newspaper_spark.operators.multimodal import (
        avi_mjpeg_payload_col,
        extract_media_features,
        jpeg_dc_gray_hex_col,
    )

    d = _docs(spark, sf_dir)

    def dcol(j, k):
        m0 = (F.col("doc_id") * 7 + F.lit((4 * j + k) * 31)) % 111
        q7 = F.floor(m0 / 7).cast("long")
        r = m0 % 7
        r2 = r + F.when(r >= 4, F.lit(1)).otherwise(F.lit(0))
        return (F.lit(128) + 8 * q7 + r2).cast("int")

    frames = [
        jpeg_dc_gray_hex_col(*[dcol(j, k) for k in range(4)]) for j in range(4)
    ]
    payload = avi_mjpeg_payload_col(frames)
    media = d.select(
        F.col("doc_id").cast("string").alias("media_id"),
        F.lit("video").alias("kind"),
        payload.alias("payload"),
        F.length(payload).cast("long").alias("n_bytes"),
    )
    out = extract_media_features(media, real_decode=True)
    return out.select(
        "media_id",
        "kind",
        "n_bytes",
        "width",
        "height",
        "n_frames",
        "error",
        *[
            F.round(F.element_at("feature", i + 1).cast("double"), 6).alias(f"f{i}")
            for i in range(8)
        ],
    )


def q_corpus_prep(spark, sf_dir):
    """End-to-end training-data prep over documents: exact-dedup (keep
    min-id representative) → language-ID → quality score → token count
    → keep docs passing the quality/length gates. One broadcast-able
    join + Column-only enrichment — the composition a 100 TB corpus
    build runs before tokenization."""
    from newspaper_spark.operators.dedup import dedup_exact
    from newspaper_spark.operators.textstats import (
        lang_id_col,
        quality_score_col,
        token_count_col,
    )

    d = _docs(spark, sf_dir)
    reps = dedup_exact(d).select("doc_id")
    kept = d.join(reps, "doc_id")
    enriched = kept.select(
        "doc_id",
        lang_id_col(F.col("text")).alias("lang_id"),
        token_count_col(F.col("text")).alias("n_tokens"),
        quality_score_col(F.col("text")).alias("quality"),
    )
    return enriched.filter((F.col("quality") >= 0.5) & (F.col("n_tokens") >= 10))


def q_source_meta(spark, sf_dir):
    """Source-level brand + description (the last reference-surface
    gap, VERDICT r6 missing-item 1): the reference's Source()
    constructor sets brand = tldextract.extract(url).domain
    (source.py:79-82) and set_description copies the homepage
    meta-description (source.py:170-175). Synthetic homepage per
    document exercises the kernel's mini-PSL on four URL shapes (www
    subdomain, two-label co.uk suffix, explicit port, userinfo +
    trailing-dot host) and the DOM meta[name=description] first-match
    kernel incl. attribute charref unescape (&amp;), surrounding-
    whitespace strip, and the ''-when-absent default (doc_id%5==2
    pages carry no meta tag). Map-only Arrow UDF — homepages never
    shuffle."""
    from newspaper_spark.operators.source_build import extract_source_meta

    d = _docs(spark, sf_dir).select("doc_id")
    name = (
        F.when(F.col("doc_id") % 4 == 0, F.concat(F.lit("alpha"), F.col("doc_id")))
        .when(F.col("doc_id") % 4 == 1, F.concat(F.lit("beta"), F.col("doc_id")))
        .when(F.col("doc_id") % 4 == 2, F.concat(F.lit("gamma"), F.col("doc_id")))
        .otherwise(F.concat(F.lit("delta"), F.col("doc_id")))
    )
    url = (
        F.when(F.col("doc_id") % 4 == 0, F.concat(F.lit("http://www."), name, F.lit(".com/")))
        .when(F.col("doc_id") % 4 == 1, F.concat(F.lit("http://news."), name, F.lit(".co.uk/")))
        .when(F.col("doc_id") % 4 == 2, F.concat(F.lit("http://"), name, F.lit(".org:8080/")))
        .otherwise(F.concat(F.lit("http://editor@"), name, F.lit(".net./")))
    )
    desc_attr = F.concat(
        F.lit("  News &amp; analysis from "),
        name,
        F.lit(", est. "),
        (F.col("doc_id") % 30 + 1990).cast("string"),
        F.lit("  "),
    )
    html = F.concat(
        F.lit("<html><head><title>Home</title>"),
        F.when(
            F.col("doc_id") % 5 == 2, F.lit("")
        ).otherwise(
            F.concat(F.lit('<meta name="description" content="'), desc_attr, F.lit('">'))
        ),
        F.lit("</head><body><p>hello</p></body></html>"),
    )
    src = d.select(
        "doc_id", url.alias("source_url"), html.alias("html")
    )
    return extract_source_meta(src)


def q_api_surface(spark, sf_dir):
    """Module-level API parity (VERDICT r6 missing-item 2):
    newspaper.popular_urls() (api.py:51-56 — 'http://' + each bundled
    popular-sources entry, file order preserved) and
    newspaper.languages() (api.py:45-48 + utils.py:343-402 — the
    supported-language table derived from the stopword files), both as
    one tall (kind, item, val) relation. Driver-side bounded by
    construction (O(hundreds) rows); consumers broadcast-join it."""
    from newspaper_spark.api import languages, popular_urls

    langs = languages(spark).select(
        F.lit("language").alias("kind"),
        F.col("code").alias("item"),
        F.col("full_name").alias("val"),
    )
    pops = popular_urls(spark).select(
        F.lit("popular_url").alias("kind"),
        F.col("idx").cast("string").alias("item"),
        F.col("url").alias("val"),
    )
    return langs.unionByName(pops)


def q_badwords(spark, sf_dir):
    """C4 bad-words page gate (filters.badwords_filter, Raffel et al.
    2020 §2.2): blocklist = two unigrams + one two-token phrase drawn
    from the synthetic vocabulary, so hit counts genuinely vary per
    document. Scale shape under test: no full-corpus bigram pass —
    bigram candidates are bounded by the blocklist first-token's
    corpus frequency (broadcast probe, the bm25 candidate-volume
    lesson). The oracle replays the token explode (shared WS_CLASS
    regime), the unigram membership, and the pos+1 adjacency join."""
    from newspaper_spark.operators.filters import badwords_filter

    return badwords_filter(
        _docs(spark, sf_dir), ["slow", "big", "fast table"]
    )


def q_dedup_lines(spark, sf_dir):
    """Within-document duplicate-line removal (span_dedup.
    dedup_lines_within_doc) — the per-page half of repetition removal
    next to the cross-document span/paragraph dedup family. Input
    enrichment (mirrored in the oracle, the paragraph_dedup pattern —
    the raw synthetic text has no newlines): each doc becomes a
    7-line page with a boilerplate line planted THREE times, its
    first 3-token phrase twice, one blank line, and tokens 4-6 once —
    so removal counts vary with phrase collisions. The oracle replays
    the explode → first-occurrence window → ordered reassembly."""
    from newspaper_spark.operators.span_dedup import dedup_lines_within_doc

    nws = "[^ \\t\\n\\x0B\\f\\r]"
    line_a = F.regexp_extract(
        F.col("text"), f"^((?:{nws}+ ){{2}}{nws}+)", 1
    )
    line_b = F.regexp_extract(
        F.col("text"), f"^(?:{nws}+ ){{3}}((?:{nws}+ ){{2}}{nws}+)", 1
    )
    boiler = F.lit("subscribe to our newsletter")
    d = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat_ws(
            "\n", boiler, line_a, boiler, F.lit(""), line_b, boiler, line_a
        ).alias("text"),
    )
    return dedup_lines_within_doc(d)


def _round_no() -> int:
    """Current build round, inferred from the driver's committed
    correctness artifacts (after round N finishes, CORRECTNESS_r{N}.json
    exists in the repo root → the running round is max+1). Overridable
    with SPARK_GRAFT_ROUND for tests/audits of other rounds' windows.

    The basename match is a strict FULLMATCH of the exact driver
    filename pattern (ADVICE r6: a looser search() made the repo root
    behavior-bearing — a stray file like CORRECTNESS_rerun_r9.json
    would have silently reordered queries(); property-tested in
    tests/test_driver_contract.py::test_round_inference_ignores_stray_files).
    """
    import glob
    import os
    import re

    env = os.environ.get("SPARK_GRAFT_ROUND")
    if env:
        return int(env)
    here = os.path.dirname(os.path.abspath(__file__))
    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))
        if (m := re.fullmatch(r"CORRECTNESS_r0*(\d+)\.json", os.path.basename(p)))
    ]
    return (max(rounds) + 1) if rounds else 1


# Canonical query order, FROZEN in round-6's emitted order (the round-5
# canonical + 22 debuts folded forward per the recipe in CLAUDE.md, so
# round 6's artifact corresponds to rotation offset 0). ROTATION POLICY
# (see ROTATION.md): the external driver hash-verifies only the FIRST 50
# queries() entries, so the returned order rotates this list by
# 52 × (round − 6) positions each round. 52 = len(canonical) − window,
# which makes consecutive rounds' unsampled tails DISJOINT. New queries
# are appended to _NEW_THIS_ROUND (always emitted first → always inside
# the window) and folded into the canonical list the following round.
# Every entry is additionally checked every round by
# scripts/verify_oracle.py.
_CANONICAL_QUERIES: list[tuple[str, Callable]] = [
    ("quality_classifier", q_quality_classifier),
    ("ccnet_prep", q_ccnet_prep),
    ("bm25_topk", q_bm25_topk),
    ("exact_substr", q_exact_substr),
    ("stupid_backoff", q_stupid_backoff),
    ("warc_records", q_warc_records),
    ("warc_extract", q_warc_extract),
    ("dclm_prep", q_dclm_prep),
    ("sitemap_urls", q_sitemap_urls),
    ("tokenize_pack", q_tokenize_pack),
    ("pagerank", q_pagerank),
    ("kmv_distinct", q_kmv_distinct),
    ("heavy_hitters", q_heavy_hitters),
    ("hll_distinct", q_hll_distinct),
    ("shard_assign", q_shard_assign),
    ("pmi_collocations", q_pmi_collocations),
    ("chunk_text", q_chunk_text),
    ("triangle_count", q_triangle_count),
    ("anchor_topk", q_anchor_topk),
    ("build_postings", q_build_postings),
    ("host_rank", q_host_rank),
    ("sparse_dot_pairs", q_sparse_dot_pairs),
    ("text_entropy", q_text_entropy),
    ("nlp_keywords", q_nlp_keywords),
    ("prepare_url", q_prepare_url),
    ("array_ops", q_array_ops),
    ("conversation_text", q_conversation_text),
    ("link_hash", q_link_hash),
    ("dedup_url", q_dedup_url),
    ("pdf_skip", q_pdf_skip),
    ("corpus_prep", q_corpus_prep),
    ("media_decode_jpeg", q_media_decode_jpeg),
    ("dsir", q_dsir),
    ("gopher_filters", q_gopher_filters),
    ("url_blocklist", q_url_blocklist),
    ("paragraph_dedup", q_paragraph_dedup),
    ("media_audio", q_media_audio),
    ("media_video", q_media_video),
    ("semantic_clusters", q_semantic_clusters),
    ("extract_fulltext", q_extract_fulltext),
    ("extract_title", q_extract_title),
    ("extract_meta", q_extract_meta),
    ("dedup_exact", q_dedup_exact),
    ("keywords_topk", q_keywords_topk),
    ("minhash_pairs", q_minhash_pairs),
    ("dedup_clusters", q_dedup_clusters),
    ("sample_stratified", q_sample_stratified),
    ("ngram_jaccard", q_ngram_jaccard),
    ("simhash", q_simhash),
    ("simhash_near_dups", q_simhash_near_dups),
    ("line_filters", q_line_filters),
    ("bloom_seen", q_bloom_seen),
    ("feed_entries", q_feed_entries),
    ("feed_urls", q_feed_urls),
    ("quality_buckets", q_quality_buckets),
    ("robots_gate", q_robots_gate),
    ("frontier", q_frontier),
    ("bpe_vocab", q_bpe_vocab),
    ("page_links", q_page_links),
    ("bpe_encode", q_bpe_encode),
    ("crawl_prep", q_crawl_prep),
    ("ann_topk", q_ann_topk),
    ("ann_lsh", q_ann_lsh),
    ("ann_ivf", q_ann_ivf),
    ("embedding_dedup", q_embedding_dedup),
    ("lang_id", q_lang_id),
    ("bpe_tokens", q_bpe_tokens),
    ("quality", q_quality),
    ("pii_scrub", q_pii_scrub),
    ("repetition", q_repetition),
    ("unigram_logprob", q_unigram_logprob),
    ("media_probe", q_media_probe),
    ("dedup_report", q_dedup_report),
    ("source_mix", q_source_mix),
    ("tfidf_topk", q_tfidf_topk),
    ("pack_offsets", q_pack_offsets),
    ("normalize_text", q_normalize_text),
    ("c4_filters", q_c4_filters),
    ("span_dedup", q_span_dedup),
    ("fingerprint", q_fingerprint),
    ("winnow", q_winnow),
    ("contamination", q_contamination),
    ("events_hourly", q_events_hourly),
    ("sessionize", q_sessionize),
    ("media_features", q_media_features),
    ("media_decode_real", q_media_decode_real),
    ("media_resize", q_media_resize),
    ("frame_sample", q_frame_sample),
    ("image_score", q_image_score),
    ("transcripts", q_transcripts),
    ("stopword_count", q_stopword_count),
    ("inner_trim", q_inner_trim),
    ("valid_url", q_valid_url),
    ("url_filetype", q_url_filetype),
    ("is_media_news", q_is_media_news),
    ("is_valid_body", q_is_valid_body),
    ("truncations", q_truncations),
    ("anti_join_seen", q_anti_join_seen),
    ("limit_per_source", q_limit_per_source),
    ("domain_counters", q_domain_counters),
    ("nlp_summary", q_nlp_summary),
    ("nlp_sentence_scores", q_nlp_sentence_scores),
]

# Queries ADDED this round (not yet in _CANONICAL_QUERIES): emitted
# first so they always land inside the driver's 50-row window. Fold
# into _CANONICAL_QUERIES next round and empty this list.
_NEW_THIS_ROUND: list[tuple[str, Callable]] = [
    ("source_meta", q_source_meta),
    ("api_surface", q_api_surface),
    ("badwords", q_badwords),
    ("dedup_lines", q_dedup_lines),
]

_DRIVER_WINDOW = 50  # how many leading queries() entries the driver hashes
_ROTATION_STEP = 52  # = len(canonical) − window → disjoint consecutive tails
_ROTATION_BASE_ROUND = 6  # round whose artifact froze the canonical order
# The round the lists above were AUTHORED for. The fold of
# _NEW_THIS_ROUND into _CANONICAL_QUERIES is only valid through this
# round; if the inferred round advances past it with debuts still
# unfolded (the manual fold was forgotten — ADVICE r5 finding 1),
# queries() folds them forward automatically so the no-two-consecutive-
# misses guarantee survives without code changes.
_AUTHORED_FOR_ROUND = 7


def _folded_lists(
    round_no: int,
) -> tuple[list[tuple[str, Callable]], list[tuple[str, Callable]], int, int]:
    """Return (canonical, new, base_round, step) valid for `round_no`,
    auto-folding _NEW_THIS_ROUND forward if the authored round has
    passed. The fold reproduces the authored round's emitted order
    exactly (debuts first, rotation offset advanced by len(new)), then
    resets step = len − window so consecutive tails stay disjoint."""
    canonical = list(_CANONICAL_QUERIES)
    new = list(_NEW_THIS_ROUND)
    base, step = _ROTATION_BASE_ROUND, _ROTATION_STEP
    if round_no > _AUTHORED_FOR_ROUND and new:
        n = len(canonical)
        off = (step * (_AUTHORED_FOR_ROUND - base) + len(new)) % n
        rotated = canonical[off:] + canonical[:off]
        new_names = {nm for nm, _ in new}
        canonical = new + [e for e in rotated if e[0] not in new_names]
        new = []
        base = _AUTHORED_FOR_ROUND
        step = len(canonical) - _DRIVER_WINDOW
    return canonical, new, base, step


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    canonical, new, base, step = _folded_lists(_round_no())
    n = len(canonical)
    # Debut queries are emitted FIRST (always in-window), which shrinks
    # the canonical share of the window by len(new) — so the offset
    # advances by the same amount, keeping the previous round's
    # unsampled tail fully inside this round's window (the no-query-
    # misses-two-consecutive-rounds guarantee, property-tested).
    off = (step * (_round_no() - base) + len(new)) % n
    rotated = canonical[off:] + canonical[:off]
    new_names = {nm for nm, _ in new}
    out: dict[str, Callable] = dict(new)
    out.update((nm, fn) for nm, fn in rotated if nm not in new_names)
    return out


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB dialect, same parquet views)
# ---------------------------------------------------------------------------

_TRANSCRIPT_BASE = f"""
    SELECT 'conv-0-' || (doc_id // {TURNS_PER_CONV})::VARCHAR AS conv_id,
           (doc_id % {TURNS_PER_CONV})::INT AS turn_idx,
           doc_id
    FROM documents
"""

_ROLE_SQL = (
    "CASE (doc_id % 4) % 3 WHEN 0 THEN 'user' WHEN 1 THEN 'assistant' "
    "ELSE 'tool' END"
)

# expected kernel output for the synthetic page (see
# sources/transcripts.py: PARA_LEAD every PARA_WORDS=15 words, block
# repeated BODY_REPEAT times, paragraphs joined with blank lines)
BODY_REPEAT = 16
_EXPECTED_BLOCK = (
    "'" + PARA_LEAD + "' || regexp_replace(text, "
    "'((?:\\S+ ){14}\\S+) ', '\\1' || chr(10) || chr(10) || '" + PARA_LEAD + "', 'g')"
)
_EXPECTED_TEXT = (
    f"substring(repeat({_EXPECTED_BLOCK} || chr(10) || chr(10), {BODY_REPEAT}), 1, "
    f"length(repeat({_EXPECTED_BLOCK} || chr(10) || chr(10), {BODY_REPEAT})) - 2)"
)

_PUNCT_SQL = "'!\"#$%&''()*+,-./:;<=>?@[\\]^_`{|}~'"


def _bpe_oracle_sql(n_rounds: int, doc_level: bool = False) -> str:
    """Unrolled relational replay of q_bpe_vocab's training loop: per
    round, adjacency pair counts over the spaced vocabulary, the
    (max count, lexicographically smallest pair) argmax, and the same
    single-pass sentinel replacement (DuckDB replace == Python
    str.replace == Spark F.replace: left-to-right, non-overlapping)."""
    parts = [
        """
        WITH wc AS (
            SELECT word, count(*)::BIGINT AS freq FROM (
                SELECT unnest(string_split(trim(regexp_replace(lower(text), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')), ' ')) AS word
                FROM documents
            ) GROUP BY word
        ), v0 AS (
            SELECT word, freq,
                   ' ' || regexp_replace(word, '(.)', '\\1 ', 'g') AS s
            FROM wc
        )"""
    ]
    for i in range(n_rounds):
        parts.append(
            f""", p{i} AS (
            SELECT t[i] AS l, t[i + 1] AS r, sum(freq)::BIGINT AS c
            FROM (SELECT freq, string_split(trim(s), ' ') AS t FROM v{i}),
                 unnest(range(1, len(t))) AS rr(i)
            GROUP BY l, r
        ), m{i} AS (
            SELECT l, r FROM p{i} ORDER BY c DESC, l, r LIMIT 1
        ), v{i + 1} AS (
            SELECT word, freq,
                   replace(s, ' ' || m{i}.l || ' ' || m{i}.r || ' ',
                              ' ' || m{i}.l || m{i}.r || ' ') AS s
            FROM v{i}, m{i}
        )"""
        )
    if doc_level:
        parts.append(
            f""", dt AS (
            SELECT doc_id, word, count(*)::BIGINT AS k FROM (
                SELECT doc_id, unnest(string_split(trim(regexp_replace(lower(text), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')), ' ')) AS word
                FROM documents
            ) GROUP BY doc_id, word
        )
        SELECT dt.doc_id,
               sum(dt.k)::BIGINT AS n_words,
               sum(dt.k * (CASE WHEN trim(v{n_rounds}.s) = '' THEN 0
                                ELSE len(string_split(trim(v{n_rounds}.s), ' ')) END))::BIGINT AS n_bpe_tokens
        FROM dt JOIN v{n_rounds} USING (word)
        GROUP BY dt.doc_id"""
        )
    else:
        parts.append(
            f"""
        SELECT word, freq, trim(s) AS tokens,
               (CASE WHEN trim(s) = '' THEN 0
                     ELSE len(string_split(trim(s), ' ')) END)::BIGINT AS n_tokens
        FROM v{n_rounds}"""
        )
    return "".join(parts)


def _api_surface_sql() -> str:
    """VALUES-literal oracle for q_api_surface, frozen from the same
    bundled resources the api module reads (the relation IS the data —
    the oracle pins that the Spark plumbing surfaces it faithfully;
    content itself is unit-pinned in tests/test_operators.py)."""
    from newspaper_spark.api import (
        LANGUAGE_NAMES,
        language_codes,
        popular_source_domains,
    )

    lang_rows = ", ".join(
        f"('{c}', '{LANGUAGE_NAMES[c]}')" for c in language_codes()
    )
    pop_rows = ", ".join(
        f"({i}, '{d}')" for i, d in enumerate(popular_source_domains())
    )
    return f"""
        SELECT 'language' AS kind, code AS item, name AS val
        FROM (VALUES {lang_rows}) t(code, name)
        UNION ALL
        SELECT 'popular_url' AS kind, i::VARCHAR AS item,
               'http://' || d AS val
        FROM (VALUES {pop_rows}) t(i, d)
    """


def oracle_sql() -> dict[str, str]:
    stops = ",".join(f"'{s}'" for s in _STOPS_SMALL)
    return {
        "transcripts": f"""
            SELECT 'conv-0-' || (doc_id // 4)::VARCHAR AS conv_id,
                   (doc_id % 4)::INT AS turn_idx,
                   {_ROLE_SQL} AS role,
                   CASE WHEN {_ROLE_SQL} = 'tool' THEN 'browser' ELSE '' END AS tool,
                   TIMESTAMP '2014-12-30 00:00:00' +
                     (doc_id % 4) * INTERVAL 1 MINUTE AS ts
            FROM documents
        """,
        "extract_fulltext": f"""
            SELECT 'conv-0-' || (doc_id // 4)::VARCHAR AS conv_id,
                   (doc_id % 4)::INT AS turn_idx,
                   {_EXPECTED_TEXT} AS extracted_text
            FROM documents
        """,
        "extract_title": """
            SELECT 'conv-0-' || (doc_id // 4)::VARCHAR AS conv_id,
                   (doc_id % 4)::INT AS turn_idx,
                   'Document number ' || doc_id::VARCHAR || ' on data systems' AS title
            FROM documents
        """,
        "extract_meta": """
            SELECT 'conv-0-' || (doc_id // 4)::VARCHAR AS conv_id,
                   (doc_id % 4)::INT AS turn_idx,
                   'Example Media' AS meta_site_name,
                   'Alex Writer' AS author1,
                   TIMESTAMP '2014-12-30 00:00:00' AS publish_date,
                   'en' AS meta_lang
            FROM documents
        """,
        "stopword_count": f"""
            SELECT doc_id,
                   len(list_filter(string_split(lower(translate(text, {_PUNCT_SQL}, '')), ' '),
                       x -> x IN ({stops}))) AS n_stop,
                   len(string_split(translate(text, {_PUNCT_SQL}, ''), ' ')) AS n_words
            FROM documents
        """,
        "inner_trim": """
            SELECT doc_id,
                   trim(regexp_replace('  ' || text || ' ' || chr(9) || ' junk' || chr(9) || 'tail  ',
                        '[\\s\\t]+', ' ', 'g')) AS trimmed
            FROM documents
        """,
        "valid_url": f"""
            WITH u AS ({_SYNTH_URL_SQL})
            SELECT doc_id, url,
                   CASE doc_id % 5
                     WHEN 0 THEN TRUE   -- /news/story/... good path
                     WHEN 1 THEN TRUE   -- date pattern
                     WHEN 2 THEN FALSE  -- about page: single path chunk
                     WHEN 3 THEN FALSE  -- .mp4 media filetype
                     ELSE TRUE          -- slug with 5 dashes, tld not in slug
                   END AS is_valid
            FROM u
        """,
        "url_filetype": f"""
            WITH u AS ({_SYNTH_URL_SQL})
            SELECT doc_id,
                   lower(coalesce(regexp_extract(
                       regexp_replace(regexp_replace(url, '^[a-z]+://[^/]+', ''), '/$', ''),
                       '\\.([A-Za-z0-9]{{1,5}})$', 1), '')) AS filetype
            FROM u
        """,
        "is_media_news": f"""
            WITH u AS ({_SYNTH_URL_SQL})
            SELECT doc_id,
                   (url LIKE '%/video%' OR url LIKE '%/slide%' OR url LIKE '%/gallery%'
                    OR url LIKE '%/powerpoint%' OR url LIKE '%/fashion%'
                    OR url LIKE '%/glamour%' OR url LIKE '%/cloth%') AS is_media
            FROM u
        """,
        "is_valid_body": """
            SELECT doc_id,
                   (len(string_split(text, ' ')) > 300)
                   OR (2 >= 2 AND len(string_split(text, ' ')) >= 300
                       AND len(string_split(text, '.')) >= 7
                       AND text IS NOT NULL AND text <> '') AS valid_body
            FROM documents
        """,
        "truncations": """
            SELECT doc_id,
                   substring(text, 1, 200) AS t200,
                   least(length(text), 100000) AS len_t
            FROM documents
        """,
        "dedup_exact": """
            SELECT min(doc_id) AS doc_id,
                   md5(trim(regexp_replace(lower(text), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g'))) AS fingerprint
            FROM documents
            GROUP BY 2
            ORDER BY 1
        """,
        "anti_join_seen": """
            SELECT doc_id, source FROM documents
            WHERE doc_id NOT IN (SELECT doc_id FROM documents WHERE doc_id % 10 = 0)
        """,
        "limit_per_source": """
            SELECT doc_id, source, rn FROM (
                SELECT doc_id, source,
                       row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
                FROM documents)
            WHERE rn <= 10
        """,
        "keywords_topk": """
            WITH toks AS (
                SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
                FROM documents
            ), freq AS (
                SELECT doc_id, w, count(*) AS freq FROM toks WHERE w <> ''
                GROUP BY doc_id, w
            )
            SELECT doc_id, w, freq, rank FROM (
                SELECT doc_id, w, freq,
                       row_number() OVER (PARTITION BY doc_id
                                          ORDER BY freq DESC, w DESC) AS rank
                FROM freq)
            WHERE rank <= 10
        """,
        "domain_counters": f"""
            WITH u AS ({_SYNTH_URL_SQL})
            SELECT doc_id,
                   regexp_extract(url, '^http://([^/]+)/', 1) AS domain,
                   row_number() OVER (
                       PARTITION BY regexp_extract(url, '^http://([^/]+)/', 1)
                       ORDER BY doc_id) AS n_in_domain
            FROM u
        """,
        "minhash_pairs": _minhash_oracle(),
        "dedup_clusters": _dedup_clusters_oracle(),
        "sample_stratified": """
            SELECT doc_id, lang FROM documents
            WHERE ('0x' || substring(md5(doc_id::VARCHAR || ':' || 'sample'), 1, 8))::BIGINT
                  / 4294967296.0
                  < CASE lang WHEN 'en' THEN 0.5 WHEN 'zh' THEN 0.25
                              WHEN 'es' THEN 0.25 WHEN 'de' THEN 0.25
                              WHEN 'fr' THEN 0.25 ELSE 0.0 END
        """,
        "simhash": _simhash_oracle(),
        "simhash_near_dups": _simhash_near_dups_oracle(max_hamming=8),
        "ann_lsh": _ann_lsh_oracle(),
        "ann_ivf": _ann_ivf_oracle(),
        "embedding_dedup": _embedding_dedup_oracle(),
        "media_features": _MEDIA_FEATURES_ORACLE,
        "media_decode_real": _media_decode_real_oracle(),
        "media_decode_jpeg": _media_decode_jpeg_oracle(),
        "media_audio": _media_audio_oracle(),
        "media_video": _media_video_oracle(),
        "semantic_clusters": _semantic_clusters_oracle(),
        "media_resize": """
            WITH d AS (
                SELECT md5(text) AS media_id,
                       64 + ('0x' || substring(md5(text), 1, 2))::INT AS w,
                       64 + ('0x' || substring(md5(text), 31, 2))::INT AS h
                FROM documents)
            SELECT media_id, w AS width, h AS height,
                   CASE WHEN w <= 128 AND h <= 128 THEN w
                        WHEN w >= h THEN 128
                        ELSE greatest(1, (w * 128) // h) END AS resized_w,
                   CASE WHEN w <= 128 AND h <= 128 THEN h
                        WHEN w >= h THEN greatest(1, (h * 128) // w)
                        ELSE 128 END AS resized_h,
                   NULL::VARCHAR AS error
            FROM d
        """,
        "frame_sample": """
            WITH v AS (
                SELECT md5(text) AS media_id,
                       1 + (('0x' || substring(md5(text), 3, 2))::INT % 64) AS n_frames
                FROM documents)
            SELECT media_id, n_frames,
                   array_to_string(list_transform(
                       list_slice(generate_series(0, n_frames - 1, 4), 1, 8),
                       x -> x::VARCHAR), ',') AS frame_idx
            FROM v
        """,
        "image_score": _IMAGE_SCORE_ORACLE,
        "text_entropy": """
            SELECT doc_id, round(entropy(c), 6) AS entropy
            FROM (SELECT doc_id, unnest(string_split(coalesce(text, ''), '')) AS c
                  FROM documents)
            GROUP BY doc_id
        """,
        "nlp_keywords": _nlp_keywords_oracle(),
        "nlp_summary": _nlp_summary_oracle(),
        "nlp_sentence_scores": _nlp_sentence_scores_oracle(),
        "prepare_url": """
            SELECT doc_id,
                   CASE doc_id % 3
                     WHEN 0 THEN 'http://news.site.com/rel/path-' || doc_id::VARCHAR
                     WHEN 1 THEN 'http://news.site.com/story-' || doc_id::VARCHAR
                     ELSE 'http://news.site.com/abs-' || doc_id::VARCHAR
                   END AS prepared
            FROM documents
        """,
        "link_hash": f"""
            WITH u AS ({_SYNTH_URL_SQL})
            SELECT doc_id, md5(url) AS link_hash FROM u
        """,
        "dedup_url": """
            SELECT doc_id, url FROM (
                SELECT doc_id,
                       'http://site.com/news/story-' || (doc_id % 100)::VARCHAR AS url,
                       row_number() OVER (
                           PARTITION BY 'http://site.com/news/story-' || (doc_id % 100)::VARCHAR
                           ORDER BY doc_id) AS rn
                FROM documents)
            WHERE rn = 1
        """,
        "pdf_skip": """
            SELECT doc_id, (doc_id % 7 = 0) AS is_pdf FROM documents
        """,
        "conversation_text": f"""
            WITH turns AS (
                SELECT 'conv-0-' || (doc_id // 4)::VARCHAR AS conv_id,
                       (doc_id % 4)::INT AS turn_idx,
                       {_EXPECTED_TEXT} AS text
                FROM documents
            )
            SELECT conv_id,
                   count(*)::INT AS n_turns,
                   string_agg(text, chr(10) || '===' || chr(10) ORDER BY turn_idx)
                     AS conversation_text
            FROM turns GROUP BY conv_id
        """,
        "array_ops": """
            WITH t AS (
                SELECT doc_id, string_split(text, ' ') AS toks FROM documents
            ), s AS (
                SELECT doc_id,
                       toks[1:8] AS first8,
                       toks[greatest(len(toks) - 7, 1):greatest(len(toks) - 7, 1) + 7] AS last8,
                       toks
                FROM t
            )
            SELECT doc_id,
                   coalesce(array_to_string(list_sort(list_distinct(first8)), ' '), '') AS dedup_head,
                   coalesce(array_to_string(list_sort(list_distinct(list_concat(first8, last8))), ' '), '') AS union_head_tail,
                   coalesce(array_to_string(list_sort(list_filter(list_distinct(first8), x -> list_contains(last8, x))), ' '), '') AS common,
                   len(list_distinct(toks)) AS n_unique
            FROM s
        """,
        "ngram_jaccard": _jaccard_oracle(),
        "ann_topk": """
            WITH emb AS (
                SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
                FROM embeddings
            ), q AS (SELECT * FROM emb WHERE vec_id % 50 = 0),
            scored AS (
                SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                       round(list_cosine_similarity(q.v, c.v), 6) AS cos
                FROM q, emb c WHERE q.vec_id <> c.vec_id
            )
            SELECT query_id, neighbor_id, rank FROM (
                SELECT query_id, neighbor_id,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY cos DESC, neighbor_id) AS rank
                FROM scored)
            WHERE rank <= 5
        """,
        "lang_id": _lang_id_oracle(),
        "bpe_tokens": """
            SELECT doc_id,
                   len(string_split(trim(regexp_replace(lower(text), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')), ' ')) AS n_ws_tokens,
                   coalesce(list_sum(list_transform(
                       regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9 \\t\\n\\x0B\\f\\r]'),
                       t -> ceil(length(t) / 4.0)::BIGINT)), 0)::BIGINT AS n_bpe_tokens
            FROM documents
        """,
        "quality": """
            WITH t AS (
                SELECT doc_id, text,
                       string_split(trim(regexp_replace(lower(text), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')), ' ') AS toks
                FROM documents
            )
            SELECT doc_id,
                   len(toks) AS n_tokens,
                   round((
                     (length(regexp_replace(text, '[^A-Za-zÀ-ÿ一-龥]', '', 'g'))::DOUBLE
                        / nullif(length(text), 0))
                     + (CASE WHEN length(text) BETWEEN 100 AND 100000 THEN 1.0 ELSE 0.25 END)
                     + (CASE WHEN length(text)::DOUBLE / nullif(len(toks), 0)
                              BETWEEN 3 AND 12 THEN 1.0 ELSE 0.25 END)
                     + (CASE WHEN len(list_filter(toks,
                           x -> x IN ('the','and','is','a','of'))) > 0
                        THEN 1.0 ELSE 0.5 END)
                   ) / 4.0, 6) AS quality
            FROM t
        """,
        "pii_scrub": """
            WITH aug AS (
                SELECT doc_id,
                       text || ' Contact user' || doc_id::VARCHAR
                            || '@example.com via 10.0.'
                            || (doc_id % 256)::VARCHAR || '.'
                            || ((doc_id * 7) % 256)::VARCHAR
                            || ' or +1 (555) 010-'
                            || lpad((doc_id % 10000)::VARCHAR, 4, '0') AS text
                FROM documents
            )
            SELECT doc_id,
                   regexp_replace(
                     regexp_replace(
                       regexp_replace(text,
                         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                         '<EMAIL>', 'g'),
                       '([0-9]{1,3}\\.){3}[0-9]{1,3}', '<IP>', 'g'),
                     '\\+?[0-9][0-9 ()-]{7,}[0-9]', '<PHONE>', 'g') AS scrubbed_text,
                   len(regexp_extract_all(text,
                     '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))::BIGINT AS n_emails,
                   len(regexp_extract_all(text,
                     '([0-9]{1,3}\\.){3}[0-9]{1,3}'))::BIGINT AS n_ips,
                   len(regexp_extract_all(text,
                     '\\+?[0-9][0-9 ()-]{7,}[0-9]'))::BIGINT AS n_phones
            FROM aug
        """,
        "repetition": """
            WITH n AS (
                SELECT doc_id,
                       trim(regexp_replace(lower(text), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')) AS norm
                FROM documents
            ), base AS (
                SELECT doc_id,
                       string_split(norm, ' ') AS t,
                       length(norm)::BIGINT AS nlen,
                       len(string_split(norm, ' '))::BIGINT AS ntok,
                       len(list_distinct(string_split(norm, ' ')))::BIGINT AS ndis
                FROM n
            ), bg AS (
                SELECT doc_id,
                       unnest(list_transform(range(1, len(t)),
                              i -> t[i] || ' ' || t[i + 1])) AS gram
                FROM base WHERE ntok >= 2
            ), bgc AS (
                SELECT doc_id, gram, count(*)::BIGINT AS cnt
                FROM bg GROUP BY doc_id, gram
            ), perdoc AS (
                SELECT doc_id,
                       sum(cnt)::BIGINT AS total_bg,
                       sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END)::BIGINT AS dup_bg
                FROM bgc GROUP BY doc_id
            ), top AS (
                SELECT doc_id, gram AS top_bigram, cnt AS top_cnt,
                       row_number() OVER (PARTITION BY doc_id
                                          ORDER BY cnt DESC, gram ASC) AS rn
                FROM bgc
            )
            SELECT base.doc_id,
                   base.ntok AS n_tokens,
                   base.ndis AS n_distinct_tokens,
                   floor((CASE WHEN base.ntok > 0
                               THEN base.ndis::DOUBLE / base.ntok
                               ELSE 0.0 END)::DOUBLE * 1000000.0 + 0.5)
                     / 1000000.0 AS ttr,
                   floor((CASE WHEN coalesce(p.total_bg, 0) > 0
                               THEN p.dup_bg::DOUBLE / p.total_bg
                               ELSE 0.0 END)::DOUBLE * 1000000.0 + 0.5)
                     / 1000000.0 AS dup_bigram_frac,
                   coalesce(t.top_bigram, '') AS top_bigram,
                   floor((CASE WHEN t.top_cnt IS NOT NULL AND base.nlen > 0
                               THEN (t.top_cnt * length(t.top_bigram))::DOUBLE / base.nlen
                               ELSE 0.0 END)::DOUBLE * 1000000.0 + 0.5)
                     / 1000000.0 AS top_bigram_frac
            FROM base
            LEFT JOIN perdoc p USING (doc_id)
            LEFT JOIN (SELECT * FROM top WHERE rn = 1) t USING (doc_id)
        """,
        "media_probe": """
            SELECT doc_id::VARCHAR AS media_id,
                   CASE WHEN doc_id % 5 = 0 THEN 'gif'
                        WHEN doc_id % 7 = 0 THEN NULL
                        ELSE 'jpeg' END AS fmt,
                   CASE WHEN doc_id % 7 = 0 AND doc_id % 5 <> 0 THEN NULL
                        ELSE (doc_id % 240 + 16)::INT END AS width,
                   CASE WHEN doc_id % 7 = 0 AND doc_id % 5 <> 0 THEN NULL
                        ELSE ((doc_id * 3) % 240 + 16)::INT END AS height,
                   CASE WHEN doc_id % 7 = 0 AND doc_id % 5 <> 0
                        THEN 'ValueError: unknown image container'
                        ELSE NULL END AS error
            FROM documents
        """,
        "dedup_report": """
            WITH aug AS (
                SELECT b.doc_id, b.source,
                       CASE WHEN b.doc_id % 9 <> 0 THEN c.text ELSE b.text END AS text
                FROM documents b
                LEFT JOIN documents c ON c.doc_id = b.doc_id - b.doc_id % 9
            ), fp AS (
                SELECT source,
                       md5(trim(regexp_replace(lower(text), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g'))) AS fingerprint
                FROM aug
            ), per_fp AS (
                SELECT source, fingerprint, count(*)::BIGINT AS cnt
                FROM fp GROUP BY source, fingerprint
            )
            SELECT source,
                   sum(cnt)::BIGINT AS n_docs,
                   count(*)::BIGINT AS n_distinct,
                   sum(CASE WHEN cnt > 1 THEN cnt - 1 ELSE 0 END)::BIGINT AS n_dup_docs,
                   floor((sum(CASE WHEN cnt > 1 THEN cnt - 1 ELSE 0 END)::DOUBLE
                          / sum(cnt)) * 1000000.0 + 0.5) / 1000000.0 AS dup_rate
            FROM per_fp GROUP BY source
        """,
        "source_mix": """
            WITH c AS (
                SELECT source,
                       len(string_split(trim(regexp_replace(lower(text),
                           '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')), ' '))::BIGINT AS n_tokens,
                       (substring(source, 4)::BIGINT % 3 + 1)::BIGINT AS weight
                FROM documents
            ), per AS (
                SELECT source, count(*)::BIGINT AS n_docs,
                       sum(n_tokens)::BIGINT AS tokens,
                       max(weight)::BIGINT AS weight
                FROM c GROUP BY source
            ), tot AS (
                SELECT sum(tokens)::BIGINT AS tot_tokens,
                       sum(weight)::BIGINT AS tot_weight
                FROM per
            ), j AS (
                SELECT per.*, tot.tot_tokens, tot.tot_weight,
                       ((tot.tot_tokens * 1) // 2 * weight) // tot.tot_weight AS target
                FROM per CROSS JOIN tot
            )
            SELECT source, n_docs, tokens, weight,
                   target::BIGINT AS target_tokens,
                   floor((CASE WHEN tokens > 0
                               THEN least(1.0::DOUBLE, target::DOUBLE / tokens)
                               ELSE 0.0 END)::DOUBLE * 1000000.0 + 0.5)
                     / 1000000.0 AS rate,
                   least(target, tokens)::BIGINT AS expected_tokens
            FROM j
        """,
        "tfidf_topk": """
            WITH n AS (
                SELECT doc_id,
                       string_split(trim(regexp_replace(lower(text), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')), ' ') AS t
                FROM documents
            ), tok AS (
                SELECT doc_id, unnest(t) AS tok FROM n
            ), dt AS (
                SELECT doc_id, tok, count(*)::BIGINT AS cnt
                FROM tok GROUP BY doc_id, tok
            ), ntok AS (
                SELECT doc_id, sum(cnt)::BIGINT AS ntok FROM dt GROUP BY doc_id
            ), dfreq AS (
                SELECT tok, count(DISTINCT doc_id)::BIGINT AS df
                FROM dt GROUP BY tok
            ), nd AS (
                SELECT count(DISTINCT doc_id)::BIGINT AS n_docs FROM dt
            ), scored AS (
                SELECT dt.doc_id, dt.tok,
                       floor((dt.cnt::DOUBLE / ntok.ntok)
                             * log10((nd.n_docs + 1)::DOUBLE / (dfreq.df + 1))
                             * 1000000.0 + 0.5)::BIGINT AS s6
                FROM dt
                JOIN dfreq USING (tok)
                JOIN ntok USING (doc_id)
                CROSS JOIN nd
            ), ranked AS (
                SELECT doc_id, tok, s6,
                       row_number() OVER (PARTITION BY doc_id
                                          ORDER BY s6 DESC, tok ASC) AS rank
                FROM scored
            )
            SELECT doc_id, rank::BIGINT AS rank, tok AS term,
                   (s6::DOUBLE / 1000000.0) AS tfidf
            FROM ranked WHERE rank <= 5
        """,
        "pack_offsets": """
            WITH c AS (
                SELECT doc_id,
                       len(string_split(trim(regexp_replace(lower(text),
                           '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')), ' '))::BIGINT AS n_tokens
                FROM documents
            ), o AS (
                SELECT doc_id, n_tokens,
                       coalesce(sum(n_tokens) OVER (ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                           0)::BIGINT AS "offset"
                FROM c
            )
            SELECT doc_id, n_tokens, "offset",
                   ("offset" // 256)::BIGINT AS start_seq,
                   ("offset" % 256)::BIGINT AS start_pos,
                   (CASE WHEN n_tokens > 0
                         THEN ("offset" + n_tokens - 1) // 256 - "offset" // 256 + 1
                         ELSE 0 END)::BIGINT AS n_seqs
            FROM o
        """,
        "shard_assign": """
            WITH c AS (
                SELECT doc_id,
                       len(string_split(trim(regexp_replace(lower(text),
                           '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')), ' '))::BIGINT AS n_tokens,
                       ('0x' || substring(
                            md5('shard:' || doc_id::VARCHAR), 1, 15
                        ))::BIGINT AS skey
                FROM documents
            ), o AS (
                SELECT doc_id, skey, n_tokens,
                       coalesce(sum(n_tokens) OVER (ORDER BY skey, doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                           0)::BIGINT AS "offset"
                FROM c
            )
            SELECT doc_id, skey AS shuffle_key, n_tokens, "offset",
                   ("offset" // 4096)::BIGINT AS shard_id,
                   (row_number() OVER (PARTITION BY "offset" // 4096
                        ORDER BY skey, doc_id) - 1)::BIGINT AS pos_in_shard
            FROM o
        """,
        "sparse_dot_pairs": """
            WITH aug AS (
                SELECT doc_id,
                       text || ' rare' || (doc_id // 2)::VARCHAR ||
                       ' extra' || (doc_id // 4)::VARCHAR AS text
                FROM documents
            ), n AS (
                SELECT doc_id,
                       string_split(trim(regexp_replace(lower(text),
                           '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')), ' ') AS t
                FROM aug
            ), tok AS (
                SELECT doc_id, unnest(t) AS term FROM n
            ), tf AS (
                SELECT term, doc_id, count(*)::BIGINT AS tf
                FROM tok GROUP BY term, doc_id
            ), wdf AS (
                SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term
            ), pr AS (
                SELECT tf.term, tf.doc_id, tf.tf
                FROM tf JOIN wdf USING (term) WHERE wdf.df <= 50
            )
            SELECT a.doc_id AS id1, b.doc_id AS id2,
                   sum(a.tf * b.tf)::BIGINT AS dot
            FROM pr a JOIN pr b
                 ON a.term = b.term AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
            HAVING sum(a.tf * b.tf) >= 1
        """,
        "host_rank": f"""
            WITH nn AS (SELECT count(*)::BIGINT AS n FROM documents),
            u AS ({_SYNTH_URL_SQL}),
            h AS (
                SELECT doc_id,
                       regexp_extract(url, '^https?://([^/]+)', 1) AS host
                FROM u
            ), pl AS (
                SELECT doc_id AS s, t
                FROM documents, nn,
                     unnest([(doc_id * 2 + 1) % n,
                             (doc_id * 3 + 2) % n,
                             (doc_id * 7 + 5) % n]) AS x(t)
            ), he AS (
                SELECT hs.host AS src, hd.host AS dst,
                       count(*)::BIGINT AS w
                FROM pl JOIN h hs ON hs.doc_id = pl.s
                        JOIN h hd ON hd.doc_id = pl.t
                WHERE hs.host <> hd.host
                GROUP BY hs.host, hd.host
            ), nodes AS (
                SELECT src AS node FROM he UNION SELECT dst FROM he
            ), od AS (
                SELECT src, count(*)::BIGINT AS od, sum(w)::BIGINT AS ow
                FROM he GROUP BY src
            ), r0 AS (
                SELECT node, 1000000::BIGINT AS rank FROM nodes
            ), c1 AS (
                SELECT he.dst AS node,
                       sum((((r0.rank // od.ow) * he.w) * 85) // 100)::BIGINT
                           AS inflow
                FROM he JOIN r0 ON he.src = r0.node
                        JOIN od ON he.src = od.src
                GROUP BY he.dst
            ), r1 AS (
                SELECT nodes.node,
                       (150000 + coalesce(c1.inflow, 0))::BIGINT AS rank
                FROM nodes LEFT JOIN c1 USING (node)
            ), c2 AS (
                SELECT he.dst AS node,
                       sum((((r1.rank // od.ow) * he.w) * 85) // 100)::BIGINT
                           AS inflow
                FROM he JOIN r1 ON he.src = r1.node
                        JOIN od ON he.src = od.src
                GROUP BY he.dst
            ), r2 AS (
                SELECT nodes.node,
                       (150000 + coalesce(c2.inflow, 0))::BIGINT AS rank
                FROM nodes LEFT JOIN c2 USING (node)
            ), c3 AS (
                SELECT he.dst AS node,
                       sum((((r2.rank // od.ow) * he.w) * 85) // 100)::BIGINT
                           AS inflow
                FROM he JOIN r2 ON he.src = r2.node
                        JOIN od ON he.src = od.src
                GROUP BY he.dst
            ), r3 AS (
                SELECT nodes.node,
                       (150000 + coalesce(c3.inflow, 0))::BIGINT AS rank
                FROM nodes LEFT JOIN c3 USING (node)
            )
            SELECT r3.node,
                   coalesce(od.od, 0)::BIGINT AS out_degree,
                   r3.rank
            FROM r3 LEFT JOIN od ON r3.node = od.src
        """,
        "build_postings": """
            WITH n AS (
                SELECT doc_id,
                       string_split(trim(regexp_replace(lower(text),
                           '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')), ' ') AS t
                FROM documents
            ), tokpos AS (
                SELECT doc_id, (i - 1)::BIGINT AS pos, t[i] AS term
                FROM n, unnest(range(1, len(t) + 1)) AS r(i)
            ), d AS (
                SELECT doc_id, term, pos,
                       (pos - coalesce(lag(pos) OVER (
                            PARTITION BY doc_id, term ORDER BY pos),
                            0))::BIGINT AS delta
                FROM tokpos
            ), p AS (
                SELECT term, doc_id, count(*)::BIGINT AS tf,
                       string_agg(delta::VARCHAR, '+' ORDER BY pos)
                           AS deltas
                FROM d GROUP BY term, doc_id
            ), s AS (
                SELECT term, count(*)::BIGINT AS df,
                       sum(tf)::BIGINT AS cf
                FROM p GROUP BY term
            )
            SELECT p.term, p.doc_id, p.tf, p.deltas, s.df, s.cf
            FROM p JOIN s USING (term)
        """,
        "anchor_topk": """
            WITH nn AS (SELECT count(*)::BIGINT AS n FROM documents),
            links AS (
                SELECT t AS target,
                       (['Click  Here', 'click here', 'Read More',
                         'homepage', ''])[
                           ((doc_id + t) % 5 + 1)::INT] AS anchor
                FROM documents, nn,
                     unnest([(doc_id * 2 + 1) % n,
                             (doc_id * 3 + 2) % n,
                             (doc_id * 7 + 5) % n]) AS u(t)
            ), norm AS (
                SELECT target,
                       trim(regexp_replace(lower(anchor),
                           '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')) AS anchor
                FROM links
            ), agg AS (
                SELECT target, anchor, count(*)::BIGINT AS n_mentions
                FROM norm GROUP BY target, anchor
            ), tot AS (
                SELECT target, sum(n_mentions)::BIGINT AS in_links
                FROM agg GROUP BY target
            ), rk AS (
                SELECT target, anchor, n_mentions,
                       row_number() OVER (PARTITION BY target
                           ORDER BY n_mentions DESC, anchor)::BIGINT AS rank
                FROM agg
            )
            SELECT rk.target, rk.anchor, rk.n_mentions, rk.rank,
                   tot.in_links
            FROM rk JOIN tot USING (target)
            WHERE rank <= 2
        """,
        "triangle_count": """
            WITH nn AS (SELECT count(*)::BIGINT AS n FROM documents),
            base AS (
                SELECT doc_id AS src, t AS dst
                FROM documents, nn,
                     unnest([(doc_id * 2 + 1) % n,
                             (doc_id * 3 + 2) % n,
                             (doc_id * 7 + 5) % n]) AS u(t)
            ), cl AS (
                SELECT doc_id AS v FROM documents, nn
                WHERE doc_id % (n // 6) = 3
            ), clique AS (
                SELECT x.v AS src, y.v AS dst FROM cl x, cl y
                WHERE x.v < y.v
            ), alledges AS (
                SELECT src, dst FROM base
                UNION ALL SELECT src, dst FROM clique
            ), und AS (
                SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
                FROM alledges WHERE src <> dst
            ), deg AS (
                SELECT node, count(*)::BIGINT AS degree
                FROM (SELECT a AS node FROM und
                      UNION ALL SELECT b AS node FROM und)
                GROUP BY node
            ), tri AS (
                SELECT e1.a AS x, e1.b AS y, e2.b AS z
                FROM und e1
                JOIN und e2 ON e2.a = e1.a AND e2.b > e1.b
                JOIN und e3 ON e3.a = e1.b AND e3.b = e2.b
            ), pn AS (
                SELECT node, count(*)::BIGINT AS n_triangles
                FROM (SELECT x AS node FROM tri
                      UNION ALL SELECT y AS node FROM tri
                      UNION ALL SELECT z AS node FROM tri)
                GROUP BY node
            )
            SELECT d.node, d.degree,
                   coalesce(pn.n_triangles, 0)::BIGINT AS n_triangles
            FROM deg d LEFT JOIN pn USING (node)
        """,
        "chunk_text": """
            WITH n AS (
                SELECT doc_id,
                       string_split(trim(regexp_replace(lower(text),
                           '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')), ' ') AS t
                FROM documents
            ), d AS (
                SELECT doc_id, t, len(t)::BIGINT AS n FROM n
            ), e AS (
                SELECT doc_id, t, n, k AS chunk_id
                FROM d, unnest(range(0,
                    ((greatest(n - 32, 0) + 23) // 24) + 1)) AS r(k)
            )
            SELECT doc_id,
                   chunk_id::BIGINT AS chunk_id,
                   (chunk_id * 24)::BIGINT AS start_tok,
                   least(32, n - chunk_id * 24)::BIGINT AS n_chunk_tokens,
                   array_to_string(
                       t[(chunk_id * 24 + 1):least(chunk_id * 24 + 32, n)],
                       ' ') AS chunk_text
            FROM e
        """,
        "pmi_collocations": """
            WITH aug AS (
                SELECT doc_id,
                       text ||
                       CASE WHEN doc_id % 3 = 0
                            THEN ' neural network neural network'
                            ELSE '' END ||
                       CASE WHEN doc_id % 7 = 0
                            THEN ' gradient descent' ELSE '' END ||
                       ' common w' || (doc_id % 13)::VARCHAR AS text
                FROM documents
            ), n AS (
                SELECT doc_id,
                       string_split(trim(regexp_replace(lower(text),
                           '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')), ' ') AS t
                FROM aug
            ), tokpos AS (
                SELECT doc_id, i AS pos, t[i] AS w
                FROM n, unnest(range(1, len(t) + 1)) AS r(i)
            ), bg0 AS (
                SELECT doc_id, w AS w1,
                       lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
                FROM tokpos
            ), bg AS (
                SELECT w1, w2, count(*)::BIGINT AS pair_n
                FROM bg0 WHERE w2 IS NOT NULL GROUP BY w1, w2
            ), l AS (
                SELECT w1, sum(pair_n)::BIGINT AS left_n FROM bg GROUP BY w1
            ), r AS (
                SELECT w2, sum(pair_n)::BIGINT AS right_n FROM bg GROUP BY w2
            ), tot AS (
                SELECT sum(pair_n)::BIGINT AS n_bigrams FROM bg
            )
            SELECT bg.w1, bg.w2, bg.pair_n, l.left_n, r.right_n,
                   floor(log10((bg.pair_n::DOUBLE * tot.n_bigrams::DOUBLE) /
                               (l.left_n::DOUBLE * r.right_n::DOUBLE))
                         * 1000000.0 + 0.5) / 1000000.0 AS pmi
            FROM bg JOIN l USING (w1) JOIN r USING (w2), tot
            WHERE bg.pair_n >= 5
            ORDER BY pmi DESC, bg.w1, bg.w2
            LIMIT 50
        """,
        "normalize_text": """
            WITH aug AS (
                SELECT doc_id,
                       text || CASE doc_id % 4
                         WHEN 0 THEN ' caf' || chr(101) || chr(769)
                         WHEN 1 THEN ' x' || chr(11) || 'y' || chr(127) || 'z'
                         WHEN 2 THEN ' ' || chr(4352) || chr(4449)
                         ELSE ' caf' || chr(233)
                       END AS text
                FROM documents
            ), n AS (
                SELECT doc_id, text, nfc_normalize(text) AS composed FROM aug
            ), s AS (
                SELECT doc_id, text, composed,
                       regexp_replace(composed,
                         '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F-\\x9F]',
                         '', 'g') AS stripped
                FROM n
            )
            SELECT doc_id,
                   stripped AS norm_text,
                   (stripped <> text) AS changed,
                   (length(composed) - length(stripped))::BIGINT AS n_controls_removed
            FROM s
        """,
        "c4_filters": """
            WITH aug AS (
                SELECT doc_id,
                       text
                       || CASE WHEN doc_id % 7 = 0 THEN ' lorem ipsum' ELSE '' END
                       || CASE WHEN doc_id % 11 = 0 THEN ' {' ELSE '' END
                       || CASE WHEN doc_id % 13 = 0 THEN ' enable JavaScript' ELSE '' END
                       || CASE WHEN doc_id % 5 = 0 THEN '. One. Two. Three. Four. Five.' ELSE '' END
                         AS text
                FROM documents
            ), f AS (
                SELECT doc_id,
                       contains(text, '{') AS has_curly,
                       contains(lower(text), 'lorem ipsum') AS has_lorem,
                       contains(lower(text), 'javascript') AS has_javascript,
                       len(list_filter(string_split(text, '.'),
                           s -> trim(s) <> ''))::BIGINT AS n_sentences,
                       len(string_split(trim(regexp_replace(lower(text),
                           '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')), ' '))::BIGINT AS n_words
                FROM aug
            )
            SELECT doc_id, has_curly, has_lorem, has_javascript,
                   n_sentences, (n_sentences >= 5) AS enough_sentences,
                   n_words, (n_words >= 3) AS enough_words,
                   (NOT has_curly AND NOT has_lorem AND NOT has_javascript
                    AND n_sentences >= 5 AND n_words >= 3) AS keep
            FROM f
        """,
        "span_dedup": f"""
            WITH aug AS (
                SELECT doc_id,
                       text || '{_BOILERPLATE_TAIL}' AS text
                FROM documents
            ), l AS (
                SELECT doc_id, string_split(text, '.') AS parts FROM aug
            ), raw AS (
                SELECT doc_id, i AS p, trim(parts[i]) AS sent
                FROM l, unnest(range(1, len(parts) + 1)) AS r(i)
                WHERE trim(parts[i]) <> ''
            ), sent AS (
                SELECT doc_id,
                       row_number() OVER (PARTITION BY doc_id ORDER BY p) AS seq,
                       sent
                FROM raw
            ), spans0 AS (
                SELECT doc_id, seq,
                       md5(sent
                           || chr(31) || lead(sent, 1) OVER w
                           || chr(31) || lead(sent, 2) OVER w) AS h,
                       (lead(sent, 2) OVER w IS NOT NULL) AS is_full
                FROM sent WINDOW w AS (PARTITION BY doc_id ORDER BY seq)
            ), spans AS (
                SELECT doc_id, seq, h FROM spans0 WHERE is_full
            ), marked AS (
                SELECT doc_id, seq,
                       count(*) OVER (PARTITION BY h) AS n_occ,
                       row_number() OVER (PARTITION BY h
                                          ORDER BY doc_id, seq) AS rk
                FROM spans
            ), removed AS (
                SELECT DISTINCT doc_id, u.s AS seq
                FROM marked, unnest([seq, seq + 1, seq + 2]) AS u(s)
                WHERE n_occ > 1 AND rk > 1
            ), kept AS (
                SELECT s.doc_id, s.seq, s.sent
                FROM sent s
                WHERE NOT EXISTS (SELECT 1 FROM removed r
                                  WHERE r.doc_id = s.doc_id AND r.seq = s.seq)
            ), ka AS (
                SELECT doc_id,
                       string_agg(sent, '. ' ORDER BY seq) AS cleaned_text,
                       count(*)::BIGINT AS n_kept
                FROM kept GROUP BY doc_id
            ), tot AS (
                -- anchored on aug (ALL docs), not sent: a doc with no
                -- non-empty sentences must still yield an output row,
                -- mirroring the operator's null/empty-text semantics
                SELECT a.doc_id, count(s.sent)::BIGINT AS n_sentences
                FROM aug a LEFT JOIN sent s USING (doc_id)
                GROUP BY a.doc_id
            )
            SELECT t.doc_id,
                   coalesce(k.cleaned_text, '') AS cleaned_text,
                   t.n_sentences,
                   (t.n_sentences - coalesce(k.n_kept, 0))::BIGINT AS n_removed
            FROM tot t LEFT JOIN ka k USING (doc_id)
        """,
        "exact_substr": f"""
            WITH aug AS (
                SELECT doc_id, text || '{_ES_TAIL}' AS text
                FROM documents
            ), l AS (
                SELECT doc_id,
                       string_split_regex(text,
                           '[ \t\n\x0B\f\r]+') AS parts
                FROM aug
            ), raw AS (
                SELECT doc_id, i AS p, trim(parts[i]) AS tok
                FROM l, unnest(range(1, len(parts) + 1)) AS r(i)
                WHERE trim(parts[i]) <> ''
            ), toks AS (
                SELECT doc_id,
                       row_number() OVER (PARTITION BY doc_id ORDER BY p)
                           AS seq,
                       tok
                FROM raw
            ), grams0 AS (
                SELECT doc_id, seq,
                       md5(tok
                           || chr(31) || lead(tok, 1) OVER w
                           || chr(31) || lead(tok, 2) OVER w
                           || chr(31) || lead(tok, 3) OVER w
                           || chr(31) || lead(tok, 4) OVER w
                           || chr(31) || lead(tok, 5) OVER w
                           || chr(31) || lead(tok, 6) OVER w
                           || chr(31) || lead(tok, 7) OVER w) AS h,
                       (lead(tok, 7) OVER w IS NOT NULL) AS is_full
                FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY seq)
            ), grams AS (
                SELECT doc_id, seq, h FROM grams0 WHERE is_full
            ), marked AS (
                SELECT doc_id, seq,
                       count(*) OVER (PARTITION BY h) AS n_occ,
                       row_number() OVER (PARTITION BY h
                                          ORDER BY doc_id, seq) AS rk
                FROM grams
            ), removed AS (
                SELECT DISTINCT doc_id, u.s AS seq
                FROM marked,
                     unnest([seq, seq + 1, seq + 2, seq + 3,
                             seq + 4, seq + 5, seq + 6, seq + 7]) AS u(s)
                WHERE n_occ > 1 AND rk > 1
            ), kept AS (
                SELECT t.doc_id, t.seq, t.tok
                FROM toks t
                WHERE NOT EXISTS (SELECT 1 FROM removed r
                                  WHERE r.doc_id = t.doc_id
                                    AND r.seq = t.seq)
            ), ka AS (
                SELECT doc_id,
                       string_agg(tok, ' ' ORDER BY seq) AS cleaned_text,
                       count(*)::BIGINT AS n_kept
                FROM kept GROUP BY doc_id
            ), tot AS (
                SELECT a.doc_id, count(t.tok)::BIGINT AS n_tokens
                FROM aug a LEFT JOIN toks t USING (doc_id)
                GROUP BY a.doc_id
            )
            SELECT t.doc_id,
                   coalesce(k.cleaned_text, '') AS cleaned_text,
                   t.n_tokens,
                   (t.n_tokens - coalesce(k.n_kept, 0))::BIGINT
                       AS n_removed_tokens
            FROM tot t LEFT JOIN ka k USING (doc_id)
        """,
        "paragraph_dedup": """
            WITH aug AS (
                SELECT doc_id,
                       replace(text, '. ', chr(10)) || chr(10) ||
                       'Follow our updates page for more stories' AS text
                FROM documents
            ), l AS (
                SELECT doc_id, string_split(text, chr(10)) AS parts FROM aug
            ), raw AS (
                SELECT doc_id, i AS p, trim(parts[i]) AS para
                FROM l, unnest(range(1, len(parts) + 1)) AS r(i)
                WHERE trim(parts[i]) <> ''
            ), sent AS (
                SELECT doc_id,
                       row_number() OVER (PARTITION BY doc_id ORDER BY p) AS seq,
                       para
                FROM raw
            ), marked AS (
                SELECT doc_id, seq,
                       count(*) OVER (PARTITION BY md5(para)) AS n_occ,
                       row_number() OVER (PARTITION BY md5(para)
                                          ORDER BY doc_id, seq) AS rk
                FROM sent
            ), removed AS (
                SELECT doc_id, seq FROM marked WHERE n_occ > 1 AND rk > 1
            ), kept AS (
                SELECT s.doc_id, s.seq, s.para
                FROM sent s
                WHERE NOT EXISTS (SELECT 1 FROM removed r
                                  WHERE r.doc_id = s.doc_id AND r.seq = s.seq)
            ), ka AS (
                SELECT doc_id,
                       string_agg(para, chr(10) ORDER BY seq) AS cleaned_text,
                       count(*)::BIGINT AS n_kept
                FROM kept GROUP BY doc_id
            ), tot AS (
                SELECT a.doc_id, count(s.para)::BIGINT AS n_sentences
                FROM aug a LEFT JOIN sent s USING (doc_id)
                GROUP BY a.doc_id
            )
            SELECT t.doc_id,
                   coalesce(k.cleaned_text, '') AS cleaned_text,
                   t.n_sentences,
                   (t.n_sentences - coalesce(k.n_kept, 0))::BIGINT AS n_removed
            FROM tot t LEFT JOIN ka k USING (doc_id)
        """,
        "page_links": f"""
            WITH t AS ({_TRANSCRIPT_BASE}),
            l(link_idx, href, anchor) AS (
                VALUES (0, '/news', 'News'), (1, '/sports', 'Sports'),
                       (2, '/about', 'About'), (3, '/terms', 'Terms'),
                       (4, '/privacy', 'Privacy')
            )
            SELECT conv_id, turn_idx, link_idx::INT AS link_idx,
                   href, anchor
            FROM t, l
        """,
        "bpe_vocab": _bpe_oracle_sql(8),
        "bpe_encode": _bpe_oracle_sql(8, doc_level=True),
        "tokenize_pack": f"""
            WITH enc AS ({_bpe_oracle_sql(8, doc_level=True)}), o AS (
                SELECT doc_id, n_words, n_bpe_tokens,
                       coalesce(sum(n_bpe_tokens) OVER (ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                           0)::BIGINT AS "offset"
                FROM enc
            )
            SELECT doc_id, n_words, n_bpe_tokens, "offset",
                   ("offset" // 256)::BIGINT AS start_seq,
                   ("offset" % 256)::BIGINT AS start_pos,
                   (CASE WHEN n_bpe_tokens > 0
                         THEN ("offset" + n_bpe_tokens - 1) // 256
                              - "offset" // 256 + 1
                         ELSE 0 END)::BIGINT AS n_seqs
            FROM o
        """,
        "frontier": f"""
            WITH u AS ({_SYNTH_URL_SQL}),
            h AS (
                SELECT doc_id, url,
                       'site' || (doc_id % 7)::VARCHAR || '.com' AS host,
                       (doc_id % 5)::INT AS priority
                FROM u
            )
            SELECT doc_id, url, host, priority,
                   (row_number() OVER (PARTITION BY host
                        ORDER BY priority DESC, doc_id) - 1)::INT AS wave,
                   (row_number() OVER (PARTITION BY host
                        ORDER BY priority DESC, doc_id) - 1)::INT AS host_rank,
                   (count(*) OVER (PARTITION BY host))::BIGINT AS n_host
            FROM h
        """,
        "robots_gate": f"""
            WITH u AS ({_SYNTH_URL_SQL})
            SELECT doc_id, url,
                   'site' || (doc_id % 7)::VARCHAR || '.com' AS host,
                   CASE WHEN (doc_id % 7) % 3 = 0 THEN NOT (doc_id % 5 IN (0, 3))
                        WHEN (doc_id % 7) % 3 = 1 THEN NOT (doc_id % 5 = 4)
                        ELSE TRUE END AS allowed,
                   CASE WHEN (doc_id % 7) % 3 = 0 AND doc_id % 5 = 0 THEN '/news/'
                        WHEN (doc_id % 7) % 3 = 0 AND doc_id % 5 = 3 THEN '/gallery/'
                        WHEN (doc_id % 7) % 3 = 1 AND doc_id % 5 = 4 THEN '/tag-'
                        WHEN (doc_id % 7) % 3 = 1 THEN ''
                        ELSE NULL END AS matched_rule
            FROM u
        """,
        "crawl_prep": f"""
            WITH u AS ({_SYNTH_URL_SQL}),
            probes AS (SELECT unnest(range(0, 4)) AS i),
            bits AS (
                SELECT DISTINCT
                       (('0x' || substring(md5(i::VARCHAR || ':' || url), 1, 15))::BIGINT % 1024) AS pos
                FROM u, probes WHERE doc_id % 4 = 0
            ),
            words AS (
                SELECT pos // 32 AS word_idx,
                       bit_or(1::BIGINT << (pos % 32)::INT) AS word
                FROM bits GROUP BY 1
            ),
            probed AS (
                SELECT u.doc_id,
                       (('0x' || substring(md5(i::VARCHAR || ':' || url), 1, 15))::BIGINT % 1024) AS pos
                FROM u, probes
            ),
            bloomv AS (
                SELECT doc_id,
                       min(CASE WHEN coalesce(w.word, 0) & (1::BIGINT << (pos % 32)::INT) <> 0
                                THEN 1 ELSE 0 END) = 1 AS possibly_seen
                FROM probed LEFT JOIN words w ON w.word_idx = pos // 32
                GROUP BY doc_id
            ),
            k AS (
                SELECT u.doc_id, u.url,
                       'site' || (doc_id % 7)::VARCHAR || '.com' AS host,
                       (doc_id % 7) IN (2, 5) AS blocked,
                       CASE WHEN (doc_id % 7) % 3 = 0 THEN NOT (doc_id % 5 IN (0, 3))
                            WHEN (doc_id % 7) % 3 = 1 THEN NOT (doc_id % 5 = 4)
                            ELSE TRUE END AS allowed,
                       b.possibly_seen,
                       (NOT (doc_id % 7) IN (2, 5)
                        AND (CASE WHEN (doc_id % 7) % 3 = 0 THEN NOT (doc_id % 5 IN (0, 3))
                                  WHEN (doc_id % 7) % 3 = 1 THEN NOT (doc_id % 5 = 4)
                                  ELSE TRUE END)
                        AND NOT b.possibly_seen) AS kept
                FROM u JOIN bloomv b USING (doc_id)
            ),
            s AS (
                SELECT doc_id,
                       (row_number() OVER (PARTITION BY host
                            ORDER BY (doc_id % 5) DESC, doc_id) - 1)::INT AS wave
                FROM k WHERE kept
            )
            SELECT k.doc_id, k.url, k.host, k.blocked, k.allowed,
                   k.possibly_seen, k.kept, s.wave
            FROM k LEFT JOIN s USING (doc_id)
        """,
        "quality_buckets": """
            WITH n AS (
                SELECT doc_id,
                       string_split(trim(regexp_replace(lower(text), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')), ' ') AS t
                FROM documents
            ), tok AS (
                SELECT doc_id, unnest(t) AS tok FROM n
            ), dt AS (
                SELECT doc_id, tok, count(*)::BIGINT AS k
                FROM tok GROUP BY doc_id, tok
            ), vocab AS (
                SELECT tok, sum(k)::BIGINT AS cnt FROM dt GROUP BY tok
            ), tot AS (
                SELECT sum(cnt)::BIGINT AS n_corpus FROM vocab
            ), lp AS (
                SELECT tok, log10(cnt::DOUBLE / n_corpus) AS logp
                FROM vocab, tot
            ), s AS (
                SELECT dt.doc_id,
                       floor((sum(dt.k * lp.logp) / sum(dt.k))::DOUBLE * 1000000.0 + 0.5)
                         / 1000000.0 AS mean_logprob
                FROM dt JOIN lp USING (tok)
                GROUP BY dt.doc_id
            ), b AS (
                SELECT doc_id, mean_logprob,
                       floor(mean_logprob * 1000.0)::BIGINT AS score_bin
                FROM s
            ), hist AS (
                SELECT score_bin, count(*)::BIGINT AS c FROM b GROUP BY 1
            ), cum AS (
                SELECT score_bin,
                       (sum(c) OVER (ORDER BY score_bin))::BIGINT - c AS c_lt
                FROM hist
            ), t2 AS (
                SELECT count(*)::BIGINT AS n FROM b
            )
            SELECT b.doc_id, b.mean_logprob, b.score_bin,
                   CASE WHEN cum.c_lt < (t2.n * 1) // 3 THEN 'head'
                        WHEN cum.c_lt < (t2.n * 2) // 3 THEN 'middle'
                        ELSE 'tail' END AS bucket
            FROM b JOIN cum USING (score_bin), t2
        """,
        "feed_entries": """
            WITH ent AS (
                SELECT doc_id, unnest(range(0, doc_id % 3 + 1)) AS j
                FROM documents WHERE doc_id % 10 <> 9
            )
            SELECT doc_id AS feed_id,
                   CASE WHEN doc_id % 2 = 0 THEN 'rss' ELSE 'atom' END AS fmt,
                   j::INT AS entry_idx,
                   'Story ' || doc_id::VARCHAR || '-' || j::VARCHAR || ' & more' AS title,
                   'http://site' || (doc_id % 7)::VARCHAR || '.com/feed/item-'
                       || doc_id::VARCHAR || '-' || j::VARCHAR || '.html' AS link,
                   CASE WHEN doc_id % 2 = 0
                        THEN 'Tue, 30 Dec 2014 10:' || lpad((doc_id % 60)::VARCHAR, 2, '0') || ':00 GMT'
                        ELSE '2014-12-30T10:' || lpad((doc_id % 60)::VARCHAR, 2, '0') || ':00Z' END AS published,
                   NULL::VARCHAR AS error
            FROM ent
            UNION ALL
            SELECT doc_id, NULL, NULL, NULL, NULL, NULL, 'malformed-xml'
            FROM documents WHERE doc_id % 10 = 9
        """,
        "feed_urls": """
            WITH ent AS (
                SELECT doc_id, unnest(range(0, doc_id % 3 + 1)) AS j
                FROM documents
            ), seg AS (
                SELECT doc_id, j,
                       'http://site' || (doc_id % 7)::VARCHAR || '.com/feed/item-'
                           || doc_id::VARCHAR || '-' || j::VARCHAR || '.html' AS url,
                       lpad((doc_id % 60)::VARCHAR, 2, '0') AS mm
                FROM ent
            ), parts AS (
                SELECT doc_id,
                       string_agg(CASE WHEN doc_id % 2 = 0 THEN
                           '<item><title>Story ' || doc_id::VARCHAR || '-' || j::VARCHAR
                           || ' &amp; more</title><link>' || url
                           || '</link><pubDate>Tue, 30 Dec 2014 10:' || mm
                           || ':00 GMT</pubDate></item>'
                         ELSE
                           '<entry><title>Story ' || doc_id::VARCHAR || '-' || j::VARCHAR
                           || ' &amp; more</title><link href="' || url
                           || '"/><updated>2014-12-30T10:' || mm
                           || ':00Z</updated></entry>' END, '' ORDER BY j) AS body
                FROM seg GROUP BY doc_id
            ), x AS (
                SELECT doc_id AS feed_id,
                       CASE WHEN doc_id % 10 = 9 THEN '<rss><channel><item><title>broken'
                            WHEN doc_id % 2 = 0 THEN
                              '<?xml version="1.0"?><rss version="2.0"><channel><title>Feed '
                              || doc_id::VARCHAR || '</title>' || body || '</channel></rss>'
                            ELSE
                              '<feed xmlns="http://www.w3.org/2005/Atom"><title>Feed '
                              || doc_id::VARCHAR || '</title>' || body || '</feed>' END AS xml
                FROM parts
            ), u AS (
                SELECT feed_id,
                       regexp_extract_all(regexp_replace(xml, '<[^<]+?>', ' ', 'g'),
                           'http[s]?://(?:[a-zA-Z]|[0-9]|[$-_@.&+]|[!*\\(\\),]|(?:%[0-9a-fA-F][0-9a-fA-F]))+') AS l
                FROM x
            )
            SELECT feed_id, (i - 1)::INT AS url_idx, l[i] AS url
            FROM u, unnest(range(1, len(l) + 1)) AS r(i)
        """,
        "bloom_seen": f"""
            WITH u AS ({_SYNTH_URL_SQL}),
            probes AS (SELECT unnest(range(0, 4)) AS i),
            bits AS (
                SELECT DISTINCT
                       (('0x' || substring(md5(i::VARCHAR || ':' || url), 1, 15))::BIGINT % 1024) AS pos
                FROM u, probes WHERE doc_id % 4 = 0
            ),
            words AS (
                SELECT pos // 32 AS word_idx,
                       bit_or(1::BIGINT << (pos % 32)::INT) AS word
                FROM bits GROUP BY 1
            ),
            probed AS (
                SELECT u.doc_id, u.url,
                       (('0x' || substring(md5(i::VARCHAR || ':' || url), 1, 15))::BIGINT % 1024) AS pos
                FROM u, probes
            ),
            verdict AS (
                SELECT doc_id,
                       min(CASE WHEN coalesce(w.word, 0) & (1::BIGINT << (pos % 32)::INT) <> 0
                                THEN 1 ELSE 0 END) = 1 AS possibly_seen
                FROM probed LEFT JOIN words w ON w.word_idx = pos // 32
                GROUP BY doc_id
            )
            SELECT u.doc_id, u.url, v.possibly_seen,
                   (u.doc_id % 4 = 0) AS exact_seen,
                   (v.possibly_seen AND NOT (u.doc_id % 4 = 0)) AS is_false_positive
            FROM u JOIN verdict v USING (doc_id)
        """,
        "url_blocklist": f"""
            WITH u AS ({_SYNTH_URL_SQL})
            SELECT doc_id, url,
                   (doc_id % 7) IN (2, 5) AS blocked,
                   CASE WHEN (doc_id % 7) IN (2, 5)
                        THEN 'site' || (doc_id % 7)::VARCHAR || '.com'
                   END AS blocked_domain
            FROM u
        """,
        "line_filters": """
            WITH aug AS (
                SELECT doc_id,
                       replace(text, ' value ', chr(10))
                       || CASE WHEN doc_id % 2 = 0
                               THEN chr(10) || ((doc_id * 7) % 89 + 11)::VARCHAR || ' likes'
                               ELSE '' END
                       || CASE WHEN doc_id % 3 = 0
                               THEN chr(10) || 'READ THE FULL STORY HERE NOW'
                               ELSE '' END
                       || CASE WHEN doc_id % 5 = 0
                               THEN chr(10) || 'Subscribe to our newsletter to read more today'
                               ELSE '' END
                       || CASE WHEN doc_id % 7 = 0
                               THEN chr(10) || '42.5%'
                               ELSE '' END AS text
                FROM documents
            ), l AS (
                SELECT doc_id,
                       string_split(coalesce(text, ''), chr(10)) AS lines
                FROM aug
            ), ln AS (
                SELECT doc_id, i,
                       regexp_replace(lines[i], '^[ \\t\\r]+|[ \\t\\r]+$', '', 'g') AS s
                FROM l, unnest(range(1, len(lines) + 1)) AS r(i)
            ), c AS (
                SELECT doc_id, i, s,
                       trim(regexp_replace(lower(s), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')) AS col
                FROM ln
            ), p AS (
                SELECT doc_id, i, s,
                       CASE WHEN col = '' THEN 0
                            ELSE len(string_split(col, ' ')) END AS wc,
                       ((regexp_matches(s, '^[0-9 .,:%/+-]+$') AND regexp_matches(s, '[0-9]'))
                        OR regexp_matches(lower(s), '^[0-9]+ (likes?|comments?|shares?|views?|retweets?|replies)$')
                        OR (regexp_matches(s, '[A-Z]') AND NOT regexp_matches(s, '[a-z]'))
                        OR (CASE WHEN col = '' THEN 0
                                 ELSE len(string_split(col, ' ')) END <= 10
                            AND (contains(lower(s), 'sign in')
                                 OR contains(lower(s), 'sign up')
                                 OR contains(lower(s), 'read more')
                                 OR contains(lower(s), 'subscribe')
                                 OR contains(lower(s), 'click here')
                                 OR contains(lower(s), 'all rights reserved')
                                 OR contains(lower(s), 'items in cart')
                                 OR contains(lower(s), 'terms of use')
                                 OR contains(lower(s), 'privacy policy')
                                 OR contains(lower(s), 'accept cookies')))) AS bad
                FROM c
            )
            SELECT doc_id,
                   coalesce(string_agg(CASE WHEN NOT bad THEN s END, chr(10) ORDER BY i), '') AS cleaned_text,
                   count(*)::BIGINT AS n_lines,
                   sum(CASE WHEN bad THEN 1 ELSE 0 END)::BIGINT AS n_removed_lines,
                   coalesce(sum(CASE WHEN bad THEN wc END), 0)::BIGINT AS removed_words,
                   sum(wc)::BIGINT AS total_words,
                   (20 * coalesce(sum(CASE WHEN bad THEN wc END), 0) <= sum(wc)) AS keep
            FROM p GROUP BY doc_id
        """,
        "gopher_filters": """
            WITH base AS (
                SELECT doc_id,
                       coalesce(text, '') AS c,
                       trim(regexp_replace(lower(coalesce(text, '')), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')) AS norm
                FROM documents
            ), t AS (
                SELECT doc_id, n_words, total_wchars, n_hash, n_ellipsis,
                       len(lines)::BIGINT AS n_lines,
                       len(list_filter(lines, s -> starts_with(s, '•')
                                              OR starts_with(s, '- ')
                                              OR starts_with(s, '* ')))::BIGINT AS n_bullet,
                       len(list_filter(lines, s -> ends_with(s, '...')
                                              OR ends_with(s, '…')))::BIGINT AS n_ell,
                       len(list_filter(toks, tk -> regexp_matches(tk, '[a-zA-Z]')))::BIGINT AS n_alpha,
                       (CASE WHEN list_contains(toks, 'the') THEN 1 ELSE 0 END
                        + CASE WHEN list_contains(toks, 'be') THEN 1 ELSE 0 END
                        + CASE WHEN list_contains(toks, 'to') THEN 1 ELSE 0 END
                        + CASE WHEN list_contains(toks, 'of') THEN 1 ELSE 0 END
                        + CASE WHEN list_contains(toks, 'and') THEN 1 ELSE 0 END
                        + CASE WHEN list_contains(toks, 'that') THEN 1 ELSE 0 END
                        + CASE WHEN list_contains(toks, 'have') THEN 1 ELSE 0 END
                        + CASE WHEN list_contains(toks, 'with') THEN 1 ELSE 0 END)::BIGINT AS n_stop
                FROM (
                    SELECT doc_id,
                           CASE WHEN norm = '' THEN 0
                                ELSE len(string_split(norm, ' ')) END::BIGINT AS n_words,
                           length(replace(norm, ' ', ''))::BIGINT AS total_wchars,
                           (length(c) - length(replace(c, '#', '')))::BIGINT AS n_hash,
                           (((length(c) - length(replace(c, '...', ''))) // 3)
                            + (length(c) - length(replace(c, '…', ''))))::BIGINT AS n_ellipsis,
                           list_filter(list_transform(string_split(c, chr(10)),
                                                      s -> regexp_replace(s, '^[ \\t\\r]+|[ \\t\\r]+$', '', 'g')),
                                       s -> s <> '') AS lines,
                           string_split(norm, ' ') AS toks
                    FROM base
                )
            )
            SELECT doc_id,
                   n_words,
                   n_lines,
                   (n_words >= 50 AND n_words <= 100000) AS word_count_ok,
                   (n_words > 0 AND 3 * n_words <= total_wchars
                    AND total_wchars <= 10 * n_words) AS mean_word_len_ok,
                   (10 * n_hash <= n_words AND 10 * n_ellipsis <= n_words) AS symbol_ratio_ok,
                   (10 * n_bullet <= 9 * n_lines) AS bullet_ok,
                   (10 * n_ell <= 3 * n_lines) AS ellipsis_ok,
                   (n_words > 0 AND 5 * n_alpha >= 4 * n_words) AS alpha_ok,
                   (n_stop >= 2) AS stopword_ok,
                   ((n_words >= 50 AND n_words <= 100000)
                    AND (n_words > 0 AND 3 * n_words <= total_wchars
                         AND total_wchars <= 10 * n_words)
                    AND (10 * n_hash <= n_words AND 10 * n_ellipsis <= n_words)
                    AND (10 * n_bullet <= 9 * n_lines)
                    AND (10 * n_ell <= 3 * n_lines)
                    AND (n_words > 0 AND 5 * n_alpha >= 4 * n_words)
                    AND (n_stop >= 2)) AS keep
            FROM t
        """,
        "dsir": """
            WITH n AS (
                SELECT doc_id,
                       string_split(trim(regexp_replace(lower(text), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')), ' ') AS t
                FROM documents
            ), g AS (
                SELECT doc_id,
                       unnest(list_concat(t,
                           CASE WHEN len(t) >= 2
                                THEN list_transform(generate_series(1, len(t) - 1),
                                                    i -> t[i] || ' ' || t[i + 1])
                                ELSE []::VARCHAR[] END)) AS gram
                FROM n
            ), bk AS (
                SELECT doc_id,
                       ('0x' || substring(md5(gram), 1, 15))::BIGINT % 1024 AS b
                FROM g
            ), fr AS (
                SELECT doc_id, b, count(*)::BIGINT AS k FROM bk GROUP BY doc_id, b
            ), cr AS (
                SELECT b, sum(k)::BIGINT AS c_r FROM fr GROUP BY b
            ), ct AS (
                SELECT b, sum(k)::BIGINT AS c_t FROM fr WHERE doc_id % 10 = 0 GROUP BY b
            ), nr AS (
                SELECT sum(c_r)::BIGINT AS n_r FROM cr
            ), nt AS (
                SELECT coalesce(sum(c_t), 0)::BIGINT AS n_t FROM ct
            ), lr AS (
                SELECT cr.b,
                       log10(((coalesce(ct.c_t, 0) + 1)::DOUBLE * (n_r + 1024)::DOUBLE)
                             / ((cr.c_r + 1)::DOUBLE * (n_t + 1024)::DOUBLE)) AS lr
                FROM cr LEFT JOIN ct USING (b), nr, nt
            )
            SELECT fr.doc_id,
                   sum(fr.k)::BIGINT AS n_feats,
                   floor(sum(fr.k * lr.lr) * 1000000.0 + 0.5) / 1000000.0 AS dsir_logratio
            FROM fr JOIN lr USING (b)
            GROUP BY fr.doc_id
        """,
        "quality_classifier": """
            WITH n AS (
                SELECT doc_id,
                       string_split(trim(regexp_replace(lower(text), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')), ' ') AS t
                FROM documents
            ), g AS (
                SELECT doc_id,
                       unnest(list_concat(t,
                           CASE WHEN len(t) >= 2
                                THEN list_transform(generate_series(1, len(t) - 1),
                                                    i -> t[i] || ' ' || t[i + 1])
                                ELSE []::VARCHAR[] END)) AS gram
                FROM n
            ), bk AS (
                SELECT doc_id,
                       ('0x' || substring(md5(gram), 1, 15))::BIGINT % 1024 AS b
                FROM g
            ), fr AS (
                SELECT doc_id, b, count(*)::BIGINT AS k FROM bk GROUP BY doc_id, b
            ), cb AS (
                SELECT b,
                       sum(CASE WHEN doc_id % 10 = 0 THEN k ELSE 0 END)::BIGINT AS c_p,
                       sum(CASE WHEN doc_id % 10 <> 0 THEN k ELSE 0 END)::BIGINT AS c_n
                FROM fr WHERE doc_id % 2 = 0 GROUP BY b
            ), tot AS (
                SELECT coalesce(sum(c_p), 0)::BIGINT AS n_p,
                       coalesce(sum(c_n), 0)::BIGINT AS n_n
                FROM cb
            ), dc AS (
                SELECT count(DISTINCT CASE WHEN doc_id % 10 = 0 THEN doc_id END)::BIGINT AS d_p,
                       count(DISTINCT CASE WHEN doc_id % 10 <> 0 THEN doc_id END)::BIGINT AS d_n
                FROM documents WHERE doc_id % 2 = 0
            ), consts AS (
                SELECT log10((n_n + 1024)::DOUBLE / (n_p + 1024)::DOUBLE) AS lr0,
                       log10(d_p::DOUBLE / d_n::DOUBLE) AS prior
                FROM tot, dc
            ), lr AS (
                SELECT cb.b,
                       log10(((cb.c_p + 1)::DOUBLE * (n_n + 1024)::DOUBLE)
                             / ((cb.c_n + 1)::DOUBLE * (n_p + 1024)::DOUBLE)) AS lr
                FROM cb, tot
            ), sc AS (
                SELECT fr.doc_id,
                       sum(fr.k)::BIGINT AS n_feats,
                       floor((consts.prior
                              + sum(fr.k * coalesce(lr.lr, consts.lr0)))
                             * 1000000.0 + 0.5) / 1000000.0 AS nb_logodds
                FROM fr LEFT JOIN lr USING (b), consts
                GROUP BY fr.doc_id, consts.prior, consts.lr0
            )
            SELECT doc_id, n_feats, nb_logodds,
                   nb_logodds > 0 AS pred_hq
            FROM sc
        """,
        "unigram_logprob": """
            WITH n AS (
                SELECT doc_id,
                       string_split(trim(regexp_replace(lower(text), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')), ' ') AS t
                FROM documents
            ), tok AS (
                SELECT doc_id, unnest(t) AS tok FROM n
            ), dt AS (
                SELECT doc_id, tok, count(*)::BIGINT AS k
                FROM tok GROUP BY doc_id, tok
            ), vocab AS (
                SELECT tok, sum(k)::BIGINT AS cnt FROM dt GROUP BY tok
            ), tot AS (
                SELECT sum(cnt)::BIGINT AS n_corpus FROM vocab
            ), lp AS (
                SELECT tok, log10(cnt::DOUBLE / n_corpus) AS logp
                FROM vocab, tot
            )
            SELECT dt.doc_id,
                   sum(dt.k)::BIGINT AS n_tokens,
                   floor((sum(dt.k * lp.logp) / sum(dt.k))::DOUBLE * 1000000.0 + 0.5)
                     / 1000000.0 AS mean_logprob
            FROM dt JOIN lp USING (tok)
            GROUP BY dt.doc_id
        """,
        "stupid_backoff": """
            WITH n AS (
                SELECT doc_id,
                       string_split(trim(regexp_replace(lower(text), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')), ' ') AS t
                FROM documents
            ), tokpos AS (
                SELECT doc_id, i AS pos, t[i] AS w
                FROM n, unnest(range(1, len(t) + 1)) AS r(i)
            ), bg0 AS (
                SELECT doc_id, w AS w1,
                       lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
                FROM tokpos
            ), bg AS (
                SELECT doc_id, w1, w2 FROM bg0 WHERE w2 IS NOT NULL
            ), tuni AS (
                SELECT w AS tok, count(*)::BIGINT AS c1
                FROM tokpos WHERE doc_id % 2 = 0 GROUP BY w
            ), tot AS (
                SELECT sum(c1)::BIGINT AS n_corpus,
                       count(*)::BIGINT AS v_corpus
                FROM tuni
            ), tbg AS (
                SELECT w1, w2, count(*)::BIGINT AS c2
                FROM bg WHERE doc_id % 2 = 0 GROUP BY w1, w2
            ), m2 AS (
                SELECT tbg.w1, tbg.w2, tbg.c2, u.c1 AS c1w1
                FROM tbg JOIN tuni u ON u.tok = tbg.w1
            ), docbg AS (
                SELECT doc_id, w1, w2, count(*)::BIGINT AS k
                FROM bg GROUP BY doc_id, w1, w2
            ), sc AS (
                SELECT d.doc_id, d.k,
                       CASE WHEN m2.c2 IS NOT NULL
                            THEN log10(m2.c2::DOUBLE / m2.c1w1::DOUBLE)
                            ELSE log10(0.4::DOUBLE *
                                 ((coalesce(u2.c1, 0) + 1)::DOUBLE /
                                  (tot.n_corpus + tot.v_corpus)::DOUBLE))
                       END AS logp
                FROM docbg d
                LEFT JOIN m2 ON m2.w1 = d.w1 AND m2.w2 = d.w2
                LEFT JOIN tuni u2 ON u2.tok = d.w2, tot
            ), agg AS (
                SELECT doc_id, sum(k)::BIGINT AS n_bigrams,
                       sum(k::DOUBLE * logp) AS s
                FROM sc GROUP BY doc_id
            )
            SELECT docs.doc_id,
                   coalesce(a.n_bigrams, 0)::BIGINT AS n_bigrams,
                   coalesce(floor((a.s / a.n_bigrams)::DOUBLE * 1000000.0
                                  + 0.5) / 1000000.0,
                            0.0::DOUBLE) AS sb_logprob
            FROM documents docs LEFT JOIN agg a USING (doc_id)
        """,
        "fingerprint": """
            SELECT doc_id,
                   md5(trim(regexp_replace(lower(text), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g'))) AS fingerprint
            FROM documents
        """,
        "winnow": """
            WITH t AS (
                SELECT doc_id, text,
                       greatest(length(text) - 8 + 1, 1) AS n
                FROM documents
            ), g AS (
                SELECT doc_id, n,
                       unnest(generate_series(1, n)) AS pos,
                       text
                FROM t
            ), h AS (
                SELECT doc_id, n, pos,
                       ('0x' || substring(md5(substring(text, pos, 8)), 1, 15))::BIGINT AS h
                FROM g
            ), m AS (
                SELECT doc_id, pos, n,
                       min(h) OVER (PARTITION BY doc_id ORDER BY pos
                                    ROWS BETWEEN CURRENT ROW AND 15 FOLLOWING) AS mh
                FROM h
            )
            SELECT DISTINCT doc_id, mh AS fingerprint
            FROM m WHERE pos <= greatest(n - 16 + 1, 1)
        """,
        "contamination": """
            WITH t AS (
                SELECT doc_id, text, greatest(length(text) - 8 + 1, 1) AS n
                FROM documents
            ), g AS (
                SELECT doc_id, n, unnest(generate_series(1, n)) AS pos, text FROM t
            ), h AS (
                SELECT doc_id, n, pos,
                       ('0x' || substring(md5(substring(text, pos, 8)), 1, 15))::BIGINT AS h
                FROM g
            ), m AS (
                SELECT doc_id, pos, n,
                       min(h) OVER (PARTITION BY doc_id ORDER BY pos
                                    ROWS BETWEEN CURRENT ROW AND 15 FOLLOWING) AS mh
                FROM h
            ), fps AS (
                SELECT DISTINCT doc_id, mh AS fingerprint
                FROM m WHERE pos <= greatest(n - 16 + 1, 1)
            ), eval_fps AS (
                SELECT DISTINCT fingerprint FROM fps WHERE doc_id % 10 = 0
            )
            SELECT f.doc_id, count(*) AS n_shared_fps
            FROM fps f JOIN eval_fps e USING (fingerprint)
            WHERE f.doc_id % 10 <> 0
            GROUP BY f.doc_id
        """,
        "sessionize": """
            WITH flagged AS (
                SELECT user_id, ts, event_id,
                       CASE WHEN lag(ts) OVER w IS NULL
                              OR floor(epoch(ts))::BIGINT - floor(epoch(lag(ts) OVER w))::BIGINT > 1800
                            THEN 1 ELSE 0 END AS newf
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), sess AS (
                SELECT user_id, ts,
                       sum(newf) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                       ROWS UNBOUNDED PRECEDING)::INT AS session_id
                FROM flagged
            )
            SELECT user_id, session_id,
                   count(*) AS n_events,
                   min(ts) AS session_start,
                   max(ts) AS session_end,
                   max(floor(epoch(ts))::BIGINT) - min(floor(epoch(ts))::BIGINT) AS duration_s
            FROM sess GROUP BY user_id, session_id
        """,
        "events_hourly": """
            SELECT date_trunc('hour', ts) AS hour, event_type,
                   count(*) AS n, round(sum(value), 4) AS sum_value
            FROM events
            GROUP BY 1, 2
        """,
        "corpus_prep": _corpus_prep_oracle(),
        "bm25_topk": """
            WITH enr AS (
                SELECT doc_id,
                       coalesce(text, '') || ' tok' || (doc_id % 97)::VARCHAR AS text
                FROM documents
            ), n AS (
                SELECT doc_id,
                       string_split(trim(regexp_replace(lower(coalesce(text, '')), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')), ' ') AS t
                FROM enr
            ), dlen AS (
                SELECT doc_id, len(t)::BIGINT AS dl, t FROM n
            ), stats AS (
                SELECT count(*)::BIGINT AS n_docs, sum(dl)::BIGINT AS total_len
                FROM dlen
            ), qt AS (
                SELECT n.doc_id AS qid, unnest(t[1:6]) AS term
                FROM n JOIN enr USING (doc_id)
                WHERE n.doc_id % 17 = 5 AND length(trim(text)) > 0
                UNION ALL
                SELECT n.doc_id AS qid, 'tok' || (n.doc_id % 97)::VARCHAR AS term
                FROM n JOIN enr USING (doc_id)
                WHERE n.doc_id % 17 = 5 AND length(trim(text)) > 0
            ), qterms AS (
                SELECT DISTINCT qid, term FROM qt WHERE term <> ''
            ), tset AS (
                SELECT DISTINCT term FROM qterms
            ), tok AS (
                SELECT doc_id AS id, dl, unnest(t) AS term FROM dlen
            ), post AS (
                SELECT id, dl, term, count(*)::BIGINT AS tf
                FROM tok JOIN tset USING (term)
                GROUP BY id, dl, term
            ), dft AS (
                SELECT term, count(DISTINCT id)::BIGINT AS df
                FROM post GROUP BY term
                HAVING count(DISTINCT id) <= 200
            ), sc AS (
                SELECT q.qid, p.id,
                       count(*)::BIGINT AS n_terms_matched,
                       sum(floor(
                           log10((2 * n_docs - 2 * df + 1)::DOUBLE
                                 / (2 * df + 1)::DOUBLE)
                           * (((2200 * tf)::DOUBLE * total_len::DOUBLE)
                              / ((1000 * tf)::DOUBLE * total_len::DOUBLE
                                 + (300 * total_len)::DOUBLE
                                 + (900 * dl)::DOUBLE * n_docs::DOUBLE))
                           * 1000000.0 + 0.5)::BIGINT)::BIGINT AS score_u
                FROM post p JOIN dft USING (term) JOIN qterms q USING (term),
                     stats
                GROUP BY q.qid, p.id
            ), rk AS (
                SELECT qid, id, n_terms_matched, score_u,
                       row_number() OVER (
                           PARTITION BY qid
                           ORDER BY score_u DESC, id ASC
                       ) AS rank
                FROM sc
            )
            SELECT qid AS query_id, rank::INT AS rank, id AS doc_id,
                   n_terms_matched, score_u::DOUBLE / 1000000.0 AS bm25
            FROM rk WHERE rank <= 5
        """,
        "ccnet_prep": _ccnet_prep_oracle(),
        "warc_records": """
            WITH d AS (
                SELECT doc_id, coalesce(text, '') AS body,
                       CAST(doc_id // 8 AS BIGINT) AS file_id
                FROM documents
            ), ic AS (
                -- the warcinfo record is identical for every file:
                -- its block length and total record octets are scalars
                SELECT octet_length(encode(
                           'software: spark-newsprint' || chr(13) || chr(10)
                           || 'format: WARC File Format 1.0'
                           || chr(13) || chr(10)
                       ))::BIGINT AS i_cl
            ), ic2 AS (
                SELECT i_cl,
                       octet_length(encode(
                           'WARC/1.0' || chr(13) || chr(10)
                           || 'WARC-Type: warcinfo' || chr(13) || chr(10)
                           || 'WARC-Record-ID: <urn:uuid:'
                           || repeat('0', 32) || '>' || chr(13) || chr(10)
                           || 'WARC-Date: 2026-01-01T00:00:00Z'
                           || chr(13) || chr(10)
                           || 'Content-Type: application/warc-fields'
                           || chr(13) || chr(10)
                           || 'Content-Length: ' || i_cl::VARCHAR
                           || chr(13) || chr(10) || chr(13) || chr(10)
                       ))::BIGINT + i_cl + 4 AS i_rb
                FROM ic
            ), r1 AS (
                SELECT file_id, doc_id, body,
                       '<urn:uuid:' || md5(doc_id::VARCHAR) || '>' AS record_id,
                       'http://site' || (doc_id % 7)::VARCHAR
                           || '.com/doc/' || doc_id::VARCHAR AS target_uri,
                       '2026-01-' || lpad(((doc_id % 28) + 1)::VARCHAR, 2, '0')
                           || 'T00:00:00Z' AS warc_date,
                       octet_length(encode(
                           'HTTP/1.1 200 OK' || chr(13) || chr(10)
                           || 'Content-Type: text/html; charset=utf-8'
                           || chr(13) || chr(10)
                           || 'Content-Length: '
                           || octet_length(encode(body))::VARCHAR
                           || chr(13) || chr(10) || chr(13) || chr(10)
                           || body
                       ))::BIGINT AS content_length
                FROM d
            ), r2 AS (
                SELECT *,
                       octet_length(encode(
                           'WARC/1.0' || chr(13) || chr(10)
                           || 'WARC-Type: response' || chr(13) || chr(10)
                           || 'WARC-Record-ID: ' || record_id
                           || chr(13) || chr(10)
                           || 'WARC-Date: ' || warc_date
                           || chr(13) || chr(10)
                           || 'WARC-Target-URI: ' || target_uri
                           || chr(13) || chr(10)
                           || 'Content-Type: application/http;msgtype=response'
                           || chr(13) || chr(10)
                           || 'Content-Length: ' || content_length::VARCHAR
                           || chr(13) || chr(10) || chr(13) || chr(10)
                       ))::BIGINT + content_length + 4 AS record_bytes
                FROM r1
            ), resp AS (
                SELECT file_id,
                       (row_number() OVER (
                           PARTITION BY file_id ORDER BY doc_id
                       ))::INT AS rec_idx,
                       (i_rb + coalesce(sum(record_bytes) OVER (
                           PARTITION BY file_id ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING
                       ), 0))::BIGINT AS "offset",
                       record_bytes,
                       'response' AS warc_type,
                       record_id, target_uri, warc_date,
                       content_length,
                       200::INT AS http_status,
                       'text/html; charset=utf-8' AS http_content_type,
                       body AS payload_text,
                       NULL::VARCHAR AS error
                FROM r2, ic2
            ), info AS (
                SELECT DISTINCT file_id,
                       0::INT AS rec_idx,
                       0::BIGINT AS "offset",
                       i_rb AS record_bytes,
                       'warcinfo' AS warc_type,
                       '<urn:uuid:' || md5('info' || file_id::VARCHAR)
                           || '>' AS record_id,
                       NULL::VARCHAR AS target_uri,
                       '2026-01-01T00:00:00Z' AS warc_date,
                       i_cl AS content_length,
                       NULL::INT AS http_status,
                       NULL::VARCHAR AS http_content_type,
                       'software: spark-newsprint' || chr(13) || chr(10)
                           || 'format: WARC File Format 1.0'
                           || chr(13) || chr(10) AS payload_text,
                       NULL::VARCHAR AS error
                FROM d, ic2
            )
            SELECT * FROM resp UNION ALL SELECT * FROM info
        """,
        "kmv_distinct": f"""
            WITH u AS ({_SYNTH_URL_SQL}),
            v AS (
                SELECT d.source, u.url
                FROM u JOIN documents d USING (doc_id)
            ), hs AS (
                SELECT DISTINCT source,
                       ('0x' || substring(md5(url), 1, 15))::BIGINT AS h
                FROM v
            ), tk AS (
                SELECT source, h,
                       row_number() OVER (
                           PARTITION BY source ORDER BY h
                       ) AS rn
                FROM hs
            ), ag AS (
                SELECT source, count(*)::BIGINT AS n_hashes,
                       max(h)::BIGINT AS kth_min_hash
                FROM tk WHERE rn <= 64 GROUP BY source
            ), hg AS (
                SELECT DISTINCT ('0x' || substring(md5(url), 1, 15))::BIGINT AS h
                FROM v
            ), tg AS (
                SELECT h, row_number() OVER (ORDER BY h) AS rn FROM hg
            ), agg AS (
                SELECT count(*)::BIGINT AS n_hashes,
                       max(h)::BIGINT AS kth_min_hash
                FROM tg WHERE rn <= 64
            )
            SELECT source, n_hashes, kth_min_hash,
                   (CASE WHEN n_hashes < 64 THEN n_hashes
                         ELSE floor((63::DOUBLE * 1152921504606846976::DOUBLE)
                                    / kth_min_hash::DOUBLE)::BIGINT
                    END)::BIGINT AS est_distinct
            FROM ag
            UNION ALL
            SELECT '__ALL__', n_hashes, kth_min_hash,
                   (CASE WHEN n_hashes < 64 THEN n_hashes
                         ELSE floor((63::DOUBLE * 1152921504606846976::DOUBLE)
                                    / kth_min_hash::DOUBLE)::BIGINT
                    END)::BIGINT AS est_distinct
            FROM agg
        """,
        "heavy_hitters": """
            WITH toks AS (
                SELECT unnest(string_split(text, ' ')) AS tok
                FROM documents
                UNION ALL
                SELECT 'tok-r' || (doc_id % 211)::VARCHAR FROM documents
            ), rr AS (
                SELECT unnest([0, 1, 2]) AS r
            ), tot AS (
                SELECT (count(*) // 30)::BIGINT AS threshold FROM toks
            ), counters AS (
                SELECT r,
                       ('0x' || substring(
                            md5('cms' || r::VARCHAR || ':' || tok), 1, 15
                        ))::BIGINT % 64 AS col,
                       count(*)::BIGINT AS cnt
                FROM toks, rr
                GROUP BY 1, 2
            ), cand AS (
                SELECT DISTINCT tok FROM toks
            ), probes AS (
                SELECT tok, r,
                       ('0x' || substring(
                            md5('cms' || r::VARCHAR || ':' || tok), 1, 15
                        ))::BIGINT % 64 AS col
                FROM cand, rr
            ), est AS (
                SELECT p.tok,
                       min(coalesce(c.cnt, 0))::BIGINT AS est_count
                FROM probes p
                LEFT JOIN counters c ON p.r = c.r AND p.col = c.col
                GROUP BY 1
            ), hh AS (
                SELECT tok, est_count
                FROM est, tot
                WHERE est_count >= threshold
            ), exact AS (
                SELECT tok, count(*)::BIGINT AS exact_count
                FROM toks
                WHERE tok IN (SELECT tok FROM hh)
                GROUP BY 1
            )
            SELECT hh.tok, hh.est_count, exact.exact_count
            FROM hh JOIN exact USING (tok)
        """,
        "hll_distinct": f"""
            WITH u AS ({_SYNTH_URL_SQL}),
            v AS (
                SELECT d.source, u.url
                FROM u JOIN documents d USING (doc_id)
            ), h AS (
                SELECT source,
                       ('0x' || substring(md5(url), 1, 15))::BIGINT AS h
                FROM v
            ), r AS (
                SELECT source, h >> 54 AS bucket,
                       CASE WHEN h % 18014398509481984 = 0 THEN 55
                            ELSE 55 - length(bin(h % 18014398509481984))
                       END AS mrho
                FROM h
            ), regs AS (
                SELECT source, bucket, max(mrho) AS mrho
                FROM r GROUP BY 1, 2
            ), ag AS (
                SELECT source,
                       sum(1::BIGINT << (55 - mrho))::BIGINT AS sp,
                       count(*)::BIGINT AS nb
                FROM regs GROUP BY 1
            ), agg AS (
                SELECT bucket, max(mrho) AS mrho
                FROM r GROUP BY 1
            ), agall AS (
                SELECT sum(1::BIGINT << (55 - mrho))::BIGINT AS sp,
                       count(*)::BIGINT AS nb
                FROM agg
            ), names AS (
                SELECT source, sp, nb FROM ag
                UNION ALL
                SELECT '__ALL__', sp, nb FROM agall
            )
            SELECT source,
                   (64 - nb)::BIGINT AS n_zero_buckets,
                   (sp + (64 - nb) * 36028797018963968)::BIGINT
                       AS sum_scaled,
                   floor((0.709::DOUBLE * 4096::DOUBLE
                          * 36028797018963968::DOUBLE)
                         / (sp + (64 - nb) * 36028797018963968)::DOUBLE
                   )::BIGINT AS est_raw,
                   (floor((0.709::DOUBLE * 4096::DOUBLE
                           * 36028797018963968::DOUBLE)
                          / (sp + (64 - nb) * 36028797018963968)::DOUBLE
                    )::BIGINT <= 160 AND (64 - nb) > 0) AS small_range
            FROM names
        """,
        "pagerank": """
            WITH nn AS (SELECT count(*)::BIGINT AS n FROM documents),
            e AS (
                SELECT DISTINCT src, dst FROM (
                    SELECT doc_id AS src, (doc_id * 2 + 1) % n AS dst
                    FROM documents, nn
                    UNION ALL
                    SELECT doc_id, (doc_id * 3 + 2) % n FROM documents, nn
                    UNION ALL
                    SELECT doc_id, (doc_id * 7 + 5) % n FROM documents, nn
                ) WHERE src <> dst
            ), nodes AS (
                SELECT src AS node FROM e UNION SELECT dst FROM e
            ), od AS (
                SELECT src, count(*)::BIGINT AS od FROM e GROUP BY src
            ), r0 AS (
                SELECT node, 1000000::BIGINT AS rank FROM nodes
            ), c1 AS (
                SELECT e.dst AS node,
                       sum(((r0.rank // od.od) * 85) // 100)::BIGINT AS inflow
                FROM e JOIN r0 ON e.src = r0.node
                       JOIN od ON e.src = od.src
                GROUP BY e.dst
            ), r1 AS (
                SELECT nodes.node,
                       (150000 + coalesce(c1.inflow, 0))::BIGINT AS rank
                FROM nodes LEFT JOIN c1 USING (node)
            ), c2 AS (
                SELECT e.dst AS node,
                       sum(((r1.rank // od.od) * 85) // 100)::BIGINT AS inflow
                FROM e JOIN r1 ON e.src = r1.node
                       JOIN od ON e.src = od.src
                GROUP BY e.dst
            ), r2 AS (
                SELECT nodes.node,
                       (150000 + coalesce(c2.inflow, 0))::BIGINT AS rank
                FROM nodes LEFT JOIN c2 USING (node)
            ), c3 AS (
                SELECT e.dst AS node,
                       sum(((r2.rank // od.od) * 85) // 100)::BIGINT AS inflow
                FROM e JOIN r2 ON e.src = r2.node
                       JOIN od ON e.src = od.src
                GROUP BY e.dst
            ), r3 AS (
                SELECT nodes.node,
                       (150000 + coalesce(c3.inflow, 0))::BIGINT AS rank
                FROM nodes LEFT JOIN c3 USING (node)
            )
            SELECT r3.node,
                   coalesce(od.od, 0)::BIGINT AS out_degree,
                   r3.rank
            FROM r3 LEFT JOIN od ON r3.node = od.src
        """,
        "sitemap_urls": f"""
            WITH u AS ({_SYNTH_URL_SQL})
            SELECT (doc_id % 7)::BIGINT AS site_id,
                   'urlset' AS kind,
                   (row_number() OVER (
                       PARTITION BY doc_id % 7 ORDER BY doc_id
                   ) - 1)::INT AS entry_idx,
                   url AS loc,
                   '2026-02-' || lpad(((doc_id % 28) + 1)::VARCHAR, 2, '0')
                       AS lastmod,
                   'daily' AS changefreq,
                   '0.' || ((doc_id % 9) + 1)::VARCHAR AS priority,
                   NULL::VARCHAR AS error
            FROM u
            UNION ALL
            SELECT 7::BIGINT, 'index', i::INT,
                   'http://site' || i::VARCHAR || '.com/sitemap.xml',
                   '2026-01-01', NULL::VARCHAR, NULL::VARCHAR,
                   NULL::VARCHAR
            FROM range(0, 7) t(i)
            UNION ALL
            SELECT 8::BIGINT, NULL::VARCHAR, NULL::INT, NULL::VARCHAR,
                   NULL::VARCHAR, NULL::VARCHAR, NULL::VARCHAR,
                   'dtd-rejected'
        """,
        # composes the PROVEN gopher_filters / dedup_exact /
        # quality_classifier oracle fragments: rule arithmetic →
        # md5 canonical-keep among survivors → NB gate on canonicals
        "dclm_prep": """
            WITH e AS (
                SELECT doc_id,
                       CASE
                         WHEN doc_id % 11 = 0 THEN repeat(
                             'the quick brown fox and the lazy dog have a nap ', 6)
                         WHEN doc_id % 3 = 0 THEN text
                         ELSE text || ' the of and with have that to be'
                       END AS text
                FROM documents
            ), base AS (
                SELECT doc_id,
                       coalesce(text, '') AS c,
                       trim(regexp_replace(lower(coalesce(text, '')), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')) AS norm
                FROM e
            ), gt AS (
                SELECT doc_id, n_words, total_wchars, n_hash, n_ellipsis,
                       len(lines)::BIGINT AS n_lines,
                       len(list_filter(lines, s -> starts_with(s, '•')
                                              OR starts_with(s, '- ')
                                              OR starts_with(s, '* ')))::BIGINT AS n_bullet,
                       len(list_filter(lines, s -> ends_with(s, '...')
                                              OR ends_with(s, '…')))::BIGINT AS n_ell,
                       len(list_filter(toks, tk -> regexp_matches(tk, '[a-zA-Z]')))::BIGINT AS n_alpha,
                       (CASE WHEN list_contains(toks, 'the') THEN 1 ELSE 0 END
                        + CASE WHEN list_contains(toks, 'be') THEN 1 ELSE 0 END
                        + CASE WHEN list_contains(toks, 'to') THEN 1 ELSE 0 END
                        + CASE WHEN list_contains(toks, 'of') THEN 1 ELSE 0 END
                        + CASE WHEN list_contains(toks, 'and') THEN 1 ELSE 0 END
                        + CASE WHEN list_contains(toks, 'that') THEN 1 ELSE 0 END
                        + CASE WHEN list_contains(toks, 'have') THEN 1 ELSE 0 END
                        + CASE WHEN list_contains(toks, 'with') THEN 1 ELSE 0 END)::BIGINT AS n_stop
                FROM (
                    SELECT doc_id,
                           CASE WHEN norm = '' THEN 0
                                ELSE len(string_split(norm, ' ')) END::BIGINT AS n_words,
                           length(replace(norm, ' ', ''))::BIGINT AS total_wchars,
                           (length(c) - length(replace(c, '#', '')))::BIGINT AS n_hash,
                           (((length(c) - length(replace(c, '...', ''))) // 3)
                            + (length(c) - length(replace(c, '…', ''))))::BIGINT AS n_ellipsis,
                           list_filter(list_transform(string_split(c, chr(10)),
                                                      s -> regexp_replace(s, '^[ \\t\\r]+|[ \\t\\r]+$', '', 'g')),
                                       s -> s <> '') AS lines,
                           string_split(norm, ' ') AS toks
                    FROM base
                )
            ), gk AS (
                SELECT doc_id,
                       ((n_words >= 50 AND n_words <= 100000)
                        AND (n_words > 0 AND 3 * n_words <= total_wchars
                             AND total_wchars <= 10 * n_words)
                        AND (10 * n_hash <= n_words AND 10 * n_ellipsis <= n_words)
                        AND (10 * n_bullet <= 9 * n_lines)
                        AND (10 * n_ell <= 3 * n_lines)
                        AND (n_words > 0 AND 5 * n_alpha >= 4 * n_words)
                        AND (n_stop >= 2)) AS gopher_keep
                FROM gt
            ), canon AS (
                SELECT min(d.doc_id) AS doc_id
                FROM e d JOIN gk USING (doc_id)
                WHERE gk.gopher_keep
                GROUP BY md5(trim(regexp_replace(lower(d.text), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')))
            ), n AS (
                SELECT doc_id,
                       string_split(trim(regexp_replace(lower(text), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')), ' ') AS t
                FROM e
            ), g AS (
                SELECT doc_id,
                       unnest(list_concat(t,
                           CASE WHEN len(t) >= 2
                                THEN list_transform(generate_series(1, len(t) - 1),
                                                    i -> t[i] || ' ' || t[i + 1])
                                ELSE []::VARCHAR[] END)) AS gram
                FROM n
            ), bk AS (
                SELECT doc_id,
                       ('0x' || substring(md5(gram), 1, 15))::BIGINT % 1024 AS b
                FROM g
            ), fr AS (
                SELECT doc_id, b, count(*)::BIGINT AS k FROM bk GROUP BY doc_id, b
            ), cb AS (
                SELECT b,
                       sum(CASE WHEN doc_id % 10 = 0 THEN k ELSE 0 END)::BIGINT AS c_p,
                       sum(CASE WHEN doc_id % 10 <> 0 THEN k ELSE 0 END)::BIGINT AS c_n
                FROM fr WHERE doc_id % 2 = 0 GROUP BY b
            ), tot AS (
                SELECT coalesce(sum(c_p), 0)::BIGINT AS n_p,
                       coalesce(sum(c_n), 0)::BIGINT AS n_n
                FROM cb
            ), dc AS (
                SELECT count(DISTINCT CASE WHEN doc_id % 10 = 0 THEN doc_id END)::BIGINT AS d_p,
                       count(DISTINCT CASE WHEN doc_id % 10 <> 0 THEN doc_id END)::BIGINT AS d_n
                FROM documents WHERE doc_id % 2 = 0
            ), consts AS (
                SELECT log10((n_n + 1024)::DOUBLE / (n_p + 1024)::DOUBLE) AS lr0,
                       log10(d_p::DOUBLE / d_n::DOUBLE) AS prior
                FROM tot, dc
            ), lr AS (
                SELECT cb.b,
                       log10(((cb.c_p + 1)::DOUBLE * (n_n + 1024)::DOUBLE)
                             / ((cb.c_n + 1)::DOUBLE * (n_p + 1024)::DOUBLE)) AS lr
                FROM cb, tot
            ), frs AS (
                SELECT fr.* FROM fr JOIN canon USING (doc_id)
            ), sc AS (
                SELECT frs.doc_id,
                       floor((consts.prior
                              + sum(frs.k * coalesce(lr.lr, consts.lr0)))
                             * 1000000.0 + 0.5) / 1000000.0 AS nb_logodds
                FROM frs LEFT JOIN lr USING (b), consts
                GROUP BY frs.doc_id, consts.prior, consts.lr0
            )
            SELECT d.doc_id,
                   gk.gopher_keep,
                   coalesce(cn.is_canonical, FALSE) AS is_canonical,
                   sc.nb_logodds,
                   (sc.nb_logodds > 0) AS pred_hq,
                   (gk.gopher_keep
                    AND coalesce(cn.is_canonical, FALSE)
                    AND coalesce(sc.nb_logodds > 0, FALSE)) AS kept
            FROM documents d
            JOIN gk USING (doc_id)
            LEFT JOIN (SELECT doc_id, TRUE AS is_canonical FROM canon) cn
                USING (doc_id)
            LEFT JOIN sc USING (doc_id)
        """,
        # byte-transparency proof: the WARC wrap/parse/extract chain
        # must land on the SAME relation as extract_fulltext
        "warc_extract": f"""
            SELECT 'conv-0-' || (doc_id // 4)::VARCHAR AS conv_id,
                   (doc_id % 4)::INT AS turn_idx,
                   {_EXPECTED_TEXT} AS extracted_text
            FROM documents
        """,
        # brand is the PSL-aware registered-domain label for every URL
        # shape; description replays the attribute charref unescape
        # (&amp; → &) and the kernel's .strip() of the content value
        "source_meta": """
            WITH s AS (
                SELECT doc_id,
                       CASE (doc_id % 4)
                         WHEN 0 THEN 'alpha' || doc_id::VARCHAR
                         WHEN 1 THEN 'beta' || doc_id::VARCHAR
                         WHEN 2 THEN 'gamma' || doc_id::VARCHAR
                         ELSE 'delta' || doc_id::VARCHAR
                       END AS name
                FROM documents
            )
            SELECT doc_id,
                   CASE (doc_id % 4)
                     WHEN 0 THEN 'http://www.' || name || '.com/'
                     WHEN 1 THEN 'http://news.' || name || '.co.uk/'
                     WHEN 2 THEN 'http://' || name || '.org:8080/'
                     ELSE 'http://editor@' || name || '.net./'
                   END AS source_url,
                   name AS brand,
                   CASE WHEN doc_id % 5 = 2 THEN ''
                        ELSE 'News & analysis from ' || name ||
                             ', est. ' || (doc_id % 30 + 1990)::VARCHAR
                   END AS description
            FROM s
        """,
        "api_surface": _api_surface_sql(),
        "badwords": """
            WITH n AS (
                SELECT doc_id,
                       string_split(trim(regexp_replace(lower(text),
                           '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')), ' ') AS t
                FROM documents
            ), tok AS (
                SELECT doc_id, i, t[i] AS w
                FROM n, unnest(range(1, len(t) + 1)) AS r(i)
                WHERE t[i] <> ''
            ), hit AS (
                SELECT doc_id FROM tok WHERE w IN ('slow', 'big')
                UNION ALL
                SELECT a.doc_id
                FROM tok a JOIN tok b
                  ON a.doc_id = b.doc_id AND b.i = a.i + 1
                WHERE a.w = 'fast' AND b.w = 'table'
            ), h AS (
                SELECT doc_id, count(*)::BIGINT AS n_badword_hits
                FROM hit GROUP BY doc_id
            )
            SELECT d.doc_id,
                   coalesce(h.n_badword_hits, 0)::BIGINT AS n_badword_hits,
                   coalesce(h.n_badword_hits, 0) = 0 AS badwords_ok
            FROM documents d LEFT JOIN h USING (doc_id)
        """,
        "dedup_lines": """
            WITH src AS (
                SELECT doc_id,
                       'subscribe to our newsletter' || chr(10) ||
                       regexp_extract(text,
                           '^((?:[^ \\t\\n\\x0B\\f\\r]+ ){2}[^ \\t\\n\\x0B\\f\\r]+)', 1)
                       || chr(10) || 'subscribe to our newsletter' ||
                       chr(10) || '' || chr(10) ||
                       regexp_extract(text,
                           '^(?:[^ \\t\\n\\x0B\\f\\r]+ ){3}((?:[^ \\t\\n\\x0B\\f\\r]+ ){2}[^ \\t\\n\\x0B\\f\\r]+)', 1)
                       || chr(10) || 'subscribe to our newsletter' ||
                       chr(10) ||
                       regexp_extract(text,
                           '^((?:[^ \\t\\n\\x0B\\f\\r]+ ){2}[^ \\t\\n\\x0B\\f\\r]+)', 1)
                       AS t2
                FROM documents
            ), sp AS (
                SELECT doc_id, string_split(t2, chr(10)) AS s FROM src
            ), l AS (
                SELECT doc_id, i - 1 AS pos, s[i] AS line
                FROM sp, unnest(range(1, len(s) + 1)) AS r(i)
            ), k AS (
                SELECT doc_id, pos, line,
                       row_number() OVER (
                           PARTITION BY doc_id, line ORDER BY pos) AS occ
                FROM l
            ), kept AS (
                SELECT doc_id, pos, line FROM k
                WHERE line = '' OR occ = 1
            ), tot AS (
                SELECT doc_id, count(*)::BIGINT AS n_total
                FROM l GROUP BY doc_id
            )
            SELECT kept.doc_id,
                   string_agg(line, chr(10) ORDER BY pos) AS cleaned_text,
                   count(*)::BIGINT AS n_lines,
                   (any_value(tot.n_total) - count(*))::BIGINT AS n_removed
            FROM kept JOIN tot USING (doc_id)
            GROUP BY kept.doc_id
        """,
    }


def _corpus_prep_oracle() -> str:
    """Compose the dedup / lang-ID / quality oracle fragments — each is
    already exact on its own, so the pipeline oracle reuses them as
    derived tables instead of restating the formulas."""
    lang_sql = _lang_id_oracle()
    return f"""
        WITH reps AS (
            SELECT min(doc_id) AS doc_id FROM documents
            GROUP BY md5(trim(regexp_replace(lower(text), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')))
        ), lang AS (
            SELECT doc_id, lang_id FROM ({lang_sql})
        ), stats AS (
            SELECT doc_id,
                   len(toks) AS n_tokens,
                   round((
                     (length(regexp_replace(text, '[^A-Za-zÀ-ÿ一-龥]', '', 'g'))::DOUBLE
                        / nullif(length(text), 0))
                     + (CASE WHEN length(text) BETWEEN 100 AND 100000 THEN 1.0 ELSE 0.25 END)
                     + (CASE WHEN length(text)::DOUBLE / nullif(len(toks), 0)
                              BETWEEN 3 AND 12 THEN 1.0 ELSE 0.25 END)
                     + (CASE WHEN len(list_filter(toks,
                           x -> x IN ('the','and','is','a','of'))) > 0
                        THEN 1.0 ELSE 0.5 END)
                   ) / 4.0, 6) AS quality
            FROM (
                SELECT doc_id, text,
                       string_split(trim(regexp_replace(lower(text), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')), ' ') AS toks
                FROM documents)
        )
        SELECT r.doc_id, l.lang_id, s.n_tokens, s.quality
        FROM reps r
        JOIN lang l ON l.doc_id = r.doc_id
        JOIN stats s ON s.doc_id = r.doc_id
        WHERE s.quality >= 0.5 AND s.n_tokens >= 10
    """



def _ccnet_prep_oracle() -> str:
    """Per-language CCNet pipeline: the lang-ID fragment feeds a
    per-language unigram LM (vocabulary and corpus total partitioned
    by lang_id) and a per-language histogram tercile split — the same
    formulas as the unigram_logprob and quality_buckets oracles with
    lang_id added to every grouping key."""
    lang_sql = _lang_id_oracle()
    return f"""
        WITH lang AS (
            SELECT doc_id, lang_id FROM ({lang_sql})
        ), n AS (
            SELECT d.doc_id, lang.lang_id,
                   string_split(trim(regexp_replace(lower(d.text), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')), ' ') AS t
            FROM documents d JOIN lang USING (doc_id)
        ), tok AS (
            SELECT doc_id, lang_id, unnest(t) AS tok FROM n
        ), dt AS (
            SELECT doc_id, lang_id, tok, count(*)::BIGINT AS k
            FROM tok GROUP BY doc_id, lang_id, tok
        ), vocab AS (
            SELECT lang_id, tok, sum(k)::BIGINT AS cnt
            FROM dt GROUP BY lang_id, tok
        ), tot AS (
            SELECT lang_id, sum(cnt)::BIGINT AS n_corpus
            FROM vocab GROUP BY lang_id
        ), lp AS (
            SELECT vocab.lang_id, vocab.tok,
                   log10(cnt::DOUBLE / n_corpus) AS logp
            FROM vocab JOIN tot USING (lang_id)
        ), s AS (
            SELECT dt.doc_id, dt.lang_id,
                   floor((sum(dt.k * lp.logp) / sum(dt.k))::DOUBLE * 1000000.0 + 0.5)
                     / 1000000.0 AS mean_logprob
            FROM dt JOIN lp ON lp.lang_id = dt.lang_id AND lp.tok = dt.tok
            GROUP BY dt.doc_id, dt.lang_id
        ), b AS (
            SELECT doc_id, lang_id, mean_logprob,
                   floor(mean_logprob * 1000.0)::BIGINT AS score_bin
            FROM s
        ), hist AS (
            SELECT lang_id, score_bin, count(*)::BIGINT AS c
            FROM b GROUP BY lang_id, score_bin
        ), cum AS (
            SELECT lang_id, score_bin,
                   (sum(c) OVER (PARTITION BY lang_id ORDER BY score_bin))::BIGINT - c AS c_lt
            FROM hist
        ), t2 AS (
            SELECT lang_id, count(*)::BIGINT AS n FROM b GROUP BY lang_id
        )
        SELECT b.doc_id, b.lang_id, b.mean_logprob, b.score_bin,
               CASE WHEN cum.c_lt < (t2.n * 1) // 3 THEN 'head'
                    WHEN cum.c_lt < (t2.n * 2) // 3 THEN 'middle'
                    ELSE 'tail' END AS bucket
        FROM b JOIN cum USING (lang_id, score_bin) JOIN t2 USING (lang_id)
    """


def _nlp_stop_list() -> str:
    import json, os

    res = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "newspaper_spark", "resources", "stopwords.json")
    with open(res, encoding="utf-8") as f:
        nlp_stops = json.load(f)["nlp-en"]
    return ",".join("'" + w.replace("'", "''") + "'" for w in nlp_stops if w)


def _nlp_summary_oracle() -> str:
    """Exact oracle for q_nlp_summary.

    The synthetic corpus contains no sentence terminators ([.!?]), so
    the kernel's splitter provably returns ONE sentence per article:
    the whole extracted text, stripped of newlines — sentence scoring
    then selects it trivially and the summary equals the
    newline-stripped text truncated to the operator's 5000-char cap.
    Keywords (nlp.py:119-150 over the extracted text) are relational:
    split_words' re.sub removes every non-[\\w ] char INCLUDING the
    newlines (merging paragraph-boundary words), then top-10 by
    (freq, word) desc; the operator emits them sorted.
    """
    stop_list = _nlp_stop_list()
    return f"""
        WITH src AS (
            SELECT doc_id,
                   'conv-0-' || (doc_id // 4)::VARCHAR AS conv_id,
                   (doc_id % 4)::INT AS turn_idx,
                   {_EXPECTED_TEXT} AS extracted
            FROM documents
            WHERE doc_id < 50
        ), toks AS (
            SELECT doc_id,
                   list_filter(string_split(lower(regexp_replace(
                       extracted, '[^a-zA-Z0-9_ ]', '', 'g')), ' '),
                       x -> x <> '') AS toks
            FROM src
        ), freq AS (
            SELECT doc_id, w, count(*) AS freq
            FROM (SELECT doc_id, unnest(toks) AS w FROM toks)
            WHERE w NOT IN ({stop_list})
            GROUP BY doc_id, w
        ), top10 AS (
            SELECT doc_id, w FROM (
                SELECT doc_id, w,
                       row_number() OVER (PARTITION BY doc_id
                                          ORDER BY freq DESC, w DESC) AS rank
                FROM freq)
            WHERE rank <= 10
        ), kw AS (
            SELECT doc_id, string_agg(w, ' ' ORDER BY w) AS keywords
            FROM top10 GROUP BY doc_id
        )
        SELECT s.conv_id, s.turn_idx,
               coalesce(k.keywords, '') AS keywords,
               substring(replace(s.extracted, chr(10), ''), 1, 5000) AS summary
        FROM src s LEFT JOIN kw k USING (doc_id)
    """


def _nlp_sentence_scores_oracle() -> str:
    """Exact oracle for q_nlp_sentence_scores.

    Reconstructs the derived sentence-rich text (initcap mirrored
    EXACTLY — upper first char + lower rest, Spark initcap semantics —
    plus guarded period insertion), the splitter's output (every '. '
    is a boundary by construction: the regex only inserts a period
    after a ≥5-char word, longer than every abbreviation in the
    kernel's list, so the abbreviation/single-letter guards can never
    fire and initcap makes every next-char uppercase), then the kernel's
    per-sentence feature math with IEEE-identical operation order:
    list_reduce folds the sbs/dbs accumulations left-to-right exactly
    like the Python loops (adding 0.0 for non-keyword tokens is exact),
    divisions/multiplications mirror nlp.py's operand order, and the
    position ladder compares the same doubles to the same literals.
    """
    stop_list = _nlp_stop_list()
    return f"""
        WITH src AS (
            SELECT doc_id, text,
                   regexp_replace(
                     array_to_string(list_transform(string_split(text, ' '),
                         w -> upper(substring(w, 1, 1)) || lower(substring(w, 2))), ' '),
                     '((?:[^ ]+ ){{11}}[^ ]{{5,}}) ', '\\1. ', 'g') AS derived
            FROM documents
        ), kwfreq AS (
            SELECT doc_id, w, count(*) AS freq, any_value(num_words) AS num_words
            FROM (SELECT doc_id, len(string_split(text, ' ')) AS num_words,
                         unnest(string_split(text, ' ')) AS w
                  FROM src)
            WHERE w NOT IN ({stop_list})
            GROUP BY doc_id, w
        ), kws AS (
            SELECT doc_id, w, freq * 1.0 / num_words * 1.5 + 1 AS score
            FROM (SELECT doc_id, w, freq, num_words,
                         row_number() OVER (PARTITION BY doc_id
                                            ORDER BY freq DESC, w DESC) AS rank
                  FROM kwfreq)
            WHERE rank <= 10
        ), rawsent AS (
            SELECT doc_id, i,
                   CASE WHEN i < len(parts) THEN parts[i] || '.'
                        ELSE parts[i] END AS sentence
            FROM (SELECT doc_id, parts,
                         unnest(generate_series(1, len(parts))) AS i
                  FROM (SELECT doc_id, string_split(derived, '. ') AS parts
                        FROM src))
        ), sents AS (
            SELECT doc_id, sentence,
                   row_number() OVER (PARTITION BY doc_id ORDER BY i) - 1 AS sent_idx,
                   count(*) OVER (PARTITION BY doc_id) AS size
            FROM rawsent
            WHERE length(sentence) > 10
        ), stoks AS (
            SELECT doc_id, sent_idx, size, sentence, len(toks) AS n_words,
                   unnest(generate_series(1, len(toks))) AS ord, toks
            FROM (SELECT doc_id, sent_idx, size, sentence,
                         list_filter(string_split(lower(regexp_replace(
                             sentence, '[^a-zA-Z0-9_ ]', '', 'g')), ' '),
                             x -> x <> '') AS toks
                  FROM sents)
        ), scored AS (
            SELECT s.doc_id, s.sent_idx, s.size, s.sentence, s.n_words,
                   s.ord - 1 AS ord0, s.toks[s.ord] AS tok, k.score AS kscore
            FROM stoks s LEFT JOIN kws k
              ON k.doc_id = s.doc_id AND k.w = s.toks[s.ord]
        ), ttl AS (
            SELECT doc_id,
                   list_filter(['document', 'number', doc_id::VARCHAR,
                                'on', 'data', 'systems'],
                               w -> w NOT IN ({stop_list})) AS ttoks
            FROM src
        ), agg AS (
            SELECT sc.doc_id, sc.sent_idx,
                   any_value(sc.size) AS size,
                   any_value(sc.sentence) AS sentence,
                   any_value(sc.n_words) AS n_words,
                   list(coalesce(sc.kscore, 0.0) ORDER BY sc.ord0) AS all_scores,
                   list(struct_pack(acc := 0.0::DOUBLE, i := sc.ord0, s := sc.kscore)
                        ORDER BY sc.ord0)
                       FILTER (WHERE sc.kscore IS NOT NULL) AS hits,
                   -- count(DISTINCT ...) FILTER + a FILTERed ordered
                   -- list aggregate in one GROUP BY trips an INTERNAL
                   -- error in DuckDB 1.0; the CASE form is equivalent
                   -- (NULLs don't count) and dodges it
                   count(DISTINCT CASE WHEN sc.kscore IS NOT NULL
                                       THEN sc.tok END) AS k_hits,
                   count(*)
                       FILTER (WHERE list_contains(t.ttoks, sc.tok)) AS title_hits,
                   any_value(len(t.ttoks)) AS n_title
            FROM scored sc JOIN ttl t ON t.doc_id = sc.doc_id
            GROUP BY sc.doc_id, sc.sent_idx
        ), feat AS (
            SELECT doc_id, sent_idx, sentence,
                   (title_hits * 1.0) / greatest(n_title, 1) AS title_score,
                   1 - abs(20.0 - n_words) / 20.0 AS length_score,
                   (CASE
                     WHEN (sent_idx + 1) * 1.0 / size > 1.0 THEN 0.0
                     WHEN (sent_idx + 1) * 1.0 / size > 0.9 THEN 0.15
                     WHEN (sent_idx + 1) * 1.0 / size > 0.8 THEN 0.04
                     WHEN (sent_idx + 1) * 1.0 / size > 0.7 THEN 0.04
                     WHEN (sent_idx + 1) * 1.0 / size > 0.6 THEN 0.06
                     WHEN (sent_idx + 1) * 1.0 / size > 0.5 THEN 0.04
                     WHEN (sent_idx + 1) * 1.0 / size > 0.4 THEN 0.05
                     WHEN (sent_idx + 1) * 1.0 / size > 0.3 THEN 0.08
                     WHEN (sent_idx + 1) * 1.0 / size > 0.2 THEN 0.14
                     WHEN (sent_idx + 1) * 1.0 / size > 0.1 THEN 0.23
                     WHEN (sent_idx + 1) * 1.0 / size > 0 THEN 0.17
                     ELSE 0.0
                   END)::DOUBLE AS position_score,
                   CASE WHEN n_words = 0 THEN 0.0
                        ELSE (1.0 / n_words *
                              list_reduce(all_scores, (a, b) -> a + b)) / 10.0
                   END AS sbs,
                   1 / ((k_hits + 1) * (k_hits + 2.0)) *
                   CASE WHEN hits IS NULL OR len(hits) = 0 THEN 0.0
                        ELSE list_reduce(hits, (a, x) -> struct_pack(
                                 acc := a.acc + x.s * a.s /
                                        ((x.i - a.i) * (x.i - a.i)),
                                 i := x.i, s := x.s)).acc
                   END AS dbs
            FROM agg
        ), tot AS (
            SELECT doc_id, sent_idx, sentence, title_score, length_score,
                   position_score, sbs, dbs,
                   (title_score * 1.5 + (sbs + dbs) / 2.0 * 10.0 * 2.0 +
                    length_score * 1.0 + position_score * 1.0) / 4.0 AS total
            FROM feat
        )
        SELECT doc_id, sent_idx, sentence,
               floor(title_score * 1000000.0 + 0.5) / 1000000.0 AS title_score,
               floor(length_score * 1000000.0 + 0.5) / 1000000.0 AS length_score,
               floor(position_score * 1000000.0 + 0.5) / 1000000.0 AS position_score,
               floor(sbs * 1000000.0 + 0.5) / 1000000.0 AS sbs,
               floor(dbs * 1000000.0 + 0.5) / 1000000.0 AS dbs,
               floor(total * 1000000.0 + 0.5) / 1000000.0 AS total,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY total DESC, sent_idx) <= 5 AS selected
        FROM tot
    """


def _media_decode_real_oracle() -> str:
    """Exact oracle for the real PPM decode: the generated payload is
    'P6\\n8 4\\n255\\n' + first 96 bytes of the space-padded text (all
    ASCII, so byte k == ascii(char k)); band i of the feature is
    sum(bytes 12i+1..12i+12) / (12·255), stored through a float32 cast
    (reproduced with ::REAL) and rounded at 6dp as double."""
    n_raster = 8 * 4 * 3
    feats = []
    for i in range(8):
        lo = 12 * i + 1
        s = (
            "list_sum(list_transform(generate_series("
            f"{lo}, {lo + 11}), j -> ascii(substring(padded, j, 1))))"
        )
        feats.append(
            f"round((({s} / 3060.0)::REAL)::DOUBLE, 6) AS f{i}"
        )
    feat_sql = ",\n               ".join(feats)
    return f"""
        WITH p AS (
            SELECT md5(text) AS media_id,
                   substring(rpad(text, {n_raster}, ' '), 1, {n_raster}) AS padded
            FROM documents
        )
        SELECT media_id,
               'image' AS kind,
               {11 + n_raster}::BIGINT AS n_bytes,
               8 AS width, 4 AS height, 1 AS n_frames,
               NULL::VARCHAR AS error,
               {feat_sql}
        FROM p
    """


def _media_video_oracle() -> str:
    """Exact oracle for the AVI/MJPEG decode: the sampling schedule
    picks frames 0 and 2; each frame's block pixel is 128 + (d+4)//8
    with d = d(doc_id, 4·j + k); the 8 feature bands cover 64 bytes
    each of the 512-byte concatenated raster (bands 0-1: frame-0
    blocks A+B, 2-3: frame-0 C+D, 4-7: same for frame 2)."""
    from newspaper_spark.operators.multimodal import (
        JPEG_DC_FRAME_BYTES,
        _avi_header_hex,
    )

    n_bytes = (
        len(_avi_header_hex(4, 16, 16, JPEG_DC_FRAME_BYTES)) // 2
        + 4 * (8 + JPEG_DC_FRAME_BYTES)
    )
    d_exprs = []
    for j in (0, 2):
        for k in range(4):
            i = 4 * j + k
            d_exprs.append(
                f"128 + 8 * (((doc_id * 7 + {i * 31}) % 111) // 7) + "
                f"((doc_id * 7 + {i * 31}) % 111) % 7 + "
                f"CASE WHEN ((doc_id * 7 + {i * 31}) % 111) % 7 >= 4 "
                f"THEN 1 ELSE 0 END AS d{j}_{k}"
            )
    feats = []
    for i in range(8):
        j = 0 if i < 4 else 2
        a, b = (0, 1) if (i % 4) < 2 else (2, 3)
        feats.append(
            f"round((((32 * (p{j}_{a} + p{j}_{b})) / 16320.0)::REAL)::DOUBLE, 6) AS f{i}"
        )
    px = ",\n                   ".join(
        f"128 + (d{j}_{k} + 4) // 8 AS p{j}_{k}" for j in (0, 2) for k in range(4)
    )
    feat_sql = ",\n               ".join(feats)
    return f"""
        WITH d AS (
            SELECT doc_id, {', '.join(d_exprs)} FROM documents
        ), px AS (
            SELECT doc_id,
                   {px}
            FROM d
        )
        SELECT doc_id::VARCHAR AS media_id,
               'video' AS kind,
               {n_bytes}::BIGINT AS n_bytes,
               16 AS width, 16 AS height, 4 AS n_frames,
               NULL::VARCHAR AS error,
               {feat_sql}
        FROM px
    """


def _media_audio_oracle() -> str:
    """Exact oracle for the WAV decode: payload = 44-byte RIFF/PCM
    header + first 96 bytes of the space-padded text; band i of the
    feature is sum(bytes 12i+1..12i+12) / (12·255) through the same
    float32 cast as Spark's array<float> schema."""
    n = 96
    feats = []
    for i in range(8):
        lo = 12 * i + 1
        sm = (
            "list_sum(list_transform(generate_series("
            f"{lo}, {lo + 11}), j -> ascii(substring(padded, j, 1))))"
        )
        feats.append(f"round((({sm} / 3060.0)::REAL)::DOUBLE, 6) AS f{i}")
    feat_sql = ",\n               ".join(feats)
    return f"""
        WITH p AS (
            SELECT md5(text) AS media_id,
                   substring(rpad(text, {n}, ' '), 1, {n}) AS padded
            FROM documents
        )
        SELECT media_id,
               'audio' AS kind,
               {44 + n}::BIGINT AS n_bytes,
               {n} AS n_samples, 8000 AS sample_rate, 1 AS n_channels,
               NULL::VARCHAR AS error,
               {feat_sql}
        FROM p
    """


def _media_decode_jpeg_oracle() -> str:
    """Exact oracle for the baseline-JPEG decode: the payload is the
    fixed DC-only 16×16 container, so decoded block pixel =
    128 + (d_k+4)//8 with d_k = 128 + 8·(m0//7) + r2, m0 =
    (doc_id·7 + k·31) % 111, r2 = m0%7 (+1 if ≥ 4). Band i of the
    8-band feature covers two raster rows: bands 0-3 average blocks
    0,1; bands 4-7 average blocks 2,3. Feature doubles go through the
    same float32 cast as Spark's array<float> schema (::REAL)."""
    from newspaper_spark.operators.multimodal import (
        _JPEG_DC_HEADER_HEX,
        _JPEG_DC_PROG_HEADER_HEX,
    )

    n_base = len(_JPEG_DC_HEADER_HEX) // 2 + 4 * 3 + 3 * 2 + 2
    n_prog = len(_JPEG_DC_PROG_HEADER_HEX) // 2 + 4 * 2 + 3 * 2 + 2
    d_exprs = []
    for k in range(4):
        d_exprs.append(
            f"128 + 8 * (((doc_id * 7 + {k * 31}) % 111) // 7) + "
            f"((doc_id * 7 + {k * 31}) % 111) % 7 + "
            f"CASE WHEN ((doc_id * 7 + {k * 31}) % 111) % 7 >= 4 "
            f"THEN 1 ELSE 0 END AS d{k}"
        )
    feats = []
    for i in range(8):
        a, b = (0, 1) if i < 4 else (2, 3)
        feats.append(
            f"round((((16 * (p{a} + p{b})) / 8160.0)::REAL)::DOUBLE, 6) AS f{i}"
        )
    feat_sql = ",\n               ".join(feats)
    return f"""
        WITH d AS (
            SELECT doc_id, {', '.join(d_exprs)} FROM documents
        ), px AS (
            SELECT doc_id,
                   128 + (d0 + 4) // 8 AS p0,
                   128 + (d1 + 4) // 8 AS p1,
                   128 + (d2 + 4) // 8 AS p2,
                   128 + (d3 + 4) // 8 AS p3
            FROM d
        )
        SELECT doc_id::VARCHAR AS media_id,
               'image' AS kind,
               CASE WHEN doc_id % 2 = 0 THEN {n_base}
                    ELSE {n_prog} END::BIGINT AS n_bytes,
               16 AS width, 16 AS height, 1 AS n_frames,
               NULL::VARCHAR AS error,
               {feat_sql}
        FROM px
    """


def _nlp_keywords_oracle() -> str:
    stop_list = _nlp_stop_list()
    return f"""
        WITH t AS (
            SELECT doc_id,
                   list_filter(string_split(lower(regexp_replace(text, '[^a-zA-Z0-9_ ]', '', 'g')), ' '),
                               x -> x <> '') AS toks
            FROM documents
        ), base AS (
            SELECT doc_id, len(toks) AS num_words, unnest(toks) AS w FROM t
        ), freq AS (
            SELECT doc_id, w, count(*) AS freq, any_value(num_words) AS num_words
            FROM base WHERE w NOT IN ({stop_list})
            GROUP BY doc_id, w
        )
        SELECT doc_id, w, rank, round(freq * 1.0 / num_words * 1.5 + 1, 6) AS score
        FROM (
            SELECT doc_id, w, freq, num_words,
                   row_number() OVER (PARTITION BY doc_id
                                      ORDER BY freq DESC, w DESC) AS rank
            FROM freq)
        WHERE rank <= 10
    """


# shared CTE fragments for the dedup-family oracles -----------------------

_TOKS_CTE = """
        WITH t AS (
            SELECT doc_id AS id,
                   string_split(trim(regexp_replace(lower(text), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')), ' ') AS toks
            FROM documents
        )"""

_SHINGLE_EXPR = """
        list_distinct(list_transform(
            generate_series(0, greatest(len(toks) - 3, 0)),
            i -> array_to_string(list_slice(toks, i + 1, i + 3), ' ')))
"""

#: 60-bit md5-derived hash — identical to dedup.md5_long on the Spark side
_MD5_LONG = "('0x' || substring(md5({x}), 1, 15))::BIGINT"


def _minhash_cte_tail(num_hashes: int = 8, bands: int = 4) -> str:
    """sh_t → xs_t → sigs → banded fragment, mirroring
    minhash_signature's affine rehash family exactly."""
    from newspaper_spark.operators.dedup import MERSENNE31, affine_params

    params = affine_params(num_hashes)
    mh = ", ".join(
        f"list_aggregate(list_transform(xs, x -> ({a} * x + {b}) % {MERSENNE31}), 'min') AS h{k}"
        for k, (a, b) in enumerate(params)
    )
    rows_per_band = num_hashes // bands
    band_rows = " UNION ALL ".join(
        "SELECT id, {b} AS band, {sig} AS sig FROM sigs".format(
            b=b,
            sig=" || '|' || ".join(
                f"h{b * rows_per_band + r}::VARCHAR" for r in range(rows_per_band)
            ),
        )
        for b in range(bands)
    )
    base = _MD5_LONG.format(x="s")
    return f"""
        , sh_t AS (
            SELECT id, {_SHINGLE_EXPR} AS sh FROM t
        ), xs_t AS (
            SELECT id, sh,
                   list_transform(sh, s -> {base} % {MERSENNE31}) AS xs
            FROM sh_t
        ), sigs AS (
            SELECT id, {mh} FROM xs_t
        ), banded AS ({band_rows})
    """


def _minhash_oracle() -> str:
    """DuckDB reconstruction of minhash_lsh_pairs(num_hashes=8, bands=4,
    shingle_n=3): one md5 per shingle + affine rehash minima."""
    return f"""{_TOKS_CTE}{_minhash_cte_tail()}
        SELECT DISTINCT l.id AS id_a, r.id AS id_b
        FROM banded l JOIN banded r
          ON l.band = r.band AND l.sig = r.sig AND l.id < r.id
        ORDER BY id_a, id_b
    """


def _dedup_clusters_oracle() -> str:
    """Connected components recomputed engine-independently: recursive
    transitive closure over the same minhash pair graph, component rep
    = min reachable id (identical to min-label propagation's fixpoint),
    plus component sizes."""
    toks_recursive = _TOKS_CTE.replace("WITH t AS", "WITH RECURSIVE t AS", 1)
    return f"""{toks_recursive}{_minhash_cte_tail()}
        , prs AS (
            SELECT DISTINCT l.id AS id_a, r.id AS id_b
            FROM banded l JOIN banded r
              ON l.band = r.band AND l.sig = r.sig AND l.id < r.id
        ), edges AS (
            SELECT id_a AS a, id_b AS b FROM prs
            UNION
            SELECT id_b AS a, id_a AS b FROM prs
        ), reach(src, dst) AS (
            SELECT doc_id, doc_id FROM documents
            UNION
            SELECT r.src, e.b FROM reach r JOIN edges e ON e.a = r.dst
        ), comp AS (
            SELECT src AS id, min(dst) AS rep FROM reach GROUP BY src
        )
        SELECT c.id, c.rep, s.cluster_size
        FROM comp c
        JOIN (SELECT rep, count(*) AS cluster_size FROM comp GROUP BY rep) s
          USING (rep)
    """


def _jaccard_oracle() -> str:
    """Candidates from the minhash bands, verified with exact Jaccard on
    the 60-bit-hashed shingle sets (same hash as the Spark side)."""
    hs = f"list_distinct(list_transform(sh, s -> {_MD5_LONG.format(x='s')}))"
    return f"""{_TOKS_CTE}{_minhash_cte_tail()}
        , pairs AS (
            SELECT DISTINCT l.id AS id_a, r.id AS id_b
            FROM banded l JOIN banded r
              ON l.band = r.band AND l.sig = r.sig AND l.id < r.id
        ), hs_t AS (
            SELECT id, {hs} AS hs FROM sh_t
        )
        SELECT p.id_a, p.id_b,
               round(len(list_intersect(a.hs, b.hs))::DOUBLE
                     / nullif(len(list_distinct(list_concat(a.hs, b.hs))), 0), 6) AS jaccard
        FROM pairs p
        JOIN hs_t a ON a.id = p.id_a
        JOIN hs_t b ON b.id = p.id_b
        WHERE round(len(list_intersect(a.hs, b.hs))::DOUBLE
              / nullif(len(list_distinct(list_concat(a.hs, b.hs))), 0), 6) >= 0.5
        ORDER BY id_a, id_b
    """


def _simhash_cte() -> str:
    """doc_id → 64-bit simhash, bit-for-bit equal to dedup.simhash_col:
    per-token md5 split into 4 16-bit hex chunks, ±1 votes per bit,
    bit set when the vote sum is positive."""
    return f"""{_TOKS_CTE}
        , tok AS (SELECT id, unnest(toks) AS w FROM t
        ), hx_t AS (SELECT id, md5(w) AS hx FROM tok
        ), c AS (
            SELECT id,
                   ('0x' || substring(hx, 1, 4))::INT AS c0,
                   ('0x' || substring(hx, 5, 4))::INT AS c1,
                   ('0x' || substring(hx, 9, 4))::INT AS c2,
                   ('0x' || substring(hx, 13, 4))::INT AS c3
            FROM hx_t
        ), bitsv AS (
            SELECT id, i.i AS i,
                   CASE WHEN ((CASE i.i // 16 WHEN 0 THEN c0 WHEN 1 THEN c1
                               WHEN 2 THEN c2 ELSE c3 END)
                        & (1 << (i.i % 16))) <> 0 THEN 1 ELSE -1 END AS v
            FROM c CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS i) i
        ), votes AS (
            SELECT id, i, sum(v) AS vt FROM bitsv GROUP BY id, i
        ), sims AS (
            SELECT id,
                   sum(CASE WHEN vt > 0 THEN
                         CASE WHEN i = 63 THEN -9223372036854775808
                              ELSE (1::BIGINT << i) END
                       ELSE 0 END)::BIGINT AS sim
            FROM votes GROUP BY id
        )"""


def _simhash_oracle() -> str:
    return f"""{_simhash_cte()}
        SELECT id AS doc_id, sim AS simhash FROM sims
    """


def _simhash_near_dups_oracle(max_hamming: int = 8) -> str:
    """Pigeonhole chunk blocking identical to simhash_near_dups: the
    chunk layout comes from the same _chunk_layout helper."""
    from newspaper_spark.operators.dedup import _chunk_layout

    rows = ", ".join(
        f"({c}, {off}, {(1 << width) - 1})"
        for c, (off, width) in enumerate(_chunk_layout(max_hamming + 1))
    )
    return f"""{_simhash_cte()}
        , chunks AS (
            SELECT id, sim, m.chunk, (sim >> m.off) & m.mask AS val
            FROM sims CROSS JOIN (VALUES {rows}) AS m(chunk, off, mask)
        ), cand AS (
            SELECT DISTINCT l.id AS id_a, r.id AS id_b,
                   l.sim AS sim_a, r.sim AS sim_b
            FROM chunks l JOIN chunks r
              ON l.chunk = r.chunk AND l.val = r.val AND l.id < r.id
        )
        SELECT id_a, id_b, bit_count(xor(sim_a, sim_b)) AS hamming
        FROM cand WHERE bit_count(xor(sim_a, sim_b)) <= {max_hamming}
    """


def _plane_sig_sql(vexpr: str, n_planes: int = 16, dim: int = 64) -> str:
    """Sign-bit signature expression with the exact hyperplane doubles
    (fold order matches the Spark aggregate: left-to-right)."""
    from newspaper_spark.operators.similarity import hyperplanes

    parts = []
    for plane in hyperplanes(dim, n_planes):
        dot = " + ".join(f"{vexpr}[{d + 1}] * ({w!r})" for d, w in enumerate(plane))
        parts.append(f"(CASE WHEN ({dot}) >= 0 THEN '1' ELSE '0' END)")
    return " || ".join(parts)


_BAND4_VALUES = "(0), (1), (2), (3)"


def _ann_lsh_oracle() -> str:
    sig = _plane_sig_sql("v")
    return f"""
        WITH emb AS (
            SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
            FROM embeddings
        ), sigs AS (
            SELECT vec_id, v, {sig} AS sig FROM emb
        ), qb AS (
            SELECT vec_id AS query_id, b.b AS band,
                   substring(sig, b.b * 4 + 1, 4) AS bsig
            FROM sigs CROSS JOIN (VALUES {_BAND4_VALUES}) b(b)
            WHERE vec_id % 50 = 0
        ), cb AS (
            SELECT vec_id AS neighbor_id, b.b AS band,
                   substring(sig, b.b * 4 + 1, 4) AS bsig
            FROM sigs CROSS JOIN (VALUES {_BAND4_VALUES}) b(b)
        ), cand AS (
            SELECT DISTINCT query_id, neighbor_id
            FROM qb JOIN cb USING (band, bsig)
            WHERE query_id <> neighbor_id
        ), scored AS (
            SELECT c.query_id, c.neighbor_id,
                   round(list_cosine_similarity(a.v, b.v), 6) AS cos
            FROM cand c
            JOIN sigs a ON a.vec_id = c.query_id
            JOIN sigs b ON b.vec_id = c.neighbor_id
        )
        SELECT query_id, neighbor_id, rank FROM (
            SELECT query_id, neighbor_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY cos DESC, neighbor_id) AS rank
            FROM scored)
        WHERE rank <= 5
    """


def _ann_ivf_oracle() -> str:
    """Reconstructs the TRAINED IVF index end-to-end: round-0 cell
    assignment with explicit literal dot expressions (left-to-right
    float folds match the UDF's cumsum exactly), then each k-means
    round as plain SQL — per-(cell, dim) sums of the floor(x·2^20)
    fixed-point components are EXACT integers (order-free, so GROUP BY
    reproduces Spark's partial-combine sums bit-for-bit), centroid
    means as s/(n·2^20) doubles, re-assignment via list_reduce
    left-folds. Empty cells inherit the previous round's centroid,
    exactly like kmeans_train."""
    from newspaper_spark.operators.similarity import KMEANS_QUANT, hyperplanes

    n_cells, dim, n_iter = 16, 64, 2
    init = hyperplanes(dim, n_cells)
    branches = []
    for cid, cent in enumerate(init):
        dot = " + ".join(f"v[{d + 1}] * ({w!r})" for d, w in enumerate(cent))
        branches.append(f"SELECT vec_id, {cid} AS cell, ({dot}) AS dot FROM emb")
    dots0 = " UNION ALL ".join(branches)
    init_vals = ", ".join(
        f"({cid}, [{', '.join(repr(w) for w in cent)}]::DOUBLE[])"
        for cid, cent in enumerate(init)
    )
    q = f"{float(KMEANS_QUANT)!r}"
    rounds_sql = ""
    prev_cent = "init"
    prev_asg = "asg0"
    for r in range(1, n_iter + 1):
        rounds_sql += f"""
        , sums{r} AS (
            SELECT a.cell, d.d, sum(e.q[d.d]) AS s, count(*) AS n
            FROM qemb e
            JOIN {prev_asg} a ON a.vec_id = e.vec_id AND a.rn = 1
            CROSS JOIN (SELECT unnest(generate_series(1, {dim})) AS d) d
            GROUP BY a.cell, d.d
        ), newc{r} AS (
            SELECT cell, list(s / (n * {q}) ORDER BY d) AS w
            FROM sums{r} GROUP BY cell
        ), cent{r} AS (
            SELECT p.cell, coalesce(c.w, p.w) AS w
            FROM {prev_cent} p LEFT JOIN newc{r} c USING (cell)
        ), dots{r} AS (
            SELECT e.vec_id, c.cell,
                   list_reduce(list_transform(generate_series(1, {dim}),
                                              i -> e.v[i] * c.w[i]),
                               (a, b) -> a + b) AS dot
            FROM emb e CROSS JOIN cent{r} c
        ), asg{r} AS (
            SELECT vec_id, cell,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY dot DESC, cell) AS rn
            FROM dots{r}
        )"""
        prev_cent = f"cent{r}"
        prev_asg = f"asg{r}"
    return f"""
        WITH emb AS (
            SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
            FROM embeddings
        ), qemb AS (
            SELECT vec_id,
                   list_transform(v, x -> floor(x * {q})::BIGINT) AS q
            FROM emb
        ), init AS (
            SELECT * FROM (VALUES {init_vals}) t(cell, w)
        ), rdots0 AS ({dots0}), asg0 AS (
            SELECT vec_id, cell,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY dot DESC, cell) AS rn
            FROM rdots0 WHERE TRUE
        ){rounds_sql}
        , corpus AS (
            SELECT e.vec_id AS neighbor_id, e.v AS cv, r.cell
            FROM emb e JOIN {prev_asg} r ON r.vec_id = e.vec_id AND r.rn = 1
        ), probes AS (
            SELECT e.vec_id AS query_id, e.v AS qv, r.cell
            FROM emb e JOIN {prev_asg} r ON r.vec_id = e.vec_id AND r.rn <= 2
            WHERE e.vec_id % 50 = 0
        ), scored AS (
            SELECT DISTINCT p.query_id, c.neighbor_id,
                   round(list_cosine_similarity(p.qv, c.cv), 6) AS cos
            FROM probes p JOIN corpus c USING (cell)
            WHERE p.query_id <> c.neighbor_id
        )
        SELECT query_id, neighbor_id, rank FROM (
            SELECT query_id, neighbor_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY cos DESC, neighbor_id) AS rank
            FROM scored)
        WHERE rank <= 5
    """


def _embedding_dedup_oracle() -> str:
    sig = _plane_sig_sql("v", n_planes=32)
    return f"""
        WITH emb AS (
            SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
            FROM embeddings
        ), aug AS (
            SELECT vec_id, v FROM emb
            UNION ALL
            SELECT vec_id + 1000000, list_concat([v[1] * 1.2 + 0.01], v[2:])
            FROM emb WHERE vec_id % 25 = 0
        ), sigs AS (
            SELECT vec_id, v, {sig} AS sig FROM aug
        ), bb AS (
            SELECT vec_id, b.b AS band, substring(sig, b.b * 8 + 1, 8) AS bsig
            FROM sigs CROSS JOIN (VALUES {_BAND4_VALUES}) b(b)
        ), cand AS (
            SELECT DISTINCT l.vec_id AS id_a, r.vec_id AS id_b
            FROM bb l JOIN bb r
              ON l.band = r.band AND l.bsig = r.bsig AND l.vec_id < r.vec_id
        )
        SELECT c.id_a, c.id_b,
               round(list_cosine_similarity(a.v, b.v), 6) AS cos
        FROM cand c
        JOIN sigs a ON a.vec_id = c.id_a
        JOIN sigs b ON b.vec_id = c.id_b
        WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.9
    """


def _semantic_clusters_oracle() -> str:
    """Connected components over the exact-cosine-verified embedding
    pair relation (the same CTE pipeline as _embedding_dedup_oracle),
    closed transitively with a recursive CTE; rep = min reachable id,
    singletons included from the augmented node set."""
    sig = _plane_sig_sql("v", n_planes=32)
    return f"""
        WITH RECURSIVE emb AS (
            SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
            FROM embeddings
        ), aug AS (
            SELECT vec_id, v FROM emb
            UNION ALL
            SELECT vec_id + 1000000, list_concat([v[1] * 1.2 + 0.01], v[2:])
            FROM emb WHERE vec_id % 25 = 0
        ), sigs AS (
            SELECT vec_id, v, {sig} AS sig FROM aug
        ), bb AS (
            SELECT vec_id, b.b AS band, substring(sig, b.b * 8 + 1, 8) AS bsig
            FROM sigs CROSS JOIN (VALUES {_BAND4_VALUES}) b(b)
        ), cand AS (
            SELECT DISTINCT l.vec_id AS id_a, r.vec_id AS id_b
            FROM bb l JOIN bb r
              ON l.band = r.band AND l.bsig = r.bsig AND l.vec_id < r.vec_id
        ), vp AS (
            SELECT c.id_a, c.id_b
            FROM cand c
            JOIN sigs a ON a.vec_id = c.id_a
            JOIN sigs b ON b.vec_id = c.id_b
            WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.9
        ), edges AS (
            SELECT id_a AS a, id_b AS b FROM vp
            UNION
            SELECT id_b AS a, id_a AS b FROM vp
        ), reach(src, dst) AS (
            SELECT vec_id, vec_id FROM aug
            UNION
            SELECT r.src, e.b FROM reach r JOIN edges e ON e.a = r.dst
        ), comp AS (
            SELECT src AS id, min(dst) AS rep FROM reach GROUP BY src
        )
        SELECT c.id, c.rep, s.cluster_size
        FROM comp c
        JOIN (SELECT rep, count(*)::BIGINT AS cluster_size
              FROM comp GROUP BY rep) s USING (rep)
    """


def _lang_id_oracle() -> str:
    """Generated from the SAME marker tables the operator uses, so the
    two sides can never drift."""
    from newspaper_spark.operators.textstats import LANG_CHAR_MARKERS, LANG_MARKERS

    branches = []
    for lang, words in sorted(LANG_MARKERS.items()):
        wl = ",".join("'" + w.replace("'", "''") + "'" for w in words)
        branches.append(
            f"SELECT doc_id, lang, '{lang}' AS cand, "
            f"len(list_filter(toks, x -> x IN ({wl}))) AS score FROM t"
        )
    for lang, ms in sorted(LANG_CHAR_MARKERS.items()):
        expr = " + ".join(
            f"((length(text) - length(replace(text, '{m}', ''))) // {len(m)})"
            for m in ms
        )
        branches.append(
            f"SELECT doc_id, lang, '{lang}' AS cand, {expr} AS score FROM t"
        )
    union = " UNION ALL ".join(branches)
    return f"""
        WITH t AS (
            SELECT doc_id, lang, text,
                   string_split(trim(regexp_replace(lower(text), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')), ' ') AS toks
            FROM documents
        ), scores AS ({union}), ranked AS (
            SELECT doc_id, lang, cand, score,
                   row_number() OVER (PARTITION BY doc_id
                                      ORDER BY score DESC, cand DESC) AS rn
            FROM scores
        )
        SELECT doc_id, lang,
               CASE WHEN score > 0 THEN cand ELSE 'und' END AS lang_id
        FROM ranked WHERE rn = 1
    """


def _image_score_cand_sql(k: int) -> str:
    stem = "/logo-" if k == 1 else "/img-"
    return f"""
        SELECT doc_id,
               'http://img.example.com/' || doc_id::VARCHAR || '{stem}{k}.jpg' AS img_url,
               40 + ('0x' || substring(md5(text || ':{k}'), 1, 2))::INT * 4 AS width,
               40 + ('0x' || substring(md5(text || ':{k}'), 31, 2))::INT * 3 AS height
        FROM documents
    """


_IMAGE_SCORE_ORACLE = f"""
    WITH cand AS (
        {_image_score_cand_sql(0)} UNION ALL {_image_score_cand_sql(1)}
        UNION ALL {_image_score_cand_sql(2)}
    ), scored AS (
        SELECT doc_id, img_url,
               CASE WHEN (width * height)::DOUBLE < 5000 THEN 0.0
                    WHEN width < 90 THEN 0.0
                    WHEN greatest(width, height)::DOUBLE / least(width, height)
                         > (16.0 / 9.0) THEN 0.0
                    WHEN lower(img_url) LIKE '%sprite%'
                         OR lower(img_url) LIKE '%logo%'
                         THEN (width * height)::DOUBLE / 10
                    ELSE (width * height)::DOUBLE END AS score
        FROM cand
    )
    SELECT doc_id, img_url, round(score, 4) AS score FROM (
        SELECT doc_id, img_url, score,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY score DESC, img_url) AS rn
        FROM scored WHERE score > 0)
    WHERE rn = 1
"""


_MEDIA_FEATURES_ORACLE = """
    SELECT md5(text) AS media_id,
           'image' AS kind,
           strlen(text)::BIGINT AS n_bytes,
           (64 + ('0x' || substring(md5(text), 1, 2))::INT) AS width,
           (64 + ('0x' || substring(md5(text), 31, 2))::INT) AS height,
           1 AS n_frames,
           NULL::VARCHAR AS error
    FROM documents
"""
