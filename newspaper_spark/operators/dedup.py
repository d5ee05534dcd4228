"""Deduplication operators for large-scale training-data pipelines.

All four families operate on a documents table (doc_id, text) and are
written Spark-first:

* exact        — md5 grouping; one shuffle on the 32-hex key, map-side
                 combine via min() aggregation.
* minhash LSH  — shingle → K minhashes → B bands; candidate pairs come
                 from a self-equi-join on (band_idx, band_signature),
                 i.e. co-partitioned hash join, never an O(n²) cross
                 join. Hashes are md5-hex strings (portable: the DuckDB
                 oracle reproduces them bit-for-bit).
* simhash      — 64-bit sign-aggregated token hashes via bit counting
                 in Column space.
* n-gram jaccard — verification stage for LSH candidates, array ops.

At 100 TB: every stage is a narrow map except the LSH band join and the
final groupBys, which shuffle on uniformly-distributed hash keys (no
skew by construction). Band count B and rows-per-band R trade recall
for shuffle width — defaults (B=8, R=2) match the usual 0.7-ish
Jaccard threshold knee.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def normalized_text(c):
    """lowercase, collapse whitespace — canonical form for hashing."""
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact-dup fingerprint: md5 of normalized text."""
    return df.withColumn("fingerprint", F.md5(normalized_text(F.col(text_col))))


def dedup_exact(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep min-id representative per identical normalized text.

    groupBy(md5) — partial aggregation map-side, single shuffle on the
    hash (never on the full text)."""
    fp = fingerprint(df, text_col)
    reps = fp.groupBy("fingerprint").agg(F.min(id_col).alias(id_col))
    return reps.select(id_col, "fingerprint")


def shingles_col(text_col, n: int = 3):
    """Word n-gram shingles as an array column (JVM-side)."""
    toks = F.split(normalized_text(text_col), " ")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    return F.array_distinct(
        F.transform(
            idx,
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        )
    )


def minhash_signature(text_col, num_hashes: int = 16, shingle_n: int = 3):
    """Array of `num_hashes` minhash values.

    Each hash_k(shingle) = md5(k || ':' || shingle) compared as hex
    strings; min over shingles. Pure Column expressions (transform +
    array_min) — no UDF, and md5 makes the DuckDB oracle exact."""
    sh = shingles_col(text_col, shingle_n)

    def min_hash_k(k: int):
        # factory, not a default-arg lambda: pyspark would reinterpret a
        # two-parameter lambda as (element, index)
        prefix = f"{k}:"
        return F.array_min(
            F.transform(sh, lambda s: F.md5(F.concat(F.lit(prefix), s)))
        )

    return F.array(*[min_hash_k(k) for k in range(num_hashes)])


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """Candidate near-duplicate pairs (id_a < id_b) via banded LSH.

    rows/band = num_hashes/bands. Pair generation = self equi-join on
    (band, signature): both sides shuffle-partition on the band key, so
    work is proportional to true collisions."""
    rows_per_band = num_hashes // bands
    sig = df.select(
        F.col(id_col).alias("id"),
        minhash_signature(F.col(text_col), num_hashes, shingle_n).alias("mh"),
    )
    banded = sig.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            "|", F.slice("mh", b * rows_per_band + 1, rows_per_band)
                        ).alias("sig"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bs"),
    ).select("id", "bs.band", "bs.sig")
    left = banded.alias("l")
    right = banded.alias("r")
    pairs = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.sig") == F.col("r.sig"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .distinct()
    )
    return pairs


def ngram_jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Verify candidate pairs with exact n-gram Jaccard similarity.

    Joins shingle arrays onto both pair sides (broadcast-able when the
    candidate set is small) and computes |∩|/|∪| with array ops."""
    sh = df.select(
        F.col(id_col).alias("id"), shingles_col(F.col(text_col), shingle_n).alias("sh")
    )
    a = sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    joined = pairs.join(a, "id_a").join(b, "id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    jac = F.when(union > 0, inter / union).otherwise(F.lit(0.0))
    return (
        joined.select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def simhash_col(text_col, bits: int = 64):
    """64-bit SimHash over word tokens, entirely in Column space:
    per-token 64-bit hash (xxhash64), per-bit ±1 votes (shift amounts
    are Python-level literals — Spark's shiftright needs an int), sign
    of the vote sets the bit."""
    toks = F.split(normalized_text(text_col), " ")
    hashes = F.transform(toks, lambda t: F.xxhash64(t))

    def vote(i: int):
        return F.aggregate(
            hashes,
            F.lit(0).cast("long"),
            lambda acc, h: acc
            + F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )

    sim = F.lit(0).cast("long")
    for i in range(bits):
        bit = (
            F.lit(int(-(2**63))) if i == 63 else F.shiftleft(F.lit(1).cast("long"), i)
        )
        sim = sim.bitwiseOR(F.when(vote(i) > 0, bit).otherwise(F.lit(0).cast("long")))
    return sim


def simhash_near_dups(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance ≤ k.

    Scale path: block on 4 16-bit chunks (pigeonhole: distance ≤3 ⇒ at
    least one chunk equal), join per chunk — shuffle on chunk value,
    never all-pairs."""
    sh = df.select(
        F.col(id_col).alias("id"), simhash_col(F.col(text_col)).alias("sim")
    )
    chunks = sh.select(
        "id",
        "sim",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright("sim", c * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("val"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("cv"),
    ).select("id", "sim", "cv.chunk", "cv.val")
    l, r = chunks.alias("l"), chunks.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.chunk") == F.col("r.chunk"))
            & (F.col("l.val") == F.col("r.val"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.col("l.sim").alias("sim_a"),
            F.col("r.sim").alias("sim_b"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return cand.select("id_a", "id_b", ham.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )
