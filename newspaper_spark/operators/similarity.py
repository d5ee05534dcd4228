"""Similarity search over embedding columns (array<float>).

* brute_force_topk — exact cosine top-k per query; dot products via
  ``zip_with``/``aggregate`` (JVM, no Python), ranked with a window.
  Baseline + correctness oracle.
* lsh_topk — random-hyperplane LSH bucketing as the scale path: each
  vector hashes to a sign-bit signature; candidates come from an
  equi-join on (probe) signatures, so the shuffle is proportional to
  bucket collisions, not |Q|×|N|. At 100 TB the signature join
  partitions uniformly by construction.

Hyperplanes are deterministic (md5-derived pseudo-randoms), so results
are reproducible and oracle-checkable.
"""
from __future__ import annotations

import hashlib
import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine_col(a, b):
    denom = _norm(a) * _norm(b)
    return F.when(denom > 0, _dot(a, b) / denom).otherwise(F.lit(0.0))


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    q_id: str = "vec_id",
    c_id: str = "vec_id",
    q_vec: str = "embedding",
    c_vec: str = "embedding",
) -> DataFrame:
    """Exact top-k: broadcast the query side (queries ≪ corpus at scale),
    rank with a per-query window. Returns (query_id, neighbor_id, cos,
    rank)."""
    q = queries.select(
        F.col(q_id).alias("query_id"), F.col(q_vec).alias("qv")
    )
    c = corpus.select(F.col(c_id).alias("neighbor_id"), F.col(c_vec).alias("cv"))
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_col(F.col("qv"), F.col("cv")), 6).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _hyperplanes(dim: int, n_planes: int) -> list:
    """Deterministic pseudo-random unit-ish hyperplanes from md5 bits."""
    planes = []
    for p in range(n_planes):
        vec = []
        for d in range(dim):
            h = hashlib.md5(f"plane:{p}:{d}".encode()).hexdigest()
            # map 8 hex chars to [-1, 1)
            vec.append(int(h[:8], 16) / 2**31 - 1.0)
        planes.append(vec)
    return planes


def signature_col(vec, planes):
    """Sign-bit signature string for one vector against fixed planes."""
    bits = [
        F.when(
            F.aggregate(
                F.zip_with(
                    vec,
                    F.array(*[F.lit(x) for x in plane]),
                    lambda v, w: v * w,
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            >= 0,
            F.lit("1"),
        ).otherwise(F.lit("0"))
        for plane in planes
    ]
    return F.concat(*bits)


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    dim: int | None = None,
    q_id: str = "vec_id",
    c_id: str = "vec_id",
    q_vec: str = "embedding",
    c_vec: str = "embedding",
) -> DataFrame:
    """Approximate top-k: bucket by hyperplane signature, rank within
    buckets. Recall < 1 by design; the bench compares against
    brute_force_topk for recall measurement."""
    if dim is None:
        dim = len(corpus.select(c_vec).first()[0])
    planes = _hyperplanes(dim, n_planes)
    q = queries.select(
        F.col(q_id).alias("query_id"),
        F.col(q_vec).alias("qv"),
        signature_col(F.col(q_vec), planes).alias("sig"),
    )
    c = corpus.select(
        F.col(c_id).alias("neighbor_id"),
        F.col(c_vec).alias("cv"),
        signature_col(F.col(c_vec), planes).alias("sig"),
    )
    scored = (
        q.join(c, "sig")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_col(F.col("qv"), F.col("cv")), 6).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def embedding_dedup_pairs(
    df: DataFrame,
    threshold: float = 0.98,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via the LSH bucket join."""
    dim = len(df.select(vec_col).first()[0])
    planes = _hyperplanes(dim, n_planes)
    sigd = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        signature_col(F.col(vec_col), planes).alias("sig"),
    )
    l, r = sigd.alias("l"), sigd.alias("r")
    return (
        l.join(r, (F.col("l.sig") == F.col("r.sig")) & (F.col("l.id") < F.col("r.id")))
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.round(cosine_col(F.col("l.v"), F.col("r.v")), 6).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )
