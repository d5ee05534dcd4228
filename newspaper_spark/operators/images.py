"""Image-candidate scoring: the reference's entropy + area math
re-expressed Spark-first.

The reference fetches every candidate image and scores it
(/root/reference/newspaper/images.py): Shannon entropy over the pixel
histogram (images.py:49-55) drives thumbnail cropping, and
``calculate_area`` (images.py:198-220) ranks candidates — minimum area
5000, minimum width 90 (thumbnail_size[0]), aspect ratio capped at
16/9 (config.image_dimension_ration), 10× penalty for sprite/logo
URLs, argmax area wins (largest_image_url, images.py:181-196).

Network fetch is out of scope in this engine (SURVEY.md §2.8); the
MATH is not. ``candidate_area_score`` / ``top_image_by_area`` are pure
Column/relational forms over provided dimensions, and entropy is a
relational aggregation (explode → p·log2 p sum) that runs in
whole-stage codegen — no UDF anywhere.
"""
from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MINIMAL_AREA = 5000
MIN_WIDTH = 90  # thumbnail_size[0]
MAX_DIMENSION_RATIO = 16 / 9.0


def histogram_entropy(hist) -> float:
    """Exact reference formula (images.py:49-55): normalize the
    histogram and return -Σ p·log2(p). Pure Python — used by the
    multimodal decode path and as the spec for the relational form."""
    total = sum(hist)
    if total <= 0:
        return 0.0
    ps = [float(h) / total for h in hist]
    return -sum(p * math.log(p, 2) for p in ps if p != 0)


def candidate_area_score(width, height, url):
    """calculate_area (images.py:198-220) as a Column expression:
    0 for tiny / narrow / over-elongated candidates, area otherwise,
    ÷10 when the URL smells like a sprite or logo."""
    area = (width * height).cast("double")
    ratio = F.greatest(width, height).cast("double") / F.least(width, height)
    penalized = F.when(
        F.lower(url).contains("sprite") | F.lower(url).contains("logo"),
        area / 10,
    ).otherwise(area)
    return (
        F.when(area < MINIMAL_AREA, F.lit(0.0))
        .when(width < MIN_WIDTH, F.lit(0.0))
        .when(ratio > MAX_DIMENSION_RATIO, F.lit(0.0))
        .otherwise(penalized)
    )


def top_image_by_area(
    df: DataFrame,
    id_col: str = "doc_id",
    url_col: str = "img_url",
    width_col: str = "width",
    height_col: str = "height",
) -> DataFrame:
    """largest_image_url (images.py:181-196): per document, the
    candidate with the highest positive score. One window over the id —
    shuffle on uniformly distributed doc ids, no skew."""
    scored = df.select(
        F.col(id_col).alias("id"),
        F.col(url_col).alias("img_url"),
        candidate_area_score(
            F.col(width_col), F.col(height_col), F.col(url_col)
        ).alias("score"),
    ).filter(F.col("score") > 0)
    w = Window.partitionBy("id").orderBy(F.desc("score"), F.asc("img_url"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("id", "img_url", F.round("score", 4).alias("score"))
    )


def text_entropy(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Shannon entropy of the character distribution, relationally:
    explode chars → per-(id, char) counts → window-normalized p →
    -Σ p·log2 p. Same formula as histogram_entropy, but whole-stage
    codegen and map-side combinable at 100 TB (the histogram analog of
    the reference's image_entropy when payloads are text)."""
    chars = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.coalesce(F.col(text_col), F.lit("")), "")).alias("c"),
    )
    counts = chars.groupBy("id", "c").agg(F.count("*").alias("n"))
    w = Window.partitionBy("id")
    withp = counts.withColumn("p", F.col("n") / F.sum("n").over(w))
    return withp.groupBy("id").agg(
        F.round(-F.sum(F.col("p") * F.log2("p")), 6).alias("entropy")
    )
