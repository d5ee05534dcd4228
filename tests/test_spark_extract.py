"""Spark-side tests: per-turn equality against goldens (the north-rule
check), the synthetic pipeline, plan shape, and the driver contract."""
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF0001, requires_reference


@requires_reference
def test_per_turn_text_equality(spark):
    """Fixture transcripts → extraction → join goldens on
    (conv_id, turn_idx) → per-turn equality, stable turn ordering
    (north rule; method per reference tests/unit_tests.py:104-116)."""
    from newspaper_spark.operators.extract import extract_articles
    from newspaper_spark.sources.transcripts import fixture_transcripts

    transcripts, golden = fixture_transcripts(spark)
    out = extract_articles(transcripts)
    joined = out.join(F.broadcast(golden), ["conv_id", "turn_idx"])
    total = joined.count()
    assert total == golden.count()  # no row loss
    matches = joined.filter(
        F.col("text").eqNullSafe(F.col("expected_text"))
    ).count()
    # 157 fixtures = 132 with matchable goldens (all match) + 20
    # sentinel goldens (failure notes) + 5 pages with no golden at all
    assert matches >= 132, f"only {matches}/{total} per-turn matches"
    # ordering stability: turn_idx strictly increasing per conversation
    w_ok = (
        joined.groupBy("conv_id")
        .agg(
            F.count("*").alias("n"),
            F.size(F.array_distinct(F.collect_list("turn_idx"))).alias("d"),
        )
        .filter(F.col("n") != F.col("d"))
        .count()
    )
    assert w_ok == 0


def test_synthetic_pipeline_roundtrip(spark):
    from newspaper_spark.operators.extract import extract_articles
    from newspaper_spark.sources.transcripts import (
        PARA_LEAD,
        synthetic_transcripts,
    )

    t = synthetic_transcripts(spark, SF0001)
    out = extract_articles(t)
    ok = out.filter((F.col("status") == "ok") & (F.length("text") > 0))
    assert ok.count() == t.count()
    row = ok.first()
    assert row.text.startswith(PARA_LEAD.rstrip())
    assert row.authors == ["Alex Writer"]
    assert row.meta_site_name == "Example Media"


def test_plan_has_single_python_stage(spark):
    """The extraction stage must be ONE ArrowEvalPython (single parse per
    row), with column pruning down to the UDF inputs."""
    from newspaper_spark.operators.extract import extract_articles
    from newspaper_spark.sources.transcripts import synthetic_transcripts

    t = synthetic_transcripts(spark, SF0001)
    out = extract_articles(t)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1, plan


def test_pdf_rows_skipped(spark):
    from newspaper_spark.operators.extract import extract_articles

    df = spark.createDataFrame(
        [("c1", 0, "user", "%PDF-1.4 binarystuff", "", None)],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    out = extract_articles(df).collect()
    assert out[0].status == "skipped_media"
    assert (out[0].text or "") == ""


def test_malformed_html_is_isolated(spark):
    """One broken row must not kill the batch (per-row fault tolerance)."""
    from newspaper_spark.operators.extract import extract_articles

    rows = [
        ("c1", 0, "user", "<html><body><p>" + "ok text here " * 30 + "</p></body>", "", None),
        ("c1", 1, "user", "", "", None),
        ("c1", 2, "user", None, "", None),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    out = {r.turn_idx: r for r in extract_articles(df).collect()}
    assert out[0].status == "ok"
    assert out[1].status in ("no_html", "parse_failed")
    assert out[2].status == "no_html"


def test_entry_contract(spark):
    import __spark_entry__ as E

    df = E.entry(spark)
    assert df.count() > 0
    qs = E.queries()
    oracles = E.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 20


def test_read_transcripts_all_formats(spark, tmp_path):
    """parquet/json/csv round-trip with the explicit schema — no
    inference, identical rows back from every format."""
    from newspaper_spark.sources.transcripts import (
        read_transcripts,
        synthetic_transcripts,
    )
    from tests.conftest import SF0001
    import pyspark.sql.functions as F

    t = synthetic_transcripts(spark, SF0001).limit(12).cache()
    n = t.count()

    p_dir = str(tmp_path / "p")
    j_dir = str(tmp_path / "j")
    c_dir = str(tmp_path / "c")
    t.write.parquet(p_dir)
    t.write.json(j_dir)
    t.select(
        "conv_id", "turn_idx", "role", "text", "tool",
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss").alias("ts"),
    ).write.option("header", "true").csv(c_dir)

    # CSV cannot represent ''-vs-null (unquoted empty reads as null);
    # compare through the same coalesce the pipeline applies
    tool_n = F.coalesce("tool", F.lit("")).alias("tool")
    ref = sorted(
        t.select("conv_id", "turn_idx", "role", tool_n, "ts").collect()
    )
    for fmt, d in (("parquet", p_dir), ("json", j_dir), ("csv", c_dir)):
        got = read_transcripts(spark, d, fmt)
        assert got.schema.simpleString() == t.schema.simpleString(), fmt
        rows = sorted(
            got.select("conv_id", "turn_idx", "role", tool_n, "ts").collect()
        )
        assert rows == ref, fmt
        assert got.count() == n, fmt

    import pytest

    with pytest.raises(ValueError, match="unsupported"):
        read_transcripts(spark, p_dir, "xml")


def test_packed_extraction_byte_equal(spark):
    """extract_articles_packed (zlib-compressed HTML across the Arrow
    boundary, per-worker decompress) must produce byte-identical rows
    to extract_articles on the same input — the lossless-round-trip
    guarantee behind the packed bench path (BENCH.md round-6 Arrow
    handoff experiment)."""
    from newspaper_spark.operators.extract import (
        compress_text_udf,
        extract_articles,
        extract_articles_packed,
    )
    from newspaper_spark.sources.transcripts import synthetic_transcripts

    t = synthetic_transcripts(spark, SF0001)
    packed = t.withColumn("text_z", compress_text_udf(F.col("text"))).drop(
        "text"
    )
    plain = extract_articles(t, include_article_html=True)
    viaz = extract_articles_packed(packed, include_article_html=True)
    # packed bytes must genuinely be smaller (the experiment's premise)
    sizes = packed.select(
        F.sum(F.length("text_z")).alias("z")
    ).first()
    raw = t.select(F.sum(F.length("text")).alias("r")).first()
    assert sizes.z < raw.r / 4
    key = ["conv_id", "turn_idx"]
    # exceptAll both ways over every output column = exact multiset
    # equality (arrays/timestamps included)
    assert plain.exceptAll(viaz).count() == 0
    assert viaz.exceptAll(plain).count() == 0
    assert plain.count() == t.count()
    assert plain.select(key).distinct().count() == t.count()
