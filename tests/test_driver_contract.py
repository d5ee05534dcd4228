"""Contract tests for __spark_entry__ — the exact properties the driver
harness depends on (learned the hard way in round 1)."""
import pytest

from tests.conftest import SF0001


def test_no_array_columns_in_any_query(spark):
    """The driver canonicalizer sorts result frames with pandas
    sort_values over ALL columns and cannot sort list cells — every
    queries() entry must emit scalar-only schemas."""
    import __spark_entry__ as E
    from pyspark.sql import types as T

    def has_array(dt):
        if isinstance(dt, T.ArrayType) or isinstance(dt, T.MapType):
            return True
        if isinstance(dt, T.StructType):
            return any(has_array(f.dataType) for f in dt.fields)
        return False

    bad = {}
    for name, fn in E.queries().items():
        df = fn(spark, SF0001)
        arrays = [f.name for f in df.schema.fields if has_array(f.dataType)]
        if arrays:
            bad[name] = arrays
    assert not bad, f"array-typed output columns would crash the driver: {bad}"


def test_oracle_keys_subset_of_queries(spark):
    import __spark_entry__ as E

    qs = set(E.queries())
    os_ = set(E.oracle_sql())
    assert os_ <= qs, f"oracles without queries: {os_ - qs}"
    # every query has an exact oracle (round 3 closed the last
    # rows-only entry, nlp_summary)
    assert qs - os_ == set(), qs - os_


def test_entry_smoke(spark):
    """Driver smoke contract: entry(spark) runs, returns >=0 rows with a
    stable schema."""
    import __spark_entry__ as E

    df = E.entry(spark)
    cols = df.columns
    assert cols == [
        "conv_id", "turn_idx", "title", "text", "authors",
        "publish_date", "meta_site_name", "status",
    ]
    rows = df.limit(5).collect()
    assert len(rows) > 0


def test_every_oracle_parses_in_duckdb():
    """EXPLAIN every oracle_sql() string against empty tables with the
    driver's schemas — catches SQL syntax/typo drift (a reserved-word
    alias once cost a red row) without the full value comparison."""
    import duckdb

    import __spark_entry__ as E

    con = duckdb.connect()
    for t in (
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet("
            f"'{SF0001}/{t}.parquet') LIMIT 0"
        )
    oracles = E.oracle_sql()
    assert set(oracles) <= set(E.queries())
    for name, sql in oracles.items():
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as e:  # pragma: no cover
            raise AssertionError(f"oracle {name} failed to parse: {e}") from e
