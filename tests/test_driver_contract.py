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


def test_rotation_policy_invariants(monkeypatch):
    """ROTATION.md: window = first 50; rotation step 19 makes
    consecutive rounds' unsampled tails disjoint, so no query misses
    two consecutive driver rounds; round 4 reproduces offset 0."""
    import __spark_entry__ as E

    # the canonical-rotation invariants are independent of this round's
    # debuting queries (covered by test_new_queries_enter_window_first)
    monkeypatch.setattr(E, "_NEW_THIS_ROUND", [])
    all_names = [nm for nm, _ in E._CANONICAL_QUERIES]
    assert len(all_names) == len(set(all_names))
    assert E._ROTATION_STEP == len(all_names) - E._DRIVER_WINDOW

    def window(rnd):
        monkeypatch.setenv("SPARK_GRAFT_ROUND", str(rnd))
        names = list(E.queries())
        assert sorted(names) == sorted(all_names)  # rotation, not loss
        return set(names[: E._DRIVER_WINDOW])

    for r in range(4, 14):
        w1, w2 = window(r), window(r + 1)
        assert not [q for q in all_names if q not in w1 and q not in w2]

    monkeypatch.setenv("SPARK_GRAFT_ROUND", "4")
    r4 = list(E.queries())
    assert r4[0] == "nlp_summary" and r4[49] == "winnow"


def test_new_queries_enter_window_first(monkeypatch):
    import __spark_entry__ as E

    sentinel = object()
    monkeypatch.setattr(
        E, "_NEW_THIS_ROUND", [("brand_new_op", sentinel)]
    )
    monkeypatch.setenv("SPARK_GRAFT_ROUND", "7")
    names = list(E.queries())
    assert names[0] == "brand_new_op"
    assert len(names) == len(E._CANONICAL_QUERIES) + 1

    # a debut query must not evict the previous round's unsampled tail
    # from the window: the offset advances by len(_NEW_THIS_ROUND), so
    # for every round r, round r+1's window still covers round r's tail
    canonical = [nm for nm, _ in E._CANONICAL_QUERIES]
    for r in range(4, 14):
        monkeypatch.setattr(E, "_NEW_THIS_ROUND", [])
        monkeypatch.setenv("SPARK_GRAFT_ROUND", str(r))
        prev_tail = set(list(E.queries())[E._DRIVER_WINDOW:])
        monkeypatch.setattr(
            E, "_NEW_THIS_ROUND", [("brand_new_op", sentinel)]
        )
        monkeypatch.setenv("SPARK_GRAFT_ROUND", str(r + 1))
        window = set(list(E.queries())[: E._DRIVER_WINDOW])
        assert prev_tail <= window, (r, prev_tail - window)
    assert "domain_counters" in canonical  # the query that caught this
