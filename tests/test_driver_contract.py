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
    """ROTATION.md: window = first 50; rotation step 30 makes
    consecutive rounds' unsampled tails disjoint, so no query misses
    two consecutive driver rounds; round 5 reproduces offset 0 (the
    canonical list was folded forward to round-5 emitted order)."""
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

    for r in range(5, 15):
        w1, w2 = window(r), window(r + 1)
        assert not [q for q in all_names if q not in w1 and q not in w2]

    # round 5 ≙ offset 0: the fold preserved round-5's emitted order
    monkeypatch.setenv("SPARK_GRAFT_ROUND", "5")
    r5 = list(E.queries())
    assert r5[0] == "line_filters" and r5[49] == "domain_counters"
    # round 6's window covers round 5's entire unsampled tail (the
    # VERDICT r5 done-criterion: extract_fulltext, dsir, media_video,
    # semantic_clusters, nlp_summary all get driver rows this round)
    r5_tail = set(r5[E._DRIVER_WINDOW:])
    monkeypatch.setenv("SPARK_GRAFT_ROUND", "6")
    r6_window = set(list(E.queries())[: E._DRIVER_WINDOW])
    assert r5_tail <= r6_window, r5_tail - r6_window
    for heavy in ("extract_fulltext", "dsir", "media_video",
                  "semantic_clusters", "nlp_summary"):
        assert heavy in r6_window


def test_forgotten_fold_auto_folds(monkeypatch):
    """ADVICE r5 finding 1: if the round advances past
    _AUTHORED_FOR_ROUND with _NEW_THIS_ROUND still unfolded, queries()
    must fold forward automatically — the authored round's unsampled
    tail must still be fully inside the next round's window."""
    import __spark_entry__ as E

    sentinel = object()
    debuts = [("late_fold_op_a", sentinel), ("late_fold_op_b", sentinel)]
    monkeypatch.setattr(E, "_NEW_THIS_ROUND", debuts)
    authored = E._AUTHORED_FOR_ROUND

    # authored round: debuts lead, all canonical entries present
    monkeypatch.setenv("SPARK_GRAFT_ROUND", str(authored))
    names_now = list(E.queries())
    assert names_now[0] == "late_fold_op_a"
    tail_now = set(names_now[E._DRIVER_WINDOW:])

    # next round WITHOUT the manual fold: auto-fold must kick in
    monkeypatch.setenv("SPARK_GRAFT_ROUND", str(authored + 1))
    names_next = list(E.queries())
    assert sorted(names_next) == sorted(names_now)  # nothing lost
    window_next = set(names_next[: E._DRIVER_WINDOW])
    assert tail_now <= window_next, tail_now - window_next
    # and the guarantee keeps holding one more round after that
    tail_next = set(names_next[E._DRIVER_WINDOW:])
    monkeypatch.setenv("SPARK_GRAFT_ROUND", str(authored + 2))
    window_after = set(list(E.queries())[: E._DRIVER_WINDOW])
    assert tail_next <= window_after, tail_next - window_after


def test_new_queries_enter_window_first(monkeypatch):
    import __spark_entry__ as E

    sentinel = object()
    monkeypatch.setattr(
        E, "_NEW_THIS_ROUND", [("brand_new_op", sentinel)]
    )
    # debut-first only holds through the authored round — past it the
    # auto-fold (test_forgotten_fold_auto_folds) takes over
    monkeypatch.setenv("SPARK_GRAFT_ROUND", str(E._AUTHORED_FOR_ROUND))
    names = list(E.queries())
    assert names[0] == "brand_new_op"
    assert len(names) == len(E._CANONICAL_QUERIES) + 1

    # a debut query must not evict the previous round's unsampled tail
    # from the window: the offset advances by len(_NEW_THIS_ROUND), so
    # for every round r ≤ authored, round r+1's window still covers
    # round r's tail (debuts at r+1 ≤ authored — manual-fold regime)
    canonical = [nm for nm, _ in E._CANONICAL_QUERIES]
    for r in range(4, E._AUTHORED_FOR_ROUND):
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
