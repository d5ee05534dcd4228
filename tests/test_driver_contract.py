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
    """ROTATION.md: window = first 50; rotation step 52 = len − window.
    With 102 canonical queries the 52-entry unsampled tails of two
    consecutive rounds CANNOT be disjoint (2·52 > 102): the strongest
    achievable guarantee — pinned here — is (a) the two-round miss set
    has exactly the minimal size 2·(len−window)−len = 2, (b) that pair
    ROTATES (a different pair each consecutive round pair, so any one
    query misses twice at most once per full cycle), and (c) NO query
    misses three consecutive driver rounds. Round 6 reproduces offset 0
    (the canonical list was folded to round-6 emitted order)."""
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

    min_overlap = max(
        0, 2 * (len(all_names) - E._DRIVER_WINDOW) - len(all_names)
    )
    prev_pair = None
    for r in range(6, 16):
        w1, w2, w3 = window(r), window(r + 1), window(r + 2)
        missed_twice = {q for q in all_names if q not in w1 and q not in w2}
        assert len(missed_twice) == min_overlap, (r, missed_twice)
        assert missed_twice != prev_pair  # the pair rotates
        prev_pair = missed_twice
        # nothing ever misses three rounds in a row
        assert not [q for q in missed_twice if q not in w3]

    # round 6 ≙ offset 0: the fold preserved round-6's emitted order
    monkeypatch.setenv("SPARK_GRAFT_ROUND", "6")
    r6 = list(E.queries())
    assert r6[0] == "quality_classifier" and r6[101] == "nlp_sentence_scores"
    # round 7's window closes the r5/r6 two-round gap for the nlp pair
    # (the VERDICT r6 done-criterion) and the deferred pair is exactly
    # line_filters + bloom_seen as the CLAUDE.md recipe predicted
    monkeypatch.setenv("SPARK_GRAFT_ROUND", "7")
    r7 = list(E.queries())
    r7_window = set(r7[: E._DRIVER_WINDOW])
    assert {"nlp_summary", "nlp_sentence_scores"} <= r7_window
    assert {"line_filters", "bloom_seen"} == set(r6[50:52])
    assert not {"line_filters", "bloom_seen"} & r7_window


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
    # full tail coverage is impossible once n > 2w (tails of n−w can
    # only overlap by ≥ 2(n−w)−n — see test_rotation_policy_invariants);
    # the auto-fold must hit exactly that floor, never worse
    min_overlap = max(0, 2 * (len(names_next) - E._DRIVER_WINDOW) - len(names_next))
    assert len(tail_now - window_next) <= min_overlap, tail_now - window_next
    # and the guarantee keeps holding one more round after that
    tail_next = set(names_next[E._DRIVER_WINDOW:])
    monkeypatch.setenv("SPARK_GRAFT_ROUND", str(authored + 2))
    window_after = set(list(E.queries())[: E._DRIVER_WINDOW])
    assert len(tail_next - window_after) <= min_overlap, tail_next - window_after


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

    # a debut query must not evict MORE of the previous round's
    # unsampled tail than the arithmetic floor: the offset advances by
    # len(_NEW_THIS_ROUND), so with D debuts round r+1's window covers
    # all but min_overlap + D entries of round r's tail (min_overlap =
    # 2·(n−w)−n is unavoidable once n > 2w; the +D is the recipe's
    # documented deferral — see CLAUDE.md round-7 folding recipe)
    canonical = [nm for nm, _ in E._CANONICAL_QUERIES]
    n, w = len(canonical), E._DRIVER_WINDOW
    min_overlap = max(0, 2 * (n - w) - n)
    for r in range(4, E._AUTHORED_FOR_ROUND):
        monkeypatch.setattr(E, "_NEW_THIS_ROUND", [])
        monkeypatch.setenv("SPARK_GRAFT_ROUND", str(r))
        prev_tail = set(list(E.queries())[E._DRIVER_WINDOW:])
        monkeypatch.setattr(
            E, "_NEW_THIS_ROUND", [("brand_new_op", sentinel)]
        )
        monkeypatch.setenv("SPARK_GRAFT_ROUND", str(r + 1))
        window = set(list(E.queries())[: E._DRIVER_WINDOW])
        deferred = prev_tail - window
        assert len(deferred) <= min_overlap + 1, (r, deferred)
    assert "domain_counters" in canonical  # the query that caught this


def test_round_inference_ignores_stray_files(monkeypatch, tmp_path):
    """ADVICE r6: the round-inference glob must FULLMATCH the exact
    driver filename pattern — a stray root file must not be able to
    advance the inferred round and silently reorder queries()."""
    import os
    import shutil

    import __spark_entry__ as E

    monkeypatch.delenv("SPARK_GRAFT_ROUND", raising=False)
    src = os.path.dirname(os.path.abspath(E.__file__))
    shutil.copy(os.path.join(src, "__spark_entry__.py"), tmp_path)
    # simulate a repo root: only the real driver artifacts count
    (tmp_path / "CORRECTNESS_r01.json").write_text("{}")
    (tmp_path / "CORRECTNESS_r06.json").write_text("{}")
    # stray files that the old search()-based match would have counted
    (tmp_path / "CORRECTNESS_rerun_r9.json").write_text("{}")
    (tmp_path / "CORRECTNESS_r06_backup_r12.json").write_text("{}")

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entry_stray_test", str(tmp_path / "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert mod._round_no() == 7  # max real round 6 + 1; strays ignored


def test_rotation_arithmetic_properties(monkeypatch):
    """Hypothesis-style sweep of the rotation arithmetic itself, over
    a grid of canonical sizes and debut counts (pure Python — no
    Spark): for ANY n > window and D ≤ 10, (a) nothing is ever lost or
    duplicated, (b) debuts always lead the emitted order in the
    authored round, (c) the two-round miss set never exceeds
    max(0, 2(n−w)−n) + D, and (d) the THREE-round miss set has exactly
    the structural size max(0, 3(n−w)−2n) — zero while n ≤ 3w (so "no
    query misses three consecutive rounds" holds for the current 106),
    and pinned to the exact floor past that, so the policy docs can't
    over-claim as the list keeps growing."""
    import __spark_entry__ as E

    sentinel = object()
    w = E._DRIVER_WINDOW
    for n in (51, 60, 80, 102, 106, 150, 199):
        canonical = [(f"q{i:03d}", sentinel) for i in range(n)]
        monkeypatch.setattr(E, "_CANONICAL_QUERIES", canonical)
        monkeypatch.setattr(E, "_ROTATION_STEP", n - w)
        monkeypatch.setattr(E, "_ROTATION_BASE_ROUND", 6)
        monkeypatch.setattr(E, "_AUTHORED_FOR_ROUND", 20)
        names_all = {nm for nm, _ in canonical}
        min_overlap = max(0, 2 * (n - w) - n)
        min_overlap3 = max(0, 3 * (n - w) - 2 * n)

        # steady state, D=0: loss-free rotation + minimal miss sets
        monkeypatch.setattr(E, "_NEW_THIS_ROUND", [])
        windows = {}
        for r in range(6, 14):
            monkeypatch.setenv("SPARK_GRAFT_ROUND", str(r))
            names = list(E.queries())
            assert len(names) == n and set(names) == names_all  # (a)
            windows[r] = set(names[:w])
        for r in range(6, 12):
            missed2 = names_all - windows[r] - windows[r + 1]
            assert len(missed2) == min_overlap, (n, r)  # (c) tight at D=0
            missed3 = missed2 - windows[r + 2]
            assert len(missed3) == min_overlap3, (n, r)  # (d)

        # debut round, D in 1..10: debuts lead, bounded eviction
        for D in (1, 3, 10):
            debuts = [(f"new{i}", sentinel) for i in range(D)]
            monkeypatch.setattr(E, "_NEW_THIS_ROUND", debuts)
            monkeypatch.setenv("SPARK_GRAFT_ROUND", "8")
            names = list(E.queries())
            assert names[:D] == [nm for nm, _ in debuts]  # (b)
            assert len(names) == n + D and len(set(names)) == n + D  # (a)
            prev_tail = names_all - windows[7]
            deferred = prev_tail - set(names[:w])
            assert len(deferred) <= min_overlap + D, (n, D)  # (c)
