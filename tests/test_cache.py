"""Operator-cache lifecycle: internal persists are tracked and
releasable after consumption (VERDICT r3 item 6 / CLAUDE.md open item)."""
from pyspark.sql import functions as F

from newspaper_spark import cache


def _docs(spark):
    rows = [(i, f"token{i % 7} alpha beta gamma delta {i}") for i in range(60)]
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_release_unpersists_operator_caches(spark):
    from newspaper_spark.operators.dedup import minhash_lsh_pairs

    cache.release()  # clean slate from other tests
    before = cache.tracked_count()
    pairs = minhash_lsh_pairs(_docs(spark), num_hashes=8, bands=4)
    pairs.count()  # consume
    assert cache.tracked_count() == before + 1
    n = cache.release()
    assert n >= 1
    assert cache.tracked_count() == 0
    # output stays usable after release — the plan just recomputes
    assert pairs.count() >= 0


def test_tracking_scope_releases_only_inner(spark):
    from newspaper_spark.operators.dedup import minhash_lsh_pairs
    from newspaper_spark.operators.span_dedup import span_dedup

    cache.release()
    outer = minhash_lsh_pairs(_docs(spark), num_hashes=8, bands=4)
    outer.count()
    assert cache.tracked_count() == 1
    with cache.tracking_scope():
        out = span_dedup(_docs(spark)).collect()
        assert len(out) == 60
        # span_dedup tracks TWO persists since round 8 (sentence table
        # + span-hash table) — plus the outer minhash signature table
        assert cache.tracked_count() == 3
    # inner (span_dedup's sentence + span tables) released, outer kept
    assert cache.tracked_count() == 1
    cache.release()


def test_release_keeps_critical_until_forced(spark):
    cache.release(include_critical=True)
    crit = cache.track(_docs(spark).persist(), critical=True)
    plain = cache.track(_docs(spark).select("doc_id").persist())
    crit.count()
    plain.count()
    assert cache.release() == 1  # only the plain persist drops
    assert cache.tracked_count() == 1
    assert crit.storageLevel.useMemory
    assert cache.release(include_critical=True) == 1
    assert cache.tracked_count() == 0
    assert not crit.storageLevel.useMemory


def test_pack_offsets_safe_under_global_release(spark):
    """ADVICE r4 (medium): a global release() between plan construction
    and materialization must NOT un-pin pack_offsets' partition
    assignment — the persist is critical-tagged, so offsets stay exact."""
    from newspaper_spark.operators.packing import pack_offsets

    cache.release(include_critical=True)
    df = spark.createDataFrame(
        [(i, (i * 7) % 11 + 1) for i in range(200)], "doc_id int, n_tokens int"
    )
    out = pack_offsets(df, seq_len=16, num_partitions=8)
    # the interleaving-caller footgun: global sweep BEFORE materialization
    cache.release()
    rows = {r["doc_id"]: r["offset"] for r in out.collect()}
    run = 0
    for i in range(200):  # ids are 0..199 → id order == range order
        assert rows[i] == run
        run += (i * 7) % 11 + 1
    cache.release(include_critical=True)


def test_scope_releases_critical_after_materialization(spark):
    from newspaper_spark.operators.packing import pack_offsets

    cache.release(include_critical=True)
    with cache.tracking_scope():
        df = spark.createDataFrame(
            [(i, i % 5) for i in range(50)], "doc_id int, n_tokens int"
        )
        assert pack_offsets(df, seq_len=8).count() == 50
        assert cache.tracked_count() == 1
    assert cache.tracked_count() == 0  # scope owns its critical persist


def test_scope_ownership_is_context_local(spark):
    """A persist tracked by ANOTHER thread while a scope is open must
    not be unpersisted by this scope's exit (ADVICE r4 low)."""
    import threading

    cache.release(include_critical=True)
    other = {}

    def other_thread():
        other["df"] = cache.track(_docs(spark).persist())
        other["df"].count()

    with cache.tracking_scope():
        mine = cache.track(_docs(spark).select("doc_id", "text").persist())
        mine.count()
        t = threading.Thread(target=other_thread)
        t.start()
        t.join()
        assert cache.tracked_count() == 2
    # scope released only its own persist; the other thread's survives
    assert cache.tracked_count() == 1
    assert other["df"].storageLevel.useMemory
    assert not mine.storageLevel.useMemory
    cache.release()


def test_release_actually_frees_jvm_blocks(spark):
    """release() must clear the JVM-side cache, not just the Python
    registry — is_cached on the tracked frame flips off."""
    cache.release()
    df = cache.track(_docs(spark).persist())
    df.count()
    assert df.storageLevel.useMemory
    assert cache.release() == 1
    assert not df.storageLevel.useMemory
    assert cache.release() == 0  # idempotent
