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
        assert cache.tracked_count() == 2
    # inner (span_dedup's sentence table) released, outer kept
    assert cache.tracked_count() == 1
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
