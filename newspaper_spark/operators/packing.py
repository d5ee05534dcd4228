"""Sequence packing for LM training: documents are concatenated in a
canonical order (by id) and cut into fixed-length token sequences
(GPT-style packing); each document gets its global token ``offset``,
the packed sequence it starts in, its position there, and how many
sequences it spans. Downstream, a writer groups by ``start_seq`` to
emit the actual packed batches.

The global prefix sum is the crux at 100 TB. A bare
``Window.orderBy(id)`` (no partitionBy) collapses to ONE partition —
the classic scale-killer — so this uses the textbook two-level
distributed scan instead:

1. range-repartition by id and sort within partitions (id order is the
   canonical global order, so the result is partitioning-invariant);
2. per-partition token totals (tiny: one row per partition);
3. exclusive prefix over those totals in a driver-size window (#rows =
   #partitions, O(model) not O(data)) broadcast-joined back;
4. per-partition running sum + partition base = exact global offset.

Integer arithmetic throughout — bit-exact, order-canonical, and the
oracle reconstructs it with a plain SQL running window.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from newspaper_spark import cache



def pack_offsets(
    df: DataFrame,
    id_col: str = "doc_id",
    count_col: str = "n_tokens",
    seq_len: int = 256,
    num_partitions: int = 64,
) -> DataFrame:
    """(id, n_tokens, offset, start_seq, start_pos, n_seqs).

    ``offset`` is the exclusive prefix sum of ``count_col`` in id
    order; a doc occupies global token positions [offset, offset+n).
    ``n_seqs`` is how many length-``seq_len`` sequences it touches
    (0 for empty docs).
    """
    ordered = (
        df.select(
            F.col(id_col).alias("id"),
            F.coalesce(F.col(count_col), F.lit(0)).cast("long").alias("n"),
        )
        .repartitionByRange(num_partitions, "id")
        .sortWithinPartitions("id")
    )
    # persist is CORRECTNESS-load-bearing, not a perf hint: with_pid
    # fans into the partition-totals branch and the placement branch,
    # and spark_partition_id depends on the range shuffle's SAMPLED
    # boundaries. If exchange reuse were ever defeated (the broadcast
    # join below is exactly the pattern that defeats it elsewhere in
    # this repo), the two branches could re-execute the shuffle with
    # different boundaries and silently corrupt offsets. Persisting
    # pins one materialization of the partition assignment.
    # critical=True: a global cache.release() before this output is
    # materialized would un-pin the partition assignment (a CORRECTNESS
    # hazard, not a recompute) — only tracking_scope (whose contract is
    # output-materialized-before-exit) or release(include_critical=True)
    # may drop it.
    with_pid = cache.track(
        ordered.withColumn("pid", F.spark_partition_id()).persist(),
        critical=True,
    )
    part_tot = with_pid.groupBy("pid").agg(F.sum("n").alias("psum"))
    # exclusive prefix over partition totals: #partitions rows — this
    # window IS single-partition, by design, and O(partitions)
    wpid = W.orderBy("pid").rowsBetween(W.unboundedPreceding, -1)
    base = part_tot.select(
        "pid", F.coalesce(F.sum("psum").over(wpid), F.lit(0)).alias("pbase")
    )
    wlocal = W.partitionBy("pid").orderBy("id").rowsBetween(
        W.unboundedPreceding, -1
    )
    placed = (
        with_pid.withColumn(
            "loff", F.coalesce(F.sum("n").over(wlocal), F.lit(0))
        )
        .join(F.broadcast(base), "pid")
        .select("id", "n", (F.col("pbase") + F.col("loff")).alias("offset"))
    )
    start_seq = F.floor(F.col("offset") / seq_len)
    end_seq = F.floor((F.col("offset") + F.col("n") - 1) / seq_len)
    return placed.select(
        F.col("id").alias(id_col),
        F.col("n").alias(count_col),
        "offset",
        start_seq.cast("long").alias("start_seq"),
        (F.col("offset") % seq_len).cast("long").alias("start_pos"),
        F.when(F.col("n") > 0, (end_seq - start_seq + 1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("n_seqs"),
    )
