"""Crawl-frontier scheduling — per-host politeness waves.

The reference fetches with a flat ThreadPool and no per-host pacing
(/root/reference/newspaper/network.py:110-135 multithread_request;
mthreading.py ThreadPool) — fine for one news site, a bannable
offense across a 100 TB crawl frontier. Every production crawler
schedules per-host: at most one in-flight request per host per
politeness interval, hosts progressing in parallel. This operator is
the deterministic, relational form of that schedule.

``frontier_schedule`` assigns each URL a 0-based ``wave``: its
position in its host's queue (priority order), i.e. the earliest
politeness slot in which it may be fetched. A downstream executor
fetches wave w everywhere before wave w+1 on the same host; wall time
per host = waves × crawl-delay. The output also carries ``host_rank``
(deterministic order within the host) and ``n_host`` so callers can
cap per-host depth (``wave < K`` = the reference's articles-per-source
cap [:5000], applied frontier-side).

Scale shape: ONE window partitioned by host. The partition bound is
URLs-per-host — the schedule's sequential constraint itself, not an
implementation accident: per-host ordering cannot be computed with
less than per-host grouping, and hosts are the parallelism unit (a
1000-executor crawl has millions of hosts in flight; a single
mega-host partition is the true serial fraction of any polite crawl,
so the plan's skew equals the problem's skew). No other shuffle; raw
pages never move.

Ordering inside a host is by ``(priority DESC, id)`` — priority is any
caller-supplied column (discovery depth, PageRank-ish score, feed
recency); ties break on the unique id so the schedule is
deterministic and resumable.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["frontier_schedule"]


def frontier_schedule(
    df: DataFrame,
    host_col: str = "host",
    id_col: str = "doc_id",
    priority_col: str | None = None,
) -> DataFrame:
    """Attach ``wave`` (0-based politeness slot within the host),
    ``host_rank`` (= wave; kept as an explicit alias for callers that
    filter on depth), and ``n_host`` (total URLs on this host) to
    every row. ``id_col`` must be unique; null priority sorts last."""
    from pyspark.sql import Window as W

    order = [F.col(id_col).asc()]
    if priority_col is not None:
        order = [F.col(priority_col).desc_nulls_last(), F.col(id_col).asc()]
    w = W.partitionBy(host_col).orderBy(*order)
    wall = W.partitionBy(host_col)
    return (
        df.withColumn("wave", F.row_number().over(w) - 1)
        .withColumn("host_rank", F.col("wave"))
        .withColumn("n_host", F.count("*").over(wall).cast("long"))
    )
