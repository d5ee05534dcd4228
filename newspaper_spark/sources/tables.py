"""Uniform table access: Iceberg catalog tables or parquet paths.

The production deployment (BASELINE.json north rule) reads and writes
Iceberg tables; this sandbox has no Iceberg runtime jar, so the
reference syntax is dispatched and the parquet path is the tested
fallback. Table refs:

* ``iceberg:catalog.db.table`` — routed to the Iceberg DataSource
  (requires ``iceberg-spark-runtime`` on the cluster classpath and a
  configured catalog, e.g. ``spark.sql.catalog.<name>`` conf).
* anything else — treated as a parquet directory path.

Write semantics: Iceberg gives snapshot-isolated atomic commits per
write; the parquet fallback relies on the job layer's bucket-overwrite
+ manifest protocol (plans/job.py) for the same exactly-once resume
guarantee.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_ICEBERG_PREFIX = "iceberg:"


def is_iceberg_ref(ref: str) -> bool:
    return ref.startswith(_ICEBERG_PREFIX)


def read_table(spark: SparkSession, ref: str) -> DataFrame:
    if is_iceberg_ref(ref):
        return spark.read.format("iceberg").load(ref[len(_ICEBERG_PREFIX):])
    return spark.read.parquet(ref)


def write_table(df: DataFrame, ref: str, mode: str = "append") -> None:
    if is_iceberg_ref(ref):
        table = ref[len(_ICEBERG_PREFIX):]
        if mode == "append":
            df.writeTo(table).append()
        elif mode == "overwrite":
            df.writeTo(table).createOrReplace()
        else:
            # 'error'/'ignore'/etc must NOT silently replace an
            # existing table on the Iceberg path
            raise ValueError(
                f"unsupported mode {mode!r} for Iceberg table {table!r}: "
                "use 'append' or 'overwrite'"
            )
        return
    df.write.mode(mode).parquet(ref)
