"""Local stand-in for the driver's correctness gate: runs every
queries() entry at sf0.01 and compares row-count, schema and an
order-insensitive value hash against oracle_sql() via DuckDB.
"""
import hashlib
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    import datetime
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}"
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def value_hash(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted(
        "|".join(norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.md5()
    for line in lines:
        h.update(line.encode("utf-8"))
        h.update(b"\n")
    return h.hexdigest()


def main():
    import duckdb

    import __spark_entry__ as entrymod
    from newspaper_spark import cache
    from newspaper_spark.plans.session import get_spark

    only = sys.argv[1:] or None

    spark = get_spark(cores=8)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if pathlib.Path(p).exists():
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            # per-query cache scope: operator-internal persists
            # (signature/sentence/token tables) are freed once this
            # query's output is collected, so a 69-query session holds
            # only the active query's blocks (bounded-memory behavior
            # for the driver's session shape)
            with cache.tracking_scope():
                sdf = fn(spark, SF_DIR)
                srows = sdf.collect()
                scols = sdf.columns
        except Exception as e:  # noqa: BLE001
            results[name] = f"SPARK ERROR: {e}"
            continue
        assert cache.tracked_count() == 0, (
            f"{name} leaked {cache.tracked_count()} cache handle(s) past "
            "its tracking_scope"
        )
        if name not in oracles:
            results[name] = f"rows-only: {len(srows)} rows"
            continue
        try:
            orel = con.sql(oracles[name])
            orows = orel.fetchall()
            ocols = orel.columns
        except Exception as e:  # noqa: BLE001
            results[name] = f"ORACLE ERROR: {str(e)[:200]}"
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount {len(srows)} vs {len(orows)}")
        # numeric-KIND drift (Spark int vs DuckDB HUGEINT/DOUBLE): the
        # driver compares via PANDAS, where HUGEINT lands as float64 and
        # stringifies 44 → '44.0' ≠ Spark's '44'. fetchall() masks this
        # (HUGEINT → python int), so check the DECLARED types instead.
        s_int = {
            f.name.lower()
            for f in sdf.schema.fields
            if f.dataType.typeName() in ("byte", "short", "integer", "long")
        }
        o_types = {c.lower(): str(t).upper() for c, t in zip(ocols, orel.types)}
        for c in s_int:
            ot = o_types.get(c)
            if ot and any(x in ot for x in ("HUGEINT", "FLOAT", "DOUBLE", "DECIMAL")):
                problems.append(
                    f"dtype drift on '{c}': spark integral vs oracle {ot} "
                    "— pandas will float-ize it; cast the oracle to BIGINT"
                )
        if sorted(c.lower() for c in scols) != sorted(c.lower() for c in ocols):
            problems.append(f"schema {sorted(scols)} vs {sorted(ocols)}")
        if not problems:
            sh = value_hash([tuple(r) for r in srows], scols)
            oh = value_hash(orows, ocols)
            if sh != oh:
                problems.append("value-hash MISMATCH")
        results[name] = "OK" if not problems else "; ".join(problems)

    width = max(len(k) for k in results)
    n_ok = 0
    for name, status in results.items():
        flag = "✓" if status == "OK" or status.startswith("rows-only") else "✗"
        if flag == "✓":
            n_ok += 1
        print(f"{flag} {name:<{width}} {status}")
    print(f"{n_ok}/{len(results)} clean")
    spark.stop()
    sys.exit(0 if n_ok == len(results) else 1)


if __name__ == "__main__":
    main()
