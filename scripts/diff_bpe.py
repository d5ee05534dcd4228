"""Per-row Spark-vs-DuckDB diff for bpe_tokens on the driver's parquet.

Finds the exact doc_ids where Java-regex and RE2 disagree, then prints
the offending characters so the cross-engine pattern can be fixed.
"""
import sys

sys.path.insert(0, "/root/repo")

import duckdb

import __spark_entry__ as E
from newspaper_spark.plans.session import get_spark

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

spark = get_spark()
sdf = E.queries()["bpe_tokens"](spark, SF).toPandas().set_index("doc_id").sort_index()

con = duckdb.connect()
con.execute(
    f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
)
odf = (
    con.execute(E.oracle_sql()["bpe_tokens"])
    .fetchdf()
    .set_index("doc_id")
    .sort_index()
)

bad = []
for did in sdf.index:
    s = sdf.loc[did]
    o = odf.loc[did]
    if int(s.n_ws_tokens) != int(o.n_ws_tokens) or int(s.n_bpe_tokens) != int(
        o.n_bpe_tokens
    ):
        bad.append(
            (did, int(s.n_ws_tokens), int(o.n_ws_tokens), int(s.n_bpe_tokens), int(o.n_bpe_tokens))
        )

print(f"divergent rows: {len(bad)} / {len(sdf)}")
for row in bad[:20]:
    print(row)

if bad:
    ids = [r[0] for r in bad[:5]]
    texts = (
        con.execute(
            "SELECT doc_id, text FROM documents WHERE doc_id IN ("
            + ",".join("?" * len(ids))
            + ")",
            ids,
        ).fetchall()
    )
    import unicodedata

    for did, text in texts:
        odd = sorted(
            {
                c
                for c in text
                if (c.isspace() or unicodedata.category(c).startswith("Z") or ord(c) < 32 or ord(c) in (0x85, 0xA0))
                and c not in " \t\n\r\f"
            }
        )
        print(did, "odd-ws chars:", [hex(ord(c)) for c in odd])
spark.stop()
