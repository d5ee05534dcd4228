"""Per-row Spark-vs-DuckDB diff for nlp_sentence_scores."""
import sys

sys.path.insert(0, "/root/repo")

import duckdb

import __spark_entry__ as E
from newspaper_spark.plans.session import get_spark

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

spark = get_spark(cores=8)
sdf = (
    E.queries()["nlp_sentence_scores"](spark, SF)
    .toPandas()
    .set_index(["doc_id", "sent_idx"])
    .sort_index()
)
con = duckdb.connect()
con.execute(
    f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
)
odf = (
    con.execute(E.oracle_sql()["nlp_sentence_scores"])
    .fetchdf()
    .set_index(["doc_id", "sent_idx"])
    .sort_index()
)
print("spark rows:", len(sdf), "oracle rows:", len(odf))
sk, ok_ = set(sdf.index), set(odf.index)
only_s, only_o = sk - ok_, ok_ - sk
print("only in spark:", list(only_s)[:5], "only in oracle:", list(only_o)[:5])
both = sorted(sk & ok_)
bad = 0
for key in both:
    s, o = sdf.loc[key], odf.loc[key]
    diffs = {}
    for c in sdf.columns:
        sv, ov = s[c], o[c]
        if sv != ov:
            diffs[c] = (sv, ov)
    if diffs:
        bad += 1
        if bad <= 8:
            print(key, diffs)
print("divergent rows:", bad, "/", len(both))
spark.stop()
