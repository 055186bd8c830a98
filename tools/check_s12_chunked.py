#!/usr/bin/env python3
"""Chunked s12 (BM25 top-k) sf10 verification — the pair-space wall.

The one-shot s12 oracle materializes the full query x doc contribution
space before aggregating. On the quality-neutral corpus stopwords are
SHARED across copies (that is the point of the r17 tagging fix), so at
sf10 df('the') ~ 500k and every one of the 5,155 queries pairs with
essentially every doc through it: ~2.6B contrib rows. DuckDB 1.0 needs
~130 GB for that join (measured: OOM-killed at the default limit,
out-of-disk at memory_limit=60GB with a 73 GB spill), while the Spark
side streams it through term-partitioned partial aggregation + a
bottom-k heap and finishes in minutes.

The query dimension is embarrassingly parallel and the score of one
query never reads another query's rows, so verification chunks the
SAME oracle SQL by query id — `(doc_id // 97) % nchunks = i` appended
to the qt CTE — and compares each chunk against the same slice of the
Spark dump. No loss of coverage: the union of chunk slices is exactly
the one-shot result set, and each chunk recomputes the full corpus
censuses (tf/dl/df/stats) independently.

Usage: python3 tools/check_s12_chunked.py [sfDir] [outDir] [nchunks]
"""
import json, math, sys
from pathlib import Path

import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10"
out = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_sf10")
nchunks = int(sys.argv[3]) if len(sys.argv) > 3 else 10

from receipts import tee_stdout  # noqa: E402
tee_stdout("s12_chunked", sf, out)

sql = json.loads((out / "oracle_sql.json").read_text())["s12_bm25_topk"]
# anchor on the qt CTE's filter — fail LOUDLY if the oracle drifts
# rather than verifying a corrupted rewrite (the check_pipe02_staged
# asserted-count discipline)
anchor = "WHERE doc_id % 97 = 0"
assert sql.count(anchor) == 1, f"s12 oracle drifted: {anchor!r} not found once"

con = duckdb.connect()
con.execute("SET preserve_insertion_order=false")
con.execute("SET temp_directory='/tmp/duck_spill'")
con.execute("SET memory_limit='60GB'")
con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
con.execute(
    f"CREATE VIEW spark_dump AS SELECT * FROM '{out}/s12_bm25_topk/*.parquet'")


def canon(rel):
    """check.py's canonicalization: through pandas, floats to 9 dp,
    values compared as strings, columns and rows sorted."""
    df = rel.df()
    cols = list(df.columns)
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = []
    for r in df.values.tolist():
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = "NaN" if math.isnan(v) else str(round(v, 9))
            elif v is None:
                v = "None"
            else:
                v = str(v)
            vals.append(v)
        rows.append(tuple(vals))
    return sorted(cols), sorted(rows)


total = 0
for i in range(nchunks):
    chunk_sql = sql.replace(
        anchor, f"{anchor} AND (doc_id // 97) % {nchunks} = {i}")
    got_cols, got = canon(con.sql(
        f"SELECT * FROM spark_dump WHERE (query_id // 97) % {nchunks} = {i}"))
    exp_cols, exp = canon(con.sql(chunk_sql))
    if got_cols != exp_cols:
        print(f"FAIL chunk {i}: columns {got_cols} != {exp_cols}")
        sys.exit(1)
    if got != exp:
        print(f"FAIL chunk {i}: {len(got)} dump rows vs {len(exp)} oracle rows")
        for g, e in [(g, e) for g, e in zip(got, exp) if g != e][:3]:
            print(f"   spark:  {g}\n   duckdb: {e}")
        sys.exit(1)
    total += len(got)
    print(f"OK chunk {i + 1}/{nchunks} ({len(got)} rows)")

dump_n = con.sql("SELECT count(*) FROM spark_dump").fetchone()[0]
assert total == dump_n, f"chunks covered {total} rows, dump has {dump_n}"
print(f"\nOK s12_bm25_topk: {total} rows hash-match across {nchunks} chunks "
      "(union == full dump)")
