#!/usr/bin/env python3
"""Staged d12 sf10 verification — the CTE-materializer spill wall.

d12_canonical_keep's oracle materializes its `pairs` CTE (the full
MinHash census -> LSH candidates -> est_sim pipeline) with AS
MATERIALIZED so the 11-round label-propagation ladder can re-read it
without per-reference re-inlining. At sf10 DuckDB 1.0's CTE
materializer pushes the census's ~250M-row DISTINCT through temp
storage no matter the memory_limit (measured r20: 66 GB of spill with
RSS at 14 GB under DUCKDB_MEMORY_LIMIT=90GB, out-of-disk) — while the
TEXTUALLY IDENTICAL census runs fine as a plain streaming query:
d03_minhash_lsh's one-shot oracle, the same text, hash-matched at
sf10 under the 60 GB cap in r18.

Staged decomposition along the oracle's own seams, zero coverage loss:

  stage A: CREATE TABLE pairs_t AS <the `pairs` CTE body> — the
           d03-shaped streaming plan, with the one semantics-free
           `mh AS MATERIALIZED` tweak (6M rows; one census build
           instead of three inlined copies, the d02 sh60 precedent).
  stage B: the remaining oracle text verbatim (the und/lab_lp0..10
           MATERIALIZED ladder, convergence guard, quality ranking,
           canonical-keep projection) with `FROM pairs` rewritten to
           read pairs_t — every ladder frame is pair-set-sized
           (thousands of rows), not census-sized.

All SQL is carved from the registry's own oracle_sql.json with
asserted anchors and word-boundary rewrites with asserted
substitution counts (the check_pipe02_staged.py discipline): oracle
drift fails LOUDLY instead of verifying a corrupted query.

Usage: python3 tools/check_d12_staged.py [sfDir] [outDir]
"""
import json, math, os, re, sys
import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/v10"

from receipts import tee_stdout  # noqa: E402
tee_stdout("d12_staged", sf, out)

con = duckdb.connect()
con.execute("SET preserve_insertion_order=false")
con.execute("SET temp_directory='/tmp/duck_spill'")
con.execute(
    f"SET memory_limit='{os.environ.get('DUCKDB_MEMORY_LIMIT', '60GB')}'")
con.execute(
    f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")

oracles = json.loads(open(f"{out}/oracle_sql.json").read())
osql = oracles["d12_canonical_keep"]

# -- carve at asserted anchors --------------------------------------
assert osql.lstrip().startswith("WITH pairs AS MATERIALIZED ("), \
    "oracle drift: expected the materialized pairs CTE to open the block"
body_anchor = "SELECT doc_a, doc_b FROM ("
filt_anchor = "WHERE est_sim >= 0.5)"
und_anchor = "und AS MATERIALIZED ("
for a in (body_anchor, filt_anchor, und_anchor):
    assert osql.count(a) == 1, f"oracle drift: anchor {a!r} not found exactly once"

body = osql[osql.index(body_anchor):
            osql.index(filt_anchor) + len(filt_anchor) - 1]  # drop CTE's ')'

# the pair stage must still be d03's verified census (the feasibility
# argument above rests on it) — pin the shared text when available
d03 = oracles.get("d03_minhash_lsh")
if d03 is not None:
    assert re.sub(r"\s+", " ", d03).strip() in re.sub(r"\s+", " ", body), \
        "oracle drift: pairs body no longer embeds d03's oracle text"
    print("OK carve: pairs body embeds d03_minhash_lsh's oracle verbatim")
else:
    print("note: d03_minhash_lsh not in this oracle_sql.json — text pin skipped")

body, n_mat = re.subn(r"\bmh AS \(", "mh AS MATERIALIZED (", body)
assert n_mat == 1, f"oracle drift: mh rewrite hit {n_mat} sites, expected 1"

# -- stage A: the pair census as a plain streaming statement --------
con.execute("CREATE TABLE pairs_t AS " + body)
n_pairs = con.sql("SELECT count(*) FROM pairs_t").fetchone()[0]
print(f"OK stage A: pairs_t materialized ({n_pairs} pairs at est_sim >= 0.5)")

# -- stage B: ladder + canonical keep off the materialized pairs ----
tail = "WITH " + osql[osql.index(und_anchor):]
tail, n_sub = re.subn(r"\bFROM pairs\b", "FROM pairs_t", tail)
assert n_sub == 2, f"oracle drift: pairs rewrite hit {n_sub} sites, expected 2"


def canon(rel):
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


got_cols, got = canon(con.sql(
    f"SELECT * FROM '{out}/d12_canonical_keep/*.parquet'"))
exp_cols, exp = canon(con.sql(tail))
if got_cols != exp_cols:
    print(f"FAIL stage B columns: {got_cols} != {exp_cols}")
    sys.exit(1)
if got != exp:
    print(f"FAIL stage B: {len(got)} vs {len(exp)} rows")
    for g, e in [(g, e) for g, e in zip(got, exp) if g != e][:3]:
        print("   spark: ", g, "\n   duckdb:", e)
    sys.exit(1)
print(f"OK stage B: canonical-keep set matches over {len(got)} clusters "
      f"({n_pairs} pairs)")
