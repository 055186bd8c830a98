#!/usr/bin/env python3
"""Staged t22 sf10 verification — the WITH RECURSIVE oracle wall.

t22_leakage_split's oracle wraps the whole MinHash census inside a
WITH RECURSIVE block (for the `reach` transitive closure), and DuckDB
1.0 disables AS MATERIALIZED inside recursive WITH blocks (CLAUDE.md
r16): the census CTE `mh` is re-inlined once per reference (3x) and
the recursion re-derives its inputs per round. At sf10 that is
multiple concurrent ~hundred-M-row shingle-census builds: the one-shot
died out-of-disk at the 60 GB cap with ~70 GB of spill (measured r20
heavy batch, receipt_check_sf10_r20_run20260816T210332).

Staged decomposition along the oracle's own seams, zero coverage loss:

  stage A: materialize the `lshpairs` CTE body into pairs_t. The body
           is textually identical to d03_minhash_lsh's whole oracle
           (asserted below) plus the est_sim >= 0.5 filter; d03
           hash-matched at sf10 in r18, so this exact census is known
           feasible as a standalone non-recursive statement. One
           semantics-free tweak: `mh AS MATERIALIZED`, which DuckDB
           honors again outside the recursive block (one census build
           instead of three inlined copies — the d02 sh60 precedent).
  stage B: the remaining oracle text verbatim (und / reach / comps /
           final split projection) with `FROM lshpairs` rewritten to
           read pairs_t — the recursion now iterates over the pair
           set (thousands of rows), not the census.

All SQL is carved from the registry's own oracle_sql.json with
asserted anchors and word-boundary rewrites with asserted
substitution counts (the check_pipe02_staged.py discipline): oracle
drift fails LOUDLY instead of verifying a corrupted query.

Usage: python3 tools/check_t22_staged.py [sfDir] [outDir]
"""
import json, math, os, re, sys
import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/v10"

from receipts import tee_stdout  # noqa: E402
tee_stdout("t22_staged", sf, out)

con = duckdb.connect()
con.execute("SET preserve_insertion_order=false")
con.execute("SET temp_directory='/tmp/duck_spill'")
con.execute(
    f"SET memory_limit='{os.environ.get('DUCKDB_MEMORY_LIMIT', '60GB')}'")
con.execute(
    f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")

osql = json.loads(open(f"{out}/oracle_sql.json").read())["t22_leakage_split"]

# -- carve at asserted anchors --------------------------------------
assert osql.lstrip().startswith("WITH RECURSIVE lshpairs AS ("), \
    "oracle drift: expected the lshpairs CTE to open the recursive block"
body_anchor = "SELECT doc_a, doc_b FROM ("
filt_anchor = "WHERE est_sim >= 0.5)"
und_anchor = "und AS ("
for a in (body_anchor, filt_anchor, und_anchor):
    assert osql.count(a) == 1, f"oracle drift: anchor {a!r} not found exactly once"

body = osql[osql.index(body_anchor):
            osql.index(filt_anchor) + len(filt_anchor) - 1]  # drop CTE's ')'

# the pair stage must still be d03's verified census (the feasibility
# argument above rests on it) — pin the shared text
d03 = json.loads(open(f"{out}/oracle_sql.json").read()).get("d03_minhash_lsh")
if d03 is not None:
    assert re.sub(r"\s+", " ", d03).strip() in re.sub(r"\s+", " ", body), \
        "oracle drift: lshpairs body no longer embeds d03's oracle text"
    print("OK carve: lshpairs body embeds d03_minhash_lsh's oracle verbatim")
else:
    print("note: d03_minhash_lsh not in this oracle_sql.json — text pin skipped")

body, n_mat = re.subn(r"\bmh AS \(", "mh AS MATERIALIZED (", body)
assert n_mat == 1, f"oracle drift: mh rewrite hit {n_mat} sites, expected 1"

# -- stage A: the pair census, non-recursive ------------------------
con.execute("CREATE TABLE pairs_t AS " + body)
n_pairs = con.sql("SELECT count(*) FROM pairs_t").fetchone()[0]
print(f"OK stage A: pairs_t materialized ({n_pairs} pairs at est_sim >= 0.5)")

# -- stage B: closure + split off the materialized pair set ---------
tail = "WITH RECURSIVE " + osql[osql.index(und_anchor):]
tail, n_sub = re.subn(r"\bFROM lshpairs\b", "FROM pairs_t", tail)
assert n_sub == 2, f"oracle drift: lshpairs rewrite hit {n_sub} sites, expected 2"


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
    f"SELECT * FROM '{out}/t22_leakage_split/*.parquet'"))
exp_cols, exp = canon(con.sql(tail))
if got_cols != exp_cols:
    print(f"FAIL stage B columns: {got_cols} != {exp_cols}")
    sys.exit(1)
if got != exp:
    print(f"FAIL stage B: {len(got)} vs {len(exp)} rows")
    for g, e in [(g, e) for g, e in zip(got, exp) if g != e][:3]:
        print("   spark: ", g, "\n   duckdb:", e)
    sys.exit(1)
n_cl = con.sql(
    "SELECT count(DISTINCT a) FROM (SELECT doc_a AS a FROM pairs_t "
    "UNION SELECT doc_b FROM pairs_t)").fetchone()[0]
print(f"OK stage B: split assignment matches over {len(got)} docs "
      f"({n_pairs} pairs touching {n_cl} docs)")
