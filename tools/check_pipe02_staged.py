#!/usr/bin/env python3
"""Staged pipe02 sf10 verification — the oracle-wall fallback.

The one-shot pipe02 oracle replays TWO full LSH chains (the ladder's
near-dedup over s1 plus the cluster stage over s6) in a single DuckDB
query; at sf10 the cumulative MATERIALIZED spill exceeds the disk.
This decomposes the verification into two DuckDB passes, each within
budget, with NO loss of coverage:

  stage A: pipe02's ladder interface == the hash-verified pipe01 dump
           (dropped_at equality per doc, exact set match), pure
           dump-vs-dump SQL;
  stage B: the downstream chain (kept census -> LSH clusters -> split
           -> gate -> shard -> pack) recomputed in DuckDB FROM the
           verified kept set, compared against pipe02's downstream
           columns. One LSH chain instead of two.
"""
import json, math, re, sys
import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_sf10"

con = duckdb.connect()
con.execute("SET preserve_insertion_order=false")
con.execute("SET temp_directory='/tmp/duck_spill'")
con.execute("SET memory_limit='100GB'")
con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
con.execute(f"CREATE VIEW p1 AS SELECT * FROM '{out}/pipe01_hygiene_ladder/*.parquet'")
con.execute(f"CREATE VIEW p2 AS SELECT * FROM '{out}/pipe02_manifest/*.parquet'")

# -- stage A: ladder interface --------------------------------------
bad = con.sql("""
  SELECT count(*) FROM p1 FULL JOIN p2 USING (doc_id)
  WHERE p1.dropped_at IS DISTINCT FROM p2.dropped_at""").fetchone()[0]
if bad:
    print(f"FAIL stage A: {bad} docs disagree with the verified pipe01 ladder")
    sys.exit(1)
print("OK stage A: pipe02.dropped_at == verified pipe01 dump, all docs")

# -- stage B: downstream chain from the verified kept set -----------
# constants mirror PipelineQueries: NumHashes=60 P=2147483647 BandRows=?
# read them from the oracle SQL itself to avoid drift
osql = json.loads(open(f"{out}/oracle_sql.json").read())["pipe02_manifest"]
# extract everything from 'ksrc AS MATERIALIZED' onwards, swapping the
# s6 source for the verified kept set. Word-boundary rewrites with
# asserted counts: an unanchored replace("FROM s6", ...) would slice a
# future 's6x' CTE or silently rewrite nothing if the oracle drifts —
# stage B must fail LOUDLY on drift, not verify a corrupted query
# (ADVICE r16).
assert osql.count("ksrc AS MATERIALIZED") == 1, \
    "oracle drift: expected exactly one 'ksrc AS MATERIALIZED' anchor"
i = osql.index("ksrc AS MATERIALIZED")
tail = osql[i:]
# exactly two reads of s6 in the tail: ksrc's token census and the
# cluster chain's shingle scan (lshCandSql("s6","2"))
tail, n_sub = re.subn(r"\bFROM s6\b", "FROM s6v", tail)
assert n_sub == 2, f"oracle drift: expected exactly 2 'FROM s6' in the tail, rewrote {n_sub}"
prefix = """WITH s6v AS MATERIALIZED (
    SELECT d.doc_id,
      trim(regexp_replace(regexp_replace(nfc_normalize(d.text),
        '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f-\\x9f\\x{200b}-\\x{200f}\\x{2060}\\x{feff}]', '', 'g'),
        '[\\t\\n\\r \\p{Zs}]+', ' ', 'g'), ' ') AS text
    FROM documents d JOIN p1 ON p1.doc_id = d.doc_id
    WHERE p1.dropped_at = 'kept'),
  """
# the final SELECT in `tail` joins the disposition CTE chain (corp,
# s1..s6) which we did not build -- replace it with a downstream-only
# projection over the verified kept set
assert tail.count("SELECT c.doc_id,") == 1, \
    "oracle drift: expected exactly one final 'SELECT c.doc_id,' projection"
j = tail.index("SELECT c.doc_id,")
stage_b = prefix + tail[:j] + """
  SELECT k.doc_id,
    sp.cluster_id AS cluster_id, sp.split AS split,
    CASE WHEN sp.split = 'train' THEN g.sel ELSE true END AS selected,
    sp.tok AS tok, sh2.shard AS shard, sh2.pos AS pos, pk.bin_id AS bin_id
  FROM s6v k
  LEFT JOIN splitd sp ON sp.doc_id = k.doc_id
  LEFT JOIN gate g ON g.doc_id = k.doc_id
  LEFT JOIN shd sh2 ON sh2.doc_id = k.doc_id
  LEFT JOIN pack2 pk ON pk.doc_id = k.doc_id"""


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
    "SELECT doc_id, cluster_id, split, selected, tok, shard, pos, bin_id "
    "FROM p2 WHERE dropped_at = 'kept'"))
exp_cols, exp = canon(con.sql(stage_b))
if got_cols != exp_cols:
    print(f"FAIL stage B columns: {got_cols} != {exp_cols}")
    sys.exit(1)
if got != exp:
    print(f"FAIL stage B: {len(got)} vs {len(exp)} rows")
    for g, e in [(g, e) for g, e in zip(got, exp) if g != e][:3]:
        print("   spark: ", g, "\n   duckdb:", e)
    sys.exit(1)
print(f"OK stage B: downstream chain matches over {len(got)} kept docs")
