#!/usr/bin/env python3
"""Staged pipe02 sf10 verification — the oracle-wall fallback.

The one-shot pipe02 oracle replays TWO full LSH chains (the ladder's
near-dedup over s1 plus the cluster stage over s6) in a single DuckDB
query; at sf10 the cumulative MATERIALIZED spill exceeds the disk.
This decomposes the verification into DuckDB passes, each within
budget, with NO loss of coverage:

  stage A:  pipe02's ladder interface == the hash-verified pipe01 dump
            (dropped_at equality per doc, exact set match), pure
            dump-vs-dump SQL;
  stage B0: the per-doc MinHash census (lsh_sh2 -> hashed2 -> mh2) of
            the verified kept set, materialized into a real table in
            doc-id chunks. This is the memory monster: on the
            quality-neutral corpus the kept set is ~374k docs at sf10
            (it scales with SF since r17 — the whole point of the
            tagging fix), so the shingle x 12-hash explosion is ~880M
            intermediate rows; as ONE query it exhausted 100 GB of
            memory plus the host's 78 GB of spill disk (measured r18).
            Chunking is lossless: every census row is a function of
            one doc.
  stage B1: the remaining downstream chain (bands -> candidates ->
            components ladder -> split -> gate -> shard -> pack),
            reading mh2 FROM the materialized table — band-count-sized
            frames, light — compared against pipe02's downstream
            columns.

All oracle SQL is extracted from the registry's own pipe02 oracle with
word-boundary rewrites and ASSERTED counts: stage B must fail LOUDLY
on oracle drift, not verify a corrupted query (ADVICE r16).

Usage: python3 tools/check_pipe02_staged.py [sfDir] [outDir] [nchunks]
"""
import json, math, re, sys
import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_sf10"
nchunks = int(sys.argv[3]) if len(sys.argv) > 3 else 8

from receipts import tee_stdout  # noqa: E402
tee_stdout("pipe02_staged", sf, out)

con = duckdb.connect()
con.execute("SET preserve_insertion_order=false")
con.execute("SET temp_directory='/tmp/duck_spill'")
con.execute("SET memory_limit='60GB'")
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

# -- the verified kept set, normalized like the oracle's corp --------
con.execute("""
  CREATE TABLE s6v_t AS
    SELECT d.doc_id,
      trim(regexp_replace(regexp_replace(nfc_normalize(d.text),
        '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f-\\x9f\\x{200b}-\\x{200f}\\x{2060}\\x{feff}]', '', 'g'),
        '[\\t\\n\\r \\p{Zs}]+', ' ', 'g'), ' ') AS text
    FROM documents d JOIN p1 ON p1.doc_id = d.doc_id
    WHERE p1.dropped_at = 'kept'""")
kept_n = con.sql("SELECT count(*) FROM s6v_t").fetchone()[0]
print(f"kept set: {kept_n} docs")

# -- carve the oracle's own SQL at asserted anchors ------------------
osql = json.loads(open(f"{out}/oracle_sql.json").read())["pipe02_manifest"]
assert osql.count("ksrc AS MATERIALIZED") == 1, \
    "oracle drift: expected exactly one 'ksrc AS MATERIALIZED' anchor"
tail = osql[osql.index("ksrc AS MATERIALIZED"):]
assert len(re.findall(r"\bFROM s6\b", tail)) == 2, \
    "oracle drift: expected exactly 2 'FROM s6' reads in the tail"
assert tail.count("lsh_sh2 AS (") == 1 and tail.count("bands2 AS (") == 1, \
    "oracle drift: lsh_sh2/bands2 anchors not found exactly once"

# census block = lsh_sh2 -> hashed2 -> mh2 (per-doc, chunkable)
ci, cj = tail.index("lsh_sh2 AS ("), tail.index("bands2 AS (")
census = tail[ci:cj].rstrip().rstrip(",")
assert len(re.findall(r"\bFROM s6\b", census)) == 1, \
    "oracle drift: the census block must read s6 exactly once"

# -- stage B0: materialize the census in doc-id chunks ---------------
# the hash count is the oracle's own `range(<n>)` in the mh2 CTE, not a
# hard-coded mirror of TextDedup.NumHashes (ADVICE r18)
hash_ns = set(re.findall(r"\brange\((\d+)\)", census))
assert len(hash_ns) == 1, \
    f"oracle drift: expected one range(<n>) in the census block, got {hash_ns}"
num_hashes = int(hash_ns.pop())
con.execute("CREATE TABLE mh2_t (doc_id BIGINT, i BIGINT, mv BIGINT)")
for c in range(nchunks):
    # word-boundary rewrite with an asserted substitution count, like
    # stage A: an unanchored replace would silently rewrite a future
    # 'FROM s6v'-style reference that the \b-anchored guard above
    # never counted (ADVICE r18)
    chunk, n_sub = re.subn(
        r"\bFROM s6\b",
        f"FROM (SELECT * FROM s6v_t WHERE doc_id % {nchunks} = {c})", census)
    assert n_sub == 1, f"oracle drift: census rewrite hit {n_sub} sites, expected 1"
    con.execute(f"INSERT INTO mh2_t WITH {chunk} SELECT doc_id, i, mv FROM mh2")
    print(f"OK stage B0 chunk {c + 1}/{nchunks}")
rows = con.sql("SELECT count(*) FROM mh2_t").fetchone()[0]
docs_cov = con.sql("SELECT count(DISTINCT doc_id) FROM mh2_t").fetchone()[0]
assert rows == kept_n * num_hashes, (
    f"census incomplete: {rows} rows != {kept_n} kept x {num_hashes} hashes "
    f"({docs_cov}/{kept_n} docs covered — a zero-shingle kept doc or a dropped chunk)")

# -- stage B1: downstream chain off the materialized census ----------
# splice: ksrc reads s6v_t; the census CTEs collapse to a read of
# mh2_t; everything from bands2 on is the oracle's own text.
head = tail[:ci].replace("FROM s6)", "FROM s6v_t)")
assert "FROM s6v_t)" in head, "oracle drift: ksrc's FROM s6 not rewritten"
assert tail.count("SELECT c.doc_id,") == 1, \
    "oracle drift: expected exactly one final 'SELECT c.doc_id,' projection"
j = tail.index("SELECT c.doc_id,")
stage_b = ("WITH " + head +
           "mh2 AS (SELECT doc_id, i, mv FROM mh2_t),\n      " +
           tail[cj:j] + """
  SELECT k.doc_id,
    sp.cluster_id AS cluster_id, sp.split AS split,
    CASE WHEN sp.split = 'train' THEN g.sel ELSE true END AS selected,
    sp.tok AS tok, sh2.shard AS shard, sh2.pos AS pos, pk.bin_id AS bin_id
  FROM s6v_t k
  LEFT JOIN splitd sp ON sp.doc_id = k.doc_id
  LEFT JOIN gate g ON g.doc_id = k.doc_id
  LEFT JOIN shd sh2 ON sh2.doc_id = k.doc_id
  LEFT JOIN pack2 pk ON pk.doc_id = k.doc_id""")


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
n_clusters = con.sql(
    "SELECT count(DISTINCT cluster_id) FROM p2 WHERE dropped_at = 'kept' "
    "AND cluster_id IS NOT NULL").fetchone()[0]
print(f"OK stage B: downstream chain matches over {len(got)} kept docs "
      f"({n_clusters} distinct clusters)")
