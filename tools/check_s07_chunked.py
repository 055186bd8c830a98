#!/usr/bin/env python3
"""Chunked s07 (SemDeDup) big-SF verification — the pair-space wall.

The one-shot s07 oracle runs 2-iteration k-means (k = 8) over the
embeddings, then drops every vector that has a >= 0.35-cosine
same-cluster predecessor. The drop test is `vec_id NOT IN (SELECT vb
FROM prs ...)`, and DuckDB must MATERIALIZE prs — the full
intra-cluster pair space — before the anti-join. On the scaled corpus
copies share vector VALUES, so with 8 clusters that space is
~n²/8 pairs (sf10: ~5 B, measured r19: out-of-disk at 60 GB memory +
~54 GB spill), while the Spark side streams the same pairs through the
chunk-salted join and finishes in ~2 min.

Verification decomposes losslessly along the oracle's own seams:

  stage A: the assignment prefix (srcn -> ... -> asg) is
           pair-independent — materialize it ONCE as a real table
           (asg_t), verbatim oracle text.
  stage B: the prs pair stage depends on ONE vector's id per output
           row (vb), so it chunks by b.vec_id with no coverage loss:
           each chunk runs the oracle's own prs text (word-boundary
           rewrites, asserted counts) against asg_t and accumulates
           the distinct dropped ids into drops_t. The union over
           residues IS the one-shot drop set.
  stage C: the final projection (asg minus drops) compared against
           the Spark dump, canon'd like check.py.

Usage: python3 tools/check_s07_chunked.py [sfDir] [outDir] [nchunks]
"""
import json, math, re, sys
import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_sf10_r19"
nchunks = int(sys.argv[3]) if len(sys.argv) > 3 else 20

from receipts import tee_stdout  # noqa: E402
tee_stdout("s07_chunked", sf, out)

con = duckdb.connect()
con.execute("SET preserve_insertion_order=false")
con.execute("SET temp_directory='/tmp/duck_spill'")
con.execute("SET memory_limit='60GB'")
con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{sf}/embeddings.parquet'")

sql = json.loads(open(f"{out}/oracle_sql.json").read())["s07_semdedup"]

# -- carve at asserted anchors (fail LOUDLY on oracle drift) ----------
prs_anchor = "prs AS ("
final_anchor = "SELECT a.vec_id, CAST(a.cluster AS BIGINT) AS cluster"
join_anchor = "FROM asg a JOIN asg b ON a.cluster = b.cluster AND a.vec_id < b.vec_id"
for a in (prs_anchor, final_anchor, join_anchor):
    assert sql.count(a) == 1, f"s07 oracle drifted: {a!r} not found exactly once"
pi, fi = sql.index(prs_anchor), sql.index(final_anchor)

# stage A: assignment prefix, verbatim, materialized once
head = sql[:pi].rstrip().rstrip(",")
con.execute(f"CREATE TABLE asg_t AS {head} SELECT vec_id, cluster FROM asg")
n_asg = con.sql("SELECT count(*) FROM asg_t").fetchone()[0]
n_src = con.sql("SELECT count(*) FROM embeddings").fetchone()[0]
assert n_asg == n_src, f"stage A: {n_asg} assigned != {n_src} vectors"
print(f"OK stage A: assignments materialized ({n_asg} vectors, "
      f"{con.sql('SELECT count(DISTINCT cluster) FROM asg_t').fetchone()[0]} clusters)")

# norms hoisted per VECTOR: the one-shot prs recomputes BOTH self-dots
# per PAIR (sqrt(list_dot_product(e.embedding, e.embedding)) twice), so
# a 5 B-pair chunk sweep does 15 B interpreted 64-dim dots (~14 min per
# 1/20 chunk, measured r19). Materializing the VERBATIM norm expression
# once per vector is bit-identical (same expression, same row, same
# fold) and cuts the pair stage to one dot per pair.
norm_expr = ("sqrt(list_dot_product({0}.embedding::DOUBLE[], "
             "{0}.embedding::DOUBLE[]))")
con.execute(
    "CREATE TABLE emb_n AS SELECT e.*, "
    + norm_expr.format("e") + " AS nrm FROM embeddings e")

# stage B: the oracle's own prs text against asg_t, chunked by b.vec_id
prs_body = sql[pi + len(prs_anchor):sql.index("      SELECT a.vec_id")].rstrip()
assert prs_body.endswith(")"), "s07 oracle drifted: prs block shape changed"
prs_body = prs_body[:-1]
prs_body, n1 = re.subn(r"\bFROM asg a JOIN asg b\b",
                       "FROM asg_t a JOIN asg_t b", prs_body)
assert n1 == 1, f"prs rewrite hit {n1} 'FROM asg a JOIN asg b' sites, expected 1"
prs_body, ne = re.subn(r"\bJOIN embeddings e([ab]) ON\b", r"JOIN emb_n e\1 ON",
                       prs_body)
assert ne == 2, f"emb_n rewrite hit {ne} embeddings-join sites, expected 2"
for side in ("ea", "eb"):
    prs_body, nn = re.subn(re.escape(norm_expr.format(side)), f"{side}.nrm",
                           prs_body)
    assert nn == 1, f"norm hoist hit {nn} {side}-norm sites, expected 1"
con.execute("CREATE TABLE drops_t (vb BIGINT)")
for c in range(nchunks):
    chunk, n2 = re.subn(
        r"\bON a\.cluster = b\.cluster AND a\.vec_id < b\.vec_id\b",
        f"ON a.cluster = b.cluster AND a.vec_id < b.vec_id "
        f"AND b.vec_id % {nchunks} = {c}", prs_body)
    assert n2 == 1, f"chunk rewrite hit {n2} join-condition sites, expected 1"
    con.execute(f"INSERT INTO drops_t SELECT DISTINCT vb FROM ({chunk}) p "
                "WHERE cos_sim >= 0.35")
    print(f"OK stage B chunk {c + 1}/{nchunks} "
          f"(drops so far: {con.sql('SELECT count(*) FROM drops_t').fetchone()[0]})")
n_drop = con.sql("SELECT count(DISTINCT vb) FROM drops_t").fetchone()[0]

# stage C: final projection vs the Spark dump
tail = sql[fi:]
tail, n3 = re.subn(r"\bFROM asg a\b", "FROM asg_t a", tail)
tail, n4 = re.subn(r"\bFROM prs WHERE cos_sim >= 0\.35\b", "FROM drops_t", tail)
assert n3 == 1 and n4 == 1, f"final rewrite hit {n3}/{n4} sites, expected 1/1"


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


got_cols, got = canon(con.sql(f"SELECT * FROM '{out}/s07_semdedup/*.parquet'"))
exp_cols, exp = canon(con.sql(tail))
if got_cols != exp_cols:
    print(f"FAIL stage C columns: {got_cols} != {exp_cols}")
    sys.exit(1)
if got != exp:
    print(f"FAIL stage C: {len(got)} dump rows vs {len(exp)} oracle rows")
    for g, e in [(g, e) for g, e in zip(got, exp) if g != e][:3]:
        print("   spark: ", g, "\n   duckdb:", e)
    sys.exit(1)
print(f"OK s07_semdedup: {len(got)} kept vectors hash-match "
      f"({n_drop} dropped, {nchunks} pair chunks)")
