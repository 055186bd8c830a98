package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.TextFunctions._
import graft.functions.VectorFunctions._

/** Deduplication suite over `documents` / `embeddings` — the standard
  * ladder for training-data pipelines:
  *
  *  - d01 exact: hash-groupBy on content. One shuffle on the hash.
  *  - d02 n-gram Jaccard: exact set-similarity, computed as
  *    verification over d03's LSH candidate pairs (candidate → exact
  *    |A∩B|/|A∪B|). Linear in candidates — the candidate-then-verify
  *    shape every production dedup pipeline uses.
  *  - d03 MinHash+LSH: signature → bands → bucket join. Near-linear;
  *    this is the 100 TB path. Hashes derive from md5 so the DuckDB
  *    oracle replays them bit-for-bit.
  *  - d05 embedding near-dup: cosine over same-cluster (label) pairs.
  *
  *  - d04 SimHash: constant-size 60-bit signature + banded Hamming
  *    search, built on the native `SimHash60` Catalyst expression.
  */
object DedupQueries {

  private val N = 5 // shingle width (word n-grams)

  // MinHash/LSH parameters live in graft.operators.TextDedup (shared
  // with the user-facing dedup API); aliases keep the oracle SQL in
  // lockstep with the Spark-side constants.
  private val NumHashes = graft.operators.TextDedup.NumHashes
  private val BandRows = graft.operators.TextDedup.BandRows
  private val P = graft.operators.TextDedup.P

  /** Word n-gram shingles of `text` as an array column (delegates to
    * the shared operator so query and API can't drift).
    */
  def shingles(text: Column, n: Int = N): Column =
    graft.operators.TextDedup.shingles(text, n)

  /** DuckDB rendering of the same shingling. */
  def shinglesSql(n: Int = N): String =
    s"""CASE WHEN len(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')) < $n
        THEN [array_to_string(list_filter(string_split_regex(text, '\\s+'), t -> t <> ''), ' ')]
        ELSE list_transform(
          range(1, len(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')) - ${n - 1} + 1),
          i -> array_to_string(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')[i:i+${n - 1}], ' '))
        END"""

  /** A10 generalized (dropDuplicates → content-hash dedup): exact
    * duplicate groups by full text. md5 on both sides.
    */
  val d01ExactDedup = Q(
    "d01_exact_dedup",
    (s, dir) => {
      import s.implicits._
      // group by the 16-byte content hash, not the document body — at
      // corpus scale the shuffle carries hashes, not documents
      Tables.documents(s, dir)
        .groupBy(md5($"text").as("text_hash"))
        .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
    },
    Some("""SELECT md5(text) AS text_hash, min(doc_id) AS keep_id,
        count(*) AS n_copies
      FROM documents GROUP BY md5(text)"""),
    headline = true)

  /** Shared oracle CTE chain replaying `TextDedup.minhashCandidates`
    * bit-for-bit in DuckDB: shingle → 32-bit md5-prefix hash → k
    * minhash permutations → band keys → candidate pairs (`cand`).
    * Used by d02 (verification input) and d03 (estimate output) so the
    * two oracles can never drift from each other.
    */
  private[queries] def lshCandSql(src: String = "documents", sfx: String = ""): String = {
    val hashExpr = "CAST(('0x' || substr(md5(sh), 1, 8)) AS BIGINT)"
    s"""lsh_sh$sfx AS (
        SELECT DISTINCT doc_id, sh FROM (
          SELECT doc_id, unnest(${shinglesSql()}) AS sh FROM $src)),
      hashed$sfx AS (SELECT doc_id, $hashExpr AS h FROM lsh_sh$sfx),
      mh$sfx AS (
        SELECT doc_id, i, min(((2*i + 1) * h + (7 + 11*i)) % $P) AS mv
        FROM hashed$sfx, (SELECT unnest(range($NumHashes)) AS i)
        GROUP BY doc_id, i),
      bands$sfx AS (
        SELECT doc_id, i // $BandRows AS band_id,
          string_agg(mv::VARCHAR, '_' ORDER BY i) AS bkey
        FROM mh$sfx GROUP BY doc_id, i // $BandRows),
      cand$sfx AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands$sfx a JOIN bands$sfx b
          ON a.band_id = b.band_id AND a.bkey = b.bkey AND a.doc_id < b.doc_id)"""
  }

  /** Exact n-gram Jaccard verification over d03's LSH candidate pairs:
    * candidates from the salted band join, then exact |A∩B|/|A∪B| per
    * candidate from each doc's 60-bit shingle-hash set
    * (`array_intersect` on `collect_set`s — codegen'd, O(|A|+|B|) per
    * pair). Linear in candidates, never all-pairs: this is the
    * candidate-then-verify shape a production dedup pipeline runs at
    * 100 TB. The doc-set joins are plain equi-joins on doc id — no
    * O(corpus) broadcast; Catalyst picks broadcast only when the side
    * actually fits. (Earlier rounds computed Jaccard via a shingle
    * inverted-index self-join; that plan had a hot-shingle quadratic
    * fanout and an O(docs) broadcast — replaced, same semantics over
    * the candidate set, and CandVerifySpec asserts the verified output
    * equals the all-pairs exact output on the test corpus.)
    *
    * Threshold robustness: the 0.5 Jaccard gate is oracle-green at
    * both verified SFs — 25 pairs at sf0.01, 256 at sf0.1 (r6
    * `VerifyOne` + `check.py --skip-verify` runs).
    */
  val d02NgramJaccard = Q(
    "d02_ngram_jaccard",
    (s, dir) => {
      import s.implicits._
      val docs = Tables.documents(s, dir)
      val cand = graft.operators.TextDedup
        .minhashCandidates(docs, "doc_id", "text")
        .select($"doc_a", $"doc_b")
      // per-doc shingle-hash set, one linear pass + one shuffle on
      // doc_id; checkpointed because BOTH verification joins consume it
      // (the doc_a and doc_b branches) — without materialization the
      // explode+distinct+collect_set subtree runs once per branch
      val sets = docs
        .select($"doc_id", explode(shingles($"text")).as("sh"))
        .select($"doc_id", graft.functions.exprs.token_hash60($"sh").as("h"))
        .distinct()
        .groupBy($"doc_id")
        .agg(collect_set($"h").as("hs"))
        .localCheckpoint(true)
      cand
        .join(sets.select($"doc_id".as("doc_a"), $"hs".as("hs_a")), "doc_a")
        .join(sets.select($"doc_id".as("doc_b"), $"hs".as("hs_b")), "doc_b")
        .select($"doc_a", $"doc_b",
          size(array_intersect($"hs_a", $"hs_b")).as("inter"),
          (size($"hs_a") + size($"hs_b")).as("szsum"))
        .select($"doc_a", $"doc_b",
          round($"inter" / ($"szsum" - $"inter"), 4).as("jaccard"))
        .filter($"jaccard" >= 0.5)
    },
    Some(s"""WITH ${lshCandSql()},
      sh60 AS MATERIALIZED (
        SELECT DISTINCT doc_id,
          CAST(('0x' || substr(md5(sh), 1, 15)) AS BIGINT) AS h
        FROM (SELECT doc_id, unnest(${shinglesSql()}) AS sh FROM documents)),
      sizes AS (SELECT doc_id, count(*) AS sz FROM sh60 GROUP BY doc_id),
      inter AS (
        SELECT c.doc_a, c.doc_b, count(*) AS inter
        FROM cand c
        JOIN sh60 a ON a.doc_id = c.doc_a
        JOIN sh60 b ON b.doc_id = c.doc_b AND b.h = a.h
        GROUP BY 1, 2)
      -- sh60 is AS MATERIALIZED above: referenced 3x (both inter
      -- branches + sizes), and DuckDB 1.0 inlines a plain CTE once PER
      -- REFERENCE — at sf10 that is three concurrent ~250M-row DISTINCT
      -- builds, ~70 GB of spill, out-of-disk (measured r20)
      SELECT i.doc_a, i.doc_b,
        round(i.inter / (sa.sz + sb.sz - i.inter), 4) AS jaccard
      FROM inter i
      JOIN sizes sa ON sa.doc_id = i.doc_a
      JOIN sizes sb ON sb.doc_id = i.doc_b
      WHERE round(i.inter / (sa.sz + sb.sz - i.inter), 4) >= 0.5"""),
    headline = true)

  /** MinHash + LSH candidate pairs with signature-estimated similarity.
    * Linear in corpus size: per-doc signature (one agg), band keys, and
    * a bucket self-join that only materializes colliding pairs.
    * Delegates to the reusable operator in graft.operators.TextDedup.
    */
  val d03MinhashLsh = Q(
    "d03_minhash_lsh",
    (s, dir) =>
      graft.operators.TextDedup.minhashCandidates(
        Tables.documents(s, dir), "doc_id", "text"),
    Some(s"""WITH ${lshCandSql()}
      SELECT c.doc_a, c.doc_b,
        round(sum(CASE WHEN ma.mv = mb.mv THEN 1 ELSE 0 END) / $NumHashes.0, 4) AS est_sim
      FROM cand c
      JOIN mh ma ON ma.doc_id = c.doc_a
      JOIN mh mb ON mb.doc_id = c.doc_b AND ma.i = mb.i
      GROUP BY c.doc_a, c.doc_b"""),
    headline = true)

  /** SimHash near-dup: 60-bit SimHash (native codegen'd Catalyst
    * expression over md5-derived token hashes), banded 4×15 bits for
    * candidate generation, Hamming-distance verification via
    * bit_count(xor). One linear pass for signatures + a bucket
    * self-join — the constant-size-signature alternative to d03 at
    * 100 TB (signature is one long, not k minhashes).
    */
  val d04Simhash = Q(
    "d04_simhash",
    (s, dir) => {
      import s.implicits._
      val sh = Tables.documents(s, dir)
        .select($"doc_id", graft.functions.exprs.simhash60(wsTokens($"text")).as("sim"))
      val bandCols = (0 until 4).map { j =>
        struct(lit(j).as("band_id"),
          (shiftright($"sim", 15 * j).bitwiseAND(lit(32767L))).as("bval"))
      }
      val banded = sh
        .select($"doc_id", $"sim", explode(array(bandCols: _*)).as("bk"))
        .select($"doc_id", $"sim", $"bk.band_id", $"bk.bval")
      banded.as("a")
        .join(banded.as("b"),
          col("a.band_id") === col("b.band_id") && col("a.bval") === col("b.bval") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          bit_count(col("a.sim").bitwiseXOR(col("b.sim"))).as("hamming"))
        .distinct()
        .filter($"hamming" <= 8)
    },
    Some(s"""WITH toks AS (
        SELECT doc_id, unnest(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')) AS t
        FROM documents),
      th AS (
        SELECT doc_id, CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT) AS h
        FROM toks),
      votes AS (
        SELECT doc_id, j,
          sum(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) AS w
        FROM th, (SELECT unnest(range(60)) AS j)
        GROUP BY doc_id, j),
      sh AS (
        SELECT doc_id,
          sum(CASE WHEN w > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS sim
        FROM votes GROUP BY doc_id),
      bands AS (
        SELECT doc_id, sim, j AS band_id, (sim >> (15*j)) & 32767 AS bval
        FROM sh, (SELECT unnest(range(4)) AS j)),
      cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
          a.sim AS sim_a, b.sim AS sim_b
        FROM bands a JOIN bands b
          ON a.band_id = b.band_id AND a.bval = b.bval AND a.doc_id < b.doc_id)
      SELECT doc_a, doc_b,
        bit_count((sim_a | sim_b) - (sim_a & sim_b)) AS hamming
      FROM cand
      WHERE bit_count((sim_a | sim_b) - (sim_a & sim_b)) <= 8"""))

  /** Embedding-cosine near-dup: same-cluster (label-blocked) pairs over
    * threshold. Blocking bounds the pair count; at 100 TB the blocking
    * key would come from LSH/IVF (s02) instead of a given label.
    * Threshold 0.35 is tuned to the synthetic embeddings (max
    * label-blocked cos_sim ≈ 0.47): it yields 14/26/391 pairs at
    * sf0.001/0.01/0.1, so the oracle actually exercises the
    * dot-product/norm arithmetic instead of matching on empty sets.
    */
  val d05EmbeddingNearDup = Q(
    "d05_embedding_neardup",
    (s, dir) => {
      import s.implicits._
      // Precompute each vector's norm ONCE (one linear pass) so the
      // quadratic pair stage does a single dot product per pair instead
      // of three. dot/(nrm_a*nrm_b) is arithmetically identical to the
      // oracle's inline form — same fold, same rounding.
      //
      // Chunk-salt the equi-join: label alone has ~10 distinct values,
      // so a join keyed on it caps parallelism at the LABEL COUNT no
      // matter how many cores or rows there are — measured r19 at sf10
      // (2.0 B same-label pairs), the pair stage ran 1–6 cores wide
      // for 20+ min. Salting spreads it over label × C keys: side a is
      // replicated once per chunk (key cb = the PARTNER's chunk), side
      // b keeps its own chunk key, so every ordered (a, b) pair meets
      // on exactly one (label, cb = ck) key — no dedup pass needed and
      // the id-order filter applies unchanged. The a-side blow-up is
      // C × n small rows through one shuffle; the quadratic stage —
      // the actual cost — gains full-cluster parallelism.
      // C is CLAMPED at 64 (VERDICT r19 nit): the a-side replication is
      // C x n full (embedding, norm) rows, so C must not track core
      // count blindly — on a 1,000-core cluster that would be 30x the
      // replication for parallelism that label x 64 = ~640 keys already
      // provides. Hash-identical at any C (every ordered pair still
      // meets exactly once).
      val C = math.min(s.sparkContext.defaultParallelism, 64)
      val e = Tables.embeddings(s, dir)
        .repartition(s.sparkContext.defaultParallelism)
        .select($"vec_id", $"label", $"embedding",
          l2Norm($"embedding").as("nrm"),
          pmod(hash($"vec_id"), lit(C)).as("ck"))
      val aExp = e.withColumn("cb", explode(array((0 until C).map(lit): _*)))
      aExp.as("a").join(e.as("b"),
          col("a.label") === col("b.label") && col("a.cb") === col("b.ck") &&
            col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
          round(try_divide(dot(col("a.embedding"), col("b.embedding")),
            col("a.nrm") * col("b.nrm")), 4).as("cos_sim"))
        .filter($"cos_sim" >= 0.35)
    },
    Some("""SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
          (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
           sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 4) AS cos_sim
      FROM embeddings a JOIN embeddings b
        ON a.label = b.label AND a.vec_id < b.vec_id
      WHERE round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
          (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
           sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 4) >= 0.35"""))

  /** Shared oracle prefix for the connected-components queries (d06,
    * d12): CTE text from `pairs` (the d03 candidate graph at est_sim ≥
    * 0.5) through `comp(doc_id, comp)` — component labels as UNROLLED
    * min-label propagation (t16/t21's unroll pattern), NOT a
    * recursive-CTE transitive closure: `reach` materializes
    * O(Σ cluster²) rows and OOM'd DuckDB at sf1 (35 GB of spill,
    * r11), while k propagation rounds stay edge-sized. k must cover
    * the max eccentricity of each component's min vertex; LSH
    * near-dup components are dense (banding links most members
    * directly), so 10 is generous — and the `conv` guard makes the
    * bound SELF-CHECKING: if labels still move between rounds k-1 and
    * k the oracle RAISES via error() rather than silently blessing
    * unconverged components.
    *
    * Every chained CTE is `AS MATERIALIZED`: DuckDB 1.0 inlines a CTE
    * once PER REFERENCE, and each round references its predecessor
    * twice — plain CTEs made the plan (and the parquet scans under
    * d03's candidate SQL) grow 2^k-fold, dying on file handles before
    * memory.
    */
  private def lpCompSql(d03Sql: String, lpRounds: Int = 10): String = {
    val rounds = (1 to lpRounds).map { i =>
      s"""lab_lp$i AS MATERIALIZED (
        SELECT v, min(lab) AS lab FROM (
          SELECT v, lab FROM lab_lp${i - 1}
          UNION ALL
          SELECT e.a AS v, l.lab FROM und e JOIN lab_lp${i - 1} l ON l.v = e.b)
        GROUP BY v)"""
    }.mkString(",\n      ")
    s"""pairs AS MATERIALIZED (
        SELECT doc_a, doc_b FROM ($d03Sql) WHERE est_sim >= 0.5),
      und AS MATERIALIZED (
        SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION SELECT doc_b, doc_a FROM pairs),
      lab_lp0 AS MATERIALIZED (SELECT DISTINCT a AS v, a AS lab FROM und),
      $rounds,
      conv AS (
        SELECT CASE WHEN count(*) > 0 THEN error(
            'label propagation not converged after $lpRounds rounds')
          ELSE 0 END AS chk
        FROM lab_lp$lpRounds x
        JOIN lab_lp${lpRounds - 1} y ON y.v = x.v AND y.lab <> x.lab),
      comp AS (
        SELECT v AS doc_id, lab AS comp FROM lab_lp$lpRounds
        WHERE (SELECT chk FROM conv) = 0)"""
  }

  /** Near-dup cluster collapse: connected components over the MinHash
    * candidate pairs (est_sim ≥ 0.5) — every doc labeled with its
    * cluster representative (min id). Spark side: iterative
    * hash-to-min label propagation (graft.operators.NearDupClusters);
    * oracle: unrolled min-label propagation with a convergence guard
    * ([[lpCompSql]]). Identical fixpoints.
    */
  val d06DedupClusters = Q(
    "d06_dedup_clusters",
    (s, dir) => {
      import s.implicits._
      val pairs = graft.operators.TextDedup
        .minhashCandidates(Tables.documents(s, dir), "doc_id", "text")
        .filter($"est_sim" >= 0.5)
        .select($"doc_a", $"doc_b")
      graft.operators.NearDupClusters.connectedComponents(pairs)
    },
    Some(s"""WITH ${lpCompSql(d03MinhashLsh.oracle.get)}
      SELECT doc_id, comp FROM comp"""),
    headline = true)

  /** LSH recall gate — closes the replay blind spot in d02/d03's
    * verification. The TRUE near-dup set (exact Jaccard ≥ 0.5) is
    * computed INDEPENDENTLY of the minhash chain: an inverted-index
    * self-join on 60-bit shingle hashes shares only the shingling
    * contract (the definition of the similarity itself), none of the
    * minhash/band algebra. A bug in candidate generation that silently
    * lost true pairs would keep d02/d03 green (both engines replay the
    * same algorithm) but drop `recall` here — and `LshRecallSpec` pins
    * recall ≥ 0.95, the (b=4 bands, r=3 rows) S-curve bound: per-pair
    * catch probability is 1-(1-J³)⁴ ≥ 0.98 for J ≥ 0.85, and every
    * true pair in the synthetic corpus has J ≥ 0.85 (measured: min J =
    * 0.857 at sf0.001, 0.875 at sf0.01; recall = 1.0 at both).
    *
    * The exact all-pairs side is the expensive baseline (quadratic in
    * docs sharing a shingle) — it exists to AUDIT the linear path, the
    * same role s01's brute force plays for ANN. Not a headline query.
    */
  val d07LshRecall = Q(
    "d07_lsh_recall",
    (s, dir) => {
      import s.implicits._
      val docs = Tables.documents(s, dir)
      // checkpointed: the self-join consumes it twice, sizes once
      val sh60 = docs
        .select($"doc_id", explode(shingles($"text")).as("sh"))
        .select($"doc_id", graft.functions.exprs.token_hash60($"sh").as("h"))
        .distinct()
        .localCheckpoint(true)
      val sizes = sh60.groupBy($"doc_id").agg(count(lit(1)).as("sz"))
      val inter = sh60.as("a")
        .join(sh60.as("b"),
          col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("inter"))
      val truePairs = inter
        .join(sizes.select($"doc_id".as("doc_a"), $"sz".as("sz_a")), "doc_a")
        .join(sizes.select($"doc_id".as("doc_b"), $"sz".as("sz_b")), "doc_b")
        .filter(round($"inter" / ($"sz_a" + $"sz_b" - $"inter"), 4) >= 0.5)
        .select($"doc_a", $"doc_b")
      val cand = graft.operators.TextDedup
        .minhashCandidates(docs, "doc_id", "text")
        .select($"doc_a", $"doc_b", lit(1L).as("hit"))
      truePairs
        .join(cand, Seq("doc_a", "doc_b"), "left")
        .agg(count(lit(1)).as("n_true"),
          sum(coalesce($"hit", lit(0L))).as("n_caught"))
        .select($"n_true", $"n_caught",
          round($"n_caught" / greatest($"n_true", lit(1L)), 4).as("recall"))
    },
    Some(s"""WITH ${lshCandSql()},
      sh60 AS MATERIALIZED (
        SELECT DISTINCT doc_id,
          CAST(('0x' || substr(md5(sh), 1, 15)) AS BIGINT) AS h
        FROM (SELECT doc_id, unnest(${shinglesSql()}) AS sh FROM documents)),
      sizes AS (SELECT doc_id, count(*) AS sz FROM sh60 GROUP BY doc_id),
      inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
        FROM sh60 a JOIN sh60 b ON b.h = a.h AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
      tp AS (
        SELECT i.doc_a, i.doc_b
        FROM inter i
        JOIN sizes sa ON sa.doc_id = i.doc_a
        JOIN sizes sb ON sb.doc_id = i.doc_b
        WHERE round(i.inter / (sa.sz + sb.sz - i.inter), 4) >= 0.5)
      SELECT CAST(count(*) AS BIGINT) AS n_true,
        CAST(sum(CASE WHEN c.doc_a IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_caught,
        round(sum(CASE WHEN c.doc_a IS NOT NULL THEN 1 ELSE 0 END) /
          greatest(count(*), 1), 4) AS recall
      FROM tp t LEFT JOIN cand c ON c.doc_a = t.doc_a AND c.doc_b = t.doc_b"""))

  /** Test-set decontamination (operators.Decontaminate): training docs
    * sharing any 5-gram shingle with the benchmark corpus, with the
    * count of distinct shared shingle hashes as evidence. Docs with
    * doc_id % 37 == 0 stand in for the benchmark/eval set; everything
    * else is training data. The benchmark shingle-hash set is broadcast
    * (eval suites are MBs against a 100 TB corpus), so the whole check
    * is one linear scan of the training side — no corpus shuffle.
    * `%` (not pmod) deliberately on BOTH sides: Spark and DuckDB `%`
    * agree (sign of the dividend), and doc_id is non-negative anyway.
    * Shingle width 3 here (production decontamination uses 8–13-grams):
    * the synthetic corpus shares almost no 5-grams outside near-dup
    * pairs, and 3-grams make the overlap path do real work — 312
    * contaminated docs at sf0.01 vs 1 with width 5. Cross-SF: oracle
    * green at sf0.01 (312 rows) and sf0.1 (4826 rows), r6 `VerifyOne`
    * + `check.py --skip-verify` runs.
    */
  val d08Decontaminate = Q(
    "d08_decontaminate",
    (s, dir) => {
      import s.implicits._
      val docs = Tables.documents(s, dir)
      graft.operators.Decontaminate.contaminationHits(
        docs.filter($"doc_id" % 37 =!= 0),
        docs.filter($"doc_id" % 37 === 0),
        "doc_id", "text", n = 3)
    },
    Some(s"""WITH sh AS (
        SELECT DISTINCT doc_id,
          CAST(('0x' || substr(md5(sh), 1, 15)) AS BIGINT) AS h
        FROM (SELECT doc_id, unnest(${shinglesSql(3)}) AS sh FROM documents)),
      bench AS (SELECT DISTINCT h FROM sh WHERE doc_id % 37 = 0)
      SELECT s.doc_id, count(*) AS n_hits
      FROM sh s JOIN bench b ON b.h = s.h
      WHERE s.doc_id % 37 <> 0
      GROUP BY s.doc_id"""),
    headline = true)

  /** Cross-document duplicated-span statistics (operators.SpanDedup) —
    * the exact-substring-dedup family (suffix-array dedup over the
    * concatenated corpus) re-expressed as rolling 5-token span hashing:
    * a span is duplicated iff its 60-bit hash occurs in ≥ 2 distinct
    * documents. Corpus-internal and pair-free — it catches verbatim
    * passages shared by ANY number of docs, which the pairwise ladder
    * (d02/d03) only sees if LSH happens to pair the sharers. Width 5
    * matches the dedup shingle width and is non-degenerate on the
    * synthetic corpus: 71/500 docs carry a duplicated span at sf0.01,
    * 2064/5000 at sf0.1, mean dup_frac ≈ 0.1 among carriers (width 3
    * would mark every doc, width 4 flips between SFs).
    */
  val d09SpanDedup = Q(
    "d09_span_dedup",
    (s, dir) =>
      graft.operators.SpanDedup.spanStats(
        Tables.documents(s, dir), "doc_id", "text", n = N),
    Some(s"""WITH sp AS (
        SELECT DISTINCT doc_id, sh
        FROM (SELECT doc_id, unnest(${shinglesSql()}) AS sh FROM documents)),
      hashed AS (
        SELECT doc_id, CAST(('0x' || substr(md5(sh), 1, 15)) AS BIGINT) AS h
        FROM sp),
      census AS (SELECT h, count(*) AS nd FROM hashed GROUP BY h)
      SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_spans,
        CAST(sum(CASE WHEN c.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_spans,
        round(sum(CASE WHEN c.nd >= 2 THEN 1 ELSE 0 END) / count(*), 4) AS dup_frac
      FROM hashed s JOIN census c USING (h)
      GROUP BY s.doc_id"""),
    headline = true)

  /** Bloom-prefiltered decontamination (d08's clean-corpus view
    * through `Decontaminate.removeContaminatedBloom`): the corpus
    * shingle stream passes a broadcast Bloom probe (native codegen'd
    * `BloomFilterMightContain`) before the exact equi-join — the
    * sketch-then-verify shape for a benchmark set too big to broadcast
    * exactly. False positives are discarded by the exact join, so the
    * oracle is the plain anti-join: the Bloom stage changes the plan,
    * never the result (DecontaminateSpec pins equivalence at fpp 0.5).
    */
  val d10DecontaminateBloom = Q(
    "d10_decontaminate_bloom",
    (s, dir) => {
      import s.implicits._
      val docs = Tables.documents(s, dir)
      graft.operators.Decontaminate.removeContaminatedBloom(
        docs.filter($"doc_id" % 37 =!= 0),
        docs.filter($"doc_id" % 37 === 0),
        "doc_id", "text", n = 3)
        .select($"doc_id", $"source", $"n_chars")
    },
    Some(s"""WITH sh AS (
        SELECT DISTINCT doc_id,
          CAST(('0x' || substr(md5(sh), 1, 15)) AS BIGINT) AS h
        FROM (SELECT doc_id, unnest(${shinglesSql(3)}) AS sh FROM documents)),
      bench AS (SELECT DISTINCT h FROM sh WHERE doc_id % 37 = 0),
      hits AS (
        SELECT DISTINCT s.doc_id FROM sh s JOIN bench b ON b.h = s.h
        WHERE s.doc_id % 37 <> 0)
      SELECT doc_id, source, n_chars FROM documents
      WHERE doc_id % 37 <> 0 AND doc_id NOT IN (SELECT doc_id FROM hits)"""))

  /** Relative edit-distance threshold for d11 (pairs within 2% edits
    * of the longer document). Interpolated into the oracle SQL, so the
    * two sides cannot drift.
    */
  private val EditTau = 0.02

  /** d11: fuzzy dedup — exact EDIT-DISTANCE verification over d03's
    * LSH candidate pairs (candidate-then-verify, the only shape edit
    * distance survives at corpus scale: the DP is O(n·m) per pair, so
    * it must never see more than the near-linear candidate set).
    * Complements d02: Jaccard is order-insensitive bag-of-shingles
    * similarity; edit distance catches character-level mutation
    * (OCR noise, template fills) the shingle view smears.
    *
    * Two provable prunes keep the per-pair cost banded:
    *  1. `||a|-|b|| <= cap` BEFORE the DP — the length difference is a
    *     lower bound on edit distance, so the filter is a free column
    *     comparison that can never drop a qualifying pair.
    *  2. `levenshtein(a, b, cap)` — Spark's thresholded variant bails
    *     out of the DP once the banded diagonal exceeds `cap`
    *     (Ukkonen-style cutoff), returning -1. `cap` is derived from
    *     ONE driver-side scalar (the corpus max length, the X10
    *     pattern) and the TRUE acceptance bound: 4-dp HALF_UP rounding
    *     accepts any pair with lev/maxlen < EditTau + 0.00005, so a
    *     qualifying lev can reach (EditTau + 0.00005)·maxlen and the
    *     cap must clear that, not just EditTau·maxlen — with the bare
    *     EditTau bound the +1 slack is exhausted once maxlen exceeds
    *     1/0.00005 = 20k chars and long qualifying pairs get silently
    *     bailed out (r9 ADVICE). FuzzyDedupSpec pins capped ≡ uncapped
    *     on the real corpus AND a planted 45k-char boundary pair whose
    *     lev lands between the naive and the true cap.
    * The -1 sentinel rows are dropped by `lev >= 0` (without it a
    * bailed-out pair's negative rel_dist would pass the <= filter).
    *
    * Reference: the dedup ladder over documents (SURVEY §2 A10
    * generalized); Levenshtein 1966; Ukkonen 1985 banded cutoff.
    */
  val d11FuzzyDedup = Q(
    "d11_fuzzy_dedup",
    (s, dir) => {
      import s.implicits._
      val docs = Tables.documents(s, dir)
      val cand = graft.operators.TextDedup
        .minhashCandidates(docs, "doc_id", "text")
        .select($"doc_a", $"doc_b")
      val gmax = docs.agg(max(length($"text"))).head.getInt(0)
      // True acceptance bound incl. 4-dp HALF_UP slack (see Scaladoc):
      // a qualifying lev can reach (EditTau + 0.00005)·maxlen.
      val cap = math.ceil((EditTau + 0.5e-4) * gmax).toInt + 1
      val texts = docs.select($"doc_id", $"text", length($"text").as("len"))
      cand
        .join(texts.select($"doc_id".as("doc_a"), $"text".as("text_a"),
          $"len".as("len_a")), "doc_a")
        .join(texts.select($"doc_id".as("doc_b"), $"text".as("text_b"),
          $"len".as("len_b")), "doc_b")
        .filter(abs($"len_a" - $"len_b") <= cap)
        .select($"doc_a", $"doc_b",
          levenshtein($"text_a", $"text_b", cap).cast("long").as("lev"),
          greatest($"len_a", $"len_b").as("maxlen"))
        .select($"doc_a", $"doc_b", $"lev",
          round($"lev" / $"maxlen", 4).as("rel_dist"))
        .filter($"lev" >= 0 && $"rel_dist" <= EditTau)
    },
    Some(s"""WITH ${lshCandSql()}
      SELECT c.doc_a, c.doc_b,
        CAST(levenshtein(a.text, b.text) AS BIGINT) AS lev,
        round(CAST(levenshtein(a.text, b.text) AS DOUBLE)
          / greatest(length(a.text), length(b.text)), 4) AS rel_dist
      FROM cand c
      JOIN documents a ON a.doc_id = c.doc_a
      JOIN documents b ON b.doc_id = c.doc_b
      WHERE round(CAST(levenshtein(a.text, b.text) AS DOUBLE)
          / greatest(length(a.text), length(b.text)), 4) <= $EditTau"""),
    headline = true)

  /** d12: canonical selection — the dedup RESOLUTION stage that runs
    * after clustering: within every near-dup cluster (d06's connected
    * components over the d03 candidate graph), keep only the
    * HIGHEST-QUALITY member (t03's composite score, ranked on the
    * 4 dp-ROUNDED value with a doc_id tie-break per CLAUDE.md), drop
    * the rest; singletons survive untouched. This is the policy real
    * corpus pipelines apply (keep the best copy, not an arbitrary
    * one) — d06 labels clusters, d12 resolves them.
    *
    * Spark side is `NearDupClusters.keepBest`: the corpus is touched
    * by one anti-join + one metadata left join; everything else is
    * bounded by the candidate graph. Oracle replays the unrolled
    * label propagation (d06's [[lpCompSql]], convergence-guarded),
    * the shared quality formula (`TextFunctions.qualityScoreSql` —
    * same string t03 interpolates), and the same deterministic window
    * rank.
    *
    * Reference: the dedup ladder over documents (SURVEY §2 A10 + W1
    * composed); cluster-representative selection per Lee et al. 2021.
    */
  val d12CanonicalKeep = Q(
    "d12_canonical_keep",
    (s, dir) => {
      import s.implicits._
      val docs = Tables.documents(s, dir)
      val scored = docs.select($"doc_id", qualityScore($"text").as("quality_score"))
      val pairs = graft.operators.TextDedup
        .minhashCandidates(docs, "doc_id", "text")
        .filter($"est_sim" >= 0.5)
        .select($"doc_a", $"doc_b")
      graft.operators.NearDupClusters
        .keepBest(scored, pairs, idCol = "doc_id", scoreCol = "quality_score")
        .select($"doc_id", $"comp", $"quality_score", $"cluster_size")
    },
    Some {
      s"""WITH ${lpCompSql(d03MinhashLsh.oracle.get)},
        lab AS (
          SELECT d.doc_id, coalesce(c.comp, d.doc_id) AS comp,
            $qualityScoreSql AS quality_score
          FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id),
        sz AS (SELECT comp, count(*) AS cluster_size FROM lab GROUP BY comp),
        rk AS (
          SELECT doc_id, comp, quality_score,
            row_number() OVER (
              PARTITION BY comp
              ORDER BY quality_score DESC NULLS LAST, doc_id ASC) AS rn
          FROM lab)
      SELECT r.doc_id, r.comp, r.quality_score,
        CAST(s.cluster_size AS BIGINT) AS cluster_size
      FROM rk r JOIN sz s ON s.comp = r.comp WHERE r.rn = 1"""
    })

  /** d13: containment dedup — the ASYMMETRIC face of the near-dup
    * ladder (Broder 1997: containment beside resemblance). A short doc
    * living inside a longer one has Jaccard ≈ |A|/|B| → 0, invisible
    * to d02/d03's resemblance pipeline; containment |A∩B|/min(|A|,|B|)
    * reads ≈ 1. Candidates come from a frequency-capped inverted
    * index (prefix-filter blocking, PPJoin family) instead of minhash
    * banding; exact set verification runs on candidates only. See
    * `TextDedup.containmentPairs` for the 100 TB shape and the
    * documented above-cap recall tradeoff.
    */
  val d13Containment = Q(
    "d13_containment",
    (s, dir) =>
      graft.operators.TextDedup.containmentPairs(
        Tables.documents(s, dir), "doc_id", "text"),
    Some(s"""WITH sh AS (
        SELECT DISTINCT doc_id,
          CAST(('0x' || substr(md5(sh), 1, 15)) AS BIGINT) AS h
        FROM (SELECT doc_id, unnest(${shinglesSql()}) AS sh FROM documents)),
      census AS (SELECT h, count(*) AS df FROM sh GROUP BY h),
      blk AS (
        SELECT s.doc_id, s.h FROM sh s JOIN census c USING (h)
        WHERE c.df BETWEEN 2 AND 20),
      cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM blk a JOIN blk b ON a.h = b.h AND a.doc_id < b.doc_id),
      sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
      inter AS (
        SELECT c.doc_a, c.doc_b, CAST(count(*) AS BIGINT) AS inter
        FROM cand c
        JOIN sh a ON a.doc_id = c.doc_a
        JOIN sh b ON b.doc_id = c.doc_b AND b.h = a.h
        GROUP BY 1, 2)
      SELECT i.doc_a, i.doc_b, i.inter,
        round(i.inter / least(sa.sz, sb.sz), 4) AS containment,
        CASE WHEN sa.sz <= sb.sz THEN i.doc_a ELSE i.doc_b END AS contained_id
      FROM inter i
      JOIN sizes sa ON sa.doc_id = i.doc_a
      JOIN sizes sb ON sb.doc_id = i.doc_b
      WHERE round(i.inter / least(sa.sz, sb.sz), 4) >= 0.8"""),
    headline = true)

  /** d14: duplication provenance — the near-dup pair census by
    * (source, source): which feeds duplicate each other, and how much
    * of the dedup burden is intra- vs cross-source. The reporting
    * face every corpus audit runs after d03: a hot (src, src) cell
    * means a mirrored/scraped-twice feed worth fixing upstream rather
    * than deduping forever downstream.
    *
    * Scale shape: the pair frame is d03's candidate output (linear in
    * corpus, already skew-salted); attaching sources is two
    * doc_id-keyed joins against a (doc_id, source) projection, and
    * the census aggregates a |sources|² frame. Source pairs are
    * normalized least/greatest so the matrix is upper-triangular on
    * both engines.
    */
  val d14CrossSourceDups = Q(
    "d14_cross_source_dups",
    (s, dir) => {
      import s.implicits._
      val docs = Tables.documents(s, dir)
      val pairs = graft.operators.TextDedup
        .minhashCandidates(docs, "doc_id", "text")
        .filter($"est_sim" >= 0.5)
        .select($"doc_a", $"doc_b")
      val src = docs.select($"doc_id", $"source")
      pairs
        .join(src.select($"doc_id".as("doc_a"), $"source".as("source_a")), "doc_a")
        .join(src.select($"doc_id".as("doc_b"), $"source".as("source_b")), "doc_b")
        .select(least($"source_a", $"source_b").as("src_x"),
          greatest($"source_a", $"source_b").as("src_y"))
        .groupBy($"src_x", $"src_y")
        .agg(count(lit(1)).as("n_pairs"))
    },
    Some {
      val d03Sql = d03MinhashLsh.oracle.get
      s"""WITH pairs AS (
        SELECT doc_a, doc_b FROM ($d03Sql) WHERE est_sim >= 0.5)
      SELECT least(a.source, b.source) AS src_x,
        greatest(a.source, b.source) AS src_y,
        CAST(count(*) AS BIGINT) AS n_pairs
      FROM pairs p
      JOIN documents a ON a.doc_id = p.doc_a
      JOIN documents b ON b.doc_id = p.doc_b
      GROUP BY 1, 2"""
    },
    headline = true)

  /** Semantic decontamination — the embedding-space face of d08/d10's
    * exact n-gram rule: training vectors whose rounded cosine against
    * ANY benchmark vector (`vec_id % 20 = 0`, the deterministic 5%
    * eval split) reaches 0.30, with neighbor count, best similarity
    * and the deterministic argmax benchmark id. Catches paraphrased /
    * translated eval items that share no shingles with the benchmark.
    *
    * Scale shape (graft.operators.Decontaminate.semanticHits): the
    * benchmark side is model-sized → ONE broadcast, corpus side a
    * single linear scan (declared BNLJ over the tiny side, s01's
    * shape); only matching pairs shuffle into the per-doc aggregate.
    * τ = 0.30 yields 72/91/1000 flagged vectors at sf0.001/0.01/0.1
    * (max cross-set cosine ≈ 0.43/0.49/0.51), so the oracle exercises
    * the full argmax/count algebra, not an empty set.
    */
  val d15SemanticDecontaminate = Q(
    "d15_semantic_decontaminate",
    (s, dir) => {
      import s.implicits._
      val e = Tables.embeddings(s, dir)
      val bench = e.filter($"vec_id" % 20 === 0)
      // repartition the probe side: single-file scan + broadcast join
      // inherits 1-2 partitions otherwise (the d05/s01 pattern)
      val corpus = e.filter($"vec_id" % 20 =!= 0)
        .repartition(s.sparkContext.defaultParallelism)
      graft.operators.Decontaminate
        .semanticHits(corpus, bench, "vec_id", "embedding", tau = 0.30)
    },
    Some("""WITH bench AS (
        SELECT vec_id AS bench_id, embedding::DOUBLE[] AS bvec
        FROM embeddings WHERE vec_id % 20 = 0),
      corpus AS (
        SELECT vec_id, embedding::DOUBLE[] AS cvec
        FROM embeddings WHERE vec_id % 20 <> 0),
      hits AS (
        SELECT c.vec_id, b.bench_id,
          round(list_dot_product(c.cvec, b.bvec) /
            (sqrt(list_dot_product(c.cvec, c.cvec)) *
             sqrt(list_dot_product(b.bvec, b.bvec))), 4) AS cos
        FROM corpus c, bench b
        WHERE round(list_dot_product(c.cvec, b.bvec) /
            (sqrt(list_dot_product(c.cvec, c.cvec)) *
             sqrt(list_dot_product(b.bvec, b.bvec))), 4) >= 0.30),
      agg AS (
        SELECT vec_id, CAST(count(*) AS BIGINT) AS n_hits,
          max(cos) AS best_cos
        FROM hits GROUP BY vec_id)
      SELECT a.vec_id, a.n_hits, a.best_cos,
        min(h.bench_id) AS best_bench
      FROM agg a JOIN hits h ON h.vec_id = a.vec_id AND h.cos = a.best_cos
      GROUP BY a.vec_id, a.n_hits, a.best_cos"""),
    headline = true)

  // d16's coarse quantizer: cells = the first DCells vectors of the
  // full embeddings table (deterministic, so the oracle replays the
  // identical cells — s02's convention), nprobe nearest cells per
  // benchmark item, same τ as d15 so the recall spec compares like
  // with like.
  private val DCells = 16
  private val DProbe = 8

  /** d16: IVF-blocked semantic decontamination — the scale path d15's
    * Scaladoc promises for a benchmark too big to pair against the
    * whole corpus: both splits coarse-quantize against shared
    * deterministic cells, each benchmark item probes its [[DProbe]]
    * nearest cells, and the exact 4-dp cosine screen runs only inside
    * probed cells (`Decontaminate.semanticHitsIvf`). The corpus side
    * is a zero-shuffle kernel argmax + ONE broadcast equi-join on the
    * cell id — no nested-loop product, work scales with cell
    * co-occupancy. Recall < 1 by design; the oracle replays cells,
    * probes, and the in-cell screen exactly (s02/s10's pattern), and
    * `IvfDecontaminateSpec` pins the flagged set ⊆ d15's with its
    * measured recall floor.
    *
    * nprobe = 8 of 16 cells: the synthetic embeddings are near-random
    * (max cross-set cosine ≈ 0.5), the ADVERSARIAL case for IVF — no
    * cluster structure means recall tracks the probed fraction.
    * Measured at sf0.01: nprobe 4/8/12 → recall 0.56/0.76/0.90
    * (flagged-set vs d15, always a subset), flat in τ. A real
    * embedding space concentrates near-dups into shared cells, which
    * is the regime this blocking exists for; on this corpus the query
    * demonstrates (and hash-verifies) the SHAPE while the spec pins
    * the honest floor.
    */
  val d16IvfDecontaminate = Q(
    "d16_ivf_decontaminate",
    (s, dir) => {
      import s.implicits._
      val e = Tables.embeddings(s, dir)
      val cents = graft.operators.AnnIndex
        .firstVectors(e, "embedding", "vec_id", DCells)
      require(cents.map(_._1).toSeq == cents.indices.map(_.toLong),
        "coarse cells must be the dense first-N vec_ids")
      val bench = e.filter($"vec_id" % 20 === 0)
      val corpus = e.filter($"vec_id" % 20 =!= 0)
        .repartition(s.sparkContext.defaultParallelism)
      graft.operators.Decontaminate.semanticHitsIvf(
        corpus, bench, "vec_id", "embedding", tau = 0.30,
        cents = cents.map(_._2), nprobe = DProbe)
    },
    Some(s"""WITH cents AS (
        SELECT vec_id AS c_id, embedding AS c_emb FROM embeddings
        WHERE vec_id < $DCells),
      bench AS (
        SELECT vec_id AS bench_id, embedding::DOUBLE[] AS bvec
        FROM embeddings WHERE vec_id % 20 = 0),
      corpus AS (
        SELECT vec_id, embedding::DOUBLE[] AS cvec
        FROM embeddings WHERE vec_id % 20 <> 0),
      assigned AS (
        SELECT vec_id, cvec, c_id FROM (
          SELECT c.vec_id, c.cvec, ct.c_id,
            row_number() OVER (PARTITION BY c.vec_id ORDER BY
              round(list_dot_product(c.cvec, ct.c_emb::DOUBLE[]) /
                (sqrt(list_dot_product(c.cvec, c.cvec)) *
                 sqrt(list_dot_product(ct.c_emb::DOUBLE[], ct.c_emb::DOUBLE[]))), 6)
              DESC, ct.c_id ASC) AS arn
          FROM corpus c, cents ct)
        WHERE arn = 1),
      probes AS (
        SELECT bench_id, bvec, c_id FROM (
          SELECT b.bench_id, b.bvec, ct.c_id,
            row_number() OVER (PARTITION BY b.bench_id ORDER BY
              round(list_dot_product(b.bvec, ct.c_emb::DOUBLE[]) /
                (sqrt(list_dot_product(b.bvec, b.bvec)) *
                 sqrt(list_dot_product(ct.c_emb::DOUBLE[], ct.c_emb::DOUBLE[]))), 6)
              DESC, ct.c_id ASC) AS prn
          FROM bench b, cents ct)
        WHERE prn <= $DProbe),
      hits AS (
        SELECT a.vec_id, p.bench_id,
          round(list_dot_product(a.cvec, p.bvec) /
            (sqrt(list_dot_product(a.cvec, a.cvec)) *
             sqrt(list_dot_product(p.bvec, p.bvec))), 4) AS cos
        FROM assigned a JOIN probes p ON p.c_id = a.c_id
        WHERE round(list_dot_product(a.cvec, p.bvec) /
            (sqrt(list_dot_product(a.cvec, a.cvec)) *
             sqrt(list_dot_product(p.bvec, p.bvec))), 4) >= 0.30),
      agg AS (
        SELECT vec_id, CAST(count(*) AS BIGINT) AS n_hits,
          max(cos) AS best_cos
        FROM hits GROUP BY vec_id)
      SELECT a.vec_id, a.n_hits, a.best_cos,
        min(h.bench_id) AS best_bench
      FROM agg a JOIN hits h ON h.vec_id = a.vec_id AND h.cos = a.best_cos
      GROUP BY a.vec_id, a.n_hits, a.best_cos"""),
    headline = true)

  val all: Seq[Q] =
    Seq(d01ExactDedup, d02NgramJaccard, d03MinhashLsh, d04Simhash,
      d05EmbeddingNearDup, d06DedupClusters, d07LshRecall, d08Decontaminate,
      d09SpanDedup, d10DecontaminateBloom, d11FuzzyDedup, d12CanonicalKeep,
      d13Containment, d14CrossSourceDups, d15SemanticDecontaminate,
      d16IvfDecontaminate)
}
