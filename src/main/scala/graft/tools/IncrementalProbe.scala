package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-shape probe for the incremental faces — every stream ≡ batch
  * spec runs at planted-fixture scale (hundreds of rows), so this tool
  * is the first measurement of the per-batch cost CURVES on a real
  * corpus: does ingesting batch k cost more than batch 1 because of
  * accumulated state?
  *
  * Probe 1 (`manifest`): the sf corpus (pipe02's normalize + bench
  * split) in `nBatches` id-ordered batches through
  * [[graft.operators.IncrementalManifest.processBatch]]; per-batch
  * ingest wall, a mid-stream and a final [[IncrementalManifest
  * .manifest]] read wall (the read re-derives clusters over the FULL
  * kept set from stored signatures — by design, since kept-ness is
  * only final at read time; the read curve is the cost of that
  * design), and an identity assert against the registry's one-shot
  * pipe02 frame.
  *
  * Probe 2 (`graphann`): the sf embeddings through
  * [[graft.operators.IncrementalGraphAnn]] — createIndex on the first
  * chunk (dense-id bootstrap), then append/maintain per batch;
  * per-batch wall (each append beam-probes the PRIOR store: the curve
  * measures search-cost growth with store size) plus a final
  * distributed search sanity count.
  *
  * Output: one JSON line per measurement
  * (`{"probe":...,"step":...,"wall_s":...}`), stdout, greppable by
  * `^\{`. Identity failures exit nonzero — this tool is also the
  * sf-scale identity gate the specs can't afford.
  *
  * Usage: runMain graft.tools.IncrementalProbe [sfDir] [nBatches] [face]
  *
  * `face` (all|manifest|graphann, default all) selects one probe so the
  * two faces can be sized INDEPENDENTLY: appendBatch's intra-batch
  * candidate pass is |B|² driver tuples BY CONTRACT (micro-batches), so
  * the graph face needs many small batches, while the manifest face
  * wants few large ones — one shared nBatches mis-sizes one of them at
  * big SF (r19: 20k-vector appends stalled the driver in a 400 M-tuple
  * groupBy for 35+ min; 2k appends run in seconds).
  */
object IncrementalProbe {
  private def num(v: Double): String =
    "%.3f".formatLocal(java.util.Locale.ROOT, v)

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nBatches = if (args.length > 1) args(1).toInt else 10
    val face = if (args.length > 2) args(2) else "all"
    require(Set("all", "manifest", "graphann")(face),
      s"face must be all|manifest|graphann, got '$face'")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftExtensions.install(spark)
    import spark.implicits._

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    def line(probe: String, step: String, wall: Double, extra: String = ""): Unit =
      println(s"""{"probe":"$probe","step":"$step","wall_s":${num(wall)}$extra}""")

    // ---- probe 1: hygiene ladder + manifest ----
    if (face != "graphann") locally {
      import graft.core.Tables
      val dir = java.nio.file.Files.createTempDirectory("incprobe_man").toString
      val docs = Tables.documents(spark, sfDir)
      val norm = graft.functions.exprs.normalize_text($"text")
      val bench = docs.filter($"doc_id" % 37 === 0)
        .select($"doc_id", norm.as("text")).localCheckpoint()
      val corp = docs.filter($"doc_id" % 37 =!= 0)
        .select($"doc_id", norm.as("text"), $"source").localCheckpoint()
      val ids = corp.select($"doc_id").orderBy($"doc_id").as[Long].collect()
      val cuts = (1 until nBatches).map(i => ids(i * ids.length / nBatches))
      val ranges = (Long.MinValue +: cuts) :+ Long.MaxValue
      for (i <- 0 until nBatches) {
        val batch = corp.filter($"doc_id" >= ranges(i) && $"doc_id" < ranges(i + 1))
        val (_, w) = timed(graft.operators.IncrementalManifest.processBatch(
          batch, bench, "doc_id", "text", "source", dir, i.toLong))
        line("manifest", s"ingest_$i", w, s""","rows":${batch.count()}""")
        if (i == nBatches / 2 - 1 || i == nBatches - 1) {
          val (cnt, wr) = timed(
            graft.operators.IncrementalManifest.manifest(spark, dir, "doc_id").count())
          line("manifest", s"read_after_$i", wr, s""","rows":$cnt""")
        }
      }
      // identity vs the one-shot registry frame (what the oracle hashes)
      val inc = graft.operators.IncrementalManifest.manifest(spark, dir, "doc_id")
      val one = graft.queries.Registry.byName("pipe02_manifest").run(spark, sfDir)
      val diff = inc.exceptAll(one).count() + one.exceptAll(inc).count()
      line("manifest", "identity_diff_rows", 0.0, s""","rows":$diff""")
      require(diff == 0, s"incremental manifest diverges from one-shot pipe02 by $diff rows")
    }

    // ---- probe 2: graph-ANN append/maintain loop ----
    if (face != "manifest") locally {
      import graft.core.Tables
      val dir = java.nio.file.Files.createTempDirectory("incprobe_ann").toString
      val emb = Tables.embeddings(spark, sfDir)
        .select($"vec_id", $"embedding").localCheckpoint()
      val n = emb.count()
      val bootN = n / 2 // dense 0..bootN-1 bootstrap, rest appended
      val (_, wBoot) = timed(graft.operators.IncrementalGraphAnn.createIndex(
        emb.filter($"vec_id" < bootN), dir, k = 8, rounds = 3))
      line("graphann", "bootstrap", wBoot, s""","rows":$bootN""")
      val rest = n - bootN
      var maintained = 0
      for (i <- 0 until nBatches) {
        val lo = bootN + i * rest / nBatches
        val hi = bootN + (i + 1) * rest / nBatches
        val batch = emb.filter($"vec_id" >= lo && $"vec_id" < hi)
        val (act, w) = timed(graft.operators.IncrementalGraphAnn.appendAndMaintain(
          batch, dir, (i + 1).toLong, k = 8, beam = 16, hops = 3))
        if (act != graft.operators.StorePolicy.NoOp) maintained += 1
        line("graphann", s"append_$i", w,
          s""","rows":${hi - lo},"action":"$act"""")
      }
      val probes = emb.filter($"vec_id" % 97 === 0)
        .select($"vec_id".as("q_id"), $"embedding".as("q_emb"))
      val (hits, wS) = timed(graft.operators.IncrementalGraphAnn
        .searchTopKDistributed(spark, dir, probes, 10, 16, 3).count())
      line("graphann", "search", wS, s""","rows":$hits,"maintained":$maintained""")
      require(hits > 0, "post-loop distributed search returned nothing")
    }
    spark.stop()
  }
}
