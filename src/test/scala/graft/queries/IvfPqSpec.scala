package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables
import graft.functions.VectorFunctions.{cosineSimilarity, dot}
import graft.operators.ProductQuantizer

/** Independent audit of s10 (IVF×PQ): the coarse restriction and the
  * ADC ranking are reconstructed here from first principles (not via
  * the query's own helpers), so a bug in the s10 plumbing cannot hide
  * behind a matching oracle replay.
  */
class IvfPqSpec extends SparkSpec {
  import spark.implicits._

  // s10's published parameters (SimilarityQueries)
  private val NC = 16
  private val NPROBE = 4
  private val NQ = 8
  private val TopK = 5
  private val M = 4
  private val K = 16

  private lazy val e = Tables.embeddings(spark, sfDir)

  // independent coarse quantizer: first-NC centroids, max rounded
  // cosine with id tie-break — the same published contract s10 claims
  private lazy val assigned: DataFrame = {
    val cents = e.filter($"vec_id" < NC)
      .select($"vec_id".as("c_id"), $"embedding".as("c_emb"))
    val w = Window.partitionBy($"vec_id").orderBy($"c_sim".desc, $"c_id".asc)
    e.crossJoin(broadcast(cents))
      .select($"vec_id", $"c_id",
        round(cosineSimilarity($"embedding", $"c_emb"), 6).as("c_sim"))
      .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .select($"vec_id", $"c_id")
  }

  private lazy val probes: DataFrame = {
    val cents = e.filter($"vec_id" < NC)
      .select($"vec_id".as("c_id"), $"embedding".as("c_emb"))
    val w = Window.partitionBy($"q_id").orderBy($"p_sim".desc, $"c_id".asc)
    e.filter($"vec_id" < NQ)
      .select($"vec_id".as("q_id"), $"embedding".as("q_emb"))
      .crossJoin(broadcast(cents))
      .select($"q_id", $"c_id",
        round(cosineSimilarity($"q_emb", $"c_emb"), 6).as("p_sim"))
      .withColumn("rn", row_number().over(w)).filter($"rn" <= NPROBE)
      .select($"q_id", $"c_id")
  }

  private lazy val s10 =
    Registry.byName("s10_ann_ivfpq").run(spark, sfDir)

  test("cell-partitioned codes: probe list prunes partitions at the scan") {
    // the s10 scale story made concrete: write the encoded corpus with
    // the coarse cell as a PARTITION COLUMN, and a probe-restricted
    // read touches only the probed cells' files — partition pruning,
    // not a post-scan filter
    val cents = e.filter($"vec_id" < NC).orderBy($"vec_id")
      .select($"embedding").collect().map(_.getSeq[Float](0).toArray)
    val cb = ProductQuantizer.fitCodebook(e, "embedding", "vec_id", M, K, dim = 64)
    val enc = ProductQuantizer.encode(
      e.select($"vec_id", $"embedding",
        graft.functions.exprs.coarse_assign_cell($"embedding", cents).as("c_id")),
      "embedding", cb)
      .select($"vec_id", $"c_id", $"code_0", $"code_1", $"code_2", $"code_3")
    val dir = java.nio.file.Files.createTempDirectory("ivf-cells").toString
    enc.write.mode("overwrite").partitionBy("c_id").parquet(dir)

    val probed = Seq(2L, 5L, 11L)
    val expect = enc.filter($"c_id".isin(probed: _*)).count()
    assert(expect > 0, "probed cells must hold rows for the test to mean anything")

    // the pruned scan declares the partition filter...
    val back = spark.read.parquet(dir).filter($"c_id".isin(probed: _*))
    val planStr = back.queryExecution.executedPlan.toString
    assert(planStr.contains("PartitionFilters") && planStr.contains("c_id"),
      s"scan must push the cell restriction as a partition filter:\n$planStr")

    // ...and provably never touches unprobed cells: corrupt an
    // unprobed partition's file — the pruned read still answers, the
    // full scan chokes on it
    val victim = new java.io.File(s"$dir/c_id=1").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.write(victim.toPath, "not a parquet file".getBytes)
    assert(back.count() === expect,
      "partition-pruned read must not touch (now corrupt) unprobed cells")
    intercept[Exception] {
      spark.read.parquet(dir).count()
    }
  }

  test("native coarse-assign kernel == declarative argmax tree, all rows") {
    // the queries run CoarseAssignCell (driver-side centroid state,
    // one call per row); the declarative k-cosine array formula is
    // the spec'd semantics — every row must agree, including rounded
    // ties (lowest c_id) and the zero-vector NULL fallthrough
    val cents = e.filter($"vec_id" < NC).orderBy($"vec_id")
      .select($"embedding").collect().map(_.getSeq[Float](0).toArray)
    val zero = Seq((-1L, Seq.fill(64)(0f))).toDF("vec_id", "embedding")
    val withZero = e.select($"vec_id", $"embedding").unionByName(zero)
    val both = withZero.select(
      $"vec_id",
      graft.functions.exprs.coarse_assign_cell($"embedding", cents).as("kernel"),
      SimilarityQueries.coarseAssignExprCol(cents).as("declarative"))
    assert(both.filter($"kernel" =!= $"declarative").count() === 0L,
      "kernel and declarative coarse assignment diverge")
    assert(both.filter($"vec_id" === -1L).head().getLong(1) === 0L,
      "zero vector must fall to cell 0")
  }

  test("every returned neighbor lies in one of its query's probed cells") {
    val out = s10.select($"q_id", $"neighbor_id")
    val inProbedCell = out
      .join(assigned.withColumnRenamed("vec_id", "neighbor_id"), Seq("neighbor_id"))
      .join(probes, Seq("q_id", "c_id"))
    assert(out.count() === NQ.toLong * TopK)
    assert(inProbedCell.count() === out.count(),
      "an IVF×PQ neighbor came from an unprobed cell")
  }

  test("s10 == full-ADC ranking restricted to the probed cells") {
    val cb = ProductQuantizer.fitCodebook(e, "embedding", "vec_id", M, K, dim = 64)
    val corpusN = e.count().toInt
    // full (unpruned) ADC ranking over the whole corpus...
    val full = ProductQuantizer.adcSearch(
      ProductQuantizer.encode(e, "embedding", cb),
      "vec_id", e.filter($"vec_id" < NQ), "vec_id", "embedding", cb, corpusN)
    // ...restricted to probed cells and re-ranked must equal s10
    val wRe = Window.partitionBy($"q_id").orderBy($"adc_dist".asc, $"neighbor_id".asc)
    val restricted = full
      .join(assigned.withColumnRenamed("vec_id", "neighbor_id"), Seq("neighbor_id"))
      .join(probes, Seq("q_id", "c_id"))
      .withColumn("rank", row_number().over(wRe))
      .filter($"rank" <= TopK)
      .select($"q_id", $"rank", $"neighbor_id", $"adc_dist")
    val got = s10.collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val want = restricted.collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got === want)
  }

  test("recall vs the exact top-k is reported and above chance, both variants") {
    val qx = e.filter($"vec_id" < NQ)
      .select($"vec_id".as("q_id"), $"embedding".as("q_emb"))
    val w = Window.partitionBy($"q_id").orderBy($"d2".asc, $"vec_id".asc)
    val exact = e.crossJoin(broadcast(qx))
      .filter($"vec_id" =!= $"q_id")
      .select($"q_id", $"vec_id",
        round(dot($"embedding", $"embedding")
          - lit(2.0) * dot($"embedding", $"q_emb")
          + dot($"q_emb", $"q_emb"), 6).as("d2"))
      .withColumn("rank", row_number().over(w)).filter($"rank" <= TopK)
      .select($"q_id", $"vec_id".as("neighbor_id"))
    def recallOf(res: org.apache.spark.sql.DataFrame): Double =
      exact.join(res.select($"q_id", $"neighbor_id"),
        Seq("q_id", "neighbor_id"), "left_semi").count().toDouble / exact.count()
    val raw = recallOf(s10)
    val residual = recallOf(
      Registry.byName("s11_ann_ivfpq_residual").run(spark, sfDir))
    val chance = TopK.toDouble / (e.count() - 1)
    info(f"IVFPQ recall@$TopK raw=$raw%.4f residual=$residual%.4f (chance $chance%.4f)")
    // near-uniform synthetic vectors + 4/16-cell pruning + 16x PQ
    // compression: recall is LOW by construction (the honest s09
    // story); both variants must still clear chance by a wide margin
    assert(raw >= 2 * chance,
      f"IVFPQ recall $raw%.4f at chance level ($chance%.4f)")
    assert(residual >= 2 * chance,
      f"residual IVFPQ recall $residual%.4f at chance level ($chance%.4f)")
  }

  test("s21 filtered ANN: every neighbor satisfies the predicate; recall vs the " +
    "FILTERED brute force beats unwidened probing's worst case and chance") {
    val res = Registry.byName("s21_filtered_ann").run(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    val vecs = e.select($"vec_id", $"embedding", $"label").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    val byId = vecs.map(v => v._1 -> v).toMap
    // predicate holds on every returned row
    res.foreach { case (q, n) =>
      assert(byId(n)._3 == byId(q)._3,
        s"neighbor $n of query $q crosses the label predicate")
    }
    // filtered brute force: exact top-k among the SAME-label corpus
    val k = 10
    val exact = (0L until NQ.toLong).map { q =>
      val (_, qv, ql) = byId(q)
      q -> vecs.filter(v => v._1 != q && v._3 == ql)
        .flatMap(v => graft.functions.VectorFunctions
          .roundedCosine(qv, v._2).map(c => (v._1, c)))
        .sortBy { case (id, c) => (-c, id) }
        .take(k).map(_._1).toSet
    }.toMap
    val found = res.groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
    val per = exact.map { case (q, ex) =>
      ex.intersect(found.getOrElse(q, Set.empty)).size.toDouble / math.max(1, ex.size)
    }
    val recall = per.sum / per.size
    val chance = k.toDouble * 10 / (e.count() - 1) // ~10-way labels
    info(f"filtered-IVF recall@$k vs filtered brute force = $recall%.4f (chance ~$chance%.4f)")
    assert(recall >= 0.5,
      f"filtered recall $recall%.4f below floor — probe widening not doing its job")
  }

  test("residual neighbors also come only from probed cells") {
    val out = Registry.byName("s11_ann_ivfpq_residual").run(spark, sfDir)
      .select($"q_id", $"neighbor_id")
    val inProbedCell = out
      .join(assigned.withColumnRenamed("vec_id", "neighbor_id"), Seq("neighbor_id"))
      .join(probes, Seq("q_id", "c_id"))
    assert(out.count() === NQ.toLong * TopK)
    assert(inProbedCell.count() === out.count())
  }
}
