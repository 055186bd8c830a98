package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Count-Min invariants: estimates never undercount, total mass per
  * depth row equals the stream length, and the grid is partitioning-
  * invariant (elementwise-add merge is commutative/associative).
  */
class CountMinSketchSpec extends SparkSpec {
  import spark.implicits._
  import CountMinSketch.{Depth, Width}

  private def bucket(c: org.apache.spark.sql.Column, i: Int) = CountMinSketch.bucket(c, i)

  private val words =
    (Seq.fill(40)("alpha") ++ Seq.fill(17)("beta") ++ Seq.fill(3)("gamma") ++
      Seq("delta", "epsilon", "zeta")).toDF("t")

  private def sketchOf(df: org.apache.spark.sql.DataFrame): Seq[Long] = {
    val cms = udaf(CountMinSketch)
    df.select(array((0 until Depth).map(i => bucket(col("t"), i)): _*).as("bks"))
      .agg(cms($"bks")).collect().head.getSeq[Long](0)
  }

  test("point estimates are upper bounds and exact without collisions") {
    val sk = sketchOf(words)
    val exact = Map("alpha" -> 40L, "beta" -> 17L, "gamma" -> 3L)
    val probes = words.select($"t").distinct()
      .select($"t", array((0 until Depth).map(i => bucket($"t", i)): _*).as("bks"))
      .collect().map(r => r.getString(0) -> r.getSeq[Int](1)).toMap
    for ((w, ex) <- exact) {
      val est = (0 until Depth).map(i => sk(i * Width + probes(w)(i))).min
      assert(est >= ex, s"$w: CMS must never undercount ($est < $ex)")
      // 6 distinct words in a 1024-wide row: collisions are possible
      // but an estimate beyond the stream length is a logic bug
      assert(est <= 63L, s"$w: estimate $est exceeds total mass")
    }
  }

  test("each depth row sums to the stream length") {
    val sk = sketchOf(words)
    (0 until Depth).foreach { i =>
      val mass = sk.slice(i * Width, (i + 1) * Width).sum
      assert(mass == 63L, s"row $i mass $mass != 63")
    }
  }

  test("grid is invariant under repartitioning (merge order)") {
    val one = sketchOf(words.repartition(1))
    val many = sketchOf(words.repartition(7))
    assert(one == many, "elementwise-add merge must be order-independent")
  }
}
