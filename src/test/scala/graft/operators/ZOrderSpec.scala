package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("spreadBits expression matches the reference bit-twiddle on the full 16-bit range edge cases") {
    val samples = Seq(0L, 1L, 2L, 3L, 0xFFL, 0x5555L, 0xAAAAL, 0xFFFFL, 12345L)
    val viaExpr = samples.toDF("x")
      .select(ZOrder.spreadBits($"x").as("s"))
      .collect().map(_.getLong(0)).toSeq
    assert(viaExpr == samples.map(ZOrder.spreadBitsRef))
    // interleaving two spread values can never collide bits
    assert(samples.forall(s =>
      (ZOrder.spreadBitsRef(s) & (ZOrder.spreadBitsRef(s) << 1)) == 0L))
  }

  test("mortonKey orders a 2x2 grid in Z traversal order") {
    // (0,0) -> 0, (1,0) -> 1, (0,1) -> 2, (1,1) -> 3 scaled to bucket
    // extremes: the key must sort quadrant-contiguously
    val df = Seq((0.0, 0.0), (1.0, 0.0), (0.0, 1.0), (1.0, 1.0)).toDF("x", "y")
    val keys = df.select(col("x"), col("y"), ZOrder.mortonKey(df, Seq("x", "y")))
      .collect().map(r => ((r.getDouble(0), r.getDouble(1)), r.getLong(2))).toMap
    assert(keys((0.0, 0.0)) < keys((1.0, 0.0)))
    assert(keys((1.0, 0.0)) < keys((0.0, 1.0)))
    assert(keys((0.0, 1.0)) < keys((1.0, 1.0)))
  }

  test("z-ordered files prune on EITHER dimension; a 1D sort only prunes its own") {
    // 20k points uniform on a 1000x1000 grid (deterministic LCG)
    val pts = spark.range(20000).select(
      (pmod(col("id") * 48271, lit(1000))).cast("double").as("x"),
      (pmod(col("id") * 16807 + 7, lit(1000))).cast("double").as("y"))
    val zDir = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    val xDir = java.nio.file.Files.createTempDirectory("graft-xsort").toString
    val nFiles = ZOrder.zorderWrite(pts, Seq("x", "y"), zDir, 16)
    assert(nFiles >= 8, s"expected a multi-file layout, got $nFiles")
    pts.repartitionByRange(16, $"x").sortWithinPartitions($"x")
      .write.mode("overwrite").parquet(xDir)

    def overlapFrac(dir: String, c: String, lo: Double, hi: Double): Double = {
      val bounds = ZOrder.fileBounds(spark, dir, c)
      bounds.count { case (_, flo, fhi) => fhi >= lo && flo <= hi }.toDouble / bounds.size
    }

    // selective band on y: x-sorted layout cannot skip anything
    assert(overlapFrac(xDir, "y", 100, 150) == 1.0,
      "1D x-sort should be unable to prune a y predicate")
    // ... while the z-ordered layout skips most files on y AND on x
    val zy = overlapFrac(zDir, "y", 100, 150)
    val zx = overlapFrac(zDir, "x", 100, 150)
    assert(zy <= 0.5, s"z-order should prune a y band to <=50% of files, got $zy")
    assert(zx <= 0.5, s"z-order should prune an x band to <=50% of files, got $zx")

    // the rewrite is a pure re-layout: same rows
    assert(spark.read.parquet(zDir).count() == 20000)
    val a = spark.read.parquet(zDir).agg(sum($"x"), sum($"y")).head()
    val b = pts.agg(sum($"x"), sum($"y")).head()
    assert(a == b)
  }

  test("fileBounds falls back to a value scan for non-numeric footer stats and skips NULL-only files") {
    // decimal physical stats are BINARY/INT with scale — not directly
    // numeric in the footer — so bounds must come from the scan fallback
    val dir = java.nio.file.Files.createTempDirectory("graft-zb-dec").toString
    Seq("1.50", "3.25", "2.00").toDF("s")
      .select(col("s").cast("decimal(10,2)").as("d"))
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val bounds = ZOrder.fileBounds(spark, dir, "d")
    assert(bounds.size == 1)
    assert(bounds.head._2 == 1.5 && bounds.head._3 == 3.25,
      s"decimal column bounds via the scan fallback, got ${bounds.head}")

    // a file that is entirely NULL for the column is omitted, not fatal
    val nullDir = java.nio.file.Files.createTempDirectory("graft-zb-null").toString
    Seq[Option[Double]](None, None).toDF("v")
      .coalesce(1).write.mode("overwrite").parquet(nullDir)
    Seq[Option[Double]](Some(7.0)).toDF("v")
      .coalesce(1).write.mode("append").parquet(nullDir)
    val nb = ZOrder.fileBounds(spark, nullDir, "v")
    assert(nb.size == 1 && nb.head._2 == 7.0 && nb.head._3 == 7.0,
      s"NULL-only file must be skipped, the other file's bounds kept: $nb")
  }

  test("fileBounds routes unsigned-int logical types to the value scan") {
    // foreign-written UINT32 stores two's-complement bit patterns: the
    // footer's genericGetMin/Max come back as SIGNED ints (-2 here),
    // disagreeing with the cast-to-double value space (4294967294).
    // The footer path must detect isSigned=false and scan instead.
    val dir = java.nio.file.Files.createTempDirectory("graft-zb-uint").toString
    val schema = org.apache.parquet.schema.MessageTypeParser.parseMessageType(
      "message m { required int32 u (INTEGER(32,false)); }")
    val conf = spark.sparkContext.hadoopConfiguration
    val writer = org.apache.parquet.hadoop.example.ExampleParquetWriter
      .builder(org.apache.parquet.hadoop.util.HadoopOutputFile.fromPath(
        new org.apache.hadoop.fs.Path(s"$dir/u.parquet"), conf))
      .withConf(conf).withType(schema).build()
    val gf = new org.apache.parquet.example.data.simple.SimpleGroupFactory(schema)
    Seq(5, -2).foreach(v => writer.write(gf.newGroup().append("u", v)))
    writer.close()
    val bounds = ZOrder.fileBounds(spark, dir, "u")
    assert(bounds.size == 1)
    assert(bounds.head._2 == 5.0 && bounds.head._3 == 4294967294.0,
      s"unsigned footer stats must come from the scan fallback, got ${bounds.head}")
  }

  test("3-column morton key packs 8-bit buckets without bit collisions") {
    val df = Seq((0.0, 0.0, 0.0), (255.0, 255.0, 255.0), (255.0, 0.0, 0.0))
      .toDF("a", "b", "c")
    val keys = df.select(ZOrder.mortonKey(df, Seq("a", "b", "c")))
      .collect().map(_.getLong(0)).toSeq
    assert(keys(0) == 0L)
    assert(keys(1) == (1L << 24) - 1) // all 24 bits set
    // dimension 0 alone owns bits 0, 3, 6, ... (0x249249 pattern)
    assert(keys(2) == 0x249249L)
  }
}
