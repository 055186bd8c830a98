package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering for multi-dimensional file
  * skipping — the layout investment behind Delta's `OPTIMIZE ZORDER BY`
  * and Iceberg's sort-order rewrite, rebuilt on plain parquet.
  *
  * Why it matters at 100 TB: parquet scans skip whole files (and row
  * groups) from footer min/max stats. A table sorted by one column
  * prunes predicates on THAT column only — a filter on any other
  * column still reads every file. Interleaving the bits of k columns'
  * rank buckets into one Morton key and range-partitioning on it gives
  * every file a tight bounding box in ALL k dimensions, so a selective
  * predicate on ANY clustered column skips most files.
  *
  * Scale shape: one pass to collect 2k scalar min/max bounds, one
  * projection computing the key (pure bit arithmetic — stays inside
  * WholeStageCodegen), and one `repartitionByRange` shuffle (range
  * boundaries from Spark's reservoir sampling, no driver
  * materialization). Rank normalization is linear min/max scaling;
  * heavily skewed columns should pre-map through equi-depth buckets
  * (`Quantiles`) — documented tradeoff, same as Delta's.
  */
object ZOrder {

  /** Bits per dimension: 16 for the common 2-column case (32-bit key),
    * 8 for 3-4 columns (24/32-bit key). Finer buckets buy nothing once
    * files are ~100 MB — the key only has to separate files.
    */
  def bitsPerDim(k: Int): Int = if (k == 2) 16 else 8

  /** Spread the low 16 bits of `x` so bit i lands at bit 2i — the
    * classic magic-mask bit twiddle (public domain "Interleave bits by
    * Binary Magic Numbers"), expressed as Spark bitwise ops so it
    * whole-stage-codegens.
    */
  private[operators] def spreadBits(x: Column): Column = {
    val masks = Seq(
      8 -> lit(0x00FF00FFL),
      4 -> lit(0x0F0F0F0FL),
      2 -> lit(0x33333333L),
      1 -> lit(0x55555555L))
    masks.foldLeft(x.cast("long")) { case (acc, (shift, mask)) =>
      (acc.bitwiseOR(shiftleft(acc, shift))).bitwiseAND(mask)
    }
  }

  /** Reference implementation for the spec (bit-for-bit the same
    * algorithm, driver-side).
    */
  private[operators] def spreadBitsRef(x: Long): Long = {
    var v = x
    v = (v | (v << 8)) & 0x00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0FL
    v = (v | (v << 2)) & 0x33333333L
    v = (v | (v << 1)) & 0x55555555L
    v
  }

  /** Morton key of up to 4 numeric columns: each value is linearly
    * scaled to a `bitsPerDim(k)`-bit bucket over its [min, max] (bounds
    * collected once — 2k scalars to the driver), then the buckets' bits
    * are interleaved, dimension d owning bits d, d+k, d+2k, ...
    * k=2 uses the magic-mask spread (4 ops); k=3/4 an explicit per-bit
    * fold (the masks only spread 16-bit inputs to stride 2, so they
    * don't compose for wider strides). Either way the key is pure
    * integer arithmetic inside one codegen'd projection.
    */
  def mortonKey(df: DataFrame, cols: Seq[String]): Column = {
    require(cols.size >= 2 && cols.size <= 4,
      s"z-ordering needs 2-4 columns, got ${cols.size}")
    val bounds = df.select(
      cols.flatMap(c =>
        Seq(min(col(c).cast("double")).as(s"min_$c"),
          max(col(c).cast("double")).as(s"max_$c"))): _*)
      .head()
    // empty input (or an all-NULL / non-castable column) leaves the
    // min/max aggregates NULL — fail with the actual cause instead of a
    // NullPointerException from getDouble deep inside zorderWrite
    cols.zipWithIndex.foreach { case (c, d) =>
      require(!bounds.isNullAt(2 * d) && !bounds.isNullAt(2 * d + 1),
        s"z-order column '$c' has no numeric min/max — input is empty " +
          "or the column is entirely NULL")
    }
    val k = cols.size
    val bits = bitsPerDim(k)
    val maxBucket = (1 << bits) - 1
    val parts = cols.zipWithIndex.map { case (c, d) =>
      val lo = bounds.getDouble(2 * d)
      val hi = bounds.getDouble(2 * d + 1)
      val span = if (hi > lo) hi - lo else 1.0
      val bucket = least(lit(maxBucket.toLong),
        greatest(lit(0L),
          (((col(c).cast("double") - lit(lo)) / lit(span)) * lit(maxBucket))
            .cast("long")))
      val spread =
        if (k == 2) spreadBits(bucket)
        else (0 until bits).map { i =>
          shiftleft(shiftright(bucket, i).bitwiseAND(lit(1L)), i * k)
        }.reduce(_.bitwiseOR(_))
      shiftleft(spread, d)
    }
    parts.reduce(_.bitwiseOR(_)).as("__zkey")
  }

  /** Rewrite `df` z-ordered on `cols` into ~`nFiles` parquet files,
    * each covering a contiguous Morton range (= a tight bounding box in
    * every clustered dimension). Returns the written file count.
    */
  def zorderWrite(
      df: DataFrame,
      cols: Seq[String],
      path: String,
      nFiles: Int): Int = {
    val spark = df.sparkSession
    df.withColumn("__zkey", mortonKey(df, cols))
      .repartitionByRange(math.max(1, nFiles), col("__zkey"))
      .sortWithinPartitions("__zkey")
      .drop("__zkey")
      .write.mode(SaveMode.Overwrite).parquet(path)
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .listStatus(p).count(_.getPath.getName.endsWith(".parquet"))
  }

  /** Per-file [min, max] of `c` across the parquet files at `path` —
    * what a stats-pruning scan consults. File names are returned as
    * scheme-less absolute paths (identical from both code paths below,
    * so a bounds map keyed by file keeps matching when the source of
    * bounds changes).
    *
    * Read from the parquet FOOTER statistics (row-group column-chunk
    * min/max) when the physical type carries directly-numeric stats
    * (int/long/float/double): this is exactly the metadata a pruning
    * reader (or a lakehouse manifest) serves, so the spec's skip
    * measurement audits the real pruning inputs at zero data-read
    * cost. Chunks PROVABLY all-NULL for `c` (numNulls == row count)
    * are skipped, and a file whose every chunk is NULL-only is omitted
    * (a stats-pruning reader skips it for any non-null predicate);
    * chunks with stats merely ABSENT (writer disabled them, truncated
    * binary stats) are NOT assumed null — they route the whole
    * directory to [[scanBounds]] so bounds are never silently narrowed.
    * Columns whose footer stats do not carry the value's own scale —
    * DECIMAL (unscaled ints), TIMESTAMP (micros vs the double cast's
    * seconds), BINARY — also fall back to [[scanBounds]], which
    * answers in [[mortonKey]]'s cast-to-double value space. Caveats,
    * matching mortonKey's own domain: DATE is not double-castable in
    * Spark (both APIs reject it with a clear analysis error), and
    * NANOS-physical timestamp files (this repo's `events` table —
    * CLAUDE.md) must be normalized through `Tables.events` before any
    * layout op, since a raw read of them throws.
    */
  def fileBounds(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      c: String): Seq[(String, Double, Double)] = {
    import scala.jdk.CollectionConverters._
    val conf = spark.sparkContext.hadoopConfiguration
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(conf)
    def toD(v: Any): Option[Double] = v match {
      case d: java.lang.Double  => Some(d.doubleValue)
      case f: java.lang.Float   => Some(f.toDouble)
      case l: java.lang.Long    => Some(l.toDouble)
      case i: java.lang.Integer => Some(i.toDouble)
      case _                    => None
    }
    // per file: None = footer unusable (fall back to the value scan for
    // the whole directory, keeping one consistent source of bounds);
    // Some(None) = file is provably NULL-only for c (skip);
    // Some(Some(b)) = bounds
    val perFile = fs.listStatus(dir)
      .filter(_.getPath.getName.endsWith(".parquet")).toSeq
      .map { st =>
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile
            .fromPath(st.getPath, conf))
        try {
          // (rowCount, chunk) pairs — the block's row count is what
          // lets an empty-stats chunk prove it is all-NULL
          val chunks = reader.getFooter.getBlocks.asScala.toSeq
            .flatMap(b => b.getColumns.asScala
              .filter(_.getPath.toDotString == c)
              .map(m => (b.getRowCount, m)))
          // DECIMAL stats are UNSCALED ints/binaries and
          // DATE/TIMESTAMP stats are days/micros — numeric-LOOKING but
          // off by the logical type's scale vs the value semantics the
          // caller compares against; route them to the value scan
          import org.apache.parquet.schema.LogicalTypeAnnotation
          val scaledLogicalType = chunks.exists { case (_, m) =>
            Option(m.getPrimitiveType.getLogicalTypeAnnotation).exists {
              case _: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation   => true
              case _: LogicalTypeAnnotation.DateLogicalTypeAnnotation      => true
              case _: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation => true
              case _: LogicalTypeAnnotation.TimeLogicalTypeAnnotation      => true
              // unsigned ints store two's-complement bit patterns: a
              // foreign-written UINT32/64 footer read as signed would
              // report negative bounds that disagree with the
              // cast-to-double value space — scan instead
              case i: LogicalTypeAnnotation.IntLogicalTypeAnnotation       => !i.isSigned
              case _                                                      => false
            }
          }
          if (chunks.isEmpty || scaledLogicalType) None
          else {
            // per chunk: None = stats unusable -> fallback;
            // Some(None) = provably all-NULL -> skip chunk;
            // Some(Some((mn, mx))) = numeric bounds
            val classified = chunks.map { case (rows, m) =>
              val s = m.getStatistics
              if (s == null) None
              else if (s.hasNonNullValue)
                (toD(s.genericGetMin), toD(s.genericGetMax)) match {
                  case (Some(mn), Some(mx)) => Some(Some((mn, mx)))
                  case _                    => None
                }
              else if (s.isNumNullsSet && s.getNumNulls == rows) Some(None)
              else None // stats present but empty and NOT provably null
            }
            if (classified.contains(None)) None
            else {
              val vals = classified.flatten.flatten
              if (vals.isEmpty) Some(None)
              else Some(Some((st.getPath.toUri.getPath,
                vals.map(_._1).min, vals.map(_._2).max)))
            }
          }
        } finally reader.close()
      }
    if (perFile.contains(None)) scanBounds(spark, path, c)
    else perFile.flatten.flatten
  }

  /** Value-scan fallback for [[fileBounds]]: min/max of `c` cast to
    * double, grouped by file. One data read of a single column; files
    * with no non-null value are omitted and names are normalized to
    * scheme-less absolute paths, matching the footer path.
    */
  private def scanBounds(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      c: String): Seq[(String, Double, Double)] =
    spark.read.parquet(path)
      .select(input_file_name().as("__f"), col(c).cast("double").as("__v"))
      .filter(col("__v").isNotNull)
      .groupBy("__f")
      .agg(min("__v").as("mn"), max("__v").as("mx"))
      .collect().toSeq
      .map(r => (new java.net.URI(r.getString(0)).getPath,
        r.getDouble(1), r.getDouble(2)))
}
