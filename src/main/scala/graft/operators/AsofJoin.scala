package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF (temporal / point-in-time) join: for every left row, the
  * single latest right row with the same key and `ts <= left.ts` —
  * the no-label-leakage feature join (join a label event to the
  * feature state as of that moment, never peeking forward).
  *
  * Spark has no ASOF join operator, and the naive encodings don't
  * scale: an inequality join plans BroadcastNestedLoop, and a bounded
  * pair join + window (q51's shape) materializes every (left × prior
  * right) pair. This is the distributed merge-asof: tag both sides,
  * UNION, one window partitioned by the join key ordered by
  * (ts, tag, tie) carrying the most recent right row forward with
  * `last(_, ignoreNulls)`, then keep the left rows. Exactly ONE
  * shuffle (on the key) and one sort for the whole join; nothing is
  * ever materialized per pair, so a key with a million right rows
  * costs a sort, not a quadratic blow-up. Skew axis = per-key row
  * count, the same axis as any keyed window.
  *
  * Semantics: `>=` inclusive — a right row at exactly left.ts matches
  * (right rows order strictly before the left row at equal ts). Ties
  * among right rows at the same (key, ts) resolve to the LARGEST
  * `rightTie` value. The carried right row rides one struct column,
  * so all its fields come from the SAME row even when a field is null.
  *
  * q56 runs this operator on purchases × clicks; the DuckDB oracle
  * pins its semantics against an independent native ASOF JOIN
  * implementation at four scale factors. `EventStreams.streamingAsof`
  * is the incremental face (watermark-bounded reorder buffer).
  *
  * @param left     probe side; all its columns survive
  * @param right    build side; its non-key, non-ts columns (plus the
  *                 matched right ts as `asof_ts`) come back inside a
  *                 nullable `asof` struct — null when no right row is
  *                 at-or-before the left row
  * @param keys     equi-key columns present on both sides
  * @param tsCol    event-time column name present on both sides
  * @param rightTie right column breaking (key, ts) ties (largest wins)
  */
object AsofJoin {
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      tsCol: String,
      rightTie: String): DataFrame = {
    // asof_ts is reserved too: a right payload named asof_ts (easy
    // when chaining two as-of joins) would duplicate the carried
    // struct's field and make `asof.asof_ts` ambiguous downstream
    val reserved = Seq("asof", "asof_ts", "__tag", "__ord", "__lrow", "__rrow")
    require(!(left.columns ++ right.columns).exists(reserved.contains),
      s"inputs may not carry the operator's reserved columns ${reserved.mkString(", ")}")
    val base = keys :+ tsCol
    val leftPayload = left.columns.filterNot(base.contains).toSeq
    val rightPayload = right.columns.filterNot(base.contains).toSeq
    val lrowCol = struct(leftPayload.map(col): _*)
    val rrowCol = struct(rightPayload.map(col) :+ col(tsCol).as("asof_ts"): _*)
    val lrowType = left.select(lrowCol.as("s")).schema("s").dataType
    val rrowType = right.select(rrowCol.as("s")).schema("s").dataType
    val ordType = right.schema(rightTie).dataType

    val l = left.select(base.map(col) ++ Seq(
      lit(1).as("__tag"), lit(null).cast(ordType).as("__ord"),
      lrowCol.as("__lrow"), lit(null).cast(rrowType).as("__rrow")): _*)
    val r = right.select(base.map(col) ++ Seq(
      lit(0).as("__tag"), col(rightTie).as("__ord"),
      lit(null).cast(lrowType).as("__lrow"), rrowCol.as("__rrow")): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("__tag").asc, col("__ord").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("asof", last(col("__rrow"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(base.map(col) ++
        leftPayload.map(p => col("__lrow").getField(p).as(p)) :+
        col("asof"): _*)
  }
}
