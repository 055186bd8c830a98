package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` embedding columns, written
  * with codegen'd higher-order functions (zip_with/aggregate) — no
  * UDFs, no driver-side math. Products and sums run in double
  * precision (floats widen exactly) with a left-to-right fold, so the
  * DuckDB oracle (`list_dot_product` on DOUBLE[]) reproduces the same
  * values.
  */
object VectorFunctions {

  /** Elementwise cast to array<double>. */
  def toDoubleArray(v: Column): Column = transform(v, x => x.cast("double"))

  /** Dot product of two numeric array columns, accumulated in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(toDoubleArray(a), toDoubleArray(b), (x, y) => x * y),
      lit(0.0),
      (acc, v) => acc + v)

  /** Euclidean norm. */
  def l2Norm(v: Column): Column = sqrt(dot(v, v))

  /** Cosine similarity in double precision. */
  def cosineSimilarity(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))
}
