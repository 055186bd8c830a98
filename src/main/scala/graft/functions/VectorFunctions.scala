package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` embedding columns. The hot
  * path (`dot`, `cosineSimilarity`) runs on the native codegen'd
  * `DotProductF` kernel — Spark's higher-order array functions
  * (zip_with/aggregate) evaluate interpreted per element, which
  * dominates O(pairs) similarity joins. Both forms accumulate in
  * double, left-to-right, so they are bit-identical to each other and
  * to the DuckDB oracle's `list_dot_product` on DOUBLE[].
  */
object VectorFunctions {

  /** Dot product (native codegen'd kernel). */
  def dot(a: Column, b: Column): Column = exprs.dot_f(a, b)

  /** Euclidean norm. */
  def l2Norm(v: Column): Column = sqrt(dot(v, v))

  /** Cosine similarity in double precision. try_divide: a zero-norm
    * vector yields NULL (matching the oracle engine's x/0) rather than
    * an IEEE NaN.
    */
  def cosineSimilarity(a: Column, b: Column): Column =
    try_divide(dot(a, b), l2Norm(a) * l2Norm(b))

  /** Reference implementation via built-in higher-order functions —
    * kept for cross-checking the native kernel in tests.
    */
  def dotFold(a: Column, b: Column): Column =
    aggregate(
      zip_with(
        transform(a, x => x.cast("double")),
        transform(b, x => x.cast("double")),
        (x, y) => x * y),
      lit(0.0),
      (acc, v) => acc + v)
}
