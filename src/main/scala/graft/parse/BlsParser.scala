package graft.parse

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType}

/** Parser for the BLS `pr.data.0.Current` whitespace-delimited
  * time-series text file into the canonical `bls` schema
  * `(series_id string, year int, period string, value double)`.
  *
  * Semantics (reference: 20_analytics.ipynb:335-359):
  *  - blank lines dropped via `length(trim(line)) > 0`;
  *  - each line split on `\s+`, tokens 0..3 kept — the optional 5th
  *    `footnote_codes` column is dropped silently;
  *  - `year` via try_cast to int: the header line's literal "year"
  *    token becomes null and the 4-way not-null gate removes the row
  *    (there is deliberately no skip-header option);
  *  - `value` via try_cast to double (the reference uses a plain cast;
  *    try_cast keeps identical observable behavior under Spark 4 ANSI
  *    mode — SURVEY.md §7.4.1).
  *
  * The whole parse is a single codegen'd Filter+Project over the text
  * scan: no shuffle, scales linearly with input bytes.
  */
object BlsParser {

  /** Parse from a raw single-column text DataFrame (`value` string). */
  def parse(raw: DataFrame): DataFrame = {
    val toks = split(trim(col("value")), "\\s+")
    // `get` (not getItem): under Spark 4 ANSI mode getItem throws
    // INVALID_ARRAY_INDEX on lines with <4 tokens; the reference's
    // non-ANSI PySpark yielded null and the not-null gate dropped the
    // row — get() preserves that observable behavior.
    raw
      .where(length(trim(col("value"))) > 0)
      .select(
        get(toks, lit(0)).as("series_id"),
        get(toks, lit(1)).try_cast(IntegerType).as("year"),
        get(toks, lit(2)).as("period"),
        get(toks, lit(3)).try_cast(DoubleType).as("value"))
      .where(
        col("series_id").isNotNull && col("year").isNotNull &&
          col("period").isNotNull && col("value").isNotNull)
  }

  /** Parse straight from a file path (S1 text scan). */
  def parseFile(spark: SparkSession, path: String): DataFrame =
    parse(spark.read.text(path))
}
