package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Sequence packing for pretraining data prep: greedily pack documents
  * into fixed token-capacity bins (training sequences) so batch slots
  * aren't wasted on padding. The classic next-fit policy: walk the
  * docs in a deterministic order, keep appending to the current bin
  * while it fits, open a new bin when it doesn't; an oversized doc
  * (> capacity) gets a bin of its own (downstream chunking splits it —
  * t07's job, not the packer's).
  *
  * Scale shape: docs are hash-bucketed (`pmod(doc_id, nBuckets)`), the
  * packing runs independently per bucket, and the implementation is the
  * canonical secondary-sort pattern — `repartition(bucket)` +
  * `sortWithinPartitions(bucket, doc_id)` + one `mapPartitions` pass
  * holding O(1) state (current bucket / bin / fill). No group is ever
  * materialized in memory, so a bucket can hold billions of docs; more
  * buckets = more parallelism, and the bucket column doubles as the
  * shard key of the emitted training files. Deterministic end to end:
  * same corpus → same bins, regardless of partitioning.
  */
object SeqPacking {

  /** Pack `(doc_id: Long, bucket: Long, tok: Long)` rows (pre-computed
    * token counts) into next-fit bins of `capacity` tokens per bucket.
    * Returns (doc_id, bucket, bin_id, tok); `bin_id` restarts at 1 per
    * bucket.
    */
  def packTokenCounts(toks: DataFrame, capacity: Long): DataFrame = {
    val spark = toks.sparkSession
    import spark.implicits._
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")
    toks.select($"doc_id".cast("long"), $"bucket".cast("long"), $"tok".cast("long"))
      .as[(Long, Long, Long)]
      .repartition($"bucket")
      .sortWithinPartitions($"bucket", $"doc_id")
      .mapPartitions { it =>
        // a partition holds whole buckets (hash partitioning), sorted
        // (bucket, doc_id) — O(1) state, reset on bucket change
        var curBucket = Long.MinValue
        var bin = 0L
        var fill = 0L
        it.map { case (docId, bucket, tok) =>
          if (bucket != curBucket) { curBucket = bucket; bin = 1L; fill = tok }
          else if (fill + tok <= capacity) { fill += tok }
          else { bin += 1L; fill = tok }
          (docId, bucket, bin, tok)
        }
      }
      .toDF("doc_id", "bucket", "bin_id", "tok")
  }

  /** Pack `(doc_id, bucket, ord, tok)` rows into next-fit bins of
    * `capacity` tokens, walking each bucket in `ord` order instead of
    * doc-id order — the face a training manifest needs when the walk
    * order is an epoch-shuffle position, not the storage id. Same
    * secondary-sort shape as [[packTokenCounts]] (repartition on
    * bucket, sortWithinPartitions, one O(1)-state pass); `ord` must be
    * unique within a bucket for the output to be deterministic.
    * Returns (doc_id, bucket, bin_id, tok); `bin_id` restarts at 1 per
    * bucket.
    */
  def packOrdered(toks: DataFrame, capacity: Long): DataFrame = {
    val spark = toks.sparkSession
    import spark.implicits._
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")
    toks.select($"doc_id".cast("long"), $"bucket".cast("long"),
        $"ord".cast("long"), $"tok".cast("long"))
      .as[(Long, Long, Long, Long)]
      .repartition($"bucket")
      .sortWithinPartitions($"bucket", $"ord")
      .mapPartitions { it =>
        var curBucket = Long.MinValue
        var bin = 0L
        var fill = 0L
        it.map { case (docId, bucket, _, tok) =>
          if (bucket != curBucket) { curBucket = bucket; bin = 1L; fill = tok }
          else if (fill + tok <= capacity) { fill += tok }
          else { bin += 1L; fill = tok }
          (docId, bucket, bin, tok)
        }
      }
      .toDF("doc_id", "bucket", "bin_id", "tok")
  }

  /** Pack a documents table by whitespace token count (the repo-wide
    * tokenization contract).
    */
  def packDocuments(
      docs: DataFrame,
      capacity: Long,
      nBuckets: Int,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    val toks = docs.select(
      col(idCol).cast("long").as("doc_id"),
      pmod(col(idCol), lit(nBuckets)).cast("long").as("bucket"),
      graft.functions.TextFunctions.tokenCount(col(textCol)).cast("long").as("tok"))
    packTokenCounts(toks, capacity)
  }
}
