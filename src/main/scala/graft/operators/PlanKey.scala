package graft.operators

import org.apache.spark.sql.DataFrame

/** Input-identity key for per-session memos ([[TextDedup]] signatures,
  * [[AnnIndex]] fitted models): canonicalized analyzed plan plus
  * per-leaf identity plus a digest of the concrete input files. The
  * canonicalized tree's STRING distinguishes different transforms but
  * elides what the leaves actually hold — a parquet relation prints
  * without its path (two SFs of one table look identical) and a
  * LocalRelation prints only its schema (two in-memory corpora look
  * identical) — so scan root paths and local-data hashes are appended
  * explicitly. The `inputFiles` digest invalidates a memo when the
  * data BEHIND an unchanged plan changes (files appended/compacted
  * under the same root path mid-session); parquet writers emit unique
  * part names, so any rewrite changes the digest. An unstable
  * stringification merely misses the memo and recomputes.
  */
private[operators] object PlanKey {

  def of(df: DataFrame, extras: String*): String = {
    val plan = df.queryExecution.analyzed
    val leaves = plan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation match {
          case f: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            f.location.rootPaths.mkString(",")
          case r => r.toString
        }
      // An RDD-backed leaf (a localCheckpoint'ed frame) has NO path and
      // NO inputFiles, and its canonicalized plan prints schema-only —
      // two DIFFERENT checkpointed corpora with the same schema would
      // otherwise collide on one memo key and silently serve each
      // other's signatures/models (found r20: the ladder's checkpointed
      // s1 collided with another suite's planted corpus in the shared
      // test session, flipping pipe02's cluster stage). The RDD id is
      // unique per materialized checkpoint in a session, so it IS the
      // content identity here; the cost is that two checkpoints of
      // identical content no longer share a memo entry — a recompute,
      // never a wrong answer.
      case r: org.apache.spark.sql.execution.LogicalRDD =>
        s"rdd:${r.rdd.id}"
      case loc: org.apache.spark.sql.catalyst.plans.logical.LocalRelation =>
        // full-content digest, not Seq.hashCode: a 32-bit hash collision
        // between two same-schema in-memory inputs would silently serve
        // a stale memo entry. UnsafeRow exposes its value bytes
        // directly; other InternalRows render every field
        val md = java.security.MessageDigest.getInstance("MD5")
        md.update(loc.output.map(a => s"${a.name}:${a.dataType}").mkString(",")
          .getBytes("UTF-8"))
        loc.data.foreach {
          case u: org.apache.spark.sql.catalyst.expressions.UnsafeRow =>
            md.update(u.getBytes)
          case r => md.update(r.toString.getBytes("UTF-8"))
        }
        s"local:${md.digest().map("%02x".format(_)).mkString}"
    }
    // driver-side file listing off the already-resolved FileIndex; at
    // cluster scale this is metadata-sized (file names, not data)
    val md = java.security.MessageDigest.getInstance("MD5")
    df.inputFiles.sorted.foreach(f => md.update(f.getBytes("UTF-8")))
    val filesDigest = md.digest().map("%02x".format(_)).mkString
    (Seq(s"${plan.canonicalized}", leaves.mkString(";"), filesDigest) ++ extras)
      .mkString("|")
  }
}
