package graft.operators

import java.nio.file.Files

import graft.SparkSpec
import graft.core.Tables

class PartitionedWriteSpec extends SparkSpec {
  import spark.implicits._

  test("partitionBy publish prunes partitions for matching predicates") {
    val dir = Files.createTempDirectory("graft-part").toString
    val events = Tables.events(spark, sfDir)
    PartitionedWrite.publishEvents(events, dir)

    val pruned = PartitionedWrite.readEvents(spark, dir)
      .filter($"event_type" === "error" && $"event_date" === "2024-01-05")
    val scan = pruned.queryExecution.executedPlan.toString

    // the scan must carry partition filters, and the matched row count
    // must equal the unpartitioned filter result
    assert(scan.contains("PartitionFilters") &&
      (scan.contains("isnotnull(event_type") || scan.contains("event_type#")),
      s"expected partition filters in scan:\n$scan")
    val expected = events
      .filter($"event_type" === "error" &&
        org.apache.spark.sql.functions.to_date($"ts") === "2024-01-05")
      .count()
    assert(pruned.count() == expected)
    assert(expected > 0)

    // pruning is physical: only the matching leaf directory is listed
    val matchedFiles = pruned.queryExecution.executedPlan.collectLeaves()
      .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.relation.location.inputFiles.count(p =>
          p.contains("event_date=2024-01-05") && p.contains("event_type=error"))
      }
    assert(matchedFiles.nonEmpty)
  }
}
