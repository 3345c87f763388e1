package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The partitioned-sink scale story: a filter on the partition column
  * must prune at FILE LISTING time (PartitionFilters on the scan), not
  * read everything and filter rows — at 100 TB that is reading 1/N-th
  * of the files.
  */
class PartitionPruneSpec extends SparkSpec {

  test("filter on the partition column becomes a PartitionFilter, pruning files") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-part").toString
    (1L to 100L).map(i => (i, if (i % 2 == 0) "en" else "de"))
      .toDF("id", "lang")
      .write.mode("overwrite").partitionBy("lang").parquet(dir)

    val q = spark.read.parquet(dir).filter(col("lang") === "en")
    assert(q.count() == 50)
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters"), scan)
    // the partition predicate must appear in PartitionFilters, and the
    // scan must carry no residual data filter on lang
    assert("PartitionFilters: \\[[^\\]]*lang".r.findFirstIn(scan).isDefined, scan)
    // file-level proof: of the two lang partitions only one is selected
    val scans = q.queryExecution.executedPlan.collectLeaves()
      .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
    assert(scans.nonEmpty)
    assert(scans.map(_.selectedPartitions.partitionCount).sum == 1, scan)
  }
}
