package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** CPU-spreading repartition that AQE cannot silently collapse
  * (optimization round 10).
  *
  * Several operators repartition BEFORE a CPU-heavy per-row stage
  * (shingle+minhash UDAF, media decode UDFs, gram hashing) so the work
  * spreads across the cluster. A bare `repartition(col(...))` leaves
  * the partition count to AQE, and AQE's coalescing decision looks at
  * the SHUFFLE BYTES — a few KB of ids/text at gate scale — not the
  * downstream UDF cost, so it coalesces the exchange to one or two
  * partitions and serializes exactly the work the repartition exists
  * to spread (measured: the multimodal decode stage ran as 2 tasks of
  * ~700 ms on a 32-core local master).
  *
  * [[spread]] pins an explicit partition count instead:
  * max(defaultParallelism, input partition count) — never fewer
  * partitions than cores (the decode/shingle stage saturates the
  * machine at any scale), and never fewer than the upstream scan's
  * own parallelism, which at 100 TB is already byte-derived
  * (bytes / maxPartitionBytes splits), so big inputs keep byte-sized
  * partitions rather than cores-sized ones. An explicit count is
  * exempt from AQE coalescing by contract. (Plan-stats byte estimates
  * were rejected for this: non-scan plans — local relations,
  * checkpoints, object producers — default to Long.MaxValue and would
  * explode the count.) */
object Partitioning {

  def spread(df: DataFrame, by: Column*): DataFrame = {
    val cores = df.sparkSession.sparkContext.defaultParallelism
    // Input parallelism WITHOUT df.rdd (r10 advice): under AQE,
    // Dataset.rdd materializes every upstream shuffle stage eagerly
    // just to read a partition count, and the later repartition then
    // re-executes the same plan — double execution whenever the input
    // contains exchanges. Instead estimate from the leaves, which
    // covers every real call site (scans and checkpoints) and costs
    // only driver-side analysis:
    //  - file scans: bytes / maxPartitionBytes (the same byte-derived
    //    split count the scan itself will use, so 100 TB inputs keep
    //    byte-sized partitions rather than cores-sized ones);
    //  - checkpointed/RDD-backed leaves: the RDD's partition count
    //    (free — no execution).
    val inParts =
      try {
        val maxSplit = math.max(1L,
          df.sparkSession.sessionState.conf.filesMaxPartitionBytes)
        df.queryExecution.optimizedPlan.collectLeaves().map {
          case l: LogicalRelation => l.relation match {
            case fs: HadoopFsRelation =>
              (fs.location.sizeInBytes / maxSplit).toInt
            case _ => 0
          }
          case r: LogicalRDD => r.rdd.getNumPartitions
          case _ => 0
        }.sum
      } catch { case scala.util.control.NonFatal(_) => 0 }
    df.repartition(math.max(cores, inParts), by: _*)
  }
}
