package graft.operators

import org.apache.spark.sql.DataFrame

/** Lineage truncation for iterative operators (connected components,
  * SemDeDup, k-means assignment, n-gram verify): each pass references
  * the previous pass's result more than once, so WITHOUT truncation the
  * logical plan doubles per pass (2^k nodes by pass k).
  *
  * Two mechanisms, selected by the `graft.checkpoint.dir` session conf:
  *
  *  - unset (default): `localCheckpoint(eager = true)` — executor-
  *    storage backed, zero configuration, ideal for local[*] and
  *    single-JVM benchmarks. NOT fault-tolerant: an executor loss
  *    mid-iteration kills the job, which is fine when driver and
  *    executors share one process.
  *  - set to an HDFS/S3/posix path: reliable `checkpoint(eager = true)`
  *    — blocks are written to the checkpoint directory and survive any
  *    executor loss. This is the cluster-grade mode for long CC /
  *    clustering runs on real deployments (a 1000-executor job WILL
  *    lose executors). Checkpoint files are reclaimed on JVM exit when
  *    `spark.cleaner.referenceTracking.cleanCheckpoints=true`, or by
  *    deleting the directory after the job.
  *
  * Superseded localCheckpoint blocks are reclaimed by the
  * ContextCleaner once the previous pass's DataFrame is unreferenced.
  */
object Lineage {
  // last dir this object applied to the SparkContext: a session that
  // re-points graft.checkpoint.dir mid-run must not keep writing to
  // the stale first directory (setCheckpointDir appends a UUID subdir,
  // so the conf value can't be compared against getCheckpointDir)
  @volatile private var appliedDir: String = null

  def truncate(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption("graft.checkpoint.dir") match {
      case Some(dir) if dir.nonEmpty =>
        if (appliedDir != dir) synchronized {
          spark.sparkContext.setCheckpointDir(dir)
          appliedDir = dir
        }
        df.checkpoint(eager = true)
      case _ => df.localCheckpoint(eager = true)
    }
  }
}
