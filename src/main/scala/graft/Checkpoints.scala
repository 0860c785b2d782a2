package graft

import org.apache.spark.sql.DataFrame

/** Lineage truncation for iterative loops (Lloyd k-means, PQ, BPE, the two
  * connected-components loops), with a durability switch.
  *
  * Default tier: `localCheckpoint` — executor-block-backed, the cheapest
  * way to make round N plan a constant-size DAG instead of re-optimizing
  * rounds 1..N-1. Its blocks are NOT replicated: on a real cluster,
  * executor loss or dynamic-allocation scale-in makes a lost round
  * unrecoverable and fails the whole training job.
  *
  * Cluster tier: set `graft.checkpoint.reliable=true` in the session conf
  * AND call `sparkContext.setCheckpointDir(<fault-tolerant FS path>)`;
  * every loop site then writes reliable `checkpoint()` files instead —
  * they survive executor churn, at the cost of one FS round-trip per
  * round (the checkpointed frames are K·dim / winner-row / edge-set
  * sized, so the write is small even when the corpus is 100 TB).
  * Outputs are byte-identical between tiers (ReliableCheckpointSpec
  * proves it for a full Lloyd training); only durability changes.
  *
  * Reliable-checkpoint files accumulate under the checkpoint dir for the
  * session's lifetime; set `spark.cleaner.referenceTracking.cleanCheckpoints=true`
  * to have the ContextCleaner reap files whose RDDs are GC'd.
  */
object Checkpoints {
  val ReliableFlag = "graft.checkpoint.reliable"

  private def reliable(df: DataFrame): Boolean =
    df.sparkSession.conf.getOption(ReliableFlag).exists(_.toBoolean)

  /** Truncate `df`'s lineage at the tier the session conf selects.
    * `eager` has the same meaning as in Dataset.{local,}checkpoint:
    * lazy sites rely on the next action (a convergence checksum) to
    * materialize the round in the same job. */
  def truncate(df: DataFrame, eager: Boolean = true): DataFrame =
    if (reliable(df)) {
      require(df.sparkSession.sparkContext.getCheckpointDir.isDefined,
        s"$ReliableFlag=true needs sparkContext.setCheckpointDir(...) " +
          "pointing at a fault-tolerant filesystem")
      df.checkpoint(eager)
    } else df.localCheckpoint(eager)

  /** `.truncateLineage(eager)` sugar so loop sites read like the
    * `.localCheckpoint(eager)` calls they replace. */
  implicit final class LineageOps(private val df: DataFrame) extends AnyVal {
    def truncateLineage(eager: Boolean = true): DataFrame =
      Checkpoints.truncate(df, eager)
  }
}
