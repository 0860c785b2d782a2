package graft

import graft.operators.Similarity

/** The `graft.checkpoint.reliable` escape hatch: on a real cluster,
  * executor-local checkpoint blocks die with their executor, so the
  * iterative loops (Lloyd, PQ, BPE, CC) would fail training on any churn.
  * The flag swaps every loop site to HDFS-backed `checkpoint()` via
  * Checkpoints.truncate. This spec proves (a) the reliable tier really
  * produces a reliably-checkpointed RDD, (b) a full Lloyd training run
  * under the flag yields byte-identical centroids AND assignments to the
  * local-checkpoint path, and (c) the flag without a checkpoint dir fails
  * fast with an actionable message instead of deep in round 1. */
class ReliableCheckpointSpec extends SparkSuite {

  private def withReliable[T](body: => T): T = {
    val dir = java.nio.file.Files.createTempDirectory("graft-reliable-ckpt")
    spark.sparkContext.setCheckpointDir(dir.toString)
    spark.conf.set(Checkpoints.ReliableFlag, "true")
    try body
    finally {
      spark.conf.unset(Checkpoints.ReliableFlag)
      try {
        import java.nio.file.{Files => F}
        F.walk(dir).sorted(java.util.Comparator.reverseOrder())
          .forEach(p => { F.deleteIfExists(p); () })
      } catch { case _: Exception => () }
    }
  }

  // registered FIRST: the later tests set a session checkpoint dir (the
  // session is suite-shared and there is no unset), which would skip this
  test("flag without a checkpoint dir fails fast and actionably") {
    if (spark.sparkContext.getCheckpointDir.isEmpty) {
      spark.conf.set(Checkpoints.ReliableFlag, "true")
      try {
        val e = intercept[IllegalArgumentException] {
          Checkpoints.truncate(spark.range(10).toDF("x"))
        }
        assert(e.getMessage.contains("setCheckpointDir"))
      } finally spark.conf.unset(Checkpoints.ReliableFlag)
    }
  }

  test("truncate under the flag yields a RELIABLY checkpointed RDD") {
    withReliable {
      val df = Checkpoints.truncate(spark.range(100).toDF("x"))
      val rdd = df.queryExecution.analyzed match {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
        case other => fail(s"checkpoint did not analyze to LogicalRDD: $other")
      }
      assert(rdd.toDebugString.contains("ReliableCheckpoint") ||
          rdd.getCheckpointFile.isDefined,
        s"expected a reliable checkpoint in the lineage:\n${rdd.toDebugString}")
    }
  }

  test("Lloyd training is byte-identical across checkpoint tiers") {
    def train(): (Seq[String], Seq[String]) = {
      Similarity.clearKmeansCache()
      val cents = Similarity.kmeansCentroids(spark, sf0001)
        .collect().map(_.toString).toSeq.sorted
      val asg = Similarity.kmeansAssignment(spark, sf0001)
        .collect().map(_.toString).toSeq.sorted
      (cents, asg)
    }
    val (centLocal, asgLocal) = train()
    val (centRel, asgRel) = withReliable {
      val out = train()
      // the trained centroid frame itself must sit on the reliable tier
      val lr = Similarity.kmeansCentroids(spark, sf0001)
        .queryExecution.analyzed
        .collectFirst { case l: org.apache.spark.sql.execution.LogicalRDD => l }
      assert(lr.exists(l => l.rdd.toDebugString.contains("ReliableCheckpoint")
          || l.rdd.getCheckpointFile.isDefined),
        "flagged training did not produce a reliably checkpointed model")
      out
    }
    // retrain once more so the session-shared cache doesn't hold frames
    // backed by the checkpoint dir this spec deletes on exit
    Similarity.clearKmeansCache()
    assert(centRel == centLocal, "centroids differ across checkpoint tiers")
    assert(asgRel == asgLocal, "assignments differ across checkpoint tiers")
  }
}
