package graft

import org.apache.spark.storage.StorageLevel
import graft.operators.Similarity

/** The Lloyd loop frees intermediate rounds' localCheckpoint blocks via a
  * LogicalRDD pattern-match — this spec proves that match actually fires
  * on a checkpointed frame (a silent no-op would be an invisible executor
  * memory leak at every round) and stays a no-op on ordinary plans. */
class CheckpointHygieneSpec extends SparkSuite {

  test("freeLocalCheckpoint releases a checkpointed frame's storage") {
    val df = spark.range(100).toDF("x").localCheckpoint(true)
    val rdd = df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
      case other => fail(s"localCheckpoint did not analyze to LogicalRDD: $other")
    }
    assert(rdd.getStorageLevel != StorageLevel.NONE,
      "an eager localCheckpoint must hold persisted blocks")
    Similarity.freeLocalCheckpoint(df)
    assert(rdd.getStorageLevel == StorageLevel.NONE,
      "freeLocalCheckpoint must unpersist the checkpointed RDD")
  }

  test("freeLocalCheckpoint is a no-op on non-checkpointed plans") {
    // the round-0 seed takes this path every training run
    Similarity.freeLocalCheckpoint(spark.range(10).toDF("x"))
  }
}
