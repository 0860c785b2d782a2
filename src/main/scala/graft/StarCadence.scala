package graft

import org.apache.spark.sql.SparkSession

/** Measurement harness for the `graft.star.checkpointEvery` cadence knob
  * (VERDICT r8 item 7): times `d_dup_clusters_star` end-to-end at a given
  * SF under cadence 1 (checkpoint every round — the default) and cadence 2
  * (every other round), N runs each, with the shared pair artifacts built
  * once up front so the loop itself — not the candidate build — is what
  * the numbers compare. Prints one JSON line per (cadence, run) plus a
  * min/median summary per cadence.
  *
  * Run: `sbt "runMain graft.StarCadence [sfDir] [runs]"`. */
object StarCadence {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    graft.model.Tables.bootstrap(spark)
    spark.sparkContext.setLogLevel("WARN")

    // shared pair list built once: both cadences consume the same persisted
    // artifact, so runs time the CC loop + final rollup only
    graft.operators.Dedup.ngramJaccard(spark, sfDir).count()
    // JIT/codegen warmup through the same code path
    graft.operators.Dedup.dupClustersStar(spark, sfDir).count()

    def timed(): Double = {
      val t0 = System.nanoTime()
      graft.operators.Dedup.dupClustersStar(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }
    val results = Seq(1, 2).map { cadence =>
      spark.conf.set("graft.star.checkpointEvery", cadence.toString)
      val ts = (1 to runs).map { i =>
        val t = timed()
        println(f"""{"cadence":$cadence,"run":$i,"sec":$t%.3f}""")
        t
      }.sorted
      val summary = (cadence, ts.head, ts(ts.size / 2), ts.last)
      summary
    }
    results.foreach { case (c, mn, med, mx) =>
      println(f"""{"cadence":$c,"min":$mn%.3f,"median":$med%.3f,"max":$mx%.3f}""")
    }
    spark.conf.set("graft.star.checkpointEvery", "1")
    spark.stop()
  }
}
