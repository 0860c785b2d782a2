package graft

import org.apache.spark.sql.SparkSession

/** Variance-pinning harness for the connected-components family (VERDICT
  * r9 item 6): times `d_dup_clusters` (min-label) and
  * `d_dup_clusters_star` (star contraction) N times each at one SF with
  * the shared pair artifacts pre-built and JIT warmed — so the runs time
  * the CC loop + rollup only — and prints per-run seconds plus
  * mean ± sample-sd per query. The mean±sd across sf0.1 and sf1 is what
  * BENCH_NOTES records as the family's acceptance bounds (the r8→r9
  * 0.99→1.21 s "regression" question: drift or noise).
  *
  * Run: `sbt "runMain graft.CCVariance [sfDir] [runs]"`. */
object CCVariance {
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

    // shared pair list built once; both queries consume the same artifact
    graft.operators.Dedup.ngramJaccard(spark, sfDir).count()
    val queries = Seq[(String, SparkSession => Long)](
      "d_dup_clusters" ->
        (s => graft.operators.Dedup.dupClusters(s, sfDir).count()),
      "d_dup_clusters_star" ->
        (s => graft.operators.Dedup.dupClustersStar(s, sfDir).count()))
    // JIT/codegen warmup through both code paths
    queries.foreach { case (_, f) => f(spark) }

    queries.foreach { case (name, f) =>
      val ts = (1 to runs).map { i =>
        val t0 = System.nanoTime()
        f(spark)
        val t = (System.nanoTime() - t0) / 1e9
        println(f"""{"query":"$name","run":$i,"sec":$t%.3f}""")
        t
      }
      val mean = ts.sum / ts.size
      val sd =
        if (ts.size < 2) 0.0
        else math.sqrt(
          ts.map(t => (t - mean) * (t - mean)).sum / (ts.size - 1))
      println(f"""{"query":"$name","dir":"$sfDir","runs":$runs,""" +
        f""""mean":$mean%.3f,"sd":$sd%.3f,"min":${ts.min}%.3f,""" +
        f""""max":${ts.max}%.3f}""")
    }
    spark.stop()
  }
}
