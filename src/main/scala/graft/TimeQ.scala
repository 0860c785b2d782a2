package graft
import org.apache.spark.sql.SparkSession
object TimeQ {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions).getOrCreate()
    graft.model.Tables.bootstrap(spark)
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    args.foreach { q => SparkEntry.queries(q)(spark, "/root/testdata/sf0.001").count() } // warm
    args.foreach { q =>
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, sf).count()
      val t1 = System.nanoTime()
      SparkEntry.queries(q)(spark, sf).count()
      val t2 = System.nanoTime()
      println(f"$q: pass1=${(t1-t0)/1e9}%.2f pass2=${(t2-t1)/1e9}%.2f")
    }
    spark.stop()
  }
}
