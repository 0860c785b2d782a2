package graft

import org.apache.spark.sql.functions._
import graft.operators.{Analytics, Similarity, TextAnalysis}
import graft.model.Tables

/** Invariants of the drift monitors and the SCD-2 join that the DuckDB
  * oracles cannot see: divergence bounds, the zero/one fixed points on
  * identical generations, and the exactly-one-version join contract. */
class DriftSpec extends SparkSuite {

  test("t_drift_js stays within the Jensen-Shannon bounds [0, ln 2]") {
    val rows = TextAnalysis.driftJs(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val js = r.getAs[Double]("js")
      assert(js >= 0.0 && js <= math.log(2.0) + 1e-9,
        s"source ${r.getAs[String]("source")}: js=$js out of [0, ln 2]")
    }
  }

  test("identical generations have zero text drift and unit centroid drift") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-drift-fixed")
    dir.toFile.deleteOnExit()
    val d = dir.toString
    // doc 2i and 2i+1 carry the SAME text: the parity halves are equal
    // corpora, so the smoothed LMs coincide exactly -> js = 0
    (0 until 40).map(i =>
        (i.toLong, s"alpha beta gamma word${i / 2}", "en", "src0", 20L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val js = TextAnalysis.driftJs(s, d).collect()
    assert(js.length == 1 && js.head.getAs[Double]("js") == 0.0,
      s"equal halves must read js=0, got ${js.toSeq}")
    // vec 2i and 2i+1 are the same vector: equal half centroids -> cos = 1
    (0 until 16).map { i =>
      val v = Array.tabulate(8)(j => (j + 1 + i / 2).toFloat)
      (i.toLong, v, i / 8)
    }.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    val cd = Similarity.centroidDrift(s, d).collect()
    assert(cd.length == 2)
    cd.foreach { r =>
      assert(r.getAs[Double]("centroid_cos") == 1.0,
        s"label ${r.get(0)}: equal halves must read cos=1, got $r")
      assert(r.getAs[Long]("n0") == 4 && r.getAs[Long]("n1") == 4)
    }
  }

  test("SCD-2 join matches every order to exactly one dimension version") {
    val joined = Analytics.scd2Join(spark, sf0001)
      .agg(sum(col("n_orders"))).head().getLong(0)
    val orders = Tables.orders(spark, sf0001).count()
    assert(joined == orders,
      s"SCD-2 join produced $joined rows for $orders orders — " +
        "a version gap or overlap in the validity intervals")
  }
}
