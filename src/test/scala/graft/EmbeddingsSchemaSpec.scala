package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType}

/** The events-ts lesson applied to the embeddings table: `Tables.embeddings`
  * must surface ONE canonical element type (`array<float>`) whatever the
  * parquet says, because the codegen `cosine_sim` declares float inputs and
  * a silent array-of-double drift would implicit-downcast on the Spark side
  * while DuckDB oracles computed from raw doubles — rounded-6 hash
  * mismatches across the similarity family instead of one loud failure. */
class EmbeddingsSchemaSpec extends SparkSuite {

  private val vecs: Seq[(Long, Seq[Double], String)] = (0L until 60L).map { i =>
    (i, (0 until 64).map(j => math.sin(i * 64 + j + 1).toDouble), s"l${i % 3}")
  }

  private def write(dir: java.nio.file.Path, asDouble: Boolean): Unit = {
    val s = spark
    import s.implicits._
    val df = vecs.toDF("vec_id", "embedding", "label")
    val typed =
      if (asDouble) df
      else df.withColumn("embedding", col("embedding").cast(ArrayType(FloatType)))
    typed.coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
  }

  private def dir(): java.nio.file.Path = {
    val d = java.nio.file.Files.createTempDirectory("graft-emb-schema")
    d.toFile.deleteOnExit()
    d
  }

  test("array<double> parquet normalizes to the canonical array<float>") {
    val d = dir()
    write(d, asDouble = true)
    val df = graft.model.Tables.embeddings(spark, d.toString)
    df.schema("embedding").dataType match {
      case ArrayType(FloatType, _) => ()
      case other => fail(s"embedding surfaced as $other, not array<float>")
    }
    assert(df.count() == 60)
  }

  test("double-written and float-written corpora rank identically") {
    // the contract is FLOAT precision on both engines: a double store must
    // yield the exact result the float store yields, so the existing
    // float-era oracles stay valid under a storage drift
    val dd = dir(); val df = dir()
    write(dd, asDouble = true)
    write(df, asDouble = false)
    def topk(p: java.nio.file.Path): Seq[String] =
      SparkEntry.queries("s_cosine_topk")(spark, p.toString)
        .collect().map(_.toString).sorted.toSeq
    val fromDouble = topk(dd)
    assert(fromDouble == topk(df))
    assert(fromDouble.nonEmpty)
  }
}
