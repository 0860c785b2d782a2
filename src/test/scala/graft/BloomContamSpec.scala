package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.model.Tables
import graft.plans.GraftFunctions

/** The bloom-pruned contamination semi-join: the sketch must change the
  * plan (massive row-local prune before the exchange), never the answer
  * (exact verify behind it), and the sketch itself must be deterministic
  * and merge-order-invariant (it OR-merges per-partition blooms). */
class BloomContamSpec extends SparkSuite {

  private def shingleHashes = {
    val hashed = expr(
      "transform(" + shinglesSql("t", 4) +
        ", x -> CAST(conv(substring(md5(x), 1, 15), 16, 10) AS BIGINT))")
    Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("source"), tokens(col("text")).as("t"))
      .select(col("doc_id"), col("source"), explode(hashed).as("h"))
  }

  test("doc-level results agree with the unpruned exact semi-join") {
    val bloom = graft.operators.Dedup.bloomContamination(spark, sf0001)
      .select("source", "n_docs", "n_contaminated", "rate")
      .collect().map(_.toString).sorted.toSeq
    val exact = graft.operators.Dedup.contamination(spark, sf0001)
      .collect().map(_.toString).sorted.toSeq
    assert(bloom.nonEmpty)
    assert(bloom == exact)
  }

  test("the bloom prune kills most non-benchmark shingles row-locally") {
    val sh = shingleHashes
    val bench = sh.filter(col("source") === "src0").select("h").distinct()
    val bf = bench.stat.bloomFilter("h", math.max(bench.count(), 1L), 0.01)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    val train = sh.filter(col("source") =!= "src0")
    val total = train.count()
    val survivors = train
      .filter(GraftFunctions.bloomMightContain(bos.toByteArray, col("h")))
      .count()
    val trueHits = train.join(bench, Seq("h"), "left_semi").count()
    // no false negatives, and the prune must be doing real work: the
    // surviving fraction is the true-hit rate plus ~fpp of the rest
    assert(survivors >= trueHits, "bloom filters never drop true members")
    assert(survivors < total / 2,
      s"prune too weak: $survivors of $total shingles survive")
  }

  test("the sketch is deterministic and partitioning-invariant") {
    val sh = shingleHashes
    val bench = sh.filter(col("source") === "src0").select("h").distinct()
    val n = math.max(bench.count(), 1L)
    def bits(parts: Int): Array[Byte] = {
      val bf = bench.repartition(parts).stat.bloomFilter("h", n, 0.01)
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos)
      bos.toByteArray
    }
    assert(java.util.Arrays.equals(bits(1), bits(7)),
      "per-partition bloom OR-merge must be partitioning-invariant")
  }
}
