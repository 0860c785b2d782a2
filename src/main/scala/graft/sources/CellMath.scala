package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Coarse-quantizer math for the commit-log CELL clustering (E-167 —
  * `CommitLogIngest.optimizeClusterByCell`): a small k-means trained on a
  * bounded deterministic sample (the Faiss practice — IVF quantizers
  * train on a sample, never the corpus), then a pure-Column argmin
  * assignment that ships the centroids as literals so cell derivation is
  * codegen'd map-side work with zero shuffle and zero UDF.
  *
  * Scale shape: training is driver-side over ≤ [[SampleRows]] vectors
  * (k·dim floats of state); assignment is O(k·dim) arithmetic per row
  * inside whole-stage codegen. Determinism: the sample orders by a hash
  * of the vector id, Lloyd runs a fixed iteration count with means
  * rounded to 6 decimals per round — the same audit-stable-ids trick the
  * operator-layer k-means uses (`Similarity.kmeansTrainCompute`). */
object CellMath {

  val SampleRows = 4096
  val LloydIters = 5

  /** Train k centroids over `df`'s `embedCol` (array<float/double>) on a
    * deterministic sample keyed by `idCol`. Returns k rows of dim floats. */
  def trainCentroids(df: DataFrame, embedCol: String, idCol: String,
      k: Int): Array[Array[Double]] = {
    val sample = df
      .select(col(idCol).as("_id"), col(embedCol).cast("array<double>")
        .as("_v"))
      .filter(col("_v").isNotNull && size(col("_v")) > 0)
      .orderBy(xxhash64(col("_id")), col("_id"))
      .limit(SampleRows)
      .collect()
      .map(_.getSeq[Double](1).toArray)
    require(sample.nonEmpty,
      s"trainCentroids: no non-empty $embedCol vectors to train on")
    val dim = sample.head.length
    require(sample.forall(_.length == dim),
      s"trainCentroids: ragged $embedCol lengths (expected $dim)")
    require(k > 1 && k <= sample.length,
      s"trainCentroids: k=$k must be in (1, ${sample.length}]")
    def round6(x: Double) = math.rint(x * 1e6) / 1e6
    // init: k evenly-spaced sample rows (deterministic)
    var cents = Array.tabulate(k)(i => sample(i * sample.length / k).clone())
    (0 until LloydIters).foreach { _ =>
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Long](k)
      sample.foreach { v =>
        val c = nearest(cents, v)
        counts(c) += 1
        var i = 0
        while (i < dim) { sums(c)(i) += v(i); i += 1 }
      }
      cents = Array.tabulate(k)(c =>
        if (counts(c) == 0L) cents(c)
        else Array.tabulate(dim)(i => round6(sums(c)(i) / counts(c))))
    }
    cents
  }

  /** argmin over squared L2 — driver-side (training, probe selection). */
  def nearest(cents: Array[Array[Double]], v: Array[Double]): Int = {
    var best = 0; var bestD = Double.MaxValue; var c = 0
    while (c < cents.length) {
      var d = 0.0; var i = 0
      val cv = cents(c)
      while (i < v.length) { val t = v(i) - cv(i); d += t * t; i += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** The `nprobe` nearest cell ids to a query vector. */
  def probeCells(cents: Array[Array[Double]], q: Array[Double],
      nprobe: Int): Seq[Int] = {
    require(cents.nonEmpty, "probeCells: no trained centroids")
    require(q.length == cents.head.length,
      s"probeCells: query dim ${q.length} != trained dim " +
        s"${cents.head.length}")
    cents.indices.sortBy { c =>
      var d = 0.0; var i = 0
      while (i < q.length) { val t = q(i) - cents(c)(i); d += t * t; i += 1 }
      d
    }.take(math.max(1, nprobe))
  }

  /** Distributed cell assignment as a pure Column: squared-L2 against
    * each centroid via `aggregate`/`zip_with` over literal arrays, argmin
    * via array_position(array_min) — everything codegen'd, no UDF, no
    * shuffle. NULL/empty/ragged vectors land in cell 0 (they cluster
    * nowhere meaningful; the probe path always reads the remainder). */
  def cellColumn(embedCol: String, cents: Array[Array[Double]]): Column = {
    val v = col(embedCol).cast("array<double>")
    val dists = array(cents.map { cv =>
      val lit0 = array(cv.map(lit): _*)
      aggregate(
        zip_with(v, lit0, (a, b) => (a - b) * (a - b)),
        lit(0.0), (acc, x) => acc + coalesce(x, lit(0.0)))
    }: _*)
    when(v.isNull || size(v) =!= cents.head.length, lit(0))
      .otherwise(array_position(dists, array_min(dists)).cast("int") - 1)
  }

  // ---- centroid persistence (tiny text file under the table root) ----------

  def render(cents: Array[Array[Double]]): String =
    cents.map(_.mkString(",")).mkString("\n")

  def parse(s: String): Array[Array[Double]] =
    s.split("\n").filter(_.nonEmpty).map(_.split(",").map(_.toDouble))
}
