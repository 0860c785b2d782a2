package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming IVF assignment — the serving-time twin of the trained
  * batch quantizer: vectors arriving on a stream are assigned to their
  * nearest trained centroid in-flight, so downstream routing (which
  * serving shard / which layout partition a vector lands in) happens at
  * ingest, with the SAME cell ids the batch training produced.
  *
  * Scale design: the centroid table is K·dim rows, collapsed to a
  * single broadcast row of (cell, cxs) structs; assignment is a
  * row-local `array_min` over the K distance structs — STATELESS, so
  * the stream needs no shuffle, no state store, and no watermark for
  * the assignment itself (the optional per-cell census is one windowed
  * count downstream). Determinism matches the batch path exactly:
  * distances round to 6 decimals and ties break on cell via struct
  * ordering, the same (d, cell) argmin the Lloyd loop ranks on. */
object StreamingQuantizer {

  /** One-row broadcastable model: `cents` = array of (cell, cxs). */
  def modelFor(spark: SparkSession, sfDir: String): DataFrame =
    graft.operators.Similarity.kmeansCentroids(spark, sfDir)
      .groupBy(col("cell"))
      .agg(expr("transform(array_sort(collect_list(struct(i, cx))), " +
        "s -> s.cx)").as("cxs"))
      .agg(expr("array_sort(collect_list(struct(cell, cxs)))").as("cents"))

  /** `vecs` is a (streaming or batch) DataFrame with an `embedding`
    * Array[Float] column; appends (cell, d) with the trained assignment
    * semantics and passes every other input column through (a router
    * needs the payload next to the cell). */
  def assign(vecs: DataFrame, model: DataFrame): DataFrame =
    vecs
      .withColumn("xs",
        expr("transform(embedding, v -> CAST(v AS DOUBLE))"))
      .crossJoin(broadcast(model))
      .withColumn("asg", expr(
        "array_min(transform(cents, c -> struct(" +
          s"round(${graft.operators.Similarity.sqDistSql("xs", "c.cxs")}, 6)" +
          " AS d, c.cell AS cell)))"))
      .withColumn("cell", col("asg.cell"))
      .withColumn("d", col("asg.d"))
      .drop("xs", "cents", "asg", "embedding")

  /** One-row broadcastable PQ model: `subs` = array of (sub, cells),
    * each cells = array of (cell, cxs) — the trained codebook nested so
    * the whole model rides one broadcast row next to the coarse model. */
  def pqModelFor(spark: SparkSession, sfDir: String): DataFrame =
    graft.operators.Similarity.pqCodebook(spark, sfDir)
      .groupBy(col("sub"), col("cell"))
      .agg(expr("transform(array_sort(collect_list(struct(j, cx))), " +
        "s -> s.cx)").as("cxs"))
      .groupBy(col("sub"))
      .agg(expr("array_sort(collect_list(struct(cell, cxs)))").as("cells"))
      .agg(expr("array_sort(collect_list(struct(sub, cells)))").as("subs"))

  /** PQ-encode in-flight vectors against the trained codebook — the
    * write-path of a streaming vector index: each arriving vector
    * compresses to its PqM codes (the 256×-smaller representation the
    * ADC scan reads) AT INGEST, so the serving tier appends codes, never
    * raw vectors. Stateless like assign(): one broadcast row, a
    * row-local nested transform/array_min, no shuffle, no state store.
    * Emits `codes` = array of (sub, cell, d) with EXACTLY the batch
    * trainer's semantics (sub-vector slicing, 6-decimal rounding,
    * (d, cell) tie-break) — StreamingQuantizerSpec pins streamed codes
    * == pqTrain codes for the same vectors. */
  def encodePq(vecs: DataFrame, pqModel: DataFrame): DataFrame = {
    val subDim = graft.operators.Similarity.PqSubDim
    val subSlice = s"slice(xs, CAST(s.sub AS INT) * $subDim + 1, $subDim)"
    vecs
      .withColumn("xs",
        expr("transform(embedding, v -> CAST(v AS DOUBLE))"))
      .crossJoin(broadcast(pqModel))
      // inner transform: per sub, ONE argmin struct over its codes;
      // outer transform: flatten to (sub, cell, d)
      .withColumn("codes", expr(
        "transform(transform(subs, s -> struct(s.sub AS sub, " +
          "array_min(transform(s.cells, c -> struct(" +
          s"round(${graft.operators.Similarity.sqDistSql(subSlice, "c.cxs")}, 6)" +
          " AS d, c.cell AS cell))) AS best)), " +
          "t -> struct(t.sub AS sub, t.best.cell AS cell, t.best.d AS d))"))
      .drop("xs", "subs", "embedding")
  }

  /** Optional downstream census: per-(window, cell) arrival counts —
    * the live fill-rate view a serving operator watches for hot cells. */
  def cellCensus(assigned: DataFrame, tsCol: String,
      window: String = "1 minute", horizon: String = "5 minutes"): DataFrame =
    assigned
      .withWatermark(tsCol, horizon)
      .groupBy(org.apache.spark.sql.functions.window(col(tsCol), window),
        col("cell"))
      .agg(count(lit(1)).as("n_vecs"))
}
