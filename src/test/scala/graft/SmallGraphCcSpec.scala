package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The round-15 single-task union-find fast path for the component loops
  * must label exactly like the distributed loops it short-circuits —
  * `graft.cc.smallGraphMaxEdges` is the dial: 0 forces the iterated loops,
  * the default (2M) routes test-scale graphs to union-find. Component-min
  * labels are a graph property, so equality must hold on every topology
  * that exercises a loop differently: chains (diameter), stars,
  * singleton-pair components, merged components, and duplicate edges. */
class SmallGraphCcSpec extends SparkSuite {

  private def pairsDf(edges: Seq[(Long, Long)], a: String, b: String) =
    spark.createDataFrame(
      java.util.Arrays.asList(edges.map(e => Row(e._1, e._2)): _*),
      StructType(Seq(StructField(a, LongType), StructField(b, LongType))))

  // chain 1-2-3-4-5, star around 10, pair (20,21), two merged triangles,
  // duplicate edge, reversed-order edge
  private val edges = Seq(
    (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
    (10L, 11L), (10L, 12L), (10L, 13L),
    (20L, 21L),
    (30L, 31L), (31L, 32L), (32L, 30L), (32L, 33L), (33L, 34L), (34L, 30L),
    (20L, 21L), // duplicate
    (40L, 41L), (39L, 41L)) // min arrives via the second edge

  test("starComponents fast path equals the forced large/small-star loop") {
    val p = pairsDf(edges, "u", "v")
    val fast = graft.operators.Dedup.starComponents(p)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    spark.conf.set("graft.cc.smallGraphMaxEdges", "0")
    try {
      val loop = graft.operators.Dedup.starComponents(p)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(fast == loop)
    } finally spark.conf.unset("graft.cc.smallGraphMaxEdges")
    // spot-check the graph property itself
    val m = fast.toMap
    assert(m(5L) == 1L && m(13L) == 10L && m(21L) == 20L &&
      m(34L) == 30L && m(41L) == 39L && m(1L) == 1L)
    assert(m.size == 19)
  }

  test("clusterLabels-shaped fast path equals the pointer-jumping loop") {
    // drive through the public dupClusters surface at a real SF so the
    // pairs come from the shared pair list exactly as in production
    val sf = "/root/testdata/sf0.001"
    val fast = graft.operators.Dedup.dupClusters(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    spark.conf.set("graft.cc.smallGraphMaxEdges", "0")
    try {
      val loop = graft.operators.Dedup.dupClusters(spark, sf)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(fast == loop)
      assert(fast.nonEmpty)
    } finally spark.conf.unset("graft.cc.smallGraphMaxEdges")
  }
}
