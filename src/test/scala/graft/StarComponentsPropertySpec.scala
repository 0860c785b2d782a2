package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property test for the large-star/small-star loop: on seeded random
  * graphs (chains, cliques, stars, and noise all arise), the component
  * labeling must equal a plain union-find reference — the algorithm is
  * the one piece of the dedup stack whose correctness isn't obvious from
  * its plan, so it gets pinned against an independent implementation,
  * not just against the sibling Spark formulation. */
class StarComponentsPropertySpec extends SparkSuite {

  /** Union-find with union-by-min: each node maps to its component's
    * minimum id (the same labeling contract as starComponents). */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x
      else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    edges.flatMap(e => Seq(e._1, e._2)).distinct
      .map(x => x -> find(x)).toMap
  }

  test("star labeling equals union-find on seeded random graphs") {
    val s = spark
    import s.implicits._
    // edge (a, (a + d) % 21) with d in 1..20 can never be a self-loop
    val genEdge = Gen.zip(Gen.chooseNum(0L, 20L), Gen.chooseNum(1L, 20L))
      .map { case (a, d) => (a, (a + d) % 21L) }
    val graphs = Gen.listOfN(8,
        Gen.chooseNum(1, 25).flatMap(k => Gen.listOfN(k, genEdge)))
      .pureApply(Gen.Parameters.default, Seed(7L))
    graphs.zipWithIndex.foreach { case (edges, gi) =>
      val pairs = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .toDF("u", "v")
      val got = graft.operators.Dedup.starComponents(pairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = unionFind(edges)
      assert(got == want,
        s"graph $gi: edges=$edges\n got=$got\n want=$want")
    }
  }
}
