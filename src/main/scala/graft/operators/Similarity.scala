package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Q
import graft.Checkpoints.LineageOps
import graft.model.Tables
import graft.functions.TextFunctions._
import graft.plans.GraftFunctions.{cosineSim, sqDist, sqDistLong, sqDistPico}

/** Similarity search over the `embeddings` table (Array[Float], dim 64):
  * brute-force cosine top-k as the exact baseline, sign-LSH bucketed ANN as
  * the scale path, and LSH-blocked embedding near-dup.
  *
  * All cosine math runs through the codegen'd
  * [[graft.expressions.CosineSimilarity]] expression — one fused
  * dot+norms loop per pair, DOUBLE accumulation in index order
  * (bit-identical to the explicit zip_with/aggregate fold it replaced, so
  * the DuckDB oracles are unaffected); outputs round to 6 decimals.
  *
  * Scale design (100 TB): brute-force is O(queries × corpus) — kept for a
  * small query set where it is a broadcast join (queries broadcast, corpus
  * scanned once, no shuffle of the corpus). The ANN variant buckets both
  * sides by an 8-bit sign-LSH key (256 buckets) and joins within buckets —
  * corpus shuffles once on the bucket key, pair fan-out is corpus²/buckets,
  * and the bucket width is the recall/cost knob. The SELF-JOIN path
  * (knnJoin) derives its bit width from the corpus size ([[adaptiveBits]] —
  * expected bucket ≈ 64 rows, pair volume linear in n); the query-serving
  * paths (50 fixed queries) keep the static 8 bits, where fan-out is
  * queries×bucket, already linear. At 1B vectors one would add multi-probe;
  * the plan shape stays the same.
  */
object Similarity {

  private val Dim = 64
  private val LshBits = 8

  /** Target expected rows per sign-LSH bucket for the SELF-JOIN paths
    * (kNN graph). Within-bucket pair volume is n²/2^bits; holding the
    * expected bucket width near-constant (bits ≈ log₂(n/target)) makes
    * the pair volume ~n·target — linear in corpus size — instead of
    * quadratic at any fixed bit width. */
  private val TargetBucketRows = 64

  /** Corpus-derived sign-LSH width: bits = ⌈log₂(n / TargetBucketRows)⌉,
    * floored at [[LshBits]] (so every corpus ≤ 2^8·target rows — all the
    * oracle/bench SFs — hashes with the same 8 bits as the static DuckDB
    * oracle) and capped at [[Dim]] (one axis-aligned hyperplane per
    * dimension is the most this hash family can express; past ~2^64·target
    * rows the recall knob moves to multi-probe, not more bits). Same
    * byte-derived sizing discipline as src_bucketed_join's bucket counts. */
  private[graft] def adaptiveBits(n: Long): Int = {
    if (n <= 0) LshBits
    else {
      val needed =
        math.ceil(math.log(n.toDouble / TargetBucketRows) / math.log(2.0)).toInt
      math.min(Dim, math.max(LshBits, needed))
    }
  }

  /** Squared euclidean distance over the dims PRESENT IN BOTH arrays —
    * zip_with pads the shorter side with nulls and a single null
    * poisons the whole aggregate (a ragged vector would then rank
    * NULLS-FIRST and silently claim cell 0), so null terms are filtered
    * before the fold. Matches the oracle's join-on-dimension semantics
    * (`ON s.j = c.j` sums present-in-both dims) and is a no-op on
    * uniform-length corpora. */
  private[graft] def sqDistSql(a: String, b: String): String =
    s"aggregate(filter(zip_with($a, $b, (x, y) -> (x - y) * (x - y)), " +
      "v -> v IS NOT NULL), 0D, (s, v) -> s + v)"

  /** Squared distance in integer PICOUNITS (1e-12): each squared-diff
    * term rounds to an integral picounit count BEFORE the fold, so the
    * sum is exact long arithmetic — bit-identical in any engine
    * regardless of summation order. The rounded-6 `round(d, 6)`-of-a-
    * double-sum discipline is order-SENSITIVE: engines that fold the
    * same terms in different orders drift a ulp, and a half-ulp
    * boundary then rounds to different 6th decimals (observed 1e-6
    * diffs in the IVF-PQ ADC table). Per-term rounding has no such
    * boundary: both engines see the identical IEEE product, and
    * round-to-integer of identical doubles agrees. Null discipline
    * matches sqDistSql (ragged dims filtered, not poisoning). */
  private[graft] def sqDistPicoSql(a: String, b: String): String =
    s"aggregate(filter(zip_with($a, $b, " +
      "(x, y) -> CAST(round((x - y) * (x - y) * 1e12, 0) AS BIGINT)), " +
      "v -> v IS NOT NULL), CAST(0 AS BIGINT), (s, v) -> s + v)"

  /** Squared distance between two LONG (microunit) arrays — pure integer
    * arithmetic, exact in any engine. A microunit coordinate is ≤ ~1e6,
    * so a term is ≤ ~1e12 and a 64-dim sum ≤ ~1e14: far inside long
    * range. The unit of the result is picounits (micro²). */
  private[graft] def sqDistLongSql(a: String, b: String): String =
    s"aggregate(filter(zip_with($a, $b, (x, y) -> (x - y) * (x - y)), " +
      "v -> v IS NOT NULL), CAST(0 AS BIGINT), (s, v) -> s + v)"

  // MEASURED NON-CHANGE (round 15): spreading the embeddings scan across
  // cores (Dedup.spreadToks' twin) was tried here and REVERTED — a full
  // A/B bench showed every multi-reference consumer regress (the s_*
  // family re-plans emb() up to 6× per query, so the adaptive repartition
  // added an exchange + a partition-count probe per reference: kmeans
  // build +0.88 s, int8/ann/probe/pq recalls +0.5 s each), while the one
  // genuinely single-task hot job this aimed at (the brute-force recall
  // baselines' distance pass) was already fixed by SqDistPico's
  // arithmetic rounding. The text-side spread stays: those builds
  // reference the corpus once and their regex+md5 pass dominates.
  private def emb(spark: SparkSession, sfDir: String): DataFrame =
    Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"), col("label"),
        l2Norm("embedding").as("nrm"))
      .filter(col("nrm") > 0)

  /** DuckDB twin: exploded (vec_id, i, x-as-double) + per-vector norms.
    * The inner FLOAT cast pins the cross-engine contract at float
    * precision (Tables.normalizeEmbedding is the Spark half): a no-op on
    * today's float parquet, bit-identical under an array-of-double
    * testdata drift. */
  private val embCte: String =
    """ex AS (
      |  SELECT vec_id, i,
      |    CAST(CAST(embedding[CAST(i AS INT)] AS FLOAT) AS DOUBLE) AS x
      |  FROM embeddings, range(1, 65) r(i)
      |), nrm AS (
      |  SELECT vec_id, sqrt(SUM(x * x)) AS nrm FROM ex GROUP BY vec_id
      |)""".stripMargin

  /** Exploded twin carrying label + generation half (for the drift
    * census) — same float-pinning discipline as [[embCte]]. */
  private val embHalfCte: String =
    """exh AS (
      |  SELECT label, vec_id % 2 AS half, i,
      |    CAST(CAST(embedding[CAST(i AS INT)] AS FLOAT) AS DOUBLE) AS x
      |  FROM embeddings, range(1, 65) r(i)
      |)""".stripMargin

  // ---- brute-force cosine top-k ---------------------------------------------

  /** Exact top-10 cosine neighbors for the first 10 vectors: the query set
    * is broadcast against the corpus scan (no corpus shuffle). */
  def cosineTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val e = emb(spark, sfDir)
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"))
    val scored = e.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .withColumn("cosine", cosineSim(col("embedding"), col("q_emb")))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(round(col("cosine"), 6).desc, col("vec_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 10)
      .select(col("q_id"), col("vec_id").as("neighbor_id"),
        round(col("cosine"), 6).as("cosine"), col("rk"))
  }

  val cosineTopKSql: String =
    s"""WITH $embCte, dots AS (
       |  SELECT a.vec_id AS q_id, b.vec_id AS neighbor_id, SUM(a.x * b.x) AS dot
       |  FROM ex a JOIN ex b ON a.i = b.i AND a.vec_id < 10
       |    AND b.vec_id <> a.vec_id
       |  GROUP BY 1, 2
       |), scored AS (
       |  SELECT q_id, neighbor_id,
       |    ROUND(dot / (na.nrm * nb.nrm), 6) AS cosine
       |  FROM dots JOIN nrm na ON q_id = na.vec_id
       |    JOIN nrm nb ON neighbor_id = nb.vec_id
       |  WHERE na.nrm > 0 AND nb.nrm > 0
       |)
       |SELECT q_id, neighbor_id, cosine, rk FROM (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY q_id
       |    ORDER BY cosine DESC, neighbor_id) AS INT) AS rk
       |  FROM scored
       |) WHERE rk <= 10""".stripMargin

  // ---- sign-LSH bucketed ANN ------------------------------------------------

  /** ANN top-5 within each vector's 8-bit sign-LSH bucket (256 buckets,
    * axis-aligned hyperplanes on dims 1,9,…,57). Approximate by design:
    * neighbors outside the bucket are not scored. */
  def lshAnnTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val e = emb(spark, sfDir)
      .withColumn("bucket", signBucket("embedding", Dim, LshBits))
    val q = e.filter(col("vec_id") < 50)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"), col("bucket"))
    val scored = e.join(q, Seq("bucket"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cosine", cosineSim(col("embedding"), col("q_emb")))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(round(col("cosine"), 6).desc, col("vec_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select(col("q_id"), col("bucket"), col("vec_id").as("neighbor_id"),
        round(col("cosine"), 6).as("cosine"), col("rk"))
  }

  private val bucketExpr: String = (0 until LshBits)
    .map(j => s"CASE WHEN CAST(embedding[${1 + j * (Dim / LshBits)}] " +
      "AS FLOAT) >= 0 THEN '1' ELSE '0' END")
    .mkString(" || ")

  val lshAnnTopKSql: String =
    s"""WITH $embCte, bk AS (
       |  SELECT vec_id, $bucketExpr AS bucket FROM embeddings
       |), dots AS (
       |  SELECT qb.vec_id AS q_id, cb.bucket AS bucket, cb.vec_id AS neighbor_id,
       |    SUM(a.x * b.x) AS dot
       |  FROM bk qb JOIN bk cb ON qb.bucket = cb.bucket
       |    AND qb.vec_id < 50 AND cb.vec_id <> qb.vec_id
       |    JOIN ex a ON a.vec_id = qb.vec_id
       |    JOIN ex b ON b.vec_id = cb.vec_id AND b.i = a.i
       |  GROUP BY 1, 2, 3
       |), scored AS (
       |  SELECT q_id, bucket, neighbor_id,
       |    ROUND(dot / (na.nrm * nb.nrm), 6) AS cosine
       |  FROM dots JOIN nrm na ON q_id = na.vec_id
       |    JOIN nrm nb ON neighbor_id = nb.vec_id
       |  WHERE na.nrm > 0 AND nb.nrm > 0
       |)
       |SELECT q_id, bucket, neighbor_id, cosine, rk FROM (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY q_id
       |    ORDER BY cosine DESC, neighbor_id) AS INT) AS rk
       |  FROM scored
       |) WHERE rk <= 5""".stripMargin

  // ---- LSH-blocked embedding near-dup ---------------------------------------

  /** Near-duplicate vectors: same LSH bucket AND cosine ≥ 0.3. The bucket
    * equi-join bounds pair generation — and the bucket width SCALES WITH
    * THE CORPUS like [[knnJoin]]'s (round-14 sf100 probe: at fixed
    * LshBits=8 this self-join's pair volume is n²/256 — embed_families
    * measured 38.5× wall for 10× data at sf100, the exact quadratic the
    * round-11 verdict caught on knnJoin). One footer-count derives
    * bits = ⌈log₂(n/64)⌉, holding the expected bucket at ~64 rows so
    * pair volume stays ~64·n; the 8-bit floor keeps every oracle SF on
    * the exact bucketing the static DuckDB oracle hashes with
    * (divergence above 2^8·64 vectors is announced on stderr, same
    * contract as knnJoin). */
  /** One persisted near-dup pair list per (session, SF): the bucket
    * self-join + cosine filter is the expensive subtree behind FIVE
    * declared queries (s_embed_neardup, s_embed_families,
    * d_curation_funnel, d_modal_agreement, d_purge_audit — each re-ran
    * the whole build per query before round 15), and its output is tiny
    * (near-dup pairs only) — exactly the Dedup.pairList economics.
    * Fingerprint-keyed like kmCache: a path-only key would serve pairs
    * mined from regenerated parquet's old bytes. */
  private val embPairCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), (String, DataFrame)]

  /** Drop the cached embedding near-dup pair lists (Dedup.clearPairCache
    * counterpart; builder monitor held, same clear-vs-build discipline). */
  def clearEmbedPairCache(): Unit = embPairCache.synchronized {
    embPairCache.values.foreach { case (_, df) =>
      try { df.unpersist(); () } catch { case _: Exception => () }
    }
    embPairCache.clear()
  }

  /** Force the shared pair list to materialize — Bench times this as its
    * own entry (shared_embed_pairs) so consumers time steady-state. */
  def materializeEmbedPairs(spark: SparkSession, sfDir: String): Unit = {
    embedNearDup(spark, sfDir).count(); ()
  }

  def embedNearDup(spark: SparkSession, sfDir: String): DataFrame =
    embPairCache.synchronized {
      val fp = graft.sources.SourceFingerprint.key(sfDir, "embeddings.parquet")
      embPairCache.get((spark, sfDir)) match {
        case Some((`fp`, df)) => df
        case stale =>
          stale.foreach { case (_, df) =>
            try { df.unpersist(); () } catch { case _: Exception => () }
          }
          val df = embedNearDupCompute(spark, sfDir)
          df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          embPairCache.put((spark, sfDir), (fp, df))
          df
      }
    }

  private def embedNearDupCompute(
      spark: SparkSession, sfDir: String): DataFrame = {
    val n = Tables.embeddings(spark, sfDir).count()
    val bits = adaptiveBits(n)
    if (bits != LshBits) System.err.println(
      s"[graft] s_embed_neardup/s_embed_families: adaptive LSH width " +
        s"$bits bits (corpus n=$n) diverges from the fixed-$LshBits-bit " +
        "DuckDB oracle SQL — results are correct but NOT " +
        "oracle-comparable at this corpus size")
    val e = emb(spark, sfDir)
      .withColumn("bucket", signBucket("embedding", Dim, bits))
    val pairs = e.as("a").join(e.as("b"),
        col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        cosineSim(col("a.embedding"), col("b.embedding")).as("cosine"))
    pairs.filter(col("cosine") >= 0.3)
      .select(col("vec_a"), col("vec_b"), round(col("cosine"), 6).as("cosine"))
  }

  /** Shared CTE chain ending at `dots(vec_a, vec_b, dot)` for bucket-
    * blocked pair scoring — composed by embedNearDupSql and
    * embedFamiliesSql (no textual surgery between siblings). */
  private val embPairCtes: String =
    s"""$embCte, bk AS (
       |  SELECT vec_id, $bucketExpr AS bucket FROM embeddings
       |), dots AS (
       |  SELECT pa.vec_id AS vec_a, pb.vec_id AS vec_b, SUM(a.x * b.x) AS dot
       |  FROM bk pa JOIN bk pb ON pa.bucket = pb.bucket
       |    AND pa.vec_id < pb.vec_id
       |    JOIN ex a ON a.vec_id = pa.vec_id
       |    JOIN ex b ON b.vec_id = pb.vec_id AND b.i = a.i
       |  GROUP BY 1, 2
       |)""".stripMargin

  val embedNearDupSql: String =
    s"""WITH $embPairCtes
       |SELECT vec_a, vec_b, ROUND(dot / (na.nrm * nb.nrm), 6) AS cosine
       |FROM dots JOIN nrm na ON vec_a = na.vec_id
       |  JOIN nrm nb ON vec_b = nb.vec_id
       |WHERE na.nrm > 0 AND nb.nrm > 0
       |  AND dot / (na.nrm * nb.nrm) >= 0.3""".stripMargin

  // ---- semantic dup families (CC over the embedding near-dup graph) --------

  /** Semantic duplicate FAMILIES: connected components of the
    * embedding-cosine near-dup graph (same LSH-bucketed pair generation
    * as s_embed_neardup), labeled with the component-min vec_id via the
    * large-star/small-star loop shared with the text-side dedup — the
    * multimodal analogue of d_dup_clusters: paraphrase/re-encode dup
    * groups that token-level Jaccard can't see. */
  def embedFamilies(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.starComponents(embedNearDup(spark, sfDir)
        .select(col("vec_a").as("u"), col("vec_b").as("v")))
      .groupBy(col("lbl").as("family_id"))
      .agg(count(lit(1)).as("n_vecs"))

  val embedFamiliesSql: String = {
    s"""WITH RECURSIVE $embPairCtes, epairs AS (
       |  SELECT vec_a, vec_b
       |  FROM dots JOIN nrm na ON vec_a = na.vec_id
       |    JOIN nrm nb ON vec_b = nb.vec_id
       |  WHERE na.nrm > 0 AND nb.nrm > 0
       |    AND dot / (na.nrm * nb.nrm) >= 0.3
       |), eedges AS (
       |  SELECT vec_a AS a, vec_b AS b FROM epairs
       |  UNION SELECT vec_b, vec_a FROM epairs
       |), ereach(a, b) AS (
       |  SELECT a, b FROM eedges
       |  UNION
       |  SELECT r.a, e.b FROM ereach r JOIN eedges e ON r.b = e.a
       |)
       |SELECT family_id, COUNT(*) AS n_vecs FROM (
       |  SELECT a AS vec, LEAST(a, MIN(b)) AS family_id
       |  FROM ereach GROUP BY a
       |) GROUP BY family_id""".stripMargin
  }

  // ---- kNN graph construction (LSH-blocked self-join) -----------------------

  /** kNN GRAPH: every vector's top-3 cosine neighbors within its sign-LSH
    * bucket — the self-join analogue of s_lsh_ann_topk (which serves a
    * 50-query workload). The kNN graph is the input of graph-based
    * curation (kNN-density outliers, label propagation, graph ANN
    * indexes); the corpus shuffles once on the bucket key and the
    * per-bucket top-k window never sees more than a bucket's rows.
    *
    * The bucket width SCALES WITH THE CORPUS (round-11 verdict: a
    * compile-time `LshBits = 8` makes the self-join pair fan-out
    * n²/256 — quadratic, 21× time for 10× data sf1→sf10). One
    * metadata-cheap `count()` (parquet footer row counts, no data scan)
    * derives bits = ⌈log₂(n/64)⌉ via [[adaptiveBits]], holding the
    * expected bucket at ~64 rows so pair volume stays ~64·n — linear.
    * The floor at 8 bits keeps every oracle/bench SF (n ≤ 16k) on the
    * exact bucketing the static DuckDB oracle hashes with. */
  def knnJoin(spark: SparkSession, sfDir: String): DataFrame = {
    // sized on the RAW table count (parquet footer aggregate — no data
    // scan, no norm compute), not emb()'s zero-norm-filtered view: the
    // width is a sizing heuristic, and the raw count keeps the probe O(1)
    val n = Tables.embeddings(spark, sfDir).count()
    val bits = adaptiveBits(n)
    // the DuckDB oracle hashes with the FIXED LshBits width; above
    // 2^LshBits * 64 vectors the adaptive width diverges by design and an
    // oracle comparison would hash-mismatch with no hint at the cause
    // (round-12 ADVICE) — say so loudly where the bench/verify tail shows
    // it. Every oracle SF stays below the threshold (sf0.1 ≈ 6k vectors).
    if (bits != LshBits) System.err.println(
      s"[graft] s_knn_join: adaptive LSH width $bits bits (corpus n=$n) " +
        s"diverges from the fixed-$LshBits-bit DuckDB oracle SQL — " +
        "results are correct but NOT oracle-comparable at this corpus size")
    val e = emb(spark, sfDir)
      .withColumn("bucket", signBucket("embedding", Dim, bits))
    val pairs = e.as("a").join(e.as("b"),
        col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("q_id"), col("b.vec_id").as("neighbor_id"),
        cosineSim(col("a.embedding"), col("b.embedding")).as("cosine"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(round(col("cosine"), 6).desc, col("neighbor_id"))
    pairs.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 3)
      .select(col("q_id"), col("neighbor_id"),
        round(col("cosine"), 6).as("cosine"), col("rk"))
  }

  val knnJoinSql: String =
    s"""WITH $embCte, bk AS (
       |  SELECT vec_id, $bucketExpr AS bucket FROM embeddings
       |), dots AS (
       |  SELECT qb.vec_id AS q_id, cb.vec_id AS neighbor_id,
       |    SUM(a.x * b.x) AS dot
       |  FROM bk qb JOIN bk cb ON qb.bucket = cb.bucket
       |    AND cb.vec_id <> qb.vec_id
       |    JOIN ex a ON a.vec_id = qb.vec_id
       |    JOIN ex b ON b.vec_id = cb.vec_id AND b.i = a.i
       |  GROUP BY 1, 2
       |), scored AS (
       |  SELECT q_id, neighbor_id,
       |    ROUND(dot / (na.nrm * nb.nrm), 6) AS cosine
       |  FROM dots JOIN nrm na ON q_id = na.vec_id
       |    JOIN nrm nb ON neighbor_id = nb.vec_id
       |  WHERE na.nrm > 0 AND nb.nrm > 0
       |)
       |SELECT q_id, neighbor_id, cosine, rk FROM (
       |  SELECT *, row_number() OVER (PARTITION BY q_id
       |    ORDER BY cosine DESC, neighbor_id) AS rk
       |  FROM scored
       |) WHERE rk <= 3""".stripMargin

  // ---- IVF ANN: coarse-quantized cells, multi-probe -------------------------

  /** IVF-style ANN: the 10 label groups act as Voronoi cells with
    * centroid = per-cell mean vector (a deterministic one-step coarse
    * quantizer — a real IVF trains k-means, the plan shape is identical);
    * each query probes its 2 nearest centroids by cosine and scores only
    * vectors in those cells. Cells ≫ this at scale (√n), probes are the
    * recall knob; the centroid table is tiny and broadcast, the corpus
    * shuffles once on its cell id. */
  def ivfAnnTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val e = emb(spark, sfDir)
    val ex = e.select(col("vec_id"), col("label"), posexplode(col("embedding")))
      .select(col("vec_id"), col("label"), (col("pos") + 1).as("i"),
        col("col").cast("double").as("x"))
    val cent = ex.groupBy(col("label"), col("i")).agg(avg(col("x")).as("cx"))
    val centNorm = cent.groupBy(col("label"))
      .agg(sqrt(sum(col("cx") * col("cx"))).as("cnrm"))
    // query→centroid cosine in the exploded space
    val qex = ex.filter(col("vec_id") < 50)
      .select(col("vec_id").as("q_id"), col("i"), col("x"))
    val qcos = qex.join(cent.withColumnRenamed("label", "cell"), Seq("i"))
      .groupBy(col("q_id"), col("cell"))
      .agg(sum(col("x") * col("cx")).as("dot"))
      .join(e.select(col("vec_id").as("q_id"), col("nrm").as("qnrm")), Seq("q_id"))
      .join(centNorm.withColumnRenamed("label", "cell"), Seq("cell"))
      .select(col("q_id"), col("cell"),
        (col("dot") / (col("qnrm") * col("cnrm"))).as("ccos"))
    val wProbe = Window.partitionBy(col("q_id"))
      .orderBy(round(col("ccos"), 6).desc, col("cell"))
    val probed = qcos.withColumn("prk", row_number().over(wProbe))
      .filter(col("prk") <= 2).select(col("q_id"), col("cell"))
    // score candidates in the probed cells only
    val q = e.filter(col("vec_id") < 50)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val scored = e.join(probed, e("label") === probed("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .join(broadcast(q), Seq("q_id"))
      .withColumn("cosine", cosineSim(col("embedding"), col("q_emb")))
    val wN = Window.partitionBy(col("q_id"))
      .orderBy(round(col("cosine"), 6).desc, col("vec_id"))
    scored.withColumn("rk", row_number().over(wN))
      .filter(col("rk") <= 5)
      .select(col("q_id"), col("cell"), col("vec_id").as("neighbor_id"),
        round(col("cosine"), 6).as("cosine"), col("rk"))
  }

  val ivfAnnTopKSql: String =
    s"""WITH $embCte, cent AS (
       |  SELECT e.label, ex.i, AVG(ex.x) AS cx
       |  FROM ex JOIN embeddings e ON ex.vec_id = e.vec_id
       |  GROUP BY 1, 2
       |), cnrm AS (
       |  SELECT label, sqrt(SUM(cx * cx)) AS cnrm FROM cent GROUP BY 1
       |), qcos AS (
       |  SELECT qx.vec_id AS q_id, cent.label AS cell,
       |    SUM(qx.x * cent.cx) / (nq.nrm * cnrm.cnrm) AS ccos
       |  FROM ex qx
       |    JOIN cent ON qx.i = cent.i
       |    JOIN nrm nq ON qx.vec_id = nq.vec_id
       |    JOIN cnrm ON cent.label = cnrm.label
       |  WHERE qx.vec_id < 50 AND nq.nrm > 0
       |  GROUP BY qx.vec_id, cent.label, nq.nrm, cnrm.cnrm
       |), probed AS (
       |  SELECT q_id, cell FROM (
       |    SELECT q_id, cell, row_number() OVER (PARTITION BY q_id
       |      ORDER BY ROUND(ccos, 6) DESC, cell) AS prk
       |    FROM qcos
       |  ) WHERE prk <= 2
       |), dots AS (
       |  SELECT a.vec_id AS q_id, b.vec_id AS neighbor_id, SUM(a.x * b.x) AS dot
       |  FROM ex a JOIN ex b ON a.i = b.i AND a.vec_id < 50
       |    AND b.vec_id <> a.vec_id
       |  GROUP BY 1, 2
       |), scored AS (
       |  SELECT d.q_id, p.cell, d.neighbor_id,
       |    ROUND(d.dot / (na.nrm * nb.nrm), 6) AS cosine
       |  FROM dots d
       |    JOIN embeddings ne ON d.neighbor_id = ne.vec_id
       |    JOIN probed p ON d.q_id = p.q_id AND ne.label = p.cell
       |    JOIN nrm na ON d.q_id = na.vec_id
       |    JOIN nrm nb ON d.neighbor_id = nb.vec_id
       |  WHERE na.nrm > 0 AND nb.nrm > 0
       |)
       |SELECT q_id, cell, neighbor_id, cosine, rk FROM (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY q_id
       |    ORDER BY cosine DESC, neighbor_id) AS INT) AS rk
       |  FROM scored
       |) WHERE rk <= 5""".stripMargin

  // ---- trained k-means coarse quantizer -------------------------------------

  private val KmK = 8
  private val KmIters = 3

  /** K-means (Lloyd) training for the IVF coarse quantizer — the "real
    * IVF trains k-means" upgrade over label-cell centroids. Three rounds
    * of assign-argmin / recompute-means over the exploded (vec, dim, x)
    * representation: each round is two shuffles (dist agg on (vec, cell),
    * mean agg on (cell, dim)) — the standard distributed Lloyd shape, K·n
    * pair rows per round with K tiny.
    *
    * Cross-engine determinism (the interesting part): distances and
    * centroid means are ROUNDED to 6 decimals EVERY round, and argmin
    * ranks on (rounded dist, cell). Unrounded float k-means diverges
    * between engines after one round (parallel summation order); rounding
    * at each fixpoint makes the whole training trajectory reproducible —
    * the same trick a production pipeline needs for audit-stable cluster
    * ids. Output: per-cell membership count + inertia after round 3. */
  /** One trained model per (session, SF): s_kmeans_cells and
    * s_ivf_trained_topk both need the same training, and the trained
    * frames are tiny (K·dim centroids + one row per vector) — persist
    * them once instead of re-deriving the 3-round tree per consumer
    * (same shared-intermediate pattern as Dedup's pair list). */
  // value carries the source fingerprint it was trained on: IvfLayout
  // keys its partitioned artifact on the same fingerprint, so the model
  // cache must miss-and-retrain when the parquet is regenerated
  // in-session — otherwise ensure() would join NEW embeddings to STALE
  // trained cells while the oracle retrains from the new data
  private val kmCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), (String, DataFrame, DataFrame)]

  private def unpersistModel(a: DataFrame, b: DataFrame): Unit =
    try {
      a.unpersist(); b.unpersist()
      // unpersist drops only the persist()-level cache entry; the
      // centroid frame is ALSO a localCheckpoint whose RDD blocks
      // leak without an explicit free (CheckpointHygieneSpec proves
      // the mechanism)
      freeLocalCheckpoint(a)
      ()
    } catch { case _: Exception => () }

  /** Drop all cached trained models (unpersisting both frames) — the
    * Dedup.clearPairCache counterpart, for regenerated parquet or
    * measurement harnesses that must re-time the build.
    *
    * CONTRACT: clearing FREES the models' localCheckpoint blocks (leak
    * hygiene — CheckpointHygieneSpec proves the mechanism), so any frame
    * handle obtained from the cache BEFORE a clear is invalid after it —
    * recomputing one dies with CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND. Re-ask
    * the cache (kmeansTrain/ivfpqTrain) instead of holding frames across
    * a clear. */
  def clearKmeansCache(): Unit = {
    // take the builder's monitor (kmeansTrain synchronizes on kmCache) so
    // a clear racing a train can't unpersist an in-use model
    kmCache.synchronized {
      kmCache.values.foreach { case (_, cent, asg) => unpersistModel(cent, asg) }
      kmCache.clear()
    }
    // the IVF-PQ model is DERIVED from this one (residuals against the
    // trained centroids); letting it outlive the coarse model would pair
    // stale residual codes with a retrained quantizer
    clearIvfPqCache()
  }

  /** Lloyd training loop shared by the cell summary and the trained-IVF
    * probe path. Returns (centroids the final assignment was computed
    * against: (cell, i, cx), final assignment: (vec_id, cell, d)). */
  private def kmeansTrain(spark: SparkSession,
      sfDir: String): (DataFrame, DataFrame) = kmCache.synchronized {
    val fp = graft.sources.SourceFingerprint.key(sfDir, "embeddings.parquet")
    kmCache.get((spark, sfDir)) match {
      case Some((`fp`, cent, asg)) => (cent, asg)
      case stale =>
        stale.foreach { case (_, cent, asg) => unpersistModel(cent, asg) }
        val (cent, asg) = kmeansTrainCompute(spark, sfDir)
        cent.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        asg.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        kmCache.put((spark, sfDir), (fp, cent, asg))
        (cent, asg)
    }
  }

  /** Force the shared trained model to materialize — Bench times this as
    * its own entry so the consumers' per-query times are steady-state. */
  def materializeKmeans(spark: SparkSession, sfDir: String): Unit = {
    val (cent, asg) = kmeansTrain(spark, sfDir)
    cent.count(); asg.count(); ()
  }

  private def kmeansTrainCompute(spark: SparkSession,
      sfDir: String): (DataFrame, DataFrame) = {
    val ex = emb(spark, sfDir)
      .select(col("vec_id"), posexplode(col("embedding")))
      .select(col("vec_id"), (col("pos") + 1).as("i"),
        col("col").cast("double").as("x"))
    // array form for the distance step: vecs stay whole (no explode),
    // centroids gather into per-cell ordered arrays, and each round's
    // assignment is a (n × K) cross join with a zip_with fold — the
    // exploded join-on-dimension formulation fanned every (vec, dim) row
    // out K ways (n·dim·K shuffled rows per round). Per-round ROUND(d, 6)
    // keeps the trajectory bit-identical to the oracle's exploded SUM
    // (drift of an ordered fold vs an unordered sum is ~1e-13, rounded
    // away at 1e-6).
    val vecs = emb(spark, sfDir)
      .select(col("vec_id"),
        expr("transform(embedding, v -> CAST(v AS DOUBLE))").as("xs"))
    def centArrays(cent: DataFrame): DataFrame =
      cent.groupBy(col("cell"))
        .agg(expr("transform(array_sort(collect_list(struct(i, cx))), " +
          "s -> s.cx)").as("cxs"))
    // deterministic seed: the first K vectors are the initial centroids
    var cent = ex.filter(col("vec_id") < KmK)
      .select(col("vec_id").as("cell"), col("i"), round(col("x"), 6).as("cx"))
    var centUsed = cent
    var asg: DataFrame = null
    // the checkpoint two rounds back: its only consumer (the previous
    // round's assignment) folded into the latest materialized centroid
    // table, so its executor blocks are dead weight — free them
    var staleCkpt: DataFrame = null
    for (iter <- 1 to KmIters) {
      centUsed = cent
      val dist = vecs.crossJoin(broadcast(centArrays(cent)))
        .select(col("vec_id"), col("cell"),
          // fused codegen kernel (round-15), bit-identical to the
          // round(aggregate(zip_with(...)), 6) fold it replaces
          round(sqDist(col("xs"), col("cxs")), 6)
            .as("d"))
      // nearest-cell pick as an AGGREGATE, not a window (round 15, guide
      // §2.3 "aggregate before you shuffle"): row_number over
      // (partitionBy vec_id, orderBy d, cell) shuffled all n·K distance
      // rows and sorted each group; min(struct(d, cell)) partial-
      // aggregates map-side — the crossJoin leaves all K rows of a
      // vector in one partition, so the exchange carries n pre-reduced
      // rows, K× fewer, and no sort. struct ordering is (d, cell)
      // lexicographic = the window's orderBy, so the winner (and every
      // tie-break) is identical.
      asg = dist.groupBy(col("vec_id"))
        .agg(min(struct(col("d"), col("cell"))).as("m"))
        .select(col("vec_id"), col("m.cell").as("cell"), col("m.d").as("d"))
      // per-round materialization — the same lesson dupClusters already
      // applies (Dedup.scala clusterLabels): without an action per round
      // the final lineage nests KmIters windows + joins + aggregates and
      // both optimization and execution cost compound (measured 27.6 s
      // for the 3-round tree vs ~1 s materialized, on 17 MB). The
      // centroid table is K·dim rows, so the eager localCheckpoint is a
      // sub-millisecond job that truncates the round's whole lineage —
      // and at scale it also stops round N from re-running rounds 1..N-1
      // (including re-scanning the embeddings) from scratch.
      // Caveat (at-scale): localCheckpoint blocks are executor-local and
      // NOT replicated — under executor loss or dynamic allocation a lost
      // round is unrecoverable and fails the job instead of recomputing.
      // On a real cluster swap in reliable `checkpoint()` (HDFS-backed,
      // needs setCheckpointDir) for the same K·dim-row table; local mode
      // has no executor churn, so the cheaper form is safe here.
      // the FINAL round returns (centUsed, asg) — recomputing cent there
      // would be a full corpus-scale eager job whose output nobody reads
      // and whose checkpoint blocks nothing frees (the PQ loop has the
      // same guard); skipping it changes no output
      if (iter < KmIters) {
        // Round 16 (guide §3.3 "join first on the un-exploded key,
        // explode after"): the update previously joined the EXPLODED
        // (vec, dim) frame with the assignment — n·dim rows through a
        // sort-merge join per round, which at the sf100 probe spilled
        // the disk dry (75 GB transient for 320M-row sort sides).
        // Joining the ARRAY-form vectors moves n rows (dim× fewer) and
        // explodes after. Same (cell, i, x) multiset reaches the same
        // grouped avg; the round(·, 6) swallows partial-sum order, the
        // SAME argument this loop already documents for its cross-engine
        // equality (ordered fold vs unordered sum drift ~1e-13).
        cent = vecs.join(asg.select("vec_id", "cell"), Seq("vec_id"))
          .select(col("cell"), posexplode(col("xs")))
          .select(col("cell"), (col("pos") + 1).as("i"),
            col("col").as("x"))
          .groupBy(col("cell"), col("i")).agg(round(avg(col("x")), 6).as("cx"))
          .coalesce(1)
          .truncateLineage(true)
      }
      // safe on the final round too: asg reads centUsed, whose checkpoint
      // truncated its lineage — the round-before-last's blocks are dead
      if (staleCkpt != null) freeLocalCheckpoint(staleCkpt)
      staleCkpt = centUsed
    }
    (centUsed, asg)
  }

  /** Frees the executor blocks of a localCheckpoint'ed frame. The returned
    * `(centUsed, asg)` pair keeps the last two rounds' checkpoints alive
    * (asg's lineage reads centUsed), so only older rounds pass through
    * here. No-op for non-checkpointed plans (the round-0 seed).
    * private[graft] so the spec can prove the LogicalRDD match actually
    * fires (a silent no-op here would be an invisible leak). */
  private[graft] def freeLocalCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false); ()
      case _ => ()
    }

  def kmeansCells(spark: SparkSession, sfDir: String): DataFrame = {
    val (_, asg) = kmeansTrain(spark, sfDir)
    asg.groupBy(col("cell"))
      .agg(count(lit(1)).as("n_vecs"), round(sum(col("d")), 3).as("inertia"))
  }

  /** IVF ANN over the TRAINED quantizer: probe the 2 nearest trained
    * centroids per query (same euclidean metric as training), score only
    * vectors whose final k-means assignment lands in a probed cell —
    * the end-to-end "real IVF" path (train → probe → restricted scan),
    * vs s_ivf_ann_topk's label-cell stand-in. Plan shape: centroid table
    * tiny (broadcast), membership join shuffles the corpus once on
    * vec_id, scoring is the broadcast-query pattern. */
  def ivfTrainedTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val (cent, asg) = kmeansTrain(spark, sfDir)
    val e = emb(spark, sfDir)
    val qex = e.filter(col("vec_id") < 50)
      .select(col("vec_id"), posexplode(col("embedding")))
      .select(col("vec_id").as("q_id"), (col("pos") + 1).as("i"),
        col("col").cast("double").as("x"))
    val qd = qex.join(broadcast(cent), Seq("i"))
      .groupBy(col("q_id"), col("cell"))
      .agg(round(sum((col("x") - col("cx")) * (col("x") - col("cx"))), 6)
        .as("qd"))
    val wProbe = Window.partitionBy(col("q_id")).orderBy(col("qd"), col("cell"))
    val probed = qd.withColumn("prk", row_number().over(wProbe))
      .filter(col("prk") <= 2).select(col("q_id"), col("cell"))
    val q = e.filter(col("vec_id") < 50)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val scored = e.join(asg.select("vec_id", "cell"), Seq("vec_id"))
      .join(probed, Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .join(broadcast(q), Seq("q_id"))
      .withColumn("cosine", cosineSim(col("embedding"), col("q_emb")))
    val wN = Window.partitionBy(col("q_id"))
      .orderBy(round(col("cosine"), 6).desc, col("vec_id"))
    scored.withColumn("rk", row_number().over(wN).cast("long"))
      .filter(col("rk") <= 5)
      .select(col("q_id"), col("cell"), col("vec_id").as("neighbor_id"),
        round(col("cosine"), 6).as("cosine"), col("rk"))
  }

  /** The trained coarse-quantizer assignment (vec_id, cell, d) — the
    * shared model's corpus-side half, for consumers outside this object
    * (the IVF storage layout writes the corpus partitioned by it). */
  private[graft] def kmeansAssignment(spark: SparkSession,
      sfDir: String): DataFrame = kmeansTrain(spark, sfDir)._2

  /** The trained centroid table (cell, i, cx) the final assignment was
    * computed against — the model's broadcast half, for the streaming
    * quantizer. */
  private[graft] def kmeansCentroids(spark: SparkSession,
      sfDir: String): DataFrame = kmeansTrain(spark, sfDir)._1

  /** Name of the chain's final-assignment CTE, for composing oracles. */
  private[graft] val kmeansFinalAsgCte: String = s"asg$KmIters"

  /** Shared CTE chain: exploded+filtered vectors, cent0 seed, and the
    * unrolled asg1/cent1/asg2/cent2/asg3 training rounds (asg3 is the
    * final assignment, computed against cent2). */
  private[graft] val kmeansChainSql: String = {
    def asg(k: Int): String =
      s"""asg$k AS (
         |  SELECT vec_id, cell, d FROM (
         |    SELECT vec_id, cell, d, row_number() OVER (PARTITION BY vec_id
         |      ORDER BY d, cell) AS rn
         |    FROM (
         |      SELECT e.vec_id, c.cell,
         |        ROUND(SUM((e.x - c.cx) * (e.x - c.cx)), 6) AS d
         |      FROM exf e JOIN cent${k - 1} c ON e.i = c.i
         |      GROUP BY e.vec_id, c.cell)
         |  ) WHERE rn = 1
         |)""".stripMargin
    def cent(k: Int): String =
      s"""cent$k AS (
         |  SELECT a.cell, e.i, ROUND(AVG(e.x), 6) AS cx
         |  FROM exf e JOIN asg$k a ON e.vec_id = a.vec_id
         |  GROUP BY a.cell, e.i
         |)""".stripMargin
    s"""$embCte, exf AS (
       |  SELECT ex.vec_id, ex.i, ex.x FROM ex
       |  JOIN nrm ON ex.vec_id = nrm.vec_id WHERE nrm.nrm > 0
       |), cent0 AS (
       |  SELECT vec_id AS cell, i, ROUND(x, 6) AS cx
       |  FROM exf WHERE vec_id < $KmK
       |), ${asg(1)}, ${cent(1)}, ${asg(2)}, ${cent(2)}, ${asg(3)}""".stripMargin
  }

  val kmeansCellsSql: String =
    s"""WITH $kmeansChainSql
       |SELECT cell, COUNT(*) AS n_vecs, ROUND(SUM(d), 3) AS inertia
       |FROM asg$KmIters GROUP BY cell""".stripMargin

  val ivfTrainedTopKSql: String =
    s"""WITH $kmeansChainSql, qd AS (
       |  SELECT e.vec_id AS q_id, c.cell,
       |    ROUND(SUM((e.x - c.cx) * (e.x - c.cx)), 6) AS qd
       |  FROM exf e JOIN cent${KmIters - 1} c ON e.i = c.i
       |  WHERE e.vec_id < 50 GROUP BY e.vec_id, c.cell
       |), probed AS (
       |  SELECT q_id, cell FROM (
       |    SELECT q_id, cell, row_number() OVER (PARTITION BY q_id
       |      ORDER BY qd, cell) AS prk FROM qd
       |  ) WHERE prk <= 2
       |), dots AS (
       |  SELECT a.vec_id AS q_id, b.vec_id AS neighbor_id, SUM(a.x * b.x) AS dot
       |  FROM exf a JOIN exf b ON a.i = b.i AND a.vec_id < 50
       |    AND b.vec_id <> a.vec_id
       |  GROUP BY 1, 2
       |), scored AS (
       |  SELECT d.q_id, p.cell, d.neighbor_id,
       |    ROUND(d.dot / (na.nrm * nb.nrm), 6) AS cosine
       |  FROM dots d
       |    JOIN asg$KmIters m ON d.neighbor_id = m.vec_id
       |    JOIN probed p ON d.q_id = p.q_id AND m.cell = p.cell
       |    JOIN nrm na ON d.q_id = na.vec_id
       |    JOIN nrm nb ON d.neighbor_id = nb.vec_id
       |)
       |SELECT q_id, cell, neighbor_id, cosine, rk FROM (
       |  SELECT *, row_number() OVER (PARTITION BY q_id
       |    ORDER BY cosine DESC, neighbor_id) AS rk
       |  FROM scored
       |) WHERE rk <= 5""".stripMargin

  // ---- IVF probe-count tuning curve -----------------------------------------

  /** Recall@5 of the TRAINED IVF at probes ∈ {1, 2, 4} against the exact
    * brute-force top-5 — the probe-count knob measured as query output
    * (the "measure, don't guess" companion to s_ivf_trained_topk: at
    * 100 TB you pick probes from this curve on a sample, then pay only
    * probes/K of the corpus per query). One candidate generation at the
    * widest probe count serves every curve point: narrower points are a
    * prk filter, not a re-scan. */
  def probeCurve(spark: SparkSession, sfDir: String): DataFrame = {
    val (cent, asg) = kmeansTrain(spark, sfDir)
    val e = emb(spark, sfDir)
    val q = e.filter(col("vec_id") < 50)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))

    val w = Window.partitionBy(col("q_id"))
      .orderBy(round(col("cosine"), 6).desc, col("vec_id"))
    val exactTop = e.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .withColumn("cosine", cosineSim(col("embedding"), col("q_emb")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select(col("q_id"), col("vec_id").as("neighbor_id"))

    val qex = e.filter(col("vec_id") < 50)
      .select(col("vec_id"), posexplode(col("embedding")))
      .select(col("vec_id").as("q_id"), (col("pos") + 1).as("i"),
        col("col").cast("double").as("x"))
    val qd = qex.join(broadcast(cent), Seq("i"))
      .groupBy(col("q_id"), col("cell"))
      .agg(round(sum((col("x") - col("cx")) * (col("x") - col("cx"))), 6)
        .as("qd"))
    val wProbe = Window.partitionBy(col("q_id")).orderBy(col("qd"), col("cell"))
    val probed = qd.withColumn("prk", row_number().over(wProbe).cast("long"))
      .filter(col("prk") <= 4).select(col("q_id"), col("cell"), col("prk"))

    val cand = e.join(asg.select("vec_id", "cell"), Seq("vec_id"))
      .join(probed, Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .join(broadcast(q), Seq("q_id"))
      .withColumn("cosine", cosineSim(col("embedding"), col("q_emb")))
      .select(col("q_id"), col("vec_id").as("neighbor_id"),
        col("cosine"), col("prk"))

    val probes = spark.range(1)
      .select(explode(array(lit(1L), lit(2L), lit(4L))).as("probes"))
    val wP = Window.partitionBy(col("probes"), col("q_id"))
      .orderBy(round(col("cosine"), 6).desc, col("neighbor_id"))
    val ptop = cand.join(broadcast(probes), col("prk") <= col("probes"))
      .withColumn("rk", row_number().over(wP))
      .filter(col("rk") <= 5)
      .select(col("probes"), col("q_id"), col("neighbor_id"))

    val hits = exactTop.join(ptop, Seq("q_id", "neighbor_id"))
      .groupBy(col("probes"), col("q_id")).agg(count(lit(1)).as("n_hits"))
    probes.crossJoin(exactTop.select(col("q_id")).distinct())
      .join(hits, Seq("probes", "q_id"), "left_outer")
      .select(col("probes"), coalesce(col("n_hits"), lit(0L)).as("n_hits"))
      .groupBy(col("probes"))
      .agg(round(avg(col("n_hits")) / 5.0, 4).as("avg_recall_at_5"),
        count(lit(1)).as("n_queries"))
  }

  val probeCurveSql: String =
    s"""WITH $kmeansChainSql, dots AS (
       |  SELECT a.vec_id AS q_id, b.vec_id AS neighbor_id, SUM(a.x * b.x) AS dot
       |  FROM exf a JOIN exf b ON a.i = b.i AND a.vec_id < 50
       |    AND b.vec_id <> a.vec_id
       |  GROUP BY 1, 2
       |), scored AS (
       |  SELECT q_id, neighbor_id, ROUND(dot / (na.nrm * nb.nrm), 6) AS cosine
       |  FROM dots JOIN nrm na ON q_id = na.vec_id
       |    JOIN nrm nb ON neighbor_id = nb.vec_id
       |), exact_top AS (
       |  SELECT q_id, neighbor_id FROM (
       |    SELECT q_id, neighbor_id, row_number() OVER (PARTITION BY q_id
       |      ORDER BY cosine DESC, neighbor_id) AS rk FROM scored
       |  ) WHERE rk <= 5
       |), qd AS (
       |  SELECT e.vec_id AS q_id, c.cell,
       |    ROUND(SUM((e.x - c.cx) * (e.x - c.cx)), 6) AS qd
       |  FROM exf e JOIN cent${KmIters - 1} c ON e.i = c.i
       |  WHERE e.vec_id < 50 GROUP BY e.vec_id, c.cell
       |), probed AS (
       |  SELECT q_id, cell, prk FROM (
       |    SELECT q_id, cell, CAST(row_number() OVER (PARTITION BY q_id
       |      ORDER BY qd, cell) AS BIGINT) AS prk FROM qd
       |  ) WHERE prk <= 4
       |), probes AS (
       |  SELECT CAST(UNNEST([1, 2, 4]) AS BIGINT) AS probes
       |), ptop AS (
       |  SELECT probes, q_id, neighbor_id FROM (
       |    SELECT p.probes, s.q_id, s.neighbor_id,
       |      row_number() OVER (PARTITION BY p.probes, s.q_id
       |        ORDER BY s.cosine DESC, s.neighbor_id) AS rk
       |    FROM scored s
       |      JOIN asg$KmIters m ON s.neighbor_id = m.vec_id
       |      JOIN probed pb ON s.q_id = pb.q_id AND m.cell = pb.cell
       |      JOIN probes p ON pb.prk <= p.probes
       |  ) WHERE rk <= 5
       |), hits AS (
       |  SELECT t.probes, e.q_id, COUNT(*) AS n_hits
       |  FROM exact_top e JOIN ptop t
       |    ON e.q_id = t.q_id AND e.neighbor_id = t.neighbor_id
       |  GROUP BY 1, 2
       |), grid AS (
       |  SELECT p.probes, q.q_id FROM probes p
       |    CROSS JOIN (SELECT DISTINCT q_id FROM exact_top) q
       |)
       |SELECT g.probes,
       |  ROUND(AVG(COALESCE(h.n_hits, 0)) / 5.0, 4) AS avg_recall_at_5,
       |  COUNT(*) AS n_queries
       |FROM grid g LEFT JOIN hits h
       |  ON g.probes = h.probes AND g.q_id = h.q_id
       |GROUP BY g.probes""".stripMargin

  // ---- semantic dedup within trained cells (SemDeDup shape) -----------------

  /** Within-cell cosine floor above which the higher-id vector is dropped
    * as a semantic duplicate. */
  private val SemTau = 0.3

  /** Semantic dedup in the published cluster-then-prune shape: k-means
    * cells from the SHARED trained quantizer bound the pair search, and
    * within each cell any vector whose cosine to a lower-id cell-mate
    * reaches SemTau is dropped (keep-lowest-id — deterministic). This is
    * what makes semantic dedup subquadratic at 100 TB: pair generation is
    * Σ|cell|², never corpus², and tightening K trades recall for cost.
    * Output: per-cell members / dropped / kept. */
  def semDedup(spark: SparkSession, sfDir: String): DataFrame = {
    val (_, asg) = kmeansTrain(spark, sfDir)
    val m = emb(spark, sfDir)
      .join(asg.select(col("vec_id"), col("cell")), Seq("vec_id"))
    val drops = m.as("a").join(m.as("b"),
        col("a.cell") === col("b.cell") &&
          col("a.vec_id") < col("b.vec_id"))
      .filter(cosineSim(col("a.embedding"), col("b.embedding")) >= SemTau)
      .select(col("a.cell").as("cell"), col("b.vec_id").as("vb"))
      .distinct()
      .groupBy(col("cell")).agg(count(lit(1)).as("n_dropped"))
    asg.groupBy(col("cell")).agg(count(lit(1)).as("n_vecs"))
      .join(drops, Seq("cell"), "left_outer")
      .select(col("cell"), col("n_vecs"),
        coalesce(col("n_dropped"), lit(0L)).as("n_dropped"),
        (col("n_vecs") - coalesce(col("n_dropped"), lit(0L))).as("n_kept"))
  }

  val semDedupSql: String =
    s"""WITH $kmeansChainSql, pr AS (
       |  SELECT ma.cell, ma.vec_id AS va, mb.vec_id AS vb,
       |    SUM(a.x * b.x) AS dot
       |  FROM asg$KmIters ma JOIN asg$KmIters mb
       |    ON ma.cell = mb.cell AND ma.vec_id < mb.vec_id
       |    JOIN exf a ON a.vec_id = ma.vec_id
       |    JOIN exf b ON b.vec_id = mb.vec_id AND b.i = a.i
       |  GROUP BY 1, 2, 3
       |), drops AS (
       |  SELECT cell, COUNT(DISTINCT vb) AS n_dropped
       |  FROM pr JOIN nrm na ON va = na.vec_id
       |    JOIN nrm nb ON vb = nb.vec_id
       |  WHERE dot / (na.nrm * nb.nrm) >= $SemTau
       |  GROUP BY cell
       |)
       |SELECT g.cell, g.n_vecs,
       |  CAST(COALESCE(d.n_dropped, 0) AS BIGINT) AS n_dropped,
       |  g.n_vecs - CAST(COALESCE(d.n_dropped, 0) AS BIGINT) AS n_kept
       |FROM (SELECT cell, COUNT(*) AS n_vecs FROM asg$KmIters GROUP BY cell) g
       |  LEFT JOIN drops d ON g.cell = d.cell""".stripMargin

  // ---- ANN quality: recall of LSH vs exact ----------------------------------

  /** Per-table 4-bit sign bucket for OR-amplified LSH: table `t` reads 4
    * sign bits from its own 16-dim block (dims t·16 + {1,5,9,13},
    * 1-based). */
  private def bucket4(t: Int): Column =
    concat((0 until 4).map { j =>
      when(expr(s"element_at(embedding, ${t * 16 + 1 + j * 4})") >= 0f, "1")
        .otherwise("0")
    }: _*)

  private def bucket4Sql(t: Int): String = (0 until 4)
    .map(j => s"CASE WHEN CAST(embedding[${t * 16 + 1 + j * 4}] AS FLOAT) " +
      ">= 0 THEN '1' ELSE '0' END").mkString(" || ")

  /** Recall@5 of sign-LSH ANN against exact brute-force top-5, for TWO
    * designs: the single 8-bit table (AND-amplified — tiny candidate
    * sets, low recall on structureless data) and 4 OR-amplified 4-bit
    * tables (union of 4 bucket joins — ~4× the candidates, several times
    * the recall). The measurement that justifies the bucket-design knob;
    * denominator fixed at 5 (strict recall). */
  def annRecall(spark: SparkSession, sfDir: String): DataFrame = {
    val e = emb(spark, sfDir)
    val q = e.filter(col("vec_id") < 50)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val exact = e.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .withColumn("cosine", cosineSim(col("embedding"), col("q_emb")))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(round(col("cosine"), 6).desc, col("vec_id"))
    val exactTop = exact.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select(col("q_id"), col("vec_id").as("neighbor_id"))

    def recallOf(lshTop: DataFrame, method: String): DataFrame = {
      val hits = exactTop.join(lshTop, Seq("q_id", "neighbor_id"))
        .groupBy(col("q_id")).agg(count(lit(1)).as("n_hits"))
      exactTop.select(col("q_id")).distinct()
        .join(hits, Seq("q_id"), "left_outer")
        .select(coalesce(col("n_hits"), lit(0L)).as("n_hits"))
        .agg(round(avg(col("n_hits")) / 5.0, 4).as("avg_recall_at_5"),
          count(lit(1)).as("n_queries"))
        .withColumn("method", lit(method))
    }

    val single = recallOf(lshAnnTopK(spark, sfDir)
      .select(col("q_id"), col("neighbor_id")), "lsh_8bit_x1")

    // OR-amplification: candidates = union over 4 tables of bucket joins
    val multiCand = (0 until 4).map { t =>
      val et = e.select(col("vec_id"), bucket4(t).as("bk"))
      val qt = q.select(col("q_id"), col("q_emb"))
        .join(e.select(col("vec_id").as("q_id"), bucket4(t).as("bk")), Seq("q_id"))
      et.join(qt, Seq("bk")).filter(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id").as("neighbor_id"))
    }.reduce(_ unionByName _).distinct()
    val multiScored = multiCand
      .join(e.select(col("vec_id").as("neighbor_id"), col("embedding")),
        Seq("neighbor_id"))
      .join(broadcast(q), Seq("q_id"))
      .withColumn("cosine", cosineSim(col("embedding"), col("q_emb")))
    val wN = Window.partitionBy(col("q_id"))
      .orderBy(round(col("cosine"), 6).desc, col("neighbor_id"))
    val multiTop = multiScored.withColumn("rk", row_number().over(wN))
      .filter(col("rk") <= 5)
      .select(col("q_id"), col("neighbor_id"))
    val multi = recallOf(multiTop, "lsh_4bit_x4")

    single.unionByName(multi).select("method", "avg_recall_at_5", "n_queries")
  }

  val annRecallSql: String =
    s"""WITH $embCte, dots AS (
       |  SELECT a.vec_id AS q_id, b.vec_id AS neighbor_id, SUM(a.x * b.x) AS dot
       |  FROM ex a JOIN ex b ON a.i = b.i AND a.vec_id < 50
       |    AND b.vec_id <> a.vec_id
       |  GROUP BY 1, 2
       |), scored AS (
       |  SELECT q_id, neighbor_id, ROUND(dot / (na.nrm * nb.nrm), 6) AS cosine
       |  FROM dots JOIN nrm na ON q_id = na.vec_id
       |    JOIN nrm nb ON neighbor_id = nb.vec_id
       |  WHERE na.nrm > 0 AND nb.nrm > 0
       |), exact_top AS (
       |  SELECT q_id, neighbor_id FROM (
       |    SELECT q_id, neighbor_id, row_number() OVER (PARTITION BY q_id
       |      ORDER BY cosine DESC, neighbor_id) AS rk FROM scored
       |  ) WHERE rk <= 5
       |), bk AS (
       |  SELECT vec_id, $bucketExpr AS bucket FROM embeddings
       |), lsh1_top AS (
       |  SELECT q_id, neighbor_id FROM (
       |    SELECT s.q_id, s.neighbor_id, row_number() OVER (PARTITION BY s.q_id
       |      ORDER BY s.cosine DESC, s.neighbor_id) AS rk
       |    FROM scored s
       |      JOIN bk qb ON s.q_id = qb.vec_id
       |      JOIN bk cb ON s.neighbor_id = cb.vec_id AND qb.bucket = cb.bucket
       |  ) WHERE rk <= 5
       |), bk4 AS (
       |  ${(0 until 4).map(t =>
            s"SELECT vec_id, $t AS tbl, ${bucket4Sql(t)} AS bucket FROM embeddings")
            .mkString("\n  UNION ALL\n  ")}
       |), cand4 AS (
       |  SELECT DISTINCT qb.vec_id AS q_id, cb.vec_id AS neighbor_id
       |  FROM bk4 qb JOIN bk4 cb
       |    ON qb.tbl = cb.tbl AND qb.bucket = cb.bucket
       |    AND qb.vec_id < 50 AND cb.vec_id <> qb.vec_id
       |), lsh4_top AS (
       |  SELECT q_id, neighbor_id FROM (
       |    SELECT s.q_id, s.neighbor_id, row_number() OVER (PARTITION BY s.q_id
       |      ORDER BY s.cosine DESC, s.neighbor_id) AS rk
       |    FROM scored s JOIN cand4 c
       |      ON s.q_id = c.q_id AND s.neighbor_id = c.neighbor_id
       |  ) WHERE rk <= 5
       |), qs AS (
       |  SELECT DISTINCT q_id FROM exact_top
       |), h1 AS (
       |  SELECT e.q_id, COUNT(*) AS n FROM exact_top e
       |  JOIN lsh1_top l ON e.q_id = l.q_id AND e.neighbor_id = l.neighbor_id
       |  GROUP BY 1
       |), h4 AS (
       |  SELECT e.q_id, COUNT(*) AS n FROM exact_top e
       |  JOIN lsh4_top l ON e.q_id = l.q_id AND e.neighbor_id = l.neighbor_id
       |  GROUP BY 1
       |)
       |SELECT 'lsh_8bit_x1' AS method,
       |  ROUND(AVG(COALESCE(n, 0)) / 5.0, 4) AS avg_recall_at_5,
       |  COUNT(*) AS n_queries
       |FROM qs LEFT JOIN h1 USING (q_id)
       |UNION ALL
       |SELECT 'lsh_4bit_x4',
       |  ROUND(AVG(COALESCE(n, 0)) / 5.0, 4), COUNT(*)
       |FROM qs LEFT JOIN h4 USING (q_id)""".stripMargin

  // ---- int8 scalar quantization: compression vs recall ----------------------

  /** Recall@5 of INT8-quantized cosine vs exact float cosine — the
    * compression dial of a vector store (4× smaller vectors, integer
    * dot products). Per-vector max-abs scaling: q_i = floor(x_i·127/mx
    * + 0.5); the scale cancels inside cosine, so only rounding error
    * remains. floor(+0.5) rather than round() because the two engines
    * disagree on round-half cases; floor of the same double is identical
    * everywhere, which ALSO makes the quantized path fully deterministic
    * (integer dots, exact doubles). Plan shape matches the brute-force
    * baseline: query set broadcast, corpus scanned once, per-query window
    * pruned by WindowGroupLimit. */
  def int8Recall(spark: SparkSession, sfDir: String): DataFrame = {
    val qe = emb(spark, sfDir)
      .withColumn("mx", expr("aggregate(embedding, CAST(0.0 AS DOUBLE), " +
        "(m, x) -> greatest(m, abs(CAST(x AS DOUBLE))))"))
      .withColumn("qvec", expr("transform(embedding, x -> CAST(CAST(" +
        "floor(CAST(x AS DOUBLE) * 127.0 / mx + 0.5) AS INT) AS FLOAT))"))
      .select(col("vec_id"), col("embedding"), col("qvec"))
    val q = qe.filter(col("vec_id") < 50)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("qvec").as("q_qvec"))
    val joined = qe.join(broadcast(q), col("vec_id") =!= col("q_id"))
    def top5(scoreCol: Column): DataFrame = {
      val w = Window.partitionBy(col("q_id"))
        .orderBy(round(scoreCol, 6).desc, col("vec_id"))
      joined.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 5)
        .select(col("q_id"), col("vec_id").as("neighbor_id"))
    }
    val exactTop = top5(cosineSim(col("embedding"), col("q_emb")))
    val q8Top = top5(cosineSim(col("qvec"), col("q_qvec")))
    val hits = exactTop.join(q8Top, Seq("q_id", "neighbor_id"))
      .groupBy(col("q_id")).agg(count(lit(1)).as("n_hits"))
    exactTop.select(col("q_id")).distinct()
      .join(hits, Seq("q_id"), "left_outer")
      .select(coalesce(col("n_hits"), lit(0L)).as("n_hits"))
      .agg(round(avg(col("n_hits")) / 5.0, 4).as("avg_recall_at_5"),
        count(lit(1)).as("n_queries"))
      .withColumn("method", lit("int8_maxabs"))
      .select("method", "avg_recall_at_5", "n_queries")
  }

  val int8RecallSql: String =
    s"""WITH $embCte, dots AS (
       |  SELECT a.vec_id AS q_id, b.vec_id AS neighbor_id, SUM(a.x * b.x) AS dot
       |  FROM ex a JOIN ex b ON a.i = b.i AND a.vec_id < 50
       |    AND b.vec_id <> a.vec_id
       |  GROUP BY 1, 2
       |), scored AS (
       |  SELECT q_id, neighbor_id, ROUND(dot / (na.nrm * nb.nrm), 6) AS cosine
       |  FROM dots JOIN nrm na ON q_id = na.vec_id
       |    JOIN nrm nb ON neighbor_id = nb.vec_id
       |  WHERE na.nrm > 0 AND nb.nrm > 0
       |), exact_top AS (
       |  SELECT q_id, neighbor_id FROM (
       |    SELECT q_id, neighbor_id, row_number() OVER (PARTITION BY q_id
       |      ORDER BY cosine DESC, neighbor_id) AS rk FROM scored
       |  ) WHERE rk <= 5
       |), mx AS (
       |  SELECT vec_id, MAX(abs(x)) AS mx FROM ex GROUP BY vec_id
       |), qx AS (
       |  SELECT e.vec_id, e.i, FLOOR(e.x * 127.0 / m.mx + 0.5) AS qx
       |  FROM ex e JOIN mx m ON e.vec_id = m.vec_id WHERE m.mx > 0
       |), qnrm AS (
       |  SELECT vec_id, sqrt(SUM(qx * qx)) AS qn FROM qx GROUP BY vec_id
       |), qdots AS (
       |  SELECT a.vec_id AS q_id, b.vec_id AS neighbor_id, SUM(a.qx * b.qx) AS dot
       |  FROM qx a JOIN qx b ON a.i = b.i AND a.vec_id < 50
       |    AND b.vec_id <> a.vec_id
       |  GROUP BY 1, 2
       |), qscored AS (
       |  SELECT q_id, neighbor_id, ROUND(dot / (na.qn * nb.qn), 6) AS qcos
       |  FROM qdots JOIN qnrm na ON q_id = na.vec_id
       |    JOIN qnrm nb ON neighbor_id = nb.vec_id
       |  WHERE na.qn > 0 AND nb.qn > 0
       |), q8_top AS (
       |  SELECT q_id, neighbor_id FROM (
       |    SELECT q_id, neighbor_id, row_number() OVER (PARTITION BY q_id
       |      ORDER BY qcos DESC, neighbor_id) AS rk FROM qscored
       |  ) WHERE rk <= 5
       |), qs AS (SELECT DISTINCT q_id FROM exact_top),
       |h AS (
       |  SELECT e.q_id, COUNT(*) AS n FROM exact_top e
       |  JOIN q8_top l ON e.q_id = l.q_id AND e.neighbor_id = l.neighbor_id
       |  GROUP BY 1
       |)
       |SELECT 'int8_maxabs' AS method,
       |  ROUND(AVG(COALESCE(n, 0)) / 5.0, 4) AS avg_recall_at_5,
       |  COUNT(*) AS n_queries
       |FROM qs LEFT JOIN h USING (q_id)""".stripMargin

  // ---- product quantization (PQ): trained codebooks + ADC top-k -------------

  /** PQ geometry: Dim=64 splits into PqM=4 subspaces of PqSubDim=16 dims;
    * each subspace trains PqK=16 codes with PqIters=2 Lloyd rounds. A
    * corpus vector compresses to 4 codes (PqM·log2(PqK) = 16 bits vs
    * 64 floats = 256 bytes — the 128× memory dial a 100 TB vector store
    * actually turns; production raises PqK to 256, same shape. Round 8:
    * PqK 4→16 — the r7 attribution run showed code loss dominating the
    * IVF-PQ recall (flat-PQ recall 0.048 at k=4 vs a 0.576 probe ceiling),
    * so the codebook, not the probe count, was the knob to turn. */
  private[graft] val PqM = 4
  private[graft] val PqSubDim = Dim / PqM
  private val PqK = 16
  private val PqIters = 2

  /** (vec_id, sub, sxs): each vector exploded into its PqM sub-vectors
    * (double arrays) — PqM rows per vector, the unit PQ trains on. */
  private def subVecs(spark: SparkSession, sfDir: String): DataFrame =
    emb(spark, sfDir)
      .select(col("vec_id"),
        expr("transform(embedding, v -> CAST(v AS DOUBLE))").as("xs"))
      .select(col("vec_id"), explode(expr(
        s"transform(sequence(0, ${PqM - 1}), s -> struct(s AS sub, " +
          s"slice(xs, s * $PqSubDim + 1, $PqSubDim) AS sxs))")).as("t"))
      .select(col("vec_id"), col("t.sub").as("sub"), col("t.sxs").as("sxs"))

  /** Per-(sub, cell) centroid arrays in local-dim order — the broadcast
    * side of every PQ distance step (PqM·PqK rows, always tiny). */
  private[graft] def pqCentArrays(cent: DataFrame): DataFrame =
    cent.groupBy(col("sub"), col("cell"))
      .agg(expr("transform(array_sort(collect_list(struct(j, cx))), " +
        "s -> s.cx)").as("cxs"))

  /** One trained PQ model per (session, SF) — s_pq_cells, s_pq_topk and
    * s_pq_recall all consume the same training (same shared-intermediate
    * pattern as kmCache). */
  // fingerprint-keyed like kmCache (same regeneration-staleness hazard:
  // the streaming-codes twin and any layout built on PQ codes must never
  // pair new vectors with a codebook trained on the old bytes)
  private val pqCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), (String, DataFrame, DataFrame)]

  /** Drop all cached PQ models (clearKmeansCache counterpart). */
  def clearPqCache(): Unit = {
    // same double-backing as clearKmeansCache: the codebook is a
    // localCheckpoint under a persist — unpersistModel frees both.
    // Builder monitor held, like clearKmeansCache.
    pqCache.synchronized {
      pqCache.values.foreach { case (_, cent, codes) =>
        unpersistModel(cent, codes) }
      pqCache.clear()
    }
  }

  /** Force the shared PQ model to materialize (Bench's shared_pq_model
    * entry, so the three consumers time steady-state plans). */
  def materializePq(spark: SparkSession, sfDir: String): Unit = {
    val (cent, codes) = pqTrain(spark, sfDir)
    cent.count(); codes.count(); ()
  }

  /** The trained PQ codebook (sub, cell, j, cx) — the model's broadcast
    * half, for the streaming encoder (kmeansCentroids counterpart). */
  private[graft] def pqCodebook(spark: SparkSession,
      sfDir: String): DataFrame = pqTrain(spark, sfDir)._1

  /** The trained PQ codes (vec_id, sub, cell, d) — the corpus-side half,
    * for batch-parity checks against the streaming encoder. */
  private[graft] def pqTrainedCodes(spark: SparkSession,
      sfDir: String): DataFrame = pqTrain(spark, sfDir)._2

  private def pqTrain(spark: SparkSession,
      sfDir: String): (DataFrame, DataFrame) = pqCache.synchronized {
    val fp = graft.sources.SourceFingerprint.key(sfDir, "embeddings.parquet")
    pqCache.get((spark, sfDir)) match {
      case Some((`fp`, cent, codes)) => (cent, codes)
      case stale =>
        stale.foreach { case (_, cent, codes) => unpersistModel(cent, codes) }
        val (cent, codes) = pqTrainCompute(spark, sfDir)
        cent.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        codes.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        pqCache.put((spark, sfDir), (fp, cent, codes))
        (cent, codes)
    }
  }

  /** Per-subspace Lloyd — ONE training chain for all PqM subspaces at
    * once: adding `sub` to every key turns the k-means recurrence into
    * PqM independent trainings sharing each shuffle (vs looping subspaces
    * driver-side, which would schedule PqM× the jobs for the same rows).
    * Determinism discipline is kmeansTrainCompute's: every distance and
    * centroid mean rounds to 6 decimals per round, argmin ranks on
    * (rounded d, cell), seeds are the first PqK vectors' sub-vectors.
    * Returns (codebook the final assignment was computed against:
    * (sub, cell, j, cx) with j the LOCAL dim 1..PqSubDim, final codes:
    * (vec_id, sub, cell, d)). Same per-round localCheckpoint
    * materialization (and the same executor-loss caveat — swap in
    * reliable checkpoint() on a real cluster). */
  private def pqTrainCompute(spark: SparkSession,
      sfDir: String): (DataFrame, DataFrame) =
    pqLloyd(subVecs(spark, sfDir))

  /** The PqM-subspaces-in-one-chain Lloyd recurrence over any
    * (vec_id, sub, sxs) frame — shared by the plain-PQ training (sub-
    * vectors of the raw embeddings) and the IVF-PQ training (sub-vectors
    * of the coarse-cell RESIDUALS).
    *
    * `micro = false` (plain PQ, double sxs): the kmeans determinism
    * discipline — distances and centroid means round at 6 decimals.
    * That is safe there because the inputs are raw float-cast doubles,
    * whose rounded values land on half-ulp decimal boundaries with
    * negligible probability.
    *
    * `micro = true` (IVF-PQ, long microunit sxs): residuals are EXACT
    * 6-decimal values, so a centroid mean (sum of exact decimals / n)
    * sits EXACTLY on the 6th-decimal half boundary with ~10% per-
    * coordinate probability — and there, cross-engine ulp noise in a
    * double AVG flips ROUND(·, 6) (observed: one codebook entry off by
    * 1e-6 poisoning every downstream ADC row for its code). So this
    * path stays in integer microunits end-to-end: distances are exact
    * long sums (no rounding anywhere), and the centroid mean divides
    * two exactly-representable longs — both engines round the SAME
    * IEEE double, which is deterministic even exactly on a boundary. */
  private def pqLloyd(sv: DataFrame,
      micro: Boolean = false): (DataFrame, DataFrame) = {
    // exploded (vec_id, sub, local dim j, x) — the centroid-mean side
    val exs = sv.select(col("vec_id"), col("sub"), posexplode(col("sxs")))
      .select(col("vec_id"), col("sub"), (col("pos") + 1).as("j"),
        col("col").as("x"))
    var cent = exs.filter(col("vec_id") < PqK)
      .select(col("sub"), col("vec_id").as("cell"), col("j"),
        (if (micro) col("x") else round(col("x"), 6)).as("cx"))
    var asg: DataFrame = null
    for (k <- 1 to PqIters) {
      val dist = sv.join(broadcast(pqCentArrays(cent)), Seq("sub"))
        .select(col("vec_id"), col("sub"), col("cell"),
          (if (micro) sqDistLong(col("sxs"), col("cxs"))
           else round(sqDist(col("sxs"), col("cxs")), 6))
            .as("d"))
      // same aggregate-not-window nearest-cell pick as the kmeans loop
      // (round 15): min(struct(d, cell)) per (vec_id, sub) partial-
      // aggregates the n·PqM·PqK distance rows map-side before the
      // exchange and drops the per-group sort; struct ordering equals
      // the old orderBy(d, cell), so assignments are identical.
      asg = dist.groupBy(col("vec_id"), col("sub"))
        .agg(min(struct(col("d"), col("cell"))).as("m"))
        .select(col("vec_id"), col("sub"), col("m.cell").as("cell"),
          col("m.d").as("d"))
      // the final assignment IS the model output — no round-PqIters
      // centroid recompute (kmeansTrainCompute pays one; here the skipped
      // job also avoids leaking an unconsumed checkpoint's blocks)
      // with PqIters=2 only round 1 recomputes, and the seed it
      // replaces is a plain plan (nothing to free) — no stale-checkpoint
      // bookkeeping like the 3-round kmeans loop needs
      if (k < PqIters) {
        // array-form update join (round 16, guide §3.3 — see the kmeans
        // loop): n·M rows instead of n·M·subDim through the per-round
        // join. micro path unchanged in value (long sums are order-free
        // exact); double path rides the documented round(·, 6) argument.
        cent = sv
          .join(asg.select("vec_id", "sub", "cell"), Seq("vec_id", "sub"))
          .select(col("sub"), col("cell"), posexplode(col("sxs")))
          .select(col("sub"), col("cell"), (col("pos") + 1).as("j"),
            col("col").as("x"))
          .groupBy(col("sub"), col("cell"), col("j"))
          .agg((if (micro)
              round(sum(col("x")) / count(lit(1)), 0).cast("long")
            else round(avg(col("x")), 6)).as("cx"))
          .coalesce(1)
          .truncateLineage(true)
      }
    }
    (cent, asg)
  }

  /** Training summary: per (sub, cell) membership + quantization error
    * after the final round — the codebook-health census (an empty or
    * bloated cell here is what re-seeding/splitting heuristics act on). */
  def pqCells(spark: SparkSession, sfDir: String): DataFrame = {
    val (_, codes) = pqTrain(spark, sfDir)
    codes.groupBy(col("sub"), col("cell"))
      .agg(count(lit(1)).as("n_vecs"), round(sum(col("d")), 3).as("sq_err"))
  }

  /** ADC (asymmetric distance computation) top-5: the query keeps its
    * exact sub-vectors; each corpus vector is represented ONLY by its PqM
    * codes, and its distance is the sum of the query's precomputed
    * sub-distances to the coded centroids. Plan shape for 100 TB: the
    * per-query distance table qcd is Q·PqM·PqK rows (always broadcast);
    * the corpus side scans the CODES table — PqM small ints per vector,
    * the 256×-compressed representation, never the float embeddings —
    * and one partial-aggregated shuffle of Q·n grouped rows ranks the
    * candidates. ADC ties are inherent (finitely many distinct code
    * words) and break on vec_id, so the output is total-ordered. */
  def pqAdcTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val (cent, codes) = pqTrain(spark, sfDir)
    val qcd = subVecs(spark, sfDir).filter(col("vec_id") < 50)
      .join(broadcast(pqCentArrays(cent)), Seq("sub"))
      .select(col("vec_id").as("q_id"), col("sub"), col("cell"),
        round(sqDist(col("sxs"), col("cxs")), 6)
          .as("qd"))
    val adc = codes.select(col("vec_id"), col("sub"), col("cell"))
      .join(broadcast(qcd), Seq("sub", "cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .groupBy(col("q_id"), col("vec_id"))
      .agg(round(sum(col("qd")), 6).as("adc"))
    // top-5 via TopKPerKey (round 15): the window sorted the whole
    // (q, vec) ADC table per query; the bounded-heap partial prunes each
    // partition to <= 5 rows per query before the exchange. (adc, vec_id)
    // is a total order within a query, so ranks are identical.
    val top = graft.plans.TopK.perKey(adc, keyCols = Seq("q_id"),
      orderSpec = Seq(("adc", true), ("vec_id", true)), k = 5)
    val w = Window.partitionBy(col("q_id")).orderBy(col("adc"), col("vec_id"))
    top.withColumn("rk", row_number().over(w))
      .select(col("q_id"), col("vec_id").as("neighbor_id"), col("adc"),
        col("rk"))
  }

  /** Recall@5 of ADC top-5 vs the exact euclidean top-5 (same metric PQ
    * approximates) — the compression-vs-recall dial read as query output,
    * companion to s_int8_recall (scalar) and s_probe_curve (IVF). */
  def pqRecall(spark: SparkSession, sfDir: String): DataFrame = {
    val vecs = emb(spark, sfDir)
      .select(col("vec_id"),
        expr("transform(embedding, v -> CAST(v AS DOUBLE))").as("xs"))
    val q = vecs.filter(col("vec_id") < 50)
      .select(col("vec_id").as("q_id"), col("xs").as("qxs"))
    val wE = Window.partitionBy(col("q_id")).orderBy(col("d2"), col("vec_id"))
    val exactTop = vecs.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .withColumn("d2", round(sqDist(col("xs"), col("qxs")), 6))
      .withColumn("rk", row_number().over(wE))
      .filter(col("rk") <= 5)
      .select(col("q_id"), col("vec_id").as("neighbor_id"))
    val pqTop = pqAdcTopK(spark, sfDir).select(col("q_id"), col("neighbor_id"))
    val hits = exactTop.join(pqTop, Seq("q_id", "neighbor_id"))
      .groupBy(col("q_id")).agg(count(lit(1)).as("n_hits"))
    exactTop.select(col("q_id")).distinct()
      .join(hits, Seq("q_id"), "left_outer")
      .select(coalesce(col("n_hits"), lit(0L)).as("n_hits"))
      .agg(round(avg(col("n_hits")) / 5.0, 4).as("avg_recall_at_5"),
        count(lit(1)).as("n_queries"))
      .withColumn("method", lit(s"pq_m${PqM}_k$PqK"))
      .select("method", "avg_recall_at_5", "n_queries")
  }

  /** Shared DuckDB chain: sub-exploded vectors `sx(vec_id, sub, j, x)`,
    * seed `pcent0`, unrolled rounds ending at final codes `pasg2`
    * (computed against `pcent1`). Mirrors kmeansChainSql with `sub` added
    * to every key. */
  private val pqChainSql: String = {
    def asg(k: Int): String =
      s"""pasg$k AS (
         |  SELECT vec_id, sub, cell, d FROM (
         |    SELECT vec_id, sub, cell, d, row_number() OVER (
         |      PARTITION BY vec_id, sub ORDER BY d, cell) AS rn
         |    FROM (
         |      SELECT s.vec_id, s.sub, c.cell,
         |        ROUND(SUM((s.x - c.cx) * (s.x - c.cx)), 6) AS d
         |      FROM sx s JOIN pcent${k - 1} c ON s.sub = c.sub AND s.j = c.j
         |      GROUP BY 1, 2, 3)
         |  ) WHERE rn = 1
         |)""".stripMargin
    def cent(k: Int): String =
      s"""pcent$k AS (
         |  SELECT a.sub, a.cell, s.j, ROUND(AVG(s.x), 6) AS cx
         |  FROM sx s JOIN pasg$k a ON s.vec_id = a.vec_id AND s.sub = a.sub
         |  GROUP BY a.sub, a.cell, s.j
         |)""".stripMargin
    s"""$embCte, exf AS (
       |  SELECT ex.vec_id, ex.i, ex.x FROM ex
       |  JOIN nrm ON ex.vec_id = nrm.vec_id WHERE nrm.nrm > 0
       |), sx AS (
       |  SELECT vec_id, CAST((i - 1) // $PqSubDim AS INT) AS sub,
       |    CAST(i - ((i - 1) // $PqSubDim) * $PqSubDim AS INT) AS j, x
       |  FROM exf
       |), pcent0 AS (
       |  SELECT sub, vec_id AS cell, j, ROUND(x, 6) AS cx
       |  FROM sx WHERE vec_id < $PqK
       |), ${asg(1)}, ${cent(1)}, ${asg(2)}""".stripMargin
  }

  /** qcd + adc: query sub-distances to the final codebook, summed over
    * the corpus codes. */
  private val pqAdcCtes: String =
    s"""qcd AS (
       |  SELECT s.vec_id AS q_id, s.sub, c.cell,
       |    ROUND(SUM((s.x - c.cx) * (s.x - c.cx)), 6) AS qd
       |  FROM sx s JOIN pcent${PqIters - 1} c ON s.sub = c.sub AND s.j = c.j
       |  WHERE s.vec_id < 50 GROUP BY 1, 2, 3
       |), adc AS (
       |  SELECT q.q_id, a.vec_id, ROUND(SUM(q.qd), 6) AS adc
       |  FROM pasg$PqIters a JOIN qcd q ON a.sub = q.sub AND a.cell = q.cell
       |  WHERE a.vec_id <> q.q_id GROUP BY 1, 2
       |)""".stripMargin

  val pqCellsSql: String =
    s"""WITH $pqChainSql
       |SELECT sub, cell, COUNT(*) AS n_vecs, ROUND(SUM(d), 3) AS sq_err
       |FROM pasg$PqIters GROUP BY sub, cell""".stripMargin

  val pqAdcTopKSql: String =
    s"""WITH $pqChainSql, $pqAdcCtes
       |SELECT q_id, neighbor_id, adc, rk FROM (
       |  SELECT q_id, vec_id AS neighbor_id, adc,
       |    CAST(row_number() OVER (PARTITION BY q_id
       |      ORDER BY adc, vec_id) AS INT) AS rk
       |  FROM adc
       |) WHERE rk <= 5""".stripMargin

  val pqRecallSql: String =
    s"""WITH $pqChainSql, $pqAdcCtes, ed AS (
       |  SELECT a.vec_id AS q_id, b.vec_id AS neighbor_id,
       |    ROUND(SUM((a.x - b.x) * (a.x - b.x)), 6) AS d2
       |  FROM exf a JOIN exf b ON a.i = b.i AND a.vec_id < 50
       |    AND b.vec_id <> a.vec_id
       |  GROUP BY 1, 2
       |), exact_top AS (
       |  SELECT q_id, neighbor_id FROM (
       |    SELECT q_id, neighbor_id, row_number() OVER (PARTITION BY q_id
       |      ORDER BY d2, neighbor_id) AS rk FROM ed
       |  ) WHERE rk <= 5
       |), pq_top AS (
       |  SELECT q_id, neighbor_id FROM (
       |    SELECT q_id, vec_id AS neighbor_id, row_number() OVER (
       |      PARTITION BY q_id ORDER BY adc, vec_id) AS rk
       |    FROM adc
       |  ) WHERE rk <= 5
       |), qs AS (SELECT DISTINCT q_id FROM exact_top),
       |h AS (
       |  SELECT e.q_id, COUNT(*) AS n FROM exact_top e
       |  JOIN pq_top l ON e.q_id = l.q_id AND e.neighbor_id = l.neighbor_id
       |  GROUP BY 1
       |)
       |SELECT 'pq_m${PqM}_k$PqK' AS method,
       |  ROUND(AVG(COALESCE(n, 0)) / 5.0, 4) AS avg_recall_at_5,
       |  COUNT(*) AS n_queries
       |FROM qs LEFT JOIN h USING (q_id)""".stripMargin

  // ---- IVF-PQ (coarse cells + residual codes, the Faiss IVFADC shape) -------

  /** Coarse cells probed per query in the IVF-PQ search. Round 8: 2→4 —
    * s_probe_curve on the regenerated embeddings put the probe ceiling at
    * 0.576 recall@5 for 2 probes vs 0.78 for 4; with the code loss fixed
    * (PqK 4→16) the probe count became the binding knob. */
  private val IvfPqProbes = 4

  /** Per-cell centroid arrays in dimension order — the broadcast side of
    * the coarse probe and of the residual computation (KmK rows). */
  private[graft] def coarseCentArrays(cent: DataFrame): DataFrame =
    cent.groupBy(col("cell"))
      .agg(expr("transform(array_sort(collect_list(struct(i, cx))), " +
        "s -> s.cx)").as("cxs"))

  /** Sub-vector explode of an `rxs` residual column — the same PqM-slice
    * shape subVecs gives raw embeddings. */
  private[graft] def subExplode: Column =
    explode(expr(
      s"transform(sequence(0, ${PqM - 1}), s -> struct(s AS sub, " +
        s"slice(rxs, s * $PqSubDim + 1, $PqSubDim) AS sxs))"))

  /** A residual coordinate in integer MICROUNITS — round((a−b)·1e6) of
    * two identical doubles is the same long in any engine, and all
    * downstream arithmetic on it is exact (see pqLloyd's micro doc). */
  private val residMicro: String =
    "zip_with(xs, cxs, (a, b) -> CAST(round((a - b) * 1e6, 0) AS BIGINT))"

  /** (vec_id, sub, sxs) of the COARSE-CELL RESIDUALS (vec − its trained
    * centroid) in integer microunits — what IVF-PQ trains its codebook
    * on. */
  private[graft] def residualSubVecs(spark: SparkSession, sfDir: String): DataFrame = {
    val (cent, asg) = kmeansTrain(spark, sfDir)
    emb(spark, sfDir)
      .select(col("vec_id"),
        expr("transform(embedding, v -> CAST(v AS DOUBLE))").as("xs"))
      .join(asg.select("vec_id", "cell"), Seq("vec_id"))
      .join(broadcast(coarseCentArrays(cent)), Seq("cell"))
      .select(col("vec_id"), expr(residMicro).as("rxs"))
      .select(col("vec_id"), subExplode.as("t"))
      .select(col("vec_id"), col("t.sub").as("sub"), col("t.sxs").as("sxs"))
  }

  // fingerprint-keyed like kmCache/pqCache; the codes side carries each
  // vector's coarse cell so serving never re-joins the corpus assignment
  private val ivfpqCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), (String, DataFrame, DataFrame)]

  /** Drop all cached IVF-PQ models. Also called by clearKmeansCache: the
    * residual model is DERIVED from the coarse model, and surviving it
    * would pair stale residual codes with a retrained quantizer. */
  def clearIvfPqCache(): Unit = {
    ivfpqCache.synchronized {
      ivfpqCache.values.foreach { case (_, cent, codes) =>
        unpersistModel(cent, codes) }
      ivfpqCache.clear()
    }
  }

  /** Force the shared IVF-PQ model to materialize (Bench's
    * shared_ivfpq_model entry). */
  def materializeIvfPq(spark: SparkSession, sfDir: String): Unit = {
    val (cent, codes) = ivfpqTrain(spark, sfDir)
    cent.count(); codes.count(); ()
  }

  private[graft] def ivfpqTrain(spark: SparkSession,
      sfDir: String): (DataFrame, DataFrame) = ivfpqCache.synchronized {
    val fp = graft.sources.SourceFingerprint.key(sfDir, "embeddings.parquet")
    ivfpqCache.get((spark, sfDir)) match {
      case Some((`fp`, cent, codes)) => (cent, codes)
      case stale =>
        stale.foreach { case (_, cent, codes) => unpersistModel(cent, codes) }
        val (rcent, rasg) = pqLloyd(residualSubVecs(spark, sfDir),
          micro = true)
        val codes = rasg.join(
          kmeansAssignment(spark, sfDir)
            .select(col("vec_id"), col("cell").as("ccell")), Seq("vec_id"))
        rcent.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        codes.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        ivfpqCache.put((spark, sfDir), (fp, rcent, codes))
        (rcent, codes)
    }
  }

  /** IVF-PQ top-5 — the Faiss IVFADC serving shape, the combination a
    * 100 TB vector store actually deploys: the coarse quantizer prunes
    * the corpus to IvfPqProbes of KmK cells (pair it with the E-94
    * partition layout and the pruning happens at directory metadata),
    * and within probed cells each vector is represented ONLY by its PqM
    * residual codes (the 256× compression dial) scored via ADC against
    * a per-(query, probed-cell) distance table. The residual trick is
    * why this beats flat PQ at equal bits: subtracting the cell
    * centroid shrinks the vector distribution each codebook must cover.
    * Plan shape: query side is ≤ Q·probes·PqM·PqK rows (broadcast);
    * corpus side scans the cached codes table once, the probe filter is
    * the (ccell = pcell) key of the broadcast-hash join — no shuffle of
    * the corpus, one partial-aggregated shuffle at (q, vec) grain. */
  def ivfpqTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val (rcent, codes) = ivfpqTrain(spark, sfDir)
    val cArr = coarseCentArrays(kmeansCentroids(spark, sfDir))
    val q = emb(spark, sfDir).filter(col("vec_id") < 50)
      .select(col("vec_id").as("q_id"),
        expr("transform(embedding, v -> CAST(v AS DOUBLE))").as("xs"))
    val cqd = q.crossJoin(broadcast(cArr))
      .select(col("q_id"), col("cell"),
        sqDistPico(col("xs"), col("cxs")).as("qd"))
    val wP = Window.partitionBy(col("q_id")).orderBy(col("qd"), col("cell"))
    val probed = cqd.withColumn("prk", row_number().over(wP))
      .filter(col("prk") <= IvfPqProbes).select(col("q_id"), col("cell"))
    val rqcd = probed.join(q, Seq("q_id"))
      .join(broadcast(cArr), Seq("cell"))
      .select(col("q_id"), col("cell").as("ccell"),
        expr(residMicro).as("rxs"))
      .select(col("q_id"), col("ccell"), subExplode.as("t"))
      .select(col("q_id"), col("ccell"), col("t.sub").as("sub"),
        col("t.sxs").as("sxs"))
      .join(broadcast(pqCentArrays(rcent)), Seq("sub"))
      .select(col("q_id"), col("ccell"), col("sub"),
        col("cell").as("code"),
        sqDistLong(col("sxs"), col("cxs")).as("qd_pico"))
    // the whole ADC path is exact long arithmetic in picounits (see
    // sqDistPicoSql) — the one division back to a double divides the
    // SAME long in both engines, so the emitted adc is bit-identical
    val adc = codes
      .select(col("vec_id"), col("sub"), col("cell").as("code"), col("ccell"))
      .join(broadcast(rqcd), Seq("ccell", "sub", "code"))
      .filter(col("vec_id") =!= col("q_id"))
      .groupBy(col("q_id"), col("vec_id"))
      .agg((sum(col("qd_pico")) / lit(1.0e12)).as("adc"))
    // top-5 via TopKPerKey — same rationale and identical-rank argument
    // as pqAdcTopK's
    val top = graft.plans.TopK.perKey(adc, keyCols = Seq("q_id"),
      orderSpec = Seq(("adc", true), ("vec_id", true)), k = 5)
    val w = Window.partitionBy(col("q_id")).orderBy(col("adc"), col("vec_id"))
    top.withColumn("rk", row_number().over(w))
      .select(col("q_id"), col("vec_id").as("neighbor_id"), col("adc"),
        col("rk"))
  }

  /** Recall@5 of IVF-PQ vs the exact euclidean top-5 — reads BOTH
    * approximation losses at once (probe misses + code quantization);
    * compare against s_pq_recall (code loss only) and s_probe_curve
    * (probe loss only) to attribute a recall drop to its knob. */
  def ivfpqRecall(spark: SparkSession, sfDir: String): DataFrame = {
    val vecs = emb(spark, sfDir)
      .select(col("vec_id"),
        expr("transform(embedding, v -> CAST(v AS DOUBLE))").as("xs"))
    val q = vecs.filter(col("vec_id") < 50)
      .select(col("vec_id").as("q_id"), col("xs").as("qxs"))
    val wE = Window.partitionBy(col("q_id")).orderBy(col("d2"), col("vec_id"))
    val exactTop = vecs.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .withColumn("d2", sqDistPico(col("xs"), col("qxs")))
      .withColumn("rk", row_number().over(wE))
      .filter(col("rk") <= 5)
      .select(col("q_id"), col("vec_id").as("neighbor_id"))
    val itop = ivfpqTopK(spark, sfDir).select(col("q_id"), col("neighbor_id"))
    val hits = exactTop.join(itop, Seq("q_id", "neighbor_id"))
      .groupBy(col("q_id")).agg(count(lit(1)).as("n_hits"))
    exactTop.select(col("q_id")).distinct()
      .join(hits, Seq("q_id"), "left_outer")
      .select(coalesce(col("n_hits"), lit(0L)).as("n_hits"))
      .agg(round(avg(col("n_hits")) / 5.0, 4).as("avg_recall_at_5"),
        count(lit(1)).as("n_queries"))
      .withColumn("method", lit(s"ivfpq_m${PqM}_k${PqK}_p$IvfPqProbes"))
      .select("method", "avg_recall_at_5", "n_queries")
  }

  /** DuckDB twin: the coarse kmeans chain, then residual sub-vectors
    * `rsx`, the residual codebook rounds rcent0/rasg1/rcent1/rasg2, and
    * the probe + ADC CTEs. */
  /** The residual chain mirrors pqLloyd's `micro = true` discipline:
    * residual coords are integer MICROUNITS, distances exact long sums
    * (no rounding), and centroid means divide two exact longs — the
    * only place engines could disagree on a rounded-6 double AVG of
    * exact decimals (see pqLloyd's micro doc). */
  private val ivfpqChainSql: String = {
    def asg(k: Int): String =
      s"""rasg$k AS (
         |  SELECT vec_id, sub, cell, d FROM (
         |    SELECT vec_id, sub, cell, d, row_number() OVER (
         |      PARTITION BY vec_id, sub ORDER BY d, cell) AS rn
         |    FROM (
         |      SELECT s.vec_id, s.sub, c.cell,
         |        CAST(SUM((s.x - c.cx) * (s.x - c.cx)) AS BIGINT) AS d
         |      FROM rsx s JOIN rcent${k - 1} c ON s.sub = c.sub AND s.j = c.j
         |      GROUP BY 1, 2, 3)
         |  ) WHERE rn = 1
         |)""".stripMargin
    def cent(k: Int): String =
      s"""rcent$k AS (
         |  SELECT a.sub, a.cell, s.j,
         |    CAST(ROUND(CAST(SUM(s.x) AS DOUBLE) / COUNT(*), 0) AS BIGINT)
         |      AS cx
         |  FROM rsx s JOIN rasg$k a ON s.vec_id = a.vec_id AND s.sub = a.sub
         |  GROUP BY a.sub, a.cell, s.j
         |)""".stripMargin
    s"""$kmeansChainSql, rsx AS (
       |  SELECT e.vec_id,
       |    CAST((e.i - 1) // $PqSubDim AS INT) AS sub,
       |    CAST(e.i - ((e.i - 1) // $PqSubDim) * $PqSubDim AS INT) AS j,
       |    CAST(ROUND((e.x - c.cx) * 1e6, 0) AS BIGINT) AS x
       |  FROM exf e
       |  JOIN $kmeansFinalAsgCte a ON e.vec_id = a.vec_id
       |  JOIN cent${KmIters - 1} c ON a.cell = c.cell AND e.i = c.i
       |), rcent0 AS (
       |  SELECT sub, vec_id AS cell, j, x AS cx
       |  FROM rsx WHERE vec_id < $PqK
       |), ${asg(1)}, ${cent(1)}, ${asg(2)}""".stripMargin
  }

  private val ivfpqAdcCtes: String =
    s"""cqd AS (
       |  SELECT e.vec_id AS q_id, c.cell,
       |    CAST(SUM(CAST(ROUND((e.x - c.cx) * (e.x - c.cx) * 1e12, 0)
       |      AS BIGINT)) AS BIGINT) AS qd
       |  FROM exf e JOIN cent${KmIters - 1} c ON e.i = c.i
       |  WHERE e.vec_id < 50 GROUP BY 1, 2
       |), probedq AS (
       |  SELECT q_id, cell FROM (
       |    SELECT q_id, cell, row_number() OVER (PARTITION BY q_id
       |      ORDER BY qd, cell) AS prk FROM cqd
       |  ) WHERE prk <= $IvfPqProbes
       |), rq AS (
       |  SELECT p.q_id, p.cell AS pcell,
       |    CAST((e.i - 1) // $PqSubDim AS INT) AS sub,
       |    CAST(e.i - ((e.i - 1) // $PqSubDim) * $PqSubDim AS INT) AS j,
       |    CAST(ROUND((e.x - c.cx) * 1e6, 0) AS BIGINT) AS rx
       |  FROM probedq p
       |  JOIN exf e ON e.vec_id = p.q_id
       |  JOIN cent${KmIters - 1} c ON c.cell = p.cell AND c.i = e.i
       |), rqcd AS (
       |  SELECT r.q_id, r.pcell, r.sub, c.cell AS code,
       |    CAST(SUM((r.rx - c.cx) * (r.rx - c.cx)) AS BIGINT) AS qd_pico
       |  FROM rq r JOIN rcent${PqIters - 1} c ON r.sub = c.sub AND r.j = c.j
       |  GROUP BY 1, 2, 3, 4
       |), radc AS (
       |  SELECT q.q_id, a.vec_id,
       |    CAST(SUM(q.qd_pico) AS BIGINT) / 1000000000000.0 AS adc
       |  FROM rasg$PqIters a
       |  JOIN $kmeansFinalAsgCte m ON a.vec_id = m.vec_id
       |  JOIN rqcd q ON q.pcell = m.cell AND q.sub = a.sub AND q.code = a.cell
       |  WHERE a.vec_id <> q.q_id
       |  GROUP BY 1, 2
       |)""".stripMargin

  val ivfpqTopKSql: String =
    s"""WITH $ivfpqChainSql, $ivfpqAdcCtes
       |SELECT q_id, neighbor_id, adc, rk FROM (
       |  SELECT q_id, vec_id AS neighbor_id, adc,
       |    CAST(row_number() OVER (PARTITION BY q_id
       |      ORDER BY adc, vec_id) AS INT) AS rk
       |  FROM radc
       |) WHERE rk <= 5""".stripMargin

  val ivfpqRecallSql: String =
    s"""WITH $ivfpqChainSql, $ivfpqAdcCtes, ed AS (
       |  SELECT a.vec_id AS q_id, b.vec_id AS neighbor_id,
       |    CAST(SUM(CAST(ROUND((a.x - b.x) * (a.x - b.x) * 1e12, 0)
       |      AS BIGINT)) AS BIGINT) AS d2
       |  FROM exf a JOIN exf b ON a.i = b.i AND a.vec_id < 50
       |    AND b.vec_id <> a.vec_id
       |  GROUP BY 1, 2
       |), exact_top AS (
       |  SELECT q_id, neighbor_id FROM (
       |    SELECT q_id, neighbor_id, row_number() OVER (PARTITION BY q_id
       |      ORDER BY d2, neighbor_id) AS rk FROM ed
       |  ) WHERE rk <= 5
       |), ivf_top AS (
       |  SELECT q_id, neighbor_id FROM (
       |    SELECT q_id, vec_id AS neighbor_id, row_number() OVER (
       |      PARTITION BY q_id ORDER BY adc, vec_id) AS rk
       |    FROM radc
       |  ) WHERE rk <= 5
       |), qs AS (SELECT DISTINCT q_id FROM exact_top),
       |h AS (
       |  SELECT e.q_id, COUNT(*) AS n FROM exact_top e
       |  JOIN ivf_top l ON e.q_id = l.q_id AND e.neighbor_id = l.neighbor_id
       |  GROUP BY 1
       |)
       |SELECT 'ivfpq_m${PqM}_k${PqK}_p$IvfPqProbes' AS method,
       |  ROUND(AVG(COALESCE(n, 0)) / 5.0, 4) AS avg_recall_at_5,
       |  COUNT(*) AS n_queries
       |FROM qs LEFT JOIN h USING (q_id)""".stripMargin

  // ---- Cluster-quota balanced sampling ---------------------------------------

  /** Cluster-balanced downsampling census — the "cap the over-represented
    * modes" pass of embedding-space curation (the cluster-quota idea
    * behind SemDeDup-style pruning and DoReMi-ish rebalancing): every
    * vector's trained cell, capped at quota = ⌈N / 2K⌉ (half the mean
    * cell size), with the kept set chosen by a REPRODUCIBLE per-cell
    * rank (md5 of the stable vec key — the same any-cluster/any-
    * partitioning discipline as t_hash_split; Spark's sample() would
    * change selection on repartition). Hot cells are capped hard, cold
    * cells keep everything — the output per cell is (size, kept), i.e.
    * the balance report a curator reads before the cut. At 100 TB: one
    * window over the already-trained assignment, partitioned by cell —
    * no new corpus pass, and the 1-row total is the only broadcast. */
  def cellQuota(spark: SparkSession, sfDir: String): DataFrame = {
    val asg = kmeansAssignment(spark, sfDir).select("vec_id", "cell")
    val tot = asg.agg(count(lit(1)).as("n_total"))
    val hsh =
      conv(substring(md5(concat(lit("vec"), col("vec_id"))), 1, 8), 16, 10)
        .cast("long")
    val w = Window.partitionBy(col("cell")).orderBy(col("hsh"), col("vec_id"))
    asg.withColumn("hsh", hsh)
      .withColumn("rk", row_number().over(w).cast("long"))
      .crossJoin(broadcast(tot))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(when(col("rk") <= ceil(col("n_total") / lit(2.0 * KmK)), 1L)
          .otherwise(0L)).as("n_kept"))
  }

  val cellQuotaSql: String =
    s"""WITH $kmeansChainSql, tot AS (
       |  SELECT COUNT(*) AS n_total FROM $kmeansFinalAsgCte
       |), rk AS (
       |  SELECT cell, row_number() OVER (PARTITION BY cell ORDER BY
       |    ('0x' || substr(md5('vec' || CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT,
       |    vec_id) AS rk
       |  FROM $kmeansFinalAsgCte
       |)
       |SELECT cell, COUNT(*) AS n_vecs,
       |  CAST(SUM(CASE WHEN rk <= CEIL(n_total / ${2.0 * KmK}) THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_kept
       |FROM rk CROSS JOIN tot GROUP BY cell""".stripMargin

  // ---- embedding-space distribution drift -------------------------------------

  /** Embedding-space drift monitor: per label, the cosine between the
    * CENTROIDS of two corpus "generations" (the deterministic vec_id-
    * parity split standing in for an ingest-date split). The text-side
    * twin is `t_drift_js`; this one catches the shifts token statistics
    * miss — an embedding model upgrade, a topical move inside a stable
    * vocabulary — because a centroid moves whenever the MASS of the cloud
    * moves. Healthy same-distribution halves read ~1.0; a drifting
    * source's label falls away from it.
    *
    * Shape for scale: ONE pass over the exploded vectors — the per-
    * (label, half, dim) mean and the per-label vector tallies ride the
    * same shuffle (counts divide the exploded rows back by max dim
    * index, so no second corpus scan); everything after that aggregation
    * is label_count × dim rows. */
  def centroidDrift(spark: SparkSession, sfDir: String): DataFrame = {
    val ex = Tables.embeddings(spark, sfDir)
      .select(col("label"), (col("vec_id") % 2).as("half"),
        posexplode(col("embedding")))
      .select(col("label"), col("half"), (col("pos") + 1).as("i"),
        col("col").cast("double").as("x"))
    val cent = ex.groupBy(col("label"), col("half"), col("i"))
      .agg(avg(col("x")).as("cx"))
    val counts = ex.groupBy(col("label"))
      .agg(expr("sum(case when half = 0 then 1L else 0L end) div max(i)")
          .as("n0"),
        expr("sum(case when half = 1 then 1L else 0L end) div max(i)")
          .as("n1"))
    val c0 = cent.filter(col("half") === 0)
      .select(col("label"), col("i"), col("cx").as("x0"))
    val c1 = cent.filter(col("half") === 1)
      .select(col("label"), col("i"), col("cx").as("x1"))
    c0.join(c1, Seq("label", "i"))
      .groupBy(col("label"))
      .agg(round(sum(col("x0") * col("x1"))
          / (sqrt(sum(col("x0") * col("x0")))
            * sqrt(sum(col("x1") * col("x1")))), 6)
        .as("centroid_cos"))
      .join(counts, Seq("label"))
  }

  val centroidDriftSql: String =
    s"""WITH $embHalfCte, cent AS (
       |  SELECT label, half, i, AVG(x) AS cx FROM exh GROUP BY 1, 2, 3
       |), cnt AS (
       |  SELECT label,
       |    SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) // MAX(i) AS n0,
       |    SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) // MAX(i) AS n1
       |  FROM exh GROUP BY label
       |), cosd AS (
       |  SELECT c0.label,
       |    ROUND(SUM(c0.cx * c1.cx) / (sqrt(SUM(c0.cx * c0.cx))
       |      * sqrt(SUM(c1.cx * c1.cx))), 6) AS centroid_cos
       |  FROM cent c0 JOIN cent c1
       |    ON c0.label = c1.label AND c0.i = c1.i
       |    AND c0.half = 0 AND c1.half = 1
       |  GROUP BY c0.label
       |)
       |SELECT label, centroid_cos, CAST(n0 AS BIGINT) AS n0,
       |  CAST(n1 AS BIGINT) AS n1
       |FROM cosd JOIN cnt USING (label)""".stripMargin

  def queries: Map[String, Q] = Map(
    "s_centroid_drift" -> Q(centroidDriftSql)(centroidDrift),
    "s_ivfpq_topk"    -> Q(ivfpqTopKSql)(ivfpqTopK),
    "s_ivfpq_recall"  -> Q(ivfpqRecallSql)(ivfpqRecall),
    "s_cell_quota"    -> Q(cellQuotaSql)(cellQuota),
    "s_cosine_topk"   -> Q(cosineTopKSql)(cosineTopK),
    "s_pq_cells"      -> Q(pqCellsSql)(pqCells),
    "s_pq_topk"       -> Q(pqAdcTopKSql)(pqAdcTopK),
    "s_pq_recall"     -> Q(pqRecallSql)(pqRecall),
    "s_int8_recall"   -> Q(int8RecallSql)(int8Recall),
    "s_kmeans_cells"  -> Q(kmeansCellsSql)(kmeansCells),
    "s_ivf_trained_topk" -> Q(ivfTrainedTopKSql)(ivfTrainedTopK),
    "s_lsh_ann_topk"  -> Q(lshAnnTopKSql)(lshAnnTopK),
    "s_embed_neardup" -> Q(embedNearDupSql)(embedNearDup),
    "s_embed_families" -> Q(embedFamiliesSql)(embedFamilies),
    "s_ivf_ann_topk"  -> Q(ivfAnnTopKSql)(ivfAnnTopK),
    "s_knn_join"      -> Q(knnJoinSql)(knnJoin),
    "s_semdedup"      -> Q(semDedupSql)(semDedup),
    "s_probe_curve"   -> Q(probeCurveSql)(probeCurve),
    "s_ann_recall"    -> Q(annRecallSql)(annRecall))
}
