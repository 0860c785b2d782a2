package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.model.Tables

/** Scale-out correctness properties: results must be invariant to
  * parallelism (a query that changes under a different partition count
  * would silently corrupt on a 1000-executor cluster), and independent
  * implementations of the same semantics must agree. */
class DeterminismSpec extends SparkSuite {

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("results are invariant to shuffle partition count (4 vs 37)") {
    val s = spark
    val names = Seq("o27_keyed_concat", "d_ngram_jaccard", "s_cosine_topk",
      "q_rollup_sales", "src_parsed_roundtrip",
      // round-2 operators whose shapes are most partitioning-sensitive:
      // window-stitched rank, iterative CC, hash split, trained k-means
      "q_asof_join", "q_window_funcs", "d_dup_clusters", "t_hash_split",
      "s_kmeans_cells", "t_tfidf_top",
      // round-4 operators whose CONTRACT is partitioning invariance:
      // md5-quota sampling, the packing tape, the percent-rank terciles,
      // and the curve/census queries over shared cached subtrees
      "t_stratified_sample", "t_pack_assign", "t_lm_buckets",
      "d_dedup_curve", "s_semdedup", "m_phash_dup",
      // round-5 operators: sketch certificates must hold under any
      // partial-merge order (GK / CMS merges), bucketed layout and the
      // z-order tile math must not see partitioning at all
      "q_approx_quantiles", "t_cms_heavy", "src_bucketed_join",
      "q_zorder_layout",
      // custom-operator path: partial heaps see arbitrary row placement,
      // the final stage must erase it
      "q_topk_custom",
      // round-4 continuation: priority-window merge, skeleton-join fill,
      // hot-set split, post-agg unpivot, value-bounded frame, ORC reread
      "d_upsert_merge", "q_gap_fill", "q_skew_join", "q_unpivot",
      "q_range_frame", "src_orc_roundtrip",
      // hash sampling must not see partitioning (the whole point)
      "q_sample_estimate",
      // lag over a unique (ts_ms, event_id) order: placement-free
      "q_transitions",
      // round-6: PQ census over the shared cached model (the non-vacuous
      // cache-cleared training invariance lives in PQSpec); bigram LM
      // (zip-with-next inside the array, then key-joined counts)
      "s_pq_cells", "t_bigram_lm",
      // the four-stage funnel composes three drop sets + a quality gate;
      // any placement sensitivity in a stage would surface here
      "d_curation_funnel",
      // BPE induction: the argmax-per-round trajectory must not see
      // partitioning (ties break lexically, counts are exact)
      "t_bpe_merges", "t_bpe_tokenize", "d_modal_agreement",
      // round-7: IVF-PQ's integer-micro residual chain (training +
      // probe + ADC must be placement-free by construction — exact long
      // sums), the DSIR LM joins, the global vocab-rank window, the
      // hash-shard entropy census, and the three-key dedup audit
      "s_ivfpq_topk", "t_dsir_weights", "t_vocab_coverage",
      "t_shard_mix", "d_norm_sensitivity",
      // round-9: maintained-rollup serving read (the non-vacuous
      // cache-cleared REBUILD invariance lives in IncrementalRollupSpec)
      // and the mixed-generation census (null-ignoring aggs must not see
      // file placement)
      "src_incr_rollup", "src_schema_evolution",
      // round-9 close: the two drift monitors sum many ln/product terms
      // (rounded only after the final per-group fold — placement must not
      // move the 6th decimal), and the two distributed-rank consumers
      // (exact global ordinals / equi-height buckets) must not see the
      // partition count their range-bucket + offsets formulation hides
      "t_drift_js", "s_centroid_drift", "t_global_ordinals",
      "q_equi_histogram")
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    try {
      names.foreach { n =>
        s.conf.set("spark.sql.shuffle.partitions", "4")
        val at4 = canon(SparkEntry.queries(n)(s, sf0001))
        s.conf.set("spark.sql.shuffle.partitions", "37")
        val at37 = canon(SparkEntry.queries(n)(s, sf0001))
        assert(at4 == at37, s"$n differs across partition counts")
        assert(at4.nonEmpty)
      }
    } finally s.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("batch lag-based sessionize agrees with session_window semantics") {
    val s = spark
    // implementation 1: the registered lag/running-sum batch operator
    val lagBased = graft.operators.Analytics.sessionize(s, sf0001)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"), sum(col("n_events")).as("n_events"))
    // implementation 2: Spark's session_window over the same 30-min gap
    // (batch mode), fed the identical ms-derived timestamps
    val ev = Tables.events(s, sf0001)
      .select(col("user_id"),
        expr("timestamp_millis(ts div 1000000)").as("ts"))
    val sw = ev.groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"), sum(col("n_events")).as("n_events"))
    assert(canon(lagBased) == canon(sw))
  }
}
