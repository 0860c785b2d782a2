package graft.plans

import org.apache.spark.sql.{Column, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.graft.{CosineSimilarity, FloatSqNorm, ReplaceFirst, Shim, SqDist, SqDistLong, SqDistPico}

/** Session extensions registering graft's custom Catalyst expressions for
  * the SQL surface (`spark.sql.extensions=graft.plans.GraftExtensions`, or
  * `.withExtensions(new GraftExtensions)`). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("cosine_sim"),
      CosineSimilarity.info,
      { args => CosineSimilarity(args(0), args(1)) }))
    ext.injectFunction((FunctionIdentifier("replace_first"),
      ReplaceFirst.info,
      { args => ReplaceFirst(args(0), args(1), args(2)) }))
    ext.injectOptimizerRule(_ => CanonicalizeCosine)
    ext.injectOptimizerRule(_ => PushFilterThroughTopK)
    ext.injectOptimizerRule(_ => PruneColumnsThroughTopK)
    ext.injectPlannerStrategy(_ => TopKStrategy)
    ext.injectPlannerStrategy(_ => CommitLogDmlStrategy)
    // SQL maintenance surface: OPTIMIZE [ZORDER BY] / VACUUM / DESCRIBE
    // HISTORY on commit-log tables; everything else delegates untouched
    ext.injectParser((_, delegate) => new GraftSqlParser(delegate))
  }
}

/** Column-API access to the custom expressions — no registry needed, works
  * on any session. */
object GraftFunctions {
  def cosineSim(a: Column, b: Column): Column =
    Shim.column(CosineSimilarity(Shim.expression(a), Shim.expression(b)))

  def replaceFirst(str: Column, search: Column, repl: Column): Column =
    Shim.column(ReplaceFirst(Shim.expression(str), Shim.expression(search),
      Shim.expression(repl)))

  /** Fused squared-euclidean kernels (bit-identical to the
    * aggregate/filter/zip_with folds they replace — see SqDist.scala). */
  def sqDist(a: Column, b: Column): Column =
    Shim.column(SqDist(Shim.expression(a), Shim.expression(b)))

  def sqDistPico(a: Column, b: Column): Column =
    Shim.column(SqDistPico(Shim.expression(a), Shim.expression(b)))

  def sqDistLong(a: Column, b: Column): Column =
    Shim.column(SqDistLong(Shim.expression(a), Shim.expression(b)))

  def floatSqNorm(v: Column): Column =
    Shim.column(FloatSqNorm(Shim.expression(v)))

  /** Probe a serialized `org.apache.spark.util.sketch.BloomFilter` (built
    * by `df.stat.bloomFilter` over the same long-hash column) with Spark's
    * codegen'd BloomFilterMightContain — the explicit form of the
    * runtime-filter prune: the ~KB sketch travels as a literal in the
    * predicate, rows die map-side before any exchange. */
  def bloomMightContain(serialized: Array[Byte], value: Column): Column =
    Shim.column(org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
      org.apache.spark.sql.catalyst.expressions.Literal(serialized,
        org.apache.spark.sql.types.BinaryType),
      Shim.expression(value)))
}
