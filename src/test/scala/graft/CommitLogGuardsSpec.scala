package graft

import org.apache.spark.sql.functions._

import graft.streaming.CommitLogIngest

/** Round-11 hardening of the commit-log table format (the ADVICE.md r10
  * findings): schema-safe OPTIMIZE and pointRead on mixed-generation
  * tables, the append schema-compatibility guard, and the exactly-once
  * sink's txn guard made atomic with the version claim. */
class CommitLogGuardsSpec extends SparkSuite {

  private def tmp(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-guard-$prefix")
    d.toFile.deleteOnExit()
    d.toString
  }

  test("optimize across a schema boundary keeps the late-added column") {
    val s = spark
    import s.implicits._
    val table = tmp("optevo")
    // generation 1: (id, p) — generation 2 adds `extra`
    CommitLogIngest.commitAppend(
      (0L until 50L).map(i => (i, s"p$i")).toDF("id", "p"), table)
    CommitLogIngest.commitAppend(
      (50L until 100L).map(i => (i, s"p$i", i * 10)).toDF("id", "p", "extra"),
      table)
    val pre = CommitLogIngest.snapshot(s, table)
      .agg(sum(col("extra"))).head().getLong(0)
    val (v, nIn, nOut) = CommitLogIngest.optimize(s, table)
    assert(v == 2L && nIn >= 2 && nOut >= 1)
    val post = CommitLogIngest.snapshot(s, table)
    // the compacted files span both generations: a footer-inferred read
    // would have dropped `extra` — real values must survive, not null out
    assert(post.columns.contains("extra"))
    assert(post.agg(sum(col("extra"))).head().getLong(0) == pre,
      "optimize silently dropped the late-added column's values")
  }

  test("pointRead on a mixed-generation table reads under the declared schema") {
    val s = spark
    import s.implicits._
    val table = tmp("ptevo")
    CommitLogIngest.commitAppend(
      (0L until 50L).map(i => (i, s"p$i")).toDF("id", "p"),
      table, statsCol = Some("id"))
    CommitLogIngest.commitAppend(
      (50L until 100L).map(i => (i, s"p$i", i * 10)).toDF("id", "p", "extra"),
      table, statsCol = Some("id"))
    // a key in the OLD generation: its file lacks `extra`, but the result
    // must still carry the column (as NULL), same as snapshot()
    val oldHit = CommitLogIngest.pointRead(s, table, "id", 7L)
    assert(oldHit.columns.contains("extra"),
      "pointRead lost the late-added column on an old-generation file")
    assert(oldHit.count() == 1 && oldHit.head().isNullAt(
      oldHit.columns.indexOf("extra")))
    val newHit = CommitLogIngest.pointRead(s, table, "id", 77L)
    assert(newHit.head().getAs[Long]("extra") == 770L)
    // a key outside every file's range: empty result, schema intact
    val miss = CommitLogIngest.pointRead(s, table, "id", 10000L)
    assert(miss.count() == 0 && miss.columns.contains("extra"))
  }

  test("an append that narrows the schema or changes a type is refused") {
    val s = spark
    import s.implicits._
    val table = tmp("narrow")
    (0L until 20L).map(i => (i, s"p$i", i * 1.5)).toDF("id", "p", "score")
      .write.format("graft-commitlog").option("path", table)
      .mode("append").save()
    // narrower frame: silently hides `score` from every read — refused
    val narrower = (20L until 40L).map(i => (i, s"p$i")).toDF("id", "p")
    val e1 = intercept[Exception] {
      narrower.write.format("graft-commitlog").option("path", table)
        .mode("append").save()
    }
    assert(exceptionChain(e1).exists(_.contains("narrower schema")),
      s"wrong refusal: ${e1.getMessage}")
    // changed type: refused
    val retyped = (20L until 40L)
      .map(i => (i.toInt, s"p$i", i * 1.5)).toDF("id", "p", "score")
    val e2 = intercept[Exception] {
      retyped.write.format("graft-commitlog").option("path", table)
        .mode("append").save()
    }
    assert(exceptionChain(e2).exists(_.contains("changes column type")),
      s"wrong refusal: ${e2.getMessage}")
    // the programmatic API enforces the same contract
    intercept[IllegalArgumentException] {
      CommitLogIngest.commitAppend(narrower, table)
    }
    // WIDER is schema evolution and stays allowed; OVERWRITE may narrow
    (40L until 50L).map(i => (i, s"p$i", i * 1.5, i))
      .toDF("id", "p", "score", "extra")
      .write.format("graft-commitlog").option("path", table)
      .mode("append").save()
    narrower.write.format("graft-commitlog").option("path", table)
      .mode("overwrite").save()
    assert(CommitLogIngest.snapshot(s, table).count() == 20L)
  }

  test("the sink txn guard is atomic with the claim: a same-epoch race commits once") {
    val s = spark
    import s.implicits._
    val table = tmp("zombie")
    // two "instances" of the same query replay the same epoch with their
    // own pre-written files, concurrently: exactly one set of rows lands
    def epochFiles(tag: String): Seq[String] = {
      val d = s"$table/data/$tag"
      (0L until 10L).map(i => (i, tag)).toDF("id", "who")
        .coalesce(1).write.mode("overwrite").parquet(d)
      graft.sources.LayoutDirs.dataFiles(d)
    }
    val filesA = epochFiles("zA")
    val filesB = epochFiles("zB")
    val schema = (0L until 1L).map(i => (i, "x")).toDF("id", "who").schema
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Boolean]()
    val threads = Seq(filesA, filesB).map { fs =>
      new Thread(() => {
        val ok = CommitLogIngest.commitEpoch(s, table, fs,
          statsCol = None, statsDir = None, schemaOf = Some(schema),
          queryId = "q-zombie", epochId = 7L)
        results.add(ok)
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    import scala.jdk.CollectionConverters._
    assert(results.asScala.toSeq.sorted == Seq(false, true),
      s"same-epoch race outcome: ${results.asScala.toSeq}")
    assert(CommitLogIngest.snapshot(s, table).count() == 10L,
      "the epoch's rows were double-committed")
    // a later replay of the same epoch is also recognized
    assert(!CommitLogIngest.commitEpoch(s, table, filesA,
      statsCol = None, statsDir = None, schemaOf = Some(schema),
      queryId = "q-zombie", epochId = 7L))
    assert(CommitLogIngest.lastTxnEpoch(s, table, "q-zombie") == 7L)
  }

  test("a type-changing UPDATE or MERGE is refused (the sf10 int32 lesson)") {
    val s = spark
    import s.implicits._
    val table = tmp("retype")
    // n is INT — the narrow type the sf10 generator ships for n_chars
    CommitLogIngest.commitAppend(
      (0 until 50).map(i => (i.toLong, i)).toDF("id", "n"), table)
    // + 1000L would widen the rewritten files to long while the declared
    // schema stays int → every later declared-schema read of those files
    // dies with PARQUET_COLUMN_DATA_TYPE_MISMATCH. Refused instead.
    val e = intercept[IllegalArgumentException] {
      CommitLogIngest.updateWhere(s, table, col("id") % 5 === 0,
        Map("n" -> (col("n") + 1000L)))
    }
    assert(e.getMessage.contains("changes column type"),
      s"wrong refusal: ${e.getMessage}")
    // type-preserving arithmetic goes through, and the snapshot reads
    CommitLogIngest.updateWhere(s, table, col("id") % 5 === 0,
      Map("n" -> (col("n") + lit(1000))))
    assert(CommitLogIngest.snapshot(s, table)
      .agg(sum(col("n"))).head().getLong(0) ==
      (0 until 50).map(i => if (i % 5 == 0) i + 1000 else i).sum.toLong)
    // mergeByKey refuses a type-changing updates frame the same way
    val e2 = intercept[IllegalArgumentException] {
      CommitLogIngest.mergeByKey(s, table,
        Seq((1L, 7.5)).toDF("id", "n"), "id")
    }
    assert(e2.getMessage.contains("change column type"),
      s"wrong refusal: ${e2.getMessage}")
  }

  test("the statsCol-mismatch refusal names the existing column") {
    val s = spark
    import s.implicits._
    val table = tmp("idxcol")
    CommitLogIngest.commitAppend(
      (0L until 10L).map(i => (i, s"p$i")).toDF("id", "p"),
      table, statsCol = Some("id"))
    val e = intercept[IllegalArgumentException] {
      CommitLogIngest.commitAppend(
        (10L until 20L).map(i => (i, s"p$i")).toDF("id", "p"),
        table, statsCol = Some("p"))
    }
    assert(e.getMessage.contains("keep indexing 'id'"),
      s"message leaks the uninterpolated literal: ${e.getMessage}")
  }

  private def exceptionChain(e: Throwable): Seq[String] =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).toSeq
}
