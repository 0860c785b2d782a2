package graft

import graft.operators.Dedup

/** The OrcStalenessSpec pattern for Dedup's three shared artifacts (pair
  * list, minhash signatures, source-gram table): their caches carry the
  * documents fingerprint, so an in-session regeneration under the SAME
  * path must rebuild — serving near-dup pairs mined from the old bytes is
  * the exact staleness class the driver's mid-round testdata regeneration
  * triggers. */
class DedupStalenessSpec extends SparkSuite {

  private def write(dir: java.nio.file.Path, withDup: Boolean): Unit = {
    val s = spark
    import s.implicits._
    val base = (0 until 12).map { i =>
      // fully disjoint per-doc vocabulary of LETTER-ONLY words (the
      // tokenizer is [a-z]+, so digits would split every word into the
      // same shared tokens; and a rotation of one shared word list would
      // share 3-shingles cyclically and mint real near-dups)
      val di = ('a' + i).toChar
      (100L + i, if (i % 2 == 0) "web" else "books", "en",
        (0 until 20).map(j => s"${di}z${('a' + j).toChar}").mkString(" "))
    }
    // the planted duplicate copies a WEB doc's text into BOOKS, so it is
    // both a Jaccard/MinHash pair AND a cross-source gram overlap (the
    // novelty census only sees grams that span sources)
    val docs =
      if (withDup) base :+ ((999L, "books", "en", base.head._4))
      else base
    docs.toDF("doc_id", "source", "lang", "text")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  test("regenerated documents rebuild pair list, signatures, and source grams") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dedup-stale")
    dir.toFile.deleteOnExit()
    val d = dir.toString

    write(dir, withDup = true)
    val pairs1 = Dedup.ngramJaccard(spark, d).collect()
    assert(pairs1.exists(r => r.getLong(1) == 999L || r.getLong(0) == 999L),
      "the planted exact near-dup must surface as a Jaccard pair")
    val cands1 = Dedup.minhashCandidates(spark, d).count()
    assert(cands1 >= 1, "the planted dup must band-collide in MinHash")
    val novelty1 = Dedup.sourceNovelty(spark, d)
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Double]("novelty_ratio"))
      .toMap
    assert(novelty1("web") < 1.0,
      "doc 999 duplicates a web doc's grams, so web novelty must dip below 1")

    // regenerate WITHOUT the duplicate: every artifact must reflect the
    // new corpus, not the cached one
    write(dir, withDup = false)
    assert(Dedup.ngramJaccard(spark, d).count() == 0,
      "stale pair list served after the source parquet was regenerated")
    assert(Dedup.minhashCandidates(spark, d).count() == 0,
      "stale minhash signatures served after regeneration")
    val novelty2 = Dedup.sourceNovelty(spark, d)
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Double]("novelty_ratio"))
      .toMap
    assert(novelty2.values.forall(_ == 1.0),
      s"stale source grams served after regeneration: $novelty2")
  }
}
