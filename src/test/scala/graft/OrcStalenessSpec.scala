package graft

import graft.sources.OrcRoundTrip

/** The session ORC copy is keyed on a fingerprint of the source parquet
  * (names + sizes + mtimes), not the directory path alone — regenerating
  * the parquet under a cached dir must refresh the copy, not serve the
  * stale snapshot. */
class OrcStalenessSpec extends SparkSuite {

  test("regenerated parquet invalidates the cached ORC copy") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-orc-stale")
    dir.toFile.deleteOnExit()
    def write(texts: Seq[String]): Unit =
      texts.zipWithIndex.map { case (t, i) => (i.toLong, "web", "en", t) }
        .toDF("doc_id", "source", "lang", "text")
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    def nDocs(): Long =
      OrcRoundTrip.orcRoundTrip(s, dir.toString)
        .collect().map(_.getAs[Long]("n_docs")).sum
    write(Seq("alpha", "beta"))
    assert(nDocs() == 2L)
    // regenerate in-session: part-file names/sizes/mtimes change, so the
    // fingerprint key misses and the round-trip re-copies
    write(Seq("gamma", "delta", "epsilon"))
    assert(nDocs() == 3L)
  }
}
