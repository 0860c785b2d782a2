package graft.sources

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

/** Shared filesystem helpers for the fingerprinted-layout caches
  * (EventsLayout, BucketedTables, ZOrderLayout, Compaction,
  * IncrementalRollup, SchemaEvolution) — one copy of the semantics every
  * layout needs instead of six. */
object LayoutDirs {

  /** Best-effort recursive delete (stale-layout eviction and shutdown
    * cleanup — failure to delete must never fail the query path). */
  def deleteQuiet(dir: String): Unit =
    try {
      Files.walk(Paths.get(dir)).sorted(Comparator.reverseOrder())
        .forEach(p => Files.deleteIfExists(p))
    } catch { case _: Exception => () }

  /** Whether `dir` holds at least one parquet DATA file (underscore- and
    * dot-prefixed bookkeeping like _SUCCESS/_last_batch doesn't count, in
    * any subdirectory — matching what a parquet read would load). A dir
    * that exists but has no data must be treated as "no layout":
    * reading it throws UNABLE_TO_INFER_SCHEMA. */
  def hasParquetData(dir: String): Boolean =
    try {
      val root = Paths.get(dir)
      Files.exists(root) && {
        val s = Files.walk(root)
        try s.anyMatch { p: Path =>
          val n = p.getFileName.toString
          Files.isRegularFile(p) && n.endsWith(".parquet") &&
            !n.startsWith("_") && !n.startsWith(".")
        }
        finally s.close()
      }
    } catch { case _: Exception => false }
}
