package graft.sources

/** Shared regeneration detector for session-scoped caches of artifacts
  * derived from a source parquet dir (ORC copies, IVF layouts, trained
  * models). Key = sfDir + MD5 over (path, size, mtime) of every file
  * under `sfDir/<table>` — a handful of stat calls, so callers can
  * re-key on every lookup; if the parquet is regenerated in-session the
  * key changes and the cache treats it as a miss instead of serving an
  * artifact of the old bytes. */
object SourceFingerprint {
  def key(sfDir: String, table: String): String = {
    val src = java.nio.file.Paths.get(sfDir, table)
    val fp =
      try {
        val s = java.nio.file.Files.walk(src)
        try s.sorted().map[String](p =>
            s"$p:${java.nio.file.Files.size(p)}:" +
              java.nio.file.Files.getLastModifiedTime(p).toMillis)
          .reduce("", (a, b) => a + "|" + b)
        finally s.close()
      } catch { case _: Exception => "unreadable" }
    sfDir + "#" + java.security.MessageDigest.getInstance("MD5")
      .digest(fp.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }
}
