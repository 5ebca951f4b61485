package graft.queries

import java.nio.channels.FileChannel
import java.nio.file.{Files, Path, Paths, StandardOpenOption}

/** Cross-PROCESS guard for fixtures living at FIXED /tmp paths (the
  * static oracle SQL names those paths verbatim, so they cannot be
  * per-run temp dirs). Two writers race for real: `sbt test` and the
  * verify driver run as separate JVMs, possibly with different sfDirs.
  * A JVM-local `synchronized` + check-then-write marker (the r15
  * posture) lets both pass the stale-marker check and interleave
  * writes, leaving mixed-sf fixture files the static oracle then reads
  * (r15 review). This helper closes the window with an OS-level
  * `FileChannel.lock` held across check + rebuild + marker write.
  *
  * The lockfile lives OUTSIDE the fixture dir (Spark's
  * `mode("overwrite")` wipes the dir, marker and all). The marker
  * content is `sfDir|version` — bump the caller's version token when
  * the fixture's CONTENT RULE changes so stale artifacts from older
  * code rebuild even when the sfDir matches.
  */
private[queries] object FixtureLock {

  /** Run `build` iff the marker under `dir` doesn't already record
    * `sfDir|version`, holding an exclusive OS file lock for the whole
    * check-build-mark sequence. Returns `dir`. */
  def ensure(dir: Path, sfDir: String, version: String)(build: => Unit): Path = {
    val want = s"$sfDir|$version"
    val lockPath = Paths.get(dir.toString + ".lock")
    val marker = dir.resolve(".sfdir")
    // JVM-local mutex first: overlapping FileChannel locks from one JVM
    // throw OverlappingFileLockException instead of blocking.
    localMutex(lockPath).synchronized {
      val ch = FileChannel.open(lockPath,
        StandardOpenOption.CREATE, StandardOpenOption.WRITE)
      try {
        val lock = ch.lock() // blocks until the other PROCESS releases
        try {
          if (!(Files.exists(marker) && Files.readString(marker) == want)) {
            Files.createDirectories(dir)
            build
            Files.writeString(marker, want)
          }
        } finally lock.release()
      } finally ch.close()
    }
    dir
  }

  private val mutexes =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def localMutex(p: Path): Object =
    mutexes.computeIfAbsent(p.toString, _ => new Object)
}
