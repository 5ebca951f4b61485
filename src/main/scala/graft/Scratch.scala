package graft

/** Ephemeral scratch-space placement (r17, opt guide §6).
  *
  * Every temp dir the query surface creates — streaming checkpoints,
  * replay payloads, per-session index fixtures, layout/export scratch —
  * is session-lifetime at most and deleted (or abandoned) at the end of
  * the run; none of it needs durability. Placing them on a RAM-backed
  * filesystem removes the fsync cost that otherwise dominates streaming
  * micro-batch overhead: each micro-batch pays offset-log + commit-log +
  * per-partition state-store commits, and on the sandbox's virtio disk a
  * single checkpoint-log fsync is ~37 ms (measured via
  * StreamingQueryProgress.durationMs: walCommit 37 + commitOffsets 36 +
  * latestOffset 38 per batch), i.e. ~0.3 s per 2-batch replay face of
  * pure ephemeral-durability cost.
  *
  * Placement order: `$SPARK_GRAFT_SCRATCH` if set, else `/dev/shm` when it
  * exists and is writable, else `java.io.tmpdir`. Durable artifacts (the
  * parquet inputs, committed outputs) never go through here.
  */
object Scratch {
  private lazy val root: java.nio.file.Path = {
    val candidates =
      sys.env.get("SPARK_GRAFT_SCRATCH").map(java.nio.file.Paths.get(_)).toSeq ++
        Seq(java.nio.file.Paths.get("/dev/shm"),
          java.nio.file.Paths.get(System.getProperty("java.io.tmpdir")))
    val base = candidates.find(p =>
      java.nio.file.Files.isDirectory(p) && java.nio.file.Files.isWritable(p))
      .getOrElse(java.nio.file.Paths.get(System.getProperty("java.io.tmpdir")))
    val d = base.resolve("graft-scratch")
    java.nio.file.Files.createDirectories(d)
    d
  }

  /** A fresh temp directory under the scratch root. Same contract as
    * `Files.createTempDirectory(prefix)`, different (RAM-backed) home. */
  def dir(prefix: String): java.nio.file.Path =
    java.nio.file.Files.createTempDirectory(root, prefix)
}
