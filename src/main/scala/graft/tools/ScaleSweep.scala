package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}

/** Trustworthy FULL-SURFACE sf1 bench line (r16 VERDICT #1): the r16
  * single-JVM sweep printed 4-35× the true cost for faces that ran after
  * ~390 predecessors (dd_containment 113 s on the line, 3.1 s in a fresh
  * JVM) — late-session heap/GC pressure plus accumulated memoized
  * fixtures, not the faces themselves. The fix is structural, same class
  * as r16's box-speed normalization: chunk the face list and run each
  * chunk in a FRESH forked JVM ([[ScaleBench]] per chunk, its line
  * redirected to a temp file), then merge the chunk tables into ONE
  * history line. No face ever runs with more than (chunkSize - 1) faces
  * of session history behind it, so a face >15× its sf0.1 cost on this
  * line is a real superlinear bend, not reporting noise.
  *
  * `runMain graft.tools.ScaleSweep <sfDir> <sfTag> [chunkSize=50]`
  *
  * The merged line: `{"metric":"scale_sweep", "value":total, "sf":tag,
  * "chunks":K, "chunk_size":N, "chunk_anchors_ms":[...], "queries":{...}}`.
  * Chunk anchors are the shared [[BenchNorm.cpuProbeMs]] probe timed
  * inside each child right before its timed rep — a slow-box chunk
  * self-identifies. Faces keep ScaleBench's convention (-1 = failed).
  *
  * The child classpath is this JVM's own `java.class.path` (sbt forks
  * `run`, so it is the real compiled classpath, not an sbt launcher
  * jar), plus Spark's public JDK17 module-opens list via
  * `JavaModuleOptions.defaultModuleOptions()` — the same flags build.sbt
  * injects. Children inherit the environment (SPARK_GRAFT_CPUS etc.)
  * with SPARK_GRAFT_SCALEBENCH_OUT pointed at the per-chunk temp file.
  */
object ScaleSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val sfTag = args(1)
    val chunkSize = if (args.length > 2) args(2).toInt else 50
    // same face set as Bench: every query, *_check correctness twins
    // excluded (benching them re-times the exact computation the sketch
    // faces exist to avoid)
    val faces = graft.SparkEntry.queries.keys.toSeq
      .filterNot(_.endsWith("_check")).sorted
    val chunks = faces.grouped(chunkSize).toSeq
    val javaBin = Paths.get(sys.props("java.home"), "bin", "java").toString
    val cp = sys.props("java.class.path")
    val opens = org.apache.spark.launcher.JavaModuleOptions
      .defaultModuleOptions().split("\\s+").toSeq.filter(_.nonEmpty)
    val xmx = s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}"
    val tmp = Files.createTempDirectory("graft_scalesweep")
    val chunkLines = chunks.zipWithIndex.map { case (chunk, i) =>
      val out = tmp.resolve(s"chunk_$i.jsonl")
      val cmd = Seq(javaBin) ++ opens ++ Seq(xmx, "-cp", cp,
        "graft.tools.ScaleBench", sfDir, s"$sfTag-chunk$i") ++ chunk
      System.err.println(s"[scalesweep] chunk ${i + 1}/${chunks.size}: " +
        s"${chunk.size} faces (${chunk.head}..${chunk.last})")
      val pb = new ProcessBuilder(cmd: _*)
      pb.directory(new java.io.File("."))
      pb.environment().put("SPARK_GRAFT_SCALEBENCH_OUT", out.toString)
      pb.redirectOutput(ProcessBuilder.Redirect.INHERIT)
      pb.redirectError(ProcessBuilder.Redirect.INHERIT)
      val rc = pb.start().waitFor()
      if (rc != 0)
        System.err.println(s"[scalesweep] chunk $i exited $rc")
      if (Files.isRegularFile(out))
        new String(Files.readAllBytes(out), StandardCharsets.UTF_8)
          .linesIterator.toSeq.lastOption.getOrElse("")
      else ""
    }
    val line = mergeLine(faces, chunkLines, sfTag, sfDir,
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), chunkSize)
    Files.write(Paths.get("BENCH_HISTORY.jsonl"),
      (line + "\n").getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    println(line)
  }

  /** Pure merge of the per-chunk ScaleBench lines into the one
    * `scale_sweep` history line (ScaleSweepSpec pins it): faces keep
    * sweep order; a face whose chunk line is missing (dead JVM) reports
    * -1; value sums only the non-failed faces; per-chunk anchors ride
    * along so a slow-box chunk self-identifies (-1 = unparsed). */
  def mergeLine(faces: Seq[String], chunkLines: Seq[String], sfTag: String,
      sfDir: String, cpus: String, chunkSize: Int): String = {
    def ms(d: Double): Double = math.rint(d * 1000) / 1000
    val merged: Map[String, Double] =
      chunkLines.flatMap(l => BenchNorm.faceMap(l, "queries")).toMap
    val qjson = faces.map(n =>
        s""""$n":${ms(merged.getOrElse(n, -1.0))}""")
      .mkString("{", ",", "}")
    val anchors = chunkLines
      .map(l => BenchNorm.numField(l, "anchor_ms").getOrElse(-1.0))
    val total = ms(merged.values.filter(_ >= 0).sum)
    s"""{"metric":"scale_sweep","value":$total,"unit":"sec",""" +
      s""""sf":"$sfTag","dir":"$sfDir","cpus":$cpus,""" +
      s""""chunks":${chunkLines.size},"chunk_size":$chunkSize,""" +
      s""""chunk_anchors_ms":[${anchors.map(ms).mkString(",")}],""" +
      s""""queries":$qjson}"""
  }
}
