package graft.sources

import java.io.FileOutputStream
import java.nio.file.Files

import graft.SparkSpec
import graft.sources.xlsx.XlsxWriter
import graft.sources.xlsx.XlsxWriter.SheetSpec

/** Streaming face of the xlsx source: a directory tailed for new workbook
  * files, each micro-batch = the newly arrived files. Asserts batch/stream
  * row parity and checkpoint resume (a restarted query does not re-ingest
  * admitted files).
  */
class XlsxStreamSpec extends SparkSpec {

  private def writeBook(dir: java.nio.file.Path, name: String, rows: Seq[Seq[Any]]): Unit = {
    val tmp = dir.resolve(name + ".tmp")
    val out = new FileOutputStream(tmp.toFile)
    try XlsxWriter.write(out,
      Seq(SheetSpec("Sheet1", Some(Seq("k", "v")), rows.iterator)))
    finally out.close()
    // atomic-ish rename so the stream never lists a half-written workbook
    Files.move(tmp, dir.resolve(name))
  }

  test("file-drop stream matches batch read and resumes from checkpoint") {
    val dir = Files.createTempDirectory("graft_xlsx_stream_")
    val ckpt = Files.createTempDirectory("graft_xlsx_ckpt_").toString
    val sink = Files.createTempDirectory("graft_xlsx_sink_").toString
    writeBook(dir, "a.xlsx", Seq(Seq("a1", 1.0), Seq("a2", 2.0)))

    // parquet sink: the memory sink rejects checkpoint recovery, and the
    // restart leg is the point of this test
    def startQuery() =
      spark.readStream.format("xlsx").load(dir.toString)
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()

    def sunk(): Seq[(String, Double)] =
      spark.read.parquet(sink).collect()
        .map(r => (r.getString(0), r.getDouble(1))).sorted.toSeq

    val q1 = startQuery()
    try {
      q1.processAllAvailable()
      assert(sunk() == Seq(("a1", 1.0), ("a2", 2.0)))

      writeBook(dir, "b.xlsx", Seq(Seq("b1", 3.0)))
      q1.processAllAvailable()
      val batch = spark.read.format("xlsx").load(dir.toString).collect()
        .map(r => (r.getString(0), r.getDouble(1))).sorted.toSeq
      assert(sunk() == batch)
      assert(sunk() == Seq(("a1", 1.0), ("a2", 2.0), ("b1", 3.0)))
    } finally q1.stop()

    // restart against the same checkpoint: the already-admitted files must
    // NOT be re-ingested — exactly one new row appears, no duplicates
    writeBook(dir, "c.xlsx", Seq(Seq("c1", 4.0)))
    val q2 = startQuery()
    try {
      q2.processAllAvailable()
      assert(sunk() == Seq(("a1", 1.0), ("a2", 2.0), ("b1", 3.0), ("c1", 4.0)))
    } finally q2.stop()
  }
}
