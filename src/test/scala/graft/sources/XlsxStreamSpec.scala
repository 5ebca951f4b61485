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

  test("maxFilesPerTrigger bounds admission; a backlog streams in batches without duplicates") {
    val dir = Files.createTempDirectory("graft_xlsx_mfpt_")
    val ckpt = Files.createTempDirectory("graft_xlsx_mfpt_ckpt_").toString
    val sink = Files.createTempDirectory("graft_xlsx_mfpt_sink_").toString
    // a pre-existing backlog: 100 files already in the drop-box at start
    for (i <- 0 until 100)
      writeBook(dir, f"f$i%03d.xlsx", Seq(Seq(f"f$i%03d", i.toDouble)))

    def startQuery(trigger: org.apache.spark.sql.streaming.Trigger) =
      spark.readStream.format("xlsx")
        .option("maxFilesPerTrigger", "10")
        .load(dir.toString)
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(trigger)
        .start()

    def sunk(): Seq[String] =
      spark.read.parquet(sink).collect().map(_.getString(0)).toSeq

    // leg 1: a single trigger admits exactly the cap, not the whole backlog
    val q1 = startQuery(org.apache.spark.sql.streaming.Trigger.Once())
    try q1.awaitTermination() finally q1.stop()
    assert(sunk().size == 10, s"one trigger should admit 10 files, got ${sunk().size}")

    // leg 2: restart mid-backlog; the rest arrives in capped batches with
    // no re-ingestion of leg 1's files
    val q2 = startQuery(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    try {
      q2.processAllAvailable()
      val all = sunk()
      assert(all.size == 100, s"expected the full backlog once, got ${all.size}")
      assert(all.distinct.size == 100, "duplicates across restart")
      // 90 remaining files / 10 per trigger = at least 9 non-empty batches
      val batches = q2.recentProgress.count(_.numInputRows > 0)
      assert(batches >= 9, s"expected >= 9 capped batches, got $batches")
    } finally q2.stop()
  }

  test("micro-batches read columnar, matching the batch scan's parse path") {
    val dir = Files.createTempDirectory("graft_xlsx_stream_col_")
    val ckpt = Files.createTempDirectory("graft_xlsx_ckpt_col_").toString
    writeBook(dir, "a.xlsx", (1 to 200).map(i => Seq(s"k$i", i.toDouble)))
    val q = spark.readStream.format("xlsx").load(dir.toString)
      .writeStream.format("memory").queryName("xlsx_stream_col")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // row parity with the batch (columnar) reader
      val streamed = spark.table("xlsx_stream_col").collect()
        .map(r => (r.getString(0), r.getDouble(1))).sorted.toSeq
      val batch = spark.read.format("xlsx").load(dir.toString).collect()
        .map(r => (r.getString(0), r.getDouble(1))).sorted.toSeq
      assert(streamed == batch && streamed.size == 200)
      // the executed micro-batch plan must ride the columnar reader
      // (ColumnarToRow above the streaming scan), not the row fallback
      val exec = q.asInstanceOf[
        org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper]
      val lastPlan = exec.explainInternal(false)
      assert(lastPlan.contains("ColumnarToRow"),
        s"expected a columnar streaming scan (ColumnarToRow), got:\n$lastPlan")
    } finally q.stop()
  }

  test("streaming composes with allSheets: per-sheet rows with _sheet_name") {
    val dir = Files.createTempDirectory("graft_xlsx_stream_as_")
    val ckpt = Files.createTempDirectory("graft_xlsx_ckpt_as_").toString
    val h = Some(Seq("k", "v"))
    val tmp = dir.resolve("multi.xlsx.tmp")
    val out = new FileOutputStream(tmp.toFile)
    try XlsxWriter.write(out, Seq(
      SheetSpec("first", h, Seq(Seq[Any]("x", 1.0)).iterator),
      SheetSpec("second", h, Seq(Seq[Any]("y", 2.0)).iterator)))
    finally out.close()
    Files.move(tmp, dir.resolve("multi.xlsx"))

    val q = spark.readStream.format("xlsx").option("allSheets", "true")
      .load(dir.toString)
      .writeStream.format("memory").queryName("xlsx_stream_as")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("xlsx_stream_as").collect()
        .map(r => (r.getString(0), r.getDouble(1), r.getString(2))).sorted.toSeq
      assert(rows == Seq(("x", 1.0, "first"), ("y", 2.0, "second")))
    } finally q.stop()
  }
}
