package graft.tools

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch probe for two-batch watermark/late-drop mechanics. */
object LateProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def t(d: Int, h: Int): Timestamp =
      Timestamp.valueOf(f"2024-01-0$d $h%02d:00:00")
    val a = Seq(
      (1L, t(1, 1), 1L), (2L, t(1, 2), 1L), (3L, t(2, 1), 1L),
      (4L, t(3, 1), 1L), (5L, t(3, 22), 1L)).toDF("event_id", "ts", "user_id")
    val sfile = Seq(
      (103L, t(3, 21), 2L),                        // within horizon at arrival
      (104L, Timestamp.valueOf("2024-02-20 00:00:00"), -1L) // sentinel
    ).toDF("event_id", "ts", "user_id")
    val lfile = Seq(
      (101L, t(1, 1), 2L), (102L, t(1, 2), 2L)     // late copies
    ).toDF("event_id", "ts", "user_id")

    val root = java.nio.file.Files.createTempDirectory("graft_lateprobe_")
    val streamDir = root.resolve("stream")
    java.nio.file.Files.createDirectories(streamDir)
    def writeOne(df: DataFrame, name: String, mtime: Long): Unit = {
      val tmp = root.resolve(name + "_tmp")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      import scala.jdk.CollectionConverters._
      val l = java.nio.file.Files.list(tmp)
      val part = try l.iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get finally l.close()
      val target = streamDir.resolve(name + ".parquet")
      java.nio.file.Files.move(part, target)
      target.toFile.setLastModified(mtime)
    }
    val now = System.currentTimeMillis()
    writeOne(a, "0000_a", now - 180000)
    writeOne(sfile, "0001_s", now - 120000)
    writeOne(lfile, "0002_l", now - 60000)

    val schema = spark.read.parquet(streamDir.toString).schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(streamDir.toString)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 day").as("w"))
      .agg(count(lit(1)).cast("long").as("n"))
      .select(to_date(col("w.start")).as("day"), col("n"))
      .writeStream.format("memory").queryName("lateprobe")
      .outputMode("append").start()
    q.processAllAvailable()
    Thread.sleep(3000)
    q.processAllAvailable()
    q.recentProgress.foreach { p =>
      println(s"LATEPROBE batch=${p.batchId} rows=${p.numInputRows} " +
        s"wm=${p.eventTime.get("watermark")}")
    }
    spark.table("lateprobe").orderBy("day").show(20, false)
    q.stop()
    spark.stop()
  }
}
