package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r17 streaming-face breakdown probe: replays the st_sessionize_et shape
  * and prints every micro-batch's StreamingQueryProgress durationMs map
  * (triggerExecution / queryPlanning / getBatch / addBatch / walCommit /
  * commitOffsets / ...) so the fixed per-batch overheads are attributable.
  *
  * `runMain graft.tools.StProbe <sfDir>`
  */
object StProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val evs = graft.Tables.load(spark, sfDir, "events")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value").cast("double").as("value"))
    // sentinels after max ts, as the faces do
    val maxUs = org.apache.spark.sql.catalyst.util.DateTimeUtils
      .fromJavaTimestamp(evs.agg(max(col("ts"))).first().getTimestamp(0))
    import spark.implicits._
    val sent = (1 to 2).map(i => graft.streaming.EventStreams.Event(-i.toLong,
      org.apache.spark.sql.catalyst.util.DateTimeUtils.toJavaTimestamp(
        maxUs + i * 3600L * 1000000L * 3L),
      -424242L, "sentinel", 0.0)).toDF()
    val payload = evs.unionByName(sent)
    val path = java.nio.file.Files.createTempDirectory("graft_stprobe_")
      .resolve("data").toString
    payload.write.mode("overwrite").parquet(path)

    (1 to 3).foreach { rep =>
      val t0 = System.nanoTime()
      val src = spark.readStream.schema(spark.read.parquet(path).schema)
        .parquet(path)
      val name = "stprobe_" + rep
      val old = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      val q = try graft.streaming.EventStreams
        .sessionizeStreamEventTime(spark, src.as[graft.streaming.EventStreams.Event])
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      finally spark.conf.set("spark.sql.shuffle.partitions", old)
      q.processAllAvailable()
      val t1 = System.nanoTime()
      println(f"rep $rep total ${(t1 - t0) / 1e9}%.3f s, batches=${q.recentProgress.length}")
      q.recentProgress.foreach { p =>
        import scala.jdk.CollectionConverters._
        val d = p.durationMs.asScala.toSeq.sortBy(-_._2.longValue)
          .map { case (k, v) => s"$k=$v" }.mkString(" ")
        println(s"  batch ${p.batchId} rows=${p.numInputRows} $d")
      }
      q.stop()
      spark.catalog.dropTempView(name)
    }
    spark.stop()
  }
}
