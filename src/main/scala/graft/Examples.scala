package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal
import graft.streaming.EventStreams

/** Runnable tour of the non-query library surfaces: a Structured
  * Streaming pipeline over the events fixture (file source → watermarked
  * window agg + stateful sessionization → memory sink) and the
  * multimodal decode→featurize path over generated media files.
  * `sbt "runMain graft.Examples"` */
object Examples {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // --- streaming ---
    val srcDir = Files.createTempDirectory("graft_ex_events").toString
    spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      .write.mode("append").parquet(srcDir)
    val stream = EventStreams.fromFiles(spark, srcDir)
    val q1 = EventStreams.windowedAgg(stream)
      .writeStream.format("memory").queryName("ex_windows")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    val q2 = EventStreams.sessionize(stream).toDF()
      .writeStream.format("memory").queryName("ex_sessions")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q1.awaitTermination(); q2.awaitTermination()
    println(s"streaming: windows=${spark.table("ex_windows").count()} " +
      s"sessions=${spark.table("ex_sessions").count()}")
    spark.table("ex_windows").orderBy("win_start", "event_type").show(5)

    // --- multimodal ---
    val mediaDir = Files.createTempDirectory("graft_ex_media").toFile
    Seq("x.jpg" -> 64, "y.png" -> 128, "z.mp4" -> 256).foreach {
      case (name, n) =>
        Files.write(new java.io.File(mediaDir, name).toPath,
          Array.tabulate[Byte](n)(i => (i * 11).toByte))
    }
    val media = Multimodal.readMediaDir(spark, mediaDir.getAbsolutePath)
    val feats = Multimodal.featurize(Multimodal.decodeImages(media))
    println(s"multimodal: images=${feats.count()} " +
      s"frames=${Multimodal.sampleFrames(media, 2).count()}")
    feats.select(col("path"), col("width"), col("height"),
      slice(col("embedding"), 1, 4).as("emb_head")).show(false)

    spark.stop()
  }
}
