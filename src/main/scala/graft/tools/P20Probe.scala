package graft.tools

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Dev lab (r17): decompose p20's ~3.1 s wall (after the 2-chunk trim)
  * into fixture prep / stream run / read-back, the P23Probe discipline:
  * name what remains so "trim further" vs "that's the engine floor" is
  * a measurement, not a guess. Replicates p20's body with stage timers
  * (same recipes; the gate itself stays in Pipelines).
  * Usage: runMain graft.tools.P20Probe [sfDir]
  */
object P20Probe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    implicit val s: SparkSession = spark

    def firstPart(d: java.nio.file.Path): java.nio.file.Path = {
      val s = Files.list(d)
      try s.iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      finally s.close()
    }

    for (run <- 1 to 3) {
      println(s"--- run $run")
      def t[A](label: String)(f: => A): A = {
        val t0 = System.nanoTime(); val r = f
        println(f"  $label%-12s ${(System.nanoTime() - t0) / 1e9}%7.3f s"); r
      }
      val ev = graft.queries.Tables.t(spark, dir, "events")
        .select("event_id", "ts", "user_id", "event_type", "value")
      val tmp = Files.createTempDirectory("graft_p20probe")
      val inDir = tmp.resolve("in"); Files.createDirectories(inDir)
      val (minTs, maxTs) = t("bounds") {
        val b = ev.agg(min("ts"), max("ts")).head
        (b.getTimestamp(0), b.getTimestamp(1))
      }
      t("chunks") {
        val spanMs = math.max(1L, maxTs.getTime - minTs.getTime)
        val chunked = ev.withColumn("__c", least(lit(2),
          (floor((unix_millis(col("ts")) - lit(minTs.getTime))
            * 2.0 / spanMs) + 1).cast("int")))
        val sentinels = ev.select(col("user_id")).distinct()
          .withColumn("event_id",
            -row_number().over(Window.orderBy("user_id")).cast("long"))
          .withColumn("ts",
            lit(new java.sql.Timestamp(maxTs.getTime + 86400000L)))
          .withColumn("event_type", lit("flush"))
          .withColumn("value", lit(0.0))
          .select("event_id", "ts", "user_id", "event_type", "value")
        val scratch = tmp.resolve("scratch")
        chunked.unionByName(sentinels.withColumn("__c", lit(3)))
          .repartition(3, col("__c"))
          .write.partitionBy("__c").mode("overwrite")
          .parquet(scratch.toString)
        (1 to 3).foreach { i =>
          val part = firstPart(scratch.resolve(s"__c=$i"))
          val dst = inDir.resolve(f"chunk-$i%02d.parquet")
          Files.move(part, dst)
          dst.toFile.setLastModified(maxTs.getTime + i * 60000L)
        }
      }
      val outDir = tmp.resolve("out").toString
      val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      try t("stream") {
        val q = graft.streaming.Streams.sessionizeSeq(
            spark.readStream.schema(ev.schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(inDir.toString).as[graft.streaming.Streams.Event])
          .writeStream.format("parquet")
          .option("path", outDir)
          .option("checkpointLocation", tmp.resolve("ckpt").toString)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      } finally spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
      t("readback") {
        val wn = Window.partitionBy("user_id").orderBy("started", "ended")
        spark.read.parquet(outDir)
          .withColumn("session_seq", row_number().over(wn).cast("long"))
          .select(col("user_id"), col("session_seq"),
            col("n_events").cast("long").as("n_events"),
            (unix_micros(col("ended")) - unix_micros(col("started")))
              .as("dur_us"),
            col("seq"))
          .orderBy("user_id", "session_seq")
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
