package graft.tools

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._

/** Dev lab (r21 verdict ask #7): read SHUFFLE BYTES off the listener for
  * named queries — the statistic that turns the r21 "binary minhash
  * bucket moves ~⅓ the key bytes" §2.3 argument into a measured number.
  * sf0.1 walls can't see it (the band table is ~590 k rows, under the
  * local job floor), so the intended use is a 30× fixture:
  *
  *   runMain graft.tools.ShuffleBytesLab gen30 /tmp/graft_30x
  *     — 30× mangle-mode documents (ScaleProbe's transform: copy k
  *       prefixes every token with k<k>, so cross-copy shingle spaces
  *       are disjoint), every other table staged unscaled so any query
  *       resolves.
  *   runMain graft.tools.ShuffleBytesLab <dir> <query> [<query>…]
  *     — per query: one unmeasured warm pass (sf0.001) then one measured
  *       pass at <dir>; prints wall + total shuffle bytes written/read
  *       summed over the run's stages. Bytes are deterministic per plan,
  *       so one pass measures them exactly (the wall is incidental).
  *
  * Run it in a pre-r21 worktree vs HEAD for the hex-vs-binary bucket
  * before/after. Session = Bench's (production profile + local sizing).
  */
object ShuffleBytesLab {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession.builder("graft-shufflebytes")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    if (args.headOption.contains("gen30")) {
      val out = args.lift(1).getOrElse("/tmp/graft_30x")
      val src = "/root/testdata/sf0.1"
      val docs = spark.read.parquet(s"$src/documents.parquet")
      val n = docs.agg(max("doc_id")).head.getLong(0) + 1
      (0 until 30).map { k =>
        val t =
          if (k == 0) docs
          else docs.withColumn("text", expr(
            s"concat_ws(' ', transform(split(text, ' '), w -> concat('k$k', w)))"))
            .withColumn("n_chars", length(col("text")).cast("long"))
        t.withColumn("doc_id", col("doc_id") + lit(k * n))
      }.reduce(_ unionAll _)
        .repartition(32)
        .write.mode("overwrite").parquet(s"$out/documents.parquet")
      // stage every other table unscaled so any query's reads resolve
      val fs = org.apache.hadoop.fs.FileSystem.get(
        spark.sparkContext.hadoopConfiguration)
      fs.listStatus(new org.apache.hadoop.fs.Path(src))
        .map(_.getPath).filter(p => p.getName.endsWith(".parquet") &&
          p.getName != "documents.parquet")
        .foreach { p =>
          org.apache.hadoop.fs.FileUtil.copy(fs, p, fs,
            new org.apache.hadoop.fs.Path(s"$out/${p.getName}"),
            false, spark.sparkContext.hadoopConfiguration)
        }
      println(s"wrote 30x fixture to $out")
      spark.stop(); return
    }

    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    require(names.nonEmpty, "usage: ShuffleBytesLab <dir> <query> [...]")

    val written = new LongAdder; val read = new LongAdder
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        if (m != null) {
          written.add(m.shuffleWriteMetrics.bytesWritten)
          read.add(m.shuffleReadMetrics.totalBytesRead)
        }
      }
    })
    def run(name: String, d: String): Unit = {
      try graft.SparkEntry.queries(name)(spark, d)
        .write.format("noop").mode("overwrite").save()
      finally spark.catalog.clearCache()
    }
    names.foreach { n =>
      run(n, "/root/testdata/sf0.001") // warm: JIT + codegen classes
      // settle: let straggler stage-completed events from warmup land
      // (the listener bus is async and its drain API is private[spark])
      Thread.sleep(1000)
      written.reset(); read.reset()
      val t0 = System.nanoTime()
      run(n, dir)
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1000) // drain the async listener bus
      println(f"$n%-28s wall=$wall%7.2f s  " +
        f"shuffle_write=${written.sum / 1048576.0}%9.2f MiB  " +
        f"shuffle_read=${read.sum / 1048576.0}%9.2f MiB")
    }
    spark.stop()
  }
}
