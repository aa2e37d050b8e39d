package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Dev lab (r21 optimization round): decompose a query's bench wall into
  * driver-side build time (planning + any actions run while constructing
  * the DataFrame, e.g. iterative localCheckpoint loops), execution time
  * of the final noop materialization, and the per-Spark-job breakdown —
  * so optimization targets the term that actually dominates instead of
  * the plan we assume dominates.
  *
  * Session = Bench's exactly (production profile + local sizing), so the
  * numbers decompose BENCH_r21's walls, not some other session's.
  *
  * Usage: runMain graft.tools.OptProfile <sfDir> <name> [<name>…]
  */
object OptProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession.builder("graft-optprofile")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val jobs = mutable.ArrayBuffer.empty[(Int, Long, String)] // id, start, desc
    val done = mutable.ArrayBuffer.empty[(Int, Double)]       // id, sec
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs.synchronized {
        jobs += ((js.jobId, js.time,
          Option(js.properties).map(_.getProperty("spark.job.description", "")).getOrElse("")))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = jobs.synchronized {
        jobs.find(_._1 == je.jobId).foreach { case (id, t0, _) =>
          done += ((id, (je.time - t0) / 1e3))
        }
      }
    })

    def run(name: String, d: String, report: Boolean): Unit = {
      jobs.synchronized { jobs.clear(); done.clear() }
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(name)(spark, d)
      val t1 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t2 = System.nanoTime()
      spark.catalog.clearCache()
      if (report) {
        val build = (t1 - t0) / 1e9; val exec = (t2 - t1) / 1e9
        val (js, ds) = jobs.synchronized { (jobs.toList, done.toList) }
        val byId = ds.toMap
        println(f"$name%-28s total=${build + exec}%6.3f  build=$build%6.3f  exec=$exec%6.3f  jobs=${js.size}")
        js.sortBy(_._1).foreach { case (id, _, desc) =>
          println(f"    job $id%3d  ${byId.getOrElse(id, -1.0)}%7.3f s  $desc")
        }
      }
    }

    val todo = if (names.nonEmpty) names
               else graft.SparkEntry.queries.keys.toSeq.sorted
    // warmup (JIT + codegen cache), small SFs first, then one unbilled
    // pass at the target dir
    for (w <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", dir); n <- todo) {
      try run(n, w, report = false) catch { case _: Throwable => }
    }
    for (r <- 1 to 2; n <- todo) {
      println(s"--- pass $r ---")
      try run(n, dir, report = true)
      catch { case e: Throwable => println(s"$n FAILED: $e") }
    }
    spark.stop()
  }
}
