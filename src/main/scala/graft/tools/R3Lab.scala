package graft.tools

import org.apache.spark.sql.SparkSession

/** Developer tool: repeated timing of selected SparkEntry queries to
  * separate real plan cost from per-job floor. Not driver contract. */
object R3Lab {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("t03_ngram_jaccard", "p02_pipeline_loop", "t12_cosine_neardup",
        "t02_minhash_lsh", "q18_count_distinct", "p08_pipeline_csv",
        "p03_pipeline_fn_dates", "q01_agg_pricing")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def exec(n: String): Unit =
      graft.SparkEntry.queries(n)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    names.foreach { n =>
      try exec(n) catch { case e: Throwable => println(s"$n warm FAIL: $e") }
      val ts = (1 to 3).map { _ =>
        spark.catalog.clearCache() // bench is single-pass: measure cold-cache
        val t0 = System.nanoTime(); exec(n); (System.nanoTime() - t0) / 1e9
      }
      println(f"$n%-25s min=${ts.min}%.3f med=${ts.sorted.apply(1)}%.3f max=${ts.max}%.3f")
    }
    spark.stop()
  }
}
