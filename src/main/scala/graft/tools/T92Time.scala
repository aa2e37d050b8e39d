package graft.tools

/** Dev lab: t92 cost at sf0.1. Before checkpointing the edge list the
  * degree build, rank init, and final report each re-ran the LSH bands
  * self-join — measured 2.85 s warm floor; with edges materialized once
  * the warm floor is 1.74 s (local[32], 3 back-to-back runs). */
import org.apache.spark.sql.SparkSession
object T92Time {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (_ <- 1 to 3) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries("t92_dup_pagerank")(spark, "/root/testdata/sf0.1")
        .write.format("noop").mode("overwrite").save()
      println(f"t92 sf0.1: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
