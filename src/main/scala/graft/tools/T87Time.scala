package graft.tools

/** Dev lab: t87 cost at sf0.1. Measured (local[32], warm): Spark
  * 2.7-3.1 s vs the DuckDB oracle's 12.7-13.5 s — the checkpointed
  * vocabulary loop beats the 8-round chained-CTE re-derivation ~4-5x. */
import org.apache.spark.sql.SparkSession
object T87Time {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (_ <- 1 to 3) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries("t87_bpe_trainer")(spark, "/root/testdata/sf0.1")
        .write.format("noop").mode("overwrite").save()
      println(f"t87 sf0.1: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
