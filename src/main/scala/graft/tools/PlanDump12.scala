package graft.tools
import org.apache.spark.sql.SparkSession
object PlanDump12 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- Seq("t88_ngram_novelty", "t90_length_percentiles")) {
      val df = graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
      val p = df.queryExecution.executedPlan.toString
      println(s"=== $n: exchanges=${"Exchange".r.findAllIn(p).length} scans=${"FileScan|Scan parquet".r.findAllIn(p).length}")
      println(p.linesIterator.filter(l => l.contains("Exchange") || l.contains("Scan ")).mkString("\n"))
    }
    spark.stop()
  }
}
