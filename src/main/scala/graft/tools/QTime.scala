package graft.tools

/** Dev lab: time any SparkEntry query by name (3 back-to-back runs,
  * noop sink — Bench's materialization rule) at an optional sf dir.
  * Usage: runMain graft.tools.QTime t89_cluster_canonical [sfDir] */
import org.apache.spark.sql.SparkSession
object QTime {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println("usage: QTime <query_name> [sfDir]")
      sys.exit(2)
    }
    val name = args(0)
    if (!graft.SparkEntry.queries.contains(name)) {
      System.err.println(s"unknown query '$name'; valid: " +
        graft.SparkEntry.queries.keys.toSeq.sorted.mkString(", "))
      sys.exit(2)
    }
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (_ <- 1 to 3) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
