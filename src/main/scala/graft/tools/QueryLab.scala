package graft.tools

import org.apache.spark.sql.SparkSession

/** Developer tool: time individual SparkEntry queries by name at an
  * arbitrary SF dir (median + min of N runs, cold cache between runs) —
  * the per-query magnifier next to the whole-suite Bench. Not contract.
  *
  * Usage: runMain graft.tools.QueryLab <sfDir> <runs> <name> [<name>…]
  */
object QueryLab {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = args.lift(1).map(_.toInt).getOrElse(3)
    val names = if (args.length > 2) args.drop(2).toSeq
                else graft.SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def exec(n: String): Double = {
      val t0 = System.nanoTime()
      try graft.SparkEntry.queries(n)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      finally spark.catalog.clearCache()
      (System.nanoTime() - t0) / 1e9
    }
    names.foreach { n =>
      exec(n) // warm: JIT + codegen classes
      val ts = (1 to runs).map(_ => exec(n)).sorted
      println(f"$n%-24s med ${ts(ts.length / 2)}%.3f  min ${ts.head}%.3f")
    }
    spark.stop()
  }
}
