package graft.tools
object T104Recall {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.builder("t104recall").master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      def rows(n: String) = graft.SparkEntry.queries(n)(spark, sf).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(3))).toSet
      val exact = rows("t57_hard_negatives")
      val t64r = rows("t64_hard_negatives_ivf")
      val t104r = rows("t104_hard_negatives_ivf_scaled")
      println(f"$sf: t64 recall ${exact.count(t64r.contains).toDouble/exact.size}%.2f, " +
        f"t104 recall ${exact.count(t104r.contains).toDouble/exact.size}%.2f (exact ${exact.size})")
    }
    spark.stop()
  }
}
