package graft.tools

/** Dev lab: Spearman rank agreement between the exact-token bigram LM
  * (t84) and the 4096-bucket hashed form (t86) per doc bits_per_bigram.
  * Measured: rho = 0.863 at sf0.001 (n=500), 0.817 at sf0.01 (n=500) —
  * the basis for QualitySketchSpec's 0.75 floor. */
import org.apache.spark.sql.SparkSession
object RankCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val a = graft.SparkEntry.queries("t84_bigram_surprisal")(spark, sf)
        .select("doc_id", "bits_per_bigram").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val b = graft.SparkEntry.queries("t86_bigram_surprisal_hashed")(spark, sf)
        .select("doc_id", "bits_per_bigram").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val ids = a.keySet.intersect(b.keySet).toSeq
      def ranks(m: Map[Long, Double]) = ids.sortBy(m).zipWithIndex.toMap
      val (ra, rb) = (ranks(a), ranks(b))
      val n = ids.size.toDouble
      val d2 = ids.map(i => { val d = ra(i) - rb(i); d.toDouble * d }).sum
      val rho = 1.0 - 6.0 * d2 / (n * (n * n - 1.0))
      println(s"SPEARMAN $sf n=${ids.size} rho=$rho")
    }
    spark.stop()
  }
}
