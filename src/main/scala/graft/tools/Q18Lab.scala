package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Developer tool: A/B count-distinct strategies for q18. Not contract. */
object Q18Lab {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    PlanLab.time("expand (current)") {
      noop(li.groupBy("l_returnflag").agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        countDistinct(col("l_orderkey")).as("n_orders"),
        count(lit(1)).as("n_rows")).orderBy("l_returnflag"))
    }

    PlanLab.time("separate aggs + join") {
      def cd(c: String, as: String) =
        li.select("l_returnflag", c).groupBy("l_returnflag")
          .agg(countDistinct(col(c)).as(as))
      val rows = li.groupBy("l_returnflag").agg(count(lit(1)).as("n_rows"))
      noop(cd("l_partkey", "n_parts")
        .join(cd("l_suppkey", "n_supps"), "l_returnflag")
        .join(cd("l_orderkey", "n_orders"), "l_returnflag")
        .join(rows, "l_returnflag")
        .select("l_returnflag", "n_parts", "n_supps", "n_orders", "n_rows")
        .orderBy("l_returnflag"))
    }
    spark.stop()
  }
}
