package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Developer tool: A/B the t32 dataflows COLD (cache cleared between
  * runs — the round-5 cache+join-back shape re-used its warm
  * InMemoryRelation across bench samples, so its recorded 0.65 s was a
  * warm-cache number, not an engine cost). Not contract. */
object T32Lab {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def wins: DataFrame = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"), explode(expr(
        "sequence(1, greatest(length(text) - 49, 1), 10)")).as("i"))
      .select(col("doc_id"),
        md5(expr("substr(text, i, 50)").cast("binary")).as("h"))

    // round-5 shape: cache + dup agg + join-back
    def oldShape(): DataFrame = {
      val w = wins.cache()
      val dups = w.groupBy("h")
        .agg(min("doc_id").as("mn"), max("doc_id").as("mx"))
        .filter(col("mn") =!= col("mx"))
        .select(col("h"), lit(1L).as("dup"))
      w.join(dups, Seq("h"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_windows"),
          coalesce(sum("dup"), lit(0L)).as("n_dup_windows"))
    }

    // round-6 shape: one digest-keyed agg, explode unfold
    def newShape(): DataFrame = {
      val per = wins.groupBy("h")
        .agg(min("doc_id").as("mn"), max("doc_id").as("mx"),
          collect_list("doc_id").as("ids"))
        .select((col("mn") =!= col("mx")).as("is_dup"),
          explode(col("ids")).as("doc_id"))
      per.groupBy("doc_id")
        .agg(count(lit(1)).as("n_windows"),
          sum(when(col("is_dup"), 1L).otherwise(0L)).as("n_dup_windows"))
    }

    // bounded-state candidate: per-(h,doc) counts first (tiny agg
    // state), then a spill-safe window over h for the distinct-doc
    // test — no group ever materializes an in-memory id list
    def boundedShape(): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val pairCounts = wins.groupBy("h", "doc_id")
        .agg(count(lit(1)).as("cnt"))
      val flagged = pairCounts.withColumn("ndocs",
        count(lit(1)).over(Window.partitionBy("h")))
      flagged.groupBy("doc_id")
        .agg(sum("cnt").as("n_windows"),
          sum(when(col("ndocs") >= 2, col("cnt")).otherwise(0L))
            .as("n_dup_windows"))
    }

    def time(label: String, f: () => DataFrame): Unit = {
      def once(): Double = {
        val t0 = System.nanoTime()
        f().write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm JIT/codegen, still cold data cache after clear
      val ts = (1 to 5).map(_ => once()).sorted
      println(f"$label%-10s med ${ts(ts.length / 2)}%.3f  min ${ts.head}%.3f")
    }
    time("old", oldShape)
    time("new", newShape)
    time("bounded", boundedShape)
    spark.stop()
  }
}
