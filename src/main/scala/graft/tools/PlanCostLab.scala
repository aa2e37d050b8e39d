package graft.tools

import org.apache.spark.sql.SparkSession

/** Developer tool: planning-vs-execution split per query. Not contract. */
object PlanCostLab {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("t06_ann_lsh", "t12_cosine_neardup", "t13_ann_ivf", "q01_agg_pricing")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      // warm JIT of parser/analyzer once
      graft.SparkEntry.queries(n)(spark, sfDir).queryExecution.executedPlan
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, sfDir).queryExecution.executedPlan
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$n%-25s plan min=${ts.min}%.3f")
    }
    spark.stop()
  }
}
