package graft.tools

import org.apache.spark.sql.SparkSession

/** Developer tool: stage timing for the p02 loop pipeline. Not contract. */
object P02Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    org.apache.logging.log4j.core.config.Configurator.setLevel("graft",
      org.apache.logging.log4j.Level.INFO)
    def run(): Unit = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries("p02_pipeline_loop")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      println(f"p02 total ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    run(); run()
    spark.stop()
  }
}
