package graft.tools

/** Test-scope helper: dump executed plans for named queries.
  * Usage: Test/runMain graft.tools.ExplainDump q02_filter_project ... */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val spark = graft.SparkSuite.spark
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    args.foreach { name =>
      println(s"===== $name =====")
      val df = graft.SparkEntry.queries(name)(spark, sf)
      df.collect()
      println(df.queryExecution.executedPlan.toString.take(5000))
    }
    spark.stop()
  }
}
// (codegen debug appended temporarily)
