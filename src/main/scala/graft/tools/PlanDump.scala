package graft.tools

import org.apache.spark.sql.SparkSession

/** Developer tool: print the executed plan of named SparkEntry queries
  * (the plan-audit magnifier next to PlanSpec's assertions). Not
  * contract.
  *
  * Usage: runMain graft.tools.PlanDump <sfDir> <name> [<name>…]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
                else graft.SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"==== $n ====")
      println(graft.SparkEntry.queries(n)(spark, dir)
        .queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
