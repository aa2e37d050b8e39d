package graft

import scala.collection.mutable
import org.apache.spark.sql.SparkSession
import graft.connections.FlowConfig
import graft.core.Flow
import graft.model.Stages

/** CLI entry point (reference: ankaflow/cli.py):
  *
  *   graft <pipeline.yaml> [-c k=v ...] [-v k=v ...] [-o fmt path]
  *
  * -c sets immutable context entries, -v sets initial variables, -o writes
  * the final relation (parquet|csv|json). Connection configuration comes
  * from env: GRAFT_BUCKET, GRAFT_DATA_PREFIX (cli.py:37-55).
  */
object Main {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println(
        "usage: graft <pipeline.yaml> [-c k=v ...] [-v k=v ...] [-o fmt path]")
      sys.exit(2)
    }
    val yamlPath = args(0)
    val context = mutable.Map[String, Any]()
    val variables = mutable.Map[String, Any]()
    var output: Option[(String, String)] = None
    var i = 1
    while (i < args.length) {
      args(i) match {
        case "-c" =>
          val Array(k, v) = args(i + 1).split("=", 2)
          context(k) = v
          i += 2
        case "-v" =>
          val Array(k, v) = args(i + 1).split("=", 2)
          variables(k) = v
          i += 2
        case "-o" =>
          output = Some((args(i + 1), args(i + 2)))
          i += 3
        case other =>
          System.err.println(s"unknown argument: $other")
          sys.exit(2)
      }
    }
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("graft")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cfg = FlowConfig(
      bucket = sys.env.get("GRAFT_BUCKET"),
      dataPrefix = sys.env.get("GRAFT_DATA_PREFIX"))
    try {
      val flow = new Flow(spark, Stages.loadFile(yamlPath), context.toMap,
        cfg, variables).run()
      output.foreach { case (fmt, path) =>
        val df = flow.df()
        fmt match {
          case "parquet" => df.write.mode("overwrite").parquet(path)
          case "csv" => df.write.mode("overwrite").option("header", "true").csv(path)
          case "json" => df.write.mode("overwrite").json(path)
          case other => sys.error(s"unknown output format: $other")
        }
        println(s"wrote ${fmt} output to $path")
      }
    } finally spark.stop()
  }
}
