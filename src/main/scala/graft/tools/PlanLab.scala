package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Developer tool: A/B timing + plan inspection for operator strategies.
  * Usage: runMain graft.tools.PlanLab [sfDir]. Not part of the driver
  * contract. */
object PlanLab {
  def time[A](label: String, reps: Int = 3)(f: => A): Unit = {
    f // warm
    val times = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }
    println(f"$label%-40s min=${times.min}%.3f avg=${times.sum / reps}%.3f")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    time("q01 decimal(38) sums") {
      noop(li.groupBy(col("l_returnflag"), col("l_linestatus")).agg(
        sum(col("l_quantity").cast(DecimalType(38, 4))).cast("double").as("a"),
        sum(col("l_extendedprice").cast(DecimalType(38, 4))).cast("double").as("b"),
        sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast(DecimalType(38, 6))).cast("double").as("c"),
        sum((col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).cast(DecimalType(38, 6))).cast("double").as("d"),
        count(lit(1)).as("n")))
    }
    time("q01 decimal(18) sums") {
      noop(li.groupBy(col("l_returnflag"), col("l_linestatus")).agg(
        sum(col("l_quantity").cast(DecimalType(18, 4))).cast("double").as("a"),
        sum(col("l_extendedprice").cast(DecimalType(18, 4))).cast("double").as("b"),
        sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast(DecimalType(18, 6))).cast("double").as("c"),
        sum((col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).cast(DecimalType(18, 6))).cast("double").as("d"),
        count(lit(1)).as("n")))
    }
    time("q01 long fp, cast(x+0.5) no round") {
      noop(li.groupBy(col("l_returnflag"), col("l_linestatus")).agg(
        (sum((col("l_quantity") * 1e4 + 0.5).cast("long")) / 1e4).as("a"),
        (sum((col("l_extendedprice") * 1e4 + 0.5).cast("long")) / 1e4).as("b"),
        (sum((col("l_extendedprice") * (lit(1) - col("l_discount")) * 1e6 + 0.5).cast("long")) / 1e6).as("c"),
        (sum((col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")) * 1e6 + 0.5).cast("long")) / 1e6).as("d"),
        count(lit(1)).as("n")))
    }
    time("q01 long fixed-point sums") {
      noop(li.groupBy(col("l_returnflag"), col("l_linestatus")).agg(
        (sum(round(col("l_quantity") * 1e4).cast("long")) / 1e4).as("a"),
        (sum(round(col("l_extendedprice") * 1e4).cast("long")) / 1e4).as("b"),
        (sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 1e6).cast("long")) / 1e6).as("c"),
        (sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")) * 1e6).cast("long")) / 1e6).as("d"),
        count(lit(1)).as("n")))
    }
    time("q01 plain double sums") {
      noop(li.groupBy(col("l_returnflag"), col("l_linestatus")).agg(
        sum(col("l_quantity")).as("a"),
        sum(col("l_extendedprice")).as("b"),
        sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("c"),
        sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).as("d"),
        count(lit(1)).as("n")))
    }
    time("bare scan") { noop(li) }
    time("scan 2 cols") { noop(li.select("l_quantity", "l_returnflag")) }
    spark.stop()
  }
}
