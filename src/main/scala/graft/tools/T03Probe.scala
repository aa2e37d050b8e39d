package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Developer tool: stage-wise cost probe for t03. Not driver contract. */
object T03Probe {
  private val shingleExpr =
    "array_distinct(transform(sequence(1, greatest(size(words) - 2, 1)), i -> concat_ws(' ', slice(words, i, 3))))"
  private val DfCap = 100

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .withColumn("words", split(col("text"), " "))
      .select(col("doc_id"), col("lang"),
        (col("n_chars") / 100).cast("int").as("bucket"),
        expr(shingleExpr).as("sh"))

    def ex = docs.select(col("doc_id"), col("lang"), col("bucket"),
      explode(col("sh")).as("shingle"))

    PlanLab.time("1: shingle explode only") { noop(ex) }

    val kept = ex
      .withColumn("df", count(lit(1)).over(Window.partitionBy("shingle")))
      .filter(col("df") <= DfCap)
      .drop("df")
      .cache()
    PlanLab.time("2: window df + cache materialize") { noop(kept); kept.count() }
    println("kept rows: " + kept.count())

    val inter = kept.as("a")
      .join(kept.as("b"),
        col("a.lang") === col("b.lang") && col("a.bucket") === col("b.bucket") &&
          col("a.shingle") === col("b.shingle") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_inter"))
    PlanLab.time("3: pair join + agg") { noop(inter) }
    println("pair rows: " + inter.count())
    val raw = kept.as("a")
      .join(kept.as("b"),
        col("a.lang") === col("b.lang") && col("a.bucket") === col("b.bucket") &&
          col("a.shingle") === col("b.shingle") &&
          col("a.doc_id") < col("b.doc_id"))
    println("raw candidate rows: " + raw.count())
    spark.stop()
  }
}
