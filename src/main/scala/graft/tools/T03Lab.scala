package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Developer tool: A/B timing for t03_ngram_jaccard strategies.
  * Usage: runMain graft.tools.T03Lab [sfDir]. Not part of the driver
  * contract. */
object T03Lab {
  private val shingleExpr =
    "array_distinct(transform(sequence(1, greatest(size(words) - 2, 1)), i -> concat_ws(' ', slice(words, i, 3))))"
  private val DfCap = 100

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
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

    println("documents rows: " + spark.read.parquet(s"$sfDir/documents.parquet").count())
    println("exploded shingles: " + docs.select(explode(col("sh"))).count())

    def finish(kept: DataFrame): DataFrame = {
      val sizes = kept.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
      val inter = kept.as("a")
        .join(kept.as("b"),
          col("a.lang") === col("b.lang") && col("a.bucket") === col("b.bucket") &&
            col("a.shingle") === col("b.shingle") &&
            col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("n_inter"))
      inter
        .join(sizes.select(col("doc_id").as("doc_a"), col("n_sh").as("na")), "doc_a")
        .join(sizes.select(col("doc_id").as("doc_b"), col("n_sh").as("nb")), "doc_b")
        .withColumn("jaccard",
          col("n_inter").cast("double") /
            (col("na") + col("nb") - col("n_inter")).cast("double"))
        .filter(col("jaccard") >= 0.2)
        .select("doc_a", "doc_b", "n_inter", "jaccard")
        .orderBy("doc_a", "doc_b")
    }

    PlanLab.time("A: window df + cache (current)") {
      val kept = docs
        .select(col("doc_id"), col("lang"), col("bucket"),
          explode(col("sh")).as("shingle"))
        .withColumn("df", count(lit(1)).over(Window.partitionBy("shingle")))
        .filter(col("df") <= DfCap)
        .drop("df")
        .cache()
      noop(finish(kept))
      kept.unpersist(true)
    }

    PlanLab.time("B: groupBy df + join, cache kept") {
      val ex = docs.select(col("doc_id"), col("lang"), col("bucket"),
        explode(col("sh")).as("shingle"))
      val ok = ex.groupBy("shingle").agg(count(lit(1)).as("df"))
        .filter(col("df") <= DfCap).select("shingle")
      val kept = ex.join(ok, "shingle")
        .select("doc_id", "lang", "bucket", "shingle").cache()
      noop(finish(kept))
      kept.unpersist(true)
    }

    PlanLab.time("C: cache exploded, groupBy df + join") {
      val ex = docs.select(col("doc_id"), col("lang"), col("bucket"),
        explode(col("sh")).as("shingle")).cache()
      val ok = ex.groupBy("shingle").agg(count(lit(1)).as("df"))
        .filter(col("df") <= DfCap).select("shingle")
      val kept = ex.join(ok, "shingle")
        .select("doc_id", "lang", "bucket", "shingle")
      noop(finish(kept))
      ex.unpersist(true)
    }

    PlanLab.time("D: window df, no cache") {
      val kept = docs
        .select(col("doc_id"), col("lang"), col("bucket"),
          explode(col("sh")).as("shingle"))
        .withColumn("df", count(lit(1)).over(Window.partitionBy("shingle")))
        .filter(col("df") <= DfCap)
        .drop("df")
      noop(finish(kept))
    }

    spark.stop()
  }
}
