package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ShingleLab {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val old = "array_distinct(transform(sequence(1, greatest(size(split(text, ' ')) - 2, 1)), i -> concat_ws(' ', slice(split(text, ' '), i, 3))))"
    val neu = "array_distinct(transform(sequence(1, greatest(size(words) - 2, 1)), i -> concat_ws(' ', slice(words, i, 3))))"
    def time(label: String)(f: => Unit): Unit = {
      f
      val t0 = System.nanoTime(); f
      println(f"$label%-30s ${(System.nanoTime()-t0)/1e9}%.3f")
    }
    time("old shingle explode") {
      noop(docs.select(col("doc_id"), explode(expr(old)).as("s")))
    }
    time("words-once shingle explode") {
      noop(docs.withColumn("words", split(col("text"), " "))
        .select(col("doc_id"), explode(expr(neu)).as("s")))
    }
    spark.stop()
  }
}
