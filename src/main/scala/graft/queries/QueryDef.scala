package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named query exposed through [[graft.SparkEntry]].
  *
  * @param build  builds the result DataFrame from a scale-factor directory
  *               containing the driver-generated parquet tables
  * @param oracle equivalent DuckDB SQL over the same tables (None → the
  *               driver records a weaker rows-only check)
  */
final case class QueryDef(
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Memoized per (session, dir, table): `spark.read.parquet` re-lists the
    * directory and re-reads footers on every call, which across 40+ bench
    * queries is pure fixed overhead. DataFrames are immutable plans, so
    * reuse is safe. Stopped sessions are evicted explicitly on the next
    * lookup — weak keys alone would never collect here, because the
    * cached DataFrames strongly reference their session. */
  private val cache = new java.util.HashMap[
    SparkSession, java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]]()

  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark) // idempotent
    val perSession = cache.synchronized {
      cache.keySet.removeIf(s => s.sparkContext.isStopped)
      cache.computeIfAbsent(spark,
        _ => new java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]())
    }
    perSession.computeIfAbsent((dir, name), { _ =>
      if (name == "events") events(spark, dir)
      else spark.read.parquet(s"$dir/$name.parquet")
    })
  }

  /** events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
    * rejects. Read it as a long (legacy conf) and truncate ns→µs exactly as
    * DuckDB does on scan, so oracle comparisons line up. Integer division
    * (`div`) is required: a double roundtrip would lose precision above
    * 2^53 ns. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", org.apache.spark.sql.functions.expr(
        "timestamp_micros(ts div 1000)"))
  }

  /** Register every fixture table as a temp view so spark.sql queries can
    * use the same table names the DuckDB oracle sees. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
}
