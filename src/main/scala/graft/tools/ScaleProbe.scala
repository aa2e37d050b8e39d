package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev lab (r12 verdict stretch; factor arg added in r14): measure
  * wall-time SCALING of the heaviest t-ops by generating a one-off N×
  * documents fixture and timing each query at sf0.1 vs N×. NOT a gate —
  * the fixture is derived, not driver-generated. The r13 verdict asked
  * for a 30× point on the density-sensitive pair-list ops (t12 t31 t03
  * t89 t42): their 10× ratios grow with dup-graph density, so 10× alone
  * cannot separate sub-quadratic from quadratic — a 30× point can.
  *
  * The 10× corpus is 10 word-ROTATED copies of sf0.1's documents (copy
  * k rotates each text by 7k+3 words, k=0 keeps the original): rotation
  * preserves the word/token distribution (t87's BPE and unigram stats
  * stay realistic) while destroying shingle continuity, so copies do
  * NOT minhash-near-dup against each other — a naive 10× duplication
  * would manufacture 10-cliques in the dup graph and quadratically
  * inflate t15/t92/t94's pair lists, probing the wrong curve.
  *
  * Usage: runMain graft.tools.ScaleProbe [outDir [query,query,...] [factor]]
  */
object ScaleProbe {
  private val Default = Seq("t15_dedup_components", "t87_bpe_trainer",
    "t92_dup_pagerank", "t94_kmv_merge")

  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0) else "/tmp/graft_sf1"
    val queries =
      if (args.length > 1) args(1).split(",").toSeq else Default
    val factor = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val src = "/root/testdata/sf0.1"
    val docs = spark.read.parquet(s"$src/documents.parquet")
    val n = docs.agg(max("doc_id")).head.getLong(0) + 1
    val copies = (0 until factor).map { k =>
      val rotated =
        if (k == 0) docs
        else docs.withColumn("text", expr(
          s"""concat_ws(' ',
             |  slice(split(text, ' '), pmod(${7 * k + 3}, greatest(size(split(text, ' ')), 1)) + 1,
             |        size(split(text, ' '))),
             |  slice(split(text, ' '), 1, pmod(${7 * k + 3}, greatest(size(split(text, ' ')), 1))))
             |""".stripMargin))
          .withColumn("n_chars", length(col("text")).cast("long"))
      rotated.withColumn("doc_id", col("doc_id") + lit(k * n))
    }
    copies.reduce(_ unionAll _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    // embeddings: factor copies with ELEMENT-ROTATED vectors — rotation
    // preserves the norm but moves the direction, so copies don't
    // collapse into artificial cosine-duplicate clusters
    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val ne = emb.agg(max("vec_id")).head.getLong(0) + 1
    (0 until factor).map { k =>
      val rotated =
        if (k == 0) emb
        else emb.withColumn("embedding", expr(
          s"concat(slice(embedding, ${k + 1}, size(embedding)), " +
            s"slice(embedding, 1, $k))"))
      rotated.withColumn("vec_id", col("vec_id") + lit(k * ne))
    }.reduce(_ unionAll _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    println(s"probe fixture: ${spark.read.parquet(s"$out/documents.parquet").count()} docs, " +
      s"${spark.read.parquet(s"$out/embeddings.parquet").count()} vecs at $out")

    def time(name: String, dir: String): Double = {
      val runs = (1 to 3).map { _ =>
        spark.sharedState.cacheManager.clearCache()
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      runs.min
    }
    queries.foreach { q =>
      val base = time(q, src)
      val big = time(q, out)
      println(f"$q%-24s sf0.1 $base%6.2f s   ${factor}x $big%6.2f s   ratio ${big / base}%5.2f")
    }
    spark.stop()
  }
}
