package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._

/** Dev lab (r22): dump the PER-ROUND physical plans of t87's trainer
  * loop — the final frame t87 materializes is a LocalRelation of the
  * collected merges, so ExplainDump artifacts can't show the loop's
  * shape. Mirrors bpeRounds' round boundary exactly: round 1's winner
  * is collected for real, then the round-2 winner-count plan and the
  * round-2 checkpoint-input plan are dumped.
  *
  * Usage: runMain graft.tools.T87RoundPlanPeek <outFile> [sfDir]
  */
object T87RoundPlanPeek {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/t87_round2.txt")
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession.builder("graft-t87peek")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.queries.{DataSelection => DS}
    import graft.queries.Tables.t

    val vocab0 = t(spark, dir, "documents")
      .withColumn("words", split(col("text"), " "))
      .select(explode(col("words")).as("word"))
      .filter(length(col("word")) >= 2)
      .groupBy("word").agg(count(lit(1)).as("wcnt"))
      .withColumn("syms", expr(
        "transform(sequence(1, length(word)), i -> substr(word, i, 1))"))
    val ex = DS.bpeExplode(vocab0).localCheckpoint()
    def winner(frame: org.apache.spark.sql.DataFrame) =
      frame.filter(col("nxt").isNotNull)
        .groupBy("sym", "nxt").agg(sum("wcnt").as("n_occ"))
        .orderBy(col("n_occ").desc, col("sym"), col("nxt")).limit(1)
    val top = winner(ex).collect()(0)
    val (a, b) = (top.getString(0), top.getString(1))
    val ex2 = DS.bpeExplode(DS.bpeApplyMerge(ex, a, b))
    val sb = new StringBuilder
    sb.append(s"== round-2 checkpoint input (merge '$a'+'$b' applied, re-exploded) ==\n")
    sb.append(ex2.queryExecution.explainString(FormattedMode)).append("\n")
    sb.append("== round-2 winner count (reads the round-2 checkpoint) ==\n")
    sb.append(winner(ex2.localCheckpoint()).queryExecution
      .explainString(FormattedMode))
    Files.write(Paths.get(out), sb.toString.getBytes("UTF-8"))
    println(s"wrote $out")
    spark.stop()
  }
}
