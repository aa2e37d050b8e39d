package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** All query definitions, one per implemented operator (SURVEY.md §2). */
  def defs: Map[String, QueryDef] =
    Relational.defs ++ TrainingData.defs ++ DataSelection.defs ++
      Curation.defs ++ Multimodal.defs ++ Pipelines.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    defs("q01_agg_pricing").gated(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 — the GATE
    * shape (production frame + any hash-determinism sort); pipeline
    * embedders use `defs(name).production` instead. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map { case (k, d) => k -> d.gated }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    defs.collect { case (k, d) if d.oracle.isDefined => k -> d.oracle.get }
}
