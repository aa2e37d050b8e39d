package graft.connections

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SaveMode}

/** Deltatable semantics emulated over a parquet directory table.
  *
  * No delta-spark jar ships in /opt/spark/jars (offline build), so this
  * implements the reference's *behavioral contract*
  * (ankaflow/connections/delta.py) on plain parquet:
  *  - tap: mandatory query with `FROM Deltatable` placeholder
  *    (delta.py:138-182), dedup ranking + limit supported; reading a
  *    missing/empty table yields an empty DataFrame with the declared
  *    `fields` schema when present;
  *  - sink: strategy matrix (delta.py:368-382) —
  *      rows>0             → WRITE (append/overwrite per data_mode)
  *      rows=0 + schema    → CREATE (materialize empty table with schema)
  *      rows=0 + no schema → SKIP
  *  - sql: pseudo-statements DROP / TRUNCATE / OPTIMIZE DELTATABLE
  *    (delta.py:552-659); OPTIMIZE maps to a compaction rewrite.
  *
  * The interface matches the Connection trait, so a real delta-spark
  * implementation can drop in when the jar is available.
  */
final class DeltaConnection(ctx: ConnContext) extends Connection(ctx) {

  private val log = org.slf4j.LoggerFactory.getLogger(classOf[DeltaConnection])

  private def exists: Boolean = {
    val p = Paths.get(path)
    if (!Files.exists(p) || !Files.isDirectory(p)) false
    else {
      // walk recursively: a partitioned sink lays out hive-style subdirs
      // (path/col=v/part-*.parquet) with no top-level parquet files
      val stream = Files.walk(p)
      try stream.anyMatch(f => f.toString.endsWith(".parquet"))
      finally stream.close()
    }
  }

  private def emptyWithSchema: DataFrame = {
    val fields = conn.fields
    if (fields.nonEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        SchemaUtil.toStruct(fields))
    else sys.error(s"Deltatable at $path does not exist and no fields declared")
  }

  override def tap(query: Option[String], limit: Option[Int]): DataFrame = {
    val raw =
      if (exists) spark.read.option("mergeSchema", "true").parquet(path)
      else emptyWithSchema
    finishTap(raw, query, limit)
  }

  override def sink(from: DataFrame): Unit = {
    val hasRows = !from.isEmpty
    val declared = conn.fields
    val dataMode = conn.str("data_mode").getOrElse("append")
    val mode = dataMode match {
      case "append" => SaveMode.Append
      case "overwrite" => SaveMode.Overwrite
      case "error" => SaveMode.ErrorIfExists
      case other => sys.error(s"unknown data_mode: $other")
    }
    if (hasRows) {
      val writer = from.write.mode(mode)
      val partitions = conn.strList("partition")
      val w2 = if (partitions.nonEmpty) writer.partitionBy(partitions: _*) else writer
      w2.parquet(path)
    } else if (declared.nonEmpty && !exists) {
      // CREATE: empty table materialized from the declared schema
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        SchemaUtil.toStruct(declared)).write.mode(SaveMode.Overwrite).parquet(path)
    } // else SKIP (delta.py:368-382)
  }

  override def showSchema(): org.apache.spark.sql.types.StructType =
    if (exists) spark.read.parquet(path).schema
    else SchemaUtil.toStruct(conn.fields)

  override def sqlStmt(stmt: String): Option[DataFrame] = {
    val s = stmt.trim.toUpperCase.replaceAll("\\s+", " ")
    if (s.startsWith("DROP DELTATABLE")) {
      deleteRecursively(path)
      None
    } else if (s.startsWith("TRUNCATE DELTATABLE")) {
      // keep schema: re-create the empty table from current schema
      val schema = if (exists) Some(spark.read.parquet(path).schema) else None
      deleteRecursively(path)
      schema.foreach { sch =>
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], sch)
          .write.mode(SaveMode.Overwrite).parquet(path)
      }
      None
    } else if (s.startsWith("OPTIMIZE DELTATABLE")) {
      val flags = DeltaConnection.parseOptimizeFlags(stmt)
      log.info(s"OPTIMIZE $path: $flags")
      // COMPACT / VACUUM both map to one compaction rewrite on the
      // parquet emulation (no transaction log → nothing older than the
      // live files to vacuum); CLEANUP-only is a logged no-op for the
      // same reason. retention_hours is parsed + clamped for parity and
      // ready for a real delta-spark drop-in.
      if (exists && !flags.dryRun && (flags.compact || flags.vacuum)) {
        val df = spark.read.option("mergeSchema", "true").parquet(path)
        val tmp = path.stripSuffix("/") + "__compact_tmp"
        df.repartition(math.max(1, (df.count() / 5000000L).toInt))
          .write.mode(SaveMode.Overwrite).parquet(tmp)
        deleteRecursively(path)
        Files.move(Paths.get(tmp), Paths.get(path))
      }
      None
    } else sys.error(s"unsupported Deltatable statement: $stmt")
  }

  private def deleteRecursively(p: String): Unit = {
    val root = Paths.get(p)
    if (Files.exists(root)) {
      // collect before deleting — the walk stream holds directory handles
      val stream = Files.walk(root)
      val all =
        try stream.sorted(java.util.Comparator.reverseOrder())
          .collect(java.util.stream.Collectors.toList[java.nio.file.Path])
        finally stream.close()
      all.forEach(f => Files.delete(f))
    }
  }
}

object DeltaConnection {

  /** Parsed `OPTIMIZE DELTATABLE` flags (delta.py:604-659). */
  final case class OptimizeFlags(
      compact: Boolean, vacuum: Boolean, cleanup: Boolean,
      dryRun: Boolean, retentionHours: Int)

  /** Flag parsing with the reference's defaulting rule: neither COMPACT
    * nor VACUUM given → both, unless CLEANUP alone was asked; AGE=n[d|h]
    * (default 7 d) clamped to [0, 365 d] (delta.py:616-659). */
  def parseOptimizeFlags(stmt: String): OptimizeFlags = {
    val toks = stmt.trim.split("\\s+").map(_.toLowerCase).toList
    var compact = toks.contains("compact")
    var vacuum = toks.contains("vacuum")
    val cleanup = toks.contains("cleanup")
    val dryRun = toks.contains("dry_run")
    if (!compact && !vacuum && !cleanup) { compact = true; vacuum = true }
    val age = toks.collectFirst {
      case t if t.startsWith("age=") =>
        val v = t.substring(4)
        if (v.endsWith("h")) v.dropRight(1).toInt
        else if (v.endsWith("d")) v.dropRight(1).toInt * 24
        else v.toInt * 24
    }.getOrElse(7 * 24)
    OptimizeFlags(compact, vacuum, cleanup, dryRun,
      math.max(0, math.min(age, 365 * 24)))
  }
}
