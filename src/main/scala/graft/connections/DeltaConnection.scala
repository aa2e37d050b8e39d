package graft.connections

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
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
  * VERSION HISTORY (real, not approximated): every commit (write,
  * create, truncate, optimize) appends a manifest
  * `_graft_log/<version>.json` — the version's full file snapshot plus
  * its schema DDL — and destructive commits RETIRE the files they would
  * have deleted into `_graft_log/retained/` (underscore-prefixed, so
  * normal directory reads never see them — the same visibility trick the
  * streaming index's scratch dir uses). A tap whose pseudo-SQL carries
  * `VERSION AS OF n` resolves manifest n and reads exactly its files,
  * live or retired — delta's time travel on plain parquet. `OPTIMIZE ..
  * VACUUM` deletes retired files past the retention age (delta's vacuum:
  * travel to a vacuumed version errors loudly); DROP removes table and
  * history. Time travel is scoped to non-partitioned tables: hive-style
  * partition values live in directory names, which a by-file read cannot
  * reconstruct (a real delta log stores them in metadata).
  *
  * The interface matches the Connection trait, so a real delta-spark
  * implementation can drop in when the jar is available.
  */
final class DeltaConnection(ctx: ConnContext) extends Connection(ctx) {

  private val log = org.slf4j.LoggerFactory.getLogger(classOf[DeltaConnection])

  private def root: java.nio.file.Path = Paths.get(path)
  private def logDir: java.nio.file.Path = root.resolve("_graft_log")
  private def retainedDir: java.nio.file.Path = logDir.resolve("retained")

  /** Data files of the CURRENT table state, relative to the table root —
    * excludes the log (its retired files are history, not state). */
  private def liveFiles: Seq[String] =
    if (!Files.isDirectory(root)) Nil
    else {
      val stream = Files.walk(root)
      try stream.iterator().asScala
        .filter(f => f.toString.endsWith(".parquet"))
        .map(f => root.relativize(f).toString)
        .filterNot(_.startsWith("_graft_log"))
        .toSeq
      finally stream.close()
    }

  private def exists: Boolean = liveFiles.nonEmpty

  // ---- version log ----

  private def manifestVersions: Seq[Long] =
    if (!Files.isDirectory(logDir)) Nil
    else {
      val stream = Files.list(logDir)
      try stream.iterator().asScala
        .flatMap(f => "^(\\d+)\\.json$".r
          .findFirstMatchIn(f.getFileName.toString).map(_.group(1).toLong))
        .toSeq.sorted
      finally stream.close()
    }

  private def readManifest(v: Long): Map[String, Any] = {
    val f = logDir.resolve(s"$v.json")
    if (!Files.exists(f)) sys.error(
      s"Deltatable at $path has no version $v " +
        s"(known: ${manifestVersions.mkString(", ")})")
    graft.template.Json.parse(Files.readString(f))
      .asInstanceOf[Map[String, Any]]
  }

  /** Append the next manifest: the table's file snapshot after `action`
    * committed. Written via temp-file + atomic move so a concurrent
    * reader never sees a torn manifest. */
  private def commitManifest(action: String, schemaDdl: String,
      partitioned: Boolean): Long = {
    Files.createDirectories(logDir)
    val v = manifestVersions.lastOption.map(_ + 1).getOrElse(0L)
    val body = graft.template.Json.write(scala.collection.immutable.ListMap(
      "version" -> v, "action" -> action, "partitioned" -> partitioned,
      "schema" -> schemaDdl, "files" -> liveFiles.sorted.toList))
    val tmp = logDir.resolve(s".$v.json.tmp")
    Files.writeString(tmp, body)
    Files.move(tmp, logDir.resolve(s"$v.json"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    v
  }

  /** Move the current data files into the retention area instead of
    * deleting them, so older manifests stay readable. Relative paths are
    * preserved (part-file names carry a write-job UUID, so retirements
    * from different commits never collide). */
  private def retireLiveFiles(): Unit = liveFiles.foreach { rel =>
    val dst = retainedDir.resolve(rel)
    Files.createDirectories(dst.getParent)
    Files.move(root.resolve(rel), dst)
  }

  /** Run `write` (which may clear the table directory — Spark's
    * SaveMode.Overwrite deletes the whole output path) with the version
    * log stashed safely beside the table, then restore it. */
  private def withStashedLog[A](write: => A): A = {
    val hasLog = Files.isDirectory(logDir)
    val stash = root.resolveSibling(root.getFileName.toString + "__graft_log_stash")
    if (hasLog) Files.move(logDir, stash)
    try write
    finally if (hasLog) {
      Files.createDirectories(root)
      Files.move(stash, logDir)
    }
  }

  /** Resolve a manifest's file list against live + retained locations
    * and build the version's DataFrame. */
  private def readVersion(v: Long): DataFrame = {
    val m = readManifest(v)
    if (m.get("partitioned").contains(true)) sys.error(
      s"Deltatable at $path: VERSION AS OF is not supported for " +
        "partitioned emulated tables (partition values live in directory " +
        "names; a real delta log records them in metadata)")
    val files = m.getOrElse("files", Nil).asInstanceOf[List[Any]].map(_.toString)
    val resolved = files.map { rel =>
      val live = root.resolve(rel)
      val retired = retainedDir.resolve(rel)
      if (Files.exists(live)) live.toString
      else if (Files.exists(retired)) retired.toString
      else sys.error(
        s"Deltatable at $path: version $v file '$rel' was vacuumed; " +
          "time travel to this version is no longer possible")
    }
    if (resolved.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(
          m.getOrElse("schema", "").toString))
    else spark.read.option("mergeSchema", "true").parquet(resolved: _*)
  }

  /** Split `VERSION AS OF n` out of the tap's pseudo-SQL (the one
    * time-travel clause the emulation supports). */
  private def extractVersion(query: Option[String]): (Option[String], Option[Long]) =
    query match {
      case Some(q) =>
        val re = "(?i)\\bVERSION\\s+AS\\s+OF\\s+(\\d+)\\b".r
        re.findFirstMatchIn(q) match {
          case Some(mm) =>
            (Some(re.replaceAllIn(q, " ").trim), Some(mm.group(1).toLong))
          case None => (query, None)
        }
      case None => (None, None)
    }

  private def emptyWithSchema: DataFrame = {
    val fields = conn.fields
    if (fields.nonEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        SchemaUtil.toStruct(fields))
    else sys.error(s"Deltatable at $path does not exist and no fields declared")
  }

  override def tap(query: Option[String], limit: Option[Int]): DataFrame = {
    val (stripped, version) = extractVersion(query)
    val raw = version match {
      case Some(v) => readVersion(v)
      case None =>
        if (exists) spark.read.option("mergeSchema", "true").parquet(path)
        else emptyWithSchema
    }
    finishTap(raw, stripped, limit)
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
      val partitions = conn.strList("partition")
      // overwrite logically REMOVES the current files: retire them so
      // older versions stay travelable, and stash the log out of the
      // way of Spark's output-path delete
      if (mode == SaveMode.Overwrite) retireLiveFiles()
      withStashedLog {
        val writer = from.write.mode(mode)
        val w2 = if (partitions.nonEmpty) writer.partitionBy(partitions: _*) else writer
        w2.parquet(path)
      }
      commitManifest(dataMode, from.schema.toDDL, partitions.nonEmpty)
    } else if (declared.nonEmpty && !exists) {
      // CREATE: empty table materialized from the declared schema
      val schema = SchemaUtil.toStruct(declared)
      withStashedLog {
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          schema).write.mode(SaveMode.Overwrite).parquet(path)
      }
      commitManifest("create", schema.toDDL, partitioned = false)
    } // else SKIP (delta.py:368-382)
  }

  override def showSchema(): org.apache.spark.sql.types.StructType =
    if (exists) spark.read.parquet(path).schema
    else SchemaUtil.toStruct(conn.fields)

  override def sqlStmt(stmt: String): Option[DataFrame] = {
    val s = stmt.trim.toUpperCase.replaceAll("\\s+", " ")
    if (s.startsWith("DROP DELTATABLE")) {
      deleteRecursively(path) // table AND history die together
      None
    } else if (s.startsWith("TRUNCATE DELTATABLE")) {
      // keep schema: re-create the empty table from current schema
      val schema = if (exists)
        Some(spark.read.option("mergeSchema", "true").parquet(path).schema)
      else None
      schema match {
        case Some(sch) =>
          retireLiveFiles() // pre-truncate versions stay travelable
          withStashedLog {
            spark.createDataFrame(
              spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], sch)
              .write.mode(SaveMode.Overwrite).parquet(path)
          }
          commitManifest("truncate", sch.toDDL, partitioned = false)
        case None => deleteRecursively(path)
      }
      None
    } else if (s.startsWith("OPTIMIZE DELTATABLE")) {
      val flags = DeltaConnection.parseOptimizeFlags(stmt)
      log.info(s"OPTIMIZE $path: $flags")
      if (exists && !flags.dryRun && flags.compact) {
        // compaction rewrite: same rows, fewer files; the replaced files
        // retire so earlier versions stay travelable until vacuumed
        val df = spark.read.option("mergeSchema", "true").parquet(path)
        val tmp = path.stripSuffix("/") + "__compact_tmp"
        df.repartition(math.max(1, (df.count() / 5000000L).toInt))
          .write.mode(SaveMode.Overwrite).parquet(tmp)
        val schemaDdl = df.schema.toDDL
        retireLiveFiles()
        withStashedLog {
          val stream = Files.list(root)
          try stream.iterator().asScala.toSeq.foreach(deleteTree)
          finally stream.close()
          val moved = Files.list(Paths.get(tmp))
          try moved.iterator().asScala.toSeq
            .foreach(f => Files.move(f, root.resolve(f.getFileName)))
          finally moved.close()
          Files.delete(Paths.get(tmp))
        }
        commitManifest("optimize", schemaDdl, partitioned = false)
      }
      if (!flags.dryRun && flags.vacuum)
        // delta's vacuum: retired files older than the retention age are
        // permanently deleted; time travel to versions needing them then
        // errors loudly in readVersion (never silently misreads)
        vacuumRetained(flags.retentionHours)
      None
    } else sys.error(s"unsupported Deltatable statement: $stmt")
  }

  private def vacuumRetained(retentionHours: Int): Unit =
    if (Files.isDirectory(retainedDir)) {
      val cutoff = System.currentTimeMillis() - retentionHours * 3600L * 1000L
      val stream = Files.walk(retainedDir)
      val files =
        try stream.iterator().asScala.filter(Files.isRegularFile(_)).toSeq
        finally stream.close()
      files.filter(f => Files.getLastModifiedTime(f).toMillis <= cutoff)
        .foreach(Files.delete)
    }

  private def deleteTree(p: java.nio.file.Path): Unit =
    if (Files.exists(p)) {
      val stream = Files.walk(p)
      val all =
        try stream.sorted(java.util.Comparator.reverseOrder())
          .collect(java.util.stream.Collectors.toList[java.nio.file.Path])
        finally stream.close()
      all.forEach(f => Files.delete(f))
    }

  // collect before deleting — the walk stream holds directory handles
  private def deleteRecursively(p: String): Unit = deleteTree(Paths.get(p))
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
