package graft.connections

import org.apache.spark.sql.{DataFrame, SaveMode}
import graft.template.Json

/** Parquet source/sink (reference: ankaflow/connections/file.py:39-68).
  * `union_by_name=true` default ≈ Spark `mergeSchema`. The reference
  * writes a single file; Spark writes a directory — kept (scale-correct),
  * documented in SURVEY §2.2. */
final class ParquetConnection(ctx: ConnContext) extends Connection(ctx) {
  override def tap(query: Option[String], limit: Option[Int]): DataFrame = {
    val raw = spark.read
      .option("mergeSchema", "true")
      .options(passthroughOptions)
      .parquet(path)
    finishTap(raw, query, limit)
  }

  override def sink(from: DataFrame): Unit =
    from.write.mode(SaveMode.Overwrite).options(passthroughOptions).parquet(path)
}

/** ORC source/sink — an extension beyond the reference's format set
  * (DuckDB has no ORC reader): same contract as [[ParquetConnection]],
  * backed by Spark's built-in columnar ORC reader/writer, so predicate
  * pushdown and column pruning work exactly as for parquet. */
final class OrcConnection(ctx: ConnContext) extends Connection(ctx) {
  override def tap(query: Option[String], limit: Option[Int]): DataFrame = {
    val raw = spark.read
      .option("mergeSchema", "true")
      .options(passthroughOptions)
      .orc(path)
    finishTap(raw, query, limit)
  }

  override def sink(from: DataFrame): Unit =
    from.write.mode(SaveMode.Overwrite).options(passthroughOptions).orc(path)
}

/** CSV source/sink (file.py:96-118). `ignore_errors=true` default ≈
  * PERMISSIVE mode; header on both directions like DuckDB COPY. */
final class CsvConnection(ctx: ConnContext) extends Connection(ctx) {
  override def tap(query: Option[String], limit: Option[Int]): DataFrame = {
    // Declared `fields` skip schema inference — at scale, inference is a
    // full extra pass over the data (the reference's `columns=` read
    // option serves the same purpose, rest/common.py:70-79).
    val reader = spark.read
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .options(passthroughOptions)
    val raw =
      if (conn.fields.nonEmpty)
        reader.schema(SchemaUtil.toStruct(conn.fields)).csv(path)
      else reader.option("inferSchema", "true").csv(path)
    finishTap(raw, query, limit)
  }

  override def sink(from: DataFrame): Unit =
    from.write.mode(SaveMode.Overwrite).option("header", "true")
      .options(passthroughOptions).csv(path)
}

/** JSON source/sink (file.py:71-93). Default is a JSON array document
  * (DuckDB read_json_auto); `format: lines` switches to JSONL. Sinks are
  * newline-delimited like the reference (models/core.py:215). */
final class JsonConnection(ctx: ConnContext) extends Connection(ctx) {
  override def tap(query: Option[String], limit: Option[Int]): DataFrame = {
    val lines = conn.str("format").contains("lines")
    val reader = spark.read
      .option("multiLine", (!lines).toString)
      .options(passthroughOptions)
    // declared fields skip the schema-inference pass (see CsvConnection)
    val raw =
      if (conn.fields.nonEmpty)
        reader.schema(SchemaUtil.toStruct(conn.fields)).json(path)
      else reader.json(path)
    finishTap(raw, query, limit)
  }

  override def sink(from: DataFrame): Unit =
    from.write.mode(SaveMode.Overwrite).options(passthroughOptions).json(path)
}

/** Generic file reader (file.py:121-180): dispatch by `filetype` param or
  * path suffix. parquet/csv/json/txt distribute through Spark readers;
  * xlsx/xml/html parse driver-side (small-ingest formats, exactly how the
  * reference's pandas readers work — see [[TabularFiles]]). Read-only. */
final class FileConnection(ctx: ConnContext) extends Connection(ctx) {
  override def tap(query: Option[String], limit: Option[Int]): DataFrame = {
    // runtime context overrides: FileName replaces the locator, FileType
    // the kind — the reference's per-run file dispatch (file.py:124-131)
    val file = ctx.context.get("FileName").map(v =>
      Locator.locate(String.valueOf(v), ctx.cfg)).getOrElse(path)
    val ftype = ctx.context.get("FileType").map(String.valueOf(_).toLowerCase)
      .orElse(conn.str("filetype")).getOrElse(
        file.reverse.takeWhile(_ != '.').reverse.toLowerCase)
    val raw = ftype match {
      case "parquet" => spark.read.option("mergeSchema", "true").parquet(file)
      case "csv" => spark.read.option("header", "true")
        .option("inferSchema", "true").csv(file)
      case "json" | "jsonl" => spark.read
        .option("multiLine", (ftype == "json").toString).json(file)
      case "txt" | "text" => spark.read.text(file)
      case "orc" => spark.read.option("mergeSchema", "true").orc(file)
      // spreadsheet/markup kinds parse driver-side like the reference's
      // pandas readers (file.py:136-147) — see TabularFiles scaladoc
      case "xlsx" => TabularFiles.readXlsx(spark, file)
      case "xml" => TabularFiles.readXml(spark, file)
      case "html" | "htm" => TabularFiles.readHtml(spark, file)
      case other => throw new UnsupportedOperationException(
        s"File connection: unsupported filetype '$other'")
    }
    finishTap(raw, query, limit)
  }

  override def sink(from: DataFrame): Unit =
    throw new UnsupportedOperationException("File connection is read-only")
}

/** Variable tap/sink (file.py:17-36): sink stores the previous stage's
  * rows into the shared variables map; tap materializes a stored value
  * back into a DataFrame. JSON is the interchange (like the reference's
  * json.dumps → read_json round trip). */
final class VariableConnection(ctx: ConnContext) extends Connection(ctx) {
  private def varName: String = locator

  override def tap(query: Option[String], limit: Option[Int]): DataFrame = {
    val value = ctx.variables.getOrElse(varName,
      sys.error(s"Variable '$varName' is not set"))
    val jsonRows: Seq[String] = value match {
      case l: Seq[_] => l.map(Json.write)
      case m: Map[_, _] => Seq(Json.write(m))
      case s: String => Seq(s)
      case other => Seq(Json.write(other))
    }
    val raw = spark.read.json(
      spark.createDataset(jsonRows)(org.apache.spark.sql.Encoders.STRING))
    finishTap(raw, query, limit)
  }

  override def sink(from: DataFrame): Unit = {
    val rows = graft.core.Flow.guardedCollect(from,
      s"Variable sink '$varName'", ctx.cfg.maxDriverRows)
      .toList.map(Json.parse)
    ctx.variables.put(varName, rows)
  }
}
