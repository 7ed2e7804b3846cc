package graft.ingest

import java.nio.file.Paths

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops.Projections

/** S1–S3 + O1 — config-driven CSV ingestion (the Bronze layer).
  *
  * Reproduces `/root/reference/include/load_raw_to_bq.py:33-78`: header
  * row, schema autodetect, optional header sanitize (`.` → `_`,
  * `load_raw_to_bq.py:10-30`), truncate-write semantics — re-expressed as
  * `spark.read.csv` + overwrite-mode parquet.
  *
  * Scale notes: `inferSchema` samples the file with an extra pass — at
  * 100 TB pass an explicit schema (the registry supports it) so the scan
  * is single-pass; CSV splits are line-based so parallelism comes free.
  */
final case class RawSource(
    name: String,
    path: String,
    table: String,
    sanitizeHeaders: Boolean = false,
    schemaDdl: Option[String] = None)

object CsvLoader {

  /** St3 — table/source names derived from the file stem: lowercase,
    * `-`/space/`.` → `_`, and a `_raw` suffix for the raw source
    * (`integrate_new_dataset.py:61-62`). Inner dots are sanitized, not
    * kept — only the LAST extension is stripped, and a residual dot
    * (`loans.v2.csv` → `loans.v2`) would be an invalid multi-part temp
    * view name downstream. A stem that sanitizes to nothing (e.g. a
    * hidden file `.csv`) is rejected rather than yielding an unusable
    * empty table name. */
  def tableNameFromPath(path: String): String = {
    val file = Paths.get(path).getFileName.toString
    val stem = file.lastIndexOf('.') match {
      case -1 => file
      case i  => file.substring(0, i)
    }
    // every non-identifier character maps to '_', not just the three
    // common ones: a stem like "report (1)" must not survive into a
    // temp-view name that throws ParseException at registration time,
    // far from here
    val name = stem.toLowerCase.map(c =>
      if (c.isLetterOrDigit && c <= 'z' || c == '_') c else '_')
    require(name.exists(_ != '_'),
      s"cannot derive a table name from '$path' (no identifier characters in stem)")
    name
  }

  def rawSourceNameFromPath(path: String): String =
    s"${tableNameFromPath(path)}_raw"

  /** S1 + S2 — load one CSV with header + autodetect (or explicit DDL
    * schema), optionally sanitizing header names. */
  def loadCsv(spark: SparkSession, src: RawSource): DataFrame = {
    val reader = spark.read.option("header", "true")
    val withSchema = src.schemaDdl match {
      case Some(ddl) => reader.schema(ddl)
      case None      => reader.option("inferSchema", "true")
    }
    val df = withSchema.csv(src.path)
    if (src.sanitizeHeaders) Projections.sanitizeHeaders(df) else df
  }

  /** S3 — truncate-write: full replace of the target (WRITE_TRUNCATE
    * semantics, `load_raw_to_bq.py:71`). */
  def writeTruncate(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  /** Read a parquet directory whose appended batches carry EVOLVED
    * schemas (a source added columns over time): mergeSchema unions the
    * per-file schemas; rows from older files read the new columns as
    * null. Costs a footer read per file — at 100 TB, prefer a table
    * format or an explicit schema once evolution settles. */
  def readEvolved(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

  /** O1 — config fan-out: one load per registry entry, registered as a
    * temp view named after the source's table. Table names must be
    * distinct: [[SourceRegistry]] dedupes by `name` only, and two
    * sources resolving to one table would silently shadow each other in
    * both the returned map and the temp-view namespace. */
  def loadAll(spark: SparkSession, sources: Seq[RawSource]): Map[String, DataFrame] = {
    val dup = sources.groupBy(_.table).collect { case (t, ss) if ss.size > 1 => t }
    require(dup.isEmpty,
      s"multiple sources map to the same table name(s) ${dup.mkString(", ")} — " +
        "later loads would silently replace earlier ones")
    sources.map { src =>
      val df = loadCsv(spark, src)
      df.createOrReplaceTempView(src.table)
      src.table -> df
    }.toMap
  }
}

/** M4 — source registry with idempotent registration (dedupe by name).
  * Ref: `include/integrate_new_dataset.py:113-155`. */
final class SourceRegistry(initial: Seq[RawSource] = Nil) {
  private var sources: Vector[RawSource] = initial.toVector

  def all: Seq[RawSource] = sources

  /** Append unless a source of the same name exists (idempotence check,
    * `integrate_new_dataset.py:121-127`). Returns true if added. */
  def register(src: RawSource): Boolean =
    if (sources.exists(_.name == src.name)) false
    else { sources = sources :+ src; true }
}
