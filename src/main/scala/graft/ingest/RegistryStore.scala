package graft.ingest

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

import org.json4s.{DefaultFormats, Formats}
import org.json4s.jackson.Serialization

/** Persistent source-registry config — the reference's
  * `raw_sources.yml` + `staging.yml` round-trip
  * (`include/integrate_new_dataset.py:113-242`) re-expressed as one JSON
  * config file holding the raw-source entries plus the per-model default
  * check registrations.
  *
  * Merge semantics mirror the reference exactly:
  *  - an existing raw source of the same name is never overwritten
  *    (`_update_raw_sources_config`: "already exists ... skipping");
  *  - an existing model entry keeps its hand-tuned checks
  *    (`_update_staging_yml`: "already has config ... skipping");
  *  - re-integrating the same dataset is a no-op (idempotent).
  *
  * JSON via json4s (already on Spark's classpath) instead of YAML — the
  * structure, not the markup, is the contract.
  */
object RegistryStore {

  /** staging.yml `models[].columns[]` analogue: column + test names
    * (`"not_null"`, `"unique"`, `"accepted_values:a|b"`). */
  final case class ColumnChecks(name: String, tests: Seq[String])

  /** staging.yml `models[]` analogue. */
  final case class ModelChecks(name: String, columns: Seq[ColumnChecks])

  /** The whole config file: raw_sources.yml + staging.yml in one. */
  final case class RegistryConfig(rawSources: Seq[RawSource] = Nil,
                                  models: Seq[ModelChecks] = Nil)

  private implicit val formats: Formats = DefaultFormats

  def load(path: String): RegistryConfig = {
    val p = Paths.get(path)
    if (!Files.exists(p)) RegistryConfig()
    else Serialization.read[RegistryConfig](
      new String(Files.readAllBytes(p), StandardCharsets.UTF_8))
  }

  /** Write-temp-then-atomic-rename: a reader never observes a torn file
    * and a crash mid-write leaves the previous config intact. The temp
    * file is writer-unique (createTempFile), so two racing writers each
    * publish a complete file — last-write-wins, same as the reference's
    * yaml.dump; serialize integrations externally if that matters. */
  def save(path: String, config: RegistryConfig): Unit = {
    import java.nio.file.StandardCopyOption.{ATOMIC_MOVE, REPLACE_EXISTING}
    val p: Path = Paths.get(path)
    val dir = Option(p.getParent).getOrElse(Paths.get("."))
    Files.createDirectories(dir)
    val tmp = Files.createTempFile(dir, p.getFileName.toString, ".tmp")
    try {
      Files.write(tmp, Serialization.writePretty(config).getBytes(StandardCharsets.UTF_8))
      try Files.move(tmp, p, ATOMIC_MOVE, REPLACE_EXISTING)
      catch {
        // not all filesystems support atomic replace (NFS, some FUSE
        // mounts) — degrade to a plain replace rather than failing the
        // integration; the temp file is still complete when moved
        case _: java.nio.file.AtomicMoveNotSupportedException =>
          Files.move(tmp, p, REPLACE_EXISTING)
      }
    } catch {
      // on any failure the published config is untouched; don't leak tmp
      case e: Throwable =>
        try Files.deleteIfExists(tmp) catch { case _: Throwable => () }
        throw e
    }
  }

  /** Default tests registered for every integrated dataset — not_null on
    * the key columns (`integrate_new_dataset.py:221-235`). */
  def defaultModelChecks(modelName: String,
                         keyColumns: Seq[String] = Seq("loan_id", "customer_id")): ModelChecks =
    ModelChecks(modelName, keyColumns.map(c => ColumnChecks(c, Seq("not_null"))))

  /** One integration step: read the config (or start empty), append the
    * source and the model's default checks unless entries of the same
    * name already exist, write back. Returns the merged config. */
  def integrate(path: String, src: RawSource, modelName: String,
                keyColumns: Seq[String] = Seq("loan_id", "customer_id")): RegistryConfig = {
    val config = load(path)
    val withSource =
      if (config.rawSources.exists(_.name == src.name)) config.rawSources
      else config.rawSources :+ src
    val withModel =
      if (config.models.exists(_.name == modelName)) config.models
      else config.models :+ defaultModelChecks(modelName, keyColumns)
    val merged = RegistryConfig(withSource, withModel)
    save(path, merged)
    merged
  }

  /** Materialize a model's registered checks as runnable [[graft.quality.QualityCheck]]s. */
  def toChecks(model: ModelChecks): Seq[graft.quality.QualityCheck] =
    model.columns.flatMap { c =>
      c.tests.map {
        case "not_null" => graft.quality.NotNull(c.name)
        case "unique"   => graft.quality.Unique(c.name)
        case t if t.startsWith("accepted_values:") =>
          val vals = t.stripPrefix("accepted_values:").split('|').toSeq
          // a bare "accepted_values:" yields Seq("") — a check that
          // counts every real value as a violation; malformed specs get
          // the same fail-fast as unknown test names
          if (vals.isEmpty || vals.forall(_.isEmpty))
            throw new IllegalArgumentException(
              s"malformed test '$t' (expected accepted_values:v1|v2)")
          graft.quality.AcceptedValues(c.name, vals)
        case other => throw new IllegalArgumentException(s"unknown test: $other")
      }
    }

  /** Hydrate a [[SourceRegistry]] from the persisted config. */
  def toRegistry(config: RegistryConfig): SourceRegistry =
    new SourceRegistry(config.rawSources)
}
