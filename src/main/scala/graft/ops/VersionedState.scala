package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.hadoop.fs.{FileSystem, Path}

/** The shared versioned-snapshot commit protocol behind
  * [[MinhashIndexStore]], [[SemanticIndexStore]], and
  * [[IvfIndexStore]] — one implementation of the rules every persisted
  * incremental index here follows (the [[graft.streaming.CdcStream]]
  * rules):
  *
  *  - state lives under `dir/v=N`, one immutable directory per
  *    version, each holding a fixed set of named parquet subframes;
  *  - a version is COMMITTED iff every subframe carries its `_SUCCESS`
  *    marker AND the version directory itself was produced by the
  *    atomic rename below — readers take the latest committed version
  *    and never see a partial one;
  *  - a version is assembled in a hidden scratch directory
  *    (`dir/.tmp-v=N-<nonce>`) and committed by ONE rename to
  *    `dir/v=N`: a crash mid-write leaves only scratch debris
  *    (invisible to the version listing), and two maintainers racing
  *    the same version cannot interleave part-files — the loser either
  *    sees the destination exist, or (on a filesystem whose rename
  *    moves the source INTO an existing destination, the HDFS
  *    semantics) detects its scratch nested inside the winner's
  *    version, removes it, and fails by name;
  *  - an existing UNCOMMITTED destination at commit time is crash
  *    debris from a pre-rename protocol and is replaced — the
  *    crash-replay rule: re-running the same maintenance step
  *    overwrites the failed attempt. Debris is moved ASIDE by rename
  *    (to `dir/.debris-v=N-<nonce>`), never deleted in place: between
  *    the committed-ness check and an in-place delete, a racing
  *    maintainer's atomic rename can land a fresh commit at the
  *    destination, and the delete would destroy it — a silent lost
  *    update. The rename-aside is atomic, so whatever sat at the
  *    destination survives intact; if the moved directory turns out to
  *    carry every `_SUCCESS` marker it WAS a fresh commit, and it is
  *    renamed straight back with the race reported by name;
  *  - a pruner may delete any version except the latest committed one
  *    and, while a job runs against version V, V itself (plain parquet
  *    has no snapshot pin — retain ≥ the max expected job runtime).
  *    Scratch directories older than that runtime are crash debris and
  *    prune with it. */
private[graft] object VersionedState {

  private val VersionRe = "v=(\\d+)".r

  def fsPath(spark: SparkSession, dir: String): (FileSystem, Path) = {
    val path = new Path(dir)
    (path.getFileSystem(spark.sessionState.newHadoopConf()), path)
  }

  def versions(fs: FileSystem, path: Path): Seq[Long] =
    if (!fs.exists(path)) Seq.empty
    else fs.listStatus(path).toSeq
      .map(_.getPath.getName)
      .collect { case VersionRe(v) => v.toLong }

  def committed(fs: FileSystem, dir: String, v: Long,
                subframes: Seq[String]): Boolean =
    subframes.forall(sub =>
      fs.exists(new Path(s"$dir/v=$v/$sub/_SUCCESS")))

  /** Latest committed version, or None before the first init. Scratch
    * directories don't match the version pattern and are invisible; a
    * partial version (missing markers) is skipped — readers fall back
    * to the newest COMPLETE version, stale-but-consistent. */
  def latestVersion(spark: SparkSession, dir: String,
                    subframes: Seq[String]): Option[Long] = {
    val (fs, path) = fsPath(spark, dir)
    versions(fs, path).sorted.reverse.find(committed(fs, dir, _, subframes))
  }

  private val scratchCounter = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Assemble version `v` in a scratch directory via `write(scratch)`,
    * then commit it with one atomic rename — see the protocol above.
    * `write` must leave every subframe (with its `_SUCCESS`) under the
    * scratch path it is given. The scratch nonce derives from the JVM
    * name + a per-process counter, not wall clock. */
  def commitVersion(spark: SparkSession, dir: String, v: Long,
                    what: String, subframes: Seq[String])
                   (write: String => Unit): Unit = {
    val (fs, _) = fsPath(spark, dir)
    val nonce = java.lang.management.ManagementFactory.getRuntimeMXBean.getName
      .replaceAll("[^A-Za-z0-9]", "") + "-" + scratchCounter.incrementAndGet()
    val scratchName = s".tmp-v=$v-$nonce"
    val scratch = s"$dir/$scratchName"
    val dest = new Path(s"$dir/v=$v")
    try {
      write(scratch)
      def loseRace(): Nothing =
        throw new IllegalStateException(
          s"$what at $dir: lost the commit race for v=$v — another " +
            "maintainer committed it first; re-read the head and retry")
      // a committed destination is a lost race; an uncommitted one is
      // crash debris and is replaced (the crash-replay rule) — moved
      // aside by atomic rename, never deleted in place, so a fresh
      // commit landing between this check and the clearing cannot be
      // destroyed (see clearDebris)
      if (fs.exists(dest)) {
        if (committed(fs, dir, v, subframes)) loseRace()
        clearDebris(fs, dir, v, what, subframes, nonce)
      }
      if (!fs.rename(new Path(scratch), dest)) loseRace()
      // HDFS-semantics rename moves the source INTO an existing
      // destination instead of failing: detect the nested scratch,
      // remove it, and report the race
      val nested = new Path(dest, scratchName)
      if (fs.exists(nested)) {
        fs.delete(nested, true)
        loseRace()
      }
    } finally {
      val leftover = new Path(scratch)
      if (fs.exists(leftover)) fs.delete(leftover, true)
    }
  }

  /** Clear crash debris found at `dir/v=$v` ahead of a commit's rename,
    * without the delete-in-place TOCTOU: the caller just observed the
    * destination existing UNCOMMITTED, but a racing maintainer's atomic
    * rename may land a fresh commit there between that observation and
    * any clearing action — an in-place `delete(dest)` would destroy it
    * silently. So the destination is moved ASIDE by one atomic rename
    * (whatever it was, it survives intact at `.debris-v=N-<nonce>`),
    * then re-examined off to the side: a directory carrying every
    * subframe `_SUCCESS` was a fresh commit, not debris — it is renamed
    * straight back and the race reported by name. Genuine debris (the
    * only thing a crashed pre-rename-protocol maintainer can leave,
    * since directory contents never change after the crash) is deleted
    * from its aside path. The one unwinnable interleaving — the slot
    * was re-committed by a THIRD maintainer while the displaced commit
    * sat aside — cannot be repaired automatically (two competing
    * commits claimed one version) and fails naming the intact aside
    * path instead of losing either silently. */
  private[graft] def clearDebris(fs: FileSystem, dir: String, v: Long,
                               what: String, subframes: Seq[String],
                               nonce: String): Unit = {
    val dest = new Path(s"$dir/v=$v")
    val debris = new Path(s"$dir/.debris-v=$v-$nonce")
    if (!fs.rename(dest, debris))
      // the destination vanished or is contended mid-move: another
      // maintainer is clearing (or committing) this slot right now
      throw new IllegalStateException(
        s"$what at $dir: lost the commit race for v=$v — another " +
          "maintainer committed it first; re-read the head and retry")
    if (subframes.forall(sub => fs.exists(new Path(debris, s"$sub/_SUCCESS")))) {
      // the moved directory was a COMPLETE version: a fresh commit
      // landed in the race window and we displaced it — put it back
      if (!fs.rename(debris, dest))
        throw new IllegalStateException(
          s"$what at $dir: commit v=$v raced twice — a fresh commit " +
            s"landed while clearing debris, was moved aside, and the slot " +
            s"was re-committed before it could be restored; the displaced " +
            s"version is intact at $debris — restore it manually")
      throw new IllegalStateException(
        s"$what at $dir: lost the commit race for v=$v — another " +
          "maintainer committed it first; re-read the head and retry")
    }
    fs.delete(debris, true)
  }

  /** Run the INDEPENDENT subframe writes of one commit concurrently
    * (guide-§2.6 overlap of independent jobs): each task is a small
    * Spark action whose fixed costs — job scheduling, the coalesce(1)
    * meta write, per-file commit renames — otherwise run strictly
    * back-to-back on the driver while the executors idle. The tasks
    * write DISJOINT paths under the same scratch directory, nothing
    * reads another task's output, and the caller's atomic version
    * rename publishes all-or-nothing, so ordering between them is
    * immaterial. A task whose output another write DOES consume (the
    * minhash bands table derives from the just-written index bytes)
    * stays sequential INSIDE its task. Blocks until every task
    * finishes; every task runs to completion (no half-cancelled write
    * can outlive the attempt) and the first failure propagates. */
  def writeConcurrently(tasks: Seq[() => Unit]): Unit =
    if (tasks.sizeIs <= 1) tasks.foreach(_.apply())
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(tasks.size)
      try {
        val futs = tasks.map(t => pool.submit(
          new java.util.concurrent.Callable[Unit] { def call(): Unit = t() }))
        val failures = futs.flatMap(f => scala.util.Try(f.get()).failed.toOption)
        failures.headOption.foreach {
          case e: java.util.concurrent.ExecutionException => throw e.getCause
          case e => throw e
        }
      } finally pool.shutdown()
    }

  /** Fail BY NAME when a persisted meta frame predates the current
    * engine's schema (a required column is missing) — selecting the
    * column would otherwise throw an opaque unresolved-column planner
    * error on every read/probe/append of a standing index written by
    * an older version. The remedy is a rebuild: meta carries content
    * parameters, and an old index cannot prove what it was built
    * with. */
  def requireMetaCols(have: Seq[String], need: Seq[String],
                      what: String): Unit = {
    val missing = need.filterNot(have.contains)
    require(missing.isEmpty,
      s"$what: the persisted meta lacks column(s) ${missing.mkString(", ")} " +
        s"(has: ${have.mkString(", ")}) — the index was written by an older " +
        "engine version and cannot prove its build parameters; delete the " +
        "directory and rebuild")
  }

  // ---- per-version META memo -------------------------------------------
  //
  // Every store verb re-reads its version's one-row meta frame (a parquet
  // footer decode + a one-row Spark job, ~70-150 ms of pure fixed cost),
  // and chain walks read one per LINK — a composed lifecycle gate was
  // measured spending whole seconds on ~50 meta re-reads of bytes that the
  // protocol guarantees never change (a committed version directory is
  // immutable; the only legal "change" is deletion). The memo keys on the
  // meta DIRECTORY's file listing signature (names + lengths + mtimes —
  // one FS listStatus, no Spark job), so an out-of-protocol rewrite at the
  // same path is still seen and re-read; a genuinely new version is a new
  // key. Values are one boxed row each; the map is cleared past a bound
  // rather than LRU-tracked (thousands of entries would be ~100 KB — the
  // bound exists only to keep a pathological many-store JVM flat).

  private val metaMemo =
    new java.util.concurrent.ConcurrentHashMap[String, (String, Seq[Any])]()
  private val MetaMemoBound = 8192

  private def metaSig(fs: FileSystem, metaDir: Path): String =
    fs.listStatus(metaDir).map(s =>
      s"${s.getPath.getName}:${s.getLen}:${s.getModificationTime}")
      .sorted.mkString(",")

  /** The values of version `v`'s one-row meta frame in `cols` order,
    * memoized per (dir, v) against the meta directory's listing
    * signature. Fails by name ([[requireMetaCols]]) when the persisted
    * frame predates `cols` — on the first read; a memo hit already
    * passed that check for the same bytes.
    *
    * The miss path reads the row DIRECTLY with parquet-mr on the
    * driver — no Spark job, no file-index build: a meta frame is one
    * row of scalars, and the Spark read each first contact used to pay
    * (driver-side listing + schema inference + a one-row job) was
    * ~50–150 ms of pure fixed cost per version touched, a dozen times
    * per composed lifecycle gate. Values decode to the same boxed
    * types a Spark `Row.toSeq` carried (Int/Long/Boolean/Double/
    * String), so the stores' casts are unchanged; the store specs
    * round-trip every meta shape through this path. */
  def cachedMetaRow(spark: SparkSession, dir: String, v: Long,
                    cols: Seq[String], what: String): Seq[Any] = {
    val (fs, _) = fsPath(spark, dir)
    val metaDir = new Path(s"$dir/v=$v/meta")
    val sig = metaSig(fs, metaDir)
    val key = s"$dir/v=$v/meta"
    Option(metaMemo.get(key)) match {
      case Some((oldSig, row)) if oldSig == sig => row
      case _ =>
        val row = readOneRowParquet(fs, metaDir, cols, what)
        if (metaMemo.size() >= MetaMemoBound) metaMemo.clear()
        metaMemo.put(key, (sig, row))
        row
    }
  }

  /** Decode the single row of a one-row parquet directory on the
    * driver (parquet-mr, no Spark job) — the meta-frame fast path.
    * Handles every scalar type the stores persist; anything else (or a
    * row count other than one) fails by name — meta frames are written
    * `coalesce(1)` by the stores themselves, so either is protocol
    * corruption, not a case to paper over. */
  private def readOneRowParquet(fs: FileSystem, metaDir: Path,
                                cols: Seq[String], what: String): Seq[Any] = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.parquet.io.ColumnIOFactory
    import org.apache.parquet.example.data.Group
    import org.apache.parquet.example.data.simple.convert.GroupRecordConverter
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    val parts = fs.listStatus(metaDir).map(_.getPath)
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    var schema: org.apache.parquet.schema.MessageType = null
    val rows = scala.collection.mutable.ArrayBuffer.empty[Group]
    parts.foreach { p =>
      val reader = ParquetFileReader.open(
        HadoopInputFile.fromPath(p, fs.getConf))
      try {
        val fileSchema = reader.getFooter.getFileMetaData.getSchema
        if (schema == null) schema = fileSchema
        var pages = reader.readNextRowGroup()
        while (pages != null) {
          val rr = new ColumnIOFactory().getColumnIO(fileSchema)
            .getRecordReader(pages, new GroupRecordConverter(fileSchema))
          var i = 0L
          while (i < pages.getRowCount) { rows += rr.read(); i += 1 }
          pages = reader.readNextRowGroup()
        }
      } finally reader.close()
    }
    require(schema != null && rows.length == 1,
      s"$what: the meta frame at $metaDir holds ${rows.length} row(s), " +
        "not exactly one — the version's meta was corrupted or written " +
        "outside the store protocol")
    requireMetaCols(
      (0 until schema.getFieldCount).map(schema.getFieldName), cols, what)
    val row = rows.head
    cols.map { c =>
      val idx = schema.getFieldIndex(c)
      schema.getType(idx).asPrimitiveType().getPrimitiveTypeName match {
        case INT32 => row.getInteger(idx, 0)
        case INT64 => row.getLong(idx, 0)
        case BOOLEAN => row.getBoolean(idx, 0)
        case DOUBLE => row.getDouble(idx, 0)
        case FLOAT => row.getFloat(idx, 0)
        case BINARY => row.getString(idx, 0)
        case other => throw new IllegalStateException(
          s"$what: meta column '$c' at $metaDir has unsupported parquet " +
            s"type $other — the stores persist scalars only")
      }
    }
  }

  // ---- per-directory SCHEMA memo ---------------------------------------
  //
  // The accepted sinks re-derive their standing schema (a
  // spark.read.parquet(...).schema — driver-side listing + footer
  // inference, ~50-150 ms) on EVERY micro-batch's accept-time policy
  // check and again per fold. The bytes are immutable by protocol
  // (archive versions never change; a live batch directory changes only
  // under replay rewrite), so the schema memoizes against the same
  // file-listing signature the meta memo uses — a rewrite is seen and
  // re-inferred, an unchanged directory costs one listStatus.

  private val schemaMemo = new java.util.concurrent.ConcurrentHashMap[
    String, (String, org.apache.spark.sql.types.StructType)]()

  /** The parquet schema under `path`, memoized against the directory's
    * file-listing signature. */
  def cachedParquetSchema(spark: SparkSession,
                          path: String): org.apache.spark.sql.types.StructType = {
    val (fs, p) = fsPath(spark, path)
    val sig = metaSig(fs, p)
    Option(schemaMemo.get(path)) match {
      case Some((oldSig, s)) if oldSig == sig => s
      case _ =>
        val s = spark.read.parquet(path).schema
        if (schemaMemo.size() >= MetaMemoBound) schemaMemo.clear()
        schemaMemo.put(path, (sig, s))
        s
    }
  }

  // ---- per-version-directory FRAME memo --------------------------------
  //
  // Every chain walk re-created its link frames with
  // spark.read.parquet(...) — a fresh file listing + footer schema
  // inference per link per verb (~40-80 ms of driver time each), dozens
  // of times per composed lifecycle gate, over version directories the
  // protocol guarantees immutable. The DataFrame (its resolved relation
  // and file index) memoizes against the same listing signature as the
  // meta memo, keyed per session: an out-of-protocol rewrite is seen
  // and re-read, and a dead test session's frames can never leak into a
  // new one. Only VERSION-directory reads go through here — mutable
  // paths (live batch dirs, scratch) must keep the fresh read.

  private val frameMemo = new java.util.concurrent.ConcurrentHashMap[
    String, (String, DataFrame)]()

  /** A parquet frame over the protocol-immutable `path`, memoized
    * against the directory's file-listing signature. */
  def cachedVersionFrame(spark: SparkSession, path: String): DataFrame = {
    val (fs, p) = fsPath(spark, path)
    val sig = metaSig(fs, p)
    val key = s"${System.identityHashCode(spark)}:$path"
    Option(frameMemo.get(key)) match {
      case Some((oldSig, df)) if oldSig == sig => df
      case _ =>
        val df = spark.read.parquet(path)
        if (frameMemo.size() >= MetaMemoBound) frameMemo.clear()
        frameMemo.put(key, (sig, df))
        df
    }
  }

  /** Refuse to initialize a directory that already holds a COMMITTED
    * version: pointing a fresh builder at a standing index would
    * rebuild v=0 from the new corpus alone, silently dropping it.
    * Scratch debris (no committed version) does not block — crash
    * replay of init is just running init again. */
  def requireUninitialized(spark: SparkSession, dir: String,
                           subframes: Seq[String], what: String): Unit = {
    val (fs, path) = fsPath(spark, dir)
    val existing = versions(fs, path).filter(committed(fs, dir, _, subframes))
    require(existing.isEmpty,
      s"$what at $dir already holds committed versions " +
        s"(${existing.sorted.map("v=" + _).mkString(",")}) — init would " +
        "rebuild v=0 from the new corpus alone, silently dropping the " +
        "standing index; append onto the latest version, or explicitly " +
        "delete the directory to start over")
  }

  /** Require `expectedBase` to BE the latest committed version — the
    * append staleness rule, with the three-way message triage (stale /
    * never-committed / pruned-or-uninitialized) every store shares. */
  def requireBase(spark: SparkSession, dir: String, expectedBase: Long,
                  subframes: Seq[String], what: String): Unit = {
    val latest = latestVersion(spark, dir, subframes)
    require(latest.contains(expectedBase),
      s"$what at $dir: append expected base v=$expectedBase but the " +
        s"latest committed version is ${latest.map("v=" + _).getOrElse("<none>")} — " +
        (latest match {
          case Some(l) if l > expectedBase =>
            "another maintainer already advanced the index; re-read the head " +
              "and retry the append on it"
          case Some(_) =>
            "the expected base was never committed (crashed append?); retry " +
              "from the committed head"
          case None =>
            "the base was pruned or the index was never initialized"
        }))
  }

  /** Resolve a read target: the pinned version when `version` is
    * given — failing by name if it is missing or uncommitted (reading
    * it as parquet would either error opaquely or, with an explicit
    * schema, silently return 0 rows — an empty index "finds" nothing)
    * — or the latest committed version otherwise. Shared by every
    * store's read path. */
  def resolveVersion(spark: SparkSession, dir: String,
                     subframes: Seq[String], what: String,
                     version: Option[Long]): Long = version match {
    case Some(p) =>
      val (fs, _) = fsPath(spark, dir)
      require(committed(fs, dir, p, subframes),
        s"$what at $dir has no committed version v=$p " +
          s"(latest committed: ${latestVersion(spark, dir, subframes)
            .map("v=" + _).getOrElse("<none>")})")
      p
    case None =>
      latestVersion(spark, dir, subframes).getOrElse(
        throw new IllegalArgumentException(
          s"$what at $dir has no committed version"))
  }

  /** The version chain serving `v`, newest first: `v` and the delta
    * versions below it down to (and including) the nearest FULL
    * version, where `isFull(w)` reads the store's persisted full-bit
    * (each store keeps it in its own meta schema). Every link must be
    * committed — a cut chain (a pruner deleted a link the protocol
    * protects) fails by name rather than answering from a partial
    * corpus. Shared by all three stores so the chain rules cannot
    * drift between them. */
  def chain(spark: SparkSession, dir: String, v: Long,
            subframes: Seq[String], what: String)
           (isFull: Long => Boolean): Seq[Long] = {
    val (fs, _) = fsPath(spark, dir)
    val links = scala.collection.mutable.ArrayBuffer.empty[Long]
    var w = v
    var foundFull = false
    while (!foundFull && w >= 0) {
      require(committed(fs, dir, w, subframes),
        s"$what at $dir: version v=$v's chain needs v=$w, which is " +
          "missing or uncommitted — the chain was pruned or a commit " +
          "crashed; recover from a full version or rebuild")
      links += w
      foundFull = isFull(w)
      w -= 1
    }
    if (!foundFull) throw new IllegalStateException(
      s"$what at $dir: no full version at or below v=$v — v=0 is always " +
        "full, so the chain base was deleted outside the protocol")
    links.toSeq
  }

  /** [[prune]] with the delta-chain clamp: delete versions strictly
    * below `keepFrom`'s chain BASE (the newest full version at or
    * below it). Deltas make the naive "delete < keepFrom" unsafe — a
    * surviving version's chain may dip below the floor — so the floor
    * clamps to the chain base and can never orphan a link; space
    * reclamation advances as scheduled compactions introduce newer
    * full versions. Never prunes the latest committed version. Returns
    * the pruned version numbers. */
  def pruneToChainBase(spark: SparkSession, dir: String, keepFrom: Long,
                       subframes: Seq[String], what: String)
                      (isFull: Long => Boolean): Seq[Long] = {
    val head = latestVersion(spark, dir, subframes).getOrElse(
      throw new IllegalArgumentException(
        s"$what at $dir has no committed version — nothing to prune from"))
    require(keepFrom <= head,
      s"$what at $dir: prune keepFrom=v=$keepFrom is above the latest " +
        s"committed version v=$head — refusing to prune the head")
    prune(spark, dir,
      chain(spark, dir, keepFrom, subframes, what)(isFull).min,
      subframes, what)
  }

  /** The `cells` subframe serving a version chain — the union of the
    * given links — optionally pruned to a probe's touched cells. One
    * implementation for both cell-partitioned stores
    * ([[IvfIndexStore]], [[SemanticIndexStore]]) so the plan-critical
    * trick cannot drift: the prune filter goes on the RAW inferred
    * partition column (int — cell ids are 0..nlist-1, always int-safe)
    * BEFORE the long cast that restores in-memory schema parity, so
    * `PruneFileSourcePartitions` sees a plain partition-attribute IN
    * list on EVERY chain link and each scan reads only the touched
    * cell directories (plan-spec-pinned in both stores' specs). */
  def readCellChain(spark: SparkSession, dir: String, links: Seq[Long],
                    onlyCells: Option[Seq[Long]]): DataFrame = {
    import org.apache.spark.sql.functions.col
    links.map { w =>
      val raw = cachedVersionFrame(spark, s"$dir/v=$w/cells")
      val pruned = onlyCells match {
        case Some(cs) => raw.where(col("cell").isin(cs.map(_.toInt): _*))
        case None => raw
      }
      pruned.withColumn("cell", col("cell").cast("long"))
    }.reduce(_ unionByName _)
  }

  /** The OPTIONAL per-version tombstone subframe (`dir/v=N/tombs`, one
    * `tomb_id: long` column) — the targeted-removal verb the
    * append-only stores lacked: a `remove` writes an O(tombstones)
    * delta version whose tombs frame names the documents withdrawn
    * (takedown, opt-out, discovered contamination), probes exclude the
    * named ids, and the next [[MinhashIndexStore.compact]]-class fold
    * APPLIES the tombstones to the merged state and clears them — so
    * removal never costs an O(corpus) rebuild and a compacted chain
    * carries no removal debt. The subframe is deliberately NOT in any
    * store's committed-ness list: versions written before removal
    * existed stay committed, and the atomic version rename already
    * guarantees a tombs frame can never be half-visible. Tombstones are
    * CHAIN-SCOPED: a removal is live while its link is in the serving
    * chain and gone once a later full version (which absorbed it)
    * starts the chain — exactly the delta rules every other subframe
    * follows. */
  val TombsSubframe = "tombs"

  /** True iff any of `links` carries a committed tombs frame — an
    * fs-existence walk, no Spark job, so the no-removals common case
    * adds zero query-time cost to a probe. */
  def hasLiveTombs(spark: SparkSession, dir: String, links: Seq[Long]): Boolean = {
    val (fs, _) = fsPath(spark, dir)
    links.exists(w => fs.exists(new Path(s"$dir/v=$w/$TombsSubframe/_SUCCESS")))
  }

  /** The live tombstone ids across `links` (one `tomb_id` column;
    * duplicates possible when the same id was removed twice — harmless
    * to the anti-join consumers). Empty-but-schema'd when no link
    * carries removals, so callers compose without existence checks. */
  def readLiveTombs(spark: SparkSession, dir: String, links: Seq[Long]): DataFrame = {
    import org.apache.spark.sql.functions.col
    val (fs, _) = fsPath(spark, dir)
    val present = links.filter(w =>
      fs.exists(new Path(s"$dir/v=$w/$TombsSubframe/_SUCCESS")))
    if (present.isEmpty)
      spark.range(0).select(col("id").as("tomb_id"))
    else present.map(w =>
      cachedVersionFrame(spark, s"$dir/v=$w/$TombsSubframe"))
      .reduce(_ unionByName _).select("tomb_id")
  }

  /** Normalize a caller's removal frame to the persisted tombs schema:
    * one non-null, distinct `tomb_id: long` column. Fails by name on a
    * frame without the id column (select would throw opaquely). The
    * distinct is an O(tombstones) shuffle paid once at remove time so
    * every later probe's broadcast ships no duplicates. */
  def normalizeTombs(removeIds: DataFrame, idCol: String,
                     what: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    require(removeIds.columns.contains(idCol),
      s"$what: the removal frame has no column '$idCol' " +
        s"(has: ${removeIds.columns.mkString(", ")})")
    removeIds.select(col(idCol).cast("long").as("tomb_id"))
      .where(col("tomb_id").isNotNull).distinct()
  }

  private val ScratchRe = "\\.(?:tmp|debris)-v=(\\d+)-.*".r
  private val DebrisRe = "\\.debris-v=(\\d+)-.*".r

  /** Delete all committed versions strictly below `keepFrom`, plus any
    * uncommitted version directories below it (crash debris of
    * long-dead maintainers) and any scratch or aside directories
    * (`.tmp-v=N-<nonce>`, a maintainer hard-killed mid-write;
    * `.debris-v=N-<nonce>`, a maintainer hard-killed mid-[[clearDebris]])
    * whose target version sits below it — a scratch for a below-floor
    * version can never commit anything a reader is allowed to see, and
    * without this sweep a crashed compact's corpus-mass scratch would
    * leak forever. A scratch AT or ABOVE the floor is left alone: it
    * may belong to a live maintainer. REFUSES to prune the latest
    * committed version or anything above `keepFrom` — the protocol's
    * retention rule is the caller's job (retain ≥ max job runtime);
    * this method only enforces that the head always survives. Returns
    * the pruned version numbers. */
  def prune(spark: SparkSession, dir: String, keepFrom: Long,
            subframes: Seq[String], what: String): Seq[Long] = {
    val (fs, path) = fsPath(spark, dir)
    val latest = latestVersion(spark, dir, subframes).getOrElse(
      throw new IllegalArgumentException(
        s"$what at $dir has no committed version — nothing to prune from"))
    require(keepFrom <= latest,
      s"$what at $dir: prune keepFrom=v=$keepFrom is above the latest " +
        s"committed version v=$latest — refusing to prune the head")
    val doomed = versions(fs, path).filter(_ < keepFrom).sorted
    doomed.foreach(v => fs.delete(new Path(s"$dir/v=$v"), true))
    val leftAlone = scala.collection.mutable.ArrayBuffer.empty[String]
    fs.listStatus(path).toSeq.map(_.getPath.getName).foreach {
      case s @ ScratchRe(v) if v.toLong < keepFrom =>
        fs.delete(new Path(s"$dir/$s"), true)
      case s @ DebrisRe(_) => leftAlone += s
      case _ => ()
    }
    // at-or-above-floor ASIDE directories are reported, never deleted:
    // one is either a live clearDebris in flight (deleting it races the
    // restore path) or the displaced-fresh-commit leak the clearDebris
    // Scaladoc names — in that unwinnable interleaving the aside dir
    // sits AT the prune floor forever, and if the operator missed the
    // one-time commit-race error this recurring report is the only
    // thing keeping the leak visible instead of silently eating disk
    if (leftAlone.nonEmpty) System.err.println(
      s"[$what] prune at $dir: leaving ${leftAlone.size} at-or-above-floor " +
        s"debris-aside director${if (leftAlone.size == 1) "y" else "ies"} " +
        s"(${leftAlone.sorted.mkString(", ")}) — each is either a " +
        "maintainer's clearDebris in flight or a displaced commit from a " +
        "reported race; inspect and remove manually once confirmed dead")
    doomed
  }
}
