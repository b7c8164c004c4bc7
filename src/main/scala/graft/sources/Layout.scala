package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

import java.nio.charset.StandardCharsets

/** Physical-layout helpers: the write-side levers that remove shuffles
  * from the read side at 100 TB — plus ATOMIC VERSIONED PUBLICATION
  * for every index table the engine persists (round-14; VERDICT r13
  * task 1).
  *
  *  - `writeBucketed`: raw hash-bucketed table layout. Two tables
  *    bucketed by the same key into the same bucket count join with NO
  *    exchange on either side (Catalyst proves co-partitioning from
  *    the table spec) — the right layout for fact↔fact joins too big
  *    to broadcast.
  *  - `writePartitioned`: directory partitioning for coarse,
  *    low-cardinality predicates (year, technology) — partition
  *    pruning turns a 100 TB scan into just the referenced
  *    directories.
  *
  * == Versioned publication ==
  *
  * Through round 13, `replaceBucketed` was DROP TABLE + delete
  * directory + rewrite: a crash mid-rewrite lost the index outright,
  * and a concurrent probe mid-swap errored. Now every
  * `replaceBucketed` / `replaceTable` / `forgetKeys` /
  * `compactBucketed` writes a NEW physical table `<name>__v<N>` and
  * then advances a tiny manifest by an atomic file CREATE
  * (`_graft_manifest/manifest.m<G>` under the warehouse dir — rename
  * of a fully-written temp file, so readers see either generation G-1
  * or G, never a torn state). The previous version's table and files
  * survive until the NEXT publish garbage-collects them, which gives:
  *
  *  - crash safety: the manifest only ever points at a fully-written
  *    version; a crash before the manifest advance leaves the old
  *    index live and intact (the half-written `__v<N>` directory is
  *    swept by the next publish attempt);
  *  - concurrent readers: a probe that resolved version N keeps
  *    reading N's files while a writer publishes N+1 (one-version GC
  *    lag is the read lease — documented, and test-pinned in
  *    LayoutSpec);
  *  - cross-index snapshot consistency: ONE manifest file covers ALL
  *    published tables, so [[snapshot]] resolves an entire index
  *    family (cluster map + docstore + HLL + histogram for the
  *    corpus-health dashboard) at a single generation — a dashboard
  *    can no longer observe cluster-map v2 beside HLL v1 mid-refresh.
  *
  * Raw `spark.table(name)` keeps working: each publish re-points a
  * catalog VIEW `name` at the current `name__v<N>` (view expansion is
  * a no-op Project, so bucketed co-partitioning survives — the
  * LayoutSpec exchange assertions run through it). [[table]] bypasses
  * the view and resolves straight to the physical table via the
  * manifest, re-registering it (external, bucket spec from the
  * manifest) when the session's in-memory catalog has never seen it.
  *
  * Publishes within one JVM serialize on a lock; this is a
  * single-writer design per warehouse (multiple concurrent writer
  * JVMs would need a lock service or a transactional table format —
  * out of scope for plain parquet, and documented as such).
  */
object Layout {

  // ---------------------------------------------------------------
  // Raw (unversioned) primitives
  // ---------------------------------------------------------------

  def writeBucketed(
      df: DataFrame, table: String, bucketCol: String, buckets: Int = 32,
      sortCol: Option[String] = None): Unit = {
    val w = df.write.mode("overwrite").bucketBy(buckets, bucketCol)
    sortCol.fold(w)(w.sortBy(_)).format("parquet").saveAsTable(table)
  }

  def writePartitioned(
      df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  /** Drop a catalog entry AND any orphaned warehouse directory a
    * previous (crashed or separate-catalog) run left behind —
    * `saveAsTable` refuses to create a managed table over an existing
    * location, and `DROP TABLE IF EXISTS` cannot see a directory the
    * current in-memory catalog never registered.
    */
  private def dropWithLocation(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = tableLocation(spark, table)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
  }

  private def tableLocation(spark: SparkSession, table: String): Path =
    new Path(spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)

  // ---------------------------------------------------------------
  // Manifest (one generation file per publish, atomic create)
  // ---------------------------------------------------------------

  /** One published table's pinned physical state. `kind` is
    * "bucketed" or "plain"; bucket fields are meaningless for plain.
    */
  final case class Entry(
      name: String, version: Long, kind: String,
      bucketCol: String, buckets: Int, sortCol: Option[String]) {
    def physical: String = s"${name}__v$version"
  }

  /** An immutable view of the whole published-index catalog at one
    * manifest generation — resolve several index tables against ONE
    * snapshot and they are guaranteed mutually consistent (no
    * mid-refresh mix of versions across an index family).
    */
  final class Snapshot private[Layout] (
      spark: SparkSession, val generation: Long,
      val entries: Map[String, Entry]) {
    def table(name: String): DataFrame = entries.get(name) match {
      case Some(e) => resolvePhysical(spark, e)
      case None    => spark.table(name) // unversioned/legacy table
    }
  }

  private val publishLock = new Object
  private val ManifestFile = """manifest\.m(\d+)""".r

  private def manifestDir(spark: SparkSession): Path =
    new Path(spark.conf.get("spark.sql.warehouse.dir"), "_graft_manifest")

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def parseManifest(fs: FileSystem, p: Path): Map[String, Entry] = {
    val in = fs.open(p)
    val bytes =
      try {
        val buf = new java.io.ByteArrayOutputStream()
        val tmp = new Array[Byte](8192)
        Iterator.continually(in.read(tmp)).takeWhile(_ >= 0)
          .foreach(n => buf.write(tmp, 0, n))
        buf.toByteArray
      } finally in.close()
    new String(bytes, StandardCharsets.UTF_8).split('\n')
      .filter(_.nonEmpty).map { line =>
        val f = line.split('\t')
        f(0) -> Entry(f(0), f(1).toLong, f(2), f(3), f(4).toInt,
          if (f(5) == "-") None else Some(f(5)))
      }.toMap
  }

  /** Per-warehouse manifest cache: every resolution (`table`,
    * `refresh`, appends — several per micro-batch) would otherwise
    * pay a directory listing + file read that only changes on
    * publish. Valid under the documented single-writer-per-warehouse
    * model: publishes/drops in this JVM update the cache after their
    * manifest write; a concurrent writer JVM would need a lock
    * service anyway (object-store note in the object doc).
    */
  private val manifestCache =
    scala.collection.concurrent.TrieMap[String, (Long, Map[String, Entry])]()

  private def warehouseKey(spark: SparkSession): String =
    spark.conf.get("spark.sql.warehouse.dir")

  /** Latest readable generation (id, entries); (0, empty) when no
    * manifest exists yet. A torn newest file cannot occur (files are
    * temp-written then renamed into place), but tolerate a
    * PARSE-shaped failure anyway by falling back to the next-newest
    * parseable generation. IO errors (a flaky filesystem) PROPAGATE —
    * silently serving a stale generation would misroute appends into
    * a directory the next GC deletes.
    */
  private def latestManifest(spark: SparkSession)
      : (Long, Map[String, Entry]) =
    manifestCache.getOrElseUpdate(warehouseKey(spark), {
      val dir = manifestDir(spark)
      val fs = fsOf(spark, dir)
      if (!fs.exists(dir)) (0L, Map.empty)
      else {
        val gens = fs.listStatus(dir).map(_.getPath).flatMap { p =>
          p.getName match {
            case ManifestFile(g) => Some(g.toLong -> p)
            case _               => None
          }
        }.sortBy(-_._1)
        gens.collectFirst(scala.Function.unlift { case (g, p) =>
          try Some((g, parseManifest(fs, p)))
          catch {
            // torn/truncated content only — IO errors propagate
            case _: NumberFormatException |
                _: ArrayIndexOutOfBoundsException |
                _: NoSuchElementException => None
          }
        }).getOrElse((0L, Map.empty))
      }
    })

  private def writeManifest(
      spark: SparkSession, gen: Long, entries: Map[String, Entry]): Unit = {
    val dir = manifestDir(spark)
    val fs = fsOf(spark, dir)
    if (!fs.exists(dir)) fs.mkdirs(dir)
    val body = entries.values.toSeq.sortBy(_.name).map { e =>
      s"${e.name}\t${e.version}\t${e.kind}\t${e.bucketCol}\t${e.buckets}\t${e.sortCol.getOrElse("-")}"
    }.mkString("", "\n", "\n")
    val tmp = new Path(dir, s"_tmp.${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, true)
    try out.write(body.getBytes(StandardCharsets.UTF_8)) finally out.close()
    val target = new Path(dir, s"manifest.m$gen")
    if (!fs.rename(tmp, target)) {
      fs.delete(tmp, false)
      throw new IllegalStateException(
        s"manifest generation $gen already exists (concurrent writer?)")
    }
    // keep a short history of generations; readers only need the max
    fs.listStatus(dir).map(_.getPath).foreach { p =>
      p.getName match {
        case ManifestFile(g) if g.toLong < gen - 8 => fs.delete(p, false)
        case _                                     => ()
      }
    }
    manifestCache.update(warehouseKey(spark), (gen, entries))
  }

  // ---------------------------------------------------------------
  // Publication
  // ---------------------------------------------------------------

  /** Core publish: write `df` as `<name>__v<next>`, advance the
    * manifest atomically, re-point the compat view, GC versions older
    * than the previous one. The OLD version stays fully readable
    * until the publish AFTER this one.
    */
  private def publish(
      spark: SparkSession, df: DataFrame, name: String, kind: String,
      bucketCol: String, buckets: Int, sortCol: Option[String]): Unit =
    publishLock.synchronized {
      val (gen, entries) = latestManifest(spark)
      val next = entries.get(name).map(_.version + 1).getOrElse(1L)
      val e = Entry(name, next, kind, bucketCol, buckets, sortCol)
      // sweep any half-written leftover of a crashed publish attempt
      dropWithLocation(spark, e.physical)
      // EXTERNAL (explicit-path) table: the catalog entry is
      // disposable — a fresh session re-registers it from the
      // manifest ([[resolvePhysical]]) and a DROP TABLE can never
      // destroy published data; only [[gcVersions]] deletes files.
      val loc = tableLocation(spark, e.physical).toString
      if (kind == "bucketed") {
        val w = df.write.mode("overwrite").option("path", loc)
          .bucketBy(buckets, bucketCol)
        sortCol.fold(w)(w.sortBy(_)).format("parquet")
          .saveAsTable(e.physical)
      } else df.write.mode("overwrite").option("path", loc)
        .format("parquet").saveAsTable(e.physical)
      // ---- commit point: atomic manifest-generation create ----
      writeManifest(spark, gen + 1, entries + (name -> e))
      // legacy migration: an unversioned TABLE by this name blocks the
      // compat view — retire it (its data was already re-written above
      // when the publish source read from it, e.g. compact/forget).
      if (spark.catalog.tableExists(name) &&
          spark.catalog.getTable(name).tableType != "VIEW")
        dropWithLocation(spark, name)
      spark.sql(
        s"CREATE OR REPLACE VIEW `$name` AS SELECT * FROM `${e.physical}`")
      // GC: anything older than the immediately-previous version
      gcVersions(spark, name, keepFrom = next - 1)
    }

  /** Drop physical versions `< keepFrom` — catalog entries and any
    * orphaned directories (a crashed earlier session may have left
    * dirs the current catalog never registered).
    */
  private def gcVersions(
      spark: SparkSession, name: String, keepFrom: Long): Unit = {
    val wh = new Path(spark.conf.get("spark.sql.warehouse.dir"))
    val fs = fsOf(spark, wh)
    val pat = s"""${name.toLowerCase}__v(\\d+)""".r
    if (fs.exists(wh)) fs.listStatus(wh).map(_.getPath).foreach { p =>
      p.getName match {
        case pat(v) if v.toLong < keepFrom =>
          spark.sql(s"DROP TABLE IF EXISTS `${name}__v${v.toLong}`")
          fs.delete(p, true)
        case _ => ()
      }
    }
  }

  /** Publish a bucketed index table atomically (versioned — see the
    * object doc). Replaces the drop-then-rewrite of rounds ≤13.
    */
  def replaceBucketed(
      spark: SparkSession, df: DataFrame, table: String, bucketCol: String,
      buckets: Int = 32, sortCol: Option[String] = None): Unit =
    publish(spark, df, table, "bucketed", bucketCol, buckets, sortCol)

  /** Publish a plain (unbucketed) table atomically — same versioned
    * manifest protocol as [[replaceBucketed]].
    */
  def replaceTable(spark: SparkSession, df: DataFrame, table: String): Unit =
    publish(spark, df, table, "plain", "-", 0, None)

  // ---------------------------------------------------------------
  // Resolution
  // ---------------------------------------------------------------

  /** Register `e.physical` in this session's catalog when absent —
    * the cross-session path, where the warehouse directory outlives
    * the in-memory catalog. External datasource table with the bucket
    * spec from the manifest, so probes keep their exchange-free plans.
    */
  private def resolvePhysical(spark: SparkSession, e: Entry): DataFrame = {
    if (!spark.catalog.tableExists(e.physical)) publishLock.synchronized {
      if (!spark.catalog.tableExists(e.physical)) {
        val loc = tableLocation(spark, e.physical)
        val schema = spark.read.parquet(loc.toString).schema.toDDL
        val bucketSpec =
          if (e.kind == "bucketed")
            e.sortCol.fold(
              s"CLUSTERED BY (`${e.bucketCol}`) INTO ${e.buckets} BUCKETS")(s =>
              s"CLUSTERED BY (`${e.bucketCol}`) SORTED BY (`$s`) INTO ${e.buckets} BUCKETS")
          else ""
        spark.sql(
          s"CREATE TABLE `${e.physical}` ($schema) USING PARQUET " +
            s"$bucketSpec LOCATION '${loc.toString}'")
      }
    }
    spark.table(e.physical)
  }

  /** Read the CURRENT version of a published table (manifest-resolved,
    * straight to the physical table — no view in the plan). Falls back
    * to `spark.table(name)` for unversioned tables.
    */
  def table(spark: SparkSession, name: String): DataFrame =
    latestManifest(spark)._2.get(name) match {
      case Some(e) => resolvePhysical(spark, e)
      case None    => spark.table(name)
    }

  /** Pin ONE manifest generation and resolve any number of index
    * tables against it — the read path for consumers that must see a
    * mutually-consistent index family (the corpus-health dashboard
    * reads the cluster map, docstore, HLL registers and histogram
    * partials from a single snapshot).
    */
  def snapshot(spark: SparkSession): Snapshot = {
    val (gen, entries) = latestManifest(spark)
    new Snapshot(spark, gen, entries)
  }

  /** Invalidate the session's cached file listing for the CURRENT
    * physical version of `name` (after an append from another session
    * clone — relation caches do not see appends made elsewhere), and
    * SWEEP uncommitted batch partials first: a `b<id>-*` file with no
    * marker is a crashed half-committed move, and a reader that folds
    * it into a rewrite (compact/forget) or into a replay's own source
    * reads would double its rows or lose relabel deltas (r14 review
    * findings 1-2). Every foreachBatch maintainer calls this at batch
    * start, so the crashed attempt's files are gone before ANY read
    * of the batch's replay.
    */
  def refresh(spark: SparkSession, name: String): Unit = {
    sweepUncommitted(spark, name)
    val target = latestManifest(spark)._2.get(name)
      .map(_.physical).getOrElse(name)
    if (spark.catalog.tableExists(target))
      spark.catalog.refreshTable(target)
  }

  private def markerDir(spark: SparkSession, table: String): Path =
    new Path(new Path(
      new Path(spark.conf.get("spark.sql.warehouse.dir")),
      "_graft_batches"), table.toLowerCase)

  private val BatchFile = """b(\d+)-.*""".r

  /** Delete live-directory files of batches that never committed
    * (batch-prefixed files with no marker). Safe and REQUIRED under
    * the single-writer-per-table model: a marker-less batch file is
    * always a crashed attempt whose batch the stream WILL replay —
    * its rows must not leak into rewrites or into the replay's own
    * source reads. Called by [[refresh]], by [[compactBucketed]] /
    * [[forgetKeys]] before their rewrite reads, and by the move
    * protocol itself before re-staging.
    */
  def sweepUncommitted(spark: SparkSession, table: String): Unit = {
    val target = latestManifest(spark)._2.get(table)
      .map(_.physical).getOrElse(table)
    val liveDir = tableLocation(spark, target)
    val fs = fsOf(spark, liveDir)
    if (!fs.exists(liveDir)) return
    val mdir = markerDir(spark, table)
    val committed: Set[String] =
      if (fs.exists(mdir)) fs.listStatus(mdir).map(_.getPath.getName).toSet
      else Set.empty
    var swept = false
    fs.listStatus(liveDir).map(_.getPath).foreach { p =>
      p.getName match {
        case BatchFile(id) if !committed(s"b$id") =>
          fs.delete(p, false); swept = true
        case _ => ()
      }
    }
    if (swept && spark.catalog.tableExists(target))
      spark.catalog.refreshTable(target)
  }

  /** Prune batch markers STRICTLY below `belowBatch` — the unbounded-
    * growth valve (one marker file per (table, batch) otherwise lives
    * forever). Only the operator knows the safe floor: a marker below
    * the stream checkpoint's committed offset can never be consulted
    * again (the source cannot re-deliver that batch id), while
    * pruning one the checkpoint could still replay would turn the
    * replay into a duplicate append. Returns the number pruned.
    */
  def pruneBatchMarkers(
      spark: SparkSession, table: String, belowBatch: Long): Int = {
    val mdir = markerDir(spark, table)
    val fs = fsOf(spark, mdir)
    if (!fs.exists(mdir)) return 0
    val Marker = """b(\d+)""".r
    fs.listStatus(mdir).map(_.getPath).count { p =>
      p.getName match {
        case Marker(id) if id.toLong < belowBatch => fs.delete(p, false)
        case _                                    => false
      }
    }
  }

  /** Remove a published table completely: compat view, every physical
    * version (catalog + files), any legacy unversioned table, and its
    * manifest entry (a new generation without it). Test-cleanup and
    * retirement path.
    */
  def drop(spark: SparkSession, name: String): Unit =
    publishLock.synchronized {
      if (spark.catalog.tableExists(name) &&
          spark.catalog.getTable(name).tableType == "VIEW")
        spark.sql(s"DROP VIEW IF EXISTS `$name`")
      val (gen, entries) = latestManifest(spark)
      if (entries.contains(name))
        writeManifest(spark, gen + 1, entries - name)
      gcVersions(spark, name, keepFrom = Long.MaxValue)
      if (spark.catalog.tableExists(name)) dropWithLocation(spark, name)
      else {
        val loc = tableLocation(spark, name)
        val fs = fsOf(spark, loc)
        if (fs.exists(loc)) fs.delete(loc, true)
      }
      // batch markers die with the table — a future table reusing the
      // name must not inherit this one's committed-batch set
      val markers = new Path(new Path(
        new Path(spark.conf.get("spark.sql.warehouse.dir")),
        "_graft_batches"), name.toLowerCase)
      val mfs = fsOf(spark, markers)
      if (mfs.exists(markers)) mfs.delete(markers, true)
    }

  // ---------------------------------------------------------------
  // Mutation of the current version (streaming ingest + GDPR/heal)
  // ---------------------------------------------------------------

  /** Append into the CURRENT version of an existing bucketed table
    * with the same bucket spec — the ingest half of a persisted
    * index: each batch's rows land in the matching buckets, so probes
    * keep joining with no index-side exchange as the index grows.
    * Appends mutate the live version in place (they are the
    * at-least-once streaming path — see EventStream's contract);
    * version advancement is for REWRITES.
    */
  def appendBucketed(
      df: DataFrame, table: String, bucketCol: String,
      buckets: Int = 32): Unit = {
    val spark = df.sparkSession
    val target = latestManifest(spark)._2.get(table) match {
      case Some(e) => resolvePhysical(spark, e); e.physical
      case None    => table
    }
    df.write.mode("append").bucketBy(buckets, bucketCol)
      .format("parquet").saveAsTable(target)
  }

  /** Plain append into the CURRENT version (or an unversioned table,
    * creating it when absent) — the non-bucketed sibling of
    * [[appendBucketed]] for streaming sinks.
    */
  def appendTable(df: DataFrame, table: String): Unit = {
    val spark = df.sparkSession
    val target = latestManifest(spark)._2.get(table) match {
      case Some(e) => resolvePhysical(spark, e); e.physical
      case None    => table
    }
    df.write.mode("append").format("parquet").saveAsTable(target)
  }

  // ---------------------------------------------------------------
  // Idempotent (exactly-once) batch appends for foreachBatch sinks
  // ---------------------------------------------------------------

  /** Has batch `batchId` already committed into `table`? Markers are
    * per-(logical table, batch): an empty file
    * `_graft_batches/<table>/b<batchId>` under the warehouse dir,
    * created ONLY after every file of the batch is in place — so a
    * replayed batch whose marker exists is skipped whole, and one
    * whose marker is absent is re-staged from scratch (its partial
    * files are swept first). Markers outlive version rewrites
    * (compaction / forgetKeys carry the data forward), so a stream
    * restart from an old checkpoint cannot re-introduce a COMMITTED
    * batch's rows after a forget pass removed some of them. The one
    * honest caveat: an UNCOMMITTED batch (crashed before its marker)
    * is replayed from the source, and if a forget ran between the
    * crash and the replay, the replayed input may re-deliver rows for
    * forgotten keys — plain parquet cannot close that window; either
    * quiesce the stream before forgetting or re-run the forget after
    * recovery (the RTBF audit, q365/q375, certifies the end state
    * either way).
    */
  def batchCommitted(spark: SparkSession, table: String,
      batchId: Long): Boolean = {
    val m = new Path(markerDir(spark, table), s"b$batchId")
    fsOf(spark, m).exists(m)
  }

  private def writeBatchMarker(spark: SparkSession, table: String,
      batchId: Long): Unit = {
    val dir = markerDir(spark, table)
    val fs = fsOf(spark, dir)
    if (!fs.exists(dir)) fs.mkdirs(dir)
    fs.create(new Path(dir, s"b$batchId"), true).close()
  }

  // bucket suffix as written by Spark: ..._00003.c000.snappy.parquet
  private val BucketToken = """.*_(\d+)(?:\.\w+)*\.parquet""".r

  /** EXACTLY-ONCE append of one micro-batch into a (possibly
    * versioned) bucketed index table — the round-14 replacement for
    * the at-least-once `appendBucketed` + offline-compaction heal in
    * the streaming maintainers (VERDICT r13 task 2). Protocol:
    *
    *  1. marker `b<batchId>` present → the batch fully committed on a
    *     previous attempt; do nothing (replay is a no-op);
    *  2. stage the batch as its own bucketed table
    *     `<physical>__stage` (same bucket spec, so Spark stamps each
    *     staged file with its bucket id);
    *  3. sweep `b<batchId>-*` files from the live directory (partial
    *     leftovers of a crashed attempt of THIS batch);
    *  4. move the staged files into the live directory under
    *     batch-prefixed names that keep the bucket token
    *     (`b<batchId>-<i>_<bucket>.parquet` — the bucket-id regex
    *     Spark uses at scan time parses the trailing token, so probes
    *     keep their exchange-free bucketed plans);
    *  5. create the marker (atomic file create = the commit point),
    *     drop the staging table, refresh the live relation.
    *
    * A crash anywhere before (5) leaves no marker; the replay sweeps
    * and re-moves, converging on exactly the same file set. Probes
    * therefore never need a `distinct` and compaction is no longer
    * correctness-relevant (it remains available for file-count
    * hygiene). Concurrent streams must append to DISJOINT tables (the
    * marker namespace is per-table), which is how the EventStream
    * maintainers are laid out.
    */
  def idempotentAppendBucketed(
      df: DataFrame, table: String, bucketCol: String,
      buckets: Int = 32, batchId: Long): Unit =
    idempotentMove(df, table, batchId, (d, name) =>
      d.write.mode("overwrite").bucketBy(buckets, bucketCol)
        .format("parquet").saveAsTable(name))

  /** Plain (unbucketed) sibling of [[idempotentAppendBucketed]] for
    * result sinks (pair ledgers, alert streams): same marker + sweep
    * + deterministic-rename protocol, minus the bucket token.
    */
  def idempotentAppendTable(
      df: DataFrame, table: String, batchId: Long): Unit =
    idempotentMove(df, table, batchId, (d, name) =>
      d.write.mode("overwrite").format("parquet").saveAsTable(name))

  private def idempotentMove(df: DataFrame, table: String, batchId: Long,
      writeAs: (DataFrame, String) => Unit): Unit = {
    val spark = df.sparkSession
    if (batchCommitted(spark, table, batchId)) return
    // live physical target: current version, or the legacy table, or
    // (first batch of a fresh sink) a new empty table with the same
    // layout the stage write uses. Brief lock: catalog + manifest.
    val target = publishLock.synchronized {
      latestManifest(spark)._2.get(table) match {
        case Some(e) => resolvePhysical(spark, e); e.physical
        case None =>
          if (!spark.catalog.tableExists(table))
            writeAs(df.limit(0), table)
          table
      }
    }
    val liveDir = tableLocation(spark, target)
    val fs = fsOf(spark, liveDir)
    // Sweep THIS batch's crashed partials BEFORE the stage write: the
    // staged computation may read the live table (the cluster-merge
    // delta does), and observing its own uncommitted rows would
    // shrink the delta the sweep then deletes — permanent relabel
    // loss (r14 review finding 1). Refresh drops the cached listing.
    if (fs.exists(liveDir)) {
      val partial = fs.listStatus(liveDir).map(_.getPath)
        .filter(_.getName.startsWith(s"b$batchId-"))
      if (partial.nonEmpty) {
        partial.foreach(fs.delete(_, false))
        spark.catalog.refreshTable(target)
      }
    }
    // Heavy Spark job OUTSIDE the lock: stage tables are per-target
    // and each table has a single writer, so disjoint sinks overlap.
    val stage = s"${target}__stage"
    dropWithLocation(spark, stage)
    writeAs(df, stage)
    publishLock.synchronized {
      if (batchCommitted(spark, table, batchId))
        dropWithLocation(spark, stage) // lost a race we cannot be in
      else {
        val stageDir = tableLocation(spark, stage)
        val staged = fs.listStatus(stageDir).map(_.getPath)
          .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
        staged.zipWithIndex.foreach { case (p, i) =>
          val suffix = p.getName match {
            case BucketToken(b) => s"_$b"
            case _              => ""
          }
          val dst = new Path(liveDir, s"b$batchId-$i$suffix.parquet")
          if (fs.exists(dst)) fs.delete(dst, false)
          // an ignored false here would let the marker commit a batch
          // whose rows were then deleted with the stage (finding 3)
          if (!fs.rename(p, dst)) throw new IllegalStateException(
            s"rename $p -> $dst failed; batch $batchId NOT committed")
        }
        // ---- commit point ----
        writeBatchMarker(spark, table, batchId)
        dropWithLocation(spark, stage)
        spark.catalog.refreshTable(target)
      }
    }
  }

  /** Replay compaction for an append-only bucketed index: PUBLISH the
    * DISTINCT row set as the next version (the operational answer to
    * foreachBatch's at-least-once appends). Under the versioned
    * protocol this needs no driver-side materialization barrier: the
    * distinct reads version N's files while writing version N+1's —
    * different directories — and a crash anywhere leaves version N
    * live via the old manifest.
    */
  def compactBucketed(
      spark: SparkSession, table: String, bucketCol: String,
      buckets: Int = 32): Unit = {
    // never fold a crashed batch's uncommitted partials into the new
    // version — the replay would then append them AGAIN (finding 2)
    sweepUncommitted(spark, table)
    replaceBucketed(spark, this.table(spark, table).distinct(), table,
      bucketCol, buckets)
  }

  /** Targeted deletion from a bucketed table — the right-to-be-
    * forgotten pass over the persisted index family (MinHash
    * bands/toks, IVF codes, BM25 postings): publish the table MINUS
    * the rows whose `keyCol` is in `keys` as the next version. Plain
    * parquet cannot delete in place, so this is the honest
    * full-rewrite form (a transactional format would make it a
    * metadata operation); the versioned publish makes it atomic — the
    * pre-forget index stays live until the new version's manifest
    * commit, and a crash mid-rewrite cannot lose it.
    */
  def forgetKeys(
      spark: SparkSession, table: String, bucketCol: String,
      keyCol: String, keys: DataFrame, buckets: Int = 32): Unit = {
    sweepUncommitted(spark, table) // same rationale as compactBucketed
    val kept = this.table(spark, table)
      .join(keys.select(keys.columns.head).toDF(keyCol),
        Seq(keyCol), "left_anti")
    replaceBucketed(spark, kept, table, bucketCol, buckets)
  }
}
