package graft.sources

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}
import scala.jdk.CollectionConverters._

/** Mutable-table DML over parquet — INSERT / DELETE / UPDATE / MERGE
  * (reference `src/execution/operator/persistent/physical_insert.cpp`,
  * `physical_delete.cpp`, `physical_update.cpp`), re-expressed for Spark as
  * a minimal MANIFEST-BASED COPY-ON-WRITE table: the lakehouse pattern
  * (immutable data files + a versioned file manifest + an atomic current
  * pointer) rather than the reference's MVCC row versioning, which has no
  * Spark analog (Spark executors cannot share a transaction-local
  * undo/redo state; files are the unit of atomicity a distributed FS
  * actually gives you).
  *
  * Layout under a table root:
  * {{{
  *   data/<uuid>/part-*.parquet     immutable data files (never modified)
  *   _manifests/v<N>.manifest      one data-file path per line, relative
  *   _schema.json                  StructType of the table (create-time)
  *   _current                      the committed version number N
  * }}}
  *
  * Scale posture (the part that must survive 100 TB):
  *  - INSERT appends new files and a new manifest — zero data rewritten.
  *  - DELETE/UPDATE/MERGE rewrite ONLY the files that contain affected
  *    rows: one predicate scan (with parquet filter pushdown / row-group
  *    pruning doing the skipping) collects the distinct `input_file_name`s
  *    — an O(#files) driver-side statistics envelope, the same thing every
  *    production table format keeps in its transaction log — then only
  *    those files are read back and rewritten. A point DELETE on a 100 TB
  *    table touches the handful of files whose row groups can match.
  *  - Old versions stay readable (time travel / snapshot isolation for
  *    concurrent readers): `read(spark, root, Some(v))`.
  *
  * Single-writer contract: commits are last-writer-wins on the `_current`
  * pointer (atomic file move). Multi-writer coordination (optimistic
  * retry on a shared log) is a table-format concern out of scope here,
  * exactly as MVCC is in SURVEY §2.1.
  */
object GraftTable {

  private def abs(root: String, rel: String) = s"$root/$rel"

  private def writePointer(root: String, v: Int): Unit = {
    val tmp = Paths.get(s"$root/_current.tmp")
    Files.writeString(tmp, v.toString)
    Files.move(tmp, Paths.get(s"$root/_current"),
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
  }

  def currentVersion(root: String): Int =
    Files.readString(Paths.get(s"$root/_current")).trim.toInt

  def schemaOf(root: String): StructType =
    DataType.fromJson(Files.readString(Paths.get(s"$root/_schema.json")))
      .asInstanceOf[StructType]

  private def manifestLines(root: String, v: Int): Seq[String] =
    Files.readAllLines(Paths.get(s"$root/_manifests/v$v.manifest"))
      .asScala.toSeq.filter(_.nonEmpty)

  private def manifest(root: String, v: Int): Seq[String] =
    manifestLines(root, v).filterNot(_.startsWith("#"))

  /** Commit a new version. `txn` stamps the manifest with a streaming
    * transaction marker (`# txn <name> <id>`) IN the same atomic file
    * move as the file list — so "batch applied" and "batch recorded" are
    * one write, the property idempotent micro-batch replay needs (the
    * same reason production table formats put txn app-ids in the commit
    * log itself, not a sidecar). */
  private def commit(root: String, files: Seq[String],
      txn: Option[(String, Long)] = None): Int = {
    val v = currentVersion(root) + 1
    val header = txn.map { case (n, id) => s"# txn $n $id" }.toSeq
    val tmp = Paths.get(s"$root/_manifests/v$v.manifest.tmp")
    Files.writeString(tmp, (header ++ files).mkString("\n"))
    Files.move(tmp, Paths.get(s"$root/_manifests/v$v.manifest"),
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
    writePointer(root, v)
    v
  }

  /** Latest committed batch id for a named streaming transaction, scanning
    * manifests newest-first (O(#versions) driver-side file reads — the
    * table's own transaction log, not data). */
  def lastTxn(root: String, name: String): Option[Long] = {
    val prefix = s"# txn $name "
    (currentVersion(root) to 1 by -1).iterator
      .flatMap(v => manifestLines(root, v).find(_.startsWith(prefix)))
      .map(_.stripPrefix(prefix).trim.toLong)
      .nextOption()
  }

  /** Write `df` as new immutable data files; returns their root-relative
    * paths. An empty frame may legitimately produce zero files — callers
    * handle empty manifests via the schema sidecar. */
  private def writeFiles(df: DataFrame, root: String): Seq[String] = {
    val rel = s"data/${java.util.UUID.randomUUID}"
    df.write.parquet(abs(root, rel))
    val stream = Files.list(Paths.get(abs(root, rel)))
    try stream.iterator().asScala
      .map(_.getFileName.toString)
      .filter(n => n.startsWith("part-") && n.endsWith(".parquet"))
      .map(n => s"$rel/$n").toSeq.sorted
    finally stream.close()
  }

  /** Scan-reported file URI → root-relative manifest path. The scan
    * reports CANONICAL absolute paths, so the root is canonicalized too
    * before stripping (a relative root, trailing slash, or symlinked tmp
    * dir would otherwise silently fail to strip and poison the manifest
    * with absolute paths); a path outside the root is a hard error. */
  private def relativize(root: String, fileUri: String): String = {
    val canonicalRoot = new java.io.File(root).getCanonicalPath.stripSuffix("/")
    val p = new java.io.File(new java.net.URI(fileUri).getPath).getCanonicalPath
    if (!p.startsWith(canonicalRoot + "/"))
      throw new IllegalStateException(
        s"scan file '$p' is not under table root '$canonicalRoot'")
    p.stripPrefix(canonicalRoot + "/")
  }

  /** Create the table from `df` (version 1). */
  def create(spark: SparkSession, root: String, df: DataFrame): Unit = {
    Files.createDirectories(Paths.get(s"$root/_manifests"))
    Files.writeString(Paths.get(s"$root/_schema.json"), df.schema.json)
    writePointer(root, 0)
    commit(root, writeFiles(df, root))
  }

  /** Read a snapshot (default: current). Old versions remain readable —
    * data files are immutable and manifests are never rewritten. */
  def read(spark: SparkSession, root: String,
      version: Option[Int] = None): DataFrame = {
    val files = manifest(root, version.getOrElse(currentVersion(root)))
    val schema = schemaOf(root)
    if (files.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).parquet(files.map(abs(root, _)): _*)
  }

  /** CDC between two versions — the `table_changes` face of the
    * copy-on-write design. Because data files are immutable, the delta
    * lives entirely in the manifest difference: files present in both
    * versions are NEVER read. Net row-level changes come from EXCEPT ALL
    * over the differing files only (multiset semantics: rows rewritten
    * byte-identically cancel; an UPDATE surfaces as delete(old) +
    * insert(new)). Output = table columns + `change_type`
    * ('insert' | 'delete'). On a 100 TB table a point update's CDC reads
    * the handful of rewritten files, nothing else. */
  def changes(spark: SparkSession, root: String, fromV: Int, toV: Int): DataFrame = {
    val before = manifest(root, fromV)
    val after = manifest(root, toV)
    val added = after.filterNot(before.toSet)
    val removed = before.filterNot(after.toSet)
    val schema = schemaOf(root)
    def readOrEmpty(files: Seq[String]): DataFrame =
      if (files.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else readFiles(spark, root, files)
    val ins = readOrEmpty(added).exceptAll(readOrEmpty(removed))
      .withColumn("change_type", lit("insert"))
    val del = readOrEmpty(removed).exceptAll(readOrEmpty(added))
      .withColumn("change_type", lit("delete"))
    ins.unionAll(del)
  }

  /** Align `rows` to the table schema by name (missing column = error,
    * extra columns dropped, types cast) — INSERT-by-name semantics. */
  private def aligned(rows: DataFrame, schema: StructType): DataFrame =
    rows.select(schema.fields.toIndexedSeq.map(f =>
      col(f.name).cast(f.dataType).as(f.name)): _*)

  /** INSERT: append-only — writes the new rows' files and a manifest that
    * is (old files ++ new files). No existing byte is rewritten. `txn`
    * marks the commit for idempotent streaming replay (see commit). */
  def insert(spark: SparkSession, root: String, rows: DataFrame,
      txn: Option[(String, Long)] = None): Unit = {
    val old = manifest(root, currentVersion(root))
    commit(root, old ++ writeFiles(aligned(rows, schemaOf(root)), root), txn)
  }

  /** Root-relative paths of current files containing ≥1 row matching
    * `pred` — ONE scan with the predicate pushed to parquet (row-group
    * pruning skips cold files); the collect is file NAMES, never rows. */
  private def affectedFiles(spark: SparkSession, root: String,
      pred: Column): Seq[String] = {
    val cur = read(spark, root)
    if (cur.isEmpty) return Nil
    cur.withColumn("__file", input_file_name())
      .filter(pred)
      .select(col("__file")).distinct().collect()
      .map(r => relativize(root, r.getString(0)))
      .toSeq.sorted
  }

  private def readFiles(spark: SparkSession, root: String,
      files: Seq[String]): DataFrame =
    spark.read.schema(schemaOf(root)).parquet(files.map(abs(root, _)): _*)

  /** DELETE WHERE pred: rows where the predicate is TRUE are removed
    * (NULL predicate keeps the row — SQL DELETE semantics). Only files
    * containing matches are rewritten. */
  def delete(spark: SparkSession, root: String, pred: Column): Unit = {
    val hit = affectedFiles(spark, root, pred)
    // no matches: still commit the (identical) manifest — every DML call
    // is one version, so time travel and changes() stay well-defined
    if (hit.isEmpty) { commit(root, manifest(root, currentVersion(root))); return }
    val keep = manifest(root, currentVersion(root)).filterNot(hit.toSet)
    val kept = readFiles(spark, root, hit)
      .filter(!coalesce(pred, lit(false)))
    commit(root, keep ++ writeFiles(kept, root))
  }

  /** UPDATE SET col = expr WHERE pred. `set` expressions see the pre-update
    * row (SQL UPDATE semantics — all assignments evaluated against the old
    * values). Only files containing matches are rewritten. */
  def update(spark: SparkSession, root: String, pred: Column,
      set: Map[String, Column]): Unit = {
    val schema = schemaOf(root)
    require(set.keySet.subsetOf(schema.fieldNames.toSet),
      s"unknown columns in SET: ${set.keySet -- schema.fieldNames}")
    val hit = affectedFiles(spark, root, pred)
    if (hit.isEmpty) { commit(root, manifest(root, currentVersion(root))); return }
    val keep = manifest(root, currentVersion(root)).filterNot(hit.toSet)
    val p = coalesce(pred, lit(false))
    val rewritten = readFiles(spark, root, hit).select(
      schema.fields.toIndexedSeq.map { f =>
        set.get(f.name) match {
          case Some(e) => when(p, e.cast(f.dataType)).otherwise(col(f.name)).as(f.name)
          case None => col(f.name)
        }
      }: _*)
    commit(root, keep ++ writeFiles(rewritten, root))
  }

  /** MERGE (upsert): rows of `source` replace target rows with the same
    * key (WHEN MATCHED THEN UPDATE SET *) and are appended otherwise
    * (WHEN NOT MATCHED THEN INSERT *). Source keys must be unique — the
    * standard MERGE cardinality contract; duplicate source keys would
    * multiply target rows. Only files containing matched keys are
    * rewritten; a pure-insert merge rewrites nothing. */
  def merge(spark: SparkSession, root: String, source: DataFrame,
      keys: Seq[String], txn: Option[(String, Long)] = None): Unit = {
    val schema = schemaOf(root)
    // The source is evaluated several times below (dup check, hit-file
    // semi-join, matched rewrite, insert anti-join) — cache it for the
    // duration of the merge so an expensive source query (or a streaming
    // micro-batch) runs once.
    val src = aligned(source, schema)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try mergeImpl(spark, root, schema, src, keys, txn)
    finally src.unpersist(blocking = false)
  }

  private def mergeImpl(spark: SparkSession, root: String,
      schema: StructType, src: DataFrame, keys: Seq[String],
      txn: Option[(String, Long)]): Unit = {
    // MERGE cardinality contract, enforced loudly: a duplicate source key
    // would silently multiply matched target rows through the left join
    // below. Aggregate aliased to a reserved name so a key column named
    // "count" cannot collide.
    val dup = src.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__graft_cnt"))
      .filter(col("__graft_cnt") > 1).limit(1).collect()
    if (dup.nonEmpty)
      throw new IllegalArgumentException(
        s"MERGE source has duplicate keys (e.g. ${dup.head.toSeq.init.mkString(",")}); " +
          "deduplicate per key first (e.g. dropDuplicates or a last-event-wins window)")
    // Key-membership is a join, not a Column predicate, so the hit set is
    // computed directly (same shape as affectedFiles: distinct file names
    // from one semi-join scan, an O(#files) envelope).
    val cur = read(spark, root)
    val hitFiles: Seq[String] =
      if (cur.isEmpty) Nil
      else cur.withColumn("__file", input_file_name())
        .join(src.select(keys.map(col): _*), keys, "left_semi")
        .select(col("__file")).distinct().collect()
        .map(r => relativize(root, r.getString(0))).toSeq.sorted
    val keep = manifest(root, currentVersion(root)).filterNot(hitFiles.toSet)
    val srcTagged = src
      .toDF(schema.fieldNames.toIndexedSeq.map(c =>
        if (keys.contains(c)) c else s"__src_$c"): _*)
      .withColumn("__matched", lit(true))
    val updated =
      if (hitFiles.isEmpty) None
      else Some(readFiles(spark, root, hitFiles)
        .join(srcTagged, keys, "left")
        .select(schema.fields.toIndexedSeq.map { f =>
          if (keys.contains(f.name)) col(f.name)
          else when(col("__matched"), col(s"__src_${f.name}"))
            .otherwise(col(f.name)).as(f.name)
        }: _*))
    // Keys absent from the hit files are absent from the table entirely
    // (that is what made the other files unaffected), so the anti-join for
    // inserts only needs the hit files' rows.
    val existingKeys =
      if (hitFiles.isEmpty) None else Some(readFiles(spark, root, hitFiles))
    val inserts = existingKeys match {
      case Some(t) => src.join(t.select(keys.map(col): _*), keys, "left_anti")
      case None => src
    }
    val newRows = updated.map(_.unionAll(inserts)).getOrElse(inserts)
    commit(root, keep ++ writeFiles(newRows, root), txn)
  }
}
