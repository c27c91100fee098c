package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/**
 * The engine facade: a tag-partitioned embedding store with top-k
 * similarity search — the full query surface of the reference engine
 * (insert: src/db.rs:142-164; search: src/db.rs:217-283; clear:
 * src/db.rs:608-625) re-expressed as Parquet + DataFrame operators.
 *
 * Storage layout (mirrors the reference's exact-tag-set partitioning,
 * src/db.rs:645-650, as a Hive-style partition column):
 *
 *   <root>/data/tag_key=<sha256(json(sorted tags))>/... .parquet
 *
 * Tag-superset partition pruning (reference src/db.rs:687-706) is done
 * driver-side: the distinct (tag_key -> tags) manifest is tiny (one row
 * per distinct tag-set); we resolve matching keys on the driver and
 * inject `tag_key IN (...)`, which Spark turns into static partition
 * pruning — non-matching partitions are never read. At high tag
 * cardinality (100 TB regime) exact-set partitioning explodes; the
 * row-level `forall tags` filter path below stays correct and relies on
 * Parquet row-group stats instead.
 */
class VectorStore(spark: SparkSession, root: String,
                  writerLockTimeoutMs: Long = 600000L) {
  GraftFunctions.register(spark)
  import GraftFunctions._

  private val dataPath = s"$root/data"
  private val fs = org.apache.hadoop.fs.FileSystem.get(
    new java.net.URI(root), spark.sparkContext.hadoopConfiguration)

  /** Normalize tags exactly like the reference (sorted, distinct set).
    * A null tags cell normalizes to the EMPTY set: left as null it
    * would produce a null tag_key (sha2 of null), land rows in the
    * default Hive partition, and poison every negated isin over
    * tag_key downstream with three-valued logic. */
  private def normTags(c: Column): Column =
    array_sort(array_distinct(coalesce(c, array().cast("array<string>"))))

  private def tagKey(c: Column): Column = sha2(to_json(normTags(c)), 256)

  // ---- writer serialization. The reference is single-writer by
  // construction (&mut self, src/db.rs:142); the manifest update and the
  // upsert partition swap here are read-modify-write sequences, so two
  // simultaneous writers could lose a tag set or race a swap (VERDICT r2
  // next-step #4). Writers therefore serialize on an advisory `_lock`
  // file under the store root. ----

  private val lockFile = new org.apache.hadoop.fs.Path(s"$root/_lock")

  /** Atomic create-if-absent. Local FS goes through O_CREAT|O_EXCL
    * (Hadoop's RawLocalFileSystem create is check-then-act — racy);
    * other filesystems use create(overwrite=false), atomic on HDFS.
    * Object stores without atomic create should front this with an
    * external lock service — documented, like every Hadoop committer.
    * Only exists-contention reads as "lock held": genuine I/O errors
    * (permissions, dead namenode) propagate instead of masquerading as
    * a busy writer for the whole timeout. A vanished root (concurrent
    * clear) is recreated and retried. */
  private def tryLock(): Boolean =
    if ("file" == Option(lockFile.toUri.getScheme).getOrElse(fs.getScheme))
      try new java.io.File(lockFile.toUri.getPath).createNewFile()
      catch {
        case _: java.io.IOException => // parent vanished mid-spin
          fs.mkdirs(new org.apache.hadoop.fs.Path(root)); false
      }
    else
      try { fs.create(lockFile, false).close(); true }
      catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
        case _: java.nio.file.FileAlreadyExistsException => false
      }

  /** Run `f` holding the store's writer lock: spin (100 ms) up to the
    * store's `writerLockTimeoutMs` (default 10 min — writer jobs at
    * scale run minutes; a short timeout would tempt operators into
    * deleting a LIVE lock, re-admitting the races it prevents), then
    * fail loudly with the lock's age so the operator can tell a slow
    * writer from crash wreckage. NOT re-entrant — internal callers use
    * the *Locked variants. */
  private def withWriterLock[T](timeoutMs: Long = writerLockTimeoutMs)(f: => T): T = {
    fs.mkdirs(new org.apache.hadoop.fs.Path(root))
    val deadline = System.currentTimeMillis() + timeoutMs
    while (!tryLock()) {
      if (System.currentTimeMillis() > deadline) {
        val ageS = try {
          (System.currentTimeMillis() - fs.getFileStatus(lockFile).getModificationTime) / 1000
        } catch { case _: java.io.IOException => -1L }
        throw new IllegalStateException(
          s"graft: writer lock $lockFile not acquired in ${timeoutMs} ms" +
            s" (lock age ${ageS} s). A writer may still be running — raise" +
            " writerLockTimeoutMs or wait; delete the lock file ONLY if" +
            " its owner is known dead (crashed writer), else concurrent" +
            " writes can lose tag sets. clear(force = true) resets a" +
            " wedged store.")
      }
      Thread.sleep(100)
    }
    try f finally fs.delete(lockFile, false)
  }

  /**
   * Append rows (id, vector, content, tags). Assigns UUIDs when `id`
   * is absent (reference assigns uuid-v4 at insert, src/db.rs:151).
   * Enforces a single embedding dimension per store (reference panics
   * on mismatch, src/db.rs:514-525) — checked against both the incoming
   * batch and the stored dimension, using cheap aggregates.
   * `quantize=true` stores the packed codec struct alongside (4x smaller
   * scan for quantized search at scale).
   */
  /** A leftover bak dir is a crashed writer's RECOVERY COPY — possibly
    * the only copy of parked data. ANY write over it (not just the same
    * operation retried) could bury or destroy it, so every write path
    * refuses until the operator restores or removes it. */
  private def requireNoPendingRecovery(): Unit = {
    val pending = Seq(s"$root/upsert_bak", s"$root/data_compact_bak")
      .map(new org.apache.hadoop.fs.Path(_)).filter(fs.exists)
    require(pending.isEmpty,
      s"graft: ${pending.mkString(", ")} exists — a previous writer crashed" +
        " mid-swap; restore its partitions into the data dir (or remove it" +
        " if already recovered) before writing")
  }

  def insert(df: DataFrame, quantize: Boolean = false): Unit =
    withWriterLock() { insertLocked(df, quantize) }

  /** Insert body — callers must hold the writer lock. */
  private def insertLocked(df: DataFrame, quantize: Boolean): Unit = {
    requireNoPendingRecovery()
    writeBatch(prepareBatch(df), quantize)
  }

  /** Validate + transform an incoming batch WITHOUT writing: id
    * assignment, dimension checks, projected-mode transform, tag
    * normalization/partition key. Split from [[writeBatch]] so upsert
    * can validate BEFORE its destructive partition swap — validating
    * inside the trailing insert (as round 3 first did) meant an invalid
    * batch aborted after the old row versions were already deleted. */
  private def prepareBatch(df: DataFrame): DataFrame = {
    val withId =
      if (df.columns.contains("id")) df
      else df.withColumn("id", expr("uuid()"))
    val dims = withId.select(size(col("vector")).as("d")).agg(
      min("d").as("mn"), max("d").as("mx")).head()
    require(dims.getInt(0) == dims.getInt(1),
      s"graft: mixed embedding dimensions in batch (${dims.getInt(0)} vs ${dims.getInt(1)})")
    // projected store: incoming raw vectors are projected through the
    // stored basis before writing (reference write-path transform,
    // src/db.rs:480-499)
    val transformed = if (isProjected) {
      val model = loadModel()
      require(dims.getInt(0) == model.d,
        s"graft: embedding dimension ${dims.getInt(0)} does not match projection input dim ${model.d}")
      withId.withColumn("vector",
        Pca.projector(spark, model, "graft_store_project")(col("vector")))
    } else {
      storedDim().foreach { d =>
        require(d == dims.getInt(0),
          s"graft: embedding dimension ${dims.getInt(0)} does not match store dimension $d")
      }
      withId
    }
    transformed
      .withColumn("tags", normTags(col("tags")))
      .withColumn("tag_key", tagKey(col("tags")))
  }

  /** Append a [[prepareBatch]]-validated frame and record its tag sets. */
  private def writeBatch(prepared: DataFrame, quantize: Boolean): Unit = {
    val out = if (quantize) prepared.withColumn("packed", pack(col("vector"))) else prepared
    out.write.mode(SaveMode.Append).partitionBy("tag_key").parquet(dataPath)
    updateManifest(out.select(col("tag_key"), col("tags")).distinct())
  }

  // ---- tag-set manifest: the reference's index.bin analogue
  // (src/db.rs:645-650). One row per DISTINCT tag set, maintained at
  // insert time, so tag-superset resolution reads a KB-scale file
  // instead of a distinct over the whole store (at 100 TB the full-store
  // distinct is itself a full column scan). ----

  private val manifestPath = s"$root/manifest.parquet"
  private val manifestDeltaPath = s"$root/manifest_delta"
  /** Fold deltas into the base once this many delta files accumulate —
    * bounds the manifest read to base + a handful of tiny files. */
  private val ManifestCompactThreshold = 16

  private def manifestExists: Boolean =
    fs.exists(new org.apache.hadoop.fs.Path(manifestPath))

  private def manifestDeltaExists: Boolean =
    fs.exists(new org.apache.hadoop.fs.Path(manifestDeltaPath))

  /** Explicit schema for delta reads: a crashed first append can leave
    * a delta dir with no committed part files, and schema INFERENCE
    * over it would fail every manifest read until manual cleanup; with
    * the schema pinned, such debris reads as zero rows. */
  private val manifestSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("tag_key",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("tags",
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType))))

  /** The (tag_key, tags, tags_csv) manifest = base file + appended
    * delta files (see [[updateManifest]]); falls back to partition
    * discovery + distinct for stores written before the manifest
    * existed. `tags_csv` = ",t1,t2," — a delimiter-wrapped rendering so
    * superset tests are string `contains` predicates, which Spark's
    * dynamic-partition-pruning planner recognizes as selective
    * (`array_contains` is not in its isLikelySelective list). */
  def manifest(): DataFrame = {
    val base =
      if (manifestExists) {
        val b = spark.read.parquet(manifestPath)
        if (manifestDeltaExists)
          b.union(spark.read.schema(manifestSchema).parquet(manifestDeltaPath))
            .distinct()
        else b
      } else table().select(col("tag_key"), col("tags")).distinct()
    base.withColumn("tags_csv",
      concat(lit(","), concat_ws(",", col("tags")), lit(",")))
  }

  /** Record a batch's distinct tag sets. The steady state APPENDS them
    * as a delta file — O(batch), where a full rewrite is O(all distinct
    * sets) per insert and becomes the insert bottleneck at millions of
    * tag sets (SURVEY §9's "incremental manifest compaction" item).
    * Deltas fold into the base opportunistically past
    * [[ManifestCompactThreshold]] files. The FIRST write (or a legacy
    * store) still seeds the full base via [[manifest]]'s
    * partition-discovery fallback — seeding from the batch alone would
    * permanently hide every older partition from tag search. */
  private def updateManifest(newSets: DataFrame): Unit = {
    if (!manifestExists) {
      writeManifest(manifest().select("tag_key", "tags").union(newSets).distinct())
    } else {
      newSets.coalesce(1).write.mode(SaveMode.Append).parquet(manifestDeltaPath)
      val nDelta = fs.listStatus(new org.apache.hadoop.fs.Path(manifestDeltaPath))
        .count(_.getPath.getName.endsWith(".parquet"))
      if (nDelta >= ManifestCompactThreshold) {
        // fold deltas into the base — reconciling DELTA-sourced keys
        // against the store first: a crash between an upsert's base
        // swap and its delta drop can leave stale delta rows for a
        // pruned tag set (benign for results — both pruning paths
        // degrade to empty scans — but they would otherwise fold into
        // the base forever). Existence comes from ONE dataPath listing
        // (the same cost any partition discovery pays), never a
        // per-key RPC; the delta dir is read once for both the probe
        // and the fold.
        val delta = spark.read.schema(manifestSchema).parquet(manifestDeltaPath)
        val deltaKeys = delta.select("tag_key").distinct()
          .collect().map(_.getString(0))
        val existing = fs.listStatus(new org.apache.hadoop.fs.Path(dataPath))
          .map(_.getPath.getName)
          .filter(_.startsWith("tag_key=")).map(_.stripPrefix("tag_key=")).toSet
        val dead = deltaKeys.filterNot(existing.contains)
        val folded = spark.read.parquet(manifestPath).union(delta).distinct()
        val reconciled =
          if (dead.isEmpty) folded
          else folded.where(!col("tag_key").isin(dead.toSeq: _*))
        writeManifest(reconciled)
      }
    }
  }

  /** Replace the FULL manifest state with `sets` (tag_key, tags):
    * written to a tmp dir first, then swapped in — the write
    * materializes (and with it any read of the old base + deltas)
    * before the old file is touched. Deltas are superseded by a
    * full-state write and dropped afterwards; a crash before the drop
    * only leaves redundant delta rows that the union+distinct absorbs
    * until the next fold. */
  private def writeManifest(sets: DataFrame): Unit = {
    val tmp = new org.apache.hadoop.fs.Path(s"$root/manifest_tmp.parquet")
    sets.coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    val dst = new org.apache.hadoop.fs.Path(manifestPath)
    fs.delete(dst, true)
    fs.rename(tmp, dst)
    fs.delete(new org.apache.hadoop.fs.Path(manifestDeltaPath), true)
  }

  /**
   * Last-write-wins upsert by id (reference content.bin upsert
   * semantics, SURVEY §2 #9). Partition-selective: only the tag_key
   * partitions that hold an overwritten id are rewritten (anti-join on
   * the incoming id set), everything else is untouched; the new rows
   * then append through the normal insert path. At 100 TB this touches
   * O(affected partitions), not the store.
   */
  def upsert(df: DataFrame, quantize: Boolean = false): Unit = withWriterLock() {
    if (!exists) insertLocked(df, quantize) else upsertLocked(df, quantize)
  }

  private def upsertLocked(df: DataFrame, quantize: Boolean): Unit = {
    requireNoPendingRecovery()
    // the store's layout wins over the flag: appending packed-less rows
    // to a quantized store would null the codec for the new rows, and
    // appending packed rows to an unquantized store would produce a
    // mixed-schema table where quantized search silently drops old rows
    val hasPacked = table().columns.contains("packed")
    require(!quantize || hasPacked,
      "graft: store is not quantized — rewrite it (insert with quantize=true into a fresh store) instead of quantize-upserting")
    val q = hasPacked
    // validate + transform the incoming batch BEFORE the destructive
    // swap: a dimension-mismatched batch must fail while the old row
    // versions still exist (validating in the trailing write, as this
    // round first did, lost them)
    val prepared = prepareBatch(df)
    val ids = df.select(col("id")).distinct()
    val affected = table().join(broadcast(ids), Seq("id"), "left_semi")
      .select("tag_key").distinct().collect().map(_.getString(0))
    if (affected.nonEmpty) {
      // rewrite affected partitions minus the overwritten ids, then swap
      // per partition with the old directory PARKED aside first (not
      // deleted): a failure mid-swap restores the parked original, so no
      // partition is ever lost — at worst a crashed writer leaves it in
      // upsert_bak for the documented manual recovery (ADVICE r2 #1;
      // single-writer, reader-visible swap gap of one rename, not
      // crash-atomic — a store-wide commit protocol is out of parity
      // scope with the single-writer reference).
      val kept = table()
        .where(col("tag_key").isin(affected.toSeq: _*))
        .join(broadcast(ids), Seq("id"), "left_anti")
      val tmp = new org.apache.hadoop.fs.Path(s"$root/upsert_tmp")
      val bakRoot = new org.apache.hadoop.fs.Path(s"$root/upsert_bak")
      kept.write.mode(SaveMode.Overwrite).partitionBy("tag_key").parquet(tmp.toString)
      fs.mkdirs(bakRoot)
      for (key <- affected) {
        val dst = new org.apache.hadoop.fs.Path(s"$dataPath/tag_key=$key")
        val bak = new org.apache.hadoop.fs.Path(s"$bakRoot/tag_key=$key")
        val src = new org.apache.hadoop.fs.Path(s"$tmp/tag_key=$key")
        require(fs.rename(dst, bak), s"graft: parking rename $dst -> $bak failed")
        try {
          // a partition can vanish entirely if every row in it was overwritten
          if (fs.exists(src)) require(fs.rename(src, dst),
            s"graft: rename $src -> $dst failed")
          fs.delete(bak, true)
        } catch {
          case e: Throwable =>
            // restore the parked original before failing
            if (!fs.exists(dst)) fs.rename(bak, dst)
            throw e
        }
      }
      fs.delete(tmp, true)
      fs.delete(bakRoot, true)
      // manifest must keep mirroring the store: entries whose partition
      // vanished (every row of that tag set overwritten) would otherwise
      // stay forever and tag search would probe nonexistent partitions
      // (ADVICE r2 #2)
      val vanished = affected.filterNot(key =>
        fs.exists(new org.apache.hadoop.fs.Path(s"$dataPath/tag_key=$key")))
      if (vanished.nonEmpty) {
        val pruned = manifest().select("tag_key", "tags")
          .where(!col("tag_key").isin(vanished.toSeq: _*))
        writeManifest(pruned)
      }
      // the ANN index (if any) still holds the OVERWRITTEN row versions;
      // serving them would break last-write-wins for searchAnn readers —
      // stale-by-missing-new-rows is the documented contract, resurrected
      // old content is not. Invalidate; the owner rebuilds explicitly.
      fs.delete(new org.apache.hadoop.fs.Path(annPath), true)
    }
    writeBatch(prepared, q)
  }

  /**
   * Continuous embedding ingestion: drain a streaming DataFrame of
   * (id?, vector, content, tags) rows into the store. `foreachBatch`
   * hands each micro-batch over as a plain DataFrame, so the entire
   * batch write path — dim check, tag normalization/partitioning,
   * quantization, manifest upkeep, writer lock — is reused verbatim.
   * Returns the query; with the default AvailableNow trigger,
   * awaitTermination() drains the backlog and stops; a production feed
   * uses Trigger.ProcessingTime (exercised in VectorStoreSpec).
   *
   * Offsets checkpoint under `<root>/_checkpoints/ingest` by default
   * (override per feed with `checkpointLocation` — one directory per
   * source), so a restarted stream resumes from committed offsets
   * instead of replaying the whole source into duplicate appends
   * (ADVICE r2 #3; insert is not idempotent by id). Delivery is
   * at-least-once at micro-batch granularity: a crash between the
   * insert and the offset commit re-runs that one batch on restart —
   * exactly-once would need an idempotent (upsert-by-id) sink.
   */
  def insertStream(stream: DataFrame, quantize: Boolean = false,
                   trigger: org.apache.spark.sql.streaming.Trigger =
                     org.apache.spark.sql.streaming.Trigger.AvailableNow(),
                   checkpointLocation: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .foreachBatch((batch: DataFrame, _: Long) => insert(batch, quantize))
      .option("checkpointLocation",
        checkpointLocation.getOrElse(s"$root/_checkpoints/ingest"))
      .trigger(trigger)
      .start()

  private def storedDim(): Option[Int] =
    if (!exists) None
    else try {
      table().select(size(col("vector"))).limit(1).collect()
        .headOption.map(_.getInt(0))
    } catch {
      // the data dir can exist yet hold no files (an upsert that
      // overwrote every row of every affected partition)
      case _: org.apache.spark.sql.AnalysisException => None
    }

  def exists: Boolean = fs.exists(new org.apache.hadoop.fs.Path(dataPath))

  def table(): DataFrame = spark.read.parquet(dataPath)

  /** Driver-side superset pruning: distinct tag-sets are few; resolve
    * the matching partition keys and let static partition pruning skip
    * everything else. Returns None when the query has no tags (all
    * partitions match — reference src/db.rs:697 empty-set is subset of
    * all). */
  private def matchingTagKeys(queryTags: Seq[String]): Option[Seq[String]] = {
    if (queryTags.isEmpty) return None
    val sets = manifest().collect()
    val q = queryTags.distinct.toSet
    Some(sets.toSeq
      .filter(r => q.subsetOf(r.getSeq[String](1).toSet))
      .map(_.getString(0)))
  }

  /**
   * Fully-automatic tag-superset pruning via Dynamic Partition Pruning
   * (SURVEY §4.1(c); answers VERDICT r1 missing #5 Spark-first, without
   * a custom DataSourceV2): instead of collecting the manifest to the
   * driver, left-semi-join the store against the matching slice of its
   * own (tiny, broadcast) manifest on the tag_key PARTITION column.
   * Spark's DPP turns the broadcast build side into a runtime partition
   * filter — the scan shows `PartitionFilters: [dynamicpruning#...]` and
   * non-matching partitions are never read. No driver round-trip, no
   * IN-list size limit; the planning-time manifest scan that
   * [[matchingTagKeys]] does on the driver happens inside the query.
   */
  def searchDpp(
      queryVec: Seq[Float],
      tags: Seq[String],
      k: Int = 10,
      metric: String = "cosine",
      quantized: Boolean = false): DataFrame = {
    require(tags.nonEmpty, "graft: searchDpp needs at least one tag (use search)")
    // delimiter-wrapped `contains` (not array_contains) so the DPP
    // planner sees a selective predicate — see manifest() scaladoc
    val supersetCond = tags.distinct
      .map(t => col("tags_csv").contains(s",$t,")).reduce(_ && _)
    val keys = manifest().where(supersetCond).select("tag_key")
    val pruned = table().join(broadcast(keys), Seq("tag_key"), "left_semi")
    scoreTopK(pruned, queryVec, k, metric, quantized)
  }

  /**
   * Top-k nearest neighbors (reference src/db.rs:217-283). The plan is
   *   PartitionPrunedScan -> Project[sim] -> TakeOrderedAndProject(k)
   * — Spark's TakeOrderedAndProject is a per-partition bounded heap +
   * driver merge, the distributed equivalent of the reference's
   * BinaryHeap loop (src/db.rs:257-272). No shuffle: only k rows per
   * partition travel to the driver.
   */
  def search(
      queryVec: Seq[Float],
      tags: Seq[String] = Nil,
      k: Int = 10,
      metric: String = "cosine",
      quantized: Boolean = false): DataFrame = {
    val base = table()
    val pruned = matchingTagKeys(tags) match {
      case Some(keys) => base.where(col("tag_key").isin(keys: _*))
      case None => base
    }
    // Row-level guard as well: correct even if the store was written
    // without partitioning (or with quantize-only layout).
    val tagFiltered =
      if (tags.isEmpty) pruned
      else pruned.where(tags.distinct.map(t => array_contains(col("tags"), t)).reduce(_ && _))
    scoreTopK(tagFiltered, queryVec, k, metric, quantized)
  }

  /** Score + top-k tail shared by [[search]] and [[searchDpp]]. */
  private def scoreTopK(rows: DataFrame, queryVec: Seq[Float], k: Int,
                        metric: String, quantized: Boolean): DataFrame = {
    val v = if (quantized) unpack(col("packed")) else col("vector")
    val q = vecLit(queryVec)
    val scored = metric match {
      case "cosine" => rows.withColumn("similarity", cosine(v, q))
      case "euclidean" =>
        // negate so "higher = closer" uniformly (fixes reference quirk,
        // SURVEY.md §2 #15)
        rows.withColumn("similarity", -euclidean(v, q))
      // f32-parity mode: bit-compatible with the reference's f32 kernels
      // (src/similarity.rs:10-43)
      case "cosine_f32" =>
        rows.withColumn("similarity", cosineF32(v, q).cast("double"))
      case "euclidean_f32" =>
        rows.withColumn("similarity", (-euclideanF32(v, q)).cast("double"))
      case m => throw new IllegalArgumentException(s"graft: unknown metric $m")
    }
    scored
      .where(!isnan(col("similarity")))
      .select(col("similarity"), col("id"), col("content"), col("tags"))
      .orderBy(desc("similarity"), asc("id"))
      .limit(k)
  }

  /**
   * Compact the store's data files: every append writes new parquet
   * files, so a frequently-fed store accumulates tiny files per tag
   * partition — at scale the scan cost becomes file-open-bound instead
   * of byte-bound. Rewrites the store clustered by `tag_key` (one task's
   * output per tag set -> one file per partition dir at fixture sizes).
   * Clustering uses the REBALANCE hint, not repartition-by-column:
   * repartition pins every row of a tag set to ONE task (AQE must
   * preserve that semantic and will not split it), so one giant tag set
   * would serialize the rewrite; REBALANCE lets AQE split skewed
   * partitions because `partitionBy` on the write restores the
   * directory layout regardless of task placement. Commit parks the old
   * data dir aside (never delete-then-rename — a crash between the two
   * would leave the ONLY copy in a tmp dir that nothing guards), swaps
   * the rewrite in, then drops the parked copy; a crash mid-swap leaves
   * `data_compact_bak`, which [[requireNoPendingRecovery]] surfaces on
   * the next write. The manifest is untouched — tag sets don't change.
   * Reader caveat (shared with projectAll): the whole-directory swap has
   * a brief window with no data dir — compaction is an offline
   * maintenance operation, not safe under live readers (the writer lock
   * serializes writers only).
   */
  def compact(): Unit = withWriterLock() {
    requireNoPendingRecovery()
    val rewritten = table().hint("rebalance", "tag_key")
    val tmp = new org.apache.hadoop.fs.Path(s"$root/data_compact_tmp")
    rewritten.write.mode(SaveMode.Overwrite).partitionBy("tag_key").parquet(tmp.toString)
    val dataP = new org.apache.hadoop.fs.Path(dataPath)
    val bak = new org.apache.hadoop.fs.Path(s"$root/data_compact_bak")
    require(fs.rename(dataP, bak), "graft: compaction parking rename failed")
    try {
      require(fs.rename(tmp, dataP), "graft: compaction commit rename failed")
      fs.delete(bak, true)
    } catch {
      case e: Throwable =>
        if (!fs.exists(dataP)) fs.rename(bak, dataP)
        throw e
    }
  }

  /** Drop the store (reference clear, src/db.rs:608-625). Takes the
    * writer lock so an in-flight insert/upsert finishes (or this waits)
    * before the root vanishes — deleting under a live writer would free
    * its lock mid-write and re-admit the races the lock prevents. The
    * root delete removes the held lock file with it, which is fine: we
    * own it, and the finally-release becomes a no-op. `force = true`
    * skips the lock — the recovery path for a store whose writer
    * crashed holding it (clear is destructive anyway; forcing while a
    * writer is genuinely alive is on the caller). */
  def clear(force: Boolean = false): Unit = {
    def wipe(): Unit = { fs.delete(new org.apache.hadoop.fs.Path(root), true); () }
    if (force) wipe() else withWriterLock()(wipe())
  }

  // ---- projected (PCA) mode: reference src/db.rs:233-241, 287-367 ----

  private val eigenPath = s"$root/eigen.parquet" // analog of eigen.bin

  /** Projected-mode flag = existence of the stored basis (reference
    * probes eigen.bin, src/db.rs:233-237). */
  def isProjected: Boolean = fs.exists(new org.apache.hadoop.fs.Path(eigenPath))

  private def saveModel(m: Pca.Model): Unit = {
    import spark.implicits._
    Seq((m.means, m.basis.map(_.toSeq).toSeq))
      .toDF("means", "basis")
      .write.mode(SaveMode.Overwrite).parquet(eigenPath)
  }

  /** Load the stored projection (basis d x k + global means). */
  def loadModel(): Pca.Model = {
    val row = spark.read.parquet(eigenPath).head()
    // rows materialize nested arrays as mutable ArraySeq — use the
    // collection root type to stay cast-safe
    Pca.Model(
      row.getSeq[scala.collection.Seq[Double]](1).map(_.toArray).toArray,
      row.getSeq[Double](0).toArray)
  }

  /**
   * One-shot PCA compaction: fit k-dim basis over the whole store,
   * rewrite every partition with projected vectors (repacking the
   * quantized codec if present), persist the basis. Uses GLOBAL means
   * for the rewrite — fixes the reference's per-file re-centering quirk
   * (src/db.rs:320; divergence documented in SURVEY §2 #27).
   */
  def projectAll(k: Int): Unit = withWriterLock() {
    requireNoPendingRecovery()
    require(!isProjected, "graft: store is already projected")
    val model = Pca.fit(table(), "vector", k)
    val proj = Pca.projector(spark, model, "graft_store_project")
    val projected0 = table().withColumn("vector", proj(col("vector")))
    val projected =
      if (projected0.columns.contains("packed"))
        projected0.withColumn("packed", pack(col("vector")))
      else projected0
    // rewrite via temp dir + rename: never read and overwrite in place
    val tmp = new org.apache.hadoop.fs.Path(s"$root/data_tmp")
    projected.write.mode(SaveMode.Overwrite).partitionBy("tag_key").parquet(tmp.toString)
    val dataP = new org.apache.hadoop.fs.Path(dataPath)
    fs.delete(dataP, true)
    fs.rename(tmp, dataP)
    saveModel(model)
  }

  /** Size-threshold projection trigger (reference: file > 1,000,000 B on
    * insert triggers PCA to 500 dims, src/db.rs:551-553 — surfaced here
    * as an explicit compaction call, not an insert side effect). */
  def maybeProject(thresholdBytes: Long, k: Int): Boolean = {
    if (isProjected || !exists) return false
    val sz = fs.getContentSummary(new org.apache.hadoop.fs.Path(dataPath)).getLength
    if (sz > thresholdBytes) { projectAll(k); true } else false
  }

  /**
   * Mode-aware search (reference src/db.rs:233-255): in projected mode
   * the query vector is projected through the stored basis driver-side
   * and scored with (negated) Euclidean distance; otherwise cosine.
   */
  def searchAuto(
      queryVec: Seq[Float],
      tags: Seq[String] = Nil,
      k: Int = 10,
      quantized: Boolean = false): DataFrame = {
    if (isProjected) {
      val q = Pca.projectOne(loadModel(), queryVec)
      search(q.toSeq, tags, k, metric = "euclidean", quantized = quantized)
    } else {
      search(queryVec, tags, k, metric = "cosine", quantized = quantized)
    }
  }

  // ---- store-integrated ANN: k-means IVF index (VERDICT r2 next-step
  // #5). The codebook persists beside eigen.parquet, the corpus is
  // re-materialized partitioned by assigned centroid — a probe search
  // then statically prunes to nprobe/k of the index files, the layout
  // that keeps ANN sublinear at 100 TB. The index is an explicit
  // point-in-time build (like projectAll): rows inserted after it are
  // not in the index until the next build — searchAnn is approximate BY
  // CONTRACT, exact search stays available via search(). ----

  private val annPath = s"$root/ann"
  // the codebook lives INSIDE the index dir (underscore-prefixed, so
  // parquet data scans ignore it): index + codebook then commit in ONE
  // directory rename and can never be observed out of sync — a separate
  // codebook file would let a crash between the two writes pair a new
  // index with an old codebook, silently probing the wrong lists
  private val codebookPath = s"$annPath/_codebook.parquet"

  def hasAnnIndex: Boolean =
    fs.exists(new org.apache.hadoop.fs.Path(codebookPath))

  /** Fit a k-means codebook over the stored vectors and write the
    * cid-partitioned index. One corpus pass for assignment (the argmin
    * is a broadcast-codebook expression — no shuffle) plus the k-means
    * fit passes. */
  def buildAnnIndex(k: Int, seed: Long = 42L): Unit = withWriterLock() {
    requireNoPendingRecovery()
    // pre-release layouts kept the codebook at the root; sweep it so a
    // stale copy can't linger beside the committed in-dir one
    fs.delete(new org.apache.hadoop.fs.Path(s"$root/codebook.parquet"), true)
    val centroids = SimilaritySearch.kmeansCentroids(
      table().select(col("vector").as("embedding")), k, seed)
    val codebook = SimilaritySearch.collectCodebook(centroids)
    val tmp = new org.apache.hadoop.fs.Path(s"$root/ann_tmp")
    table()
      .withColumn("cid", SimilaritySearch.nearestCentroid(col("vector"), codebook))
      .write.mode(SaveMode.Overwrite).partitionBy("cid").parquet(tmp.toString)
    centroids.coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$tmp/_codebook.parquet")
    val annP = new org.apache.hadoop.fs.Path(annPath)
    fs.delete(annP, true)
    require(fs.rename(tmp, annP), s"graft: ANN index commit rename failed")
  }

  /** Approximate top-k over the ANN index: probe the `nprobe` nearest
    * centroid lists (driver-side codebook argmin, like the reference's
    * in-memory index metadata), scan only those partitions. Same result
    * shape as [[search]]. */
  def searchAnn(queryVec: Seq[Float], k: Int = 10, nprobe: Int = 2): DataFrame = {
    require(hasAnnIndex, "graft: no ANN index — call buildAnnIndex(k) first")
    // mode-aware like searchAuto: a projected store indexed projected
    // vectors, so the query projects through the same basis
    val (qv, metric) =
      if (isProjected) (Pca.projectOne(loadModel(), queryVec).toSeq, "euclidean")
      else (queryVec, "cosine")
    val codebook = SimilaritySearch.collectCodebook(spark.read.parquet(codebookPath))
    val probes = SimilaritySearch.probeCids(codebook, qv, nprobe)
    val pruned = spark.read.parquet(annPath).where(col("cid").isin(probes: _*))
    scoreTopK(pruned, qv, k, metric, quantized = false)
  }
}
