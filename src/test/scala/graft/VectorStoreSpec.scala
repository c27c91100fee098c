package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.VectorStore

/** Integration tests mirroring the reference's own end-to-end suite
  * (src/tests.rs:3-143): store/retrieve, opposite vectors, tag
  * semantics, dimension-mismatch rejection, clear. */
class VectorStoreSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshStore(): VectorStore =
    new VectorStore(spark, Files.createTempDirectory("graft-store").toString)

  private def df(rows: Seq[(String, Array[Float], String, Seq[String])]) =
    rows.toDF("id", "vector", "content", "tags")
      .withColumn("vector", col("vector").cast("array<float>"))

  test("store one and retrieve it (src/tests.rs:3-22)") {
    val store = freshStore()
    store.insert(df(Seq(("a", Array(1f, 2f, 3f), "hello", Nil))))
    val hits = store.search(Seq(1f, 2f, 3f), k = 1).collect()
    assert(hits.length == 1 && hits(0).getAs[String]("content") == "hello")
    store.clear()
  }

  test("opposite vectors: each query returns its own row (src/tests.rs:24-60)") {
    val store = freshStore()
    store.insert(df(Seq(
      ("a", Array(1f, 2f, 3f), "hello", Nil),
      ("b", Array(-1f, -2f, -3f), "goodbye", Nil))))
    assert(store.search(Seq(1f, 2f, 3f), k = 1).head().getAs[String]("content") == "hello")
    assert(store.search(Seq(-1f, -2f, -3f), k = 1).head().getAs[String]("content") == "goodbye")
    store.clear()
  }

  test("tag semantics (src/tests.rs:62-127)") {
    val store = freshStore()
    store.insert(df(Seq(
      ("a", Array(1f, 0f, 0f), "hi", Seq("greetings")),
      ("b", Array(0.9f, 0.1f, 0f), "bye", Seq("goodbyes")))))
    // untagged query sees all partitions
    assert(store.search(Seq(1f, 0f, 0f), k = 2).count() == 2)
    // tag filter overrides similarity: query nearest to 'a' but tagged goodbyes
    val hit = store.search(Seq(1f, 0f, 0f), tags = Seq("goodbyes"), k = 1).head()
    assert(hit.getAs[String]("content") == "bye")
    // unknown tag: empty
    assert(store.search(Seq(1f, 0f, 0f), tags = Seq("nope"), k = 1).count() == 0)
    store.clear()
  }

  test("dimension mismatch rejected (src/tests.rs:129-143)") {
    val store = freshStore()
    store.insert(df(Seq(("a", Array(1f, 2f, 3f), "x", Nil))))
    val ex = intercept[IllegalArgumentException] {
      store.insert(df(Seq(("b", Array(1f, 2f, 3f, 4f), "y", Nil))))
    }
    assert(ex.getMessage.contains("dimension"))
    store.clear()
  }

  test("quantized storage path searches on dequantized vectors") {
    val store = freshStore()
    store.insert(df(Seq(
      ("a", Array(1f, 2f, 3f), "hello", Nil),
      ("b", Array(3f, 2f, 1f), "world", Nil))), quantize = true)
    val hit = store.search(Seq(1f, 2f, 3f), k = 1, quantized = true).head()
    assert(hit.getAs[String]("content") == "hello")
    // quantization error is bounded: top similarity still ~1
    assert(hit.getAs[Double]("similarity") > 0.999)
    store.clear()
  }

  test("tag-set partitioning materializes on disk (src/db.rs:645-650 analogue)") {
    val root = Files.createTempDirectory("graft-store").toString
    val store = new VectorStore(spark, root)
    store.insert(df(Seq(
      ("a", Array(1f, 0f), "x", Seq("t1")),
      ("b", Array(0f, 1f), "y", Seq("t2")))))
    val parts = new java.io.File(s"$root/data").listFiles()
      .filter(_.getName.startsWith("tag_key=")).map(_.getName)
    assert(parts.length == 2, s"expected 2 tag partitions, got ${parts.mkString(",")}")
    store.clear()
  }

  test("projected mode: fit, rewrite, mode-aware search, write-path projection (src/db.rs:233-367)") {
    val store = freshStore()
    val rng = new scala.util.Random(7)
    val rows = (0 until 40).map { i =>
      val base = Array.fill(8)(rng.nextGaussian().toFloat)
      (s"v$i", base, s"c$i", Seq("t"))
    }
    store.insert(df(rows))
    assert(!store.isProjected)
    store.projectAll(3)
    assert(store.isProjected)
    // stored vectors now have dim k=3
    assert(store.table().select(size(col("vector"))).head().getInt(0) == 3)
    // searchAuto projects the raw query and uses euclidean; nearest to a
    // stored row's ORIGINAL vector should be that row (projection is
    // distance-preserving enough on top components for self-match)
    val hit = store.searchAuto(rows(5)._2.toSeq, k = 1).head()
    assert(hit.getAs[String]("content") == "c5")
    // write path projects raw d=8 input to k=3
    store.insert(df(Seq(("z", Array.fill(8)(0.5f), "cz", Seq("t")))))
    assert(store.table().where(col("id") === "z")
      .select(size(col("vector"))).head().getInt(0) == 3)
    // wrong raw dim still rejected
    intercept[IllegalArgumentException] {
      store.insert(df(Seq(("bad", Array.fill(5)(1f), "x", Seq("t")))))
    }
    store.clear()
  }

  test("maybeProject triggers on size threshold (src/db.rs:551-553)") {
    val store = freshStore()
    store.insert(df(Seq(
      ("a", Array(1f, 0f, 0f, 0f), "x", Nil),
      ("b", Array(0f, 1f, 0f, 0f), "y", Nil),
      ("c", Array(0f, 0f, 1f, 0f), "z", Nil))))
    assert(!store.maybeProject(thresholdBytes = Long.MaxValue, k = 2))
    assert(store.maybeProject(thresholdBytes = 1L, k = 2))
    assert(store.isProjected)
    store.clear()
  }

  test("quantized search plan fuses cosine(unpack) into the packed kernel") {
    val store = freshStore()
    store.insert(df(Seq(
      ("a", Array(1f, 2f, 3f), "hello", Nil),
      ("b", Array(3f, 2f, 1f), "world", Nil))), quantize = true)
    val q = store.search(Seq(1f, 2f, 3f), k = 1, quantized = true)
    val plan = q.queryExecution.optimizedPlan.toString
    assert(plan.contains("graft_cosine_packed"), plan.take(2000))
    assert(!plan.contains("graft_unpack"), plan.take(2000))
    // and the fused result is identical to the unfused semantics
    assert(q.head().getAs[String]("content") == "hello")
    store.clear()
  }

  test("projected+quantized searchAuto fuses euclidean(unpack) into the packed kernel") {
    val store = freshStore()
    store.insert(df(Seq(
      ("a", Array(1f, 0f, 0f, 2f, 0f, 1f, 0f, 3f), "pa", Nil),
      ("b", Array(0f, 2f, 1f, 0f, 3f, 0f, 2f, 0f), "pb", Nil),
      ("c", Array(1f, 1f, 0f, 1f, 0f, 1f, 1f, 1f), "pc", Nil))), quantize = true)
    store.projectAll(2)
    // reference's post-auto-projection path: packed + euclidean
    // (src/db.rs:233-255); the rule must fuse it like the cosine path
    val q = store.searchAuto(Seq(1f, 0f, 0f, 2f, 0f, 1f, 0f, 3f), k = 1, quantized = true)
    val plan = q.queryExecution.optimizedPlan.toString
    assert(plan.contains("graft_euclidean_packed"), plan.take(2000))
    assert(!plan.contains("graft_unpack"), plan.take(2000))
    assert(q.head().getAs[String]("content") == "pa")
    store.clear()
  }

  test("model-embedder path: embed-and-insert + search-by-text (src/db.rs:101-114, 197-213)") {
    import graft.functions.{ModelEmbedder, ModelSession}
    val store = freshStore()
    val docs = Seq(
      (0L, "the quick brown fox"),
      (1L, "lorem ipsum dolor sit amet"),
      (2L, "completely unrelated text about spark")).toDF("doc_id", "text")
    val embedded = ModelEmbedder(16).embed(docs, "text", "vector")
      .select(col("doc_id").cast("string").as("id"), col("vector"),
        col("text").as("content"), array(lit("t")).as("tags"))
    store.insert(embedded)
    // search-by-text: query embedded through the same per-executor model
    val qv = ModelSession.get(16).embedBatch(Array("quick brown fox"))(0)
    val top = store.search(qv.toSeq, tags = Seq("t"), k = 1).head()
    assert(top.getAs[String]("content") == "the quick brown fox")
    store.clear()
  }

  test("upsert: last-write-wins by id with partition-selective rewrite (content.bin semantics)") {
    val store = freshStore()
    store.insert(df(Seq(
      ("a", Array(1f, 0f), "old-a", Seq("t1")),
      ("b", Array(0f, 1f), "b", Seq("t2")),
      ("c", Array(1f, 1f), "c", Seq("t3")))))
    store.upsert(df(Seq(
      ("a", Array(0.9f, 0.1f), "new-a", Seq("t1")), // overwrite in place
      ("d", Array(0.5f, 0.5f), "d", Seq("t2"))))) // brand-new id
    val rows = store.table().select("id", "content").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(rows == Map("a" -> "new-a", "b" -> "b", "c" -> "c", "d" -> "d"))
    assert(store.table().where(col("id") === "a").count() == 1)
    // moving an id to a different tag set removes it from the old partition
    store.upsert(df(Seq(("b", Array(0f, 1f), "b2", Seq("tX")))))
    val b = store.table().where(col("id") === "b")
      .select("content", "tags").collect()
    assert(b.length == 1 && b(0).getString(0) == "b2"
      && b(0).getSeq[String](1) == Seq("tX"))
    store.clear()
  }

  test("upsert on a quantized store keeps the packed column populated (auto-detect)") {
    val store = freshStore()
    store.insert(df(Seq(("a", Array(1f, 2f, 3f), "a1", Nil))), quantize = true)
    store.upsert(df(Seq(("a", Array(3f, 2f, 1f), "a2", Nil)))) // flag omitted
    val t = store.table()
    assert(t.count() == 1)
    assert(t.where(col("packed").isNull).count() == 0)
    assert(store.search(Seq(3f, 2f, 1f), k = 1, quantized = true)
      .head().getAs[String]("content") == "a2")
    store.clear()
    // the reverse direction is refused: quantize-upsert into an
    // unquantized store would mix schemas
    val plain = freshStore()
    plain.insert(df(Seq(("p", Array(1f, 2f), "p1", Nil))))
    intercept[IllegalArgumentException] {
      plain.upsert(df(Seq(("p", Array(2f, 1f), "p2", Nil))), quantize = true)
    }
    plain.clear()
  }

  test("insert on a quantized store keeps the packed column populated (layout wins, like upsert)") {
    val store = freshStore()
    store.insert(df(Seq(("a", Array(1f, 2f, 3f), "a1", Nil))), quantize = true)
    // flag omitted: the quantized layout must carry through — a
    // packed-less append would null the codec for the new rows and
    // quantized search would silently drop them
    store.insert(df(Seq(("b", Array(3f, 2f, 1f), "b1", Nil))))
    val t = store.table()
    assert(t.count() == 2)
    assert(t.where(col("packed").isNull).count() == 0)
    assert(store.search(Seq(3f, 2f, 1f), k = 1, quantized = true)
      .head().getAs[String]("content") == "b1")
    store.clear()
    // and the reverse is refused, mirroring upsert
    val plain = freshStore()
    plain.insert(df(Seq(("p", Array(1f, 2f), "p1", Nil))))
    intercept[IllegalArgumentException] {
      plain.insert(df(Seq(("q", Array(2f, 1f), "q1", Nil))), quantize = true)
    }
    plain.clear()
  }

  test("manifest deltas: inserts append O(batch) files; a full-state write folds them") {
    val root = Files.createTempDirectory("graft-mdelta").toString
    val store = new VectorStore(spark, root)
    store.insert(df(Seq(("a", Array(1f, 0f), "x", Seq("t1"))))) // seeds base
    store.insert(df(Seq(("b", Array(0f, 1f), "y", Seq("t2"))))) // delta
    store.insert(df(Seq(("c", Array(1f, 1f), "z", Seq("t3"))))) // delta
    val deltaDir = new java.io.File(s"$root/manifest_delta")
    assert(deltaDir.exists, "later inserts should append manifest deltas, not rewrite the base")
    def sets() = store.manifest().select("tags").collect()
      .map(_.getSeq[String](0).mkString(",")).toSet
    assert(sets() == Set("t1", "t2", "t3"))
    // delta-recorded tag sets are searchable through both pruning paths
    assert(store.search(Seq(1f, 1f), tags = Seq("t3"), k = 5).count() == 1)
    assert(store.searchDpp(Seq(1f, 1f), tags = Seq("t3"), k = 5).count() == 1)
    // a full-state write (upsert emptying t1) folds the old deltas into
    // the base BEFORE its insert leg appends a fresh one — the pruned
    // t1 entry must not resurface from a stale delta file
    store.upsert(df(Seq(("a", Array(1f, 0f), "x2", Seq("t2")))))
    assert(sets() == Set("t2", "t3"), s"pruned set resurfaced: ${sets()}")
    assert(store.search(Seq(1f, 0f), tags = Seq("t1"), k = 5).count() == 0)
    store.clear()
  }

  test("legacy store without a manifest file: search falls back, next insert repairs without hiding old partitions") {
    val root = Files.createTempDirectory("graft-legacy").toString
    val store = new VectorStore(spark, root)
    store.insert(df(Seq(
      ("a", Array(1f, 0f), "x", Seq("t1")),
      ("b", Array(0f, 1f), "y", Seq("t2")))))
    // simulate a pre-manifest store
    import scala.reflect.io.Directory
    new Directory(new java.io.File(s"$root/manifest")).deleteRecursively()
    new Directory(new java.io.File(s"$root/manifest_delta")).deleteRecursively()
    // fallback: partition discovery still answers tag search
    assert(store.search(Seq(1f, 0f), tags = Seq("t1"), k = 5).count() == 1)
    // the next insert rebuilds the manifest WITHOUT hiding old tag sets
    store.insert(df(Seq(("c", Array(0.5f, 0.5f), "z", Seq("t3")))))
    assert(store.search(Seq(1f, 0f), tags = Seq("t1"), k = 5).count() == 1)
    assert(store.searchDpp(Seq(1f, 0f), tags = Seq("t1"), k = 5).count() == 1)
    store.clear()
  }

  test("streaming ingestion: readStream -> insertStream -> search") {
    import org.apache.spark.sql.types._
    val store = freshStore()
    val src = Files.createTempDirectory("graft-ingest").toString
    def deliver(rows: Seq[(String, Array[Float], String, Seq[String])]): Unit =
      df(rows).coalesce(1).write.mode("append").parquet(src)
    deliver(Seq(("s1", Array(1f, 0f), "first", Seq("live"))))
    deliver(Seq(("s2", Array(0f, 1f), "second", Seq("live"))))
    val schema = StructType(Seq(
      StructField("id", StringType),
      StructField("vector", ArrayType(FloatType, containsNull = true)),
      StructField("content", StringType),
      StructField("tags", ArrayType(StringType, containsNull = true))))
    val stream = spark.readStream.schema(schema).parquet(src)
    store.insertStream(stream).awaitTermination()
    assert(store.table().count() == 2)
    assert(store.search(Seq(1f, 0f), tags = Seq("live"), k = 1)
      .head().getAs[String]("content") == "first")
    store.clear()
  }

  test("insertStreamDedup: min-id survivor within a batch, first arrival wins across batches") {
    import org.apache.spark.sql.types._
    val store = freshStore()
    val src = Files.createTempDirectory("graft-ingest-dedup").toString
    def deliver(rows: Seq[(String, Array[Float], String, Seq[String])]): Unit =
      df(rows).coalesce(1).write.mode("append").parquet(src)
    val schema = StructType(Seq(
      StructField("id", StringType),
      StructField("vector", ArrayType(FloatType, containsNull = true)),
      StructField("content", StringType),
      StructField("tags", ArrayType(StringType, containsNull = true))))
    def drain(): Unit = store.insertStreamDedup(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(src)).awaitTermination()
    // batch 1: "dup" arrives twice in one batch — min id z5 survives
    deliver(Seq(
      ("z9", Array(1f, 0f), "dup", Seq("live")),
      ("z5", Array(1f, 0f), "dup", Seq("live")),
      ("a1", Array(0f, 1f), "uniq", Seq("live"))))
    Thread.sleep(1100) // distinct file mtimes => deterministic batch order
    // batch 2: a SMALLER id for "dup" arrives later — streaming
    // causality: the committed z5 row must not be replaced
    deliver(Seq(
      ("a0", Array(1f, 1f), "dup", Seq("live")),
      ("b2", Array(0f, 1f), "fresh", Seq("live"))))
    drain()
    val got = store.table().select("id", "content").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("z5", "dup"), ("a1", "uniq"), ("b2", "fresh")), s"got $got")
    // replayed content is idempotent: a later file re-carrying "dup"
    // adds nothing (same checkpoint — only the new file is processed)
    Thread.sleep(1100)
    deliver(Seq(("c0", Array(1f, 0f), "dup", Seq("live"))))
    drain()
    assert(store.table().count() == 3)
    store.clear()
  }

  test("delete: partition-selective takedown, unknown ids no-op, time travel until vacuum") {
    val store = freshStore()
    store.insert(df(Seq(
      ("a", Array(1f, 0f), "ca", Seq("t1")),
      ("b", Array(0f, 1f), "cb", Seq("t1")),
      ("c", Array(1f, 1f), "cc", Seq("t2")))))
    val v0 = store.versions.max
    assert(store.deleteIds(Seq("nope")) == 0L, "unknown id must be a 0-row no-op")
    assert(store.versions.max == v0, "a no-op delete must not commit a version")
    assert(store.deleteIds(Seq("a")) == 1L)
    assert(store.table().select("id").collect().map(_.getString(0)).toSet
      == Set("b", "c"))
    // search never serves a deleted row
    assert(store.search(Seq(1f, 0f), k = 3).collect()
      .map(_.getAs[String]("id")).toSet == Set("b", "c"))
    // the delete is logical: the pre-delete snapshot stays readable
    assert(store.tableAt(v0).count() == 3)
    // deleting a partition's last row vanishes its tag set
    assert(store.deleteIds(Seq("c")) == 1L)
    assert(store.manifest().select("tag_key").count() == 1)
    assert(store.table().select("id").collect().map(_.getString(0)).toSeq
      == Seq("b"))
    store.clear()
  }

  test("null tags normalize to the empty tag set (no null tag_key ever written)") {
    val store = freshStore()
    store.insert(Seq(("n1", Array(1f, 0f), "nx"))
      .toDF("id", "vector", "content")
      .withColumn("vector", col("vector").cast("array<float>"))
      .withColumn("tags", lit(null).cast("array<string>")))
    // rows with null tags behave exactly like empty-tagged rows
    assert(store.search(Seq(1f, 0f), k = 1).head().getAs[String]("content") == "nx")
    assert(store.search(Seq(1f, 0f), tags = Seq("t"), k = 1).count() == 0)
    val keys = store.manifest().select("tag_key").collect().map(_.getString(0))
    assert(keys.length == 1 && keys.head != null, s"null tag_key written: ${keys.toSeq}")
    store.clear()
  }

  test("concurrent inserts serialize on the writer lock: no tag set lost") {
    // the manifest update is read-modify-write; without the lock one of
    // two simultaneous inserters could overwrite the other's tag set
    // (VERDICT r2 next-step #4)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val store = freshStore()
    val a = Future(store.insert(df(Seq(("a", Array(1f, 0f), "x", Seq("tagA"))))))
    val b = Future(store.insert(df(Seq(("b", Array(0f, 1f), "y", Seq("tagB"))))))
    Await.result(a, 120.seconds); Await.result(b, 120.seconds)
    assert(store.table().count() == 2)
    val sets = store.manifest().select("tags").collect()
      .map(_.getSeq[String](0).mkString(",")).toSet
    assert(sets == Set("tagA", "tagB"), s"manifest lost a tag set: $sets")
    assert(store.search(Seq(1f, 0f), tags = Seq("tagA"), k = 5).count() == 1)
    assert(store.search(Seq(0f, 1f), tags = Seq("tagB"), k = 5).count() == 1)
    // the lock is released afterwards: a third insert proceeds
    store.insert(df(Seq(("c", Array(1f, 1f), "z", Seq("tagC")))))
    assert(store.table().count() == 3)
    store.clear()
  }

  test("an invalid upsert batch fails BEFORE the swap: overwritten rows survive") {
    val store = freshStore()
    store.insert(df(Seq(("a", Array(1f, 0f), "keep-me", Seq("t1")))))
    // dimension-mismatched batch targeting an existing id: must abort
    // while the old row still exists (validating after the swap, as
    // this round first did, deleted it first)
    intercept[IllegalArgumentException] {
      store.upsert(df(Seq(("a", Array(1f, 0f, 9f), "bad", Seq("t1")))))
    }
    val rows = store.table().select("id", "content").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(rows == Map("a" -> "keep-me"), s"upsert destroyed rows: $rows")
    assert(store.search(Seq(1f, 0f), tags = Seq("t1"), k = 1)
      .head().getAs[String]("content") == "keep-me")
    store.clear()
  }

  test("a crashed rewrite's debris is invisible: readers stay on the committed snapshot, the next writer proceeds") {
    val root = Files.createTempDirectory("graft-crash").toString
    val store = new VectorStore(spark, root)
    store.insert(df(Seq(("a", Array(1f, 0f), "v1", Seq("t1")))))
    val key = store.manifest().select("tag_key").head().getString(0)
    // simulate a writer that crashed after staging but before the
    // manifest commit: an orphan (possibly partial) gen dir plus
    // leftover staging dirs — nothing references them
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$root/data/tag_key=$key/gen=99"))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$root/upsert_tmp"))
    assert(store.search(Seq(1f, 0f), k = 1).head().getAs[String]("content") == "v1")
    // the next upsert commits cleanly past the debris
    store.upsert(df(Seq(("a", Array(1f, 0f), "v2", Seq("t1")))))
    assert(store.search(Seq(1f, 0f), k = 1).head().getAs[String]("content") == "v2")
    assert(store.table().count() == 1)
    // vacuum reclaims the orphan gen, the superseded gen, and the tmp
    store.vacuum(0L)
    val gens = new java.io.File(s"$root/data/tag_key=$key").listFiles()
      .map(_.getName).filter(_.startsWith("gen=")).toSet
    assert(!gens.contains("gen=99") && !gens.contains("gen=0"), s"vacuum left $gens")
    assert(!new java.io.File(s"$root/upsert_tmp").exists)
    assert(store.search(Seq(1f, 0f), k = 1).head().getAs[String]("content") == "v2")
    store.clear()
  }

  test("search stays fully answerable while compact commits (reader-safe generation swap)") {
    // VERDICT r3 next #1's done-criterion: a reader concurrent with
    // compaction must never observe a missing or partial data dir —
    // the old generation stays on disk until vacuum, the new one
    // becomes visible in a single manifest-version rename.
    import java.util.concurrent.atomic.AtomicBoolean
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val store = freshStore()
    val rows = (0 until 60).map(i =>
      (s"v$i", Array(i.toFloat, (60 - i).toFloat), s"c$i",
        Seq(if (i % 2 == 0) "even" else "odd")))
    rows.grouped(20).foreach(g => store.insert(df(g)))
    val stop = new AtomicBoolean(false)
    val reader = Future {
      var n = 0
      while (!stop.get) {
        assert(store.search(Seq(1f, 59f), k = 5).count() == 5)
        assert(store.search(Seq(1f, 59f), tags = Seq("even"), k = 3).count() == 3)
        n += 1
      }
      n
    }
    try {
      store.compact()
      store.compact() // a second cycle while the reader still spins
    } finally stop.set(true)
    assert(Await.result(reader, 300.seconds) > 0, "reader never completed a pass")
    // data identical after both commits + vacuum
    store.vacuum(0L)
    val after = store.table().select("id", "content").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(after == rows.map(r => (r._1, r._3)).toSet)
    store.clear()
  }

  test("upsert drops manifest entries for partitions it emptied (manifest mirrors store)") {
    val store = freshStore()
    store.insert(df(Seq(
      ("a", Array(1f, 0f), "a1", Seq("t1")),
      ("b", Array(0f, 1f), "b1", Seq("t2")))))
    // move the ONLY t1 row to tag set t2: the t1 partition vanishes and
    // its manifest entry must go with it (ADVICE r2 #2)
    store.upsert(df(Seq(("a", Array(1f, 0f), "a2", Seq("t2")))))
    val sets = store.manifest().select("tags").collect()
      .map(_.getSeq[String](0).mkString(",")).toSet
    assert(sets == Set("t2"), s"stale manifest entries: $sets")
    assert(store.search(Seq(1f, 0f), tags = Seq("t1"), k = 5).count() == 0)
    assert(store.search(Seq(1f, 0f), tags = Seq("t2"), k = 5).count() == 2)
    store.clear()
  }

  test("filtered ANN: tag predicate inside the probed cells; full probe == exact tag search") {
    val store = freshStore()
    val rng = new scala.util.Random(7)
    val rows = (0 until 80).map { i =>
      (s"v$i", Array.fill(8)(rng.nextGaussian().toFloat), s"c$i",
        if (i % 3 == 0) Seq("de", "web") else Seq("en", "web"))
    }
    store.insert(df(rows))
    store.buildAnnIndex(k = 4)
    val qv = rows(11)._2.toSeq
    // at full probe coverage the filtered ANN result must equal the
    // exact tag-filtered search (same rows, same order)
    val ann = store.searchAnn(qv, k = 5, nprobe = 4, tags = Seq("de"))
      .select("id").collect().map(_.getString(0)).toSeq
    val exact = store.search(qv, tags = Seq("de"), k = 5)
      .select("id").collect().map(_.getString(0)).toSeq
    assert(ann == exact && ann.nonEmpty)
    // every hit respects the superset filter
    assert(store.searchAnn(qv, k = 20, nprobe = 4, tags = Seq("de", "web"))
      .select("tags").collect()
      .forall(r => { val t = r.getSeq[String](0); t.contains("de") && t.contains("web") }))
    // unknown tag: empty, not an error
    assert(store.searchAnn(qv, k = 5, nprobe = 4, tags = Seq("nope")).count() == 0)
    // the batched variant honors the same filter (same rows, same order)
    val many = store.searchManyAnn(
        Seq((1L, qv)).toDF("qid", "qvec"), k = 5, nprobe = 4, tags = Seq("de"))
      .orderBy("rank").select("id").collect().map(_.getString(0)).toSeq
    assert(many == ann)
    // the cid partition pruning survives the tag filter
    val p = store.searchAnn(qv, k = 5, nprobe = 2, tags = Seq("de"))
      .queryExecution.executedPlan.toString
    assert(p.linesIterator.find(_.contains("PartitionFilters"))
      .exists(_.contains("cid")), s"no cid partition pruning:\n${p.take(2000)}")
    store.clear()
  }

  test("filtered ANN auto-nprobe escalates under selective tags: facade default holds >=0.85 recall") {
    // VERDICT r15 next #6: the build-time calibration measures
    // UNFILTERED list coverage; a selective tag filter thins the probed
    // lists and the calibrated default silently under-covers. The auto
    // path now escalates nprobe until the post-filter candidate pool
    // reaches k x margin (or full probe).
    val store = freshStore()
    val rng = new scala.util.Random(61)
    val rows = (0 until 400).map { i =>
      (s"v$i", Array.fill(16)(rng.nextGaussian().toFloat), s"c$i",
        if (i % 10 == 0) Seq("rare", "all") else Seq("common", "all"))
    }
    store.insert(df(rows))
    store.buildAnnIndex(k = 8)
    // 'rare' keeps 40 of 400 rows — every calibrated-nprobe probe set
    // is candidate-starved at k=10 x margin=10, so the default MUST
    // escalate; ground truth is the exact facade under the same filter
    val recalls = Seq(7, 123, 251, 388).map { qi =>
      val q = rows(qi)._2.toSeq
      val annIds = store.searchAnn(q, k = 10, tags = Seq("rare"))
        .select("id").collect().map(_.getString(0)).toSet
      val exactIds = store.search(q, tags = Seq("rare"), k = 10)
        .select("id").collect().map(_.getString(0)).toSet
      annIds.intersect(exactIds).size.toDouble / exactIds.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.85,
      s"filtered facade-default recall $mean below target (curve: $recalls)")
    // an EXPLICIT nprobe is never overridden: the plan still prunes to
    // that single probed partition even under the same selective tag
    val p = store.searchAnn(rows(7)._2.toSeq, k = 10, nprobe = 1,
      tags = Seq("rare")).queryExecution.executedPlan.toString
    assert(p.linesIterator.find(_.contains("PartitionFilters"))
      .exists(_.contains("cid")), s"explicit-nprobe pruning lost:\n${p.take(1500)}")
    // the BATCHED facade escalates by the same contract: default
    // filtered batch recall vs the exact facade per query
    val qdf = Seq(7, 123, 251, 388).zipWithIndex
      .map { case (qi, i) => (i.toLong, rows(qi)._2.toSeq) }
      .toDF("qid", "qvec").withColumn("qvec", col("qvec").cast("array<float>"))
    val manyIds = store.searchManyAnn(qdf, k = 10, tags = Seq("rare"))
      .select("qid", "id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getString(1)).toSet }
    val manyRecalls = Seq(7, 123, 251, 388).zipWithIndex.map { case (qi, i) =>
      val exactIds = store.search(rows(qi)._2.toSeq, tags = Seq("rare"), k = 10)
        .select("id").collect().map(_.getString(0)).toSet
      manyIds(i.toLong).intersect(exactIds).size.toDouble / exactIds.size
    }
    val manyMean = manyRecalls.sum / manyRecalls.size
    assert(manyMean >= 0.85,
      s"filtered BATCHED facade-default recall $manyMean below target ($manyRecalls)")
    store.clear()
  }

  test("filtered ANN escalation is metadata-first: zero Spark jobs planning a warm tagged searchAnn") {
    // VERDICT r16 next #4 / ADVICE r16 #3: the escalation re-ran
    // limit-bounded COUNT jobs per doubling round on every tagged
    // serve call, and the codebook collect was 1-2 more. Build-time
    // per-(cid, tag set) stats + the per-version codebook cache answer
    // the pool estimate from driver metadata: planning a warm tagged
    // query runs ZERO Spark jobs (the query's own execution is the
    // first job to start).
    val store = freshStore()
    val rng = new scala.util.Random(83)
    val rows = (0 until 200).map { i =>
      (s"v$i", Array.fill(16)(rng.nextGaussian().toFloat), s"c$i",
        if (i % 10 == 0) Seq("rare", "all") else Seq("common", "all"))
    }
    store.insert(df(rows))
    store.buildAnnIndex(k = 4)
    // first tagged call loads + caches codebook, meta and tag stats
    // (jobs allowed here)
    store.searchAnn(rows(7)._2.toSeq, k = 10, tags = Seq("rare")).count()
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    val planned = try {
      // plan TWO warm tagged queries (different vectors — the stats
      // path must not depend on a per-query memo) without executing
      val a = store.searchAnn(rows(23)._2.toSeq, k = 10, tags = Seq("rare"))
      val b = store.searchAnn(rows(151)._2.toSeq, k = 10, tags = Seq("rare"))
      Thread.sleep(300) // listener events are async
      assert(jobs.get() == 0,
        s"warm filtered-ANN planning still ran ${jobs.get()} Spark job(s)")
      Seq(a, b)
    } finally spark.sparkContext.removeSparkListener(listener)
    // the metadata-planned queries execute correctly: k hits, filter
    // respected (every 'rare' row also carries 'all')
    planned.foreach { q =>
      val got = q.collect()
      assert(got.length == 10)
      assert(got.forall(_.getSeq[String](3).contains("rare")))
    }
    store.clear()
  }

  test("buildAnnIndex calibrates the auto nprobe: facade DEFAULT search meets the >=0.9-recall target") {
    // VERDICT r14 #2: the old hardcoded nprobe=2 default silently
    // served ~0.39 recall on organic data. The build now measures the
    // recall-vs-coverage curve and stores the >=0.9 operating point in
    // the index meta; an uninformed searchAnn() resolves it.
    val store = freshStore()
    val rng = new scala.util.Random(29)
    val rows = (0 until 200).map { i =>
      (s"v$i", Array.fill(16)(rng.nextGaussian().toFloat), s"c$i", Seq("t"))
    }
    store.insert(df(rows))
    store.buildAnnIndex(k = 8)
    val np = store.annCalibratedNprobe
    assert(np.exists(p => p >= 1 && p <= 8), s"no calibrated nprobe in meta: $np")
    // default == the calibrated explicit point (same rows, same order)
    val qv = rows(42)._2.toSeq
    val auto = store.searchAnn(qv, k = 10).select("id")
      .collect().map(_.getString(0)).toSeq
    val explicit = store.searchAnn(qv, k = 10, nprobe = np.get).select("id")
      .collect().map(_.getString(0)).toSeq
    assert(auto == explicit && auto.size == 10)
    // measured default recall over held-out-style queries: mean
    // recall@10 vs the exact facade search must clear the target the
    // calibration promises (sampling noise margin: calibration uses
    // its own 32-query sample)
    val recalls = Seq(3, 77, 131, 188).map { qi =>
      val q = rows(qi)._2.toSeq
      val annIds = store.searchAnn(q, k = 10).select("id").collect()
        .map(_.getString(0)).toSet
      val exactIds = store.search(q, k = 10).select("id").collect()
        .map(_.getString(0)).toSet
      annIds.intersect(exactIds).size.toDouble / exactIds.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.85, s"facade-default recall $mean below target (curve: $recalls, nprobe=$np)")
    // batched + PQ facades resolve the same auto default (row-count
    // sanity; equality is pinned by the single-query check above)
    assert(store.searchManyAnn(Seq((1L, qv)).toDF("qid", "qvec"), k = 5)
      .count() == 5)
    store.clear()
  }

  test("ANN index on the store: build, probe-pruned search, recall vs exact (facade path)") {
    val store = freshStore()
    val rng = new scala.util.Random(13)
    val rows = (0 until 120).map { i =>
      (s"v$i", Array.fill(16)(rng.nextGaussian().toFloat), s"c$i", Seq("t"))
    }
    store.insert(df(rows))
    assert(!store.hasAnnIndex)
    store.buildAnnIndex(k = 8)
    assert(store.hasAnnIndex)
    val qv = rows(17)._2.toSeq
    val ann = store.searchAnn(qv, k = 10, nprobe = 4)
    // the probe IN-list must reach the scan as a cid partition filter
    val scanLine = ann.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(scanLine.contains("cid"), s"no cid partition pruning:\n$scanLine")
    val annIds = ann.select("id").collect().map(_.getString(0)).toSet
    val exactIds = store.search(qv, k = 10).select("id").collect()
      .map(_.getString(0)).toSet
    val recall = annIds.intersect(exactIds).size.toDouble / exactIds.size
    assert(recall >= 0.5, s"ANN recall too low: $recall")
    // rebuild replaces the index atomically (codebook + partitions
    // commit in one rename, so they can never pair out of sync)
    store.buildAnnIndex(k = 4)
    assert(store.hasAnnIndex)
    val rebuilt = store.searchAnn(qv, k = 10, nprobe = 2)
      .select("id").collect().map(_.getString(0)).toSet
    assert(rebuilt.size == 10)
    store.clear()
  }

  test("incremental ANN maintenance: inserts fold into the index, staleness triggers rebuild") {
    val store = freshStore()
    val rng = new scala.util.Random(29)
    def mkRows(from: Int, n: Int) = (from until from + n).map { i =>
      (s"v$i", Array.fill(16)(rng.nextGaussian().toFloat), s"c$i", Seq("t"))
    }
    store.insert(df(mkRows(0, 100)))
    // high rebuildFraction: the first small insert folds in WITHOUT a
    // refit, proving the append path serves new rows on old centroids
    store.buildAnnIndex(k = 8, rebuildFraction = 2.0)
    val newRows = mkRows(100, 10)
    store.insert(df(newRows))
    // probing ALL lists makes the ANN scan exhaustive over the index:
    // missing new rows then means they were never appended, not that a
    // probe missed their list
    val served = store.searchAnn(newRows.head._2.toSeq, k = 110, nprobe = 8)
      .select("id").collect().map(_.getString(0)).toSet
    assert(newRows.map(_._1).toSet.subsetOf(served),
      s"inserted rows missing from ANN index: ${newRows.map(_._1).toSet -- served}")
    // recall gate still holds through the facade after the append
    val qv = newRows.head._2.toSeq
    val annIds = store.searchAnn(qv, k = 10, nprobe = 4)
      .select("id").collect().map(_.getString(0)).toSet
    val exactIds = store.search(qv, k = 10).select("id").collect()
      .map(_.getString(0)).toSet
    assert(annIds.intersect(exactIds).size.toDouble / exactIds.size >= 0.5)
    store.clear()
  }

  test("ANN rebuild threshold: appends past the staleness fraction refit the codebook") {
    val store = freshStore()
    val rng = new scala.util.Random(31)
    def mkRows(from: Int, n: Int) = (from until from + n).map { i =>
      (s"v$i", Array.fill(8)(rng.nextGaussian().toFloat), s"c$i", Seq("t"))
    }
    store.insert(df(mkRows(0, 40)))
    store.buildAnnIndex(k = 4, rebuildFraction = 0.25)
    // 20 appended rows > 0.25 * 40 -> the insert itself must refit: the
    // rebuilt index re-assigns EVERY row (old and new) to fresh
    // centroids, so an exhaustive probe of the new index serves all 60
    store.insert(df(mkRows(40, 20)))
    val all = store.searchAnn(Seq.fill(8)(0.1f), k = 60, nprobe = 4)
    assert(all.count() == 60)
    // and the appended-rows counter reset: another small insert folds
    // in without losing rows
    store.insert(df(mkRows(60, 2)))
    assert(store.searchAnn(Seq.fill(8)(0.1f), k = 62, nprobe = 4).count() == 62)
    store.clear()
  }

  test("versioned ANN commit: concurrent searches never observe a missing index across rebuilds") {
    val store = freshStore()
    val rng = new scala.util.Random(41)
    val rows = (0 until 100).map { i =>
      (s"v$i", Array.fill(8)(rng.nextGaussian().toFloat), s"c$i", Seq("t"))
    }
    store.insert(df(rows))
    store.buildAnnIndex(k = 4)
    val qv = rows(3)._2.toSeq
    // reader thread hammers searchAnn while the main thread rebuilds
    // repeatedly: under the old delete-then-rename swap the reader would
    // race the gap (hasAnnIndex=false or missing files); with versioned
    // commits every resolution lands on a complete v<k> dir
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val failure = new java.util.concurrent.atomic.AtomicReference[Throwable](null)
    val reads = new java.util.concurrent.atomic.AtomicInteger(0)
    val reader = new Thread(() => {
      try while (!stop.get()) {
        assert(store.hasAnnIndex, "hasAnnIndex went false mid-rebuild")
        val n = store.searchAnn(qv, k = 5, nprobe = 4).count()
        assert(n == 5, s"searchAnn returned $n rows mid-rebuild")
        reads.incrementAndGet(); ()
      } catch { case t: Throwable => failure.set(t) }
    })
    reader.start()
    try for (i <- 1 to 4) store.buildAnnIndex(k = 4, seed = 42L + i)
    finally { stop.set(true); reader.join(30000) }
    assert(failure.get() == null,
      s"concurrent searchAnn failed during rebuild: ${failure.get()}")
    assert(reads.get() > 0, "reader thread never completed a search")
    // each rebuild committed a fresh version; superseded ones linger for
    // readers until vacuum reclaims them past the grace period
    val annRoot = new java.io.File(store.root, "ann")
    val versions = annRoot.listFiles().map(_.getName).filter(_.matches("v\\d+")).sorted
    assert(versions.length == 5, s"expected 5 committed versions, got ${versions.mkString(",")}")
    store.vacuum(graceMs = 0L)
    val kept = annRoot.listFiles().map(_.getName).filter(_.matches("v\\d+"))
    assert(kept.toSeq == Seq("v4"), s"vacuum kept ${kept.mkString(",")}")
    assert(store.searchAnn(qv, k = 5, nprobe = 4).count() == 5)
    // crash debris: a dead staged build under ann_tmp must not block the
    // next build, and the committed index stays intact
    val tmp = new java.io.File(store.root, "ann_tmp")
    tmp.mkdirs()
    java.nio.file.Files.write(new java.io.File(tmp, "junk").toPath, Array[Byte](1))
    store.buildAnnIndex(k = 4)
    assert(store.searchAnn(qv, k = 5, nprobe = 4).count() == 5)
    store.clear()
  }

  test("quantized ANN: the packed kernel fuses on the probed lists, recall unchanged") {
    val store = freshStore()
    val rng = new scala.util.Random(37)
    val rows = (0 until 80).map { i =>
      (s"v$i", Array.fill(16)(rng.nextGaussian().toFloat), s"c$i", Seq("t"))
    }
    store.insert(df(rows), quantize = true)
    store.buildAnnIndex(k = 4)
    val qv = rows(11)._2.toSeq
    val q = store.searchAnn(qv, k = 10, nprobe = 2, quantized = true)
    // the fusion rule must reach the ANN path: cosine(unpack(packed))
    // collapses into the packed kernel (4x less I/O on probed lists)
    val plan = q.queryExecution.optimizedPlan.toString
    assert(plan.contains("graft_cosine_packed"), plan.take(2000))
    // quantized and raw ANN agree on the same probed lists up to codec
    // error: compare against the raw-vector scoring of the same probes
    val rawIds = store.searchAnn(qv, k = 10, nprobe = 2)
      .select("id").collect().map(_.getString(0)).toSet
    val qIds = q.select("id").collect().map(_.getString(0)).toSet
    assert(qIds.intersect(rawIds).size >= 8,
      s"quantized ANN diverged from raw beyond codec error: $qIds vs $rawIds")
    store.clear()
  }

  test("live micro-batch ingestion: ProcessingTime trigger across two deliveries") {
    import org.apache.spark.sql.types._
    val store = freshStore()
    val src = Files.createTempDirectory("graft-ingest-live").toString
    def deliver(rows: Seq[(String, Array[Float], String, Seq[String])]): Unit =
      df(rows).coalesce(1).write.mode("append").parquet(src)
    val schema = StructType(Seq(
      StructField("id", StringType),
      StructField("vector", ArrayType(FloatType, containsNull = true)),
      StructField("content", StringType),
      StructField("tags", ArrayType(StringType, containsNull = true))))
    deliver(Seq(("s1", Array(1f, 0f), "first", Seq("live"))))
    val q = store.insertStream(
      spark.readStream.schema(schema).parquet(src),
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("500 milliseconds"))
    try {
      q.processAllAvailable()
      assert(store.table().count() == 1)
      // second LIVE delivery: the dim check + manifest upkeep must hold
      // on a later micro-batch, not just the first
      deliver(Seq(("s2", Array(0f, 1f), "second", Seq("later"))))
      q.processAllAvailable()
      assert(store.table().count() == 2)
      val sets = store.manifest().select("tags").collect()
        .map(_.getSeq[String](0).mkString(",")).toSet
      assert(sets == Set("live", "later"), s"manifest out of sync: $sets")
      assert(store.search(Seq(0f, 1f), tags = Seq("later"), k = 1)
        .head().getAs[String]("content") == "second")
    } finally q.stop()
    store.clear()
  }

  test("insertStream restart resumes from the checkpoint: committed batches never replay") {
    import org.apache.spark.sql.types._
    val store = freshStore()
    val src = Files.createTempDirectory("graft-ingest-restart").toString
    def deliver(rows: Seq[(String, Array[Float], String, Seq[String])]): Unit =
      df(rows).coalesce(1).write.mode("append").parquet(src)
    val schema = StructType(Seq(
      StructField("id", StringType),
      StructField("vector", ArrayType(FloatType, containsNull = true)),
      StructField("content", StringType),
      StructField("tags", ArrayType(StringType, containsNull = true))))
    def drain(): Unit = store.insertStream(
      spark.readStream.schema(schema).parquet(src)).awaitTermination()
    deliver(Seq(("r1", Array(1f, 0f), "one", Seq("t"))))
    drain()
    assert(store.table().count() == 1)
    // restart over the SAME source: without the checkpoint the whole
    // source would replay and duplicate-append (insert is not
    // idempotent by id — ADVICE r2 #3)
    drain()
    assert(store.table().count() == 1, "restart replayed a committed batch")
    // and new data after the restart still flows
    deliver(Seq(("r2", Array(0f, 1f), "two", Seq("t"))))
    drain()
    assert(store.table().count() == 2)
    store.clear()
  }

  test("compact collapses append-accumulated small files without changing data") {
    val root = Files.createTempDirectory("graft-compact").toString
    val store = new VectorStore(spark, root)
    for (i <- 0 until 5)
      store.insert(df(Seq((s"v$i", Array(i.toFloat, 1f), s"c$i", Seq("t")))))
    def partFiles(): Int = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(s"$root/data")).count(_.getName.endsWith(".parquet"))
    }
    val before = partFiles()
    assert(before >= 5, s"expected >=5 appended files, got $before")
    val rows = store.table().select("id", "content").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    store.compact()
    store.vacuum(0L) // superseded generations linger for readers until vacuumed
    assert(partFiles() < before, "compaction did not reduce file count")
    val after = store.table().select("id", "content").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(after == rows)
    assert(store.search(Seq(3f, 1f), tags = Seq("t"), k = 1)
      .head().getAs[String]("content") == "c3")
    store.clear()
  }

  test("stats: one row per live tag set with real bytes, no data scan") {
    val store = freshStore()
    store.insert(df(Seq(
      ("a", Array(1f, 0f), "one", Seq("x")),
      ("b", Array(0f, 1f), "two", Seq("y")))))
    val st = store.stats().collect()
    assert(st.length == 2)
    assert(st.forall(r => r.getLong(3) > 0 && r.getInt(4) >= 1))
    store.clear()
  }

  test("time travel: tableAt reads the pre-upsert snapshot until vacuum reclaims it") {
    val store = freshStore()
    store.insert(df(Seq(("a", Array(1f, 0f), "one", Seq("t")))))
    val v1 = store.versions.last
    store.upsert(df(Seq(("a", Array(1f, 0f), "one-v2", Seq("t")))))
    assert(store.versions.last > v1, "upsert should commit a new manifest version")
    assert(store.table().select("content").head().getString(0) == "one-v2")
    assert(store.tableAt(v1).select("content").head().getString(0) == "one")
    assert(store.tableAt(store.versions.last)
      .select("content").head().getString(0) == "one-v2")
    store.vacuum(0L)
    // history reclaimed: only the live version remains readable
    assert(store.versions == Seq(store.versions.last))
    intercept[IllegalArgumentException] { store.tableAt(v1) }
    assert(store.table().select("content").head().getString(0) == "one-v2")
    store.clear()
  }

  test("IVF-PQ: ADC preselect + exact refine tracks exact search; appends get codes") {
    val store = freshStore()
    val vt = graft.core.Tables.vectorTable(spark, "/root/testdata/sf0.001")
      .select(col("id").cast("string").as("id"), col("vector"), col("content"), col("tags"))
    store.insert(vt)
    store.buildAnnIndex(4)
    val qv = vt.where(col("id") === "0").select("vector")
      .head().getSeq[Float](0)
    val exact = store.search(qv, k = 10).select("id")
      .collect().map(_.getString(0)).toSet
    val pq = store.searchAnnPq(qv, k = 10, nprobe = 2).select("id")
      .collect().map(_.getString(0)).toSet
    assert(pq.size == 10)
    val recall = (exact intersect pq).size / 10.0
    assert(recall >= 0.5, s"IVF-PQ recall $recall vs exact; got ${pq.toSeq.sorted}")
    // appended rows are PQ-encoded with the committed books and
    // immediately searchable through the ADC path
    store.insert(df(Seq(("appended-probe", qv.toArray, "fresh row", Seq("t")))))
    val top = store.searchAnnPq(qv, k = 2, nprobe = 2).select("id")
      .collect().map(_.getString(0))
    assert(top.contains("appended-probe"), top.mkString(","))
    store.clear()
  }

  test("projectAll crash recovery: committed-but-unrenamed basis is completed, never refit") {
    val store = freshStore()
    val rows = (0 until 30).map { i =>
      (s"id$i", Array.tabulate(6)(j => math.sin(i * 0.7 + j).toFloat), s"c$i", Seq("t"))
    }
    store.insert(df(rows))
    store.projectAll(2)
    assert(store.isProjected)
    // simulate the crash window a retry must survive: projected data
    // committed, basis staged but not renamed (the state between
    // projectAll's two metadata ops)
    val rootDir = java.nio.file.Paths.get(store.root)
    java.nio.file.Files.move(rootDir.resolve("eigen.parquet"),
      rootDir.resolve("eigen_tmp.parquet"))
    assert(!store.isProjected)
    val ex = intercept[IllegalStateException] { store.projectAll(2) }
    assert(ex.getMessage.contains("crashed projection"), ex.getMessage)
    // the recovery finished the rename: store is projected again and a
    // raw-dim query searches through the recovered basis
    assert(store.isProjected)
    assert(store.searchAuto(rows.head._2.toSeq, k = 3).count() == 3)
    // naive refit would have required !isProjected to pass — double
    // projection is structurally impossible now
    intercept[IllegalArgumentException] { store.projectAll(2) }
    store.clear()
  }

  test("searchMany: batched exact top-k agrees with per-query search; tag filter holds") {
    val store = freshStore()
    val vt = graft.core.Tables.vectorTable(spark, "/root/testdata/sf0.001")
      .select(col("id").cast("string").as("id"), col("vector"), col("content"), col("tags"))
    store.insert(vt)
    val qvs = vt.where(col("id").cast("long") < 4).orderBy(col("id").cast("long"))
      .select(col("id").cast("long").as("qid"), col("vector").as("qvec"))
    val batched = store.searchMany(qvs, k = 5).collect()
      .groupBy(_.getLong(0))
      .map { case (qid, rows) =>
        qid -> rows.sortBy(_.getLong(1)).map(r => (r.getString(3), r.getDouble(2))).toSeq
      }
    val single = qvs.collect().map { r =>
      val qid = r.getLong(0)
      val res = store.search(r.getSeq[Float](1), k = 5).collect()
        .map(h => (h.getString(1), h.getDouble(0))).toSeq
      qid -> res
    }.toMap
    assert(batched == single, s"batched $batched vs single $single")
    // tag filter: restrict both paths to one tag and re-check one query
    val someTag = vt.select(explode(col("tags"))).limit(1).head().getString(0)
    val qv0 = qvs.limit(1)
    val bt = store.searchMany(qv0, k = 3, tags = Seq(someTag)).collect()
      .map(r => r.getString(3)).toSeq
    val st = store.search(qv0.head().getSeq[Float](1), tags = Seq(someTag), k = 3)
      .collect().map(_.getString(1)).toSeq
    assert(bt == st)
    store.clear()
  }

  test("searchManyAnn: probed batch equals exact batch when all lists are probed") {
    val store = freshStore()
    val vt = graft.core.Tables.vectorTable(spark, "/root/testdata/sf0.001")
      .select(col("id").cast("string").as("id"), col("vector"), col("content"), col("tags"))
    store.insert(vt)
    store.buildAnnIndex(4)
    val qvs = vt.where(col("id").cast("long") < 3)
      .select(col("id").cast("long").as("qid"), col("vector").as("qvec"))
    // nprobe = all lists -> the probe join scans everything = exact
    val ann = store.searchManyAnn(qvs, k = 5, nprobe = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(3))).toSet
    val exact = store.searchMany(qvs, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(3))).toSet
    assert(ann == exact, s"ann $ann vs exact $exact")
    // narrow probes still return k rows per query and a subset ordering
    val narrow = store.searchManyAnn(qvs, k = 5, nprobe = 2).collect()
    assert(narrow.groupBy(_.getLong(0)).forall(_._2.length == 5))
    // unquantized store: the quantized flag fails loudly, not silently
    intercept[IllegalArgumentException] {
      store.searchManyAnn(qvs, k = 5, quantized = true)
    }
    store.clear()
  }

  test("serveStream: streamed query feed equals the batched search (ANN and exact)") {
    val store = freshStore()
    val vt = graft.core.Tables.vectorTable(spark, "/root/testdata/sf0.001")
      .select(col("id").cast("string").as("id"), col("vector"), col("content"), col("tags"))
    store.insert(vt)
    store.buildAnnIndex(4)
    val qvs = vt.where(col("id").cast("long") < 6)
      .select(col("id").cast("long").as("qid"), col("vector").as("qvec"))
    // two delivery files + maxFilesPerTrigger=1 so AvailableNow genuinely
    // splits the feed into several micro-batches
    val base = java.nio.file.Files.createTempDirectory("graft-serve").toString
    qvs.where(col("qid") < 3).coalesce(1).write.parquet(s"$base/feed")
    qvs.where(col("qid") >= 3).coalesce(1).write.mode("append").parquet(s"$base/feed")
    def feed() = spark.readStream.schema(qvs.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$base/feed")
    store.serveStream(feed(), s"$base/ann", k = 5, nprobe = 4,
      queryName = "graft_serve_test_ann").awaitTermination()
    val served = spark.read.parquet(s"$base/ann/results")
    assert(served.select("batch_id").distinct().count() >= 2,
      "feed should arrive over several micro-batches")
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "rank", "id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(key(served) == key(store.searchManyAnn(qvs, k = 5, nprobe = 4)))
    // exact mode twin (fresh out dir = fresh checkpoint)
    store.serveStream(feed(), s"$base/exact", k = 5, exact = true,
      queryName = "graft_serve_test_exact").awaitTermination()
    assert(key(spark.read.parquet(s"$base/exact/results"))
      == key(store.searchMany(qvs, k = 5)))
    // restart with the SAME checkpoint: the source ledger has committed
    // every feed file, so a re-drain serves nothing new and the result
    // set does not duplicate (the resume contract a long-lived serving
    // deployment relies on)
    val before = spark.read.parquet(s"$base/exact/results").count()
    store.serveStream(feed(), s"$base/exact", k = 5, exact = true,
      queryName = "graft_serve_test_exact2").awaitTermination()
    assert(spark.read.parquet(s"$base/exact/results").count() == before)
    store.clear()
  }

  test("searchManyAnn quantized: packed-kernel scoring on a quantized store") {
    val store = freshStore()
    val vt = graft.core.Tables.vectorTable(spark, "/root/testdata/sf0.001")
      .select(col("id").cast("string").as("id"), col("vector"), col("content"), col("tags"))
    store.insert(vt, quantize = true)
    store.buildAnnIndex(4)
    val qvs = vt.where(col("id").cast("long") < 2)
      .select(col("id").cast("long").as("qid"), col("vector").as("qvec"))
    val quant = store.searchManyAnn(qvs, k = 5, nprobe = 4, quantized = true)
    // the fusion rule collapses cosine(unpack(packed)) into the packed
    // kernel — same gate as the single-query quantized path
    val p = quant.queryExecution.executedPlan.toString
    assert(p.contains("OnPacked") || !p.contains("graft_unpack"), p.take(2000))
    val rows = quant.collect()
    assert(rows.groupBy(_.getLong(0)).forall(_._2.length == 5))
    // dequantized scoring tracks exact: top-1 id agrees per query (the
    // codec's max per-dim error is bounded; top-1 margins dominate it)
    val exact = store.searchMany(qvs, k = 1).collect()
      .map(r => (r.getLong(0), r.getString(3))).toMap
    val qtop = rows.filter(_.getLong(1) == 1L)
      .map(r => (r.getLong(0), r.getString(3))).toMap
    assert(qtop == exact, s"quantized top-1 $qtop vs exact $exact")
    store.clear()
  }

  test("dup graph: versioned pair artifact; rebuild bumps version; vacuum reclaims") {
    val store = freshStore()
    // a near-dup trio (identical vectors) + two isolated rows
    store.insert(df(Seq(
      ("a", Array(1f, 2f, 3f, 4f), "dup", Seq("t")),
      ("b", Array(1f, 2f, 3f, 4f), "dup", Seq("t")),
      ("c", Array(1f, 2f, 3f, 4f), "dup", Seq("t")),
      ("x", Array(-4f, 3f, -2f, 1f), "solo", Seq("t")),
      ("y", Array(2f, -1f, 4f, -3f), "solo", Seq("t")))))
    intercept[IllegalStateException] { store.nearDups() }
    store.buildDupGraph()
    assert(store.hasDupGraph)
    val pairs = store.nearDups().collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs == Set(("a", "b"), ("a", "c"), ("b", "c")), pairs.toString)
    // rebuild after an insert commits the NEXT version; old one stays
    // readable until vacuum (same contract as the ANN index)
    store.insert(df(Seq(("d", Array(1f, 2f, 3f, 4f), "dup too", Seq("t")))))
    store.buildDupGraph()
    val after = store.nearDups().collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(after == Set(("a", "b"), ("a", "c"), ("a", "d"),
      ("b", "c"), ("b", "d"), ("c", "d")), after.toString)
    val v0 = new java.io.File(s"${store.root}/dup/v0")
    val v1 = new java.io.File(s"${store.root}/dup/v1")
    assert(v0.exists && v1.exists)
    store.vacuum(0L)
    assert(!v0.exists && v1.exists, "vacuum should reclaim only the superseded dup version")
    assert(store.nearDups().count() == 6)
    // string-keyed components: the quad collapses to one deterministic
    // representative; isolated rows don't appear
    val comps = store.dupComponents().collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(comps.keySet == Set("a", "b", "c", "d"), comps.toString)
    assert(comps.values.toSet.size == 1, s"one component expected: $comps")
    store.clear()
  }

  test("delete prunes the dup graph; upsert drops it (no takedown leak through pairs)") {
    val store = freshStore()
    store.insert(df(Seq(
      ("a", Array(1f, 2f, 3f, 4f), "dup", Seq("t")),
      ("b", Array(1f, 2f, 3f, 4f), "dup", Seq("t")),
      ("c", Array(1f, 2f, 3f, 4f), "dup", Seq("t")),
      ("x", Array(-4f, 3f, -2f, 1f), "solo", Seq("t")))))
    store.buildDupGraph()
    assert(store.nearDups().count() == 3) // (a,b) (a,c) (b,c)
    // takedown of b: every pair touching b vanishes, (a,c) survives
    assert(store.deleteIds(Seq("b")) == 1L)
    val pruned = store.nearDups().collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(pruned == Set(("a", "c")), pruned.toString)
    assert(store.dupMeta().exists(_.contains("\"deleted_ids\":1")),
      store.dupMeta().toString)
    // an overwrite invalidates pairs both ways: the graph drops whole
    store.upsert(df(Seq(("a", Array(-4f, 3f, -2f, 1f), "now solo", Seq("t")))))
    assert(!store.hasDupGraph, "upsert must drop the dup graph")
    intercept[IllegalStateException] { store.nearDups() }
    store.clear()
  }

  test("deleteByTags: whole-partition takedown is a manifest prune; superset semantics") {
    val store = freshStore()
    store.insert(df(Seq(
      ("a", Array(1f, 0f), "ca", Seq("crawl1", "en")),
      ("b", Array(0f, 1f), "cb", Seq("crawl1")),
      ("c", Array(1f, 1f), "cc", Seq("crawl2", "en")))))
    val v0 = store.versions.max
    assert(store.deleteByTags(Seq("nope")) == 0L, "unknown tag must be a no-op")
    // superset semantics: only the (crawl1, en) partition holds both
    assert(store.deleteByTags(Seq("crawl1", "en")) == 1L)
    assert(store.table().select("id").collect().map(_.getString(0)).toSet
      == Set("b", "c"))
    // drop the rest of crawl1
    assert(store.deleteByTags(Seq("crawl1")) == 1L)
    assert(store.table().select("id").collect().map(_.getString(0)).toSet
      == Set("c"))
    assert(store.search(Seq(0f, 1f), k = 3).collect()
      .map(_.getAs[String]("id")).toSet == Set("c"))
    // logical until vacuum: the pre-delete snapshot stays readable
    assert(store.tableAt(v0).count() == 3)
    assert(store.manifest().count() == 1)
    store.clear()
  }

  test("reinsert after takedown does not resurrect old rows (absent keys revive past on-disk gens)") {
    val store = freshStore()
    store.insert(df(Seq(("a", Array(1f, 0f), "old", Seq("crawl")))))
    assert(store.deleteByTags(Seq("crawl")) == 1L)
    // the doomed gen dir is still on disk (vacuum hasn't run); a
    // gen-0 default here would append into it and resurrect row "a"
    store.insert(df(Seq(("b", Array(0f, 1f), "new", Seq("crawl")))))
    val got = store.table().select("id").collect().map(_.getString(0)).toSet
    assert(got == Set("b"), s"taken-down rows resurrected: $got")
    // same machinery for a delete() that vanishes the partition
    assert(store.deleteIds(Seq("b")) == 1L)
    store.insert(df(Seq(("c", Array(1f, 1f), "newer", Seq("crawl")))))
    assert(store.table().select("id").collect().map(_.getString(0)).toSet
      == Set("c"))
    store.clear()
  }

  test("updateDupGraph: incremental maintenance == full rebuild over an append sequence (VERDICT r7 #2)") {
    val store = freshStore()
    store.insert(df(Seq(
      ("a", Array(1f, 2f, 3f, 4f), "dup", Seq("t")),
      ("b", Array(1f, 2f, 3f, 4f), "dup", Seq("t")),
      ("c", Array(1f, 2f, 3f, 4f), "dup", Seq("t")),
      ("x", Array(-4f, 3f, -2f, 1f), "solo", Seq("t")),
      ("y", Array(2f, -1f, 4f, -3f), "solo", Seq("t")))))
    intercept[IllegalStateException] { store.updateDupGraph(df(Nil).limit(0)) }
    store.buildDupGraph()
    def pairSet() = store.nearDups().collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    // append 1: a fourth clique member + another isolated row; the
    // incremental update must find all (new x all) pairs
    store.insert(df(Seq(
      ("d", Array(1f, 2f, 3f, 4f), "dup too", Seq("t")),
      ("z", Array(-1f, -2f, 4f, 3f), "solo", Seq("t")))))
    store.updateDupGraph(df(Seq(
      ("d", Array(1f, 2f, 3f, 4f), "dup too", Seq("t")),
      ("z", Array(-1f, -2f, 4f, 3f), "solo", Seq("t")))))
    assert(pairSet() == Set(("a", "b"), ("a", "c"), ("a", "d"),
      ("b", "c"), ("b", "d"), ("c", "d")), pairSet().toString)
    // append 2: chain a second increment to prove the sequence composes
    store.insert(df(Seq(("e", Array(1f, 2f, 3f, 4f), "dup 3", Seq("t")))))
    store.updateDupGraph(df(Seq(("e", Array(1f, 2f, 3f, 4f), "dup 3", Seq("t")))))
    val expected = (for {
      p <- Seq("a", "b", "c", "d", "e"); q <- Seq("a", "b", "c", "d", "e")
      if p < q
    } yield (p, q)).toSet
    assert(pairSet() == expected, pairSet().toString)
    // the incremental result IS the full rebuild's result
    val rebuilt = freshStore()
    rebuilt.insert(store.table().select("id", "vector", "content", "tags"))
    rebuilt.buildDupGraph()
    val full = rebuilt.nearDups().collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairSet() == full)
    // lineage recorded: each increment commits the next version with
    // its provenance
    val meta = store.dupMeta().getOrElse(fail("no dup meta"))
    assert(meta.contains("\"updated_from\":1") && meta.contains("\"delta_ids\":1"), meta)
    assert(new java.io.File(s"${store.root}/dup/v2").exists)
    rebuilt.clear(); store.clear()
  }

  test("searchMany enforces its batch ceiling with a routing error (VERDICT r7 #8)") {
    val store = freshStore()
    store.insert(df(Seq(("a", Array(1f, 0f), "x", Seq("t")))))
    val big = spark.range(65537)
      .select(col("id").as("qid"),
        array(lit(1f), lit(0f)).cast("array<float>").as("qvec"))
    val e = intercept[IllegalArgumentException] { store.searchMany(big, k = 1) }
    assert(e.getMessage.contains("searchManyAnn"), e.getMessage)
    // at the ceiling itself the contract holds — no error
    assert(store.searchMany(big.limit(3), k = 1).count() == 3)
    store.clear()
  }

  test("projectAll rejects k == stored dimension (ADVICE r7 #1: recovery heuristic soundness)") {
    val store = freshStore()
    store.insert(df(Seq(
      ("a", Array(1f, 0f, 0f, 0f), "a", Nil),
      ("b", Array(0f, 1f, 0f, 0f), "b", Nil),
      ("c", Array(0f, 0f, 1f, 0f), "c", Nil))))
    val e = intercept[IllegalArgumentException] { store.projectAll(4) }
    assert(e.getMessage.contains("strictly below"), e.getMessage)
    assert(!store.isProjected)
    store.projectAll(2)
    assert(store.isProjected)
    store.clear()
  }

  test("quantized layout survives an unprobeable snapshot (persisted bit, ADVICE r7 #4)") {
    val store = freshStore()
    store.insert(df(Seq(("a", Array(1f, 2f, 3f, 4f), "x", Seq("t")))), quantize = true)
    assert(new java.io.File(s"${store.root}/_layout.json").exists)
    // simulate the emptied-and-fully-vacuumed state the advisory
    // described: no data files left for snapshot probing. Pre-fix,
    // storedHasPacked fell back to a packed-less canonical schema and a
    // quantize=false insert silently converted the store's layout.
    def rmr(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(rmr)
      f.delete(); ()
    }
    rmr(new java.io.File(s"${store.root}/data"))
    // the persisted layout bit wins: the store stays quantized
    store.insert(df(Seq(("b", Array(4f, 3f, 2f, 1f), "y", Seq("t")))))
    assert(store.table().columns.contains("packed"))
    assert(store.table().where(col("packed").isNull).count() == 0)
    // and a quantize=true insert is accepted instead of the misleading
    // "store is not quantized" rejection
    store.insert(df(Seq(("c", Array(2f, 2f, 2f, 2f), "z", Seq("t")))), quantize = true)
    assert(store.search(Seq(4f, 3f, 2f, 1f), k = 3, quantized = true).count() == 2)
    store.clear()
  }

  test("IVF-PQ recall >= 0.8 @ k=10 on the sf0.1 store with fitted books (VERDICT r6 #3)") {
    // the production-scale quality gate: 65k organic driver vectors,
    // per-subspace k-means books fitted by buildAnnIndex, ADC preselect
    // + exact refine — the number a real deployment sees, not the
    // 500-vector fixture floor above
    val store = freshStore()
    val emb = graft.core.Tables.load(spark, "/root/testdata/sf0.1", "embeddings")
      .select(col("vec_id").cast("string").as("id"),
        col("embedding").as("vector"),
        concat(lit("doc "), col("vec_id")).as("content"),
        array(lit("t")).as("tags"))
    store.insert(emb)
    store.buildAnnIndex(16)
    val queries = graft.core.Tables.load(spark, "/root/testdata/sf0.1", "embeddings")
      .where(col("vec_id") < 8).orderBy("vec_id")
      .select("embedding").collect().map(_.getSeq[Float](0))
    // nprobe 8/16 and refineK 80: the driver's synthetic vectors are
    // near-isotropic (weak cluster structure — AnnTune measured probe
    // recall 0.64 at nprobe=4, 0.89 at 8), so half the lists must be
    // probed for a 0.8 floor; organic embedding corpora cluster far
    // better and run lower nprobe at the same recall
    val recalls = queries.map { qv =>
      val exact = store.search(qv, k = 10).select("id")
        .collect().map(_.getString(0)).toSet
      val pq = store.searchAnnPq(qv, k = 10, nprobe = 8, refineK = 80)
        .select("id").collect().map(_.getString(0)).toSet
      (exact intersect pq).size / 10.0
    }
    val mean = recalls.sum / recalls.length
    assert(mean >= 0.8, s"IVF-PQ sf0.1 recall $mean (per-query: ${recalls.mkString(",")})")
    store.clear()
  }

  test("compactAnnIndex: append-accumulated list files shrink; results and PQ survive") {
    val store = freshStore()
    val vt = graft.core.Tables.vectorTable(spark, "/root/testdata/sf0.001")
      .select(col("id").cast("string").as("id"), col("vector"), col("content"), col("tags"))
    store.insert(vt.where(col("id").cast("long") < 30))
    store.buildAnnIndex(4)
    // three append batches -> three extra files per touched cid list
    for (lo <- Seq(30, 36, 42))
      store.insert(vt.where(col("id").cast("long") >= lo && col("id").cast("long") < lo + 6))
    val qv = vt.where(col("id") === "0").select("vector").head().getSeq[Float](0)
    val before = store.searchAnn(qv, k = 8).collect().map(_.getString(1)).toSeq
    def annFiles(): Int = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).toSeq.flatMap(walk)
        else Seq(f)
      val vs = new java.io.File(s"${store.root}/ann").listFiles().filter(_.getName.startsWith("v"))
      walk(vs.maxBy(_.getName.stripPrefix("v").toInt)).count(_.getName.endsWith(".parquet"))
    }
    val filesBefore = annFiles()
    val versBefore = store.versions // manifest versions unaffected
    store.compactAnnIndex()
    assert(annFiles() < filesBefore, s"no shrink: $filesBefore -> ${annFiles()}")
    val after = store.searchAnn(qv, k = 8).collect().map(_.getString(1)).toSeq
    assert(after == before)
    assert(store.searchAnnPq(qv, k = 5).count() == 5) // PQ books survived the copy
    assert(store.versions == versBefore)
    store.clear()
  }

  test("IVF-PQ: an index whose dim cannot subspace-split fails searchAnnPq loudly") {
    val store = freshStore()
    store.insert(df((0 until 20).map(i =>
      (s"v$i", Array(i.toFloat, (20 - i).toFloat), s"c$i", Seq("t")))))
    store.buildAnnIndex(2)
    assert(store.searchAnn(Seq(1f, 2f), k = 3).count() == 3) // plain ANN still works
    intercept[IllegalStateException] { store.searchAnnPq(Seq(1f, 2f), k = 3) }
    store.clear()
  }

  test("searchHybrid: lexical-only and vector-only hits both surface; fusion favors dual hits") {
    val store = freshStore()
    store.insert(df(Seq(
      ("both", Array(1f, 0f), "quantum flux capacitor", Seq("t")),
      ("lex", Array(0f, 1f), "quantum quantum quantum", Seq("t")),
      ("vec", Array(0.9f, 0.1f), "unrelated words entirely", Seq("t")),
      ("nil", Array(0f, -1f), "nothing relevant here", Seq("t")))))
    val hits = store.searchHybrid(Seq(1f, 0f), Seq("quantum"), k = 4, fuseK = 2)
      .collect().map(r => (r.getString(1), r.getInt(4)))
    val byId = hits.toMap
    // 'both' is in the lexical top-2 AND the vector top-2; it must rank first
    assert(byId("both") == 2, hits.mkString(","))
    assert(hits.head._1 == "both")
    // one-leg hits still surface; no-leg docs don't
    assert(byId.get("lex").contains(1) && byId.get("vec").contains(1))
    assert(!byId.contains("nil"), hits.mkString(","))
    // tag pruning applies to BOTH legs: restrict to a tag nothing has
    assert(store.searchHybrid(Seq(1f, 0f), Seq("quantum"),
      tags = Seq("absent"), k = 4, fuseK = 2).count() == 0)
    store.clear()
  }

  test("exportShards: shards tile the store; manifest matches the written files") {
    val store = freshStore()
    val rows = (0 until 60).map(i =>
      (s"v$i", Array(i.toFloat, (60 - i).toFloat), s"doc text number $i", Seq(s"t${i % 2}")))
    store.insert(df(rows))
    val out = java.nio.file.Files.createTempDirectory("graft_export").toString
    try {
      val manifest = store.exportShards(out, shards = 4).collect()
      assert(manifest.map(_.getLong(1)).sum == 60L)
      val back = spark.read.parquet(out)
      assert(back.count() == 60)
      assert(back.select("id").distinct().count() == 60)
      // per-shard file counts match the manifest rows
      val fileCounts = back.groupBy("shard").count()
        .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
      assert(fileCounts == manifest.map(r => (r.getInt(0), r.getLong(1))).toMap)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
      store.clear()
    }
  }

  test("vacuum reclaims bytes: superseded generations shrink the store on disk, results unchanged") {
    val store = freshStore()
    val rows = (0 until 90).map(i =>
      (s"v$i", Array(i.toFloat, (90 - i).toFloat), s"c$i", Seq(s"t${i % 3}")))
    // three inserts -> three generations' worth of small files per
    // partition; compact rewrites them into one gen, leaving the old
    // ones on disk for in-flight readers until vacuum
    rows.grouped(30).foreach(g => store.insert(df(g)))
    def du(f: java.io.File): Long =
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).map(du).sum
      else f.length()
    store.compact()
    val beforeVac = du(new java.io.File(store.root))
    store.vacuum(0L)
    val afterVac = du(new java.io.File(store.root))
    assert(afterVac < beforeVac,
      s"vacuum reclaimed nothing: $beforeVac -> $afterVac bytes")
    val after = store.table().select("id", "content").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(after == rows.map(r => (r._1, r._3)).toSet)
    assert(store.search(Seq(3f, 87f), tags = Seq("t0"), k = 3).count() == 3)
    store.clear()
  }

  test("writer-lock lease: a crashed holder's stale lock self-steals, a LIVE lock is never stolen") {
    // VERDICT r14 #5: previously a crashed holder stalled every writer
    // for the full timeout and recovery was a human running force
    val root = Files.createTempDirectory("graft-lease").toString
    val store = new VectorStore(spark, root, writerLeaseMs = 500)
    store.insert(df(Seq(("a", Array(1f, 0f), "x", Seq("t")))))
    // crashed holder: lock file with an old mtime and no heartbeat
    val lock = new java.io.File(s"$root/_lock")
    assert(lock.createNewFile())
    assert(lock.setLastModified(System.currentTimeMillis() - 60000))
    store.insert(df(Seq(("b", Array(0f, 1f), "y", Seq("t"))))) // steals, no force
    assert(store.table().count() == 2)
    assert(!lock.exists(), "lock not released after the stolen write")
    // a LIVE lock (fresh mtime, as a heartbeat would keep it) is never
    // stolen: acquisition times out loudly instead
    assert(lock.createNewFile())
    val waiter = new VectorStore(spark, root,
      writerLockTimeoutMs = 1200, writerLeaseMs = 60000)
    val e = intercept[IllegalStateException](
      waiter.insert(df(Seq(("c", Array(1f, 1f), "z", Seq("t"))))))
    assert(e.getMessage.contains("not acquired"))
    assert(lock.delete())
    store.clear()
  }

  test("tagged search serves routing metadata from the manifest snapshot cache: zero Spark jobs on a warm path") {
    // VERDICT r15 next #3: search() ran a manifest COUNT job (plus the
    // matchingTagKeys collect) on every tagged call before the
    // DPP-route decision — a per-query driver job on the serving path.
    // The cache is keyed by (manifest base version, delta file count),
    // so a repeat query is pure driver-side set math.
    val store = freshStore()
    store.insert(df(Seq(
      ("a", Array(1f, 0f), "hi", Seq("t1")),
      ("b", Array(0f, 1f), "bye", Seq("t2")))))
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    // first call populates the cache (search() itself is lazy — jobs
    // counted here are exactly the eager manifest count/collect)
    store.search(Seq(1f, 0f), tags = Seq("t1"), k = 1)
    spark.sparkContext.addSparkListener(listener)
    try {
      store.search(Seq(1f, 0f), tags = Seq("t1"), k = 1)
      store.search(Seq(0f, 1f), tags = Seq("t2"), k = 1)
      Thread.sleep(300) // listener events are async; drain before asserting
      assert(jobs.get() == 0,
        s"warm tagged search still ran ${jobs.get()} manifest job(s)")
    } finally spark.sparkContext.removeSparkListener(listener)
    // the cache must INVALIDATE on write: a new tag set is searchable
    // immediately (the insert appends a manifest delta -> new key)
    store.insert(df(Seq(("c", Array(1f, 1f), "new", Seq("t3")))))
    val hit = store.search(Seq(1f, 1f), tags = Seq("t3"), k = 1).collect()
    assert(hit.length == 1 && hit(0).getAs[String]("content") == "new",
      "stale manifest cache hid a freshly inserted tag set")
    store.clear()
  }

  test("manifest snapshot cache survives an EXTERNAL clear+rewrite: the mtime key invalidates across instances") {
    // Review finding (r16): version numbering resets on clear(), so a
    // rewritten store could collide with a cached (version, delta
    // count) key held by ANOTHER instance — the base dir's mtime now
    // rides in the key.
    val root = Files.createTempDirectory("graft-xclear").toString
    val writer = new VectorStore(spark, root)
    val reader = new VectorStore(spark, root)
    writer.insert(df(Seq(("a", Array(1f, 0f), "old", Seq("t")))))
    assert(reader.search(Seq(1f, 0f), tags = Seq("t"), k = 1)
      .head().getAs[String]("content") == "old") // reader caches the snapshot
    // "external" lifecycle: a DIFFERENT instance clears and rewrites to
    // the same shape (same version number, same delta count)
    writer.clear()
    Thread.sleep(20) // local-FS mtime granularity
    writer.insert(df(Seq(("b", Array(1f, 0f), "new", Seq("t")))))
    val got = reader.search(Seq(1f, 0f), tags = Seq("t"), k = 1).collect()
    assert(got.length == 1 && got(0).getAs[String]("content") == "new",
      s"reader served a stale snapshot across an external clear+rewrite: ${got.toSeq}")
    // and the explicit REFRESH escape hatch exists for out-of-protocol
    // mutations (manual file surgery that reproduces the key exactly)
    reader.refresh()
    assert(reader.search(Seq(1f, 0f), tags = Seq("t"), k = 1)
      .head().getAs[String]("content") == "new")
    writer.clear()
  }

  test("lease liveness via owner-keyed heartbeat sibling: matching hb defends, foreign hb does not") {
    // ADVICE r15 #4 + ADVICE r16 #1: the beat never touches the lock
    // file, and the owner keys the heartbeat FILENAME (`.hb.<owner>`),
    // not just its content — a zombie's in-flight beat after a steal
    // lands in its own dead file and can never clobber the successor's
    // liveness evidence. holderAlive consults the hb named by the
    // lock's CURRENT content.
    val root = Files.createTempDirectory("graft-lease-hb").toString
    // lease LONGER than the acquisition timeout: the planted hb is
    // static (no live beater refreshes it), so it must stay inside the
    // lease for the whole spin to prove the defense
    val store = new VectorStore(spark, root,
      writerLockTimeoutMs = 1500, writerLeaseMs = 30000)
    store.insert(df(Seq(("a", Array(1f, 0f), "x", Seq("t")))))
    val lock = new java.io.File(s"$root/_lock")
    def plant(f: java.io.File, content: String, ageMs: Long): Unit = {
      java.nio.file.Files.write(f.toPath, content.getBytes("UTF-8"))
      assert(f.setLastModified(System.currentTimeMillis() - ageMs))
    }
    // old lock + FRESH hb named by the same owner = live long-running
    // holder: never stolen, acquisition times out loudly
    plant(lock, "owner-A", 60000)
    plant(new java.io.File(s"$root/_lock.hb.owner-A"), "owner-A", 0)
    val e = intercept[IllegalStateException](
      store.insert(df(Seq(("b", Array(0f, 1f), "y", Seq("t"))))))
    assert(e.getMessage.contains("not acquired"))
    // the zombie-clobber scenario (ADVICE r16 #1), now structurally
    // inert: lock names owner-B (the successor), B's own hb is fresh,
    // and a zombie A writes a FRESH hb in its own file — B must still
    // be defended (with one shared hb file, A's write would have
    // replaced B's evidence and B's live lock would be stolen here)
    plant(lock, "owner-B", 60000)
    plant(new java.io.File(s"$root/_lock.hb.owner-B"), "owner-B", 0)
    plant(new java.io.File(s"$root/_lock.hb.owner-A"), "owner-A", 0)
    val e2 = intercept[IllegalStateException](
      store.insert(df(Seq(("b", Array(0f, 1f), "y", Seq("t"))))))
    assert(e2.getMessage.contains("not acquired"))
    // old lock whose owner has NO fresh hb of its own (only a foreign
    // zombie's) = no liveness evidence: stolen, all hb siblings swept
    plant(lock, "owner-C", 60000)
    assert(new java.io.File(s"$root/_lock.hb.owner-B").setLastModified(
      System.currentTimeMillis() - 60000))
    assert(new java.io.File(s"$root/_lock.hb.owner-A").delete())
    plant(new java.io.File(s"$root/_lock.hb.owner-A"), "owner-A", 0)
    store.insert(df(Seq(("c", Array(1f, 1f), "z", Seq("t")))))
    assert(store.table().count() == 2)
    assert(!lock.exists()
        && !new java.io.File(s"$root/_lock.hb.owner-A").exists()
        && !new java.io.File(s"$root/_lock.hb.owner-B").exists()
        && !new java.io.File(s"$root/_lock.hb.owner-C").exists(),
      "steal/release must clear the lock and every hb sibling")
    store.clear()
  }

  test("object-store-safe commits: partial (marker-less) version dirs are invisible and never re-targeted") {
    // VERDICT r14 #4: on S3-class stores "rename" is copy+delete, so a
    // crash mid-commit leaves a PARTIAL dir at the final versioned
    // name. Simulate exactly that — marker-less dirs full of garbage
    // that would break any reader touching them — and require readers
    // to refuse them, allocation to skip past them, vacuum to reap them.
    val root = Files.createTempDirectory("graft-marker").toString
    val store = new VectorStore(spark, root)
    val rng = new scala.util.Random(5)
    store.insert(df((0 until 50).map { i =>
      (s"v$i", Array.fill(8)(rng.nextGaussian().toFloat), s"c$i", Seq("t"))
    } :+ (("x", Array.fill(8)(0.5f), "cx", Seq("u")))))
    store.buildAnnIndex(k = 4)
    def plantGarbage(dir: String): Unit = {
      val d = new java.io.File(dir)
      assert(d.mkdirs())
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, "part-00000.parquet"),
        "this is not a parquet file".getBytes("UTF-8"))
    }
    plantGarbage(s"$root/manifest/v1.parquet") // crashed copy, no marker
    plantGarbage(s"$root/ann/v1")
    // readers resolve the newest COMMITTED version, not the wreckage
    assert(store.manifest().count() == 2)
    val qv = Seq.fill(8)(0.1f)
    assert(store.searchAnn(qv, k = 5, nprobe = 4).count() == 5)
    // the next commits allocate PAST the partial dirs (v2), and serve
    store.buildAnnIndex(k = 4)
    assert(new java.io.File(s"$root/ann/v2/_COMMITTED").exists())
    assert(store.searchAnn(qv, k = 5, nprobe = 4).count() == 5)
    // delete publishes via a manifest-base rename (THE commit point):
    // it must mint v2 past the wreckage, marker last
    import spark.implicits._
    store.delete(Seq("x").toDF("id"))
    assert(new java.io.File(s"$root/manifest/v2.parquet/_COMMITTED").exists())
    assert(store.manifest().count() == 1)
    assert(store.table().count() == 50)
    // vacuum reaps the wreckage with superseded versions
    store.vacuum(graceMs = 0L)
    assert(!new java.io.File(s"$root/manifest/v1.parquet").exists())
    assert(!new java.io.File(s"$root/ann/v1").exists())
    assert(store.manifest().count() == 1)
    store.clear()
  }

  test("clear(force) resets a store whose writer crashed holding the lock") {
    val root = Files.createTempDirectory("graft-stale-lock").toString
    val store = new VectorStore(spark, root)
    store.insert(df(Seq(("a", Array(1f, 2f), "x", Nil))))
    // simulate a crashed writer: stale lock file, no owner
    assert(new java.io.File(s"$root/_lock").createNewFile())
    store.clear(force = true)
    assert(!store.exists)
  }

  test("clear removes everything (src/db.rs:608-625)") {
    val root = Files.createTempDirectory("graft-store").toString
    val store = new VectorStore(spark, root)
    store.insert(df(Seq(("a", Array(1f, 2f), "x", Nil))))
    assert(store.exists)
    store.clear()
    assert(!store.exists)
  }

  test("content-fingerprint sidecar: exact dedup across inserts, deletes, and plain appends (r9 #3)") {
    // contentIdxMinBytes = 0 forces the sidecar path on a tiny store
    // (production gates it on store size — sub-threshold stores use
    // the direct probe, covered by the streaming dedup specs)
    val store = new VectorStore(spark,
      Files.createTempDirectory("graft-store").toString,
      contentIdxMinBytes = 0L)
    def idsOf() = store.table().select("id").collect().map(_.getString(0)).toSet
    store.insertDedup(df(Seq(
      ("a", Array(1f, 0f), "ca", Nil),
      ("b", Array(0f, 1f), "cb", Nil))))
    // second trigger: dup content dropped, fresh kept; sidecar is live
    store.insertDedup(df(Seq(
      ("b2", Array(0f, 1f), "cb", Nil),
      ("c", Array(1f, 1f), "cc", Nil))))
    assert(idsOf() == Set("a", "b", "c"))
    assert(store.contentIdxValid, "sidecar should be live after insertDedup")
    // a PLAIN insert must fold into the live sidecar (writeBatch hook):
    // its content then dedups on the next insertDedup trigger
    store.insert(df(Seq(("d", Array(1f, 2f), "cd", Nil))))
    store.insertDedup(df(Seq(
      ("d2", Array(1f, 2f), "cd", Nil),
      ("e", Array(2f, 1f), "ce", Nil))))
    assert(idsOf() == Set("a", "b", "c", "d", "e"))
    // deletion invalidates (the sidecar cannot subtract); the content
    // becomes insertable again — exactly the live-store semantics
    assert(store.deleteIds(Seq("c")) == 1L)
    assert(!store.contentIdxValid, "delete must invalidate the sidecar")
    store.insertDedup(df(Seq(("c9", Array(1f, 1f), "cc", Nil))))
    assert(idsOf() == Set("a", "b", "d", "e", "c9"))
    assert(store.contentIdxValid, "probe rebuilds the sidecar")
    // null contents stay null-SAFE: exactly one null row ever
    store.insertDedup(df(Seq(("n1", Array(3f, 0f), null, Nil))))
    store.insertDedup(df(Seq(("n2", Array(0f, 3f), null, Nil))))
    assert(idsOf() == Set("a", "b", "d", "e", "c9", "n1"))
    store.clear()
  }

  test("near-dup dedup-on-ingest: banded signature policy in-batch, cross-batch, and after deletes") {
    val store = freshStore()
    val base = "the quick brown fox jumps over the lazy dog while seventeen " +
      "green turtles watch a vector database merge stream batches under " +
      "heavy filter pressure near the sorted column store"
    val tweaked = base.replace("seventeen", "nineteen") // one-word edit: near-dup
    val other = "completely unrelated text about cooking pasta with garlic " +
      "butter sage and parmesan finished with a splash of lemon juice and " +
      "cracked pepper served beside roasted tomatoes on warm plates"
    def row(id: String, c: String) = (id, Array(1f, 0f), c, Seq.empty[String])
    def idsOf() = store.table().select("id").collect().map(_.getString(0)).toSet
    // in-batch: exact-dup (16/16 agreement) + one-word near-dup both
    // collapse to the min id; the unrelated doc passes
    store.insertNearDedup(df(Seq(
      row("a", base), row("b", base), row("c", tweaked), row("d", other))))
    assert(idsOf() == Set("a", "d"), idsOf().toString)
    // cross-batch: a later near-dup of a STORED doc drops, fresh text inserts
    val skyText = "morning fog lifts from the silver harbor while gulls trace " +
      "slow circles above rusted cranes and sleeping container ships wait " +
      "for the tide to turn beneath a pale wide sky"
    store.insertNearDedup(df(Seq(row("e", tweaked), row("f", skyText))))
    assert(idsOf() == Set("a", "d", "f"), idsOf().toString)
    assert(store.nearIdxValid)
    // plain insert folds into the live signature sidecar (writeBatch hook)
    val fresh = "a third corpus about sailing across cold northern seas " +
      "with patched canvas sails and a stubborn wooden rudder that creaks"
    store.insert(df(Seq(row("g", fresh))))
    store.insertNearDedup(df(Seq(row("h", fresh.replace("stubborn", "ancient")))))
    assert(idsOf() == Set("a", "d", "f", "g"), idsOf().toString)
    // deletion invalidates; the freed content family is insertable again
    assert(store.deleteIds(Seq("a")) == 1L)
    assert(!store.nearIdxValid)
    store.insertNearDedup(df(Seq(row("i", base))))
    assert(idsOf() == Set("d", "f", "g", "i"), idsOf().toString)
    // below the 2-token shingle floor: the fingerprint pseudo-signature
    // dedups EXACT trivial contents (and keeps replays idempotent —
    // review-pass r10 #1) while never fuzzy-matching anything
    store.insertNearDedup(df(Seq(row("s1", "hello"))))
    store.insertNearDedup(df(Seq(row("s2", "hello"), row("s3", "goodbye"))))
    assert(idsOf().contains("s1") && !idsOf().contains("s2") && idsOf().contains("s3"))
    // and a trivial content never matches a shingled doc or vice versa
    store.insertNearDedup(df(Seq(row("s4", "fox"))))
    assert(idsOf().contains("s4"))
    store.clear()
  }

  test("insertStreamNearDedup: replayed batches are idempotent (signature sidecar is the state)") {
    import org.apache.spark.sql.types._
    val store = freshStore()
    val src = Files.createTempDirectory("graft-neardedup-stream").toString
    val t1 = "the quick brown fox jumps over the lazy dog while seventeen " +
      "green turtles watch a vector database merge stream batches under " +
      "heavy filter pressure near the sorted column store"
    df(Seq(("n1", Array(1f, 0f), t1, Seq("s")),
      ("n2", Array(0f, 1f), t1.replace("turtles", "tortoises"), Seq("s"))))
      .coalesce(1).write.mode("append").parquet(src)
    val schema = StructType(Seq(
      StructField("id", StringType),
      StructField("vector", ArrayType(FloatType, containsNull = true)),
      StructField("content", StringType),
      StructField("tags", ArrayType(StringType, containsNull = true))))
    def drain(): Unit = store.insertStreamNearDedup(
      spark.readStream.schema(schema).parquet(src)).awaitTermination()
    drain()
    assert(store.table().count() == 1) // n2 is a near-dup of n1 in-batch
    // replay the SAME file through a fresh checkpoint: idempotent via
    // the committed sidecar, not via offsets
    store.insertStreamNearDedup(
      spark.readStream.schema(schema).parquet(src),
      checkpointLocation = Some(s"${store.root}/_checkpoints/replay_test"))
      .awaitTermination()
    assert(store.table().count() == 1, "replayed batch must drop every row")
    store.clear()
  }

  test("sidecar survives an EMPTIED store: rebuild from zero live rows, then dedup normally") {
    // delete-all leaves the data dir (old gens await vacuum) with an
    // empty live snapshot; the rebuild writes a zero-row sidecar and
    // the probe must read it as EMPTY, not die on schema inference
    val store = new VectorStore(spark,
      Files.createTempDirectory("graft-store").toString,
      contentIdxMinBytes = 0L)
    store.insertDedup(df(Seq(
      ("a", Array(1f, 0f), "ca", Nil), ("b", Array(0f, 1f), "cb", Nil))))
    store.insertDedup(df(Seq(("c", Array(1f, 1f), "cc", Nil)))) // sidecar live
    assert(store.contentIdxValid)
    assert(store.deleteIds(Seq("a", "b", "c")) == 3L)
    // next trigger: rebuild over the EMPTY live snapshot, everything
    // is fresh (deleted contents are re-insertable)
    store.insertDedup(df(Seq(
      ("a2", Array(1f, 0f), "ca", Nil), ("d", Array(2f, 0f), "cd", Nil))))
    assert(store.table().select("id").collect().map(_.getString(0)).toSet
      == Set("a2", "d"))
    // and the rebuilt sidecar keeps deduping
    store.insertDedup(df(Seq(("d2", Array(2f, 0f), "cd", Nil))))
    assert(store.table().count() == 2)
    store.clear()
  }

  test("deleteIds rejects mixed or unsupported element types up front (ADVICE r9 #1)") {
    val store = freshStore()
    store.insert(df(Seq(("a", Array(1f, 2f), "x", Nil))))
    val mixed = intercept[IllegalArgumentException](store.deleteIds(Seq(1, "a")))
    assert(mixed.getMessage.contains("graft"), s"opaque failure: ${mixed.getMessage}")
    val bad = intercept[IllegalArgumentException](store.deleteIds(Seq(1.5)))
    assert(bad.getMessage.contains("graft"))
    store.clear()
  }

  test("default stream checkpoints are per-source: same source stable, different source distinct (ADVICE r9 #3)") {
    import org.apache.spark.sql.types._
    val store = freshStore()
    val srcA = Files.createTempDirectory("graft-ckpt-a").toString
    val srcB = Files.createTempDirectory("graft-ckpt-b").toString
    def deliver(dir: String, rows: Seq[(String, Array[Float], String, Seq[String])]): Unit =
      df(rows).coalesce(1).write.mode("append").parquet(dir)
    deliver(srcA, Seq(("a1", Array(1f, 0f), "ca", Seq("s"))))
    deliver(srcB, Seq(("b1", Array(0f, 1f), "cb", Seq("s"))))
    val schema = StructType(Seq(
      StructField("id", StringType),
      StructField("vector", ArrayType(FloatType, containsNull = true)),
      StructField("content", StringType),
      StructField("tags", ArrayType(StringType, containsNull = true))))
    def ckptDirs(): Set[String] = {
      val d = new java.io.File(s"${store.root}/_checkpoints")
      if (!d.exists) Set.empty else d.listFiles().map(_.getName).toSet
    }
    store.insertStream(spark.readStream.schema(schema).parquet(srcA))
      .awaitTermination()
    val afterA = ckptDirs()
    assert(afterA.size == 1, s"expected one checkpoint dir, got $afterA")
    // same source re-started: checkpoint key must be STABLE (resume
    // keeps working) — no new dir, and the already-committed file is
    // not replayed into a duplicate append
    store.insertStream(spark.readStream.schema(schema).parquet(srcA))
      .awaitTermination()
    assert(ckptDirs() == afterA, "same source must reuse its checkpoint")
    assert(store.table().count() == 1, "replay against the resumed ledger duplicated rows")
    // a different source gets its own ledger
    store.insertStream(spark.readStream.schema(schema).parquet(srcB))
      .awaitTermination()
    assert(ckptDirs().size == 2, s"distinct sources must not share a checkpoint: ${ckptDirs()}")
    assert(store.table().count() == 2)
    store.clear()
    // GRANDFATHERING (review-pass r10 #1): a store already carrying
    // the pre-r10 fixed-name ledger keeps it — else its offsets would
    // be abandoned and the whole source replayed into duplicates
    val store2 = freshStore()
    assert(new java.io.File(s"${store2.root}/_checkpoints").mkdirs())
    assert(new java.io.File(s"${store2.root}/_checkpoints/ingest").mkdirs())
    store2.insertStream(spark.readStream.schema(schema).parquet(srcA))
      .awaitTermination()
    val dirs2 = new java.io.File(s"${store2.root}/_checkpoints").listFiles().map(_.getName).toSet
    assert(dirs2 == Set("ingest"), s"legacy ledger must be reused, got $dirs2")
    assert(store2.table().count() == 1)
    store2.clear()
  }
}
