package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Byte-level reader/writer for the reference's on-disk store format —
 * the migration path a real victor user walks in with. Layout (all
 * integers bincode-1.x fixint LITTLE-ENDIAN; collections length-
 * prefixed with u64):
 *
 *  - `index.bin` (reference src/db.rs:51-53, 629-650): bincode of
 *    `Index { files: HashSet<BTreeSet<String>> }` — u64 set count,
 *    then per tag set u64 tag count + (u64 len + utf8) strings.
 *  - `<sha256>.bin` per tag set (src/db.rs:646-650): filename =
 *    sha256 hex of the Rust `Debug` rendering of the SORTED tag vec
 *    (`["a", "b"]`). Content (src/db.rs:413-446, 473-556): u32 header
 *    = per-record byte size, then fixed-size records of bincode
 *    `Embedding { id: Uuid, vector }`:
 *      - Uuid (uuid 1.4.1 non-human-readable serde) = serialize_bytes
 *        -> u64 len (16) + the 16 RFC bytes;
 *      - vector stored via the 8-bit codec (src/packed_vector.rs:4-35
 *        `PackedVector { data: Vec<u8>, min: f32, max: f32 }`) ->
 *        u64 d + d bytes + min f32 + max f32.
 *    Record size for dimension d = 24 + (8 + d + 8) = d + 40.
 *  - `content.bin` (src/db.rs:557-605): bincode
 *    `HashMap<Uuid, String>` — u64 count + (uuid, u64 len + utf8).
 *  - `eigen.bin` (src/db.rs:38-42, written :369-392): bincode of
 *    `VectorProjection { eigen: DMatrix<f32>, means: Vec<f32> }` —
 *    see [[readProjection]] for the pinned nalgebra-0.32/bincode-1
 *    byte layout. In the reference its EXISTENCE is the projected
 *    flag (src/db.rs:233-237) and projection rewrites every vector
 *    file to k=500 (src/db.rs:301-367), so a projected store is
 *    dimensionally self-consistent — the vectors are PCA-space
 *    coordinates, not raw embeddings, and no downstream dimension
 *    check can catch that. [[importStore]] (the DataFrame-level
 *    API, which returns vectors without the basis) therefore probes
 *    for `eigen.bin` and refuses loudly unless the caller passes
 *    `acceptProjected = true`;
 *    [[graft.operators.VectorStore.importVictor]] instead ADOPTS
 *    the parsed basis so the migrated store keeps the reference's
 *    projected-mode semantics (raw queries projected at search
 *    time).
 *
 * Cross-validation without a Rust toolchain: the reference's OWN unit
 * test pins the codec byte sizes (src/packed_vector.rs:63-79 — a
 * 1024-dim PackedVector serializes to exactly 1040 bytes) and the
 * pack/unpack golden values (zeros/ones/alternating round-trip
 * exactly); VictorBinSpec asserts this writer/reader reproduces both.
 *
 * Scale note: tag-set files parse DISTRIBUTED (binaryFile source +
 * per-file flatMap — one task per tag-set file, the format's own
 * parallelism grain). `index.bin`/`content.bin` are single bincode
 *  blobs BY THE FORMAT'S OWN DESIGN (a browser-origin store) — they
 * parse on one task each; a corpus that outgrows that has outgrown
 * the format, which is what [[graft.operators.VectorStore]] is for.
 */
object VictorBin {

  // ---- byte-level primitives ----------------------------------------

  private def buf(bytes: Array[Byte]): ByteBuffer =
    ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)

  private def readU64(b: ByteBuffer): Long = {
    val v = b.getLong
    require(v >= 0 && v <= Int.MaxValue, s"graft: victor length out of range: $v")
    v
  }

  private def readString(b: ByteBuffer): String = {
    val n = readU64(b).toInt
    val a = new Array[Byte](n)
    b.get(a)
    new String(a, StandardCharsets.UTF_8)
  }

  private def readUuid(b: ByteBuffer): String = {
    val n = readU64(b)
    require(n == 16, s"graft: victor uuid length $n != 16")
    // RFC byte order = big-endian halves, regardless of the file's LE
    // integer encoding (serialize_bytes writes the raw 16 bytes)
    val be = b.duplicate().order(ByteOrder.BIG_ENDIAN)
    val hi = be.getLong(b.position())
    val lo = be.getLong(b.position() + 8)
    b.position(b.position() + 16)
    new java.util.UUID(hi, lo).toString
  }

  private def writeU64(b: java.io.ByteArrayOutputStream, v: Long): Unit = {
    val t = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
    t.putLong(v); b.write(t.array())
  }

  private def writeString(b: java.io.ByteArrayOutputStream, s: String): Unit = {
    val a = s.getBytes(StandardCharsets.UTF_8)
    writeU64(b, a.length.toLong); b.write(a, 0, a.length)
  }

  private def writeUuid(b: java.io.ByteArrayOutputStream, id: String): Unit = {
    val u = java.util.UUID.fromString(id)
    writeU64(b, 16L)
    val t = ByteBuffer.allocate(16) // big-endian RFC bytes
    t.putLong(u.getMostSignificantBits); t.putLong(u.getLeastSignificantBits)
    b.write(t.array())
  }

  // ---- the 8-bit codec (src/packed_vector.rs:10-35, f32 arithmetic) --

  private[graft] def packBytes(vec: Array[Float]): Array[Byte] = {
    var mn = Float.PositiveInfinity; var mx = Float.NegativeInfinity
    vec.foreach { v => if (v < mn) mn = v; if (v > mx) mx = v }
    val out = new java.io.ByteArrayOutputStream()
    writeU64(out, vec.length.toLong)
    vec.foreach { v =>
      val normalized = (v - mn) / (mx - mn) // f32 ops, like the reference
      val q = math.round(normalized * 255.0f).toFloat
      out.write(math.max(0f, math.min(255f, q)).toInt)
    }
    val t = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
    t.putFloat(mn); t.putFloat(mx); out.write(t.array())
    out.toByteArray
  }

  private def unpackVec(b: ByteBuffer): Array[Float] = {
    val d = readU64(b).toInt
    val data = new Array[Byte](d)
    b.get(data)
    val mn = b.getFloat; val mx = b.getFloat
    val out = new Array[Float](d)
    var i = 0
    while (i < d) {
      val normalized = (data(i) & 0xff).toFloat / 255.0f
      out(i) = mn + normalized * (mx - mn)
      i += 1
    }
    out
  }

  // ---- filenames (src/db.rs:646-650) ---------------------------------

  /** Rust `Debug` rendering of a Vec<String> (`["a", "b"]`), limited
    * to the escapes tags realistically carry; exotic control chars
    * would need Rust's full char::escape_debug and are rejected
    * loudly rather than silently mis-hashed. */
  private def rustDebugVec(tags: Seq[String]): String =
    tags.map { t =>
      require(t.forall(c => c >= 0x20 && c != 0x7f),
        s"graft: victor tag with control chars unsupported: ${t.take(20)}")
      "\"" + t.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    }.mkString("[", ", ", "]")

  def filenameForTags(tags: Seq[String]): String = {
    val input = rustDebugVec(tags.sorted)
    val d = java.security.MessageDigest.getInstance("SHA-256")
      .digest(input.getBytes(StandardCharsets.UTF_8))
    d.map("%02x".format(_)).mkString + ".bin"
  }

  // ---- index.bin ------------------------------------------------------

  /** The indexed tag sets (driver-side: the index is KBs by design). */
  def readIndex(dir: String): Seq[Seq[String]] = {
    val p = java.nio.file.Paths.get(dir, "index.bin")
    if (!java.nio.file.Files.exists(p) || java.nio.file.Files.size(p) == 0L)
      return Seq.empty
    val b = buf(java.nio.file.Files.readAllBytes(p))
    val nSets = readU64(b).toInt
    (0 until nSets).map { _ =>
      val m = readU64(b).toInt
      (0 until m).map(_ => readString(b))
    }
  }

  private def writeIndex(dir: String, sets: Seq[Seq[String]]): Unit = {
    val out = new java.io.ByteArrayOutputStream()
    writeU64(out, sets.size.toLong)
    sets.foreach { s =>
      writeU64(out, s.size.toLong)
      s.sorted.foreach(writeString(out, _))
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "index.bin"),
      out.toByteArray)
  }

  // ---- tag-set db files ----------------------------------------------

  private[graft] def parseDbFile(bytes: Array[Byte]): Iterator[(String, Array[Float])] = {
    if (bytes.isEmpty) return Iterator.empty
    val b = buf(bytes)
    val recSize = b.getInt
    require(recSize > 40, s"graft: victor record size $recSize too small")
    require((bytes.length - 4) % recSize == 0,
      s"graft: victor db file ${bytes.length - 4} bytes not a multiple of record size $recSize")
    val n = (bytes.length - 4) / recSize
    (0 until n).iterator.map { i =>
      b.position(4 + i * recSize)
      val id = readUuid(b)
      val vec = unpackVec(b)
      require(b.position() - (4 + i * recSize) == recSize,
        s"graft: victor record $i consumed ${b.position() - (4 + i * recSize)} bytes, header says $recSize")
      (id, vec)
    }
  }

  private val embSchema = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("vector", ArrayType(FloatType, containsNull = false), nullable = false),
    StructField("tags", ArrayType(StringType, containsNull = false), nullable = false)))

  /** All embeddings with their tag sets — DISTRIBUTED: one binaryFile
    * task per tag-set file, executor-side record parse. */
  def embeddings(spark: SparkSession, dir: String): DataFrame = {
    val sets = readIndex(dir)
    if (sets.isEmpty)
      return spark.createDataFrame(spark.sparkContext.emptyRDD[Row], embSchema)
    val byName: Map[String, Seq[String]] =
      sets.map(s => filenameForTags(s) -> s.sorted).toMap
    val files = byName.keys.map(n => s"$dir/$n").toSeq
    val bc = spark.sparkContext.broadcast(byName)
    val parsed = spark.read.format("binaryFile").load(files: _*)
      .select(col("path"), col("content"))
      .rdd.flatMap { r =>
        val name = r.getString(0).split('/').last
        val tags = bc.value(name)
        parseDbFile(r.getAs[Array[Byte]](1)).map { case (id, vec) =>
          Row(id, vec.toSeq, tags)
        }
      }
    spark.createDataFrame(parsed, embSchema)
  }

  // ---- content.bin ----------------------------------------------------

  /** (id, content) pairs. One task: the format keeps ALL content in a
    * single bincode HashMap blob (src/db.rs:557-581) — that is the
    * format's constraint, not this reader's. */
  def contents(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val p = java.nio.file.Paths.get(dir, "content.bin")
    if (!java.nio.file.Files.exists(p) || java.nio.file.Files.size(p) == 0L)
      return Seq.empty[(String, String)].toDF("id", "content")
    val b = buf(java.nio.file.Files.readAllBytes(p))
    val n = readU64(b).toInt
    (0 until n).map { _ => (readUuid(b), readString(b)) }.toDF("id", "content")
  }

  /** True iff the victor store at `dir` has been PCA-projected — in
    * the reference, `eigen.bin` existence IS the projected flag
    * (src/db.rs:233-237). An empty file still counts: the reference
    * only ever writes it atomically after a successful fit, but a
    * truncated one is corrupt-projected, not raw. */
  def isProjected(dir: String): Boolean =
    java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "eigen.bin"))

  /** Parse `eigen.bin` into the store's projection model. Layout =
    * bincode-1 fixint LE of
    * `VectorProjection { eigen: DMatrix<f32>, means: Vec<f32> }`
    * (reference src/db.rs:38-42, written src/db.rs:369-392):
    * nalgebra 0.32's Matrix serde serializes ONLY its storage
    * (matrix.rs `Serialize` impl delegates to `self.data`), and
    * `VecStorage` is a serde-derived struct with field order
    * (data: Vec<f32>, nrows: Dyn, ncols: Dyn) where `Dyn` is a
    * usize newtype — so the bytes are: u64 n (= d*k), n f32s in
    * COLUMN-MAJOR order (VecStorage layout), u64 nrows (= d), u64
    * ncols (= k), then the means vec: u64 d + d f32s. The eigen
    * matrix is d x k with projected = (x - means) · eigen
    * (src/db.rs:456-469), i.e. exactly [[graft.operators.Pca.Model]]
    * with basis(i)(j) = data(j*d + i). Validates the internal
    * redundancy loudly: n == nrows*ncols, means length == nrows,
    * nrows > ncols (a basis at least as wide as the input is not a
    * projection), zero trailing bytes. */
  def readProjection(dir: String): graft.operators.Pca.Model = {
    val p = java.nio.file.Paths.get(dir, "eigen.bin")
    require(java.nio.file.Files.exists(p), s"graft: no eigen.bin under $dir")
    val b = buf(java.nio.file.Files.readAllBytes(p))
    val n = readU64(b).toInt
    val data = new Array[Float](n)
    var i = 0
    while (i < n) { data(i) = b.getFloat; i += 1 }
    val d = readU64(b).toInt
    val k = readU64(b).toInt
    require(n == d * k,
      s"graft: corrupt eigen.bin — data length $n != nrows $d * ncols $k")
    require(d > k,
      s"graft: corrupt eigen.bin — basis $d x $k is not a projection (nrows must exceed ncols)")
    val nMeans = readU64(b).toInt
    require(nMeans == d,
      s"graft: corrupt eigen.bin — means length $nMeans != input dimension $d")
    val means = new Array[Double](d)
    i = 0
    while (i < d) { means(i) = b.getFloat.toDouble; i += 1 }
    require(b.remaining() == 0,
      s"graft: corrupt eigen.bin — ${b.remaining()} trailing bytes")
    val basis = Array.tabulate(d, k)((r, c) => data(c * d + r).toDouble)
    graft.operators.Pca.Model(basis, means)
  }

  /** Write a projection model AS `eigen.bin` (inverse of
    * [[readProjection]] — export symmetry + round-trip validation).
    * f64 -> f32 narrowing matches the reference's f32 store. */
  def writeProjection(dir: String, model: graft.operators.Pca.Model): Unit = {
    val out = new java.io.ByteArrayOutputStream()
    val d = model.d; val k = model.k
    require(d > k, s"graft: basis $d x $k is not a projection")
    writeU64(out, (d * k).toLong)
    val t = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
    var c = 0
    while (c < k) { // column-major, VecStorage layout
      var r = 0
      while (r < d) {
        t.clear(); t.putFloat(model.basis(r)(c).toFloat)
        out.write(t.array(), 0, 4)
        r += 1
      }
      c += 1
    }
    writeU64(out, d.toLong); writeU64(out, k.toLong)
    writeU64(out, d.toLong)
    var i = 0
    while (i < d) {
      t.clear(); t.putFloat(model.means(i).toFloat)
      out.write(t.array(), 0, 4)
      i += 1
    }
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "eigen.bin"), out.toByteArray)
  }

  /** The full store as (id, vector, content, tags) — left join so
    * content-less embeddings survive with null content (the reference
    * panics on a missing id at lookup time; a migration should carry
    * the row and let the user decide).
    *
    * Refuses a PCA-projected store (`eigen.bin` present): its vector
    * files hold k-dim PCA-space coordinates that would silently serve
    * wrong similarities to raw-space cosine queries. Pass
    * `acceptProjected = true` only if you will project every future
    * query through the same basis yourself. */
  def importStore(spark: SparkSession, dir: String,
      acceptProjected: Boolean = false): DataFrame = {
    require(acceptProjected || !isProjected(dir),
      s"graft: victor store at $dir is PCA-projected (eigen.bin present; reference src/db.rs:233-237) — " +
        "its vectors are projection-space coordinates, not raw embeddings, and importing them would " +
        "silently serve wrong similarities; re-export an unprojected store, or pass acceptProjected=true " +
        "and project all queries through the same basis yourself")
    embeddings(spark, dir).join(contents(spark, dir), Seq("id"), "left")
      .select("id", "vector", "content", "tags")
  }

  // ---- writer (round-trip validation + export-back) -------------------

  /** Export (id, vector, content, tags) rows AS the victor format.
    * Driver-side by necessity: the format is a single-directory,
    * single-content-blob layout from a browser database — exporting
    * TO it only makes sense at the reference's own (single-node)
    * scale, and the writer enforces that by collecting. The row limit
    * guards a miscalled corpus-sized export. */
  def export(df: DataFrame, dir: String, maxRows: Int = 1000000): Unit = {
    val rows = df.select(col("id"), col("vector").cast("array<float>"),
        col("content"), col("tags")).limit(maxRows + 1).collect()
    require(rows.length <= maxRows,
      s"graft: victor export is single-node by format design; > $maxRows rows — use the parquet store instead")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    val byTags = rows.groupBy(r => r.getSeq[String](3).sorted.toList)
    writeIndex(dir, byTags.keys.map(_.toSeq).toSeq)
    for ((tags, rs) <- byTags) {
      val out = new java.io.ByteArrayOutputStream()
      val recs = rs.map { r =>
        val rec = new java.io.ByteArrayOutputStream()
        writeUuid(rec, r.getString(0))
        val pv = packBytes(r.getSeq[Float](1).toArray)
        rec.write(pv, 0, pv.length)
        rec.toByteArray
      }
      val sizes = recs.map(_.length).distinct
      require(sizes.size == 1,
        s"graft: victor export needs one dimension per store, got record sizes $sizes")
      val t = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
      t.putInt(sizes.head)
      out.write(t.array()); recs.foreach(a => out.write(a, 0, a.length))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, filenameForTags(tags)), out.toByteArray)
    }
    val cb = new java.io.ByteArrayOutputStream()
    val withContent = rows.filter(!_.isNullAt(2))
    writeU64(cb, withContent.length.toLong)
    withContent.foreach { r => writeUuid(cb, r.getString(0)); writeString(cb, r.getString(2)) }
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "content.bin"),
      cb.toByteArray)
  }
}
