package graft.operators

import org.apache.spark.sql.{Dataset, SparkSession}

/** Multimodal column handling for training-data pipelines: image /
  * audio / video payloads ride as opaque `binary` columns with a typed
  * metadata struct, and per-item decode / feature-extraction runs as
  * `mapPartitions` over the typed Dataset — the Scala analogue of a
  * batched pandas UDF: per-partition one-time decoder init (where a
  * real codec/model would load), then a lazy per-row loop, so memory
  * stays at O(row) and the expensive init amortizes across the
  * partition.
  *
  * The byte-level decode itself is a STUB (this container has no
  * image/audio codecs): `FakeDecoder` produces deterministic
  * pseudo-features from the payload bytes. Everything around it —
  * schema, encoders, partitioning, batch shape, lazy iteration — is
  * the real production plumbing a codec would drop into.
  */
object Multimodal {

  final case class MediaMeta(
      width: Int, height: Int, format: String, duration_ms: Long)

  final case class MediaFile(
      media_id: Long, kind: String, payload: Array[Byte], meta: MediaMeta)

  final case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Long,
      payload_sha256: String, embedding: Array[Float])

  final case class FrameSample(
      media_id: Long, frame_index: Int, frame_bytes: Array[Byte])

  /** STUB decode boundary: a real implementation plugs a codec/model
    * here (loaded once per partition); this one derives deterministic
    * features from the bytes so tests are stable and shuffle-free.
    */
  final class FakeDecoder {
    def featurize(m: MediaFile, dim: Int): MediaFeatures = {
      val sha = graft.ingest.Hashing.sha256(m.payload)
      val emb = new Array[Float](dim)
      var h = 1125899906842597L // deterministic seed from payload
      m.payload.foreach(b => h = h * 31 + (b & 0xff))
      var i = 0
      while (i < dim) {
        h = h * 6364136223846793005L + 1442695040888963407L
        emb(i) = ((h >>> 33).toInt % 1000) / 1000.0f
        i += 1
      }
      MediaFeatures(m.media_id, m.kind, m.payload.length.toLong, sha, emb)
    }

    /** STUB frame extraction: fixed-size byte windows stand in for
      * decoded video frames (same batch shape: one row in, many out).
      */
    def sampleFrames(m: MediaFile, frameBytes: Int, everyN: Int): Seq[FrameSample] =
      m.payload.grouped(frameBytes).zipWithIndex
        .filter { case (_, idx) => idx % everyN == 0 }
        .map { case (bytes, idx) => FrameSample(m.media_id, idx, bytes) }
        .toSeq

    /** STUB resize: a real codec would decode, scale, re-encode; the
      * fake scales the payload deterministically (byte sampling) and
      * updates the typed metadata — the metadata/payload contract a
      * codec drops into.
      */
    def resize(m: MediaFile, width: Int, height: Int): MediaFile = {
      val ratio = math.max(1,
        math.round(m.meta.width.toDouble * m.meta.height /
          math.max(1, width * height)).toInt)
      val resized = m.payload.zipWithIndex.collect {
        case (b, i) if i % ratio == 0 => b
      }
      m.copy(payload = resized, meta = m.meta.copy(width = width, height = height))
    }
  }

  /** Real container magic bytes, so format detection reads the payload
    * (not the metadata): PNG signature, RIFF/WAVE header, and the MP4
    * `ftyp` box. Derived as prefixes of the actual header builders so
    * the constants cannot drift from the bytes [[mediaRow]] emits.
    */
  lazy val PngMagic: Array[Byte] = pngHeader(0, 0).take(4)
  lazy val RiffMagic: Array[Byte] = wavHeader(8000).take(4)
  lazy val Mp4Ftyp: Array[Byte] = mp4Header("isom").take(8)

  private def be32(v: Int): Array[Byte] = Array(
    ((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
    ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def le32(v: Int): Array[Byte] = be32(v).reverse
  private def le16(v: Int): Array[Byte] = Array((v & 0xff).toByte, ((v >>> 8) & 0xff).toByte)
  private def ascii(s: String): Array[Byte] = s.getBytes("US-ASCII")

  /** Real PNG file prefix: the 8-byte signature + a structurally valid
    * IHDR chunk — width at byte offset 16 (big-endian), height at 20,
    * then bit depth 8 / color type 6 (RGBA). m02 parses these back
    * out of the BYTES.
    */
  def pngHeader(width: Int, height: Int): Array[Byte] =
    Array(0x89.toByte) ++ ascii("PNG") ++ Array(0x0d.toByte, 0x0a.toByte, 0x1a.toByte, 0x0a.toByte) ++
      be32(13) ++ ascii("IHDR") ++ be32(width) ++ be32(height) ++
      Array[Byte](8, 6, 0, 0, 0)

  /** Real RIFF/WAVE prefix: canonical 16-byte PCM `fmt ` chunk, mono,
    * 16-bit — sample rate at byte offset 24 (little-endian).
    */
  def wavHeader(sampleRate: Int): Array[Byte] =
    ascii("RIFF") ++ le32(36) ++ ascii("WAVE") ++ ascii("fmt ") ++
      le32(16) ++ le16(1) ++ le16(1) ++ le32(sampleRate) ++
      le32(sampleRate * 2) ++ le16(2) ++ le16(16)

  /** Real MP4 `ftyp` box: size 24, major brand at byte offset 8. */
  def mp4Header(brand: String): Array[Byte] =
    be32(24) ++ ascii("ftyp") ++ ascii(brand) ++ be32(0) ++ ascii(brand)

  /** Deterministic per-id WAV sample rate / MP4 brand (embedded in the
    * payload header, parsed back by m02).
    */
  def sampleRateOf(id: Long): Int = 8000 + (id % 4).toInt * 8000
  def brandOf(id: Long): String = if (id % 2 == 0) "isom" else "mp42"

  /** Pure per-id row of the deterministic synthetic media corpus
    * (seeded from media_id; payloads carry a REAL container header —
    * PNG signature + IHDR with the metadata's dimensions, canonical
    * WAVE fmt chunk, MP4 ftyp box — followed by seeded body bytes) —
    * shared by the distributed corpus builder ([[syntheticMedia]]) and
    * the driver-side content digest that addresses the oracle fixture
    * path (MultimodalQueries), so a change here automatically yields a
    * new fixture path instead of silently serving a stale write-once
    * corpus.
    */
  def mediaRow(id: Long): MediaFile = {
    val kind = (id % 3) match {
      case 0 => "image"
      case 1 => "audio"
      case _ => "video"
    }
    val width = 16 + (id % 4).toInt * 16
    val height = 16 + (id % 3).toInt * 16
    val header = kind match {
      case "image" => pngHeader(width, height)
      case "audio" => wavHeader(sampleRateOf(id))
      case _ => mp4Header(brandOf(id))
    }
    val len = 64 + (id % 7).toInt * 32
    val payload = header ++
      Array.tabulate[Byte](len)(i => ((id * 131 + i * 17) % 251).toByte)
    MediaFile(id, kind,
      payload,
      MediaMeta(
        width = width,
        height = height,
        format = if (kind == "image") "png" else if (kind == "audio") "wav" else "mp4",
        duration_ms = if (kind == "image") 0L else 1000L + id % 5000))
  }

  def syntheticMedia(spark: SparkSession, n: Int): Dataset[MediaFile] = {
    import spark.implicits._
    spark.range(n).map(id => mediaRow(id))
  }

  /** Decode + featurize every media item: one decoder per partition,
    * lazy per-row mapping (never materializes a partition in memory).
    */
  def decodeAndFeaturize(ds: Dataset[MediaFile], dim: Int = 16): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      val decoder = new FakeDecoder // per-partition init (codec/model load)
      it.map(m => decoder.featurize(m, dim))
    }
  }

  /** Image resize across the corpus (map shape, per-partition decoder). */
  def resizeImages(
      ds: Dataset[MediaFile],
      width: Int,
      height: Int): Dataset[MediaFile] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      val decoder = new FakeDecoder
      it.map(m => if (m.kind == "image") decoder.resize(m, width, height) else m)
    }
  }

  /** Video frame sampling: one row per kept frame (flatMap shape). */
  def sampleFrames(
      ds: Dataset[MediaFile],
      frameBytes: Int = 32,
      everyN: Int = 2): Dataset[FrameSample] = {
    import ds.sparkSession.implicits._
    ds.filter(_.kind == "video").mapPartitions { it =>
      val decoder = new FakeDecoder
      it.flatMap(m => decoder.sampleFrames(m, frameBytes, everyN))
    }
  }
}
