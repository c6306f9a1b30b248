package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: treat image/audio/video payloads as opaque
  * binary columns with typed metadata and run decode / feature-extract as
  * a BATCHED per-partition stage (the Scala analog of `mapInPandas`:
  * rows are grouped into fixed-size batches so a real decoder would
  * amortize model/codec state per batch, not per row).
  *
  * Decoders are pluggable ([[MediaDecoder]]): [[StubDecoder]] keeps the
  * deterministic byte-statistics fake (oracle-parity arm — this container
  * has no image/audio libraries), and [[PngHeaderDecoder]] is a REAL
  * stdlib-only byte parser (PNG signature + big-endian IHDR fields +
  * CRC-32 chunk verification, the integrity check Pillow's `img.verify()`
  * performs — reference analog
  * SearchingS3Buckets/S3LookThrough_Final.py:49-57). Everything
  * Spark-side is real for both arms: schema, partitioning (narrow stage,
  * no shuffle), batch shape, and the feature-vector output column.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])
  final case class DecodedRow(doc_id: Long, media_type: String,
      n_bytes: Int, batch_size: Int, features: Array[Double])

  val FeatureDim = 8

  /** A batch-at-a-time media decoder: the batch is the unit a codec or
    * model would process at once (decoder state amortizes per batch /
    * per partition, never per row).
    */
  trait MediaDecoder extends Serializable {
    def decodeBatch(batch: Seq[MediaRow]): Seq[DecodedRow]
  }

  /** STUB decoder — deterministic fake features from byte statistics.
    * A real deployment replaces exactly this object; accumulation is
    * double-precision in ascending byte order, so the result is portable
    * arithmetic an external oracle can reproduce.
    */
  object StubDecoder extends MediaDecoder {
    def decodeBatch(batch: Seq[MediaRow]): Seq[DecodedRow] = {
      val bs = batch.size
      batch.map { r =>
        val feats = new Array[Double](FeatureDim)
        var i = 0
        while (i < r.payload.length) {
          feats(i % FeatureDim) += (r.payload(i) & 0xff) / 255.0
          i += 1
        }
        val n = math.max(1, r.payload.length / FeatureDim)
        DecodedRow(r.doc_id, r.media_type, r.payload.length, bs,
          feats.map(_ / n))
      }
    }
  }

  /** REAL decoder arm: parses actual PNG bytes with only the JDK.
    * Checks the 8-byte signature, reads the IHDR chunk's big-endian
    * width/height and bit-depth/color-type bytes, and verifies the
    * chunk's CRC-32 (computed over chunk type + data, per the PNG spec)
    * with java.util.zip.CRC32. Feature layout (fixed [[FeatureDim]]
    * doubles so the stage schema is decoder-independent):
    * [sig_ok, width, height, bit_depth, color_type, crc_ok, 0, 0];
    * a bad signature yields [0, -1, -1, -1, -1, -1, 0, 0] — the query
    * layer maps sentinels back to typed NULLs.
    */
  object PngHeaderDecoder extends MediaDecoder {
    private val Signature =
      Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

    private def be32(b: Array[Byte], off: Int): Long =
      ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
        ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

    def decodeBatch(batch: Seq[MediaRow]): Seq[DecodedRow] = {
      val bs = batch.size
      val crc = new java.util.zip.CRC32 // amortized per batch
      batch.map { r =>
        val b = r.payload
        val feats = new Array[Double](FeatureDim)
        val sigOk = b.length >= 33 &&
          java.util.Arrays.equals(b, 0, 8, Signature, 0, 8)
        if (!sigOk) {
          feats(0) = 0.0
          java.util.Arrays.fill(feats, 1, 6, -1.0)
        } else {
          // IHDR layout after the signature: len(4) type(4) data(13) crc(4)
          val dataLen = be32(b, 8).toInt
          val w = be32(b, 16)
          val h = be32(b, 20)
          val depth = b(24) & 0xff
          val color = b(25) & 0xff
          val crcOk = dataLen >= 0 && b.length >= 16 + dataLen + 4 && {
            crc.reset()
            crc.update(b, 12, 4 + dataLen) // chunk type + data
            crc.getValue == be32(b, 16 + dataLen)
          }
          feats(0) = 1.0; feats(1) = w.toDouble; feats(2) = h.toDouble
          feats(3) = depth.toDouble; feats(4) = color.toDouble
          feats(5) = if (crcOk) 1.0 else 0.0
        }
        DecodedRow(r.doc_id, r.media_type, b.length, bs, feats)
      }
    }
  }

  /** The batched decode stage: binary rows -> grouped(batchSize) ->
    * decode -> feature rows. Narrow (partitioning preserved); decoder
    * state is built once per partition/batch.
    */
  def decodeFeatures(spark: SparkSession, media: DataFrame,
      batchSize: Int = 64,
      decoder: MediaDecoder = StubDecoder): Dataset[DecodedRow] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.grouped(batchSize).flatMap(g => decoder.decodeBatch(g.toSeq))
    }
  }

  /** Build an opaque media table from the documents table (payload =
    * UTF-8 bytes standing in for encoded media; metadata typed).
    */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select($"doc_id",
      when(pmod($"doc_id", lit(3)) === 0, "image/png")
        .when(pmod($"doc_id", lit(3)) === 1, "audio/wav")
        .otherwise("video/mp4").as("media_type"),
      encode($"text", "UTF-8").as("payload"))
  }

  /** Deterministic REAL PNG header bytes for doc_id: the 8-byte
    * signature, a spec-valid IHDR (width = 1 + id % 640,
    * height = 1 + id % 480, bit depth 8, color type from the spec-legal
    * set {0,2,3,4,6} by id % 5, compression/filter/interlace 0) and its
    * correct CRC-32 — then two deterministic corruption families so the
    * parser's validity arms are exercised: id % 11 == 0 flips a
    * signature byte; else id % 13 == 0 flips the CRC's last byte.
    */
  def pngBytes(docId: Long): Array[Byte] = {
    val w = (1 + docId % 640).toInt
    val h = (1 + docId % 480).toInt
    val color = Array(0, 2, 3, 4, 6)((docId % 5).toInt)
    val out = new Array[Byte](33)
    val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    var i = 0
    while (i < 8) { out(i) = sig(i).toByte; i += 1 }
    def be32(off: Int, v: Long): Unit = {
      out(off) = ((v >>> 24) & 0xff).toByte
      out(off + 1) = ((v >>> 16) & 0xff).toByte
      out(off + 2) = ((v >>> 8) & 0xff).toByte
      out(off + 3) = (v & 0xff).toByte
    }
    be32(8, 13L) // IHDR data length
    out(12) = 'I'; out(13) = 'H'; out(14) = 'D'; out(15) = 'R'
    be32(16, w.toLong)
    be32(20, h.toLong)
    out(24) = 8 // bit depth
    out(25) = color.toByte
    out(26) = 0; out(27) = 0; out(28) = 0 // compression, filter, interlace
    val crc = new java.util.zip.CRC32
    crc.update(out, 12, 17) // type + 13 data bytes
    be32(29, crc.getValue)
    if (docId % 11 == 0) out(0) = (out(0) ^ 0xff).toByte
    else if (docId % 13 == 0) out(32) = (out(32) ^ 0xff).toByte
    out
  }

  /** Media frame whose payloads are [[pngBytes]] — real bytes the
    * [[PngHeaderDecoder]] round-trips by actual parsing.
    */
  def pngMediaFrom(spark: SparkSession, docIds: DataFrame): DataFrame = {
    import spark.implicits._
    docIds.select($"doc_id".cast("long")).as[Long]
      .map(id => MediaRow(id, "image/png", pngBytes(id)))
      .toDF()
  }
}
