package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: treat image/audio/video payloads as opaque
  * binary columns with typed metadata and run decode / feature-extract as
  * a BATCHED per-partition stage (the Scala analog of `mapInPandas`:
  * rows are grouped into fixed-size batches so a real decoder would
  * amortize model/codec state per batch, not per row).
  *
  * The decode itself is STUBBED with a deterministic fake (this container
  * has no image/audio libraries — marked clearly below); everything
  * Spark-side is real: schema, partitioning (narrow stage, no shuffle),
  * batch shape, and the feature-vector output column.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])
  final case class DecodedRow(doc_id: Long, media_type: String,
      n_bytes: Int, batch_size: Int, features: Array[Double])

  val FeatureDim = 8

  /** STUB decoder — deterministic fake features from byte statistics.
    * A real deployment replaces exactly this function with an image/audio
    * decoder; the batch is the unit a codec/model would process at once.
    * Accumulation is double-precision in ascending byte order, so the
    * result is portable arithmetic an external oracle can reproduce.
    */
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

  /** The batched decode stage: binary rows -> grouped(batchSize) ->
    * decode -> feature rows. Narrow (partitioning preserved); decoder
    * state would be built once per partition here.
    */
  def decodeFeatures(spark: SparkSession, media: DataFrame,
      batchSize: Int = 64): Dataset[DecodedRow] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.grouped(batchSize).flatMap(g => decodeBatch(g.toSeq))
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
}
