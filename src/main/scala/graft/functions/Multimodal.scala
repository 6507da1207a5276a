package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column conventions: media payloads travel as opaque
  * `binary` columns next to typed metadata, and decode/feature steps
  * run batched per partition.
  *
  * The container has no image/audio codecs, so `decodeStub` is a
  * clearly-marked deterministic fake — but the Spark-side plumbing
  * (schema, binary payloads, partition-batched processing, feature
  * schema) is real and tested. On a real cluster the stub body is
  * replaced by an Arrow-batched decode (mapInPandas / a JNI codec);
  * the dataflow shape is identical.
  */
object Multimodal {

  /** One media item: payload + typed metadata. */
  case class MediaItem(media_id: Long, kind: String, bytes: Array[Byte], n_bytes: Long)

  /** Extracted features (stub schema: byte stats stand in for pixels/
    * samples). */
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
                           byte_sum: Long, byte_mean: Double, head_word: Long)

  /** Wrap a text corpus as media rows: payload = UTF-8 bytes. Stands
    * in for image/audio blobs in this container. */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      lit("text/plain").as("kind"),
      encode(col("text"), "UTF-8").as("bytes"),
      octet_length(col("text")).cast("long").as("n_bytes")
    )

  /** STUB decode / feature extraction — deterministic fake features
    * (byte histogram stats) in place of a real codec. Runs batched per
    * partition via mapPartitions: the executor-side iteration shape a
    * real decoder needs (amortized codec init per partition, no
    * per-row dispatch). */
  def decodeStub(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaItem].mapPartitions { it =>
      // real impl: init codec once per partition here
      it.map { m =>
        var sum = 0L
        var i = 0
        while (i < m.bytes.length) { sum += (m.bytes(i) & 0xff); i += 1 }
        val mean = if (m.bytes.length == 0) 0d else sum.toDouble / m.bytes.length
        var head = 0L
        var j = 0
        while (j < math.min(4, m.bytes.length)) { head = (head << 8) | (m.bytes(j) & 0xff); j += 1 }
        MediaFeatures(m.media_id, m.kind, m.n_bytes, sum, mean, head)
      }
    }
  }
}
