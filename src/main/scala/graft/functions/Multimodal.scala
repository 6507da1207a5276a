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

  /** FRAME SAMPLING over the raw payload: a `frameSize`-byte frame
    * every `stride` bytes — the video-style every-nth-frame access
    * pattern, expressed on the binary column itself (substring on
    * binary is codegen'd; no codec needed to LOCATE frames when the
    * container format is fixed-rate, which is exactly when frame
    * sampling is cheap). Output: (media_id, frame_idx, frame) with
    * one row per sampled frame; the final short frame is kept
    * truncated (substring clamps). Scale shape: pure map-side
    * explode — a 100 TB payload column never shuffles, and column
    * pruning keeps un-sampled bytes unread where the source splits
    * frames across files/row groups. */
  def sampleFrames(media: DataFrame, frameSize: Int, stride: Int): DataFrame = {
    require(frameSize > 0 && stride > 0)
    media
      .filter(col("n_bytes") > 0)
      .select(col("media_id"),
        posexplode(expr(
          s"transform(sequence(0, int((n_bytes - 1) DIV $stride)), i -> substring(bytes, i * $stride + 1, $frameSize))")))
      .select(col("media_id"), col("pos").cast("long").as("frame_idx"), col("col").as("frame"))
  }

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
