package graft.operators

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column operators (SURVEY.md §2.6).
  *
  * Media payloads are opaque `binary` columns with typed metadata — the
  * Spark-side plumbing (schema, batch shape, partitioning) is real and
  * tested; the actual byte-level decode is STUBBED deterministically
  * (image/audio codecs are not available in this environment): the stub
  * "parses a header" from the payload's md5, so every engine computes
  * identical metadata and the DuckDB oracle can verify the full
  * distributed pipeline around the decode seam.
  *
  * In production the [[MediaDecoder]] seam is where a real codec slots
  * in: `decodeDataset` already runs it batch-wise per partition
  * (`mapPartitions`), which is the Scala-side equivalent of an Arrow /
  * Pandas-UDF batch — amortized per-batch setup, no per-row codec init.
  */
object Multimodal {

  /** Typed metadata the decode step yields per media payload. */
  final case class MediaMeta(
      byteLen: Long, width: Int, height: Int, nFrames: Int, fmt: String)

  /** Batch decode seam. Implementations must be deterministic per
    * payload and cheap to serialize (broadcast to executors). */
  trait MediaDecoder extends Serializable {
    def decodeBatch(payloads: Iterator[Array[Byte]]): Iterator[MediaMeta]
  }

  /** Deterministic stub decoder: metadata derived from the payload md5
    * ("header bytes"), exactly mirroring [[decodeMetaCols]]. A real
    * decoder (libjpeg/ffmpeg/...) replaces this object only.
    */
  object StubMediaDecoder extends MediaDecoder {
    override def decodeBatch(payloads: Iterator[Array[Byte]]): Iterator[MediaMeta] = {
      // one digest instance per batch — the amortization the batch
      // shape exists for
      val md = MessageDigest.getInstance("MD5")
      payloads.map { bytes =>
        md.reset()
        val h = md.digest(bytes).map("%02x".format(_)).mkString
        MediaMeta(
          byteLen = bytes.length.toLong,
          width = 16 + hexByte(h, 0),
          height = 16 + hexByte(h, 2),
          nFrames = 1 + hexByte(h, 4) % 120,
          fmt = fmtName(hexByte(h, 6) % 3))
      }
    }
    private def hexByte(h: String, i: Int): Int =
      Integer.parseInt(h.substring(i, i + 2), 16)
    private def fmtName(i: Int): String = i match {
      case 0 => "jpeg"; case 1 => "png"; case _ => "webp"
    }
  }

  /** Typed-Dataset decode plumbing: batch-decode payloads per
    * partition. Partitioning is preserved (map-only, no shuffle) and
    * the decoder is instantiated once per partition batch.
    */
  def decodeDataset(
      media: Dataset[(Long, Array[Byte])],
      decoder: MediaDecoder = StubMediaDecoder): Dataset[(Long, MediaMeta)] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val (ids, payloads) = it.duplicate
      ids.map(_._1).zip(decoder.decodeBatch(payloads.map(_._2)))
    }
  }

  // --- column-expression twin of the stub (portable to the oracle) ---

  private def hexByteCol(h: Column, i: Int): Column =
    conv(substring(h, i + 1, 2), 16, 10).cast("int")

  /** Frame count of the stub decode, as a standalone column (kept in
    * exact sync with [[decodeMetaCols]]'s `n_frames`). */
  private def nFramesCol(payload: Column): Column =
    lit(1) + hexByteCol(md5(payload), 4) % 120

  /** Stub-decode metadata as pure columns over a binary payload. */
  private def decodeMetaCols(payload: Column): Seq[Column] = {
    val h = md5(payload)
    val b3 = hexByteCol(h, 6) % 3
    Seq(
      length(payload).cast("long").as("byte_len"),
      (lit(16) + hexByteCol(h, 0)).as("width"),
      (lit(16) + hexByteCol(h, 2)).as("height"),
      nFramesCol(payload).as("n_frames"),
      when(b3 === 0, "jpeg").when(b3 === 1, "png").otherwise("webp").as("fmt"))
  }

  /** The documents table viewed as a media table: payload is the text's
    * bytes (a stand-in for real image/audio blobs with the same
    * schema). */
  def mediaTable(t: Tables): DataFrame =
    t.documents.select(col("doc_id"), col("text").cast("binary").as("payload"))

  /** M1 — `mm_decode_meta`: binary payload → typed metadata struct via
    * the stub decode. Map-only; at scale this is the schema/shape of a
    * real decode pass (binary in, fixed-width typed columns out).
    */
  def mmDecodeMeta(t: Tables): DataFrame =
    mediaTable(t).select(col("doc_id") +: decodeMetaCols(col("payload")): _*)

  /** M2 — `mm_frame_sample`: every 5th frame index per media row
    * (explode of a bounded sequence — the standard frame-sampling
    * shape), with a deterministic per-frame fingerprint.
    *
    * Map-only: `n_frames` is a pure function of the payload, so it is
    * computed inline on the payload scan — no join back to the
    * metadata (the round-2 version re-joined the media table to
    * metadata derived from it, shuffling the full binary corpus to
    * pick up a value each row already determines).
    */
  /** M3 — `mm_resize_plan`: the decode-batch planner — per (format,
    * log2 size band), how many media rows land there, their byte
    * volume, and the total output pixels after fit-to-`maxSide`
    * downscale (never upscaled; `floor` sizing avoids the cross-engine
    * round-half hazard on exact rational scales). This is the grouping
    * a real pipeline uses to bin payloads into codec batches of
    * similar cost. Map-only metadata + one small aggregation shuffle
    * keyed by (fmt, band).
    */
  def mmResizePlan(t: Tables, maxSide: Int = 224): DataFrame = {
    val m = greatest(col("width"), col("height")).cast("double")
    val scale = least(lit(1.0), lit(maxSide) / m)
    mmDecodeMeta(t)
      .withColumn("target_w", floor(col("width") * scale).cast("int"))
      .withColumn("target_h", floor(col("height") * scale).cast("int"))
      .groupBy(col("fmt"), floor(log2(col("byte_len"))).cast("long").as("len_bucket"))
      .agg(count(lit(1)).as("n_media"),
        sum(col("byte_len")).as("total_bytes"),
        sum((col("target_w") * col("target_h")).cast("long")).as("total_pixels"))
  }

  def mmFrameSample(t: Tables): DataFrame =
    mediaTable(t)
      .select(col("doc_id"), col("payload"),
        explode(sequence(lit(0), nFramesCol(col("payload")) - 1, lit(5)))
          .as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        md5(concat(col("payload").cast("string"), lit(":"),
          col("frame_idx").cast("string"))).as("frame_hash"))
}
