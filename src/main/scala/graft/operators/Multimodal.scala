package graft.operators

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column operators (SURVEY.md §2.6).
  *
  * Media payloads are opaque `binary` columns with typed metadata. The
  * driver corpus ships no real media blobs, so [[mediaTable]]
  * synthesizes a deterministic payload per document: a REAL image
  * container header — PNG signature + IHDR, JPEG SOI + JFIF APP0 +
  * baseline SOF0, or a GIF89a logical screen descriptor, with
  * dimensions chosen from the text's md5 — followed by the text bytes
  * as the body. The decode side then parses the ACTUAL BYTES: format
  * detected from the signature, dimensions read from the header fields
  * (big-endian u32 for PNG, big-endian u16 behind a SOF0 marker SCAN
  * for JPEG, little-endian u16 for GIF), all as pure column
  * expressions over the binary column — no codec library, exactly the
  * header-sniffing a 100 TB media-ingest pass runs before batching
  * payloads to decoders. The DuckDB oracle recomputes the metadata
  * from the GENERATOR's formulas, so generator-vs-parser is the
  * cross-check: a parser misreading any byte breaks the hash match.
  *
  * Frame counts are REAL too: the GIF payloads are ANIMATED — the
  * generator writes 1..8 frame blocks (Graphic Control Extension +
  * image descriptor + minimal image data, per the public GIF89a
  * spec), and the decode side counts them by walking the fixed-stride
  * block markers (0x21 0xF9 0x04) as column expressions, stopping at
  * the 0x3B trailer. PNG/JPEG are still images and honestly report 1.
  * (True video containers would need codec libs, absent here; the GIF
  * block walk is the same byte-level pattern a frame-table read is.)
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

  // --- container-header layouts (public PNG / JFIF / GIF specs) ---

  /** PNG signature + IHDR chunk length/type; W/H (BE32) follow at
    * bytes 17–24, then bit-depth 8, truecolor, deflate, no filter, no
    * interlace, and a placeholder CRC. */
  private val PngPre: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A, 0, 0, 0, 0x0D,
      'I', 'H', 'D', 'R').map(_.toByte)
  private val PngPost: Array[Byte] = Array[Byte](8, 2, 0, 0, 0, 0, 0, 0, 0)
  private val PngHdrLen = 33

  /** JPEG SOI + 16-byte JFIF APP0 + SOF0 marker/length/precision; the
    * frame HEIGHT then WIDTH (BE16) follow, then 3 component specs. */
  private val JpegPre: Array[Byte] =
    Array(0xFF, 0xD8, 0xFF, 0xE0, 0x00, 0x10, 'J', 'F', 'I', 'F', 0x00,
      0x01, 0x01, 0x00, 0x00, 0x01, 0x00, 0x01, 0x00, 0x00,
      0xFF, 0xC0, 0x00, 0x11, 0x08).map(_.toByte)
  private val JpegPost: Array[Byte] =
    Array(0x03, 0x01, 0x22, 0x00, 0x02, 0x11, 0x01, 0x03, 0x11, 0x01).map(_.toByte)
  private val JpegHdrLen = 39

  /** GIF89a signature; logical screen W/H (LE16) at bytes 7–10, then
    * packed fields / background / aspect. */
  private val GifPre: Array[Byte] = "GIF89a".getBytes(StandardCharsets.US_ASCII)
  private val GifPost: Array[Byte] = Array[Byte](0, 0, 0)
  private val GifHdrLen = 13

  /** One animated-GIF frame block (20 bytes, fixed): Graphic Control
    * Extension `21 F9 04 <packed 00> <delay 4cs LE16> <no transparent>
    * 00` (8 B) + image descriptor `2C <left 0> <top 0> <W LE16>
    * <H LE16> <packed 00>` (10 B) + minimal image data `08 00` (LZW
    * min code size + empty sub-block terminator, 2 B). Fixed size is
    * what lets the parser walk frames at stride 20 from byte 13. */
  private val GifFrameBytes = 20
  private val GifMaxFrames = 8
  private val GifGceHex = "21F9040004000000"
  private val GifDescPreHex = "2C00000000"
  private val GifImgDataHex = "0800"
  private val GifTrailerHex = "3B"

  /** Real header parser over raw bytes — the JVM twin of the column
    * parser, for the typed Dataset path. One digest per partition
    * batch (the amortization the batch shape exists for).
    */
  object HeaderMediaDecoder extends MediaDecoder {
    override def decodeBatch(payloads: Iterator[Array[Byte]]): Iterator[MediaMeta] = {
      payloads.map { bytes =>
        def u8(i: Int): Int = bytes(i) & 0xFF
        def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
        def be32(i: Int): Int = (be16(i) << 16) | be16(i + 2)
        val (fmt, w, h, nf) =
          if (bytes.length >= PngHdrLen && PngPre.indices.forall(i => bytes(i) == PngPre(i)))
            ("png", be32(16), be32(20), 1)
          else if (bytes.length >= 4 && u8(0) == 0xFF && u8(1) == 0xD8) {
            // scan the header region for the SOF0 marker (FF C0): the
            // 2-byte length + precision byte precede height/width
            val limit = math.min(bytes.length - 8, 64)
            val m = (2 until limit).find(i => u8(i) == 0xFF && u8(i + 1) == 0xC0)
              .getOrElse(sys.error("jpeg payload without SOF0 in header region"))
            ("jpeg", be16(m + 7), be16(m + 5), 1)
          } else if (bytes.length >= GifHdrLen && GifPre.indices.forall(i => bytes(i) == GifPre(i))) {
            // animated GIF: count fixed-stride frame blocks by their
            // GCE signature until the 3B trailer stops the walk
            val frames = Iterator.from(0)
              .takeWhile { k =>
                val o = GifHdrLen + k * GifFrameBytes
                o + 2 < bytes.length && u8(o) == 0x21 && u8(o + 1) == 0xF9 && u8(o + 2) == 0x04
              }.size
            ("gif", u8(6) | (u8(7) << 8), u8(8) | (u8(9) << 8), frames)
          } else ("unknown", 0, 0, 1)
        MediaMeta(
          byteLen = bytes.length.toLong,
          width = w, height = h,
          nFrames = nf,
          fmt = fmt)
      }
    }
  }

  /** Typed-Dataset decode plumbing: batch-decode payloads per
    * partition. Partitioning is preserved (map-only, no shuffle) and
    * the decoder is instantiated once per partition batch.
    */
  def decodeDataset(
      media: Dataset[(Long, Array[Byte])],
      decoder: MediaDecoder = HeaderMediaDecoder): Dataset[(Long, MediaMeta)] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val (ids, payloads) = it.duplicate
      ids.map(_._1).zip(decoder.decodeBatch(payloads.map(_._2)))
    }
  }

  // --- payload synthesis (generator side) ---

  private def hexByteCol(h: Column, i: Int): Column =
    conv(substring(h, i + 1, 2), 16, 10).cast("int")

  private def be32Col(c: Column): Column = unhex(lpad(hex(c), 8, "0"))
  private def be16Col(c: Column): Column = unhex(lpad(hex(c), 4, "0"))
  private def le16Hex(c: Column): Column = {
    val hx = lpad(hex(c), 4, "0")
    concat(substring(hx, 3, 2), substring(hx, 1, 2))
  }
  private def le16Col(c: Column): Column = unhex(le16Hex(c))
  private def le32Hex(c: Column): Column = {
    val hx = lpad(hex(c), 8, "0")
    concat(substring(hx, 7, 2), substring(hx, 5, 2),
      substring(hx, 3, 2), substring(hx, 1, 2))
  }
  private def le32Col(c: Column): Column = unhex(le32Hex(c))

  /** The documents table viewed as a media table: each payload is a
    * real container header (format and dimensions a pure function of
    * the text's md5) followed by the text bytes as the body. GIFs are
    * ANIMATED: 1..[[GifMaxFrames]] frame blocks (count from the md5
    * too) between the screen descriptor and the 0x3B trailer. Map-only
    * column expressions — the synthesis adds no shuffle anywhere.
    */
  def mediaTable(t: Tables): DataFrame = mediaTableOf(t.documents)

  /** The same synthesis over ANY (doc_id, text) frame — map-only
    * column expressions, so a STREAMING documents source slots in
    * unchanged ([[graft.streaming.Streaming]]'s modality router). */
  def mediaTableOf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), mediaPayloadOf(col("text")).as("payload"))

  /** The synthesized container bytes for a text column — shared by
    * [[mediaTableOf]] and the dirty-corpus builder in
    * [[mmExifStripFrame]] (which compares its scrub output against this
    * clean synthesis md5-to-md5). */
  private def mediaPayloadOf(text: Column): Column = {
    val body = text.cast("binary")
    val h = md5(body)
    val w = lit(16) + hexByteCol(h, 0)
    val ht = lit(16) + hexByteCol(h, 2)
    val fmtIdx = hexByteCol(h, 6) % 3
    val pngHeader = concat(lit(PngPre), be32Col(w), be32Col(ht), lit(PngPost))
    val jpegHeader = concat(lit(JpegPre), be16Col(ht), be16Col(w), lit(JpegPost))
    val nfGif = lit(1) + hexByteCol(h, 8) % GifMaxFrames
    val frameHex = concat(lit(GifGceHex), lit(GifDescPreHex),
      le16Hex(w), le16Hex(ht), lit("00"), lit(GifImgDataHex))
    val framesBin = unhex(concat(
      array_join(transform(sequence(lit(1), nfGif), _ => frameHex), ""),
      lit(GifTrailerHex)))
    val gifHeader = concat(lit(GifPre), le16Col(w), le16Col(ht), lit(GifPost),
      framesBin)
    val header = when(fmtIdx === 0, jpegHeader)
      .when(fmtIdx === 1, pngHeader)
      .otherwise(gifHeader)
    concat(header, body)
  }

  /** M14 — `mm_exif_strip`: metadata-segment PII scrubbing over the
    * container bytes — the image-side twin of `corpus_pii_scrub`:
    * embedded EXIF/text metadata (GPS coordinates, author tags,
    * comments) is the classic PII leak in scraped image corpora, and
    * the scrub must happen at the BYTE level before any decode.
    *
    * The dirty corpus injects a spec-correct metadata segment into
    * half the payloads (md5-nibble rule), one per format: a JPEG APP1
    * `Exif\0\0` segment after SOI, a PNG `tEXt` chunk after IHDR, a
    * GIF Comment Extension after the screen descriptor. The STRIPPER
    * never consults the injection rule — it walks the container
    * structure exactly as the specs define it (marker + BE16 length /
    * chunk length + type / extension introducer + sub-block length)
    * and excises what it finds, as pure column expressions over the
    * bytes: map-only, no shuffle, no UDF. (One metadata segment per
    * file at the canonical first position — the corpus contract here;
    * a general multi-segment walk is this same step iterated.)
    *
    * `roundtrip_ok` compares the stripped bytes against the clean
    * synthesis md5-to-md5 INSIDE the query — the scrub provably
    * restores the original container, not just something shorter. */
  def mmExifStrip(t: Tables): DataFrame =
    mmExifStripFrame(t.documents).drop("clean", "dirty", "stripped",
      "restripped")

  /** The full byte-level frame behind [[mmExifStrip]] — the spec
    * compares `stripped` to `clean` byte-for-byte and checks the
    * scrub's idempotence via `restripped`. */
  private[graft] def mmExifStripFrame(docs: DataFrame): DataFrame = {
    val body = col("text").cast("binary")
    val h = md5(body)
    val fmtIdx = hexByteCol(h, 6) % 3
    val fmt = when(fmtIdx === 0, "jpeg").when(fmtIdx === 1, "png")
      .otherwise("gif")
    val inject = hexByteCol(h, 10) % 2 === 0
    val idStr = col("doc_id").cast("string").cast("binary")

    // spec-correct metadata segments, one per format (real NULs where
    // the specs put them)
    val exifData = concat(
      lit("Exif\u0000\u0000GPS:".getBytes("ISO-8859-1")),
      idStr) // JPEG APP1: FF E1 <len BE16 incl itself> <data>
    val app1 = concat(lit(Array(0xFF.toByte, 0xE1.toByte)),
      be16Col(length(exifData) + lit(2)), exifData)
    val textData = concat(
      lit("Author\u0000user".getBytes("ISO-8859-1")),
      idStr) // PNG chunk: <len BE32> 'tEXt' <data> <crc>
    val tExt = concat(be32Col(length(textData)),
      lit("tEXt".getBytes("ISO-8859-1")), textData,
      lit(Array[Byte](0, 0, 0, 0)))
    val comData = concat(lit("user".getBytes("ISO-8859-1")), idStr)
    val gifCom = concat(lit(Array(0x21.toByte, 0xFE.toByte)),
      unhex(lpad(hex(length(comData)), 2, "0")), comData,
      lit(Array[Byte](0))) // 21 FE <len u8> <data> <terminator>

    def dirtyOf(clean: Column): Column = when(!inject, clean)
      .when(fmtIdx === 0, concat(substring(clean, 1, 2), app1,
        substring(clean, 3, Int.MaxValue)))
      .when(fmtIdx === 1, concat(substring(clean, 1, PngHdrLen), tExt,
        substring(clean, PngHdrLen + 1, Int.MaxValue)))
      .otherwise(concat(substring(clean, 1, GifHdrLen), gifCom,
        substring(clean, GifHdrLen + 1, Int.MaxValue)))

    // THE OPERATOR: walk the container structure and excise metadata
    def be16At(p: Column, off1: Int) =
      conv(hex(substring(p, off1, 2)), 16, 10).cast("int")
    def be32At(p: Column, off1: Int) =
      conv(hex(substring(p, off1, 4)), 16, 10).cast("int")
    def u8At(p: Column, off1: Int) =
      conv(hex(substring(p, off1, 1)), 16, 10).cast("int")
    def stripOf(p: Column): Column = {
      val isApp1 = substring(p, 3, 2) ===
        lit(Array(0xFF.toByte, 0xE1.toByte))
      val app1Len = be16At(p, 5) // includes its own 2 bytes
      val jpegOut = when(isApp1, concat(substring(p, 1, 2),
        p.substr(app1Len + lit(5), length(p)))).otherwise(p)
      val isTExt = substring(p, PngHdrLen + 5, 4) ===
        lit("tEXt".getBytes("ISO-8859-1"))
      val tExtLen = be32At(p, PngHdrLen + 1) + 12 // len+type+data+crc
      val pngOut = when(isTExt, concat(substring(p, 1, PngHdrLen),
        p.substr(tExtLen + lit(PngHdrLen + 1), length(p)))).otherwise(p)
      val isCom = substring(p, GifHdrLen + 1, 2) ===
        lit(Array(0x21.toByte, 0xFE.toByte))
      val comLen = u8At(p, GifHdrLen + 3) + 4 // intro+sublen+data+term
      val gifOut = when(isCom, concat(substring(p, 1, GifHdrLen),
        p.substr(comLen + lit(GifHdrLen + 1), length(p)))).otherwise(p)
      when(fmtIdx === 0, jpegOut).when(fmtIdx === 1, pngOut)
        .otherwise(gifOut)
    }

    // clean synthesis inline — ONE map-only projection, no self-join
    docs.select(col("doc_id"), col("text"))
      .withColumn("clean", mediaPayloadOf(col("text")))
      .withColumn("dirty", dirtyOf(col("clean")))
      .withColumn("stripped", stripOf(col("dirty")))
      .withColumn("restripped", stripOf(stripOf(col("dirty"))))
      .select(col("doc_id"), fmt.as("fmt"), inject.as("had_meta"),
        length(col("dirty")).cast("long").as("orig_len"),
        (length(col("dirty")) - length(col("stripped"))).cast("long")
          .as("meta_len"),
        length(col("stripped")).cast("long").as("stripped_len"),
        (md5(col("stripped")) === md5(col("clean"))).as("roundtrip_ok"),
        col("clean"), col("dirty"), col("stripped"), col("restripped"))
  }

  // --- audio modality: WAV/RIFF (public RIFF/WAVE spec) ---

  /** The documents table viewed as an AUDIO table: each payload is a
    * real 44-byte canonical PCM WAV header — RIFF chunk size, "WAVE",
    * a 16-byte "fmt " chunk (format 1, channels, sample rate, byte
    * rate, block align, bits per sample — all little-endian at their
    * spec offsets), and a "data" chunk sized to the body — followed by
    * the text bytes as the sample data. Channels / rate / bit depth
    * are a pure function of the text's md5, so the DuckDB oracle can
    * recompute every field the parser reads back. Map-only.
    */
  def audioTable(t: Tables): DataFrame = audioTableOf(t.documents)

  /** The same synthesis over ANY (doc_id, text) frame — map-only
    * column expressions, so a STREAMING documents source slots in
    * unchanged ([[graft.streaming.Streaming]]'s modality router). */
  def audioTableOf(docs: DataFrame): DataFrame = {
    val body = col("text").cast("binary")
    val h = md5(body)
    val ch = lit(1) + hexByteCol(h, 0) % 2
    val rate = element_at(
      typedlit(Seq(8000L, 16000L, 22050L, 44100L)), hexByteCol(h, 2) % 4 + 1)
    val bits = lit(8) * (lit(1) + hexByteCol(h, 4) % 2)
    val dataLen = length(body)
    // ch·bits ∈ {8,16,32}: the division is exact, cast back to int
    val blockAlign = (ch * bits / lit(8)).cast("int")
    val header = concat(
      lit("RIFF".getBytes(StandardCharsets.US_ASCII)),
      le32Col(dataLen + lit(36)),
      lit("WAVEfmt ".getBytes(StandardCharsets.US_ASCII)),
      le32Col(lit(16)), le16Col(lit(1)),
      le16Col(ch), le32Col(rate), le32Col(rate * blockAlign),
      le16Col(blockAlign), le16Col(bits),
      lit("data".getBytes(StandardCharsets.US_ASCII)),
      le32Col(dataLen))
    docs.select(col("doc_id"), concat(header, body).as("payload"))
  }

  /** A2 — `mm_audio_meta`: typed audio metadata parsed from the
    * payload's actual RIFF/WAVE header bytes (little-endian u16/u32
    * fields at their spec offsets), plus the derived sample count and
    * duration in exact integer arithmetic. The audio twin of
    * [[mmDecodeMeta]] — map-only column expressions, no codec, the
    * header sniff an ingest pass runs before batching to decoders.
    */
  def mmAudioMeta(t: Tables): DataFrame = {
    val payload = col("payload")
    val hx = headHex(payload)
    def le16At(b: Int): Column =
      conv(concat(substring(hx, 2 * b + 3, 2), substring(hx, 2 * b + 1, 2)),
        16, 10).cast("int")
    def le32At(b: Int): Column =
      conv(concat(substring(hx, 2 * b + 7, 2), substring(hx, 2 * b + 5, 2),
        substring(hx, 2 * b + 3, 2), substring(hx, 2 * b + 1, 2)),
        16, 10).cast("long")
    // "RIFF" ... "WAVE" at bytes 0–3 / 8–11
    val isWav = hx.startsWith("52494646") && substring(hx, 17, 8) === "57415645"
    val ch = le16At(22)
    val rate = le32At(24)
    val bits = le16At(34)
    val dataLen = le32At(40)
    // exact integer-derived duration: all operands < 2^53, one IEEE
    // division + floor on identical inputs in both engines
    val nSamples = floor(dataLen * lit(8) / (ch * bits)).cast("long")
    audioTable(t).select(
      col("doc_id"),
      length(payload).cast("long").as("byte_len"),
      when(isWav, ch).otherwise(lit(0)).as("channels"),
      when(isWav, rate).otherwise(lit(0L)).as("sample_rate"),
      when(isWav, bits).otherwise(lit(0)).as("bits_per_sample"),
      when(isWav, dataLen).otherwise(lit(0L)).as("data_len"),
      when(isWav, nSamples).otherwise(lit(0L)).as("n_samples"),
      when(isWav, floor(nSamples * lit(1000000L) / rate).cast("long"))
        .otherwise(lit(0L)).as("duration_us"))
  }

  // --- video modality: MP4 / ISO-BMFF (public ISO 14496-12 spec) ---

  /** mvhd version-0 box is a fixed 108 bytes; moov wrapping it is 116. */
  private val MvhdLen = 108
  private val MoovLen = MvhdLen + 8
  private val FtypLen = 20
  /** Full fixed header before the mdat body: ftyp + moov + mdat size/type. */
  private val Mp4HdrLen = FtypLen + MoovLen + 8

  /** The documents table viewed as a VIDEO table: each payload is a
    * real ISO-BMFF box chain — a 20-byte `ftyp` (major brand `isom`,
    * minor version 0x200, one compatible brand), a `moov` holding a
    * version-0 `mvhd` with timescale, duration, identity matrix and
    * next-track-ID at their spec offsets (all big-endian, per ISO
    * 14496-12 §8.2.2), and an `mdat` sized to the text body. The
    * movie timescale, duration and track count are pure functions of
    * the text's md5, so the DuckDB oracle recomputes every field the
    * box walk reads back. Map-only. No codec anywhere — exactly the
    * container sniff a 100 TB video-ingest pass runs before routing
    * payloads to sampled-frame decoders.
    */
  def videoTable(t: Tables): DataFrame = videoTableOf(t.documents)

  /** The same synthesis over ANY (doc_id, text) frame — map-only
    * column expressions, so a STREAMING documents source slots in
    * unchanged ([[graft.streaming.Streaming]]'s modality router). */
  def videoTableOf(docs: DataFrame): DataFrame = {
    val body = col("text").cast("binary")
    val h = md5(body)
    val timescale = element_at(
      typedlit(Seq(600L, 1000L, 30000L, 90000L)), hexByteCol(h, 2) % 4 + 1)
    val durSecs = lit(1) + hexByteCol(h, 4) % 30
    val durTicks = timescale * durSecs + hexByteCol(h, 8)
    val nTracks = lit(1) + hexByteCol(h, 6) % 3
    val ftyp = concat(
      be32Col(lit(FtypLen)),
      lit("ftypisom".getBytes(StandardCharsets.US_ASCII)),
      be32Col(lit(0x200)),
      lit("mp41".getBytes(StandardCharsets.US_ASCII)))
    val mvhd = concat(
      be32Col(lit(MvhdLen)),
      lit("mvhd".getBytes(StandardCharsets.US_ASCII)),
      be32Col(lit(0)),               // version 0 + flags
      be32Col(lit(0)), be32Col(lit(0)), // creation/modification time
      be32Col(timescale), be32Col(durTicks),
      be32Col(lit(0x00010000)),      // rate 1.0
      be16Col(lit(0x0100)),          // volume 1.0
      lit(Array.fill[Byte](10)(0)),  // reserved
      unhex(lit(("00010000" + "00000000" + "00000000" +
        "00000000" + "00010000" + "00000000" +
        "00000000" + "00000000" + "40000000"))), // identity matrix
      lit(Array.fill[Byte](24)(0)),  // pre_defined
      be32Col(nTracks + lit(1)))     // next_track_ID
    val moov = concat(
      be32Col(lit(MoovLen)),
      lit("moov".getBytes(StandardCharsets.US_ASCII)),
      mvhd)
    val mdat = concat(
      be32Col(length(body) + lit(8)),
      lit("mdat".getBytes(StandardCharsets.US_ASCII)),
      body)
    docs.select(col("doc_id"), concat(ftyp, moov, mdat).as("payload"))
  }

  /** V1 — `mm_video_meta`: typed video metadata from a REAL ISO-BMFF
    * box walk over the payload bytes, as pure column expressions: the
    * `ftyp` size field gives the `moov` offset DYNAMICALLY (no
    * assumption the boxes are where this generator happens to put
    * them), the `mvhd` child is type-checked at `moov`+8, and movie
    * timescale / duration / next-track-ID read as BE32 at their
    * version-0 spec offsets; `mdat`'s size field (found at
    * ftyp+moov, again from the parsed sizes) yields the body length.
    * duration_ms is exact integer arithmetic (operands < 2^53).
    * Completes the image/audio/video modality triad with the same
    * generator-vs-parser cross-check as `mm_decode_meta` /
    * `mm_audio_meta`.
    */
  def mmVideoMeta(t: Tables): DataFrame = {
    val payload = col("payload")
    // 160 hex-read bytes bound every layout above (fixed header is 144)
    val hx = hex(substring(payload, 1, 160))
    def be32At(b: Column): Column =
      conv(hx.substr(b * 2 + 1, lit(8)), 16, 10).cast("long")
    def typeAt(b: Column): Column = hx.substr(b * 2 + 1, lit(8))
    val ftypSize = be32At(lit(0))
    val isMp4 = typeAt(lit(4)) === hex(lit("ftyp")) &&
      typeAt(ftypSize + 4) === hex(lit("moov")) &&
      typeAt(ftypSize + 12) === hex(lit("mvhd"))
    val moovSize = be32At(ftypSize)
    val mvhdOff = ftypSize + 8
    val timescale = be32At(mvhdOff + 20)
    val durTicks = be32At(mvhdOff + 24)
    val nextTrack = be32At(mvhdOff + 104)
    val mdatLen = be32At(ftypSize + moovSize) - 8
    videoTable(t).select(
      col("doc_id"),
      length(payload).cast("long").as("byte_len"),
      when(isMp4, substring(payload, 9, 4).cast("string"))
        .otherwise(lit("unknown")).as("brand"),
      when(isMp4, timescale).otherwise(lit(0L)).as("timescale"),
      when(isMp4, durTicks).otherwise(lit(0L)).as("duration_ticks"),
      when(isMp4, floor(durTicks * lit(1000L) / timescale).cast("long"))
        .otherwise(lit(0L)).as("duration_ms"),
      when(isMp4, (nextTrack - 1).cast("int")).otherwise(lit(0)).as("n_tracks"),
      when(isMp4, mdatLen).otherwise(lit(0L)).as("data_len"))
  }

  /** M5 — `mm_modality_router`: the ingestion FRONT DOOR for a mixed
    * media corpus — every payload's modality is detected from its
    * ACTUAL BYTES (PNG/JPEG/GIF signatures → image, RIFF/WAVE →
    * audio, `ftyp` at byte 4 → video) and the batch is routed into
    * per-modality totals (doc counts + byte volume), the numbers that
    * size each modality's downstream decoder fleet. The mixed table
    * is synthesized by assigning each doc one modality from its md5
    * (byte 5 mod 3) and taking that generator's payload — so the
    * oracle recomputes the routing from the generator formulas while
    * Spark routes by SNIFFING the bytes: a router misreading any
    * signature breaks the hash. Map-only until the 3-group rollup.
    */
  def mmModalityRouter(t: Tables): DataFrame = modalityRouterOf(t.documents)

  /** The router body over ANY (doc_id, text) docs frame — batch or
    * STREAMING ([[graft.streaming.Streaming]]'s twin). Modality
    * SELECTION is the per-row md5 nibble pushed into each synth branch
    * as a filter (union of three map-only branches — no self-join, so
    * the batch plan drops a shuffle and the streaming plan needs no
    * stream-stream join); detection then reads the actual payload
    * bytes, and the rollup is one bounded aggregation (≤ 4 groups).
    */
  def modalityRouterOf(docs: DataFrame): DataFrame = {
    val sel = hexByteCol(md5(col("text").cast("binary")), 10) % 3
    val mixed = mediaTableOf(docs.filter(sel === 0))
      .unionByName(audioTableOf(docs.filter(sel === 1)))
      .unionByName(videoTableOf(docs.filter(sel === 2)))
      .select(col("doc_id"), col("payload"))
    val hx = headHex(col("payload"))
    val modality = when(isPng(hx) || isJpeg(hx) || isGif(hx), "image")
      .when(hx.startsWith("52494646") && substring(hx, 17, 8) === "57415645", "audio")
      .when(substring(hx, 9, 8) === hex(lit("ftyp")), "video")
      .otherwise("unknown")
    mixed.groupBy(modality.as("modality"))
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("payload"))).cast("long").as("total_bytes"))
  }

  // --- byte-level parser (decode side), pure column expressions ---

  /** Uppercase hex of the payload's header region (64 bytes bounds
    * every layout above; a real sniffer reads a fixed prefix too). */
  private def headHex(payload: Column): Column = hex(substring(payload, 1, 64))

  private def isPng(hx: Column): Column = hx.startsWith("89504E470D0A1A0A")
  private def isJpeg(hx: Column): Column = hx.startsWith("FFD8")
  private def isGif(hx: Column): Column = hx.startsWith("474946383961")

  /** Hex of the GIF frame-block region: the 13-byte screen descriptor
    * plus up to [[GifMaxFrames]] fixed-stride blocks and the trailer. */
  private def gifRegionHex(payload: Column): Column =
    hex(substring(payload, 1, GifHdrLen + GifMaxFrames * GifFrameBytes + 1))

  /** REAL GIF frame count, parsed from the bytes: walk the
    * fixed-stride frame blocks from byte 13 and count the prefix run
    * of Graphic Control Extension signatures (21 F9 04); the byte
    * after the last frame is the 0x3B trailer, which stops the walk
    * at exactly the written count (body bytes are never examined —
    * the prefix conjunction can't skip past the trailer). */
  private def gifFramesCol(payload: Column): Column = {
    val hx = gifRegionHex(payload)
    val checks = (0 until GifMaxFrames).map { k =>
      substring(hx, 2 * (GifHdrLen + k * GifFrameBytes) + 1, 6) === "21F904"
    }
    checks.scanLeft(lit(true))(_ && _).tail
      .map(p => when(p, 1).otherwise(0)).reduce(_ + _)
  }

  /** Parsed header length — how many leading bytes the container owns
    * (JPEG's is fixed here because the generator writes SOI+APP0+SOF0
    * back to back; the SOF0 *field* positions below are still found by
    * scanning, not assumed). A GIF owns its frame blocks and trailer
    * too, so its length rides on the parsed frame count. Unknown
    * formats own no header. */
  private def hdrLenCol(payload: Column): Column = {
    val hx = headHex(payload)
    when(isPng(hx), lit(PngHdrLen))
      .when(isJpeg(hx), lit(JpegHdrLen))
      .when(isGif(hx),
        lit(GifHdrLen) + gifFramesCol(payload) * lit(GifFrameBytes) + lit(1))
      .otherwise(lit(0))
  }

  /** The payload body (bytes past the parsed container header). */
  private def bodyCol(payload: Column): Column =
    payload.substr(hdrLenCol(payload) + 1, length(payload))

  /** Frame count read from the container bytes: the GIF block walk
    * for animations, and the honest 1 for still formats. */
  private def nFramesCol(payload: Column): Column =
    when(isGif(headHex(payload)), gifFramesCol(payload)).otherwise(lit(1))

  /** Metadata parsed from the payload's actual bytes. */
  private def decodeMetaCols(payload: Column): Seq[Column] = {
    val hx = headHex(payload)
    // PNG: IHDR width/height, big-endian u32 at bytes 17–20 / 21–24
    val pngW = conv(substring(hx, 33, 8), 16, 10).cast("int")
    val pngH = conv(substring(hx, 41, 8), 16, 10).cast("int")
    // JPEG: locate the SOF0 marker (FF C0) by scanning the header hex;
    // height/width (BE16) sit 5 and 7 bytes past the marker (2-byte
    // segment length + precision byte first). p is the 1-based hex-char
    // offset of the marker, so byte m+k maps to hex char p + 2k
    val p = locate("FFC0", hx)
    val jpegH = conv(hx.substr(p + 10, lit(4)), 16, 10).cast("int")
    val jpegW = conv(hx.substr(p + 14, lit(4)), 16, 10).cast("int")
    // GIF: logical screen width/height, LITTLE-endian u16 at bytes 7–10
    val gifW = conv(concat(substring(hx, 15, 2), substring(hx, 13, 2)), 16, 10).cast("int")
    val gifH = conv(concat(substring(hx, 19, 2), substring(hx, 17, 2)), 16, 10).cast("int")
    Seq(
      length(payload).cast("long").as("byte_len"),
      when(isPng(hx), pngW).when(isJpeg(hx), jpegW).when(isGif(hx), gifW)
        .otherwise(lit(0)).as("width"),
      when(isPng(hx), pngH).when(isJpeg(hx), jpegH).when(isGif(hx), gifH)
        .otherwise(lit(0)).as("height"),
      nFramesCol(payload).as("n_frames"),
      when(isPng(hx), "png").when(isJpeg(hx), "jpeg").when(isGif(hx), "gif")
        .otherwise("unknown").as("fmt"))
  }

  /** M1 — `mm_decode_meta`: binary payload → typed metadata struct by
    * parsing the container header bytes. Map-only; at scale this is
    * the schema/shape of a real decode pass (binary in, fixed-width
    * typed columns out).
    */
  def mmDecodeMeta(t: Tables): DataFrame =
    mediaTable(t).select(col("doc_id") +: decodeMetaCols(col("payload")): _*)

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

  /** M15 — `mm_aspect_buckets`: ASPECT-RATIO bucketing — the batch
    * assignment every resolution-bucketed image-training run performs
    * (images batch with same-shaped peers to avoid destructive
    * center-crops; the SDXL-style fixed bucket ladder): each image
    * goes to the bucket minimizing aspect distortion. Selection is
    * EXACT integer cross-multiplication — bucket (bw, bh) vs image
    * (w, h) scores `|w·bh − h·bw|` scaled to a common denominator,
    * so no float aspect ratio ever compares (the cross-engine
    * half-way hazard); ties break to the squarest (first) bucket.
    * Header-metadata only, map-side bucket pick (a 9-entry CASE
    * ladder, no join), ONE metadata-scale rollup keyed by bucket. */
  val aspectBuckets: Seq[(Int, Int)] = Seq(
    (1024, 1024), (1152, 896), (896, 1152), (1216, 832), (832, 1216),
    (1344, 768), (768, 1344), (1536, 640), (640, 1536))

  def mmAspectBuckets(t: Tables): DataFrame = {
    // score_i = |w·bh_i − h·bw_i| · 10⁶ div (bw_i·bh_i) — all exact
    // integers, the per-bucket normalizer constant-folds. The argmin
    // is array_position(scores, array_min(scores)) — LINEAR-size
    // expressions (a running-min when-chain would reference itself
    // twice per step and blow up 2^9 in codegen); array_position
    // returns the FIRST index of the min, which IS the squarest-
    // bucket tiebreak because the ladder is ordered that way.
    val scores = array(aspectBuckets.map { case (bw, bh) =>
      expr(
        s"(abs(CAST(width AS BIGINT) * $bh - CAST(height AS BIGINT) * $bw)" +
          s" * 1000000) div ${bw.toLong * bh}")
    }: _*)
    val bwOf = aspectBuckets.zipWithIndex.foldLeft(lit(0)) {
      case (acc, ((bw, _), i)) => when(col("bkt") === i, lit(bw)).otherwise(acc) }
    val bhOf = aspectBuckets.zipWithIndex.foldLeft(lit(0)) {
      case (acc, ((_, bh), i)) => when(col("bkt") === i, lit(bh)).otherwise(acc) }
    mmDecodeMeta(t)
      .withColumn("sc", scores)
      .withColumn("bkt",
        (array_position(col("sc"), array_min(col("sc"))) - 1).cast("int"))
      .groupBy(col("bkt"))
      .agg(count(lit(1)).as("n_images"),
        min(expr("(CAST(width AS BIGINT) * 1000000) div height"))
          .as("min_aspect_ppm"),
        max(expr("(CAST(width AS BIGINT) * 1000000) div height"))
          .as("max_aspect_ppm"))
      .select(bwOf.as("bucket_w"), bhOf.as("bucket_h"),
        col("n_images"), col("min_aspect_ppm"), col("max_aspect_ppm"))
  }

  /** M16 — `mm_audio_chunk_plan`: the fixed-window CHUNKING plan for
    * long audio (the Whisper-style ≤30 s windows with 1 s overlap
    * every ASR/captioning ingest batches by): per payload, how many
    * chunks, the stride arithmetic in EXACT integer microseconds —
    * n_chunks = 1 + ceil((dur − win) / stride) for dur > win via
    * `(x + s − 1) div s`, last-chunk padding = n·stride + win − dur.
    * Planned entirely from the RIFF header duration ([[mmAudioMeta]])
    * — no sample ever decoded; map-only, ZERO exchanges at any
    * corpus size; the per-file plan is what a scheduler packs into
    * same-cost decode batches. */
  def mmAudioChunkPlan(t: Tables, winUs: Long = 30000000L,
      overlapUs: Long = 1000000L): DataFrame = {
    val stride = winUs - overlapUs
    mmAudioMeta(t)
      .filter(col("duration_us") > 0L)
      .withColumn("n_chunks",
        when(col("duration_us") <= winUs, lit(1L))
          .otherwise(lit(1L) +
            expr(s"(duration_us - ${winUs}L + ${stride}L - 1) div ${stride}L")))
      .withColumn("padded_us",
        (col("n_chunks") - 1) * lit(stride) + lit(winUs) - col("duration_us"))
      .select(col("doc_id"), col("duration_us"), col("n_chunks"),
        col("padded_us"))
  }

  /** M10 — `mm_token_budget`: the VISION-TOKEN cost plan per media
    * row — what a vision-language training run budgets before it
    * decodes anything: fit-to-`maxSide` downscale (the
    * `mm_resize_plan` floor-sizing discipline — never upscaled, no
    * round-half hazard), `patch`×`patch` ViT patching with ceil
    * tiling, and every-`frameStride`-th frame sampling for animated
    * payloads (the `mm_frame_sample` stride), so
    * vision_tokens = tiles_x · tiles_y · frames_sampled. Summed over
    * a corpus this is the token bill that decides mixture weights and
    * shard sizing for the multimodal slice — computed entirely from
    * header metadata, no pixel ever decoded.
    *
    * Exact integer arithmetic after the one floor-scale per side
    * (identical IEEE operands both engines): ceil division via
    * (x + p−1) DIV p, stride count (n−1) DIV s + 1. Map-only over
    * the header scan, ZERO exchanges at any corpus size. */
  def mmTokenBudget(t: Tables, maxSide: Int = 224, patch: Int = 16,
      frameStride: Int = 5): DataFrame = {
    val m = greatest(col("width"), col("height")).cast("double")
    val scale = least(lit(1.0), lit(maxSide) / m)
    mmDecodeMeta(t)
      .withColumn("target_w", floor(col("width") * scale).cast("int"))
      .withColumn("target_h", floor(col("height") * scale).cast("int"))
      .withColumn("tiles_x", expr(s"CAST((target_w + ${patch - 1}) DIV $patch AS INT)"))
      .withColumn("tiles_y", expr(s"CAST((target_h + ${patch - 1}) DIV $patch AS INT)"))
      .withColumn("frames_sampled",
        expr(s"CAST((n_frames - 1) DIV $frameStride + 1 AS INT)"))
      .select(col("doc_id"), col("fmt"), col("tiles_x"), col("tiles_y"),
        col("frames_sampled"),
        (col("tiles_x").cast("long") * col("tiles_y") *
          col("frames_sampled")).as("vision_tokens"))
  }

  /** M11 — `mm_caption_pairs`: the IMAGE-TEXT PAIR curation screen —
    * the filtering stage every public multimodal corpus build runs
    * (the LAION/DataComp discipline) before pairs reach training:
    * each media payload pairs with its document text as the caption,
    * and the screen rolls up, per format, the pairs that fail the
    * standard caption heuristics — SHORT (< 4 tokens: alt-text
    * stubs), OVERLONG (> 77 tokens: the CLIP text-encoder truncation
    * limit — silently losing caption tail at train time), and
    * UNDER-CAPTIONED (vision tokens > 64× caption tokens: a dense
    * image described by near-nothing — the pair teaches noise) —
    * next to the total vision/caption token bill the mixture planner
    * reads ([[mmTokenBudget]] prices the vision side; this prices
    * the PAIR).
    *
    * Shape: the header-metadata token plan joins the caption token
    * counts doc-keyed — BOTH sides are metadata-scale projections
    * (the binary corpus never shuffles; the M2 lesson), then ONE
    * fmt-keyed rollup with conditional counts. All flags integer
    * comparisons; zero float hazards. */
  def mmCaptionPairs(t: Tables): DataFrame = {
    val cap = t.documents.select(col("doc_id"),
      size(graft.operators.TextAnalysis.tokens(col("text"))).cast("long")
        .as("caption_tokens"))
    mmTokenBudget(t)
      .select(col("doc_id"), col("fmt"), col("vision_tokens"))
      .join(cap, Seq("doc_id"))
      .groupBy(col("fmt"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("caption_tokens") < 4, 1L).otherwise(0L)).as("n_short"),
        sum(when(col("caption_tokens") > 77, 1L).otherwise(0L))
          .as("n_overlong"),
        sum(when(col("vision_tokens") > col("caption_tokens") * 64, 1L)
          .otherwise(0L)).as("n_undercaptioned"),
        sum(col("vision_tokens")).as("total_vision_tokens"),
        sum(col("caption_tokens")).as("total_caption_tokens"))
  }

  /** M2 — `mm_frame_sample`: every 5th frame index per media row
    * (explode of a bounded sequence — the standard frame-sampling
    * shape), with a deterministic per-frame fingerprint over the
    * payload BODY.
    *
    * Map-only: `n_frames` is a pure function of the payload, so it is
    * computed inline on the payload scan — no join back to the
    * metadata (the round-2 version re-joined the media table to
    * metadata derived from it, shuffling the full binary corpus to
    * pick up a value each row already determines).
    */
  def mmFrameSample(t: Tables): DataFrame =
    mediaTable(t)
      .select(col("doc_id"), col("payload"),
        explode(sequence(lit(0), nFramesCol(col("payload")) - 1, lit(5)))
          .as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        md5(concat(bodyCol(col("payload")).cast("string"), lit(":"),
          col("frame_idx").cast("string"))).as("frame_hash"))

  /** M7 — `mm_frame_dedup`: frame-level CONTENT dedup ACROSS
    * payloads — [[Dedup.dedupPassage]]'s sub-document discipline
    * applied to the multimodal axis. Each sampled frame
    * ([[mmFrameSample]]'s stride/count arithmetic) hashes its
    * CONTENT — the `window`-byte body region at the frame's offset,
    * the stand-in for decoded frame bytes — and every frame content
    * occurring in more than one payload is reported with
    * occurrence/document counts and the min-doc representative.
    * Re-containered near-copies of the same footage share frame
    * content while their container bytes (and whole-payload hashes)
    * differ — exactly the duplication this catches before a video
    * corpus pays decode/embedding cost per copy. (Whole-payload
    * hashing is vacuous on this corpus — near-dup bodies, zero exact
    * copies — which is the point: frame-level content is where the
    * sharing lives.)
    *
    * Shape: map-only frame synthesis + content hash, then ONE
    * digest-keyed partial-agg groupBy — 32-char digests shuffle,
    * payload bytes never do (the dedup_exact/dedup_passage scale
    * shape).
    */
  def mmFrameDedup(t: Tables, window: Int = 64): DataFrame =
    frameContents(t.documents, window)
      .groupBy(col("frame_hash"))
      .agg(count(lit(1)).as("n_occ"),
        countDistinct(col("doc_id")).as("n_docs"),
        min(col("doc_id")).as("rep_doc_id"))
      .filter(col("n_docs") > 1)

  /** M11 — `mm_integrity_audit`: CONTAINER-INTEGRITY screening — the
    * ingest-time check that catches truncated/corrupted media before
    * a decoder fleet wastes cycles on it (and the audit trail a
    * compliance review reads): per WAV payload, the RIFF chunk size
    * (bytes 4–7, must equal total − 8) and the data chunk size
    * (bytes 40–43, must equal total − 44) are read FROM THE BYTES
    * and cross-checked against the actual payload length, plus the
    * RIFF/WAVE magic. The synthetic corpus is clean by construction,
    * so a deterministic ~1/16 of payloads (md5 nibble 13 = '0')
    * arrive TRUNCATED by 4 bytes (the injected-ground-truth
    * discipline) — both size fields must then disagree and the spec
    * asserts the audit flags exactly the injected set. Map-only;
    * the oracle recomputes every field from the generator's formulas
    * (generator-vs-parser, adversarial form).
    */
  def mmIntegrityAudit(t: Tables): DataFrame =
    integrityAuditOf(t.documents)

  /** The same audit over ANY (doc_id, text) frame — synth, injection
    * and byte checks are all map-only per row, so a STREAMING
    * documents source slots in unchanged (the modality-router
    * discipline). */
  def integrityAuditOf(docs: DataFrame): DataFrame = {
    val marked = docs.select(col("doc_id"), col("text"),
      (substring(md5(col("text").cast("binary")), 13, 1) === "0").as("inj"))
    val withPayload = audioTableOf(marked.select(col("doc_id"), col("text")))
      .join(marked.select(col("doc_id"), col("inj")), "doc_id")
    val payload = when(col("inj"),
        col("payload").substr(lit(1), length(col("payload")) - lit(4)))
      .otherwise(col("payload"))
    val df = withPayload.select(col("doc_id"), payload.as("payload"))
    val hx = headHex(col("payload"))
    def le32At(b: Int): Column =
      conv(concat(substring(hx, 2 * b + 7, 2), substring(hx, 2 * b + 5, 2),
        substring(hx, 2 * b + 3, 2), substring(hx, 2 * b + 1, 2)),
        16, 10).cast("long")
    val len = length(col("payload")).cast("long")
    df.select(col("doc_id"), len.as("byte_len"),
      (hx.startsWith("52494646") &&
        substring(hx, 17, 8) === "57415645").as("magic_ok"),
      (le32At(4) === len - 8).as("riff_size_ok"),
      (le32At(40) === len - 44).as("data_size_ok"))
      .withColumn("flagged",
        !(col("magic_ok") && col("riff_size_ok") && col("data_size_ok")))
  }

  /** M10 — `mm_phash_pairs`: perceptual-hash near-duplicate detection
    * across media payloads — the aHash discipline (public
    * average-hash pHash family): each payload's BODY "downsamples" to
    * 64 cells (cell of position j = ((j−1)·64) DIV len — the
    * resize-to-8×8 stand-in), a cell's bit fires iff its sum exceeds
    * the payload average (64·cellsum > total, integer cross-multiply),
    * the 64 bits pack into two 32-bit words (the `ann_hamming_topk`
    * signed-safe layout), and payloads pair when their hashes differ
    * in ≤ 7 of 64 bits. Catches re-encoded/lightly-edited copies that
    * exact frame hashes (`mm_frame_dedup`) miss — the visual twin of
    * SimHash.
    *
    * Scale: candidate generation is BANDED — 8 exact-match 8-bit
    * bands; by pigeonhole any pair within Hamming 7 shares a clean
    * band, so the banding is provably COMPLETE at the threshold, and
    * the ORACLE scores ALL pairs so a blocking hole fails the hash
    * gate (the `er_blocked_pairs` discipline). Hash computation is
    * map-only + one (doc, cell) partial agg; the self-join is keyed
    * on (band, value) — never all-pairs; verification pays 2
    * popcounts per candidate.
    */
  def mmPhashPairs(t: Tables, tau: Int = 7): DataFrame = {
    val cells = 64
    val body = bodyCol(col("payload")).cast("string")
    // repartition first (the §8 small-file rule): the corpus is one
    // parquet file and the per-row hash fold is ~300× the scan cost
    val docs = mediaTable(t).select(col("doc_id"), body.as("b"))
      .filter(length(col("b")) >= cells)
      .repartition(t.spark.sparkContext.defaultParallelism)
    // the WHOLE hash is a per-row scalar chain — no explode, no
    // shuffle (a first cut exploded per character and aggregated cell
    // sums across 4 shuffle stages; at bench SF the per-stage job
    // overhead dominated, the §8h k-core lesson). Cell i covers
    // 0-based positions [ceil(i·len/64), ceil((i+1)·len/64)) — the
    // interval form of cell(p) = (p·64) DIV len, proven equivalent in
    // the scaladoc arithmetic — and each sum is a bounded fold over
    // the row's own substring.
    val len = length(col("b")).cast("long")
    def cellSum(i: Column): Column = {
      val lo = shiftright(i * len + lit(63L), 6)
      val hi = shiftright((i + lit(1L)) * len + lit(63L), 6) // exclusive
      aggregate(sequence(lo + lit(1L), hi), lit(0L),
        (acc, j) => acc +
          ascii(col("b").substr(j.cast("int"), lit(1))).cast("long"))
    }
    val pow = typedlit((0 until 32).map(i => 1L << i))
    val withSums = docs.withColumn("sums",
      transform(sequence(lit(0L), lit(63L)), i => cellSum(i)))
    val scored = withSums
      .withColumn("t", aggregate(col("sums"), lit(0L), _ + _))
    def word(off: Int): Column =
      aggregate(sequence(lit(0), lit(31)), lit(0L), (acc, i) =>
        acc + when(element_at(col("sums"), i + lit(1 + off)) * lit(cells)
            > col("t"),
          element_at(pow, i + lit(1))).otherwise(lit(0L)))
    val words = scored
      .select(col("doc_id"), word(0).as("w0"), word(32).as("w1"))
      .persist()
    val banded = words
      .select(col("doc_id"), explode(sequence(lit(0), lit(7))).as("band"),
        col("w0"), col("w1"))
      .select(col("doc_id"), col("band"),
        when(col("band") < 4,
          expr("(w0 DIV shiftleft(1L, band * 8)) % 256"))
          .otherwise(expr("(w1 DIV shiftleft(1L, (band - 4) * 8)) % 256"))
          .as("bv"))
    val cand = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    cand
      .join(words.select(col("doc_id").as("doc_a"), col("w0").as("a0"),
        col("w1").as("a1")), "doc_a")
      .join(words.select(col("doc_id").as("doc_b"), col("w0").as("b0"),
        col("w1").as("b1")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        expr("CAST(bit_count(a0 ^ b0) + bit_count(a1 ^ b1) AS INT)")
          .as("hamming"))
      .filter(col("hamming") <= tau)
  }

  /** M9 — `mm_audio_vad`: energy-threshold voice-activity detection
    * over each WAV payload's sample stream — the audio twin of
    * `mm_video_scene_cut` (segment before sampling, so a long silent
    * tail doesn't drown the active speech in downstream batching).
    * Frames are the data section's consecutive 16-char windows (the
    * decode stand-in — real PCM would sum |amplitude|; the discipline
    * and plan shape are identical), a frame's ENERGY is the exact
    * integer sum of its character codes, a frame is ACTIVE iff
    * energy·n_windows > total_energy (strictly above the payload's
    * own mean — an exact integer cross-multiply, no ratio, no float
    * threshold), and consecutive active frames fold into segments by
    * gaps-and-islands. Output per payload: window/active counts,
    * segment count, longest segment.
    *
    * The data section is read from the PAYLOAD at its spec offset
    * (byte 45 onward), while the oracle recomputes from the
    * generator's text — the `mm_decode_meta` generator-vs-parser
    * cross-check, here proving the body extraction too.
    *
    * Shape: map-only window explode + per-window 16-term fold, ONE
    * doc-keyed shuffle for the island windows (O(windows/payload)
    * state), keyed rollups after — payload bytes never shuffle.
    */
  def mmAudioVad(t: Tables, window: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val data = col("payload")
      .substr(lit(45), length(col("payload")) - lit(44)).cast("string")
    val docs = audioTable(t)
      .select(col("doc_id"), data.as("body"))
      .filter(length(col("body")) >= window)
    val wins = docs.select(col("doc_id"),
        explode(sequence(lit(0),
          (length(col("body")) / window).cast("int") - 1)).as("w"),
        col("body"))
      .select(col("doc_id"), col("w"),
        aggregate(sequence(lit(1), lit(window)), lit(0L),
          (acc, i) => acc +
            ascii(col("body").substr(col("w") * window + i, lit(1))))
          .as("e"))
    val tot = wins.groupBy(col("doc_id"))
      .agg(sum(col("e")).as("te"), count(lit(1)).as("nw"))
    val act = wins.join(tot, "doc_id")
      .filter(col("e") * col("nw") > col("te"))
    val isl = act.withColumn("isl",
        col("w") - row_number().over(
          Window.partitionBy(col("doc_id")).orderBy(asc("w"))))
      .groupBy(col("doc_id"), col("isl")).agg(count(lit(1)).as("seg_len"))
    val segs = isl.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_segments"),
        sum(col("seg_len")).as("n_active"),
        max(col("seg_len")).as("longest_segment"))
    tot.join(segs, Seq("doc_id"), "left")
      .select(col("doc_id"), col("nw").as("n_windows"),
        coalesce(col("n_active"), lit(0L)).as("n_active"),
        coalesce(col("n_segments"), lit(0L)).as("n_segments"),
        coalesce(col("longest_segment"), lit(0L)).as("longest_segment"))
  }

  /** M8 — `mm_video_scene_cut`: SCENE SEGMENTATION over each
    * payload's decoded-frame stream — the step a video training
    * pipeline runs between decode and frame sampling, so sampling
    * draws per SCENE instead of per fixed stride (a 10-minute static
    * shot shouldn't contribute 100× the frames of a 3-second cut
    * scene). Frames are the payload body's consecutive 32-byte
    * windows (the decode stand-in, `mm_frame_dedup`'s discipline);
    * each frame's FEATURE is its distinct character set, consecutive
    * frames compare by set Jaccard — an exact integer rational
    * (|∩|/|∪|), so the cut decision replays bit-identically in the
    * oracle, no float-threshold hazard — and a similarity below the
    * threshold opens a new scene (gaps-and-islands over the cut
    * flags). Output: one row per scene with its start frame and
    * length.
    *
    * Shape: map-only frame explode + per-frame feature (one regex
    * pass per frame), ONE doc-keyed shuffle for the lag/island
    * windows, per-doc state O(frames per payload); the scene rollup
    * is a keyed partial agg. Payload bytes never shuffle — features
    * and 32-char windows do. */
  def mmVideoSceneCut(t: Tables, window: Int = 32,
      cutBelow: Double = 0.5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byIdx = Window.partitionBy(col("doc_id")).orderBy(col("frame_idx"))
    val frames = mediaTable(t)
      .select(col("doc_id"), bodyCol(col("payload")).cast("string").as("body"))
      .filter(length(col("body")) >= window) // sequence(0, n-1) needs n >= 1
      .select(col("doc_id"),
        explode(sequence(lit(0),
          (length(col("body")) / window).cast("int") - 1)).as("frame_idx"),
        col("body"))
      .filter(length(col("body")) >= (col("frame_idx") + 1) * window)
      .select(col("doc_id"), col("frame_idx"),
        array_distinct(regexp_extract_all(
          col("body").substr(col("frame_idx") * window + 1, lit(window)),
          lit("."), lit(0))).as("cs"))
    frames
      .withColumn("prev", lag(col("cs"), 1).over(byIdx))
      .withColumn("cut",
        when(col("prev").isNull, 1)
          .otherwise((size(array_intersect(col("cs"), col("prev"))) <
            lit(cutBelow) * size(array_union(col("cs"), col("prev"))))
            .cast("int")))
      .withColumn("scene_idx", sum(col("cut")).over(
        byIdx.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("scene_idx"))
      .agg(min(col("frame_idx")).cast("long").as("scene_start"),
        count(lit(1)).as("scene_len"))
      .select(col("doc_id"), col("scene_idx").cast("long").as("scene_idx"),
        col("scene_start"), col("scene_len"))
  }

  /** The (doc_id, frame_hash) frame behind [[mmFrameDedup]] — map-only
    * frame synthesis + content-window hash over ANY (doc_id, text)
    * frame, so a STREAMING documents source slots in unchanged
    * (the [[mediaTableOf]] convention). */
  def frameContents(docs: DataFrame, window: Int = 64): DataFrame =
    mediaTableOf(docs)
      .select(col("doc_id"),
        explode(sequence(lit(0), nFramesCol(col("payload")) - 1, lit(5)))
          .as("frame_idx"),
        bodyCol(col("payload")).cast("string").as("body"))
      .filter(length(col("body")) >= col("frame_idx") * window + window)
      .select(col("doc_id"),
        md5(col("body").substr(col("frame_idx") * window + 1, lit(window)))
          .as("frame_hash"))
}
