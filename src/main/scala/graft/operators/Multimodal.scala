package graft.operators

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import java.security.MessageDigest

import javax.imageio.ImageIO

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media (image/audio/video) ride through the
  * engine as opaque `binary` columns, and decode/feature-extract runs as a
  * partition-parallel kernel over the bytes — no driver involvement, no
  * native dependencies.
  *
  * [[decodeMeta]] is a REAL container decoder: it sniffs the magic bytes
  * and parses the actual format headers of PNG (IHDR), JPEG (SOF marker
  * walk), GIF (logical screen descriptor + image-descriptor block walk for
  * frame counting), BMP (BITMAPINFOHEADER) and WAV/RIFF (fmt + data
  * chunks). Full pixel/sample decode (resize, frame extraction) would slot
  * in at the same executor-side call site with a codec library; the
  * metadata pass alone covers the pipeline's filter/route/statistics
  * needs (drop tiny images, bucket by resolution, audio-length filters).
  *
  * [[synthesizePayload]] builds real format bytes (via `javax.imageio`
  * encoders and a hand-assembled RIFF writer) so tests and the oracle
  * pipeline exercise the parser against genuine container structure.
  */
object Multimodal {

  // ImageIO defaults to staging every encode/decode through a TEMP FILE
  // on disk (the "use cache" flag). All payloads here are in-memory byte
  // arrays a few hundred KB at most — the disk round-trip is pure
  // per-row overhead on the executor kernels. Identical bytes either
  // way; set once per JVM (executors hit this on class load).
  // NOTE (ADVICE r18): this is a JVM-GLOBAL ImageIO setting taken as a
  // class-load side effect — any other ImageIO user in the same JVM also
  // stops disk-staging (for in-memory byte-array payloads that is
  // strictly less I/O; code relying on disk staging for images larger
  // than heap would need to re-enable it). No such user exists in this
  // application; embedders of these operators inherit the flag.
  ImageIO.setUseCache(false)

  /** Decoded container metadata. For images `n_frames` is the frame count
    * (GIFs may exceed 1); for WAV audio `width` carries the sample rate,
    * `height` the channel count and `n_frames` the PCM frame count —
    * the audio analog of a frame. Unparseable payloads yield
    * ("unknown", 0, 0, 0).
    */
  final case class MediaMeta(format: String, width: Long, height: Long,
                             n_frames: Long)

  // ------------------------------------------------------------- parsers

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) | (u8(b, i + 2).toLong << 16) |
      (u8(b, i + 3).toLong << 24)

  /** PNG: 8-byte signature, then the IHDR chunk (width/height big-endian
    * at byte 16/20).
    */
  private def parsePng(b: Array[Byte]): Option[MediaMeta] =
    if (b.length >= 24 && u8(b, 0) == 0x89 && b(1) == 'P' && b(2) == 'N' &&
        b(3) == 'G' && b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')
      Some(MediaMeta("png", be32(b, 16), be32(b, 20), 1L))
    else None

  /** JPEG: FF D8, then marker segments; the SOFn marker (C0-CF minus
    * C4/C8/CC) carries height/width big-endian at +5/+7. Spec-legal fill
    * bytes (repeated 0xFF before a marker) are skipped; EOI ends the walk.
    */
  private def parseJpeg(b: Array[Byte]): Option[MediaMeta] = {
    if (b.length < 4 || u8(b, 0) != 0xff || u8(b, 1) != 0xd8) return None
    var i = 2
    while (i + 9 < b.length) {
      if (u8(b, i) != 0xff) return None
      val marker = u8(b, i + 1)
      if (marker == 0xff) i += 1 // fill byte padding before a marker
      else if (marker == 0xd9) return None // EOI with no SOF seen
      else if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7)) i += 2 // standalone
      else if (marker >= 0xc0 && marker <= 0xcf &&
               marker != 0xc4 && marker != 0xc8 && marker != 0xcc)
        return Some(MediaMeta("jpeg", be16(b, i + 7), be16(b, i + 5), 1L))
      else i += 2 + be16(b, i + 2) // segment length includes its own 2 bytes
    }
    None
  }

  /** GIF: 6-byte version, logical screen descriptor (width/height LE at
    * 6/8), then a block walk counting image descriptors (0x2C) — the
    * real frame count — skipping extension sub-block chains.
    */
  private def parseGif(b: Array[Byte]): Option[MediaMeta] = {
    if (b.length < 13 || b(0) != 'G' || b(1) != 'I' || b(2) != 'F') return None
    val w = le16(b, 6)
    val h = le16(b, 8)
    val packed = u8(b, 10)
    var i = 13 + (if ((packed & 0x80) != 0) 3 * (2 << (packed & 7)) else 0)
    var frames = 0L
    def skipSubBlocks(): Unit = {
      while (i < b.length && u8(b, i) != 0) i += 1 + u8(b, i)
      i += 1 // the 0 terminator
    }
    while (i < b.length && u8(b, i) != 0x3b) {
      u8(b, i) match {
        case 0x21 => i += 2; skipSubBlocks() // extension: label + sub-blocks
        case 0x2c => // image descriptor + optional local color table + data
          frames += 1
          val lp = u8(b, i + 9)
          i += 10 + (if ((lp & 0x80) != 0) 3 * (2 << (lp & 7)) else 0)
          i += 1 // LZW min code size
          skipSubBlocks()
        case _ => return Some(MediaMeta("gif", w, h, math.max(frames, 1L)))
      }
    }
    Some(MediaMeta("gif", w, h, math.max(frames, 1L)))
  }

  /** BMP: "BM", BITMAPINFOHEADER width/height little-endian at 18/22
    * (height may be negative for top-down rows — absolute value).
    */
  private def parseBmp(b: Array[Byte]): Option[MediaMeta] =
    if (b.length >= 26 && b(0) == 'B' && b(1) == 'M')
      Some(MediaMeta("bmp", le32(b, 18), math.abs(le32(b, 22).toInt).toLong, 1L))
    else None

  /** WAV: RIFF/WAVE container; walk chunks for fmt (channels LE16 at +2,
    * sample rate LE32 at +4) and data (size → PCM frame count).
    */
  private def parseWav(b: Array[Byte]): Option[MediaMeta] = {
    if (b.length < 36 || b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F' ||
        b(8) != 'W' || b(9) != 'A' || b(10) != 'V' || b(11) != 'E') return None
    var i = 12
    var rate = 0L; var channels = 0L; var bytesPerFrame = 1L; var dataBytes = 0L
    while (i + 8 <= b.length) {
      val id = new String(b, i, 4, "US-ASCII")
      val size = le32(b, i + 4)
      if (size < 0 || size > b.length) return None // corrupt chunk size
      if (id == "fmt ") {
        if (i + 22 > b.length) return None
        channels = le16(b, i + 10)
        rate = le32(b, i + 12)
        bytesPerFrame = math.max(1L, le16(b, i + 20)) // block align
      } else if (id == "data") dataBytes = size
      i += 8 + size.toInt + (size.toInt & 1) // chunks are word-aligned
    }
    if (rate == 0) None
    else Some(MediaMeta("wav", rate, channels, dataBytes / bytesPerFrame))
  }

  /** Video container metadata from a real ISO-BMFF (MP4) box walk. */
  final case class VideoStats(width: Long, height: Long, timescale: Long,
                              duration_ms: Long, n_frames: Long,
                              video_tracks: Long)

  private final case class Mp4Box(tpe: String, start: Int, end: Int)

  /** Children of a box-payload range as (type, start, end); malformed
    * sizes (64-bit extended size==1, size in (0,8), overflow past the
    * range) yield Nil — the caller then simply finds nothing.
    */
  private def mp4Boxes(b: Array[Byte], from: Int, until: Int): List[Mp4Box] = {
    val out = List.newBuilder[Mp4Box]
    var i = from
    while (i + 8 <= until) {
      val size = be32(b, i)
      if (size == 1 || (size != 0 && size < 8)) return Nil
      val end = if (size == 0) until else i + size.toInt
      if (end > until || end <= i) return Nil
      out += Mp4Box(new String(b, i + 4, 4, "US-ASCII"), i, end)
      i = end
    }
    out.result()
  }

  /** MP4/ISO-BMFF: real box walk (bounds-checked). Requires a leading
    * `ftyp`; reads `moov/mvhd` (timescale, duration), and for each `trak`
    * whose `mdia/hdlr` handler is 'vide': `tkhd` width/height (16.16
    * fixed) and the `mdia/minf/stbl/stts` entry sample counts — the real
    * frame count, which lives three containers deep, so a matching oracle
    * proves the walk runs. Malformed structure → None.
    */
  def parseMp4(b: Array[Byte]): Option[VideoStats] = {
    if (b.length < 16 || !(b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p'))
      return None
    val top = mp4Boxes(b, 0, b.length)
    val moov = top.find(_.tpe == "moov").getOrElse(return None)
    val moovKids = mp4Boxes(b, moov.start + 8, moov.end)
    val mvhd = moovKids.find(_.tpe == "mvhd").getOrElse(return None)
    if (mvhd.end < mvhd.start + 28) return None
    val timescale = be32(b, mvhd.start + 20)
    val duration = be32(b, mvhd.start + 24)
    if (timescale <= 0) return None

    var width = 0L; var height = 0L; var frames = 0L; var videoTracks = 0L
    moovKids.filter(_.tpe == "trak").foreach { trak =>
      val kids = mp4Boxes(b, trak.start + 8, trak.end)
      val mdiaKids = kids.find(_.tpe == "mdia")
        .map(m => mp4Boxes(b, m.start + 8, m.end)).getOrElse(Nil)
      val isVide = mdiaKids.find(_.tpe == "hdlr").exists(h =>
        h.end >= h.start + 20 &&
          new String(b, h.start + 16, 4, "US-ASCII") == "vide")
      if (isVide) {
        videoTracks += 1
        kids.find(_.tpe == "tkhd").filter(t => t.end >= t.start + 92).foreach { t =>
          if (width == 0) {
            width = be32(b, t.start + 84) >> 16
            height = be32(b, t.start + 88) >> 16
          }
        }
        val stbl = mdiaKids.find(_.tpe == "minf")
          .map(m => mp4Boxes(b, m.start + 8, m.end)).getOrElse(Nil)
          .find(_.tpe == "stbl")
          .map(s => mp4Boxes(b, s.start + 8, s.end)).getOrElse(Nil)
        stbl.find(_.tpe == "stts").foreach { s =>
          if (s.end >= s.start + 16) {
            val entries = be32(b, s.start + 12)
            var e = 0
            while (e < entries && s.start + 16 + 8 * e + 8 <= s.end) {
              frames += be32(b, s.start + 16 + 8 * e); e += 1
            }
          }
        }
      }
    }
    if (videoTracks == 0) None
    else Some(VideoStats(width, height, timescale,
      duration * 1000L / timescale, frames, videoTracks))
  }

  private val Unknown = MediaMeta("unknown", 0L, 0L, 0L)

  /** Executor-side decode: sniff + parse real container headers. Corrupt,
    * truncated or null payloads degrade to "unknown" — a single bad row
    * must never fail a full-corpus decode pass.
    */
  def decodeLocal(bytes: Array[Byte]): MediaMeta =
    if (bytes == null) Unknown
    else
      try parsePng(bytes).orElse(parseJpeg(bytes)).orElse(parseGif(bytes))
        .orElse(parseBmp(bytes)).orElse(parseWav(bytes))
        .orElse(parseMp4(bytes).map(v =>
          MediaMeta("mp4", v.width, v.height, v.n_frames)))
        .getOrElse(Unknown)
      catch { case _: IndexOutOfBoundsException | _: NegativeArraySizeException => Unknown }

  /** `binary` payload column → decoded metadata struct
    * (format, width, height, n_frames).
    */
  def decodeMeta(payload: Column): Column = {
    val f = udf { (bytes: Array[Byte]) => decodeLocal(bytes) }
    f(payload)
  }

  /** Resize result: source dims from the REAL pixel decode, output dims
    * read back from the resized raster (proof the transform ran).
    */
  final case class ResizedMeta(format: String, width: Long, height: Long,
                               new_width: Long, new_height: Long)

  /** Max pixel count a declared header may claim before we refuse to hand
    * the payload to `ImageIO.read` — a crafted header declaring huge
    * dimensions would otherwise trigger a full-raster allocation before
    * any decode-time bound applies (≈64 MP ⇒ ≤256 MB ARGB raster).
    */
  private val MaxDecodePixels = 64L * 1024 * 1024

  /** REAL pixel decode + resize — the executor-side image transform stage
    * of a multimodal pipeline: `ImageIO.read` decodes the full raster
    * (not just headers), the image is scaled to fit `maxDim` preserving
    * aspect, and the output dims are read back from the resized raster.
    * Aspect math is integer (`new_w = max(1, w·maxDim / max(w,h))`,
    * floor division) so an oracle can predict the output dimensions.
    * Non-image, undecodable, or implausibly-huge-header payloads → None
    * (row drops): a single bad row must never fail a full-corpus pass,
    * so the catch is NonFatal, not just IOException — codec internals
    * throw RuntimeExceptions (CMMException, array faults) on
    * corrupt-but-sniffable bytes.
    */
  def resizeLocal(bytes: Array[Byte], maxDim: Int): Option[ResizedMeta] =
    try {
      val meta = decodeLocal(bytes)
      if (!Set("png", "jpeg", "gif", "bmp").contains(meta.format)) None
      else if (meta.width <= 0 || meta.height <= 0 ||
               meta.width * meta.height > MaxDecodePixels) None
      else Option(ImageIO.read(new java.io.ByteArrayInputStream(bytes))).map { img =>
        val w = img.getWidth
        val h = img.getHeight
        val m = math.max(w, h)
        val (nw, nh) =
          if (m <= maxDim) (w, h)
          else (math.max(1, w * maxDim / m), math.max(1, h * maxDim / m))
        val out = new BufferedImage(nw, nh, BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        g.drawImage(img, 0, 0, nw, nh, null)
        g.dispose()
        ResizedMeta(meta.format, w, h, out.getWidth.toLong, out.getHeight.toLong)
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Column form of [[resizeLocal]]: null (→ droppable) for non-images. */
  def resizeMeta(payload: Column, maxDim: Int): Column = {
    val f = udf { (bytes: Array[Byte]) =>
      if (bytes == null) None else resizeLocal(bytes, maxDim)
    }
    f(payload)
  }

  /** Audio feature stage: real PCM statistics from the data chunk — the
    * audio analog of the pixel-decode stage. `peak`/`rms` can only come
    * from actually reading the samples (headers don't carry them), so a
    * matching oracle row proves the PCM bytes were decoded. 16-bit PCM
    * only; anything else → None (row drops, never fails the pass).
    */
  final case class AudioStats(sample_rate: Long, channels: Long,
                              n_frames: Long, duration_ms: Long,
                              peak: Long, rms: Double)

  def audioStatsLocal(bytes: Array[Byte]): Option[AudioStats] = try {
    if (bytes == null || bytes.length < 44 ||
        bytes(0) != 'R' || bytes(1) != 'I' || bytes(2) != 'F' || bytes(3) != 'F' ||
        bytes(8) != 'W' || bytes(9) != 'A' || bytes(10) != 'V' || bytes(11) != 'E')
      return None
    var i = 12
    var rate = 0L; var channels = 0L; var bytesPerFrame = 1L; var bits = 0L
    var dataOff = -1; var dataLen = 0
    while (i + 8 <= bytes.length) {
      val id = new String(bytes, i, 4, "US-ASCII")
      val size = le32(bytes, i + 4)
      if (size < 0 || size > bytes.length) return None
      if (id == "fmt ") {
        if (i + 24 > bytes.length) return None
        channels = le16(bytes, i + 10)
        rate = le32(bytes, i + 12)
        bytesPerFrame = math.max(1L, le16(bytes, i + 20))
        bits = le16(bytes, i + 22)
      } else if (id == "data") { dataOff = i + 8; dataLen = size.toInt }
      i += 8 + size.toInt + (size.toInt & 1)
    }
    if (rate == 0 || channels == 0 || bits != 16 || dataOff < 0) None
    else {
      val n = math.min(dataLen, bytes.length - dataOff) / 2
      var k = 0; var peak = 0L; var sumSq = 0L
      while (k < n) {
        val s = (le16(bytes, dataOff + 2 * k).toShort).toLong
        val a = math.abs(s)
        if (a > peak) peak = a
        sumSq += s * s
        k += 1
      }
      val frames = n / channels
      val rms = if (n == 0) 0.0 else math.sqrt(sumSq.toDouble / n)
      Some(AudioStats(rate, channels, frames, frames * 1000L / rate, peak, rms))
    }
  } catch { case scala.util.control.NonFatal(_) => None }

  /** Column form of [[audioStatsLocal]]: null (→ droppable) otherwise. */
  def audioStats(payload: Column): Column = {
    val f = udf { (bytes: Array[Byte]) =>
      if (bytes == null) None else audioStatsLocal(bytes)
    }
    f(payload)
  }

  /** Video feature stage: [[parseMp4]] with the same a-bad-row-never-fails
    * contract as the other stages.
    */
  def videoStatsLocal(bytes: Array[Byte]): Option[VideoStats] =
    try { if (bytes == null) None else parseMp4(bytes) }
    catch { case scala.util.control.NonFatal(_) => None }

  /** Column form of [[videoStatsLocal]]: null (→ droppable) for non-MP4. */
  def videoStats(payload: Column): Column = {
    val f = udf { (bytes: Array[Byte]) => videoStatsLocal(bytes) }
    f(payload)
  }

  // --------------------------------------------------------- synthesis

  private def hashHex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def hx(hex: String, from: Int, len: Int): Long =
    java.lang.Long.parseLong(hex.substring(from, from + len), 16)

  /** Deterministic real-format payload for a document: format rotates by
    * id over png/jpeg/gif/bmp/wav; image dimensions (8·(1+h%32), ≤ 256)
    * and WAV shape derive from the md5 of the text, so an oracle can
    * predict the decoded metadata while the bytes remain genuine
    * container structure produced by real encoders.
    */
  def synthesizePayload(id: Long, text: String): Array[Byte] = {
    val hex = hashHex(text)
    math.floorMod(id, 5L) match {
      case 4 =>
        val rate = 8000 * (1 + hx(hex, 0, 2) % 4)
        val channels = 1 + hx(hex, 2, 2) % 2
        val frames = 100 + hx(hex, 4, 2)
        val amp = 1000 + hx(hex, 6, 3) % 4000
        wavBytes(rate.toInt, channels.toInt, frames.toInt, amp.toInt)
      case fmt =>
        val w = 8 * (1 + hx(hex, 0, 2) % 32)
        val h = 8 * (1 + hx(hex, 2, 2) % 32)
        val rgb = (hx(hex, 4, 6) & 0xffffff).toInt
        val formats = Seq("png", "jpg", "gif", "bmp")
        imageBytes(w.toInt, h.toInt, rgb, formats(fmt.toInt))
    }
  }

  /** Real encoder output via `javax.imageio` (pure JVM, headless-safe). */
  def imageBytes(w: Int, h: Int, rgb: Int, format: String): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setColor(new java.awt.Color(rgb))
    g.fillRect(0, 0, w, h)
    g.dispose()
    val out = new ByteArrayOutputStream()
    require(ImageIO.write(img, format, out), s"no $format encoder")
    out.toByteArray
  }

  /** Minimal valid 16-bit PCM RIFF/WAVE file. `amplitude` = 0 yields
    * silence; otherwise a ±amplitude square wave alternating per frame
    * (all channels in phase) — every sample has magnitude `amplitude`,
    * so rms = peak = amplitude exactly, which a SQL oracle can predict
    * while the values themselves live only in the PCM data chunk.
    */
  def wavBytes(sampleRate: Int, channels: Int, frames: Int,
               amplitude: Int = 0): Array[Byte] = {
    val bytesPerFrame = channels * 2
    val dataSize = frames * bytesPerFrame
    val bb = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * bytesPerFrame).putShort(bytesPerFrame.toShort).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataSize)
    var f = 0
    while (f < frames) {
      val s = (if (f % 2 == 0) amplitude else -amplitude).toShort
      var c = 0
      while (c < channels) { bb.putShort(s); c += 1 }
      f += 1
    }
    bb.array()
  }

  // --- MP4 synthesis: a real ISO-BMFF writer (box sizes computed
  // bottom-up), so the parser is exercised against genuine nested
  // container structure: ftyp + moov(mvhd, trak(tkhd,
  // mdia(mdhd, hdlr 'vide', minf(stbl(stts))))) + mdat.

  private def mp4Box(tpe: String, payloads: Array[Byte]*): Array[Byte] = {
    val size = 8 + payloads.map(_.length).sum
    val bb = java.nio.ByteBuffer.allocate(size) // big-endian by default
    bb.putInt(size).put(tpe.getBytes("US-ASCII"))
    payloads.foreach(bb.put)
    bb.array()
  }

  private def beInts(xs: Int*): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 * xs.length)
    xs.foreach(bb.putInt)
    bb.array()
  }

  private def beShorts(xs: Int*): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(2 * xs.length)
    xs.foreach(x => bb.putShort(x.toShort))
    bb.array()
  }

  private val UnityMatrix =
    beInts(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)

  /** Minimal valid single-video-track MP4. `delta` is the per-sample
    * duration in `timescale` units; mvhd/tkhd/mdhd durations are
    * `frames·delta`.
    */
  def mp4Bytes(width: Int, height: Int, timescale: Int, delta: Int,
               frames: Int): Array[Byte] = {
    val duration = frames * delta
    val ftyp = mp4Box("ftyp", "isom".getBytes("US-ASCII"), beInts(0),
      "isom".getBytes("US-ASCII"))
    val mvhd = mp4Box("mvhd", beInts(0, 0, 0, timescale, duration, 0x10000),
      beShorts(0x0100, 0), beInts(0, 0), UnityMatrix,
      beInts(0, 0, 0, 0, 0, 0, 2))
    val tkhd = mp4Box("tkhd", beInts(7, 0, 0, 1, 0, duration, 0, 0),
      beShorts(0, 0, 0, 0), UnityMatrix, beInts(width << 16, height << 16))
    val mdhd = mp4Box("mdhd", beInts(0, 0, 0, timescale, duration),
      beShorts(0x55c4, 0))
    val hdlr = mp4Box("hdlr", beInts(0, 0), "vide".getBytes("US-ASCII"),
      beInts(0, 0, 0), Array[Byte](0))
    val stts = mp4Box("stts", beInts(0, 1, frames, delta))
    val minf = mp4Box("minf", mp4Box("stbl", stts))
    val mdia = mp4Box("mdia", mdhd, hdlr, minf)
    val trak = mp4Box("trak", tkhd, mdia)
    val moov = mp4Box("moov", mvhd, trak)
    val mdat = mp4Box("mdat", new Array[Byte](8))
    ftyp ++ moov ++ mdat
  }

  /** Deterministic MP4 payload for a document: every shape parameter
    * derives from md5(text) (same convention as [[synthesizePayload]]) so
    * a SQL oracle predicts the parsed metadata while the bytes remain a
    * genuine nested ISO-BMFF structure. 24-fps-style timing: `delta =
    * timescale/24` exactly (timescale is a multiple of 600).
    */
  def synthesizeVideoPayload(text: String): Array[Byte] = {
    val hex = hashHex(text)
    val w = 16 * (1 + hx(hex, 0, 2) % 80) // ≤ 1280
    val h = 16 * (1 + hx(hex, 2, 2) % 45) // ≤ 720
    val ts = 600 * (1 + hx(hex, 4, 1) % 4)
    val frames = 24 + hx(hex, 5, 2)
    mp4Bytes(w.toInt, h.toInt, ts.toInt, (ts / 24).toInt, frames.toInt)
  }

  /** Demo pipeline over a text table: synthesize a real media payload per
    * row (executor-side), decode its actual container headers back. At
    * production scale the payload column comes from a binary-file or
    * Parquet BLOB scan instead of [[synthesizePayload]].
    */
  def mediaMeta(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val payloadUdf = udf { (id: Long, text: String) =>
      if (text == null) null else synthesizePayload(id, text)
    }
    df.select(col(idCol), decodeMeta(
        payloadUdf(col(idCol).cast("long"), col(textCol))).as("m"))
      .select(col(idCol), col("m.format").as("format"),
        col("m.width").as("width"), col("m.height").as("height"),
        col("m.n_frames").as("n_frames"))
  }
}
