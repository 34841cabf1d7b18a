package graft.operators.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** Real video CONTAINER parsing: ISO Base Media File Format (MP4/MOV,
  * ISO/IEC 14496-12 — a public byte-level spec) box-tree walk, plus the
  * Matroska/WebM EBML magic for sniffing. The JDK ships no video pixel
  * codec, so this lane is honest about its scope: header geometry,
  * timescale/duration, and track layout are REAL (parsed from the boxes a
  * camera or ffmpeg actually writes); frame pixel decode stays behind the
  * synthetic stand-in, clearly marked.
  *
  * That split matches what a 100 TB curation pipeline runs driver-side
  * anyway: metadata predicates (resolution/duration/codec filters) touch
  * only these headers — the expensive pixel decode happens after
  * admission, on the survivors.
  *
  * All methods are stateless over their arguments — executor-thread safe
  * inside `mapPartitions`.
  */
object VideoCodec {

  /** Container from magic bytes: ISO BMFF has `ftyp` at offset 4 (the
    * first box is almost universally `ftyp`); Matroska/WebM starts with
    * the EBML magic 1A 45 DF A3.
    */
  def sniff(blob: Array[Byte]): Option[String] = {
    if (blob == null || blob.length < 12) return None
    def ascii(off: Int, s: String) =
      s.indices.forall(i => blob(off + i) == s.charAt(i).toByte)
    if (ascii(4, "ftyp")) Some("mp4")
    else if ((blob(0) & 0xFF) == 0x1A && (blob(1) & 0xFF) == 0x45 &&
      (blob(2) & 0xFF) == 0xDF && (blob(3) & 0xFF) == 0xA3) Some("webm")
    else None
  }

  final case class VideoMeta(
      width: Int, height: Int, timescale: Long, durationTicks: Long,
      nTracks: Int, brand: String)

  /** `durationTicks / timescale`, in milliseconds (0 when the header
    * declares no timescale).
    */
  def durationMs(m: VideoMeta): Long =
    if (m.timescale == 0) 0L else m.durationTicks * 1000L / m.timescale

  /** Walk the ISO BMFF box tree: `ftyp` (major brand), `moov/mvhd`
    * (timescale + duration, version 0 and 1 layouts), `moov/trak/tkhd`
    * (track geometry, 16.16 fixed point — the max across tracks is the
    * presentation size; audio tracks carry 0×0), counting `trak` boxes.
    * None when the required boxes are absent or truncated — the seam
    * degrades instead of failing the partition.
    */
  def probe(blob: Array[Byte]): Option[VideoMeta] = {
    if (!sniff(blob).contains("mp4")) return None
    try {
      val buf = ByteBuffer.wrap(blob).order(ByteOrder.BIG_ENDIAN)
      var brand = ""
      var timescale = 0L
      var duration = -1L
      var width = 0
      var height = 0
      var tracks = 0

      // children of [from, to) — 32-bit sizes; size 0 = "to end of parent"
      def walk(from: Int, to: Int, depth: Int): Unit = {
        var off = from
        while (off + 8 <= to) {
          val size = buf.getInt(off).toLong & 0xFFFFFFFFL
          val kind = new String(blob, off + 4, 4, "ISO-8859-1")
          val boxEnd =
            if (size == 0) to
            else if (size == 1) return // 64-bit largesize: out of scope
            else math.min(to, off + size.toInt)
          if (size != 0 && (size < 8 || off + size > to)) return // torn box
          kind match {
            case "ftyp" if depth == 0 && boxEnd >= off + 12 =>
              brand = new String(blob, off + 8, 4, "ISO-8859-1").trim
            case "moov" => walk(off + 8, boxEnd, depth + 1)
            case "trak" => tracks += 1; walk(off + 8, boxEnd, depth + 1)
            case "mvhd" =>
              val v = blob(off + 8) & 0xFF
              if (v == 1 && boxEnd >= off + 32 + 16) {
                timescale = buf.getInt(off + 28).toLong & 0xFFFFFFFFL
                duration = buf.getLong(off + 32)
              } else if (v == 0 && boxEnd >= off + 24 + 8) {
                timescale = buf.getInt(off + 20).toLong & 0xFFFFFFFFL
                duration = buf.getInt(off + 24).toLong & 0xFFFFFFFFL
              }
            case "tkhd" =>
              val v = blob(off + 8) & 0xFF
              // width/height are the LAST 8 bytes of the box (16.16 fixed)
              val geomOff = if (v == 1) off + 96 else off + 84
              if (boxEnd >= geomOff + 8) {
                width = math.max(width, buf.getInt(geomOff) >>> 16)
                height = math.max(height, buf.getInt(geomOff + 4) >>> 16)
              }
            case _ => () // mdia/minf/… not needed; skip whole box
          }
          off = boxEnd
        }
      }
      walk(0, blob.length, 0)
      if (duration < 0) None
      else Some(VideoMeta(width, height, timescale, duration, tracks, brand))
    } catch { case _: Exception => None }
  }

  /** Deterministic minimal-but-valid ISO BMFF writer: `ftyp` + `moov`
    * holding `mvhd` (v0) and one video `trak/tkhd` — enough for any
    * spec-conformant parser to recover geometry and duration. Fixture
    * generator for the probe's round-trip verification (and a template
    * for tests elsewhere); real corpus files carry the same boxes written
    * by real muxers.
    */
  def encodeMp4Header(width: Int, height: Int, timescale: Long,
      durationTicks: Long): Array[Byte] = {
    def box(kind: String, payload: Array[Byte]): Array[Byte] = {
      val out = ByteBuffer.allocate(8 + payload.length).order(ByteOrder.BIG_ENDIAN)
      out.putInt(8 + payload.length)
      out.put(kind.getBytes("ISO-8859-1"))
      out.put(payload)
      out.array()
    }
    val ftyp = box("ftyp", {
      val b = ByteBuffer.allocate(8).order(ByteOrder.BIG_ENDIAN)
      b.put("isom".getBytes("ISO-8859-1")); b.putInt(512); b.array()
    })
    val mvhd = box("mvhd", {
      val b = ByteBuffer.allocate(100).order(ByteOrder.BIG_ENDIAN)
      b.putInt(0)                      // version 0 + flags
      b.putInt(0); b.putInt(0)         // creation/modification
      b.putInt(timescale.toInt)
      b.putInt(durationTicks.toInt)
      b.putInt(0x00010000)             // rate 1.0
      b.putShort(0x0100.toShort)       // volume 1.0
      // reserved(10) + identity matrix(36) + predefined(24) zeros, then
      b.position(b.position() + 10)
      b.putInt(0x00010000); b.position(b.position() + 12)
      b.putInt(0x00010000); b.position(b.position() + 12)
      b.putInt(0x40000000)
      b.position(b.position() + 24)
      b.putInt(2)                      // next track id
      b.array()
    })
    val tkhd = box("tkhd", {
      val b = ByteBuffer.allocate(84).order(ByteOrder.BIG_ENDIAN)
      b.putInt(7)                      // version 0, flags: enabled|in-movie|in-preview
      b.putInt(0); b.putInt(0)         // creation/modification
      b.putInt(1)                      // track id
      b.putInt(0)                      // reserved
      b.putInt(durationTicks.toInt)
      b.position(b.position() + 8)     // reserved
      b.putShort(0); b.putShort(0)     // layer, alternate group
      b.putShort(0); b.putShort(0)     // volume (video: 0), reserved
      b.putInt(0x00010000); b.position(b.position() + 12)
      b.putInt(0x00010000); b.position(b.position() + 12)
      b.putInt(0x40000000)             // identity matrix
      b.putInt(width << 16)            // 16.16 fixed
      b.putInt(height << 16)
      b.array()
    })
    val trak = box("trak", tkhd)
    val moov = box("moov", mvhd ++ trak)
    ftyp ++ moov
  }
}
