package graft.operators.multimodal

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

/** Real audio codec on the JDK's own `javax.sound.sampled` (the WAV/AIFF/AU
  * container parsers ship with every JVM — no external library): the audio
  * half of the multimodal codec seam, sibling to [[ImageCodec]].
  *
  * WAV PCM is lossless, so an encode→decode round trip returns the exact
  * samples — which is what makes the mm07 driver verification possible:
  * every output column is computed from the DECODED side while the DuckDB
  * oracle re-derives the same numbers from the sample formula alone.
  *
  * Scope: 16-bit signed little-endian PCM (the overwhelmingly standard
  * training-corpus interchange format); the probe reports any format the
  * JDK parsers understand. All methods are stateless — safe under
  * executor-thread parallelism inside `mapPartitions`.
  */
object AudioCodec {

  /** Container from magic bytes: RIFF/WAVE, AIFF (FORM/AIFF), AU (.snd). */
  def sniff(blob: Array[Byte]): Option[String] = {
    if (blob == null || blob.length < 12) return None
    def ascii(off: Int, s: String) =
      s.indices.forall(i => blob(off + i) == s.charAt(i).toByte)
    if (ascii(0, "RIFF") && ascii(8, "WAVE")) Some("wav")
    else if (ascii(0, "FORM") && (ascii(8, "AIFF") || ascii(8, "AIFC"))) Some("aiff")
    else if (ascii(0, ".snd")) Some("au")
    else None
  }

  final case class AudioMeta(
      sampleRate: Int, channels: Int, bitsPerSample: Int, nFrames: Long,
      container: String)

  /** Header probe — format and frame count from the real container parse,
    * no sample data materialized. None when the blob is not parseable
    * audio (the seam degrades instead of failing the partition).
    */
  def probe(blob: Array[Byte]): Option[AudioMeta] =
    sniff(blob).flatMap { container =>
      try {
        val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(blob))
        try {
          val f = in.getFormat
          Some(AudioMeta(f.getSampleRate.toInt, f.getChannels,
            f.getSampleSizeInBits, in.getFrameLength, container))
        } finally in.close()
      } catch { case _: Exception => None }
    }

  /** Decode to 16-bit signed samples (interleaved when multi-channel).
    * None unless the stream is 16-bit PCM — the one format this lane
    * commits to bit-exactly.
    */
  def decodePcm16(blob: Array[Byte]): Option[Array[Short]] =
    try {
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(blob))
      try {
        val f = in.getFormat
        if (f.getSampleSizeInBits != 16 ||
          f.getEncoding != AudioFormat.Encoding.PCM_SIGNED) return None
        val bytes = in.readAllBytes()
        val n = bytes.length / 2
        val out = new Array[Short](n)
        var i = 0
        if (f.isBigEndian)
          while (i < n) {
            out(i) = (((bytes(2 * i) & 0xFF) << 8) | (bytes(2 * i + 1) & 0xFF)).toShort
            i += 1
          }
        else
          while (i < n) {
            out(i) = (((bytes(2 * i + 1) & 0xFF) << 8) | (bytes(2 * i) & 0xFF)).toShort
            i += 1
          }
        Some(out)
      } finally in.close()
    } catch { case _: Exception => None }

  /** 16-bucket amplitude histogram (bucket = |sample| / 2048, top bucket
    * absorbs full-scale −32768): the audio analogue of the image
    * luminance histogram — same fixed-length shape downstream.
    */
  def ampHistogram16(samples: Array[Short]): Array[Long] = {
    val h = new Array[Long](16)
    var i = 0
    while (i < samples.length) {
      val a = math.abs(samples(i).toInt)
      h(math.min(15, a / 2048)) += 1L
      i += 1
    }
    h
  }

  /** Deterministic mono 16-bit PCM WAV: sample i = `sample(i)`. The mm07
    * round-trip fixture generator (and the spec's).
    */
  def encodeWav(nSamples: Int, sampleRate: Int, sample: Int => Short): Array[Byte] = {
    val pcm = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val s = sample(i)
      pcm(2 * i) = (s & 0xFF).toByte            // little-endian
      pcm(2 * i + 1) = ((s >> 8) & 0xFF).toByte
      i += 1
    }
    val fmt = new AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val in = new AudioInputStream(new ByteArrayInputStream(pcm), fmt, nSamples.toLong)
    val out = new ByteArrayOutputStream()
    try AudioSystem.write(in, AudioFileFormat.Type.WAVE, out) finally in.close()
    out.toByteArray
  }
}
