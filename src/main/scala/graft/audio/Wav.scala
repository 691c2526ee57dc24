package graft.audio

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal RIFF/WAVE codec for mono PCM s16le — pure JVM, no external
  * libs. This is the `bytes` column codec of the clip table
  * (BASELINE.json input_hint): enough to implement the per-row invariant
  * (decode → PCM compare → SNR) and the audio feature stubs.
  */
object Wav {

  /** Encode mono s16le samples to a complete WAV byte array. */
  def encode(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII"))
    buf.putInt(36 + dataLen)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII"))
    buf.putInt(16) // PCM chunk size
    buf.putShort(1) // audio format: PCM
    buf.putShort(1) // channels: mono
    buf.putInt(sampleRate)
    buf.putInt(sampleRate * 2) // byte rate
    buf.putShort(2) // block align
    buf.putShort(16) // bits per sample
    buf.put("data".getBytes("US-ASCII"))
    buf.putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** Decode a WAV produced by [[encode]] (or any mono s16le RIFF with a
    * standard 16-byte fmt chunk). Returns (samples, sampleRate).
    */
  def decode(bytes: Array[Byte]): (Array[Short], Int) = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(bytes.length >= 44, "not a WAV: too short")
    val riff = new Array[Byte](4); buf.get(riff)
    require(new String(riff, "US-ASCII") == "RIFF", "not a WAV: no RIFF")
    buf.getInt // riff size
    val wave = new Array[Byte](4); buf.get(wave)
    require(new String(wave, "US-ASCII") == "WAVE", "not a WAV: no WAVE")
    // walk chunks to find fmt and data
    var sampleRate = 0
    var samples: Array[Short] = null
    while (buf.remaining() >= 8 && samples == null) {
      val tag = new Array[Byte](4); buf.get(tag)
      val size = buf.getInt
      new String(tag, "US-ASCII") match {
        case "fmt " =>
          val fmt = buf.getShort
          require(fmt == 1, s"not PCM: format $fmt")
          val channels = buf.getShort
          require(channels == 1, s"not mono: $channels channels")
          sampleRate = buf.getInt
          buf.getInt; buf.getShort // byte rate, block align
          val bits = buf.getShort
          require(bits == 16, s"not s16: $bits bits")
          if (size > 16) buf.position(buf.position() + (size - 16))
        case "data" =>
          val n = size / 2
          val out = new Array[Short](n)
          var i = 0
          while (i < n) { out(i) = buf.getShort; i += 1 }
          samples = out
        case _ =>
          buf.position(buf.position() + size)
      }
    }
    require(samples != null && sampleRate > 0, "missing fmt/data chunk")
    (samples, sampleRate)
  }

  /** Signal-to-noise ratio in dB of `test` against `ref` (aligned, equal
    * length): 10·log10(Σref² / Σ(ref-test)²). Infinity when identical —
    * the per-row invariant asks SNR ≥ 30 dB for rows claimed duplicate.
    */
  def snrDb(ref: Array[Short], test: Array[Short]): Double = {
    require(ref.length == test.length, "length mismatch")
    var sig = 0.0
    var noise = 0.0
    var i = 0
    while (i < ref.length) {
      val r = ref(i).toDouble
      val d = r - test(i).toDouble
      sig += r * r
      noise += d * d
      i += 1
    }
    if (noise == 0.0) Double.PositiveInfinity
    else 10.0 * math.log10(sig / noise)
  }
}
