package graft.video

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets.US_ASCII

/** Real, dependency-free video codecs for the multimodal video path.
  *
  * Two public container formats are decoded with nothing beyond the JDK:
  *
  *  - YUV4MPEG2 (.y4m): plain-text header + uncompressed planar frames.
  *    The whole format is a header parse + fixed-size frame strides; the
  *    luma (Y) plane is read directly.
  *  - AVI/MJPEG: RIFF container whose `movi` stream chunks are ordinary
  *    JPEG images — `javax.imageio` decodes each frame (same JDK decoder
  *    as the image path).
  *
  * Anything else (H.264 etc. — no codecs ship in this container) falls
  * back to the byte-derived pseudo-decode in MediaFeatures, flagged
  * `decoded=false`.
  */
object Video {

  /** One decoded frame: luma plane (row-major, values 0-255 in a byte)
    * plus dimensions.
    */
  final case class LumaFrame(width: Int, height: Int, y: Array[Byte])

  /** 64-bit average-hash over an 8x8 luma grid — the same perceptual
    * hash the image path computes, here from a raw luma plane.
    */
  def lumaPhash(f: LumaFrame): Long = {
    val cell = new Array[Double](64)
    val cellN = new Array[Int](64)
    val stepX = math.max(1, f.width / 64)
    val stepY = math.max(1, f.height / 64)
    var y = 0
    while (y < f.height) {
      var x = 0
      while (x < f.width) {
        val l = (f.y(y * f.width + x) & 0xFF).toDouble
        val ci = math.min(7, y * 8 / f.height) * 8 + math.min(7, x * 8 / f.width)
        cell(ci) += l
        cellN(ci) += 1
        x += stepX
      }
      y += stepY
    }
    var mean = 0.0
    var filled = 0
    var i = 0
    while (i < 64) {
      if (cellN(i) > 0) { cell(i) /= cellN(i); mean += cell(i); filled += 1 }
      i += 1
    }
    mean /= math.max(1, filled)
    var ph = 0L
    i = 0
    while (i < 64) {
      if (cellN(i) > 0 && cell(i) > mean) ph |= (1L << i)
      i += 1
    }
    ph
  }

  // ------------------------------------------------------------- YUV4MPEG2

  object Y4m {
    val Magic = "YUV4MPEG2 ".getBytes(US_ASCII)

    final case class Stream(width: Int, height: Int, fpsNum: Int,
        fpsDen: Int, frames: Vector[LumaFrame])

    def isY4m(bytes: Array[Byte]): Boolean =
      bytes != null && bytes.length > Magic.length &&
        java.util.Arrays.equals(
          java.util.Arrays.copyOf(bytes, Magic.length), Magic)

    /** Bytes per frame beyond the Y plane for a chroma tag, as a (num,
      * den) multiple of width*height; None = unsupported subsampling.
      */
    private def chromaFactor(tag: String): Option[(Int, Int)] = tag match {
      case t if t.startsWith("420") => Some((1, 2)) // 2 * (w/2 * h/2)
      case "422"                    => Some((1, 1)) // 2 * (w/2 * h)
      case "444"                    => Some((2, 1))
      case "mono"                   => Some((0, 1))
      case _                        => None
    }

    /** Parse header + all frames. Returns None on any malformation
      * (wrong magic, missing W/H, truncated frame payload) — callers
      * treat that as "not decodable", never as an error.
      */
    def decode(bytes: Array[Byte]): Option[Stream] = {
      if (!isY4m(bytes)) return None
      val headerEnd = bytes.indexOf('\n'.toByte)
      if (headerEnd < 0) return None
      val header = new String(bytes, 0, headerEnd, US_ASCII)
      var w = -1; var h = -1; var fn = 25; var fd = 1; var chroma = "420jpeg"
      header.drop(Magic.length - 1).trim.split(' ').foreach { p =>
        if (p.nonEmpty) p.charAt(0) match {
          case 'W' => w = p.drop(1).toIntOption.getOrElse(-1)
          case 'H' => h = p.drop(1).toIntOption.getOrElse(-1)
          case 'F' => p.drop(1).split(':') match {
            case Array(a, b) =>
              fn = a.toIntOption.getOrElse(25); fd = b.toIntOption.getOrElse(1)
            case _ => ()
          }
          case 'C' => chroma = p.drop(1)
          case _   => () // I/A/X params don't affect the luma read
        }
      }
      if (w <= 0 || h <= 0) return None
      val cf = chromaFactor(chroma) match {
        case Some(f) => f
        case None    => return None
      }
      val ySize = w * h
      val frameSize = ySize + ySize * cf._1 / cf._2
      val frames = Vector.newBuilder[LumaFrame]
      var pos = headerEnd + 1
      while (pos < bytes.length) {
        // each frame: "FRAME[ params]\n" + planes
        val lineEnd = bytes.indexOf('\n'.toByte, pos)
        if (lineEnd < 0) return None
        val marker = new String(bytes, pos, lineEnd - pos, US_ASCII)
        if (!marker.startsWith("FRAME")) return None
        val dataStart = lineEnd + 1
        if (dataStart + frameSize > bytes.length) return None
        frames += LumaFrame(w, h,
          java.util.Arrays.copyOfRange(bytes, dataStart, dataStart + ySize))
        pos = dataStart + frameSize
      }
      Some(Stream(w, h, fn, fd, frames.result()))
    }

    /** Encode luma frames as mono-chroma Y4M (the generation side for
      * tests and the synthetic clip table; `Cmono` = luma plane only).
      */
    def encodeMono(width: Int, height: Int, fpsNum: Int, fpsDen: Int,
        frames: Seq[Array[Byte]]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(s"YUV4MPEG2 W$width H$height F$fpsNum:$fpsDen Ip A1:1 Cmono\n"
        .getBytes(US_ASCII))
      frames.foreach { f =>
        require(f.length == width * height, "frame size mismatch")
        out.write("FRAME\n".getBytes(US_ASCII))
        out.write(f)
      }
      out.toByteArray
    }
  }

  // ------------------------------------------------------------- AVI/MJPEG

  object Avi {

    def isRiffAvi(bytes: Array[Byte]): Boolean =
      bytes != null && bytes.length >= 12 &&
        bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
        bytes(8) == 'A' && bytes(9) == 'V' && bytes(10) == 'I' && bytes(11) == ' '

    private def u32(b: Array[Byte], off: Int): Long =
      (b(off) & 0xFFL) | ((b(off + 1) & 0xFFL) << 8) |
        ((b(off + 2) & 0xFFL) << 16) | ((b(off + 3) & 0xFFL) << 24)

    private def fourcc(b: Array[Byte], off: Int): String =
      new String(b, off, 4, US_ASCII)

    /** Walk the RIFF chunk tree and return the payloads of every video
      * stream chunk (`NNdc`/`NNdb`) inside `movi` LISTs, in order. The
      * walk is tolerant: malformed sizes terminate the scan with
      * whatever was collected (a truncated 10^12-row blob yields its
      * decodable prefix, not a stage failure).
      */
    def videoChunks(bytes: Array[Byte]): Vector[Array[Byte]] = {
      val out = Vector.newBuilder[Array[Byte]]
      def isVideoId(id: String): Boolean =
        id.length == 4 && id(0).isDigit && id(1).isDigit &&
          id(2) == 'd' && (id(3) == 'c' || id(3) == 'b')
      def walk(start: Int, end: Int, inMovi: Boolean): Unit = {
        var pos = start
        while (pos + 8 <= end) {
          val id = fourcc(bytes, pos)
          val size = u32(bytes, pos + 4)
          if (size < 0 || pos + 8 + size > end) return
          val dataStart = pos + 8
          val dataEnd = (dataStart + size).toInt
          if (id == "RIFF" || id == "LIST") {
            if (size >= 4) {
              val listType = fourcc(bytes, dataStart)
              walk(dataStart + 4, dataEnd, inMovi || listType == "movi")
            }
          } else if (inMovi && isVideoId(id) && size > 0) {
            out += java.util.Arrays.copyOfRange(bytes, dataStart, dataEnd)
          }
          // chunks are word-aligned: odd sizes carry a pad byte
          pos = dataEnd + (size % 2).toInt
        }
      }
      if (!isRiffAvi(bytes)) return Vector.empty
      walk(0, bytes.length, inMovi = false)
      out.result()
    }

    /** Decode MJPEG frames to luma planes via the JDK JPEG reader. */
    def decodeMjpeg(bytes: Array[Byte]): Vector[LumaFrame] =
      videoChunks(bytes).flatMap { jpeg =>
        try Option(javax.imageio.ImageIO.read(new ByteArrayInputStream(jpeg)))
          .map { img =>
            val w = img.getWidth
            val h = img.getHeight
            val y = new Array[Byte](w * h)
            var yy = 0
            while (yy < h) {
              var x = 0
              while (x < w) {
                val rgb = img.getRGB(x, yy)
                val l = 0.299 * ((rgb >> 16) & 0xFF) +
                  0.587 * ((rgb >> 8) & 0xFF) + 0.114 * (rgb & 0xFF)
                y(yy * w + x) = math.min(255, math.round(l)).toByte
                x += 1
              }
              yy += 1
            }
            LumaFrame(w, h, y)
          }
        catch { case _: Exception => None }
      }

    private def chunk(id: String, payload: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(id.getBytes(US_ASCII))
      writeU32(out, payload.length)
      out.write(payload)
      if (payload.length % 2 == 1) out.write(0) // word alignment pad
      out.toByteArray
    }

    private def list(listType: String, payload: Array[Byte]): Array[Byte] = {
      val body = new java.io.ByteArrayOutputStream()
      body.write(listType.getBytes(US_ASCII))
      body.write(payload)
      chunk("LIST", body.toByteArray)
    }

    private def writeU32(out: java.io.ByteArrayOutputStream, v: Long): Unit = {
      out.write((v & 0xFF).toInt); out.write(((v >> 8) & 0xFF).toInt)
      out.write(((v >> 16) & 0xFF).toInt); out.write(((v >> 24) & 0xFF).toInt)
    }

    /** Minimal spec-correct MJPEG AVI: avih + one video strl (strh/strf
      * with MJPG fourcc) + movi with one `00dc` JPEG chunk per frame.
      * Generation side for tests/synthetic tables; round-trips through
      * [[decodeMjpeg]] and standard players.
      */
    def encodeMjpeg(width: Int, height: Int, fps: Int,
        jpegFrames: Seq[Array[Byte]]): Array[Byte] = {
      def u32s(vs: Long*): Array[Byte] = {
        val o = new java.io.ByteArrayOutputStream()
        vs.foreach(writeU32(o, _))
        o.toByteArray
      }
      val microSecPerFrame = 1000000L / math.max(1, fps)
      val maxBytes = if (jpegFrames.isEmpty) 0L else jpegFrames.map(_.length).max.toLong
      // AVIMAINHEADER (56 bytes after fourcc+size)
      val avih = chunk("avih", u32s(
        microSecPerFrame, maxBytes * fps, 0, 0 /*flags: no index*/,
        jpegFrames.length.toLong, 0, 1, maxBytes, width.toLong, height.toLong,
        0, 0, 0, 0))
      // AVISTREAMHEADER: fccType 'vids', fccHandler 'MJPG'
      val strh = {
        val o = new java.io.ByteArrayOutputStream()
        o.write("vids".getBytes(US_ASCII)) // fccType
        o.write("MJPG".getBytes(US_ASCII)) // fccHandler
        writeU32(o, 0) // flags
        writeU32(o, 0) // priority + language
        writeU32(o, 0) // initial frames
        writeU32(o, 1) // scale
        writeU32(o, fps.toLong) // rate (rate/scale = fps)
        writeU32(o, 0) // start
        writeU32(o, jpegFrames.length.toLong) // length
        writeU32(o, maxBytes) // suggested buffer size
        writeU32(o, 0xFFFFFFFFL) // quality
        writeU32(o, 0) // sample size
        // rcFrame (4 x u16)
        o.write(0); o.write(0); o.write(0); o.write(0)
        o.write((width & 0xFF)); o.write((width >> 8) & 0xFF)
        o.write((height & 0xFF)); o.write((height >> 8) & 0xFF)
        chunk("strh", o.toByteArray)
      }
      // BITMAPINFOHEADER, biCompression = 'MJPG'
      val strf = {
        val o = new java.io.ByteArrayOutputStream()
        writeU32(o, 40) // biSize
        writeU32(o, width.toLong)
        writeU32(o, height.toLong)
        o.write(1); o.write(0) // planes
        o.write(24); o.write(0) // bit count
        o.write("MJPG".getBytes(US_ASCII)) // compression
        writeU32(o, width.toLong * height * 3) // size image
        writeU32(o, 0); writeU32(o, 0); writeU32(o, 0); writeU32(o, 0)
        chunk("strf", o.toByteArray)
      }
      val strl = list("strl", strh ++ strf)
      val hdrl = list("hdrl", avih ++ strl)
      val moviBody = jpegFrames.toArray.flatMap(f => chunk("00dc", f))
      val movi = list("movi", moviBody)
      val riffBody = new java.io.ByteArrayOutputStream()
      riffBody.write("AVI ".getBytes(US_ASCII))
      riffBody.write(hdrl)
      riffBody.write(movi)
      val payload = riffBody.toByteArray
      val out = new java.io.ByteArrayOutputStream()
      out.write("RIFF".getBytes(US_ASCII))
      writeU32(out, payload.length)
      out.write(payload)
      out.toByteArray
    }

    /** JPEG-encode a luma plane via the JDK writer (test/gen helper). */
    def jpegOfLuma(f: LumaFrame): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        f.width, f.height, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < f.height) {
        var x = 0
        while (x < f.width) {
          val l = f.y(y * f.width + x) & 0xFF
          img.setRGB(x, y, (l << 16) | (l << 8) | l)
          x += 1
        }
        y += 1
      }
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", out)
      out.toByteArray
    }
  }
}
