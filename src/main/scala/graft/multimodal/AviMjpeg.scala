package graft.multimodal

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

/** Minimal MJPEG-in-AVI codec, pure JDK: a RIFF container writer and
  * chunk-walking reader whose frames are ordinary JPEGs handled by
  * `javax.imageio`. This makes the VIDEO leg of the multimodal
  * pipeline real in this container — true width/height/frame-count/
  * fps from the AVI headers (`avih`/`strh`), and true per-frame pixel
  * decode — the role the reference's format stack plays for media
  * payloads. (MJPEG is the one video codec expressible with the
  * JDK's built-in image codecs; inter-frame codecs stay out of
  * scope.)
  *
  * Layout written/read (all little-endian):
  * `RIFF('AVI ' LIST('hdrl' avih LIST('strl' strh strf))
  *  LIST('movi' '00dc'<jpeg> ...))`
  */
object AviMjpeg {

  final case class AviMeta(width: Int, height: Int, nFrames: Int, fps: Double)

  private def fourcc(s: String): Array[Byte] = s.getBytes("US-ASCII")

  private def u32(v: Long): Array[Byte] = {
    val b = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
    b.putInt((v & 0xffffffffL).toInt)
    b.array()
  }

  /** Encode JPEG frame payloads into an AVI container. `fps` is
    * carried as dwRate/dwScale (rate = fps, scale = 1).
    */
  def encode(width: Int, height: Int, fps: Int,
      jpegFrames: Seq[Array[Byte]]): Array[Byte] = {
    require(fps > 0 && jpegFrames.nonEmpty, "need fps > 0 and at least one frame")
    def chunk(id: String, payload: Array[Byte]): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      out.write(fourcc(id)); out.write(u32(payload.length)); out.write(payload)
      if (payload.length % 2 == 1) out.write(0) // RIFF chunks pad to even
      out.toByteArray
    }
    def list(kind: String, payload: Array[Byte]): Array[Byte] =
      chunk("LIST", fourcc(kind) ++ payload)

    val avih = {
      val b = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(1000000 / fps)          // dwMicroSecPerFrame
      b.putInt(0); b.putInt(0); b.putInt(0)
      b.putInt(jpegFrames.length)      // dwTotalFrames
      b.putInt(0)
      b.putInt(1)                      // dwStreams
      b.putInt(0)
      b.putInt(width); b.putInt(height)
      // dwReserved[4] stays zero
      b.array()
    }
    val strh = {
      val b = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      b.put(fourcc("vids")); b.put(fourcc("MJPG"))
      b.putInt(0)                      // dwFlags
      b.putShort(0); b.putShort(0)     // priority, language
      b.putInt(0)                      // dwInitialFrames
      b.putInt(1)                      // dwScale
      b.putInt(fps)                    // dwRate  (fps = rate / scale)
      b.putInt(0)                      // dwStart
      b.putInt(jpegFrames.length)      // dwLength
      b.putInt(0); b.putInt(-1); b.putInt(0) // bufSize, quality, sampleSize
      b.putShort(0); b.putShort(0)     // rcFrame left, top
      b.putShort(width.toShort); b.putShort(height.toShort)
      b.array()
    }
    val strf = {
      val b = ByteBuffer.allocate(40).order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(40)                     // biSize
      b.putInt(width); b.putInt(height)
      b.putShort(1); b.putShort(24)    // planes, bitcount
      b.put(fourcc("MJPG"))            // biCompression
      b.putInt(width * height * 3)     // biSizeImage
      b.putInt(0); b.putInt(0); b.putInt(0); b.putInt(0)
      b.array()
    }
    val hdrl = list("hdrl",
      chunk("avih", avih) ++ list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi",
      jpegFrames.flatMap(f => chunk("00dc", f)).toArray)
    val body = fourcc("AVI ") ++ hdrl ++ movi
    val out = new ByteArrayOutputStream()
    out.write(fourcc("RIFF")); out.write(u32(body.length)); out.write(body)
    out.toByteArray
  }

  private def le32(bytes: Array[Byte], off: Int): Long =
    ((bytes(off) & 0xffL)) | ((bytes(off + 1) & 0xffL) << 8) |
      ((bytes(off + 2) & 0xffL) << 16) | ((bytes(off + 3) & 0xffL) << 24)

  private def tag(bytes: Array[Byte], off: Int): String =
    new String(bytes, off, 4, "US-ASCII")

  /** Container metadata from the headers — None if this is not an
    * AVI RIFF. fps = strh dwRate/dwScale (falls back to avih
    * dwMicroSecPerFrame).
    */
  def parse(bytes: Array[Byte]): Option[AviMeta] = {
    if (bytes.length < 24 || tag(bytes, 0) != "RIFF" || tag(bytes, 8) != "AVI ")
      return None
    var width = 0; var height = 0; var nFrames = 0
    var fps = 0.0; var usPerFrame = 0L
    def walk(from: Int, to: Int): Unit = {
      var off = from
      var ok = true
      while (ok && off + 8 <= to) {
        val id = tag(bytes, off)
        val size = le32(bytes, off + 4).toInt
        // corrupt size fields (negative, or past the enclosing span)
        // must degrade to "not parseable", never loop or walk off the
        // end — the caller's stub fallback depends on it
        if (size < 0 || off + 8 + size > to) ok = false
        else if (id == "LIST") walk(off + 12, off + 8 + size)
        else if (id == "avih" && size >= 40) {
          usPerFrame = le32(bytes, off + 8)
          nFrames = le32(bytes, off + 8 + 16).toInt
          width = le32(bytes, off + 8 + 32).toInt
          height = le32(bytes, off + 8 + 36).toInt
        } else if (id == "strh" && size >= 32 && tag(bytes, off + 8) == "vids") {
          val scale = le32(bytes, off + 8 + 20)
          val rate = le32(bytes, off + 8 + 24)
          if (scale > 0) fps = rate.toDouble / scale
        }
        if (ok) off += 8 + size + (size % 2) // chunks pad to even
      }
    }
    walk(12, bytes.length)
    if (width <= 0 || height <= 0) None
    else Some(AviMeta(width, height, nFrames,
      if (fps > 0) fps else if (usPerFrame > 0) 1e6 / usPerFrame else 0.0))
  }

  /** The raw JPEG payload of every '00dc' frame chunk, in stream
    * order (decode any of them with javax.imageio).
    */
  def frames(bytes: Array[Byte]): Seq[Array[Byte]] = {
    val out = Seq.newBuilder[Array[Byte]]
    def walk(from: Int, to: Int): Unit = {
      var off = from
      var ok = true
      while (ok && off + 8 <= to) {
        val id = tag(bytes, off)
        val size = le32(bytes, off + 4).toInt
        if (size < 0 || off + 8 + size > to) ok = false // corrupt size
        else {
          if (id == "LIST") walk(off + 12, off + 8 + size)
          else if (id == "00dc")
            out += java.util.Arrays.copyOfRange(bytes, off + 8, off + 8 + size)
          off += 8 + size + (size % 2)
        }
      }
    }
    if (bytes.length >= 12 && tag(bytes, 0) == "RIFF" && tag(bytes, 8) == "AVI ")
      walk(12, bytes.length)
    out.result()
  }
}
