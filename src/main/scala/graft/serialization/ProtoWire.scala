package graft.serialization

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

/** Minimal protobuf wire-format primitives — just enough to read/write
  * `tf.train.Example` / `tf.train.SequenceExample` (whose schemas are
  * public: tensorflow/core/example/{example,feature}.proto). Hand-rolled
  * so the engine has zero TensorFlow/protobuf dependencies; the wire
  * format (varint + length-delimited + fixed32) is stable and simple.
  */
object ProtoWire {

  // wire types
  val WtVarint = 0
  val WtFixed64 = 1
  val WtLenDelim = 2
  val WtFixed32 = 5

  final class Writer {
    private val out = new ByteArrayOutputStream()

    def writeVarint(v: Long): Unit = {
      var x = v
      while ((x & ~0x7fL) != 0) {
        out.write(((x & 0x7f) | 0x80).toInt)
        x >>>= 7
      }
      out.write(x.toInt)
    }

    def writeTag(fieldNumber: Int, wireType: Int): Unit =
      writeVarint((fieldNumber.toLong << 3) | wireType)

    def writeBytesField(fieldNumber: Int, data: Array[Byte]): Unit = {
      writeTag(fieldNumber, WtLenDelim)
      writeVarint(data.length.toLong)
      out.write(data)
    }

    def writeStringField(fieldNumber: Int, s: String): Unit =
      writeBytesField(fieldNumber, s.getBytes("UTF-8"))

    /** packed repeated int64 (proto2 [packed=true], as feature.proto) */
    def writePackedInt64(fieldNumber: Int, vs: Iterable[Long]): Unit = {
      val tmp = new Writer
      vs.foreach(tmp.writeVarint)
      writeBytesField(fieldNumber, tmp.toByteArray)
    }

    /** packed repeated float */
    def writePackedFloat(fieldNumber: Int, vs: Iterable[Float]): Unit = {
      val bb = ByteBuffer.allocate(4 * vs.size).order(ByteOrder.LITTLE_ENDIAN)
      vs.foreach(bb.putFloat)
      writeBytesField(fieldNumber, bb.array())
    }

    def writeMessageField(fieldNumber: Int, body: Writer): Unit =
      writeBytesField(fieldNumber, body.toByteArray)

    def toByteArray: Array[Byte] = out.toByteArray
  }

  /** Streaming reader over one message's bytes. */
  final class Reader(buf: Array[Byte], start: Int, end: Int) {
    def this(buf: Array[Byte]) = this(buf, 0, buf.length)
    private var pos = start

    def hasNext: Boolean = pos < end

    private def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"malformed proto at $pos: $msg")

    def readVarint(): Long = {
      var shift = 0
      var result = 0L
      var b = 0
      do {
        // bounds-check against THIS message's end, not the whole buffer:
        // a truncated varint must be a clean parse error, never an
        // ArrayIndexOutOfBounds or a read into sibling data
        if (pos >= end) fail("truncated varint")
        // canonical varints are <= 10 bytes (64 bits / 7); a longer run
        // would shift past 63 and silently wrap
        if (shift > 63) fail("varint exceeds 10 bytes")
        b = buf(pos) & 0xff
        pos += 1
        result |= (b & 0x7fL) << shift
        shift += 7
      } while ((b & 0x80) != 0)
      result
    }

    /** Returns (fieldNumber, wireType). */
    def readTag(): (Int, Int) = {
      val t = readVarint()
      ((t >>> 3).toInt, (t & 7).toInt)
    }

    def readLenDelim(): (Int, Int) = { // (offset, length) into buf
      val len64 = readVarint()
      // a corrupt length must not let the cursor escape the enclosing
      // submessage (reading sibling fields as if they were payload)
      if (len64 < 0 || len64 > (end - pos).toLong)
        fail(s"length $len64 exceeds remaining ${end - pos} bytes")
      val len = len64.toInt
      val off = pos
      pos += len
      (off, len)
    }

    def readBytes(): Array[Byte] = {
      val (off, len) = readLenDelim()
      java.util.Arrays.copyOfRange(buf, off, off + len)
    }

    def subReader(): Reader = {
      val (off, len) = readLenDelim()
      new Reader(buf, off, off + len)
    }

    def readFixed32(): Int = {
      if (end - pos < 4) fail("truncated fixed32")
      val v = ByteBuffer.wrap(buf, pos, 4).order(ByteOrder.LITTLE_ENDIAN).getInt
      pos += 4
      v
    }

    def readFixed64(): Long = {
      if (end - pos < 8) fail("truncated fixed64")
      val v = ByteBuffer.wrap(buf, pos, 8).order(ByteOrder.LITTLE_ENDIAN).getLong
      pos += 8
      v
    }

    def skip(wireType: Int): Unit = wireType match {
      case WtVarint   => readVarint(); ()
      case WtFixed64  => if (end - pos < 8) fail("truncated fixed64"); pos += 8
      case WtLenDelim => val (_, len) = readLenDelim(); ()
      case WtFixed32  => if (end - pos < 4) fail("truncated fixed32"); pos += 4
      case other => throw new IllegalArgumentException(s"wire type $other")
    }
  }
}
