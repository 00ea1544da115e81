package graft.serialization

import scala.collection.mutable

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import ProtoWire.{Reader, Writer}

/** Row <-> `tf.train.Example` proto bytes, driven by a Spark schema — the
  * engine's boundary codec mirroring the reference's
  * `FeaturesDict.serialize_example` / `deserialize_example`
  * (dataset_grouper/serialization.py:23-48, data_loaders.py:110-113).
  *
  * Feature naming flattens nested structs with '/' (TFDS convention).
  * Type mapping (tensorflow/core/example/feature.proto):
  *  - string/binary        -> bytes_list
  *  - float/double         -> float_list  (float32 on the wire — the only
  *                            float type tf.train.Example has; doubles are
  *                            lossy across this boundary, same as TFDS)
  *  - byte/short/int/long/boolean/timestamp -> int64_list
  *  - arrays of the above  -> repeated values in the same list
  *
  * This codec is the ONLY row-shaped hot path in the engine, and it is
  * opt-in: the engine-native representation stays columnar Parquet
  * (SURVEY §1.3); protos exist for TFRecord wire compatibility.
  *
  * Null handling: tf.train.Example has no null — an absent value and an
  * empty list are the same wire state. A null scalar decodes back to
  * null (empty value list), but a null ARRAY coalesces to an empty
  * array across the round trip; callers needing the distinction must
  * encode presence explicitly (the reference has the same limitation).
  *
  * Dtype-fidelity note vs the reference: TF round-trips uint8/uint16
  * and float16 tensors (tf_utils_test.py:23-31) through the SAME wire
  * lists (int64_list / float_list) plus a dtype recorded in TFDS
  * feature metadata. Spark has no unsigned or half-precision types, so
  * this codec covers Spark's signed integrals + float/double: the wire
  * VALUES are identical (uint8 fits int64, float16 widens to float32
  * exactly), but a consumer restoring uint8/float16 TENSOR dtypes must
  * carry that dtype out-of-band, exactly as TFDS metadata does — a
  * representational gap of the engine's type system, not a data loss.
  */
final class TFExampleCodec(schema: StructType) extends Serializable {

  private case class Leaf(path: String, dataType: DataType, elem: DataType,
                          isArray: Boolean)

  // Leaves addressed by ORDINAL path (schema-declared positions), so the
  // codec works on schema-less GenericRows too.
  private val leaves: Seq[(Seq[Int], Leaf)] = {
    def walk(prefix: Seq[Int], names: Seq[String], st: StructType): Seq[(Seq[Int], Leaf)] =
      st.fields.toSeq.zipWithIndex.flatMap { case (f, i) =>
        val p = prefix :+ i
        val n = names :+ f.name
        f.dataType match {
          case s: StructType => walk(p, n, s)
          case ArrayType(et, _) =>
            Seq(p -> Leaf(n.mkString("/"), f.dataType, et, isArray = true))
          case dt => Seq(p -> Leaf(n.mkString("/"), dt, dt, isArray = false))
        }
      }
    walk(Nil, Nil, schema)
  }

  // ---------------------------------------------------------------- encode

  private def encodeFeature(leaf: Leaf, value: Any): Writer = {
    val w = new Writer
    def vals: Seq[Any] =
      if (value == null) Seq.empty
      else if (leaf.isArray) value.asInstanceOf[scala.collection.Seq[Any]].toSeq
      else Seq(value)
    leaf.elem match {
      case StringType =>
        val bl = new Writer
        vals.foreach(v => bl.writeBytesField(1, v.asInstanceOf[String].getBytes("UTF-8")))
        w.writeMessageField(1, bl) // Feature.bytes_list = 1
      case BinaryType =>
        val bl = new Writer
        vals.foreach(v => bl.writeBytesField(1, v.asInstanceOf[Array[Byte]]))
        w.writeMessageField(1, bl)
      case FloatType =>
        val fl = new Writer
        fl.writePackedFloat(1, vals.map(_.asInstanceOf[Float]))
        w.writeMessageField(2, fl) // Feature.float_list = 2
      case DoubleType =>
        val fl = new Writer
        fl.writePackedFloat(1, vals.map(v => v.asInstanceOf[Double].toFloat))
        w.writeMessageField(2, fl)
      case ByteType | ShortType | IntegerType | LongType | BooleanType |
          TimestampType | TimestampNTZType =>
        val il = new Writer
        il.writePackedInt64(1, vals.map(toInt64)) // Feature.int64_list = 3
        w.writeMessageField(3, il)
      case other =>
        throw new UnsupportedOperationException(
          s"TFExampleCodec: unsupported leaf type $other at ${leaf.path}")
    }
    w
  }

  private def toInt64(v: Any): Long = v match {
    case b: Byte    => b.toLong
    case s: Short   => s.toLong
    case i: Int     => i.toLong
    case l: Long    => l
    case b: Boolean => if (b) 1L else 0L
    case t: java.sql.Timestamp => t.getTime * 1000L + (t.getNanos / 1000) % 1000
    case t: java.time.Instant  =>
      t.getEpochSecond * 1000000L + t.getNano / 1000
    case t: java.time.LocalDateTime =>
      t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + t.getNano / 1000
  }

  /** Serialize one row to `tf.train.Example` bytes. */
  def encode(row: Row): Array[Byte] = {
    val features = new Writer // Features message
    leaves.foreach { case (path, leaf) =>
      val value = extract(row, path)
      val entry = new Writer // map<string, Feature> entry
      entry.writeStringField(1, leaf.path)
      entry.writeMessageField(2, encodeFeature(leaf, value))
      features.writeMessageField(1, entry)
    }
    val example = new Writer // Example.features = 1
    example.writeMessageField(1, features)
    example.toByteArray
  }

  private def extract(row: Row, path: Seq[Int]): Any = {
    var cur: Any = row
    path.foreach { i =>
      cur = cur match {
        case null   => null
        case r: Row => if (r.isNullAt(i)) null else r.get(i)
      }
    }
    cur
  }

  // ---------------------------------------------------------------- decode

  private sealed trait FeatureValues
  private case class BytesValues(v: mutable.ArrayBuffer[Array[Byte]]) extends FeatureValues
  private case class FloatValues(v: mutable.ArrayBuffer[Float]) extends FeatureValues
  private case class Int64Values(v: mutable.ArrayBuffer[Long]) extends FeatureValues

  private def parseFeature(r: Reader): FeatureValues = {
    var out: FeatureValues = null
    while (r.hasNext) {
      val (field, wt) = r.readTag()
      field match {
        case 1 => // bytes_list
          val bl = r.subReader()
          val buf = mutable.ArrayBuffer.empty[Array[Byte]]
          while (bl.hasNext) {
            val (f, w) = bl.readTag()
            if (f == 1 && w == ProtoWire.WtLenDelim) buf += bl.readBytes()
            else bl.skip(w)
          }
          out = BytesValues(buf)
        case 2 => // float_list (packed or unpacked)
          val fl = r.subReader()
          val buf = mutable.ArrayBuffer.empty[Float]
          while (fl.hasNext) {
            val (f, w) = fl.readTag()
            if (f == 1 && w == ProtoWire.WtLenDelim) {
              val packed = fl.subReader()
              while (packed.hasNext)
                buf += java.lang.Float.intBitsToFloat(packed.readFixed32())
            } else if (f == 1 && w == ProtoWire.WtFixed32) {
              buf += java.lang.Float.intBitsToFloat(fl.readFixed32())
            } else fl.skip(w)
          }
          out = FloatValues(buf)
        case 3 => // int64_list (packed or unpacked)
          val il = r.subReader()
          val buf = mutable.ArrayBuffer.empty[Long]
          while (il.hasNext) {
            val (f, w) = il.readTag()
            if (f == 1 && w == ProtoWire.WtLenDelim) {
              val packed = il.subReader()
              while (packed.hasNext) buf += packed.readVarint()
            } else if (f == 1 && w == ProtoWire.WtVarint) {
              buf += il.readVarint()
            } else il.skip(w)
          }
          out = Int64Values(buf)
        case _ => r.skip(wt)
      }
    }
    if (out == null) BytesValues(mutable.ArrayBuffer.empty)
    else out
  }

  private def parseExample(bytes: Array[Byte]): Map[String, FeatureValues] = {
    val out = mutable.Map.empty[String, FeatureValues]
    val ex = new Reader(bytes)
    while (ex.hasNext) {
      val (field, wt) = ex.readTag()
      if (field == 1 && wt == ProtoWire.WtLenDelim) {
        val features = ex.subReader()
        while (features.hasNext) {
          val (f, w) = features.readTag()
          if (f == 1 && w == ProtoWire.WtLenDelim) {
            val entry = features.subReader()
            var key: String = null
            var value: FeatureValues = null
            while (entry.hasNext) {
              val (ef, ew) = entry.readTag()
              ef match {
                case 1 => key = new String(entry.readBytes(), "UTF-8")
                case 2 => value = parseFeature(entry.subReader())
                case _ => entry.skip(ew)
              }
            }
            if (key != null && value != null) out(key) = value
          } else features.skip(w)
        }
      } else ex.skip(wt)
    }
    out.toMap
  }

  private def fromInt64(l: Long, dt: DataType): Any = dt match {
    case ByteType    => l.toByte
    case ShortType   => l.toShort
    case IntegerType => l.toInt
    case LongType    => l
    case BooleanType => l != 0L
    case TimestampType =>
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
        Math.floorDiv(l, 1000000L), Math.floorMod(l, 1000000L) * 1000))
    case TimestampNTZType =>
      // Spark's external row type for TimestampNTZ is LocalDateTime,
      // not java.sql.Timestamp — returning Timestamp here would make
      // createDataFrame on an NTZ schema fail / misconvert
      java.time.LocalDateTime.ofEpochSecond(
        Math.floorDiv(l, 1000000L),
        (Math.floorMod(l, 1000000L) * 1000).toInt,
        java.time.ZoneOffset.UTC)
    case other =>
      throw new IllegalArgumentException(
        s"Found a mismatch between the provided schema and an example:" +
        s" int64 feature cannot decode to $other")
  }

  /** Deserialize `tf.train.Example` bytes back to a Row of [[schema]].
    * Round-trip invariant: decode(encode(row)) == row for supported types
    * (pinned by SerializationSpec, mirroring integration_test.py:52-59).
    */
  def decode(bytes: Array[Byte]): Row = {
    val parsed = parseExample(bytes)
    def build(prefix: Seq[String], st: StructType): Row = Row.fromSeq(
      st.fields.toSeq.map { f =>
        val p = prefix :+ f.name
        f.dataType match {
          case s: StructType => build(p, s)
          case dt =>
            val key = p.mkString("/")
            val fv = parsed.getOrElse(key,
              throw new IllegalArgumentException(
                s"Found a mismatch between the provided schema and an example:" +
                s" missing feature '$key'"))
            (dt, fv) match {
              case (ArrayType(et, _), v) => decodeValues(v, et)
              case (dt, v) =>
                val vs = decodeValues(v, dt)
                if (vs.isEmpty) null else vs.head
            }
        }
      })
    build(Nil, schema)
  }

  private def decodeValues(fv: FeatureValues, elem: DataType): Seq[Any] =
    (elem, fv) match {
      case (StringType, BytesValues(v)) => v.toSeq.map(new String(_, "UTF-8"))
      case (BinaryType, BytesValues(v)) => v.toSeq
      case (FloatType, FloatValues(v))  => v.toSeq
      case (DoubleType, FloatValues(v)) => v.toSeq.map(_.toDouble)
      case (dt, Int64Values(v))         => v.toSeq.map(fromInt64(_, dt))
      case (dt, other) =>
        throw new IllegalArgumentException(
          s"feature/schema type mismatch: $dt vs $other")
    }
}
