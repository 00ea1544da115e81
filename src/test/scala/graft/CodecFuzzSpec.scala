package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.serialization.TFExampleCodec

/** Seeded fuzz round-trip for the hand-rolled tf.train.Example wire
  * codec: random schemas (primitives, arrays, nested structs) x random
  * rows (with nulls) must satisfy decode(encode(row)) == row, modulo the
  * documented codec limitations (null arrays coalesce to empty; doubles
  * travel as float32). Driver-side only — no Spark session. */
class CodecFuzzSpec extends AnyFunSuite with Matchers {

  private val rng = new scala.util.Random(424242L)

  private val leafTypes: Seq[DataType] = Seq(
    StringType, BinaryType, IntegerType, LongType, ShortType, ByteType,
    BooleanType, FloatType)

  private def randomSchema(depth: Int): StructType = {
    val n = rng.nextInt(4) + 1
    StructType((0 until n).map { i =>
      val dt = rng.nextInt(if (depth > 0) 4 else 3) match {
        case 0 => leafTypes(rng.nextInt(leafTypes.size))
        case 1 => ArrayType(leafTypes(rng.nextInt(leafTypes.size)))
        case 2 => leafTypes(rng.nextInt(leafTypes.size))
        case 3 => randomSchema(depth - 1)
      }
      StructField(s"f${depth}_$i", dt)
    })
  }

  private def randomLeaf(dt: DataType): Any = dt match {
    case StringType  => rng.alphanumeric.take(rng.nextInt(12)).mkString
    case BinaryType  => Array.fill(rng.nextInt(8))(rng.nextInt().toByte)
    case IntegerType => rng.nextInt()
    case LongType    => rng.nextLong()
    case ShortType   => rng.nextInt().toShort
    case ByteType    => rng.nextInt().toByte
    case BooleanType => rng.nextBoolean()
    case FloatType   => java.lang.Float.intBitsToFloat(rng.nextInt()) match {
      case f if f.isNaN => 1.5f // NaN != NaN would fail equality, skip
      case f => f
    }
  }

  private def randomValue(dt: DataType): Any = dt match {
    case st: StructType => randomRow(st)
    case ArrayType(et, _) =>
      Seq.fill(rng.nextInt(5))(randomLeaf(et))
    case leaf =>
      if (rng.nextInt(10) == 0) null else randomLeaf(leaf)
  }

  private def randomRow(schema: StructType): Row =
    Row.fromSeq(schema.fields.toSeq.map(f => randomValue(f.dataType)))

  private def normalize(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _: ArrayType) => Seq.empty // documented coalescing
    case (b: Array[Byte], BinaryType) => b.toSeq
    case (s: scala.collection.Seq[_], ArrayType(BinaryType, _)) =>
      s.map(_.asInstanceOf[Array[Byte]].toSeq)
    case (s: scala.collection.Seq[_], ArrayType(et, _)) => s.toSeq
    case (r: Row, st: StructType) =>
      r.toSeq.zip(st.fields).map { case (x, f) => normalize(x, f.dataType) }
    case (x, _) => x
  }

  test("fuzz: 300 random schema/row pairs round-trip through the wire codec") {
    (1 to 300).foreach { i =>
      val schema = randomSchema(depth = 2)
      val codec = new TFExampleCodec(schema)
      val row = randomRow(schema)
      val back = codec.decode(codec.encode(row))
      val want = row.toSeq.zip(schema.fields).map { case (v, f) =>
        normalize(v, f.dataType)
      }
      val got = back.toSeq.zip(schema.fields).map { case (v, f) =>
        normalize(v, f.dataType)
      }
      withClue(s"case $i schema=${schema.simpleString} row=$row:") {
        got shouldBe want
      }
    }
  }

  test("fuzz: mutated/truncated bytes fail cleanly, never escape bounds") {
    // corrupting any byte of a valid message must either decode to SOME
    // row or raise a clean IllegalArgumentException — never a raw
    // ArrayIndexOutOfBounds / NegativeArraySize from a length running
    // past the buffer, and never an infinite varint loop
    val schema = StructType(Seq(
      StructField("s", StringType), StructField("xs", ArrayType(LongType)),
      StructField("f", FloatType)))
    val codec = new TFExampleCodec(schema)
    val mrng = new scala.util.Random(77L)
    (1 to 200).foreach { i =>
      val valid = codec.encode(Row(
        mrng.alphanumeric.take(6).mkString,
        Seq.fill(3)(mrng.nextLong()), mrng.nextFloat()))
      val mutated = valid.clone()
      val flips = mrng.nextInt(3) + 1
      (0 until flips).foreach { _ =>
        mutated(mrng.nextInt(mutated.length)) = mrng.nextInt().toByte
      }
      val truncated = valid.take(mrng.nextInt(valid.length))
      Seq(mutated, truncated).foreach { bytes =>
        withClue(s"case $i bytes=${bytes.toSeq}:") {
          try { codec.decode(bytes); () }
          catch { case _: IllegalArgumentException => () }
        }
      }
    }
  }

  test("fuzz: extreme int64 values survive varint encoding") {
    val schema = StructType(Seq(StructField("l", LongType)))
    val codec = new TFExampleCodec(schema)
    Seq(Long.MinValue, Long.MaxValue, -1L, 0L, 1L, Int.MinValue.toLong - 1)
      .foreach { v =>
        codec.decode(codec.encode(Row(v))).getLong(0) shouldBe v
      }
  }
}
