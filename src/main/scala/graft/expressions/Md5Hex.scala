package graft.expressions

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `conv(substring(md5(x), pos, len), 16, 10)` as ONE expression
  * returning LONG — the repo's md5-anchored deterministic-hash idiom
  * (KMV sketches, CountMin/Bloom cells, HLL buckets, hashed-feature
  * weights) without the intermediate machinery: the classic chain
  * renders a 32-char hex string per value, substrings it, and parses
  * the hex back through `conv`, allocating twice and re-creating a
  * MessageDigest per call inside Spark's Md5. This expression digests
  * the input bytes once (thread-local MessageDigest) and assembles the
  * selected hex nibbles straight into a long.
  *
  * Value-identical to the chain for 1 <= len <= 15 (no conv overflow):
  * hex chars [pos, pos+len) of the lowercase md5 rendering, parsed
  * base-16 — i.e. big-endian nibbles of the digest. Null in -> null
  * out, exactly like md5/substring/conv. String inputs hash their
  * UTF-8 bytes (what md5's implicit string->binary cast does); binary
  * inputs hash raw bytes.
  */
case class Md5Hex(child: Expression, pos: Int, len: Int)
    extends UnaryExpression with Serializable {
  require(pos >= 1 && len >= 1 && len <= 15 && pos - 1 + len <= 32,
    s"md5_hex nibble window [$pos, ${pos + len}) out of range")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"md5_hex needs string or binary input, got $t")
    }

  override def dataType: DataType = LongType

  // def, not val: the child may be unresolved at construction time
  private def isString = child.dataType == StringType

  override def nullSafeEval(input: Any): Any =
    if (isString)
      Md5Hex.nibbles(input.asInstanceOf[UTF8String].getBytes, pos, len)
    else Md5Hex.nibbles(input.asInstanceOf[Array[Byte]], pos, len)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = if (isString) s"$c.getBytes()" else c
      s"${ev.value} = graft.expressions.Md5Hex.nibbles($bytes, $pos, $len);"
    })

  override protected def withNewChildInternal(newChild: Expression): Md5Hex =
    copy(child = newChild)
}

object Md5Hex {
  private val local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Hex nibbles [pos-1, pos-1+len) of md5(bytes) as an unsigned long
    * (big-endian nibble order — the base-16 parse of that hex slice). */
  def nibbles(bytes: Array[Byte], pos: Int, len: Int): Long = {
    val md = local.get()
    md.reset()
    val dig = md.digest(bytes)
    var v = 0L
    var i = pos - 1
    val end = pos - 1 + len
    while (i < end) {
      val b = dig(i >> 1) & 0xff
      v = (v << 4) | (if ((i & 1) == 0) b >>> 4 else b & 0xf)
      i += 1
    }
    v
  }

  /** The ubiquitous u32 form: first 8 hex chars as a long in
    * [0, 2^32) — `conv(substring(md5(x), 1, 8), 16, 10).cast("long")`. */
  def u32(c: Column): Column = apply(c, 1, 8)

  def apply(c: Column, pos: Int, len: Int): Column =
    GraftSql.column(Md5Hex(GraftSql.expression(c), pos, len))
}
