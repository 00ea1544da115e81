package graft.expressions

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.TextAnalysis

/** Single-pass text profile kernel: one scan of the UTF-8 bytes yields
  * every counter the text-quality battery needs — token count, token
  * byte mass, stopword hits, punctuation bytes, text bytes, and the
  * four language-marker hit counts. The composed Column formulation
  * re-tokenizes per signal (split+filter are higher-order expressions:
  * no codegen, no subexpression elimination — ~6 full string scans per
  * row, the dominant cost of every battery query); this expression IS
  * codegen'd, so whole-stage subexpression elimination evaluates it
  * ONCE per row no matter how many derived columns reference it.
  *
  * Exactness contract (differentially spec-pinned against the legacy
  * Column compositions in TextStatsKernelSpec):
  *  - tokens = runs of non-`\s` bytes, Java-regex `\s` = ASCII
  *    {space, \t, \n, \x0B, \f, \r} — multi-byte UTF-8 units are all
  *    >= 0x80, so byte-level splitting is exact for any input;
  *  - stopword hits are case-SENSITIVE (mirrors `stopwordRatio`);
  *  - marker hits compare the LOWERCASED token (mirrors `langId`'s
  *    tokens(lower(text))): ASCII fast path, full UTF8String.toLowerCase
  *    fallback for non-ASCII tokens (final-sigma context agrees because
  *    token boundaries are non-letters);
  *  - punct bytes = UTF-8 byte mass of codepoints outside
  *    `[\s\p{L}\p{N}]` — per-codepoint Character category checks match
  *    Java regex classes (isLetter == L*; N* = Nd|Nl|No). The
  *    bit-identical contract holds for WELL-FORMED UTF-8; malformed
  *    bytes (lone continuations, broken/truncated sequences) are
  *    handled deterministically — each invalid byte counts 1 punct
  *    byte and decoding resyncs at the next byte — but the legacy
  *    regexp path's exact U+FFFD byte accounting is engine-internal,
  *    so only well-formed input is differentially pinned.
  */
case class TextStats(child: Expression)
    extends UnaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"text_stats needs string, got $other")
  }

  override def dataType: DataType = TextStats.Schema

  override def nullSafeEval(input: Any): Any =
    TextStats.Kernel.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = ctx.addReferenceObj("textStatsKernel", TextStats.Kernel,
      classOf[TextStatsKernel].getName)
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $kernel.compute($s);")
  }

  override protected def withNewChildInternal(newChild: Expression): TextStats =
    copy(child = newChild)
}

object TextStats {
  val Schema: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("token_bytes", LongType, nullable = false),
    StructField("n_stops", LongType, nullable = false),
    StructField("punct_bytes", LongType, nullable = false),
    StructField("text_bytes", LongType, nullable = false),
    StructField("m_de", LongType, nullable = false),
    StructField("m_en", LongType, nullable = false),
    StructField("m_es", LongType, nullable = false),
    StructField("m_fr", LongType, nullable = false)))

  val Kernel = new TextStatsKernel(
    TextAnalysis.Stopwords.toArray,
    TextAnalysis.LangMarkers.map(_._2.toArray).toArray)

  def apply(c: Column): Column = GraftSql.column(TextStats(GraftSql.expression(c)))
}

/** The scanning kernel (a plain serializable class so generated code can
  * invoke it through a ctx reference — janino-friendly, no Scala-object
  * static-forwarder gymnastics). */
final class TextStatsKernel(stopwords: Array[String],
                            markers: Array[Array[String]])
    extends Serializable {

  private val stopBytes: Array[Array[Byte]] =
    stopwords.map(_.getBytes("UTF-8"))
  private val markerBytes: Array[Array[Array[Byte]]] =
    markers.map(_.map(_.getBytes("UTF-8")))
  private val markerUtf8: Array[Array[UTF8String]] =
    markers.map(_.map(UTF8String.fromString))

  @inline private def isWs(b: Int): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0D)

  @inline private def asciiAlnum(b: Int): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') || (b >= '0' && b <= '9')

  /** Exact-bytes equality of token slice vs candidate. */
  private def eq(bytes: Array[Byte], start: Int, len: Int,
                 cand: Array[Byte]): Boolean = {
    if (cand.length != len) return false
    var i = 0
    while (i < len) {
      if (bytes(start + i) != cand(i)) return false
      i += 1
    }
    true
  }

  /** ASCII-case-insensitive equality vs an all-lowercase-ASCII candidate. */
  private def eqLowerAscii(bytes: Array[Byte], start: Int, len: Int,
                           cand: Array[Byte]): Boolean = {
    if (cand.length != len) return false
    var i = 0
    while (i < len) {
      var b = bytes(start + i) & 0xFF
      if (b >= 'A' && b <= 'Z') b += 32
      if (b != (cand(i) & 0xFF)) return false
      i += 1
    }
    true
  }

  def compute(s: UTF8String): InternalRow = {
    val bytes = s.getBytes
    val n = bytes.length
    var nTokens = 0L
    var tokenBytes = 0L
    var nStops = 0L
    var punct = 0L
    val m = new Array[Long](markerBytes.length)

    // pass over tokens (runs of non-\s bytes)
    var i = 0
    var tokStart = -1
    while (i <= n) {
      val boundary = i == n || isWs(bytes(i) & 0xFF)
      if (!boundary && tokStart < 0) tokStart = i
      else if (boundary && tokStart >= 0) {
        val len = i - tokStart
        nTokens += 1
        tokenBytes += len
        var k = 0
        while (k < stopBytes.length) {
          if (eq(bytes, tokStart, len, stopBytes(k))) {
            nStops += 1
            k = stopBytes.length
          } else k += 1
        }
        // non-ASCII tokens take the exact toLowerCase fallback
        var ascii = true
        var a = tokStart
        while (a < i) { if ((bytes(a) & 0x80) != 0) { ascii = false; a = i } else a += 1 }
        var lang = 0
        while (lang < markerBytes.length) {
          val cands = markerBytes(lang)
          var hit = false
          if (ascii) {
            var c = 0
            while (c < cands.length && !hit) {
              if (eqLowerAscii(bytes, tokStart, len, cands(c))) hit = true
              c += 1
            }
          } else {
            val lowered = UTF8String.fromBytes(
              java.util.Arrays.copyOfRange(bytes, tokStart, i)).toLowerCase
            val cu = markerUtf8(lang)
            var c = 0
            while (c < cu.length && !hit) {
              if (lowered.equals(cu(c))) hit = true
              c += 1
            }
          }
          if (hit) m(lang) += 1
          lang += 1
        }
        tokStart = -1
      }
      i += 1
    }

    // pass over codepoints for punct byte mass
    i = 0
    while (i < n) {
      val b = bytes(i) & 0xFF
      if (b < 0x80) {
        if (!isWs(b) && !asciiAlnum(b)) punct += 1
        i += 1
      } else if (b < 0xC0) {
        // lone continuation byte: invalid UTF-8. A decoder replaces it
        // with U+FFFD (category So -> punct); count the single byte and
        // resync at the next one — the old code fell into the 2-byte
        // branch and swallowed the FOLLOWING byte (ADVICE r3).
        punct += 1
        i += 1
      } else {
        val cpLen =
          if (b >= 0xF0) 4 else if (b >= 0xE0) 3 else 2
        // validate the continuation bytes; a truncated or broken
        // sequence counts its lead byte as invalid-punct and resyncs
        // at the next byte (Java decoder replace-then-resync shape)
        var valid = i + cpLen <= n
        var j = 1
        while (valid && j < cpLen) {
          val cb = bytes(i + j) & 0xFF
          if (cb < 0x80 || cb >= 0xC0) valid = false
          j += 1
        }
        if (!valid) {
          punct += 1
          i += 1
        } else {
          var cp = b & (if (cpLen == 4) 0x07 else if (cpLen == 3) 0x0F else 0x1F)
          j = 1
          while (j < cpLen) {
            cp = (cp << 6) | (bytes(i + j) & 0x3F)
            j += 1
          }
          if (!letterOrNumber(cp)) punct += cpLen
          i += cpLen
        }
      }
    }

    new GenericInternalRow(Array[Any](
      nTokens, tokenBytes, nStops, punct, n.toLong,
      m(0), m(1), m(2), m(3)))
  }

  @inline private def letterOrNumber(cp: Int): Boolean = {
    if (Character.isLetter(cp)) true
    else {
      val t = Character.getType(cp)
      t == Character.DECIMAL_DIGIT_NUMBER ||
        t == Character.LETTER_NUMBER || t == Character.OTHER_NUMBER
    }
  }
}
