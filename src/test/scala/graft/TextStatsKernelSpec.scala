package graft

import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Differential pinning of the single-pass TextStats kernel against the
  * legacy Column compositions: every derived column must be bit-equal
  * (doubles included — the kernel mirrors the exact IEEE operation
  * order) on the real corpus AND on adversarial edge strings. */
class TextStatsKernelSpec extends SparkSpec {
  import spark.implicits._

  private val edgeCases = Seq(
    "",
    " ",
    "   \t\n\f\r  ",
    "the",
    "the the the",
    "The THE tHe",                       // stopwords are case-sensitive
    "der die und das ist nicht ein zu",  // de markers
    "le la les et des un une est",       // fr markers
    "el la de que y en los se",          // es/fr overlap ('la', 'de')
    "a-b.c,d;e:f!g?h",
    "123 4567 αβγ δ123",                // greek letters (2-byte utf8)
    "café naïve über",   // accented latin
    "中文 文本",        // CJK (3-byte utf8)
    "😀 emoji 🎉 soup", // 4-byte utf8 (emoji)
    " nbsp separated",        // U+00A0 is NOT java-regex \s
    "Σοφός THE Σ", // final-sigma lowering
    "tab\tsep\nnewline end ",
    "x" * 3000,
    ("w " * 200).trim
  )

  test("kernel derived columns == legacy compositions on corpus + edges") {
    val corpus = Tables(spark, sf001, "documents").select(col("text"))
    val edges = edgeCases.toDF("text")
    Seq(corpus, edges).foreach { df =>
      val t = col("text")
      val p = TextAnalysis.profile(t)
      val diff = df.select(
        TextAnalysis.tokenCount(t).as("a1"),
        TextAnalysis.tokenCountOf(p).as("b1"),
        TextAnalysis.meanTokenLen(t).as("a2"),
        TextAnalysis.meanTokenLenOf(p).as("b2"),
        TextAnalysis.punctRatio(t).as("a3"),
        TextAnalysis.punctRatioOf(p).as("b3"),
        TextAnalysis.stopwordRatio(t).as("a4"),
        TextAnalysis.stopwordRatioOf(p).as("b4"),
        TextAnalysis.qualityScore(t).as("a5"),
        TextAnalysis.qualityScoreOf(p).as("b5"),
        TextAnalysis.langId(t).as("a6"),
        TextAnalysis.langIdOf(p).as("b6"))
        .filter(
          col("a1") =!= col("b1") ||
            // bit-exact double compare (NaN impossible: denominators
            // are guarded to 0.0)
            col("a2") =!= col("b2") || col("a3") =!= col("b3") ||
            col("a4") =!= col("b4") || col("a5") =!= col("b5") ||
            col("a6") =!= col("b6"))
      val bad = diff.collect()
      withClue(bad.take(3).mkString("\n")) { bad.length shouldBe 0 }
    }
  }

  test("kernel runs inside whole-stage codegen (not interpreted fallback)") {
    val df = Tables(spark, sf0001, "documents")
      .select(TextAnalysis.qualityScoreOf(
        TextAnalysis.profile(col("text"))).as("q"))
    // codegen spans render as a `*(n)` prefix in the plan string
    import org.apache.spark.sql.execution.WholeStageCodegenExec
    df.queryExecution.executedPlan.collectFirst {
      case w: WholeStageCodegenExec => w
    }.isDefined shouldBe true
    // and it must actually evaluate (spot value sanity)
    df.agg(min(col("q")), max(col("q"))).collect().head.anyNull shouldBe false
  }

  test("kernel counters are exact on a hand-computed example") {
    val row = Seq("The cat, the dog; und 42 élèves")
      .toDF("text")
      .select(TextAnalysis.profile(col("text")).as("p"))
      .select(col("p.*")).collect().head
    // tokens: The | cat, | the | dog; | und | 42 | élèves
    row.getAs[Long]("n_tokens") shouldBe 7L
    row.getAs[Long]("text_bytes") shouldBe
      "The cat, the dog; und 42 élèves".getBytes("UTF-8").length.toLong
    row.getAs[Long]("n_stops") shouldBe 1L // lowercase "the" only
    row.getAs[Long]("punct_bytes") shouldBe 2L // ',' and ';'
    row.getAs[Long]("m_de") shouldBe 1L // "und"
    row.getAs[Long]("m_en") shouldBe 2L // "The"->the, "the"
  }

  test("kernel: malformed UTF-8 counts per invalid byte, swallows nothing") {
    import org.apache.spark.unsafe.types.UTF8String
    val K = graft.expressions.TextStats.Kernel
    def punct(bytes: Array[Byte]): Long =
      K.compute(UTF8String.fromBytes(bytes)).getLong(3)
    // lone continuation byte: 1 invalid-punct byte; the following 'a'
    // is alnum and must NOT be consumed as a continuation
    punct(Array(0x80.toByte, 'a'.toByte)) shouldBe 1L
    // 2-byte lead followed by ASCII (broken sequence): lead counts 1,
    // decode resyncs so 'A' stays alnum
    punct(Array(0xC3.toByte, 'A'.toByte)) shouldBe 1L
    // truncated 3-byte sequence at end of input: lead 1 + orphan cont 1
    punct(Array(0xE2.toByte, 0x82.toByte)) shouldBe 2L
    // well-formed multi-byte still counted by codepoint category/mass
    punct("é".getBytes("UTF-8")) shouldBe 0L  // letter
    punct("¡".getBytes("UTF-8")) shouldBe 2L  // 2-byte punctuation
  }
}
