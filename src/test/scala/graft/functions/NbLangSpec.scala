package graft.functions

import graft.SparkSpec
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** The trainable naive-Bayes langid's kernel contracts
  * (TextKernels.charBigramBuckets / nbArgmax) and the end-to-end
  * train-predict loop — the arithmetic the t271 DuckDB oracle
  * replays, pinned here at unit scale.
  */
class NbLangSpec extends SparkSpec {
  private val B = 4096

  private def buckets(s: String): Seq[Int] = {
    val a = TextKernels.charBigramBuckets(UTF8String.fromString(s), B)
    (0 until a.numElements()).map(a.getInt)
  }

  test("charBigramBuckets: ASCII bigrams are (cp1 + 2*cp2) mod B, " +
       "in text order, length = chars - 1") {
    // "abc" -> (97 + 2*98) = 293, (98 + 2*99) = 296
    assert(buckets("abc") === Seq(293, 296))
    // whitespace is a character like any other (the oracle's substr
    // replay has no tokenizer either)
    assert(buckets("a b") === Seq(97 + 2 * 32, 32 + 2 * 98))
  }

  test("charBigramBuckets: multibyte code points decode to the same " +
       "values DuckDB unicode() reports (2-, 3-, 4-byte)") {
    // é = U+00E9 (2-byte), 中 = U+4E2D (3-byte), 😀 = U+1F600 (4-byte)
    assert(buckets("aé") === Seq((97 + 2 * 0xe9) % B))
    assert(buckets("a中") === Seq((97 + 2 * 0x4e2d) % B))
    assert(buckets("a😀") === Seq((97 + 2 * 0x1f600) % B))
    assert(buckets("中a") === Seq((0x4e2d + 2 * 97) % B))
  }

  test("charBigramBuckets: empty and 1-char texts yield no grams") {
    assert(buckets("") === Seq.empty)
    assert(buckets("x") === Seq.empty)
    assert(buckets("中") === Seq.empty)
  }

  test("nbArgmax: scores = prior + sum of bucket weights; ties take " +
       "the LARGER index (the lexicographically later language)") {
    val b1 = (97 + 2 * 98) % B // "ab"
    def w(m: Map[Int, Long]): Array[Long] =
      Array.tabulate(B)(i => m.getOrElse(i, 0L))
    // lang0 favors b1 heavily, lang1 neutral
    val weights = Array(w(Map(b1 -> 100L)), w(Map.empty))
    assert(TextKernels.nbArgmax(UTF8String.fromString("ab"),
      weights, Array(0L, 0L), B) === 0)
    // no grams: priors decide
    assert(TextKernels.nbArgmax(UTF8String.fromString("x"),
      weights, Array(-5L, -1L), B) === 1)
    // exact tie (identical weights, identical priors): later index
    assert(TextKernels.nbArgmax(UTF8String.fromString("ab"),
      Array(w(Map(b1 -> 7L)), w(Map(b1 -> 7L))), Array(3L, 3L), B) === 1)
  }

  test("nbLangTrain + nbLangPredict: a two-language toy corpus " +
       "round-trips — each held-out doc classifies to its language, " +
       "and the model's shapes are |langs| x buckets") {
    val df = spark.createDataFrame(Seq(
      (0L, "en", "the cat sat on the mat and the dog barked"),
      (2L, "en", "a cup of tea and a slice of bread"),
      (4L, "zz", "zzzq zzzq qzzz zqzq zzqq"),
      (6L, "zz", "qqzz zzzz qzqz zqqz"),
      (1L, "en", "the rain in the garden was soft"),
      (3L, "zz", "zqz zzq qzz zzz")
    )).toDF("doc_id", "lang", "text")
    val model = TextAnalysis.nbLangTrain(
      df.filter(col("doc_id") % 2 === 0), "text", "lang", B)
    assert(model.langs === Seq("en", "zz"))
    assert(model.weights.length === 2 &&
      model.weights.forall(_.length === B))
    val pred = df
      .select(col("lang"), col("doc_id"),
        TextAnalysis.nbLangPredict(col("text"), model).as("pred"))
      .collect().map(r => r.getLong(1) -> (r.getString(0), r.getString(2)))
      .toMap
    // held-out docs (odd ids) classify correctly on this separable toy
    assert(pred(1L) === ("en", "en"))
    assert(pred(3L) === ("zz", "zz"))
    // training docs too
    assert(pred(0L)._2 === "en" && pred(4L)._2 === "zz")
  }

  test("nbLangPredict: NULL text predicts NULL (nullSafeEval)") {
    val df = spark.createDataFrame(Seq(
      (0L, "en", "the the the"), (1L, "en", null.asInstanceOf[String])
    )).toDF("doc_id", "lang", "text")
    val model = TextAnalysis.nbLangTrain(
      df.filter(col("text").isNotNull), "text", "lang", B)
    val rows = df.select(col("doc_id"),
        TextAnalysis.nbLangPredict(col("text"), model).as("p"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(rows(0L) === Some("en") && rows(1L) === None)
  }
}
