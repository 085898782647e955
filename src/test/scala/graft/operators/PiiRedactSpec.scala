package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PiiRedactSpec extends SparkSpec {
  import spark.implicits._

  private def redact(s: String): (String, Int, Int) = {
    val df = Seq(s).toDF("t")
    val (ne, nn) = TextAnalysis.piiCounts($"t")
    df.select(TextAnalysis.redactPii($"t"), ne, nn)
      .as[(String, Int, Int)].head()
  }

  test("emails mask before digit runs (one token, not NUM fragments)") {
    val (out, ne, nn) = redact("reach me at bob42@mail.example.org thanks")
    assert(out == "reach me at <EMAIL> thanks")
    assert(ne == 1 && nn == 0)
  }

  test("digit runs of 3+ mask; 1-2 digit numbers survive") {
    val (out, ne, nn) = redact("call 555-0123 ext 42 room 9")
    assert(out == "call <NUM>-<NUM> ext 42 room 9")
    assert(ne == 0 && nn == 2)
  }

  test("mixed text counts both kinds without double-counting email digits") {
    val (out, ne, nn) = redact("a1b@x.co or 12345; backup c@y.org 77")
    assert(out == "<EMAIL> or <NUM>; backup <EMAIL> 77")
    assert(ne == 2 && nn == 1)
  }

  test("clean text is untouched") {
    val (out, ne, nn) = redact("no contact information here")
    assert(out == "no contact information here")
    assert(ne == 0 && nn == 0)
  }
}
