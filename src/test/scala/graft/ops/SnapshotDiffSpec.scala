package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  private def snap(rows: (Long, String, String)*) =
    rows.toDF("id", "text", "tag")

  test("diff classifies inserted / deleted / updated / unchanged") {
    val old = snap((1L, "a", "x"), (2L, "b", "x"), (3L, "c", "x"))
    val nw  = snap((2L, "b", "x"), (3L, "c2", "x"), (4L, "d", "x"))
    val out = SnapshotDiff.diff(old, nw, Seq("id"))
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "deleted", 2L -> "unchanged",
                      3L -> "updated", 4L -> "inserted"))
    val sum = SnapshotDiff.summary(old, nw, Seq("id"))
      .as[(String, Long)].collect().toMap
    assert(sum == Map("deleted" -> 1L, "unchanged" -> 1L,
                      "updated" -> 1L, "inserted" -> 1L))
  }

  test("NULL keys and NULL payload values still diff (null-safe join, hash distinguishes)") {
    val old = Seq((Option(1L), Option("a")), (None, Option("n1")))
      .toDF("id", "text")
    val nw = Seq((Option(1L), None: Option[String]), (None, Option("n2")))
      .toDF("id", "text")
    val out = SnapshotDiff.diff(old, nw, Seq("id"))
      .collect().map(r => Option(r.get(0)) -> r.getString(1)).toMap
    // value → NULL is an update, and the NULL key row diffs too
    assert(out(Some(1L)) == "updated")
    assert(out(None) == "updated")
  }

  test("applyDiff converges the table to the new snapshot, touching only changes") {
    val work = java.nio.file.Files.createTempDirectory("cdc_spec").toString
    val old = snap((1L, "a", "x"), (2L, "b", "x"), (3L, "c", "x"),
                   (5L, "e", "x"))
    val nw  = snap((2L, "b", "x"), (3L, "c2", "x"), (4L, "d", "x"),
                   (5L, "e", "x"))
    val table = graft.io.MutableTable.create(spark, s"$work/t", old)
    val audit = SnapshotDiff.applyDiff(table, nw, Seq("id"))
      .as[(String, Long)].collect().toMap
    assert(audit == Map("deleted" -> 1L, "unchanged" -> 2L,
                        "updated" -> 1L, "inserted" -> 1L))
    // final state == new snapshot exactly
    assert(table.read().as[(Long, String, String)].collect().toSet ==
      nw.as[(Long, String, String)].collect().toSet)
    // applying again is a no-op (all unchanged), still equal
    val audit2 = SnapshotDiff.applyDiff(table, nw, Seq("id"))
      .as[(String, Long)].collect().toMap
    assert(audit2 == Map("unchanged" -> 4L))
    assert(table.read().as[(Long, String, String)].collect().toSet ==
      nw.as[(Long, String, String)].collect().toSet)
  }

  test("schema and key guards") {
    val a = Seq((1L, "x")).toDF("id", "t")
    intercept[IllegalArgumentException] {
      SnapshotDiff.diff(a, Seq((1L, "x")).toDF("id", "other"), Seq("id"))
    }
    intercept[IllegalArgumentException] {
      SnapshotDiff.diff(a, a, Seq.empty)
    }
    intercept[IllegalArgumentException] {
      // no payload columns beyond the key
      SnapshotDiff.diff(Seq(1L).toDF("id"), Seq(1L).toDF("id"), Seq("id"))
    }
  }
}
