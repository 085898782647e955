package graft

import org.apache.spark.sql.functions._

/** Pattern-by-pattern coverage of the reference's BigQuery dialect
  * subset (btcolap.sql) — each rewrite unit-tested on the literal
  * construct shape, then the composed forms run end-to-end against the
  * equivalent DataFrame plan.
  */
class BigQueryDialectSpec extends SparkSpec {
  import spark.implicits._
  import BigQueryDialect._

  test("backticked project paths collapse to the last component") {
    assert(rewriteBackticks(
      "FROM `bigquery-public-data.crypto_bitcoin.transactions` AS tx") ==
      "FROM `transactions` AS tx")
    assert(rewriteBackticks("FROM `plain` x") == "FROM `plain` x")
  }

  test("OFFSET is 0-based passthrough, ORDINAL shifts to 0-based") {
    assert(rewriteOffsets("a[OFFSET(0)] != b[OFFSET(0)]") ==
      "a[0] != b[0]")
    assert(rewriteOffsets("a[ OFFSET( i + 1 ) ]") == "a[i + 1]")
    assert(rewriteOffsets("a[ORDINAL(3)]") == "a[(3) - 1]")
  }

  test("IGNORE NULLS dropped inside ARRAY_AGG only; window IGNORE NULLS survives") {
    val in = "SELECT ARRAY_AGG(CASE WHEN x > 0 THEN y END IGNORE NULLS) AS a, " +
      "lead(y) IGNORE NULLS OVER (ORDER BY x) AS nxt FROM t"
    val out = rewriteArrayAggIgnoreNulls(in)
    assert(out.contains("ARRAY_AGG(CASE WHEN x > 0 THEN y END) AS a"))
    assert(out.contains("lead(y) IGNORE NULLS OVER"))
  }

  test("comma UNNEST + implicit array-field segments become LATERAL VIEWs after joins") {
    val in = """SELECT tx.txid, input_addr
      |FROM transactions AS tx,
      |  tx.inputs AS input,
      |  UNNEST(input.addresses) AS input_addr
      |JOIN txid_filter ON txid_filter.hash = tx.txid
      |WHERE tx.txid > 0""".stripMargin
    val out = rewriteLaterals(in)
    assert(out.contains("JOIN txid_filter ON txid_filter.hash = tx.txid"))
    val joinAt = out.indexOf("JOIN txid_filter")
    val lat1 = out.indexOf("LATERAL VIEW explode(tx.inputs)")
    val lat2 = out.indexOf("LATERAL VIEW explode(input.addresses)")
    assert(lat1 > joinAt && lat2 > lat1,
      s"laterals must follow joins in order:\n$out")
    assert(out.contains("AS input ") && out.contains("AS input_addr"))
  }

  test("string literals are never rewritten (backticks, OFFSET, IGNORE NULLS)") {
    val in = "SELECT 'see `proj.ds.tbl` now', \"use a[OFFSET(0)]\", " +
      "ARRAY_AGG(coalesce(s, 'x IGNORE NULLS y') IGNORE NULLS) FROM t"
    val out = translate(in)
    assert(out.contains("'see `proj.ds.tbl` now'"))
    assert(out.contains("\"use a[OFFSET(0)]\""))
    assert(out.contains("'x IGNORE NULLS y'"))
    assert(out.contains("ARRAY_AGG(coalesce(s, 'x IGNORE NULLS y'))"))
  }

  test("only the ARRAY_AGG's own IGNORE NULLS is stripped, not a nested window's") {
    val in = "ARRAY_AGG(lead(a) IGNORE NULLS OVER (ORDER BY t) IGNORE NULLS)"
    assert(rewriteArrayAggIgnoreNulls(in) ==
      "ARRAY_AGG(lead(a) IGNORE NULLS OVER (ORDER BY t))")
  }

  test("paren inside a double-quoted literal does not desync the call scanner") {
    val in = "SELECT ARRAY_AGG(IF(x = \")\", a, b) IGNORE NULLS) FROM t"
    assert(translate(in) == "SELECT ARRAY_AGG(IF(x = \")\", a, b)) FROM t")
  }

  test("schema-qualified comma cross-joins keep their commas (only FROM-alias paths lateralize)") {
    val in = "SELECT * FROM ds.orders o, ds.customers c WHERE o.k = c.k"
    assert(rewriteLaterals(in) == in)
    // but a path rooted at an earlier alias IS a correlated lateral
    val lat = rewriteLaterals(
      "SELECT * FROM ds.orders o, o.items item WHERE item.x > 0")
    assert(lat.contains("LATERAL VIEW explode(o.items)"), lat)
  }

  test("join-introduced aliases are lateral roots for later segments") {
    val out = rewriteLaterals(
      "SELECT * FROM ds.orders o JOIN ds.users u ON o.uid = u.id, " +
      "u.addresses addr WHERE addr.x > 0")
    assert(out.contains("LATERAL VIEW explode(u.addresses)"), out)
    assert(out.contains("JOIN ds.users u ON o.uid = u.id"), out)
  }

  test("backticked base with no alias exposes its last component (BigQuery implicit alias)") {
    val out = rewriteLaterals(
      "SELECT * FROM `tx`, tx.inputs AS input WHERE input.v > 0")
    assert(out.contains("LATERAL VIEW explode(tx.inputs)"), out)
  }

  test("alias matching is case-insensitive") {
    val out = rewriteLaterals(
      "SELECT * FROM ds.orders Tx, tx.inputs AS input WHERE 1=1")
    assert(out.contains("LATERAL VIEW explode(tx.inputs)"), out)
  }

  test("USING joins and subquery joins learn the right aliases (not 'USING')") {
    // USING is not an alias; the implicit alias is the relation's last name
    val out1 = rewriteLaterals(
      "SELECT * FROM a JOIN ds.events USING (id), events.tags tag WHERE 1=1")
    assert(out1.contains("LATERAL VIEW explode(events.tags)"), out1)
    // subquery join with explicit alias
    val out2 = rewriteLaterals(
      "SELECT * FROM a JOIN (SELECT id, arr FROM b) s ON a.id = s.id, " +
      "s.arr item WHERE 1=1")
    assert(out2.contains("LATERAL VIEW explode(s.arr)"), out2)
    // a word merely ending in 'join' must not learn phantom aliases
    val out3 = rewriteLaterals(
      "SELECT * FROM a, b WHERE a.rejoin = b.k")
    assert(out3 == "SELECT * FROM a, b WHERE a.rejoin = b.k")
  }

  test("a -- comment trailing a FROM relation does not corrupt alias learning") {
    val out = rewriteLaterals(
      "SELECT * FROM ds.orders o -- main table\n, o.items item WHERE item.x > 0")
    assert(out.contains("LATERAL VIEW explode(o.items)"), out)
  }

  test("an apostrophe inside a -- comment does not open a phantom literal") {
    val in = "SELECT\n  -- the user's first item\n  items[OFFSET(0)] AS first\nFROM t"
    val out = translate(in)
    assert(out.contains("items[0] AS first"), out)
    assert(out.contains("-- the user's first item"), out)
  }

  test("laterals inside a subquery are rewritten too (recursion)") {
    val in = "SELECT * FROM (SELECT id FROM t, UNNEST(t.arr) AS x) s WHERE s.id > 0"
    val out = rewriteLaterals(in)
    assert(out.matches("(?s).*FROM t\\s+LATERAL VIEW explode\\(t.arr\\).*"), out)
  }

  test("unaliased parenthesized subquery learns NO phantom alias") {
    // without the guard, RelAlias would match 'flows' INSIDE the
    // subquery text, making 'flows.legs x' lateralize when it is
    // actually a schema-qualified cross-join relation
    val in = "FROM (SELECT 1 AS k FROM flows), flows.legs x"
    assert(rewriteLaterals(in) == in)
  }

  test("JOIN ON referencing a lateral alias fails with a clear error") {
    val e = intercept[IllegalArgumentException] {
      rewriteLaterals(
        "FROM t, UNNEST(t.arr) x JOIN u ON u.k = x.k WHERE 1=1")
    }
    assert(e.getMessage.contains("lateral alias"))
    assert(e.getMessage.contains("x"))
  }

  test("JOIN ON a non-lateral alias still hoists fine alongside laterals") {
    val out = rewriteLaterals(
      "FROM t, UNNEST(t.arr) x JOIN u ON u.k = t.k")
    assert(out.contains("JOIN u ON u.k = t.k"))
    assert(out.contains("LATERAL VIEW explode(t.arr)"))
    // and the lateral view text comes after the hoisted join
    assert(out.indexOf("LATERAL VIEW") > out.indexOf("JOIN u"))
  }

  test("plain comma cross-joins are left alone") {
    val in = "SELECT * FROM a, b WHERE a.k = b.k"
    assert(rewriteLaterals(in) == "SELECT * FROM a, b WHERE a.k = b.k")
  }

  test("end-to-end: reference-shaped correlated UNNEST query matches the DataFrame plan") {
    val tx = Seq(
      (1L, Seq((Seq("a1", "a2"), 100L), (Seq("a3"), 50L))),
      (2L, Seq((Seq("b1"), 10L))),
      (3L, Seq.empty[(Seq[String], Long)]))
      .toDF("txid", "raw")
      .select($"txid", transform($"raw",
        s => struct(s.getField("_1").as("addresses"),
                    s.getField("_2").as("value"))).as("inputs"))
    tx.createOrReplaceTempView("bq_transactions")
    Seq(1L, 3L).toDF("hash").createOrReplaceTempView("bq_filter")

    val got = SqlFacade.bigQuerySql(spark,
      """SELECT tx.txid, input_addr AS addr, -input.value / 100000000 AS val
        |FROM `some-project.some_dataset.bq_transactions` AS tx,
        |  tx.inputs AS input,
        |  UNNEST(input.addresses) AS input_addr
        |JOIN bq_filter ON bq_filter.hash = tx.txid
        |WHERE tx.txid > 0""".stripMargin)
      .as[(Long, String, Double)].collect().toSet

    val expected = tx.join(Seq(1L, 3L).toDF("hash"),
        $"hash" === $"txid")
      .filter($"txid" > 0)
      .select($"txid", explode($"inputs").as("input"))
      .select($"txid", explode($"input.addresses").as("addr"),
              (-$"input.value" / 100000000d).as("val"))
      .as[(Long, String, Double)].collect().toSet
    assert(got == expected)
    assert(got == Set((1L, "a1", -0.000001), (1L, "a2", -0.000001),
                      (1L, "a3", -0.0000005)))
  }

  test("end-to-end: the congruent HAVING pattern (ARRAY_AGG IGNORE NULLS + OFFSET)") {
    Seq(
      (10L, "input", Some("x")), (10L, "output", Some("y")),
      (11L, "input", Some("x")), (11L, "output", Some("x")), // same addr — excluded
      (12L, "input", Some("p")), (12L, "input", Some("q")), (12L, "output", Some("r")),
      (13L, "output", Some("z")), (13L, "output", None))
      .toDF("txid", "type", "addr").createOrReplaceTempView("bq_flow")
    val got = SqlFacade.bigQuerySql(spark,
      """SELECT txid,
        |  COUNT(CASE WHEN type = 'input' THEN 1 END) AS input_count,
        |  COUNT(CASE WHEN type = 'output' THEN 1 END) AS output_count,
        |  ARRAY_AGG(CASE WHEN type = 'input' THEN addr END IGNORE NULLS) AS ia,
        |  ARRAY_AGG(CASE WHEN type = 'output' THEN addr END IGNORE NULLS) AS oa
        |FROM bq_flow
        |GROUP BY txid
        |HAVING (input_count = 1 AND output_count = 1 AND ia[OFFSET(0)] != oa[OFFSET(0)])
        |    OR (input_count > 1 AND output_count = 1)""".stripMargin)
      .select($"txid").as[Long].collect().toSet
    assert(got == Set(10L, 12L))
  }
}
