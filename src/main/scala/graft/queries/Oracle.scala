package graft.queries

/** DuckDB oracle SQL — one entry per key in SparkEntry.queries whose
  * semantics are ANSI-SQL-expressible. Column aliases MUST match the
  * Spark side exactly (the driver sorts columns by name before hashing).
  */
object Oracle {
  val sql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |       sum(l_quantity) AS sum_qty,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |       count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q2_filter_project" ->
      """SELECT l_orderkey, l_linenumber,
        |       -l_extendedprice / 100.0 AS val,
        |       l_shipdate
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate <  TIMESTAMP '1999-01-01'
        |  AND l_returnflag = 'R'""".stripMargin,

    "q3_case_label" ->
      """SELECT 'event' AS kind,
        |       CASE WHEN value < 100.0 THEN 'small' ELSE 'big' END AS bucket,
        |       event_type,
        |       count(*) AS n
        |FROM events
        |GROUP BY 1, 2, 3""".stripMargin,
  )
}
