package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("SmallDimBroadcast hints tiny join legs when built-in auto-broadcast is off") {
    GraftExtensions.install(spark)
    // disable BOTH built-in broadcast paths — only the rule's hint remains
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val fact = (1 to 10000).map(i => (i.toLong % 50, i)).toDF("k", "v")
      val dim = (0L until 50L).map(k => (k, s"name$k")).toDF("k", "name")
        .cache() // cached relation carries exact (tiny) logical stats
      dim.count()
      val joined = fact.join(dim, "k")
      joined.collect()
      val physical = joined.queryExecution.executedPlan.toString
      assert(physical.contains("BroadcastHashJoin"),
        s"expected a broadcast join from the rule's hint, got:\n$physical")
      assert(joined.count() == 10000)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations
          .filterNot(_.isInstanceOf[SmallDimBroadcast])
    }
  }

  test("rule leaves large-large joins alone") {
    GraftExtensions.install(spark, thresholdBytes = 1) // nothing is 'small'
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val a = (1 to 5000).map(i => (i.toLong % 100, i)).toDF("k", "v")
      val b = (1 to 5000).map(i => (i.toLong % 100, -i)).toDF("k", "w")
      val joined = a.join(b, "k")
      joined.collect()
      val physical = joined.queryExecution.executedPlan.toString
      assert(!physical.contains("BroadcastHashJoin"),
        s"rule must not hint with an impossible threshold:\n$physical")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations
          .filterNot(_.isInstanceOf[SmallDimBroadcast])
    }
  }
}
