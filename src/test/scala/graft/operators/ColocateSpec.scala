package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ColocateSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("bucketed tables join with zero exchanges") {
    val orders = (1L to 1000L).map(i => (i, s"o$i")).toDF("k", "ov")
    val items = (1L to 3000L).map(i => (i % 1000 + 1, s"i$i")).toDF("k", "iv")
    Colocate.writeBucketed(orders, "b_orders", "k", buckets = 8)
    Colocate.writeBucketed(items, "b_items", "k", buckets = 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      val joined = spark.table("b_orders").join(spark.table("b_items"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$plan")
      assert(joined.count() == 3000)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      Colocate.dropTables(spark, "b_orders", "b_items")
    }
  }

  test("salted join spreads a hot key and matches the plain join") {
    // pathological skew: 90% of probe rows share one key
    val probe = (1 to 2000).map { i =>
      (if (i % 10 == 0) (i % 50).toLong else 7L, s"p$i")
    }.toDF("k", "pv")
    val build = (0L to 50L).map(k => (k, s"d$k")).toDF("k", "dv")

    val salted = Colocate.saltedJoin(probe, build, "k", salts = 8)
    val plain = probe.join(build, "k")
    // identical result set
    assert(salted.select("k", "pv", "dv").except(plain.select("k", "pv", "dv")).isEmpty)
    assert(plain.select("k", "pv", "dv").except(salted.select("k", "pv", "dv")).isEmpty)
    // the shuffle key includes the salt: the hot key occupies many partitions
    val plan = salted.queryExecution.executedPlan.toString
    assert(plan.contains("__salt"), s"salt must reach the join key:\n$plan")
  }

  test("salted sum equals plain sum under a hot key") {
    val df = (1 to 5000).map(i => (if (i % 20 == 0) i % 7 else 3, i.toDouble))
      .toDF("k", "v")
    val salted = Colocate.saltedSum(df, "k", "v", salts = 16)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val plain = df.groupBy("k").agg(sum("v")).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(salted.keySet == plain.keySet)
    salted.foreach { case (k, v) => assert(math.abs(v - plain(k)) < 1e-6) }
  }
}
