package graft.sinks

import graft.SparkTestBase
import graft.core._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class ElasticsearchSinkSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val tid = TableId.parse("app.users")
  private val schema = TableSchema(
    StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("region", StringType),
      StructField("born", DateType),
      StructField("seen", TimestampNTZType))),
    primaryKeys = Seq("k"))

  test("bulk NDJSON layout: index meta+doc, delete meta-only, reference temporal formats") {
    val ups = Seq((7L, "eu", java.sql.Date.valueOf("2020-01-02"),
      java.sql.Timestamp.valueOf("2021-03-04 05:06:07.123456")))
      .toDF("k", "region", "born", "seen")
      .withColumn("seen", $"seen".cast(TimestampNTZType))
    val dels = Seq(Tuple1(9L)).toDF("k")
    val actions = ElasticsearchBulkFormat.bulkActions(tid, schema, ups, dels)
      .as[String].collect().sorted
    assert(actions.length == 2)
    val Array(del, idx) = actions
    val idxLines = idx.split("\n")
    assert(idxLines.length == 2)
    assert(idxLines(0) == """{"index":{"_index":"app.users","_id":"7"}}""")
    assert(idxLines(1) ==
      """{"k":7,"region":"eu","born":"2020-01-02","seen":"2021-03-04 05:06:07.123456"}""")
    assert(del == """{"delete":{"_index":"app.users","_id":"9"}}""")
  }

  test("sharded index suffix from sharding key; deletes stay unsharded") {
    val ups = Seq((1L, "eu", null.asInstanceOf[java.sql.Date],
      null.asInstanceOf[java.sql.Timestamp])).toDF("k", "region", "born", "seen")
      .withColumn("seen", $"seen".cast(TimestampNTZType))
    val dels = Seq(Tuple1(1L)).toDF("k")
    val actions = ElasticsearchBulkFormat
      .bulkActions(tid, schema, ups, dels, shardingKey = Some("region"))
      .as[String].collect().sorted
    assert(actions.exists(_.startsWith("""{"index":{"_index":"app.users_eu"""")))
    assert(actions.contains("""{"delete":{"_index":"app.users","_id":"1"}}"""))
  }

  test("composite primary key joins id parts with underscore") {
    val s2 = schema.copy(primaryKeys = Seq("k", "region"))
    val ups = Seq((1L, "eu", null.asInstanceOf[java.sql.Date],
      null.asInstanceOf[java.sql.Timestamp])).toDF("k", "region", "born", "seen")
      .withColumn("seen", $"seen".cast(TimestampNTZType))
    val actions = ElasticsearchBulkFormat
      .bulkActions(tid, s2, ups, ups.select($"k", $"region").limit(0))
      .as[String].collect()
    assert(actions.head.startsWith("""{"index":{"_index":"app.users","_id":"1_eu"}}"""))
  }

  test("loopback round trip: upsert overwrites, delete removes, per-partition batching") {
    MockElasticsearchServer.reset()
    val sink = new ElasticsearchSink(MockElasticsearchServer.url(), maxActions = 3)
    sink.applySchemaChange(CreateTableEvent(tid, schema))
    def batch(rows: Seq[(Long, String)]) =
      rows.toDF("k", "region")
        .withColumn("born", lit(null).cast(DateType))
        .withColumn("seen", lit(null).cast(TimestampNTZType))
    sink.writeBatch(tid, batch((0L until 10L).map(i => (i, s"r$i"))),
      Seq.empty[Long].toDF("k"))
    assert(MockElasticsearchServer.docsOf("app.users").size == 10)
    // second batch: overwrite one, delete two
    sink.writeBatch(tid, batch(Seq((3L, "NEW"))), Seq(1L, 2L).toDF("k"))
    val docs = MockElasticsearchServer.docsOf("app.users").toMap
    assert(docs.size == 8 && !docs.contains("1") && !docs.contains("2"))
    assert(docs("3").contains(""""region":"NEW""""))
  }
}
