package graft.sinks

import graft.SparkTestBase
import graft.core._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class StreamLoadSinksSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val tid = TableId.parse("app.users")
  private val schema = TableSchema(
    StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("v", StringType),
      StructField("seen", TimestampNTZType))),
    primaryKeys = Seq("k"))

  private def ups(rows: (Long, String)*) =
    rows.toDF("k", "v").withColumn("seen",
      lit("2021-03-04 05:06:07.123456").cast(TimestampNTZType))

  test("StarRocks rows carry integer __op; delete rows are key+flag") {
    val r = StreamLoadFormats.starRocksRows(
      schema, ups(1L -> "a"), Seq(Tuple1(9L)).toDF("k"))
      .as[String].collect().sorted
    assert(r.length == 2)
    assert(r(0) ==
      """{"k":1,"v":"a","seen":"2021-03-04 05:06:07.123456","__op":0}""")
    assert(r(1) == """{"k":9,"__op":1}""")
  }

  test("upsert rows render explicit nulls like the reference's Jackson maps") {
    val withNull = Seq((1L, null.asInstanceOf[String])).toDF("k", "v")
      .withColumn("seen", lit(null).cast(TimestampNTZType))
    val r = StreamLoadFormats.starRocksRows(schema, withNull, Seq.empty[Long].toDF("k"))
      .as[String].head()
    assert(r == """{"k":1,"v":null,"seen":null,"__op":0}""")
  }

  test("Doris rows carry string __DORIS_DELETE_SIGN__") {
    val r = StreamLoadFormats.dorisRows(
      schema, ups(1L -> "a"), Seq(Tuple1(9L)).toDF("k"))
      .as[String].collect().sorted
    assert(r(0) ==
      """{"k":1,"v":"a","seen":"2021-03-04 05:06:07.123456","__DORIS_DELETE_SIGN__":"0"}""")
    assert(r(1) == """{"k":9,"__DORIS_DELETE_SIGN__":"1"}""")
  }

  test("Doris partition column: null fills with the reference's type defaults") {
    // DorisEventSerializer.java:125-147 / DorisSchemaUtils.java:46-47 — a
    // null partition value routes nowhere in Doris, so dates fill with
    // 1970-01-01, timestamp flavors with 1970-01-01 00:00:00
    val tsSchema = TableSchema(
      StructType(Seq(
        StructField("k", LongType, nullable = false),
        StructField("seen", TimestampNTZType))),
      primaryKeys = Seq("k"))
    val nullTs = Seq(Tuple1(1L)).toDF("k").withColumn("seen", lit(null).cast(TimestampNTZType))
    val filled = StreamLoadFormats.dorisRows(
      tsSchema, nullTs, Seq.empty[Long].toDF("k"), partitionKey = Some("seen"))
      .as[String].head()
    assert(filled ==
      """{"k":1,"seen":"1970-01-01 00:00:00","__DORIS_DELETE_SIGN__":"0"}""")

    val dateSchema = TableSchema(
      StructType(Seq(
        StructField("k", LongType, nullable = false),
        StructField("d", DateType))),
      primaryKeys = Seq("k"))
    val nullDate = Seq(Tuple1(2L)).toDF("k").withColumn("d", lit(null).cast(DateType))
    assert(StreamLoadFormats.dorisRows(
      dateSchema, nullDate, Seq.empty[Long].toDF("k"), partitionKey = Some("d"))
      .as[String].head() ==
      """{"k":2,"d":"1970-01-01","__DORIS_DELETE_SIGN__":"0"}""")

    // a present value is never overwritten; delete rows fill too (the
    // reference applies the fill after serializing either image)
    val present = ups(3L -> "x")
    val r = StreamLoadFormats.dorisRows(
      schema, present, Seq(Tuple1(9L)).toDF("k"), partitionKey = Some("seen"))
      .as[String].collect().sorted
    assert(r(0).contains(""""seen":"2021-03-04 05:06:07.123456""""))
    assert(r(1) ==
      """{"k":9,"seen":"1970-01-01 00:00:00","__DORIS_DELETE_SIGN__":"1"}""")

    // non-temporal partition columns pass through (reference fills only
    // temporal types); without a partition key nothing changes
    val strSchema = TableSchema(
      StructType(Seq(
        StructField("k", LongType, nullable = false),
        StructField("v", StringType))),
      primaryKeys = Seq("k"))
    val nullStr = Seq(Tuple1(4L)).toDF("k").withColumn("v", lit(null).cast(StringType))
    assert(StreamLoadFormats.dorisRows(
      strSchema, nullStr, Seq.empty[Long].toDF("k"), partitionKey = Some("v"))
      .as[String].head() == """{"k":4,"v":null,"__DORIS_DELETE_SIGN__":"0"}""")
  }

  test("loopback stream load applies flag semantics; duplicate labels dedup") {
    val server = new MockStreamLoadServer(Seq("k"))
    try {
      val sink = new StarRocksSink(server.url(), maxRows = 4)
      sink.applySchemaChange(CreateTableEvent(tid, schema))
      sink.writeBatch(tid, ups((0L until 10L).map(i => i -> s"v$i"): _*),
        Seq.empty[Long].toDF("k"))
      assert(server.docsOf("app", "users").size == 10)
      sink.writeBatch(tid, ups(3L -> "NEW"), Seq(1L, 2L).toDF("k"))
      val docs = server.docsOf("app", "users").toMap
      assert(docs.size == 8 && !docs.contains("1") && !docs.contains("2"))
      assert(docs("3").contains(""""v":"NEW""""))

      // a replayed label must NOT re-apply (server-side retry dedup)
      val client = new StreamLoadClient(server.url())
      val replay = () => {
        val http = java.net.http.HttpClient.newHttpClient()
        val req = java.net.http.HttpRequest.newBuilder()
          .uri(java.net.URI.create(s"${server.url()}/api/app/users/_stream_load"))
          .header("label", "fixed-label")
          .PUT(java.net.http.HttpRequest.BodyPublishers.ofString("""[{"k":99,"__op":0}]"""))
          .build()
        http.send(req, java.net.http.HttpResponse.BodyHandlers.ofString()).body()
      }
      assert(replay().contains("Success"))
      assert(replay().contains("Label Already Exists"))
      client.load("app", "users", Seq.empty) // empty batch is a no-op
    } finally server.stop()
  }

  test("DorisSink end-to-end against the loopback") {
    val server = new MockStreamLoadServer(Seq("k"))
    try {
      val sink = new DorisSink(server.url())
      sink.applySchemaChange(CreateTableEvent(tid, schema))
      sink.writeBatch(tid, ups(5L -> "x"), Seq.empty[Long].toDF("k"))
      sink.writeBatch(tid, ups(6L -> "y"), Seq(5L).toDF("k"))
      val docs = server.docsOf("app", "users").toMap
      assert(docs.keySet == Set("6"))
    } finally server.stop()
  }
}
