package graft.sinks

import graft.SparkTestBase
import graft.core.{DataChangeEvent, TableId}
import graft.operators.{Envelope, Upsert}
import graft.sources.ValuesSource
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class KafkaJsonFormatsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def env() = {
    val t = TableId.parse("mydb.users")
    ValuesSource.toEnvelope(spark, ValuesSource.customersSchema, Seq(
      DataChangeEvent.insert(t, Map("col1" -> "1", "col2" -> "a")),
      DataChangeEvent.update(t, Map("col1" -> "1", "col2" -> "a"),
        Map("col1" -> "1", "col2" -> "b")),
      DataChangeEvent.delete(t, Map("col1" -> "1", "col2" -> "b"))))
  }

  test("debezium-json: op codes c/u/d, before/after images, source block") {
    val out = KafkaJsonFormats.debeziumJson(env()).select($"value").as[String].collect()
    assert(out.length == 3)
    assert(out(0).contains("\"op\":\"c\"") && out(0).contains("\"after\":{\"col1\":\"1\",\"col2\":\"a\"}")
      && !out(0).contains("\"before\":{"))
    assert(out(1).contains("\"op\":\"u\"") && out(1).contains("\"before\":{\"col1\":\"1\",\"col2\":\"a\"}"))
    assert(out(2).contains("\"op\":\"d\"") && !out(2).contains("\"after\":{"))
    assert(out(0).contains("\"source\":{\"db\":\"mydb\",\"table\":\"users\"}"))
  }

  test("debezium-json exact wire layout: field order, explicit nulls, op codes") {
    // byte-for-byte contract of DebeziumJsonSerializationSchema: before, after,
    // op, source — in that order; absent images are explicit nulls
    val out = KafkaJsonFormats.debeziumJson(env()).select($"value").as[String].collect()
    assert(out(0) ==
      """{"before":null,"after":{"col1":"1","col2":"a"},"op":"c","source":{"db":"mydb","table":"users"}}""")
    assert(out(1) ==
      """{"before":{"col1":"1","col2":"a"},"after":{"col1":"1","col2":"b"},"op":"u","source":{"db":"mydb","table":"users"}}""")
    assert(out(2) ==
      """{"before":{"col1":"1","col2":"b"},"after":null,"op":"d","source":{"db":"mydb","table":"users"}}""")
  }

  test("canal-json: type INSERT/UPDATE/DELETE with data/old arrays") {
    val out = KafkaJsonFormats.canalJson(env()).select($"value").as[String].collect()
    assert(out(0).contains("\"type\":\"INSERT\"") && out(0).contains("\"data\":[{"))
    assert(out(1).contains("\"type\":\"UPDATE\"") && out(1).contains("\"old\":[{"))
    assert(out(2).contains("\"type\":\"DELETE\""))
    assert(out(0).contains("\"database\":\"mydb\"") && out(0).contains("\"table\":\"users\""))
  }

  test("key + partition strategies") {
    val hashKeyed = KafkaJsonFormats.withKey(env(), Seq("col1"))
    assert(hashKeyed.select($"key").as[String].collect().forall(_ == "{\"col1\":\"1\"}"))
    val zero = KafkaJsonFormats.withKey(env(), Seq("col1"), "ALL_TO_ZERO")
    assert(zero.select($"partition").distinct().as[Int].collect().toSeq == Seq(0))
  }

  test("debezium-json reader inverts the writer: envelope round trip") {
    val wire = env().select(col(Envelope.SeqCol).as("off"),
      KafkaJsonFormats.debeziumValue.as("value"))
    val back = KafkaJsonFormats.fromDebeziumJson(
      wire, ValuesSource.customersSchema.struct, col("off"))
      .orderBy(Envelope.SeqCol).collect()
    assert(back.map(_.getString(1)).toSeq === Seq("INSERT", "UPDATE", "DELETE"))
    // REPLACE serialized as "u" folds to UPDATE — same materialized state
    assert(back.map(_.getString(0)).distinct.toSeq === Seq("mydb.users"))
    assert(back(0).getStruct(2) == null && back(0).getStruct(3).getString(1) == "a")
    assert(back(2).getStruct(2).getString(1) == "b" && back(2).getStruct(3) == null)
  }

  test("debezium reader decodes the snapshot-read op code r as REPLACE") {
    val raw = Seq(
      """{"before":null,"after":{"col1":"9","col2":"z"},"op":"r","source":{"db":"d","table":"t"}}""")
      .toDF("value")
    val e = KafkaJsonFormats.fromDebeziumJson(
      raw, ValuesSource.customersSchema.struct, lit(7L)).head()
    assert(e.getString(0) == "d.t" && e.getString(1) == "REPLACE" && e.getLong(4) == 7L)
  }

  test("debezium reader marks unknown op codes and unparseable JSON as INVALID") {
    val raw = Seq(
      """{"before":null,"after":{"col1":"1","col2":"a"},"op":"x","source":{"db":"d","table":"t"}}""",
      """this is not json at all""",
      """{"before":null,"after":{"col1":"2","col2":"b"},"op":"u","source":{"db":"d","table":"t"}}""")
      .toDF("value")
    val ops = KafkaJsonFormats.fromDebeziumJson(
      raw, ValuesSource.customersSchema.struct, lit(0L))
      .select(col(Envelope.OpCol)).as[String].collect().toSeq
    assert(ops === Seq(KafkaJsonFormats.InvalidOp, KafkaJsonFormats.InvalidOp, "UPDATE"))
    // the marker is filterable: a dead-letter route peels them off, the clean
    // path sees only well-formed envelopes
    val parsed = KafkaJsonFormats.fromDebeziumJson(
      raw, ValuesSource.customersSchema.struct, lit(0L))
      .where(col(Envelope.OpCol) =!= KafkaJsonFormats.InvalidOp)
    assert(parsed.count() == 1)
    // canal: unparseable value -> INVALID too
    val canalOps = KafkaJsonFormats.fromCanalJson(
      Seq("""broken {""").toDF("value"), ValuesSource.customersSchema.struct, lit(0L))
      .select(col(Envelope.OpCol)).as[String].collect().toSeq
    assert(canalOps === Seq(KafkaJsonFormats.InvalidOp))
  }

  test("routeInvalid: corrupt records land in the dead letter, clean upserts unaffected") {
    val raw = Seq(
      """{"before":null,"after":{"col1":"1","col2":"a"},"op":"c","source":{"db":"d","table":"t"}}""",
      """not json — a corrupt kafka record""",
      """{"before":null,"after":{"col1":"1","col2":"b"},"op":"x","source":{"db":"d","table":"t"}}""",
      """{"before":{"col1":"1","col2":"a"},"after":{"col1":"1","col2":"c"},"op":"u","source":{"db":"d","table":"t"}}""")
      .toDF("value").withColumn("off", monotonically_increasing_id())
    val env = KafkaJsonFormats.fromDebeziumJson(
      raw, ValuesSource.customersSchema.struct, col("off"))
    val (clean, dead) = KafkaJsonFormats.routeInvalid(env)
    // the two bad records (unparseable JSON, unknown op) are peeled off...
    assert(dead.count() == 2)
    assert(dead.select(col(Envelope.OpCol)).as[String].collect().toSet ===
      Set(KafkaJsonFormats.InvalidOp))
    // ...with seq preserved so the source offset is auditable
    assert(dead.select(col(Envelope.SeqCol)).as[Long].collect().toSet === Set(1L, 2L))
    // and the clean path materializes exactly as if the corruption never existed
    val state = Upsert.materialize(clean, Seq("col1")).collect()
    assert(state.length == 1 && state.head.getString(1) == "c")
  }

  test("canal-json reader inverts the writer: images from old/data arrays") {
    val wire = env().select(col(Envelope.SeqCol).as("off"),
      KafkaJsonFormats.canalValue.as("value"))
    val back = KafkaJsonFormats.fromCanalJson(
      wire, ValuesSource.customersSchema.struct, col("off"))
      .orderBy(Envelope.SeqCol).collect()
    assert(back.map(_.getString(1)).toSeq === Seq("INSERT", "UPDATE", "DELETE"))
    assert(back(1).getStruct(2).getString(1) == "a" && back(1).getStruct(3).getString(1) == "b")
  }

  test("reader -> materialize equals direct materialize of the changelog") {
    val direct = Upsert.materialize(env(), Seq("col1")).collect().toSet
    val wire = env().select(col(Envelope.SeqCol).as("off"),
      KafkaJsonFormats.debeziumValue.as("value"))
    val viaKafka = Upsert.materialize(
      KafkaJsonFormats.fromDebeziumJson(
        wire, ValuesSource.customersSchema.struct, col("off")),
      Seq("col1")).collect().toSet
    assert(viaKafka === direct)
  }
}

class PartitioningSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("orderedForSink: per-key events arrive in seq order within a partition") {
    val t = TableId.parse("db.t")
    val events = (0 until 200).map { i =>
      val key = (i % 7).toString
      DataChangeEvent.insert(t, Map("col1" -> key, "col2" -> i.toString))
    }
    val env = ValuesSource.toEnvelope(spark, ValuesSource.customersSchema, events)
      .orderBy(rand(seed = 1)) // scramble
    val parted = Upsert.orderedForSink(env, Seq("col1"), numPartitions = 3)
    // within each partition, per-key seqs must be increasing (FIFO contract)
    val ok = parted
      .select(col("after.col1").as("k"), col(Envelope.SeqCol))
      .mapPartitions { rows =>
        val lastSeq = scala.collection.mutable.Map.empty[String, Long]
        var good = true
        rows.foreach { r =>
          val k = r.getString(0); val s = r.getLong(1)
          if (lastSeq.getOrElse(k, Long.MinValue) > s) good = false
          lastSeq(k) = s
        }
        Iterator.single(good)
      }.collect()
    assert(ok.forall(identity))
    // and all events of one key land in one partition
    val spread = parted
      .select(spark_partition_id().as("p"), col("after.col1").as("k"))
      .groupBy("k").agg(countDistinct("p").as("np"))
      .select(max("np")).as[Long].head()
    assert(spread == 1)
  }
}

class UdfLifecycleSpec extends AnyFunSuite {
  import graft.functions.{ModelFunctions, UdfRegistry, UserDefinedFunction}
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("UserDefinedFunction lifecycle adapter registers and evaluates") {
    object Reverse extends UserDefinedFunction {
      val name = "graft_reverse"
      @volatile var openCount = 0
      override def open(): Unit = openCount += 1
      def eval(args: Any*): Any = String.valueOf(args.head).reverse
    }
    UdfRegistry.register(spark, Reverse)
    val out = Seq("abc").toDF("s").selectExpr("graft_reverse(s) AS r").as[String].head()
    assert(out == "cba")
  }

  test("model functions: AI_CHAT_PREDICT string, GET_EMBEDDING array<float>") {
    ModelFunctions.registerChatPredict(spark, "stub-model")
    ModelFunctions.registerGetEmbedding(spark, "stub-model", dim = 8)
    val df = Seq("hello").toDF("s")
      .selectExpr("AI_CHAT_PREDICT(s) AS p", "GET_EMBEDDING(s) AS e")
    val row = df.head()
    assert(row.getString(0).startsWith("[stub-model] "))
    assert(row.getSeq[Float](1).length == 8)
    // deterministic
    assert(df.head() == row)
  }
}
