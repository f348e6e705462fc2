package graft.sinks

import graft.SparkTestBase
import graft.core.TableSchema
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class LakehouseBucketedSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def pkTable(buckets: Int = 4): LakehouseTable = {
    val t = new LakehouseTable(spark, Files.createTempDirectory("bucketed").toString)
    t.create(TableSchema(
      StructType(Seq(
        StructField("k", LongType, nullable = false),
        StructField("v", StringType))),
      primaryKeys = Seq("k")), buckets = buckets)
    t
  }
  private def empty(t: LakehouseTable) = t.read().limit(0).select($"k")

  test("reported bucket function equals the write path's layout exactly") {
    // the V2 function must compute the same bucket the MERGE path wrote the
    // row into — for every value, including negatives: a drifted function
    // would silently mis-join
    val n = 8
    val vals = (-500L to 500L by 7) ++ Seq(Long.MinValue, Long.MaxValue, 0L, 42L)
    val fromSpark = vals.toDF("k")
      .select($"k", pmod(hash($"k"), lit(n)).as("b"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    vals.foreach { v =>
      assert(LakehouseBucketed.bucketOf(Seq((v, LongType)), n) == fromSpark(v),
        s"bucket mismatch for $v")
    }
    // and through the bound V2 function itself (what Spark would evaluate)
    val bound = new GraftBucketUnbound().bind(StructType(Seq(
      StructField("n", IntegerType), StructField("k", LongType))))
    val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(2)
    row.update(0, n); row.update(1, 42L)
    assert(bound.asInstanceOf[org.apache.spark.sql.connector.catalog.functions.ScalarFunction[Int]]
      .produceResult(row) == fromSpark(42L))
  }

  test("groupBy on the PK aggregates with NO exchange; values exact") {
    val t = pkTable()
    t.merge((0L until 3000L).map(i => (i % 300, s"v$i")).toDF("k", "v"), empty(t))
    val df = LakehouseBucketed.table(spark, t.dir)
    val agg = df.groupBy($"k").agg(count(lit(1)).as("n"))
    assert(!agg.queryExecution.executedPlan.toString.contains("Exchange"),
      "bucketed groupBy must not shuffle")
    // values equal the plain (shuffling) read's answer
    val got = agg.orderBy($"k").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = t.read().groupBy($"k").agg(count(lit(1)).as("n"))
      .orderBy($"k").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == want)
  }

  test("same-bucketed join is storage-partitioned: NO exchange on either side") {
    val a = pkTable(buckets = 4)
    val b = new LakehouseTable(spark, Files.createTempDirectory("bucketed_b").toString)
    b.create(TableSchema(
      StructType(Seq(
        StructField("k", LongType, nullable = false),
        StructField("w", LongType))),
      primaryKeys = Seq("k")), buckets = 4)
    a.merge((0L until 1000L).map(i => (i, s"v$i")).toDF("k", "v"), empty(a))
    b.merge((0L until 1000L).filter(_ % 3 == 0).map(i => (i, i * 10)).toDF("k", "w"),
      b.read().limit(0).select($"k"))

    val j = LakehouseBucketed.table(spark, a.dir)
      .join(LakehouseBucketed.table(spark, b.dir), "k")
    val plan = j.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"storage-partitioned join must not shuffle:\n$plan")
    assert(plan.contains("GraftLakehouseBucketed"))
    // exact result vs the plain read join
    val got = j.orderBy($"k").collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    val want = a.read().join(b.read(), "k").orderBy($"k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == want && got.size == 334)
  }

  test("compacted tables merge-join with NO sort either; merges withdraw the claim") {
    def mk(suffix: Int): LakehouseTable = {
      val t = new LakehouseTable(spark, Files.createTempDirectory(s"sorted_$suffix").toString)
      t.create(TableSchema(
        StructType(Seq(
          StructField("k", LongType, nullable = false),
          StructField("v", LongType))),
        primaryKeys = Seq("k")), buckets = 4)
      t.merge(spark.range(2000).select($"id".as("k"), ($"id" * suffix).as("v")),
        t.read().limit(0).select($"k"))
      t.compact(maxFilesPerBucket = 1, full = true) // one PK-sorted file per bucket
      t
    }
    val (a, b) = (mk(1), mk(3))
    assert(a.snapshot().files.forall(_.sorted))
    val j = LakehouseBucketed.table(spark, a.dir)
      .join(LakehouseBucketed.table(spark, b.dir), "k")
    val plan = j.queryExecution.executedPlan.toString
    // zero shuffle AND zero sort: the layout delivers both join requirements
    assert(!plan.contains("Exchange") && !plan.contains("Sort "),
      s"compacted bucketed join must need neither shuffle nor sort:\n$plan")
    assert(j.count() == 2000)

    // an unsorted merge fragment withdraws the ordering claim (Sort returns,
    // partitioning stays) and values stay exact
    a.merge(Seq((5L, 99L)).toDF("k", "v"), a.read().limit(0).select($"k"))
    val j2 = LakehouseBucketed.table(spark, a.dir)
      .join(LakehouseBucketed.table(spark, b.dir), "k")
    val p2 = j2.queryExecution.executedPlan.toString
    assert(!p2.contains("Exchange") && p2.contains("Sort "))
    assert(j2.filter($"k" === 5L).collect().map(r =>
      (r.getLong(1), r.getLong(2))).toSeq == Seq((99L, 15L)))
  }

  test("column pruning reaches the scan; updates visible; constraints loud") {
    val t = pkTable()
    t.merge((0L until 100L).map(i => (i, s"v$i")).toDF("k", "v"), empty(t))
    t.merge(Seq((5L, "updated")).toDF("k", "v"), empty(t))

    val df = LakehouseBucketed.table(spark, t.dir)
    // post-merge state, not the first commit
    assert(df.filter($"k" === 5L).select($"v").as[String].head() == "updated")
    // pruned scan: only `v` reaches readSchema
    val pruned = df.select($"v")
    val scanLine = pruned.queryExecution.executedPlan.toString.linesIterator
      .find(_.contains("BatchScan")).getOrElse("")
    assert(scanLine.contains("[v#") && !scanLine.contains("k#"),
      s"column pruning missing: $scanLine")

    // PK-less append tables are refused
    val app = new LakehouseTable(spark, Files.createTempDirectory("bucketed_app").toString)
    app.create(TableSchema(
      StructType(Seq(StructField("k", LongType), StructField("v", StringType))),
      primaryKeys = Seq.empty), buckets = 2)
    app.append(Seq((1L, "a")).toDF("k", "v"))
    val e1 = intercept[Exception](LakehouseBucketed.table(spark, app.dir).collect())
    assert(graft.SparkTestBase.rootMessage(e1).contains("PK table"))

    // outstanding MOR delete files are refused; compact() unblocks
    t.deleteWhere(Seq(7L).toDF("k"))
    val e2 = intercept[Exception](LakehouseBucketed.table(spark, t.dir).collect())
    assert(graft.SparkTestBase.rootMessage(e2).contains("compact"))
    t.compact(maxFilesPerBucket = 1)
    assert(LakehouseBucketed.table(spark, t.dir).count() == 99)
    assert(LakehouseBucketed.table(spark, t.dir).filter($"k" === 7L).isEmpty)
  }
}
