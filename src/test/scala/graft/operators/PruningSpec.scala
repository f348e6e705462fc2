package graft.operators

import graft.SparkTestBase
import graft.core.TableId
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Plan-level evidence for the PreTransformOperator claim (SURVEY §2.2 #12):
  * column pruning is Catalyst's job once transforms are declarative — a
  * projection referencing 2 of lineitem's 16 columns must reach the parquet
  * scan as a 2-field `ReadSchema`, at top level and through the envelope's
  * nested structs alike. At 100 TB this is the difference between reading
  * 2/16ths of the bytes and reading all of them.
  */
class PruningSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def readSchemaOf(plan: String): String =
    plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")

  test("plain projection prunes the parquet scan to referenced columns") {
    val li = spark.read.parquet(s"${SparkTestBase.sf0001}/lineitem.parquet")
    val q = li.select(col("l_orderkey"), col("l_quantity")).filter(col("l_quantity") > 10)
    val rs = readSchemaOf(q.queryExecution.executedPlan.toString)
    assert(rs.contains("l_orderkey") && rs.contains("l_quantity"))
    assert(!rs.contains("l_comment") && !rs.contains("l_extendedprice"), rs)
  }

  test("envelope transform prunes nested payload fields at the scan") {
    val li = spark.read.parquet(s"${SparkTestBase.sf0001}/lineitem.parquet")
    val t = TableId.parse("app.lineitem")
    val env = Envelope.fromSnapshot(li, t, col("l_orderkey"))
    val rule = TransformRule(
      sourceTable = "app.\\.*",
      projection = Some("l_orderkey, l_quantity * 2 AS dbl_qty"),
      filter = None)
    val out = EnvelopeTransform(env, rule, t)
      .select(col(s"${Envelope.AfterCol}.l_orderkey"), col(s"${Envelope.AfterCol}.dbl_qty"))
    val rs = readSchemaOf(out.queryExecution.executedPlan.toString)
    // nested schema pruning: scan reads only the referenced payload fields
    assert(rs.contains("l_orderkey") && rs.contains("l_quantity"), rs)
    assert(!rs.contains("l_comment") && !rs.contains("l_shipdate"), rs)
  }

  test("chunk-range predicates reach the scan as PushedFilters") {
    val li = spark.read.parquet(s"${SparkTestBase.sf0001}/lineitem.parquet")
    val chunk = ChunkSplitter.ChunkRange(Some(100L), Some(200L))
    val q = li.filter(chunk.predicate("l_orderkey"))
    val plan = q.queryExecution.executedPlan.toString
    val pushed = plan.linesIterator.find(_.contains("PushedFilters")).getOrElse("")
    assert(pushed.contains("GreaterThanOrEqual(l_orderkey,100)"), pushed)
    assert(pushed.contains("LessThan(l_orderkey,200)"), pushed)
  }
}
