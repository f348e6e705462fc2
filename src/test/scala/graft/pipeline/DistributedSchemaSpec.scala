package graft.pipeline

import graft.core._
import graft.pipeline.DistributedSchemaReducer.PartitionSchemaReport
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Mirrors `schema/distributed/SchemaCoordinator` reduce scenarios: partitions
  * observing different shapes of one table converge to the least common schema.
  */
class DistributedSchemaSpec extends AnyFunSuite {

  private def ts(fields: (String, DataType)*): TableSchema =
    TableSchema(
      StructType(fields.map { case (n, t) => StructField(n, t) }),
      primaryKeys = Seq("id"))

  test("reduce widens diverging column types and unions columns") {
    val a = ts("id" -> LongType, "v" -> IntegerType)
    val b = ts("id" -> LongType, "v" -> DoubleType, "extra" -> StringType)
    val r = DistributedSchemaReducer.reduce(Seq(a, b))
    assert(r.struct("v").dataType == DoubleType) // INT+DOUBLE -> DOUBLE lattice
    assert(r.struct.fieldNames.toSeq == Seq("id", "v", "extra"))
    assert(r.struct("extra").nullable) // only some partitions have it
    assert(r.primaryKeys == Seq("id"))
  }

  test("reduce rejects diverging primary keys") {
    val a = ts("id" -> LongType)
    val b = a.copy(primaryKeys = Seq("other"))
    intercept[IllegalArgumentException](DistributedSchemaReducer.reduce(Seq(a, b)))
  }

  test("deriveEvents: first batch creates, later batches diff") {
    val known = new SchemaManager
    val t = TableId.of("db", "sharded")
    val batch1 = Seq(
      PartitionSchemaReport(0, t, ts("id" -> LongType, "v" -> IntegerType)),
      PartitionSchemaReport(1, t, ts("id" -> LongType, "v" -> IntegerType)))
    val evs1 = DistributedSchemaReducer.deriveEvents(known, batch1)
    assert(evs1.collect { case c: CreateTableEvent => c }.size == 1)
    evs1.foreach(known.applySchemaChange)

    // a partition starts seeing a widened type + a new column
    val batch2 = Seq(
      PartitionSchemaReport(0, t, ts("id" -> LongType, "v" -> IntegerType)),
      PartitionSchemaReport(1, t, ts("id" -> LongType, "v" -> LongType, "w" -> StringType)))
    val evs2 = DistributedSchemaReducer.deriveEvents(known, batch2)
    assert(evs2.exists {
      case AlterColumnTypeEvent(_, m) => m.get("v").exists(_.toSpark == LongType)
      case _ => false
    })
    assert(evs2.exists {
      case AddColumnEvent(_, cols) => cols.exists(_.name == "w")
      case _ => false
    })
    evs2.foreach(known.applySchemaChange)

    // converged: a repeat of batch2's shapes yields no further events
    assert(DistributedSchemaReducer.deriveEvents(known, batch2).isEmpty)
  }
}
