package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** `ChangeEventUtilsTest.java` (flink-cdc-common/src/test/.../utils/)
  * transcribed onto [[SchemaChangeEventType.ofTag]] — the include/exclude TAG
  * grammar (family tags + dotted specific tags) and its resolution to event
  * kinds. The include-minus-exclude composition
  * (`resolveSchemaEvolutionOptions`) is what
  * [[graft.pipeline.PipelineComposer]] wires from the sink's
  * `include.schema.changes` / `exclude.schema.changes` options.
  */
class ChangeEventUtilsSpec extends AnyFunSuite {
  import SchemaChangeEventType._

  private val all = Set(CREATE_TABLE, ADD_COLUMN, DROP_COLUMN, RENAME_COLUMN,
    ALTER_COLUMN_TYPE, DROP_TABLE, TRUNCATE_TABLE)

  private def resolve(include: Seq[String], exclude: Seq[String]): Set[Value] = {
    val inc = if (include.isEmpty) all else include.flatMap(ofTag).toSet
    inc -- exclude.flatMap(ofTag).toSet
  }

  // testResolveSchemaEvolutionOptions:42
  test("include/exclude resolution") {
    val allTags = Seq("create.table", "add.column", "drop.column",
      "rename.column", "alter.column.type", "drop.table", "truncate.table")
    assert(resolve(allTags, Seq.empty) == all)
    assert(resolve(allTags, Seq("drop")) ==
      Set(ADD_COLUMN, ALTER_COLUMN_TYPE, RENAME_COLUMN, CREATE_TABLE, TRUNCATE_TABLE))
    assert(resolve(Seq("create", "add"), Seq.empty) == Set(ADD_COLUMN, CREATE_TABLE))
    assert(resolve(Seq("column"), Seq("drop.column")) ==
      Set(ADD_COLUMN, ALTER_COLUMN_TYPE, RENAME_COLUMN))
    assert(resolve(allTags, Seq("drop.column")) ==
      Set(ADD_COLUMN, DROP_TABLE, TRUNCATE_TABLE, RENAME_COLUMN,
        ALTER_COLUMN_TYPE, CREATE_TABLE))
  }

  // testResolveSchemaEvolutionTag:95
  test("tag resolution: families and dotted specifics") {
    assert(ofTag("all").toSet == all)
    assert(ofTag("column").toSet ==
      Set(ADD_COLUMN, ALTER_COLUMN_TYPE, DROP_COLUMN, RENAME_COLUMN))
    assert(ofTag("table").toSet == Set(CREATE_TABLE, DROP_TABLE, TRUNCATE_TABLE))
    assert(ofTag("rename.column") == Seq(RENAME_COLUMN))
    assert(ofTag("drop").toSet == Set(DROP_COLUMN, DROP_TABLE))
    assert(ofTag("drop.column") == Seq(DROP_COLUMN))
    assert(ofTag("create") == Seq(CREATE_TABLE))
    assert(ofTag("create.table") == Seq(CREATE_TABLE))
    assert(ofTag("alter") == Seq(ALTER_COLUMN_TYPE))
    assert(ofTag("alter.column.type") == Seq(ALTER_COLUMN_TYPE))
    assert(ofTag("add") == Seq(ADD_COLUMN))
    assert(ofTag("add.column") == Seq(ADD_COLUMN))
    // graft refuses unknown tags loudly where the reference resolves them
    // to nothing (documented divergence at ofTag — silent no-ops read back
    // as "schema evolution mysteriously off")
    intercept[IllegalArgumentException](ofTag("not.a.tag"))
  }
}
