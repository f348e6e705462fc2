package graft.pipeline

import graft.pipeline.FactoryOptions._
import org.scalatest.funsuite.AnyFunSuite

/** 1:1 transcription of the reference's `FactoryHelperTests`
  * (`flink-cdc-common/src/test/.../factories/FactoryHelperTests.java`): the
  * dummy factory declares required {id:int, name:string, age:double} and
  * optional {hobby:string, location:string=Everywhere, misc:map={A:Z}}.
  */
class FactoryOptionsSpec extends AnyFunSuite {

  private val required = Set(
    ConfigOpt("id", IntType),
    ConfigOpt("name", StringType),
    ConfigOpt("age", DoubleType))
  private val optional = Set(
    ConfigOpt("hobby", StringType),
    ConfigOpt("location", StringType, default = Some("Everywhere")),
    ConfigOpt("misc", MapType, default = Some("A:Z")))

  private def check(config: Map[String, String]): Unit =
    validate("dummy", required, optional, config)

  // testCorrectConfigValidation:66
  test("a valid configuration validates") {
    check(Map("id" -> "1", "name" -> "Alice", "age" -> "17", "location" -> "Here"))
  }

  // testMissingRequiredOptionConfigValidation:84
  test("missing required options refuse with the reference wording") {
    val e = intercept[IllegalArgumentException] {
      check(Map("id" -> "1", "age" -> "17", "location" -> "Here"))
    }
    assert(e.getMessage.contains("One or more required options are missing."))
    assert(e.getMessage.contains("name"))
  }

  // testIncompatibleTypeValidation:103
  test("an incompatible value refuses with the parse wording") {
    val e = intercept[IllegalArgumentException] {
      check(Map("id" -> "1", "name" -> "Alice", "age" -> "Not a number",
        "location" -> "Here"))
    }
    assert(e.getMessage.contains("Could not parse value 'Not a number' for key 'age'."))
  }

  // testRedundantConfigValidation:123
  test("redundant options refuse with the unsupported wording") {
    val e = intercept[IllegalArgumentException] {
      check(Map("id" -> "1", "name" -> "Alice", "age" -> "17",
        "what" -> "Not a valid configOption"))
    }
    assert(e.getMessage.contains("Unsupported options found for 'dummy'."))
    assert(e.getMessage.contains("what"))
  }

  // testAllowedPrefixConfigValidation:143
  test("allowed prefixes exempt their namespace, and only theirs") {
    val config = Map(
      "id" -> "1", "name" -> "Alice", "age" -> "17",
      "debezium.foo" -> "Some debezium options",
      "debezium.bar" -> "Another debezium options",
      "canal.baz" -> "Yet another debezium options")
    val e1 = intercept[IllegalArgumentException](check(config))
    assert(e1.getMessage.contains("Unsupported options found for 'dummy'."))
    val e2 = intercept[IllegalArgumentException] {
      validateExcept("dummy", required, optional, config, "debezium.")
    }
    assert(e2.getMessage.contains("Unsupported options found for 'dummy'."))
    val e3 = intercept[IllegalArgumentException] {
      validateExcept("dummy", required, optional, config, "canal.")
    }
    assert(e3.getMessage.contains("Unsupported options found for 'dummy'."))
    validateExcept("dummy", required, optional, config, "debezium.", "canal.")
  }

  test("validateExcept refuses an empty prefix list") {
    val e = intercept[IllegalArgumentException] {
      validateExcept("dummy", required, optional, Map("id" -> "1", "name" -> "n", "age" -> "1"))
    }
    assert(e.getMessage.contains("Prefixes to skip can not be empty."))
  }
}
