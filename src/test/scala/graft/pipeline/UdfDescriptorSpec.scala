package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** `UserDefinedFunctionDescriptorTest.java`
  * (flink-cdc-runtime/src/test/.../transform/) transcribed onto the runner's
  * `user-defined-function` resolution ([[PipelineRunner]] udf wiring — the
  * descriptor's classpath → instance → interface-dispatch triage): a CDC
  * `UserDefinedFunction` registers directly, a ScalarFunction-shaped class
  * (public typed `eval`, no CDC interface) registers reflectively, a class
  * with neither refuses with the dual-interface wording, and an unloadable
  * classpath refuses with the reference's exact
  * "Failed to instantiate UDF name@classpath" message. The returnTypeHint
  * surface (TIMESTAMP_LTZ(9) etc.) is pinned by `t_udf2` and
  * `c_conformance_udf_return_types`.
  */
class UdfDescriptorSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestBase.spark

  private def runnerFor(name: String, classpath: String): PipelineRunner = {
    implicit val s: SparkSession = spark
    new PipelineRunner(YamlPipelineParser.parse(
      s"""source:
         |  type: cdc
         |  sourceId: never-resolved
         |sink:
         |  type: values
         |user-defined-function:
         |  - name: $name
         |    classpath: $classpath
         |""".stripMargin))
  }

  test("CDC UserDefinedFunction class resolves") {
    runnerFor("cdc_udf", "graft.functions.udfexamples.AddOneFunctionClass")
    assert(spark.sql("SELECT cdc_udf(1)").head().get(0) != null)
  }

  test("ScalarFunction-shaped class (public eval, no CDC interface) resolves") {
    runnerFor("flink_udf", classOf[UdfDescriptorSpec.FlinkShaped].getName)
    assert(spark.sql("SELECT flink_udf(20)").head().getInt(0) == 21)
  }

  test("a class with neither interface refuses with the dual wording") {
    val e = intercept[IllegalArgumentException] {
      runnerFor("not_udf", classOf[UdfDescriptorSpec.NotUdf].getName)
    }
    assert(e.getMessage.contains("neither implements"))
    assert(e.getMessage.contains("eval"))
  }

  test("an unloadable classpath refuses with the reference wording") {
    val e = intercept[IllegalArgumentException] {
      runnerFor("not_even_exist", "not.a.valid.class.path")
    }
    assert(e.getMessage == "Failed to instantiate UDF not_even_exist@not.a.valid.class.path")
  }
}

object UdfDescriptorSpec {
  /** ScalarFunction-shaped: a public typed eval, no CDC interface
    * (`UserDefinedFunctionDescriptorTest.FlinkUdf`). */
  class FlinkShaped extends Serializable {
    def eval(x: Int): Int = x + 1
  }

  /** no eval, no interface (`UserDefinedFunctionDescriptorTest.NotUDF`). */
  class NotUdf {
    def somethingElse(): Unit = ()
  }
}
