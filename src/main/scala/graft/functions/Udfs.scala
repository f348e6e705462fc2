package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{DataType, StringType}

/** UDF surface mirroring `common/udf/UserDefinedFunction.java:27-48`: an
  * `eval`-style function object with `getReturnType` plus `open`/`close`
  * lifecycle, registered into Spark's function registry.
  *
  * Lifecycle mapping: Spark serializes the function to each executor; `open`
  * runs lazily once per JVM instance on first call (the reference calls it
  * once per operator instance), `close` at JVM exit. State must be transient.
  */
trait UserDefinedFunction extends Serializable {
  def name: String
  /** declared result type — `UserDefinedFunction.getReturnType` in the
    * reference; drives the Spark-side output schema. */
  def returnType: DataType = StringType
  /** number of `eval` arguments — the reference derives this from the `eval`
    * overload's signature (`UserDefinedFunctionDescriptor.java:85-103`); here
    * it is declared. */
  def arity: Int = 1
  def open(): Unit = ()
  def close(): Unit = ()
  def eval(args: Any*): Any
}

object UdfRegistry {
  import org.apache.spark.sql.api.java._

  /** Register with lazy open-once semantics per executor instance. Multi-arity
    * typed `eval` (0..6 args, any Spark SQL types in/out) goes through the
    * Java UDF interfaces so the declared `returnType` reaches Catalyst — the
    * Spark analog of arbitrary typed `eval` overloads in the reference
    * (`UserDefinedFunction.java:27-48`).
    */
  def register(spark: SparkSession, f: UserDefinedFunction): Unit = {
    @transient lazy val opened0 = { f.open(); sys.addShutdownHook(f.close()); f }
    // defensive coercion for the declared-StringType default: an eval that
    // returns a non-String (the reference's Object-typed eval) must reach
    // Catalyst as a String, not a ClassCastException; nulls stay SQL NULL
    val stringify = f.returnType == StringType
    object opened {
      def eval(args: Any*): Any = {
        val v = opened0.eval(args: _*)
        if (stringify && v != null && !v.isInstanceOf[String]) String.valueOf(v) else v
      }
    }
    f.arity match {
      case 0 => spark.udf.register(f.name,
        new UDF0[Any] { def call(): Any = opened.eval() }, f.returnType)
      case 1 => spark.udf.register(f.name,
        new UDF1[Any, Any] { def call(a: Any): Any = opened.eval(a) }, f.returnType)
      case 2 => spark.udf.register(f.name,
        new UDF2[Any, Any, Any] { def call(a: Any, b: Any): Any = opened.eval(a, b) },
        f.returnType)
      case 3 => spark.udf.register(f.name,
        new UDF3[Any, Any, Any, Any] {
          def call(a: Any, b: Any, c: Any): Any = opened.eval(a, b, c)
        }, f.returnType)
      case 4 => spark.udf.register(f.name,
        new UDF4[Any, Any, Any, Any, Any] {
          def call(a: Any, b: Any, c: Any, d: Any): Any = opened.eval(a, b, c, d)
        }, f.returnType)
      case 5 => spark.udf.register(f.name,
        new UDF5[Any, Any, Any, Any, Any, Any] {
          def call(a: Any, b: Any, c: Any, d: Any, e: Any): Any = opened.eval(a, b, c, d, e)
        }, f.returnType)
      case 6 => spark.udf.register(f.name,
        new UDF6[Any, Any, Any, Any, Any, Any, Any] {
          def call(a: Any, b: Any, c: Any, d: Any, e: Any, g: Any): Any =
            opened.eval(a, b, c, d, e, g)
        }, f.returnType)
      case n => throw new IllegalArgumentException(
        s"UDF arity $n unsupported (0..6); reference UDFs in practice are 1-3 args")
    }
  }
}

/** Model functions (`flink-cdc-pipeline-model/.../OpenAIChatModel.java:43-94`,
  * `OpenAIEmbeddingModel.java:47-106`): named models usable as functions in
  * projections/filters. The HTTP client is STUBBED (zero-egress environment) —
  * deterministic fake predictions/embeddings; the Spark-side plumbing
  * (registration, batching shape, `ARRAY<FLOAT>` return type) is real.
  */
object ModelFunctions {

  /** `AI_CHAT_PREDICT(input) -> STRING`. Real impl posts batched prompts to an
    * OpenAI-compatible endpoint (one HTTP client per executor, opened lazily);
    * the stub hashes deterministically.
    */
  def registerChatPredict(spark: SparkSession, modelName: String): Unit =
    spark.udf.register("AI_CHAT_PREDICT", (input: String) => {
      if (input == null) null
      else s"[$modelName] " + Integer.toHexString(input.hashCode)
    })

  /** `GET_EMBEDDING(input) -> ARRAY<FLOAT>`: deterministic fake embedding with
    * the real return type and dimension contract.
    */
  def registerGetEmbedding(spark: SparkSession, modelName: String, dim: Int = 16): Unit =
    spark.udf.register("GET_EMBEDDING", (input: String) => {
      if (input == null) null
      else {
        val rnd = new java.util.Random(input.hashCode.toLong)
        Array.fill(dim)(rnd.nextFloat())
      }
    })
}
