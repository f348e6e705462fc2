package graft.functions

import org.apache.spark.sql.SparkSession

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
  def open(): Unit = ()
  def close(): Unit = ()
  def eval(args: Any*): Any
}

object UdfRegistry {

  /** Register with lazy open-once semantics per executor instance. */
  def register(spark: SparkSession, udf1: UserDefinedFunction): Unit = {
    // one-arg form is the common case in the reference examples
    @transient lazy val opened = { udf1.open(); sys.addShutdownHook(udf1.close()); udf1 }
    spark.udf.register(udf1.name, (arg: String) => String.valueOf(opened.eval(arg)))
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
