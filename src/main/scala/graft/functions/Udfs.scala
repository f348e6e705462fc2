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
  /** a variadic `eval(Object... args)` in the reference accepts ANY argument
    * count; declaring true here registers one fixed-arity wrapper per arity
    * 0..6 and the dialect parser dispatches each call site to the matching
    * one ([[graft.functions.StrictEquality]]). */
  def variadic: Boolean = false
  def open(): Unit = ()
  def close(): Unit = ()
  def eval(args: Any*): Any
}

/** Adapter for SCALAR-FUNCTION-SHAPED classes — plain classes exposing
  * public typed `eval` overloads WITHOUT implementing [[UserDefinedFunction]]
  * (the reference accepts vanilla Flink `ScalarFunction` subclasses this
  * way, `UserDefinedFunctionDescriptor.java:85-103`, resolving the overload
  * at the call site like Java does). Dispatch here is by runtime argument
  * classes: exact-count assignable match first, then a varargs overload.
  * The return type derives from the eval signatures; `open`/`close` methods
  * are honored when present. The instance must be Serializable (Spark ships
  * the function to executors, as Flink serializes ScalarFunctions).
  */
final class ReflectiveUdf(val name: String, instance: AnyRef)
    extends UserDefinedFunction {
  import java.lang.reflect.{Array => JArray, Method, Modifier}

  @transient private lazy val evals: Seq[Method] =
    instance.getClass.getMethods.toSeq
      .filter(m => m.getName == "eval" && Modifier.isPublic(m.getModifiers))

  require(
    instance.getClass.getMethods.exists(_.getName == "eval"),
    s"UDF '$name': ${instance.getClass.getName} neither implements " +
      "graft.functions.UserDefinedFunction nor exposes a public eval method")

  /** Catalyst type of one Java eval return class — extended beyond the
    * primitives to the classes the reference's typed-eval contract maps
    * (`DataTypeConverter.java`: BigDecimal -> DECIMAL, byte[] -> BINARY,
    * temporals -> their SQL types); unmapped classes fall back to STRING
    * via toString, which is only safe when ALL overloads agree. */
  private def sqlTypeOf(c: Class[_]): Option[DataType] = {
    import org.apache.spark.sql.types._
    c match {
      case x if x == classOf[String] => Some(StringType)
      case x if x == classOf[java.lang.Integer] || x == java.lang.Integer.TYPE =>
        Some(IntegerType)
      case x if x == classOf[java.lang.Long] || x == java.lang.Long.TYPE => Some(LongType)
      case x if x == classOf[java.lang.Double] || x == java.lang.Double.TYPE =>
        Some(DoubleType)
      case x if x == classOf[java.lang.Float] || x == java.lang.Float.TYPE => Some(FloatType)
      case x if x == classOf[java.lang.Boolean] || x == java.lang.Boolean.TYPE =>
        Some(BooleanType)
      case x if x == classOf[java.lang.Short] || x == java.lang.Short.TYPE => Some(ShortType)
      case x if x == classOf[java.lang.Byte] || x == java.lang.Byte.TYPE => Some(ByteType)
      case x if x == classOf[java.math.BigDecimal] => Some(DecimalType(38, 18))
      case x if x == classOf[Array[Byte]] => Some(BinaryType)
      case x if x == classOf[java.sql.Timestamp] ||
        x == classOf[java.time.Instant] => Some(TimestampType)
      case x if x == classOf[java.time.LocalDateTime] => Some(TimestampNTZType)
      case x if x == classOf[java.sql.Date] || x == classOf[java.time.LocalDate] =>
        Some(DateType)
      case _ => None
    }
  }

  override def returnType: DataType = {
    // getMethods order is unspecified — distinct MAPPED types must agree or
    // the declaration is ambiguous; failing loudly beats a coin-flip schema
    val rts = evals.map(m => sqlTypeOf(m.getReturnType)).distinct
    rts match {
      case Seq() => StringType
      case Seq(one) => one.getOrElse(StringType)
      case many =>
        val mapped = many.flatten.distinct
        if (mapped.size == 1 && many.forall(_.isDefined)) mapped.head
        else throw new IllegalArgumentException(
          s"UDF '$name': eval overloads declare conflicting return types (" +
            evals.map(_.getReturnType.getSimpleName).distinct.mkString(", ") +
            ") — a scalar function must have ONE result type")
    }
  }

  private def counts: Seq[Int] =
    instance.getClass.getMethods.filter(_.getName == "eval")
      .map(_.getParameterCount).distinct.toSeq

  override def arity: Int = counts match {
    case Seq(n) if !variadic => n
    case _ => counts.max
  }

  /** several arities or a Java-varargs overload → register every arity */
  override def variadic: Boolean =
    counts.size > 1 ||
      instance.getClass.getMethods.exists(m => m.getName == "eval" && m.isVarArgs)

  private def box(c: Class[_]): Class[_] = c match {
    case java.lang.Integer.TYPE => classOf[java.lang.Integer]
    case java.lang.Long.TYPE => classOf[java.lang.Long]
    case java.lang.Double.TYPE => classOf[java.lang.Double]
    case java.lang.Float.TYPE => classOf[java.lang.Float]
    case java.lang.Boolean.TYPE => classOf[java.lang.Boolean]
    case java.lang.Short.TYPE => classOf[java.lang.Short]
    case java.lang.Byte.TYPE => classOf[java.lang.Byte]
    case other => other
  }

  override def open(): Unit =
    instance.getClass.getMethods
      .find(m => m.getName == "open" && m.getParameterCount == 0)
      .foreach(_.invoke(instance))

  override def close(): Unit =
    instance.getClass.getMethods
      .find(m => m.getName == "close" && m.getParameterCount == 0)
      .foreach(_.invoke(instance))

  override def eval(args: Any*): Any = {
    val boxed = args.map(_.asInstanceOf[AnyRef])
    val exact = evals.find { m =>
      !m.isVarArgs && m.getParameterCount == boxed.size &&
        m.getParameterTypes.toSeq.zip(boxed).forall {
          case (p, a) => a == null || box(p).isInstance(a)
        }
    }
    val chosen = exact.orElse(evals.find(m =>
      m.isVarArgs && boxed.size >= m.getParameterCount - 1))
    chosen match {
      case Some(m) if m.isVarArgs =>
        val fixed = m.getParameterCount - 1
        val compType = m.getParameterTypes.last.getComponentType
        val rest = boxed.drop(fixed)
        val arr = JArray.newInstance(compType, rest.size)
        rest.zipWithIndex.foreach { case (v, i) => JArray.set(arr, i, v) }
        m.invoke(instance, (boxed.take(fixed) :+ arr.asInstanceOf[AnyRef]): _*)
      case Some(m) => m.invoke(instance, boxed: _*)
      case None => throw new IllegalArgumentException(
        s"UDF '$name': no eval overload matches argument classes (" +
          boxed.map(v => if (v == null) "null" else v.getClass.getSimpleName)
            .mkString(", ") + ")")
    }
  }
}

object UdfRegistry {
  import org.apache.spark.sql.api.java._

  /** lowercase names registered as VARIADIC, scoped PER SESSION — the
    * dialect parser renames each call site to [[variadicArityName]] of its
    * argument count. Scoping plus latest-registration-wins (a FIXED-arity
    * re-registration under the same name CLEARS the flag) keeps one
    * pipeline's variadic `format` from hijacking a later pipeline's
    * fixed-arity `format` call sites in the same session. */
  // keyed by the sharedState OBJECT (weakly), not the session: micro-batch
  // execution hands expressions a CLONED SparkSession per batch, and a
  // clone must still see the registration (clones share sharedState; the
  // function registry itself is shared the same way). A WeakHashMap keyed
  // on the object is collision-free — identity hashes are not unique — and
  // entries evict with the state instead of leaking across session lifetimes.
  private val variadics =
    new java.util.WeakHashMap[AnyRef, scala.collection.mutable.Set[String]]()

  private def namesOf(spark: SparkSession): scala.collection.mutable.Set[String] =
    variadics.synchronized {
      var set = variadics.get(spark.sharedState)
      if (set == null) {
        set = scala.collection.mutable.Set.empty[String]
        variadics.put(spark.sharedState, set)
      }
      set
    }

  def isVariadic(spark: SparkSession, name: String): Boolean =
    variadics.synchronized(namesOf(spark).contains(name.toLowerCase))

  /** the widest arity a variadic registration covers — calls beyond it have
    * no registered wrapper and must fail with a CLEAR message */
  val MaxVariadicArity = 6

  /** registry-internal name of the `n`-argument wrapper of variadic `name`. */
  def variadicArityName(name: String, n: Int): String = s"${name}__v$n"

  /** Register with lazy open-once semantics per executor instance. Multi-arity
    * typed `eval` (0..6 args, any Spark SQL types in/out) goes through the
    * Java UDF interfaces so the declared `returnType` reaches Catalyst — the
    * Spark analog of arbitrary typed `eval` overloads in the reference
    * (`UserDefinedFunction.java:27-48`). A `variadic` function additionally
    * registers one wrapper per arity 0..6 under [[variadicArityName]]s.
    */
  def register(spark: SparkSession, f: UserDefinedFunction): Unit = {
    if (f.variadic) {
      variadics.synchronized(namesOf(spark).add(f.name.toLowerCase))
      (0 to MaxVariadicArity).foreach { n =>
        registerArity(spark, f, variadicArityName(f.name, n), n)
      }
    } else {
      // latest registration wins: a fixed-arity f under a previously
      // variadic name must stop the call-site renaming
      variadics.synchronized(namesOf(spark).remove(f.name.toLowerCase))
    }
    registerArity(spark, f, f.name, f.arity)
  }

  private def registerArity(
      spark: SparkSession, f: UserDefinedFunction, regName: String, regArity: Int): Unit = {
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
    regArity match {
      case 0 => spark.udf.register(regName,
        new UDF0[Any] { def call(): Any = opened.eval() }, f.returnType)
      case 1 => spark.udf.register(regName,
        new UDF1[Any, Any] { def call(a: Any): Any = opened.eval(a) }, f.returnType)
      case 2 => spark.udf.register(regName,
        new UDF2[Any, Any, Any] { def call(a: Any, b: Any): Any = opened.eval(a, b) },
        f.returnType)
      case 3 => spark.udf.register(regName,
        new UDF3[Any, Any, Any, Any] {
          def call(a: Any, b: Any, c: Any): Any = opened.eval(a, b, c)
        }, f.returnType)
      case 4 => spark.udf.register(regName,
        new UDF4[Any, Any, Any, Any, Any] {
          def call(a: Any, b: Any, c: Any, d: Any): Any = opened.eval(a, b, c, d)
        }, f.returnType)
      case 5 => spark.udf.register(regName,
        new UDF5[Any, Any, Any, Any, Any, Any] {
          def call(a: Any, b: Any, c: Any, d: Any, e: Any): Any = opened.eval(a, b, c, d, e)
        }, f.returnType)
      case 6 => spark.udf.register(regName,
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
  * projections/filters.
  *
  * Two wirings, selected by the optional [[ModelEndpoint]]:
  *  - endpoint given → a REAL `java.net.http` client posting OpenAI-protocol
  *    JSON (one lazily-opened client per executor JVM — the reference opens
  *    its langchain4j client in `UserDefinedFunction.open`). In this
  *    zero-egress environment the endpoint is the loopback
  *    [[MockModelServer]], which speaks the genuine wire format.
  *  - no endpoint → deterministic in-process functions with the same outputs,
  *    so oracles are identical either way.
  */
object ModelFunctions {

  /** The deterministic prediction both the stub UDF and [[MockModelServer]]
    * compute — keeping the oracle independent of the wiring. */
  def deterministicChat(modelName: String, input: String): String =
    s"[$modelName] " + Integer.toHexString(input.hashCode)

  /** Deterministic embedding with the real `ARRAY<FLOAT>` dimension contract. */
  def deterministicEmbedding(input: String, dim: Int): Array[Float] = {
    val rnd = new java.util.Random(input.hashCode.toLong)
    Array.fill(dim)(rnd.nextFloat())
  }

  /** `AI_CHAT_PREDICT(input) -> STRING` — per-call completion, matching the
    * reference's one-`generate`-per-eval shape (`OpenAIChatModel.eval:55`).
    */
  def registerChatPredict(
      spark: SparkSession, modelName: String, endpoint: Option[ModelEndpoint] = None): Unit =
    endpoint match {
      case Some(ep) =>
        spark.udf.register("AI_CHAT_PREDICT", new ChatUdf(ep))
      case None =>
        spark.udf.register("AI_CHAT_PREDICT", (input: String) =>
          if (input == null) null else deterministicChat(modelName, input))
    }

  /** `AI_LANGCHAIN_PREDICT(input) -> STRING` — the third registered model
    * function (`TransformSqlOperatorTable.java:377-385`); semantically a
    * chat-protocol alias of AI_CHAT_PREDICT (both resolve to a
    * one-completion-per-eval call), registered under its own name so
    * reference pipelines using either spelling run unchanged. */
  def registerLangchainPredict(
      spark: SparkSession, modelName: String, endpoint: Option[ModelEndpoint] = None): Unit =
    endpoint match {
      case Some(ep) =>
        spark.udf.register("AI_LANGCHAIN_PREDICT", new ChatUdf(ep))
      case None =>
        spark.udf.register("AI_LANGCHAIN_PREDICT", (input: String) =>
          if (input == null) null else deterministicChat(modelName, input))
    }

  /** `GET_EMBEDDING(input) -> ARRAY<FLOAT>` (`OpenAIEmbeddingModel.eval:57`).
    * Null/blank contract matches the reference
    * (`OpenAIEmbeddingModel.getEmbedding`): null or blank input yields an
    * EMPTY `Float[0]` array (no API call), not SQL NULL.
    */
  def registerGetEmbedding(
      spark: SparkSession, modelName: String, dim: Int = 16,
      endpoint: Option[ModelEndpoint] = None): Unit =
    endpoint match {
      case Some(ep) =>
        spark.udf.register("GET_EMBEDDING", new EmbedUdf(ep))
      case None =>
        spark.udf.register("GET_EMBEDDING", (input: String) =>
          if (input == null || input.trim.isEmpty) Array.empty[Float]
          else deterministicEmbedding(input, dim))
    }

  /** Register a YAML `model:` entry as a function callable BY ITS DECLARED
    * NAME — the reference's `ModelDef` flow: `model-name: CHAT` +
    * `class-name: OpenAIChatModel` makes `CHAT(col1)` a chat completion in
    * transform expressions (`FlinkPipelineUdfITCase.testTransformWithModel
    * :844-908`, `ModelDef` options carry `openai.model` / `openai.host` /
    * `openai.apikey`). `OpenAIEmbeddingModel` wires the embeddings endpoint
    * (`ARRAY<FLOAT>`); every other class name is chat-shaped (STRING),
    * matching the reference's model registry. Without `openai.host` the
    * deterministic in-process double serves (same outputs as the loopback
    * wire server, so oracles are identical either way).
    */
  def registerNamedModel(
      spark: SparkSession,
      name: String,
      className: String,
      options: Map[String, String]): Unit = {
    val modelName = options.getOrElse("openai.model", name)
    val ep = options.get("openai.host").map(h =>
      ModelEndpoint(h, modelName, options.get("openai.apikey")))
    val isEmbedding = className.toLowerCase.contains("embedding")
    (isEmbedding, ep) match {
      case (true, Some(e)) => spark.udf.register(name, new EmbedUdf(e))
      case (true, None) => spark.udf.register(name, (input: String) =>
        if (input == null || input.trim.isEmpty) Array.empty[Float]
        else deterministicEmbedding(input, 16))
      case (false, Some(e)) => spark.udf.register(name, new ChatUdf(e))
      case (false, None) => spark.udf.register(name, (input: String) =>
        if (input == null) null else deterministicChat(modelName, input))
    }
  }

  // plain Function1 classes, not lambdas-in-fields: a stored lambda field
  // deserializes as SerializedLambda and fails the Function1 cast across
  // classloaders; a named class carrying only the endpoint serializes cleanly
  // and opens its HTTP client lazily once per executor JVM
  private final class ChatUdf(ep: ModelEndpoint)
      extends (String => String) with Serializable {
    @transient private lazy val client = new OpenAiClient(ep)
    override def apply(input: String): String =
      if (input == null) null else client.chat(input)
  }
  private final class EmbedUdf(ep: ModelEndpoint)
      extends (String => Array[Float]) with Serializable {
    @transient private lazy val client = new OpenAiClient(ep)
    override def apply(input: String): Array[Float] =
      // reference contract: null/blank -> empty array, no API round-trip
      if (input == null || input.trim.isEmpty) Array.empty[Float]
      else client.embed(input)
  }

  /** The scale path for embeddings: partition-batched requests —
    * `maxBatch` rows per HTTP round-trip via the protocol's native `input`
    * array, instead of one call per row. At 100 TB this is the difference
    * between O(rows) and O(rows / maxBatch) round-trips, with no shuffle: a
    * map-only `mapPartitions` that appends `outputCol ARRAY<FLOAT>`.
    * Null inputs yield null embeddings without occupying batch slots.
    */
  def withEmbedding(
      df: org.apache.spark.sql.DataFrame, inputCol: String, outputCol: String,
      ep: ModelEndpoint): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val outSchema = df.schema.add(outputCol, ArrayType(FloatType), nullable = true)
    val inIdx = df.schema.fieldIndex(inputCol)
    df.mapPartitions { rows =>
      lazy val client = new OpenAiClient(ep)
      rows.grouped(ep.maxBatch).flatMap { batch =>
        // same null/blank contract as EmbedUdf and the stub: null -> null,
        // blank -> empty vector, neither occupies a batch slot / API call
        def blank(r: Row) = r.getString(inIdx).trim.isEmpty
        val callable = batch.filter(r => !r.isNullAt(inIdx) && !blank(r))
        val vecs: Map[String, Array[Float]] =
          if (callable.isEmpty) Map.empty
          else {
            val texts = callable.map(_.getString(inIdx)).distinct
            texts.zip(client.embedBatch(texts)).toMap
          }
        batch.map { r =>
          val v =
            if (r.isNullAt(inIdx)) null
            else if (blank(r)) Array.empty[Float]
            else vecs(r.getString(inIdx))
          Row.fromSeq(r.toSeq :+ v)
        }
      }
    }(Encoders.row(outSchema))
  }
}
