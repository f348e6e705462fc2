package graft.functions

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** Connection spec for an OpenAI-compatible model endpoint — the Spark-side
  * analog of the reference's model options (`flink-cdc-composer/.../definition/
  * ModelDef.java`: `model-name`, `host`, `api-key`; consumed by
  * `OpenAIChatModel.java:43-55` / `OpenAIEmbeddingModel.java:47-57`).
  *
  * Serializable so a UDF closure can carry it to executors; each executor JVM
  * opens its own [[OpenAiClient]] lazily (the reference opens its langchain4j
  * client in `UserDefinedFunction.open`).
  */
final case class ModelEndpoint(
    baseUrl: String,
    model: String,
    apiKey: Option[String] = None,
    timeoutMillis: Long = 30000L,
    maxBatch: Int = 64)
    extends Serializable

/** Minimal OpenAI-protocol HTTP client on the JDK's `java.net.http` — the real
  * wire path the reference reaches through langchain4j (`OpenAIChatModel.eval:55`
  * posts one chat completion per call; `OpenAIEmbeddingModel.eval:57` embeds via
  * the embeddings endpoint, which accepts a batched `input` array).
  *
  * No external dependency: JSON via Jackson (already on the Spark classpath),
  * HTTP via the JDK client. One instance per executor JVM; thread-safe
  * (HttpClient is, and the mapper is used read-only per call).
  */
final class OpenAiClient(ep: ModelEndpoint) {
  private val mapper = new ObjectMapper
  private val http = HttpClient.newBuilder()
    .connectTimeout(Duration.ofMillis(ep.timeoutMillis))
    .build()

  private def post(path: String, body: String): JsonNode = {
    val b = HttpRequest.newBuilder(URI.create(ep.baseUrl.stripSuffix("/") + path))
      .timeout(Duration.ofMillis(ep.timeoutMillis))
      .header("Content-Type", "application/json")
    ep.apiKey.foreach(k => b.header("Authorization", s"Bearer $k"))
    val req = b.POST(HttpRequest.BodyPublishers.ofString(body, StandardCharsets.UTF_8)).build()
    val resp = http.send(req, HttpResponse.BodyHandlers.ofString(StandardCharsets.UTF_8))
    if (resp.statusCode() / 100 != 2)
      throw new RuntimeException(
        s"model endpoint ${ep.baseUrl}$path returned HTTP ${resp.statusCode()}: ${resp.body().take(500)}")
    mapper.readTree(resp.body())
  }

  /** `POST /chat/completions` — one prompt, one completion
    * (`OpenAIChatModel.eval:55` semantics: `generate(input)` → content text).
    */
  def chat(prompt: String): String = {
    val root = mapper.createObjectNode()
    root.put("model", ep.model)
    val msgs = root.putArray("messages")
    val m = msgs.addObject()
    m.put("role", "user")
    m.put("content", prompt)
    post("/chat/completions", mapper.writeValueAsString(root))
      .path("choices").path(0).path("message").path("content").asText()
  }

  /** `POST /embeddings` with a batched `input` array — the protocol's native
    * batching, which is what makes the scale path (partition-batched
    * [[ModelFunctions.withEmbedding]]) one HTTP round-trip per `maxBatch` rows
    * instead of per row. Results are re-ordered by the response's `index`
    * field as the protocol allows out-of-order `data` entries.
    */
  def embedBatch(inputs: Seq[String]): Seq[Array[Float]] = {
    if (inputs.isEmpty) return Seq.empty
    val root = mapper.createObjectNode()
    root.put("model", ep.model)
    val arr = root.putArray("input")
    inputs.foreach(arr.add)
    val data = post("/embeddings", mapper.writeValueAsString(root)).path("data")
    val out = new Array[Array[Float]](inputs.size)
    val it = data.elements()
    while (it.hasNext) {
      val e = it.next()
      val idx = e.path("index").asInt()
      val vecNode = e.path("embedding")
      val vec = new Array[Float](vecNode.size())
      var i = 0
      while (i < vec.length) { vec(i) = vecNode.path(i).floatValue(); i += 1 }
      out(idx) = vec
    }
    require(out.forall(_ != null),
      s"embeddings response covered ${out.count(_ != null)}/${inputs.size} inputs")
    out.toSeq
  }

  def embed(input: String): Array[Float] = embedBatch(Seq(input)).head
}

/** Loopback OpenAI-protocol server on the JDK's `com.sun.net.httpserver` — the
  * test double for the zero-egress environment. It speaks the real wire format
  * (request parse, response shape, auth check) and computes the deterministic
  * functions in [[ModelFunctions]], so the same oracle values hold whether a
  * query runs against the stub UDFs or through the full HTTP round-trip.
  *
  * JVM-lifetime singleton: `endpoint()` lazily starts the server on an
  * ephemeral 127.0.0.1 port and keeps it up (local-mode executors share the
  * JVM, so the loopback address is reachable from UDFs).
  */
object MockModelServer {
  import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
  import java.util.concurrent.atomic.AtomicLong

  private val mapper = new ObjectMapper
  /** requests served per path — lets tests assert batching (N rows, few calls). */
  val chatRequests = new AtomicLong(0)
  val embeddingRequests = new AtomicLong(0)

  val apiKey = "graft-test-key"
  private val embeddingDim = 16

  /** The JDK HttpServer's internal "HTTP-Dispatcher" thread inherits the
    * daemon flag of the thread that calls `start()`. Booting from a daemon
    * thread makes the dispatcher daemon too, so a main (graft.Verify /
    * graft.Bench — the driver contract) exits when its work is done instead
    * of hanging on a live non-daemon dispatcher that shutdown hooks can
    * never reach (hooks only fire once shutdown STARTS).
    */
  private lazy val server: HttpServer = {
    var booted: HttpServer = null
    var bootError: Throwable = null
    val boot = new Thread(() => {
      try booted = buildServer()
      catch { case t: Throwable => bootError = t }
    }, "mock-model-server-boot")
    boot.setDaemon(true)
    boot.start()
    boot.join()
    // a bind/boot failure must surface as its root cause here, not as a later
    // NPE at server.getAddress with the original exception lost on the thread
    if (bootError != null) throw new IllegalStateException(
      "mock model server failed to boot", bootError)
    if (booted == null) throw new IllegalStateException(
      "mock model server boot thread exited without a server or an error")
    booted
  }

  private def buildServer(): HttpServer = {
    val s = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    s.createContext("/chat/completions", handler { (model, body) =>
      chatRequests.incrementAndGet()
      val prompt = body.path("messages").path(0).path("content").asText()
      val root = mapper.createObjectNode()
      val choice = root.putArray("choices").addObject()
      choice.putObject("message")
        .put("role", "assistant")
        .put("content", ModelFunctions.deterministicChat(model, prompt))
      root
    })
    s.createContext("/embeddings", handler { (_, body) =>
      embeddingRequests.incrementAndGet()
      val inputs = body.path("input")
      val root = mapper.createObjectNode()
      val data = root.putArray("data")
      var i = 0
      while (i < inputs.size()) {
        val e = data.addObject()
        e.put("index", i)
        val vec = e.putArray("embedding")
        ModelFunctions.deterministicEmbedding(inputs.path(i).asText(), embeddingDim)
          .foreach(vec.add)
        i += 1
      }
      root
    })
    s.setExecutor(null) // serve on the dispatch thread: deterministic, test-only
    s.start()
    sys.addShutdownHook(s.stop(0))
    s
  }

  private def handler(f: (String, JsonNode) => JsonNode): HttpHandler =
    new HttpHandler {
      override def handle(ex: HttpExchange): Unit =
        try {
          val auth = ex.getRequestHeaders.getFirst("Authorization")
          if (auth != s"Bearer $apiKey") { respond(ex, 401, """{"error":"unauthorized"}"""); return }
          val body = mapper.readTree(ex.getRequestBody)
          val model = body.path("model").asText()
          respond(ex, 200, mapper.writeValueAsString(f(model, body)))
        } catch {
          case e: Exception =>
            // serialize via Jackson: a message containing quotes/newlines must
            // not produce an invalid JSON error body
            val err = mapper.createObjectNode()
            err.put("error", Option(e.getMessage).getOrElse(e.getClass.getName))
            respond(ex, 500, mapper.writeValueAsString(err))
        } finally ex.close()
    }

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length.toLong)
    ex.getResponseBody.write(bytes)
  }

  /** Endpoint spec for the running loopback server (starts it on first use). */
  def endpoint(model: String, maxBatch: Int = 64): ModelEndpoint =
    ModelEndpoint(
      s"http://127.0.0.1:${server.getAddress.getPort}",
      model, Some(apiKey), maxBatch = maxBatch)
}
