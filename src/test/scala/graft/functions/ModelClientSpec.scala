package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Real-wire tests for the OpenAI-protocol model client: every assertion here
  * goes through an actual HTTP round-trip against the loopback
  * [[MockModelServer]] (request JSON → auth → response JSON → parse), the same
  * path `OpenAIChatModel.eval:55` / `OpenAIEmbeddingModel.eval:57` take through
  * langchain4j in the reference.
  */
class ModelClientSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def client(maxBatch: Int = 64) =
    new OpenAiClient(MockModelServer.endpoint("m1", maxBatch = maxBatch))

  test("chat round-trip returns the deterministic completion") {
    assert(client().chat("HOUSEHOLD") === ModelFunctions.deterministicChat("m1", "HOUSEHOLD"))
  }

  test("embeddings batch: one HTTP request covers many inputs, order preserved") {
    val inputs = (1 to 50).map(i => s"doc-$i")
    val before = MockModelServer.embeddingRequests.get()
    val vecs = client().embedBatch(inputs)
    assert(MockModelServer.embeddingRequests.get() === before + 1)
    assert(vecs.size === 50)
    inputs.zip(vecs).foreach { case (in, v) =>
      assert(v.toSeq === ModelFunctions.deterministicEmbedding(in, 16).toSeq)
    }
  }

  test("missing api key is rejected by the server and surfaces as an error") {
    val ep = MockModelServer.endpoint("m1").copy(apiKey = None)
    val e = intercept[RuntimeException](new OpenAiClient(ep).chat("x"))
    assert(e.getMessage.contains("401"))
  }

  test("server 500 bodies are valid JSON even when the message has quotes") {
    val ep = MockModelServer.endpoint("m1")
    val url = new java.net.URL(ep.baseUrl + "/chat/completions")
    val conn = url.openConnection().asInstanceOf[java.net.HttpURLConnection]
    conn.setRequestMethod("POST")
    conn.setDoOutput(true)
    conn.setRequestProperty("Authorization", s"Bearer ${ep.apiKey.get}")
    // malformed JSON body with embedded quotes/newline -> parser exception whose
    // message itself contains quotes; the error body must still parse as JSON
    conn.getOutputStream.write("{\"broken\": \"x\n".getBytes("UTF-8"))
    assert(conn.getResponseCode === 500)
    val body = new String(conn.getErrorStream.readAllBytes(), "UTF-8")
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(body)
    assert(node.has("error") && node.get("error").asText().nonEmpty)
  }

  test("registered UDFs answer through HTTP with stub-identical results") {
    import spark.implicits._
    ModelFunctions.registerChatPredict(
      spark, "m1", endpoint = Some(MockModelServer.endpoint("m1")))
    ModelFunctions.registerGetEmbedding(
      spark, "m1", endpoint = Some(MockModelServer.endpoint("m1")))
    val rows = Seq("a", "b", null, "  ").toDF("s")
      .selectExpr("AI_CHAT_PREDICT(s) AS p", "size(GET_EMBEDDING(s)) AS d")
      .collect()
    assert(rows.map(r => if (r.isNullAt(0)) null else r.getString(0)).take(3).toSeq ===
      Seq(ModelFunctions.deterministicChat("m1", "a"),
        ModelFunctions.deterministicChat("m1", "b"), null))
    // reference contract (OpenAIEmbeddingModel.getEmbedding): null/blank input
    // -> EMPTY Float[0] array (no API call), not SQL NULL
    assert(rows.map(r => if (r.isNullAt(1)) -1 else r.getInt(1)).toSeq === Seq(16, 16, 0, 0))
  }

  test("withEmbedding batches per partition: far fewer requests than rows") {
    import spark.implicits._
    val df = (1 to 200).map(i => (i, s"text-${i % 40}")).toDF("id", "txt")
      .repartition(2)
    val before = MockModelServer.embeddingRequests.get()
    val out = ModelFunctions.withEmbedding(df, "txt", "emb",
      MockModelServer.endpoint("m1", maxBatch = 100))
    val got = out.collect()
    val calls = MockModelServer.embeddingRequests.get() - before
    // 200 rows, 2 partitions, batch 100 → at most 4 requests (grouped(100)
    // per partition), never one per row
    assert(calls <= 4, s"expected <=4 batched requests, saw $calls")
    assert(got.length === 200)
    got.foreach { r =>
      val txt = r.getString(1)
      assert(r.getSeq[Float](2) === ModelFunctions.deterministicEmbedding(txt, 16).toSeq)
    }
  }

  test("withEmbedding passes nulls through without spending batch slots") {
    import spark.implicits._
    val df = Seq((1, "x"), (2, null), (3, "y")).toDF("id", "txt")
    val out = ModelFunctions.withEmbedding(df, "txt", "emb",
      MockModelServer.endpoint("m1")).orderBy("id").collect()
    assert(out(1).isNullAt(2))
    assert(out(0).getSeq[Float](2).nonEmpty && out(2).getSeq[Float](2).nonEmpty)
  }
}
