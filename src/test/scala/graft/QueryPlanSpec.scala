package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape assertions for driver-contract queries: correctness is covered
  * by the DuckDB oracle; these tests pin the EXECUTION shape that matters at
  * 100 TB (mirroring DedupSpec's no-CartesianProduct checks).
  */
class QueryPlanSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  private val sf = SparkTestBase.sf0001

  test("q_window executes as an aggregate with map-side partial, not a window") {
    val df = QueriesCore.queries("q_window")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window operator in plan:\n$plan")
    // the scale property: a PARTIAL aggregate runs before the exchange, so
    // the shuffle carries one row per (scan partition, key) instead of every
    // lineitem row (the window plan's failure mode at 100 TB)
    assert(plan.contains("partial_min_by"), s"no map-side partial aggregation:\n$plan")
  }

  test("q4 compiles EXISTS to a semi-join with pushed date filters, no cartesian") {
    val df = QueriesCore.queries("q4_order_priority")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), s"EXISTS should be a semi-join:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("PushedFilters: [IsNotNull(o_orderdate)"),
      s"date filter should reach the orders scan:\n$plan")
  }

  test("q18 aggregates lineitem BEFORE its joins (HAVING shrinks the join input)") {
    val df = QueriesCore.queries("q18_large_orders")(spark, sf)
    val optimized = df.queryExecution.optimizedPlan.toString
    // in the printed top-down optimized plan, the lineitem Aggregate node
    // sits BELOW (later than) the first Join — the HAVING shrinks the join
    // input instead of running after the joins
    val joinIdx = optimized.indexOf("Join")
    val aggIdx = optimized.indexOf("Aggregate [l_orderkey")
    assert(joinIdx >= 0 && aggIdx > joinIdx,
      s"expected aggregate-below-join shape:\n$optimized")
    assert(!df.queryExecution.executedPlan.toString.contains("CartesianProduct"))
  }

  test("x_corpus_stats runs with map-side partial aggregation") {
    val df = QueriesML.queries("x_corpus_stats")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial"), s"no map-side partial aggregate:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("r_subquery stays in-plan: scalar broadcast join, no second job") {
    val df = QueriesRelational.queries("r_subquery")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"expected broadcast of the single-row aggregate:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("custom expressions compile under codegen (no interpreted fallback)") {
    import graft.functions.CatalystExprs
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // spark.sql.codegen.fallback=false turns a Janino failure into an error
    // instead of a silent interpreted fallback
    val prev = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val df = Seq(("alpha beta gamma delta", Array(0.5f, -0.25f, 1f)))
        .toDF("text", "vec")
      val planes = Array(Array(1.0, 0.0, 0.0), Array(0.0, 1.0, 0.0))
      val out = df.select(
        CatalystExprs.wordShingles($"text", 2).as("sh"),
        CatalystExprs.strictWordGrams($"text", 2).as("sg"),
        CatalystExprs.minHashSig(CatalystExprs.wordShingles($"text", 2), 8).as("mh"),
        CatalystExprs.simHash64($"text").as("sim"),
        CatalystExprs.nearestCentroid($"vec", planes).as("nc"),
        CatalystExprs.dotF($"vec", $"vec").as("dot"),
        CatalystExprs.repetitionStats($"text").as("rep")).head()
      assert(out.getSeq[String](0).size == 3)
      assert(out.getSeq[String](1).size == 3)
      assert(out.getSeq[Long](2).size == 8)
      assert(out.getDouble(5) == (0.5 * 0.5 + 0.25 * 0.25 + 1.0))
      assert(out.getStruct(6).getInt(0) == 4) // rep.tokens
      // hyperplane sig separately (closes over reference objects)
      val sig = df.select(
        CatalystExprs.hyperplaneSig($"vec", dim = 3, bits = 16, seed = 7L)).head().getLong(0)
      assert(sig >= 0L)
      // PQ encode + ADC (reference-object codebooks, packed-long codes)
      val books = Array(
        Array(Array(0.0), Array(1.0)),                  // block 0: centroids 0,1
        Array(Array(0.0), Array(-0.5)),                 // block 1
        Array(Array(1.0), Array(2.0)))                  // block 2
      val pqRow = df.select(
        CatalystExprs.pqEncode($"vec", books).as("codes"))
        .select($"codes",
          CatalystExprs.pqAdc($"codes",
            typedLit(Seq(0.1, 0.2, 0.3, 0.4, 0.5, 0.6)), m = 3, ks = 2).as("dist"))
        .head()
      // vec = (0.5,-0.25,1): block0 → code1? |0.5-0|=.25 < |0.5-1|=.25 tie→0;
      // block1 → |-.25-0|².0625 vs |-.25+.5|².0625 tie→0; block2 → 1.0 code0
      assert(pqRow.getLong(0) == 0L)
      assert(math.abs(pqRow.getDouble(1) - (0.1 + 0.3 + 0.5)) < 1e-12)
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }

  test("d_span_dedup: keep-first is a hash aggregate with map-side partials, no window") {
    // round 7 replaced the sort-window keep-first (full sort of every span
    // occurrence per partition) with min(struct(id, idx)) — a hash aggregate
    // whose partial runs map-side, so the one shuffle carries one row per
    // (scan partition, distinct span) instead of every span occurrence
    val df = QueriesML.queries("d_span_dedup")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window operator in plan:\n$plan")
    assert(plan.contains("partial_min"), s"no map-side partial min:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("d_semdedup: cluster-scoped banding, signature subtree shuffled once, no cartesian") {
    val df = QueriesML.queries("d_semdedup")(spark, sf)
    df.count() // AQE finalizes the join strategy only in the FINAL plan
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    // the candidate join must be keyed by (band, bucketKey): either AQE
    // broadcasts the (small) banded side, or at scale the self-join reuses
    // the one banding exchange — both are the bucketed shape, never all-pairs
    assert(plan.contains("ReusedExchange") ||
      (plan.contains("BroadcastHashJoin [band") && plan.contains("bucketKey")),
      s"banding join shape unexpected:\n$plan")
  }

  test("r_pivot compiles to ONE aggregate pass, not a per-status union of scans") {
    val df = QueriesRelational.queries("r_pivot")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Union"), s"pivot must not union per-status scans:\n$plan")
    assert(plan.contains("partial"), s"no map-side partial aggregation:\n$plan")
    // one scan of orders feeds all six pivoted aggregates
    assert("orders\\.parquet".r.findAllIn(plan).size <= 1, s"multiple scans:\n$plan")
  }

  test("r_unpivot executes as a map-only Expand, not a three-scan union") {
    val df = QueriesRelational.queries("r_unpivot")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), s"expected Expand node:\n$plan")
    assert("lineitem\\.parquet".r.findAllIn(plan).size <= 1, s"multiple scans:\n$plan")
  }

  test("x_curate_e2e: bench grams broadcast, no cartesian anywhere") {
    val df = QueriesML.queries("x_curate_e2e")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"decontamination bench-gram join should broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("a_embed_centroids: partial aggregate before the single shuffle") {
    val df = QueriesML.queries("a_embed_centroids")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial_avg") || plan.contains("partial_average") ||
      plan.toLowerCase.contains("partial"), s"no map-side partial avg:\n$plan")
  }

  test("t_udf2: multi-arity typed UDF through the lifecycle registry") {
    val rows = QueriesCore.queries("t_udf2")(spark, sf).limit(3).collect()
    rows.foreach { r =>
      assert(r.getLong(1) / 100L == r.getLong(0)) // mix encodes the key
    }
  }
}
