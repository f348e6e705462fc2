package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline queries on `SPARK_GRAFT_SF_DIR` and
  * prints ONE JSON line `{"metric","value","unit","queries",...}`.
  *
  * Failed queries are reported as negative sentinels AND listed in an
  * `"errors"` map (a fast failure must not look like a fast query).
  */
object Bench {

  /** Scale-relevant subset of SparkEntry.queries: scans, shuffles, joins,
    * window, LSH dedup, ANN — the B1-B4 envelope of BASELINE.md.
    */
  val headline: Seq[String] = Seq(
    "q1_agg", "q3_join", "q_topk", "q_window", "q_events_daily",
    "t_projection", "t_arith", "t_temporal",
    "c_upsert", "c_chunks",
    "d_exact_fingerprint", "d_minhash_lsh", "d_embedding_dup",
    "x_quality", "x_langid", "a_ann_bruteforce")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // untimed warmup: absorb classloading/codegen/parquet-footer costs so the
    // first timed query measures the engine, not JVM startup
    try {
      graft.sources.Tables.load(spark, sfDir, "lineitem")
        .selectExpr("sum(l_extendedprice * (1 - l_discount))").count()
      graft.sources.Tables.load(spark, sfDir, "events").count()
    } catch { case _: Throwable => () }

    val all = SparkEntry.queries
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val results = headline.filter(all.contains).map { name =>
      val t0 = System.nanoTime()
      val ok =
        try { all(name)(spark, sfDir).count(); true }
        catch {
          case e: Throwable =>
            errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
            false
        }
      val sec = (System.nanoTime() - t0) / 1e9
      name -> (if (ok) sec else -sec)
    }

    def jq(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""
    val qs = results.map { case (k, v) => jq(k) + ":" + f"$v%.3f" }.mkString("{", ",", "}")
    val errs = errors.map { case (k, v) => jq(k) + ":" + jq(v) }.mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v > 0 => v }.sum
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":${jq(
          sfDir)}}""")
    spark.stop()
  }
}
