package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** PLANS.md section generator: prints the `formatted` plan of each named
  * driver-contract query (all headline queries when no args are given), in
  * the exact markdown shape PLANS.md uses — so the plan-evidence doc is
  * regenerated, never hand-maintained.
  *
  * Usage: `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 sbt "runMain graft.Plans d_dup_spans ..."`
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else Bench.headline
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      println(s"## $name")
      println()
      println("```")
      println(df.queryExecution.explainString(FormattedMode).trim)
      println("```")
      println()
    }
    spark.stop()
    sys.exit(0)
  }
}
