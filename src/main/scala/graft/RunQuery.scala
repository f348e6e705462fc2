package graft

import org.apache.spark.sql.SparkSession

/** Development runner: execute ONE `SparkEntry.queries` entry against a SF
  * dir and print its result head + row count — the single-query sibling of
  * [[Verify]] (which runs all entries for the driver sweep). Usage:
  * `runMain graft.RunQuery <name> <sfDir> [showN] [dumpDir]` — with
  * `dumpDir` the result is also written as parquet for a local DuckDB
  * compare.
  */
object RunQuery {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: RunQuery <name> <sfDir> [showN]")
    val name = args(0); val sfDir = args(1)
    val showN = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = SparkEntry.queries.getOrElse(name,
      throw new IllegalArgumentException(
        s"no query '$name'; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
    val t0 = System.nanoTime()
    val df = fn(spark, sfDir)
    Verify.assertHashSafeSchema(name, df.schema)
    val rows = df.count()
    df.show(showN, truncate = false)
    if (args.length > 3)
      df.coalesce(1).write.mode("overwrite").parquet(s"${args(3)}/$name")
    println(f"[runquery] $name rows=$rows wall=${(System.nanoTime() - t0) / 1e9}%.2fs")
    spark.stop()
  }
}
