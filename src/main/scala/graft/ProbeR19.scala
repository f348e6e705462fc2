package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-19 isolated A/B probes (guide §1: measure first, one operator at a
  * time). Each probe mimics the bench methodology — one untimed warmup, then
  * median-of-N timed runs with wall AND Spark-task CPU (steal-invariant)
  * via [[Bench.CpuMeter]] — but runs ONE operator in isolation so a change's
  * effect is not buried in whole-bench noise. The same binary runs in the
  * r18 worktree (`.ab-r18`) for the "before" leg of every claim in
  * OPTIMIZATION_r19.md.
  *
  * Usage: `SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=... sbt "runMain graft.ProbeR19 nb b13 ..."`
  */
object ProbeR19 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val meter = new Bench.CpuMeter(spark)

    def timed(tag: String, runs: Int = 5)(f: => Unit): Unit = {
      f // warmup, untimed (planning + codegen + page cache)
      val ms = (1 to runs).map { _ =>
        meter.measure {
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
        }
      }
      val walls = ms.map(_._1).sorted
      val cs = ms.map(_._2).sorted
      println(f"[probe] $tag wall_med=${walls(runs / 2)}%.3f cpu_med=${cs(runs / 2)}%.3f " +
        s"walls=${ms.map(m => f"${m._1}%.3f").mkString(",")} " +
        s"cpus=${ms.map(m => f"${m._2}%.3f").mkString(",")}")
    }

    def query(name: String, runs: Int = 5): Unit = {
      spark.sparkContext.setJobDescription(s"probe:$name")
      timed(name, runs) { SparkEntry.queries(name)(spark, sfDir).count() }
      spark.sparkContext.setJobDescription(null)
    }

    // untimed warmup of shared inputs (classloading, codegen, footers)
    try {
      graft.sources.Tables.load(spark, sfDir, "lineitem")
        .selectExpr("sum(l_extendedprice * (1 - l_discount))").count()
      graft.sources.Tables.load(spark, sfDir, "documents").count()
    } catch { case _: Throwable => () }

    args.foreach {
      // headline queries, same timed action as the bench (count)
      case q if SparkEntry.queries.contains(q) => query(q)

      // B3: the 1M-event log-upsert probe, plus an envelope-only leg so the
      // aggregate's cost can be attributed separately (noop sink, §1.4)
      case "b3" =>
        val b3Events = 1000000L
        def env = spark.range(b3Events).select(
          lit("app.t").as(graft.operators.Envelope.TableIdCol),
          when(col("id") % 2 === 0, "INSERT").otherwise("UPDATE")
            .as(graft.operators.Envelope.OpCol),
          lit(null).cast("struct<k:bigint,v:bigint>").as(graft.operators.Envelope.BeforeCol),
          struct((col("id") % 200000).as("k"), col("id").as("v"))
            .as(graft.operators.Envelope.AfterCol),
          col("id").as(graft.operators.Envelope.SeqCol),
          map().cast("map<string,string>").as(graft.operators.Envelope.MetaCol))
        timed("b3_env_only") {
          env.write.format("noop").mode("overwrite").save()
        }
        timed("b3_upsert") {
          graft.operators.Upsert.materialize(env, Seq("k")).count()
        }
        Console.err.println("[probe] b3 plan:\n" +
          graft.operators.Upsert.materialize(env, Seq("k"))
            .queryExecution.executedPlan.toString)

      // B13: the paimon import-merge leg (same 40-commit setup as the bench)
      case "b13" =>
        import graft.core._
        import graft.sinks.{LakehouseTable, PaimonInterchange}
        val root = java.nio.file.Files.createTempDirectory("probe_paimon").toString
        val tb = new LakehouseTable(spark, s"$root/src")
        tb.create(TableSchema(
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField(
              "k", org.apache.spark.sql.types.LongType, nullable = false),
            org.apache.spark.sql.types.StructField(
              "v", org.apache.spark.sql.types.StringType))),
          primaryKeys = Seq("k")), buckets = 4)
        val nCommits = 40
        (0 until nCommits).foreach(i =>
          tb.append(spark.range(i * 5000L, (i + 1) * 5000L)
            .select(col("id").as("k"), concat(lit("v"), col("id")).as("v"))))
        PaimonInterchange.mirror(spark, tb, s"$root/paimon")
        timed("b13_import_merge") {
          require(PaimonInterchange.importPaimon(spark, s"$root/paimon")
            .count() == nCommits * 5000L)
        }
        Console.err.println("[probe] b13 import plan:\n" +
          PaimonInterchange.importPaimon(spark, s"$root/paimon")
            .queryExecution.executedPlan.toString)

      // B6: the lakehouse streaming drain (same 16-commit setup as the
      // bench), decomposed: full stream drain vs the same 4 commit-range
      // batch reads without the streaming engine vs driver-side snapshot()
      case "b6" =>
        import graft.core._
        val dir = java.nio.file.Files.createTempDirectory("probe_lake_b6").toString
        val t = new graft.sinks.LakehouseTable(spark, dir)
        t.create(
          TableSchema(
            org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField(
                "k", org.apache.spark.sql.types.LongType, nullable = false),
              org.apache.spark.sql.types.StructField(
                "v", org.apache.spark.sql.types.LongType))),
            primaryKeys = Seq.empty),
          buckets = 8)
        (0 until 16).foreach(i =>
          t.append(spark.range(50000L * i, 50000L * (i + 1)).coalesce(4)
            .select(col("id").as("k"), (col("id") * 2).as("v"))))
        val b6Rows = 800000L
        timed("b6_stream_drain", runs = 3) {
          val ckpt = java.nio.file.Files.createTempDirectory("probe_b6_ckpt").toString
          val n = new java.util.concurrent.atomic.AtomicLong()
          val q = spark.readStream.format("graft-lakehouse")
            .option("path", dir)
            .option("startingVersion", "0")
            .option("maxCommitsPerBatch", "4")
            .load()
            .writeStream
            .option("checkpointLocation", ckpt)
            .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
              n.addAndGet(b.count()); ()
            }
            .start()
          q.processAllAvailable()
          q.stop()
          require(n.get() == b6Rows, s"b6 drained ${n.get()} of $b6Rows rows")
        }
        timed("b6_batch_reads", runs = 3) {
          val n = (0 until 4).map(i =>
            t.readChangesBetween(i * 4L, (i + 1) * 4L).count()).sum
          require(n == b6Rows, s"batch reads drained $n of $b6Rows rows")
        }
        timed("b6_snapshot_driver", runs = 3) {
          (0 until 4).foreach(_ => t.snapshot())
        }
        // attribution: the mergeSchema footer-merge job vs a pinned-schema
        // read of the same files (what readChangesBetween could do when the
        // range's files need no merge)
        val paths = t.snapshot().files
          .map(f => java.nio.file.Paths.get(dir, f.path).toString)
        timed("b6_read_mergeschema", runs = 3) {
          require(spark.read.option("mergeSchema", "true")
            .parquet(paths: _*).count() == b6Rows)
        }
        val pinned = t.snapshot().schema.struct
        timed("b6_read_pinned", runs = 3) {
          require(spark.read.schema(pinned).parquet(paths: _*).count() == b6Rows)
        }
      case other =>
        Console.err.println(s"[probe] unknown probe '$other' — skipped")
    }
    spark.stop()
    sys.exit(0)
  }
}
