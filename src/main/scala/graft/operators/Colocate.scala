package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Join co-location tools for the 100 TB paths where a shuffle-per-join is
  * the bottleneck (brief: "broadcast for small dims, repartition/bucketing
  * for co-located joins, salting for skew"):
  *
  *  - [[writeBucketed]] persists a table hash-bucketed on its join key; two
  *    tables bucketed the same way join with NO exchange on either side —
  *    the shuffle is paid once at write time and amortized over every
  *    subsequent join (fact-fact joins on a shared key, e.g. orders ⋈
  *    lineitem on orderkey, are the canonical case);
  *  - [[saltedJoin]] spreads a skewed build key over `salts` sub-keys: the
  *    probe side gets a deterministic salt, the build side is replicated
  *    `salts` times, and the join key becomes (key, salt) — a single hot key
  *    that would pin one reducer is split across `salts` of them. AQE's
  *    skew-join split handles moderate skew automatically; explicit salting
  *    is for the pathological single-key case AQE cannot subdivide (one key
  *    larger than a partition).
  */
object Colocate {

  /** Write `df` hash-bucketed (and sorted) on `key` as a managed table.
    * Readers joining two tables bucketed on the same key with the same
    * bucket count get a co-located sort-merge join: zero Exchange nodes.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Salted equi-join: `probe` (large, skewed) joins `build` (small enough to
    * replicate `salts`×, far too large to broadcast... or simply skewed) on
    * `key`. The probe salt is deterministic (hash of the whole row modulo
    * `salts`), so Spark task retries recompute identical salts.
    */
  def saltedJoin(
      probe: DataFrame,
      build: DataFrame,
      key: String,
      salts: Int): DataFrame = {
    val saltedProbe = probe.withColumn(
      "__salt", pmod(hash(probe.columns.map(col).toIndexedSeq: _*), lit(salts)))
    val saltedBuild = build.withColumn(
      "__salt", explode(array((0 until salts).map(lit): _*)))
    saltedProbe.join(saltedBuild, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-stage aggregate for a skewed group key: stage 1 partially aggregates
    * on (key, salt), stage 2 merges the `salts` partials per key. Spark's
    * map-side partial aggregation already absorbs most key skew; this is the
    * explicit form for algebraic aggregates over keys so hot that even the
    * post-partial shuffle partition overflows.
    */
  def saltedSum(df: DataFrame, key: String, valueCol: String, salts: Int): DataFrame =
    df.withColumn("__salt", pmod(hash(df.columns.map(col).toIndexedSeq: _*), lit(salts)))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as(s"sum_$valueCol"))

  /** Drop the bucketed tables created by [[writeBucketed]] (test hygiene). */
  def dropTables(spark: SparkSession, tables: String*): Unit =
    tables.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
}
