package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Binned point-in-interval range join — the second custom join the brief
  * names. A pure range predicate (no equi key) plans as
  * BroadcastNestedLoopJoin in Spark: every point row is tested against every
  * interval — O(|P|·|I|), a scale killer. Binning converts it to an
  * EQUI-join: intervals explode to the fixed-width bins they overlap, points
  * compute their single bin, the join runs as a hash join on the bin key,
  * and the residual `lo <= p <= hi` filter removes same-bin non-overlaps.
  *
  * Cost: |I| · (avg interval width / binWidth) replicated interval rows and
  * ONE hash shuffle — against the nested-loop product. Pick `binWidthSec`
  * near the typical interval width so replication stays O(1) per interval
  * (the same trade Spark's own storage-partitioned range-join strategies and
  * Delta's range-join hints make).
  */
object RangeJoin {

  /** @param points       rows with a timestamp point column
    * @param pointCol     timestamp column on `points`
    * @param intervals    rows with [lo, hi] timestamp interval columns
    * @param loCol        interval start (inclusive)
    * @param hiCol        interval end (inclusive)
    * @param binWidthSec  bin width in seconds
    * @return points ⋈ overlapping intervals (all columns of both sides);
    *         each (point, interval) pair appears exactly once — the point
    *         lives in exactly one bin
    */
  def pointInInterval(
      points: DataFrame,
      pointCol: String,
      intervals: DataFrame,
      loCol: String,
      hiCol: String,
      binWidthSec: Long): DataFrame = {
    val p = points.withColumn(
      "__bin", (col(pointCol).cast("timestamp").cast("long") / binWidthSec).cast("long"))
    val i = intervals.withColumn(
      "__bin",
      explode(sequence(
        (col(loCol).cast("timestamp").cast("long") / binWidthSec).cast("long"),
        (col(hiCol).cast("timestamp").cast("long") / binWidthSec).cast("long"))))
    p.join(i, "__bin")
      .filter(col(pointCol).cast("timestamp").between(
        col(loCol).cast("timestamp"), col(hiCol).cast("timestamp")))
      .drop("__bin")
  }
}
