package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF join — for each left row, the most recent right row with
  * `rightTs <= leftTs` on the same key (the temporal join Spark's built-in
  * operators lack; the brief's canonical custom-operator example).
  *
  * Plan (the scale-right shape): tag and UNION both sides, then one window
  * pass per key ordered by (ts, side) carrying the last-seen right payload
  * forward — `last(_, ignoreNulls)` over an unbounded-preceding frame is a
  * running value, so the window needs ONE shuffle + per-key sort and never
  * materializes the (left × earlier-rights) candidate explosion a range-join
  * formulation pays. Right rows sort BEFORE left rows at equal timestamps,
  * giving inclusive `<=` semantics (DuckDB/QuestDB ASOF convention).
  *
  * At 100 TB: one hash shuffle of (left ∪ right) by key + a per-key-partition
  * sort — the same cost class as any windowed analytic; AQE handles skewed
  * keys. A bucketed layout on `key` removes the shuffle entirely
  * (see `Colocate.writeBucketed`).
  */
object AsOfJoin {

  /** @param left     left (probe) side
    * @param right    right (reference) side
    * @param key      equi-join column present on both sides
    * @param leftTs   event-time column on the left
    * @param rightTs  event-time column on the right
    * @return left columns + the matched right payload columns (null structs
    *         when no right row precedes the left row), named as on the right
    *         (minus key/ts, which would collide)
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String): DataFrame = {
    val rightPayloadCols = right.columns.filterNot(c => c == key || c == rightTs).toSeq
    val leftTagged = left.select(
      col(key).as("__k"), col(leftTs).cast("timestamp").as("__ts"),
      lit(1).as("__side"),
      struct(left.columns.map(col).toIndexedSeq: _*).as("__l"),
      lit(null).cast(org.apache.spark.sql.types.StructType(
        right.select(rightPayloadCols.map(col).toIndexedSeq: _*).schema.fields)).as("__r"))
    val rightTagged = right.select(
      col(key).as("__k"), col(rightTs).cast("timestamp").as("__ts"),
      lit(0).as("__side"),
      lit(null).cast(org.apache.spark.sql.types.StructType(
        left.schema.fields)).as("__l"),
      struct(rightPayloadCols.map(col).toIndexedSeq: _*).as("__r"))

    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    leftTagged.unionByName(rightTagged)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(
        (left.columns.map(c => col(s"__l.$c").as(c)) ++
          rightPayloadCols.map(c => col(s"__match.$c").as(c))).toIndexedSeq: _*)
  }
}
