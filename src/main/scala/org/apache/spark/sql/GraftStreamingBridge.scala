package org.apache.spark.sql

/** The one `private[sql]` door an out-of-tree DSv1 streaming source needs:
  * `Source.getBatch` must return a DataFrame with `isStreaming = true`, and
  * the only way to flag an arbitrary batch plan is
  * `SparkSession.internalCreateDataFrame(rdd, schema, isStreaming = true)` —
  * exactly how Spark's own `FileStreamSource` (and Delta's `DeltaSource`)
  * produce their batches. This bridge re-exports that call for
  * [[graft.streaming.LakehouseStreamSource]]; nothing else crosses the
  * package boundary.
  */
object GraftStreamingBridge {

  /** Re-wrap a batch DataFrame's physical RDD as a streaming-flagged
    * DataFrame. Execution stays lazy: the RDD is planned now, computed when
    * the micro-batch runs. */
  def asStreaming(df: DataFrame): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[classic.SparkSession]
    spark.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = true)
  }
}
