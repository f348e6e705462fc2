package graft.sinks

import graft.sinks.LakehouseFormat.{AddFile, Snapshot}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType
import java.nio.file.{Path, Paths}

/** Machinery shared by the Delta and Iceberg PARTITIONED mirrors: both
  * rewrite each lakehouse commit's adds into Hive/identity-partitioned
  * split files and map the lakehouse's whole-bucket COW removals onto
  * those split files by NAME — the source bucket rides in the file name,
  * so no sidecar is needed. Keeping the regex, the whole-bucket-removal
  * invariant, and the split job in one place means a fix to the removal
  * model cannot drift between the two formats.
  */
private[sinks] object PartitionedMirror {

  /** Mirrored split-file names encode the SOURCE lakehouse bucket (the
    * COW removal granularity): `part-v<ver>-b<srcBucket>-<n>.parquet`
    * (Delta mirror) / `part-s<snapshotId>-b<srcBucket>-<n>.parquet`
    * (Iceberg mirror). */
  private val SrcBucketName = """part-[a-z]\d+-b(\d+)-\d+\.parquet""".r

  def srcBucketOf(fileName: String): Option[Int] = fileName match {
    case SrcBucketName(b) => Some(b.toInt)
    case _ => None
  }

  /** The removal-mapping invariant: a commit must remove source buckets
    * WHOLE (the lakehouse COW model always rewrites a bucket's full file
    * set), because removals map to mirrored split files only through the
    * bucket number in their names. Returns the removed bucket set;
    * refuses loudly on a partial-bucket removal. */
  def wholeBucketRemovalSet(v: Long, removes: Seq[AddFile],
      prev: Option[Snapshot]): Set[Int] = {
    val rb = removes.map(_.bucket).toSet
    prev.foreach { p =>
      val partial = p.files.filter(f => rb.contains(f.bucket))
        .filterNot(f => removes.exists(_.path == f.path))
      require(partial.isEmpty,
        s"version $v removes only part of lakehouse bucket(s) " +
          s"${partial.map(_.bucket).distinct.sorted.mkString(",")} — " +
          "the name-mapped removal model assumes whole-bucket " +
          "rewrites; refusing")
    }
    rb
  }

  /** ONE `partitionBy` job splitting a commit's adds by (partition tuple,
    * source lakehouse bucket): the bucket rides in each output file's name
    * (for removal mapping), partition columns stay OUT of the data files
    * (per-file partition values restore them on import). Returns the moved
    * files with their partition tuples plus exact per-file row counts. */
  def splitAddsBySourceBucket(spark: SparkSession, tableDir: String,
      adds: Seq[AddFile], struct: StructType, primaryKeys: Seq[String],
      buckets: Int, destDir: String, partitionKeys: Seq[String],
      nameFor: (Int, Map[String, Any], Option[Int]) => String)
      : (Seq[(Path, Map[String, Any], Option[Int])], Map[String, Long]) = {
    import org.apache.spark.sql.functions.{col, hash, lit, pmod}
    val addsDf = spark.read.schema(struct)
      .parquet(adds.map(f => Paths.get(tableDir, f.path).toString): _*)
      .withColumn("__srcb",
        pmod(hash(primaryKeys.map(col): _*), lit(buckets)))
    val moved = IcebergInterchange.writeSplitDataFiles(addsDf, destDir,
      partitionKeys, struct, Some("__srcb"), nameFor)
    (moved, IcebergInterchange.countRows(spark, moved.map(_._1.toString)))
  }
}
