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
        // pk-less (append-only) tables never remove, so the bucket in the
        // split-file name is decorative — constant 0 keeps the name shape
        if (primaryKeys.isEmpty) lit(0)
        else pmod(hash(primaryKeys.map(col): _*), lit(buckets)))
    val moved = IcebergInterchange.writeSplitDataFiles(addsDf, destDir,
      partitionKeys, struct, Some("__srcb"), nameFor)
    (moved, IcebergInterchange.countRows(spark, moved.map(_._1.toString)))
  }

  /** Prove from the parquet FOOTERS alone that every add file is
    * SINGLE-PARTITION: each partition key column has zero nulls and one
    * value (min == max) on every row group, the same value across groups.
    * O(adds) driver-side metadata reads, no data scan. Returns each
    * file's (partition tuple, exact footer row count) — or None as soon
    * as any file cannot be proven, in which case rows must physically
    * move and the `partitionBy` job is the correct path. */
  def provenSinglePartition(spark: SparkSession, tableDir: String,
      adds: Seq[AddFile], struct: StructType, partitionKeys: Seq[String])
      : Option[Map[String, (Map[String, Any], Long)]] = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.spark.sql.types._
    import scala.jdk.CollectionConverters._
    val conf = spark.sessionState.newHadoopConf()
    val out = scala.collection.mutable.Map.empty[String, (Map[String, Any], Long)]
    adds.foreach { a =>
      val abs = Paths.get(tableDir, a.path).toString
      val r = ParquetFileReader.open(
        HadoopInputFile.fromPath(new org.apache.hadoop.fs.Path(abs), conf))
      try {
        val blocks = r.getFooter.getBlocks.asScala.toSeq
        if (blocks.isEmpty) return None // empty file: no tuple to assign
        val tuple = partitionKeys.map { c =>
          val perBlock = blocks.map { b =>
            val chunk = b.getColumns.asScala
              .find(_.getPath.toDotString == c).getOrElse(return None)
            val st = chunk.getStatistics
            if (st == null || st.isEmpty || st.getNumNulls != 0 ||
                !st.hasNonNullValue || st.genericGetMin != st.genericGetMax)
              return None
            struct(c).dataType match {
              case ByteType | ShortType | IntegerType =>
                Integer.valueOf(st.genericGetMin.toString)
              case LongType => java.lang.Long.valueOf(st.genericGetMin.toString)
              case BooleanType =>
                java.lang.Boolean.valueOf(st.genericGetMin.toString)
              case StringType => st.genericGetMin match {
                case b: org.apache.parquet.io.api.Binary => b.toStringUsingUTF8
                case other => other.toString
              }
              case _ => return None // unproven type: take the job path
            }
          }
          if (perBlock.distinct.size != 1) return None
          c -> (perBlock.head: Any)
        }.toMap
        out(a.path) = (tuple, r.getRecordCount)
      } finally r.close()
    }
    Some(out.toMap)
  }

  /** The metadata-only commit path: when [[provenSinglePartition]] holds
    * for every add, no row moves — each source bucket file HARD-COPIES to
    * its split-file name (the real source bucket in the name, partition
    * tuple from the footer stats, row count from the footer), O(adds)
    * file copies and zero Spark jobs. Copied files still STORE the
    * partition columns; both importers tolerate that (explicit-schema
    * read, then the per-file constant overrides with the same value).
    * Falls back to the one `partitionBy` job the moment any file's rows
    * must physically move. This is the steady-state shape of a
    * time-partitioned CDC mirror: a minute-cadence micro-batch lands
    * entirely inside one day/hour partition, so every commit takes the
    * copy path and per-commit cost drops from a Spark job to file I/O. */
  def splitOrCopyAdds(spark: SparkSession, tableDir: String,
      adds: Seq[AddFile], struct: StructType, primaryKeys: Seq[String],
      buckets: Int, destDir: String, partitionKeys: Seq[String],
      nameFor: (Int, Map[String, Any], Option[Int]) => String)
      : (Seq[(Path, Map[String, Any], Option[Int])], Map[String, Long]) =
    provenSinglePartition(spark, tableDir, adds, struct, partitionKeys) match {
      case Some(proven) =>
        val dataDir = Paths.get(destDir, "data")
        java.nio.file.Files.createDirectories(dataDir)
        var n = 0
        val moved = adds.sortBy(_.path).map { a =>
          val (part, _) = proven(a.path)
          val out = dataDir.resolve(nameFor(n, part, Some(a.bucket))); n += 1
          java.nio.file.Files.copy(Paths.get(tableDir, a.path), out,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          (out, part, Some(a.bucket): Option[Int])
        }
        val counts = adds.sortBy(_.path).zip(moved).map { case (a, (out, _, _)) =>
          out.toAbsolutePath.toString -> proven(a.path)._2
        }.toMap
        (moved, counts)
      case None =>
        splitAddsBySourceBucket(spark, tableDir, adds, struct, primaryKeys,
          buckets, destDir, partitionKeys, nameFor)
    }
}
