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
/** Driver-side parquet footer access shared by the mirrors and the
  * Iceberg importer. Local paths read through parquet's plain-NIO
  * `LocalInputFile` — the Hadoop input path costs ~4x per footer (filesystem
  * cache + checksum layers) and serializes badly under thread contention;
  * measured on 1536 small files: 10.5 s sequential-Hadoop vs ~0.3 s
  * pooled-local. Non-local schemes still go through Hadoop. */
private[sinks] object ParquetFooters {
  def open(path: String,
      conf: => org.apache.hadoop.conf.Configuration)
      : org.apache.parquet.hadoop.ParquetFileReader = {
    val localPath =
      if (path.startsWith("file:")) Some(path.stripPrefix("file:")
        .replaceFirst("^//(?=/)", ""))
      else if (!path.matches("^[a-zA-Z][a-zA-Z0-9+.-]*:.*")) Some(path)
      else None
    localPath match {
      case Some(p) => org.apache.parquet.hadoop.ParquetFileReader.open(
        new org.apache.parquet.io.LocalInputFile(java.nio.file.Paths.get(p)))
      case None => org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(path), conf))
    }
  }

  /** Run `f` over items on a bounded pool, preserving the item -> result
    * mapping. O(items) metadata work spreads across 16 threads. */
  def mapPooled[T](items: Seq[String])(f: String => T): Map[String, T] = {
    if (items.isEmpty) return Map.empty
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, math.min(16, items.size)))
    try {
      val futs = items.map(i => i -> pool.submit(
        new java.util.concurrent.Callable[T] { def call(): T = f(i) }))
      futs.map { case (i, fu) => i -> fu.get() }.toMap
    } finally pool.shutdown()
  }
}

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
    import org.apache.spark.sql.types._
    import scala.jdk.CollectionConverters._
    lazy val conf = spark.sessionState.newHadoopConf()
    // one bounded-pool pass over the footers; any unprovable file makes
    // the whole commit take the job path
    def probe(rel: String): Option[(Map[String, Any], Long)] = {
      val r = ParquetFooters.open(Paths.get(tableDir, rel).toString, conf)
      try {
        val blocks = r.getFooter.getBlocks.asScala.toSeq
        if (blocks.isEmpty) return None // empty file: no tuple to assign
        val tuple = partitionKeys.map { c =>
          val perBlock: Seq[Option[Any]] = blocks.map { b =>
            b.getColumns.asScala.find(_.getPath.toDotString == c).flatMap { chunk =>
              val st = chunk.getStatistics
              if (st == null || st.isEmpty || st.getNumNulls != 0 ||
                  !st.hasNonNullValue || st.genericGetMin != st.genericGetMax)
                None
              else struct(c).dataType match {
                case ByteType | ShortType | IntegerType =>
                  Some(Integer.valueOf(st.genericGetMin.toString))
                case LongType =>
                  Some(java.lang.Long.valueOf(st.genericGetMin.toString))
                case BooleanType =>
                  Some(java.lang.Boolean.valueOf(st.genericGetMin.toString))
                case StringType => Some(st.genericGetMin match {
                  case bin: org.apache.parquet.io.api.Binary => bin.toStringUsingUTF8
                  case other => other.toString
                })
                case _ => None // unproven type: take the job path
              }
            }
          }
          if (perBlock.exists(_.isEmpty) || perBlock.flatten.distinct.size != 1)
            return None
          c -> perBlock.head.get
        }.toMap
        Some((tuple, r.getRecordCount))
      } finally r.close()
    }
    val probed = ParquetFooters.mapPooled(adds.map(_.path).distinct)(probe)
    if (probed.values.exists(_.isEmpty)) None
    else Some(probed.map { case (k, v) => k -> v.get })
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
