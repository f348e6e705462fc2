package graft.sinks

import graft.core.TableSchema
import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Delta Lake `_delta_log` interchange — one of the two ecosystem wire
  * formats next to [[IcebergInterchange]] (the reference ships
  * Paimon/Iceberg pipeline connectors). The public Delta transaction-log
  * format is newline-delimited JSON actions over plain parquet, per the
  * delta-io PROTOCOL.md specification:
  *
  *  - [[readChangeFeed]] + changelog-table mirroring: a changelog-enabled
  *    lakehouse table forwards its row-level change files as Delta CDF
  *    `cdc` actions (the files already speak CDF's `_change_type`
  *    vocabulary), under `delta.enableChangeDataFeed` and writer
  *    version 4 — downstream CDF readers consume the pipeline's changes
  *    at commit granularity.
  *  - [[export]]: materialize a [[LakehouseTable]] snapshot as a
  *    Delta-readable directory — data files copied to the root, one
  *    `_delta_log/00000000000000000000.json` commit with `protocol`,
  *    `metaData` (the Spark StructType JSON as `schemaString`), one `add`
  *    per live file carrying `stats` (numRecords + min/maxValues from the
  *    zone maps), and one `txn` per recorded (appId, version) — so
  *    exactly-once bookkeeping survives interchange.
  *  - [[importDelta]]: replay a `_delta_log` directory (versioned JSON
  *    commits, `add`/`remove` with `dataChange` replay, `metaData` schema,
  *    `txn` map) into a DataFrame + metadata. Hive-layout PARTITIONED
  *    tables are supported: per-file `add.partitionValues` project back
  *    as constant columns (files do not store them — the Delta analog of
  *    Iceberg's Column Projection rule). Reader TABLE FEATURES up to
  *    protocol version 3 are implemented via [[DeltaReaderFeatures]]:
  *    column mapping (`name` and `id` modes — physical-name / field-id
  *    resolution with a positional cast back to logical names) and
  *    deletion vectors (Z85 + portable-RoaringBitmapArray descriptors,
  *    masked row indexes filtered map-side against `_metadata.row_index`).
  *    Unsupported features still fail LOUDLY rather than read wrong data:
  *    unknown `readerFeatures`, column-mapped PARTITIONED tables (the
  *    physical-name keying of `partitionValues`), checkpoints over
  *    reader-feature tables, and timestamp/binary partition-value
  *    serialization are explicit errors.
  *  - [[checkpoint]] / [[cleanupLog]] / `readLog(spark, dir)`: classic
  *    single-file parquet checkpoints per the protocol spec — the
  *    consolidated state at a version plus `_last_checkpoint`, after
  *    which commits at or below it may be deleted and readers seed from
  *    the checkpoint instead of replaying from zero (the metadata-scaling
  *    requirement of a mirror writing one commit per lakehouse commit).
  *    The pure-JVM `readLog(dir)` still refuses checkpointed logs.
  *
  * Determinism: timestamps are fixed at 0 and the table id derives from
  * the schema — a re-export is byte-identical, which is what lets the
  * round-trip gate hash-check the path. No external Delta reader exists in
  * this sandbox (offline coursier, documented in SCALE.md); the format
  * itself is pinned against the public protocol spec by
  * `DeltaInterchangeSpec`.
  */
object DeltaInterchange {

  private val mapper = new ObjectMapper()

  /** Export the table's LATEST snapshot. Refuses MERGE-ON-READ delete
    * files (Delta models deletes by file rewrite; run `compact()` first)
    * — silently dropping them would resurrect deleted rows. */
  def export(spark: SparkSession, table: LakehouseTable, destDir: String): Unit = {
    val snap = table.snapshot()
    require(snap.deleteFiles.isEmpty,
      "export requires a compacted table: Delta has no equality-delete files — " +
        "run compact() so deletes are materialized into rewritten data files")
    val meta = snap.meta.getOrElse(
      throw new IllegalStateException("table has no meta action (not created)"))
    val dest = Paths.get(destDir)
    val logDir = dest.resolve("_delta_log")
    Files.createDirectories(logDir)

    val actions = scala.collection.mutable.Buffer.empty[String]
    actions += protocolJson(meta.changelog)
    actions += metaActionJson(meta.schema, meta.changelog)

    snap.txns.toSeq.sortBy(_._1).foreach { case (appId, version) =>
      val n = mapper.createObjectNode()
      val t = n.putObject("txn")
      t.put("appId", appId); t.put("version", version)
      actions += mapper.writeValueAsString(n)
    }

    val partitionKeys = meta.schema.partitionKeys
    if (partitionKeys.nonEmpty) {
      // Hive-style partitioned export: the live rows split into one file
      // per partition tuple under data/, partition columns OUT of the
      // files — add.partitionValues is the source of truth the importer
      // projects back (the Delta analog of Iceberg Column Projection)
      validatePartitionCols(meta.schema.struct, partitionKeys)
      val live =
        if (snap.files.isEmpty)
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            meta.schema.struct)
        else spark.read.schema(meta.schema.struct)
          .parquet(snap.files.map(f => Paths.get(table.dir, f.path).toString): _*)
      val moved = IcebergInterchange.writeSplitDataFiles(live, destDir,
        partitionKeys, meta.schema.struct, None,
        (n, _, _) => f"part-$n%05d.parquet")
      val rows = IcebergInterchange.countRows(spark, moved.map(_._1.toString))
      moved.foreach { case (out, part, _) =>
        actions += splitAddActionJson(s"data/${out.getFileName}",
          Files.size(out), rows(out.toAbsolutePath.toString), part, partitionKeys)
      }
    } else {
    // merge-written files carry rows = -1 (unknown) in the native log;
    // Delta stats need the real count — one footer-only pass resolves them
    // (a parquet count() never touches row data)
    val unknownRows = snap.files.filter(_.rows < 0)
    val counted: Map[String, Long] =
      if (unknownRows.isEmpty) Map.empty
      else {
        import org.apache.spark.sql.functions.input_file_name
        spark.read
          .parquet(unknownRows.map(f => Paths.get(table.dir, f.path).toString): _*)
          .groupBy(input_file_name().as("f")).count()
          .collect()
          .map(r => (new java.net.URI(r.getString(0)).getPath, r.getLong(1)))
          .toMap
      }
    snap.files.sortBy(_.path).foreach { f =>
      val srcPath = Paths.get(table.dir, f.path)
      val rows =
        if (f.rows >= 0) f.rows
        else counted.getOrElse(srcPath.toAbsolutePath.toString,
          throw new IllegalStateException(s"no footer count for ${f.path}"))
      val flat = f.path.replace('/', '-')
      Files.copy(srcPath, dest.resolve(flat), StandardCopyOption.REPLACE_EXISTING)
      val n = mapper.createObjectNode()
      val a = n.putObject("add")
      a.put("path", flat)
      a.putObject("partitionValues")
      a.put("size", Files.size(srcPath))
      a.put("modificationTime", 0L)
      a.put("dataChange", true)
      a.put("stats", statsJson(meta.schema, f.copy(rows = rows)))
      actions += mapper.writeValueAsString(n)
    }
    }
    Files.write(logDir.resolve(f"${0L}%020d.json"),
      actions.mkString("", "\n", "\n").getBytes(UTF_8))
  }

  /** Partition-column types whose partition-value STRINGS round trip
    * unambiguously through `add.partitionValues` (what [[importDelta]]
    * casts back); everything else refuses loudly. */
  private def validatePartitionCols(struct: StructType,
      partitionKeys: Seq[String]): Unit =
    partitionKeys.foreach { c =>
      require(struct.fieldNames.contains(c),
        s"partition column '$c' is not in the schema")
      require(Seq(IntegerType, LongType, StringType, BooleanType)
        .contains(struct(c).dataType),
        s"partition column '$c': type ${struct(c).dataType} has no " +
          "partition-value serialization here — refusing")
    }

  /** `add` action for a SPLIT partitioned data file: partitionValues carry
    * the tuple (all strings, the spec's serialization; null stays null),
    * stats shrink to numRecords (zone maps were per SOURCE file — pruning
    * comes from partitionValues instead). */
  private def splitAddActionJson(path: String, size: Long, rows: Long,
      part: Map[String, Any], partitionKeys: Seq[String]): String = {
    val n = mapper.createObjectNode()
    val a = n.putObject("add")
    a.put("path", path)
    val pv = a.putObject("partitionValues")
    partitionKeys.foreach { c =>
      part.get(c).flatMap(Option(_)) match {
        case Some(v) => pv.put(c, v.toString)
        case None => pv.putNull(c)
      }
    }
    a.put("size", size)
    a.put("modificationTime", 0L)
    a.put("dataChange", true)
    val st = mapper.createObjectNode()
    st.put("numRecords", rows)
    a.put("stats", mapper.writeValueAsString(st))
    mapper.writeValueAsString(n)
  }

  /** Delta `stats` string: numRecords always; min/maxValues typed from the
    * zone maps where present (numbers re-parsed to JSON numbers — a string
    * "42" would break readers' data skipping on numeric columns). */
  private def statsJson(schema: TableSchema, f: LakehouseFormat.AddFile): String = {
    val n = mapper.createObjectNode()
    n.put("numRecords", f.rows)
    if (f.stats.nonEmpty) {
      val mins = n.putObject("minValues")
      val maxs = n.putObject("maxValues")
      f.stats.foreach { case (colName, cs) =>
        schema.struct.fields.find(_.name == colName).foreach { field =>
          putTyped(mins, colName, cs.min, field.dataType)
          putTyped(maxs, colName, cs.max, field.dataType)
        }
      }
    }
    mapper.writeValueAsString(n)
  }

  private def putTyped(node: ObjectNode, name: String, v: String, dt: DataType): Unit =
    dt match {
      case LongType | IntegerType | ShortType | ByteType => node.put(name, v.toLong)
      case DoubleType | FloatType => node.put(name, v.toDouble)
      case BooleanType => node.put(name, v.toBoolean)
      case _ => node.put(name, v)
    }

  /** The txn appId under which [[mirror]] records the last lakehouse
    * version it has mirrored — in the DELTA log itself, so mirror progress
    * survives restarts with no side-channel state file. */
  val MirrorAppId = "graft-delta-mirror"

  /** Incrementally mirror NEW lakehouse commits into the Delta log — the
    * continuous "Delta sink" shape: one Delta commit per lakehouse commit
    * (adds + removes of exactly that commit's file diff), so a downstream
    * Delta reader sees the same commit granularity (and can time travel
    * it), instead of a full re-export per refresh. Cost per call is
    * O(new commits + changed files), never O(table).
    *
    * Progress rides as a `txn` action (`MirrorAppId` → lakehouse version)
    * in each Delta commit; a re-run after crash or no-op call resumes from
    * the recorded version — idempotent by the same replay-skip rule the
    * lakehouse txns use. Returns the number of Delta commits written.
    */
  def mirror(spark: SparkSession, table: LakehouseTable, destDir: String): Int = {
    val head = table.latestVersion()
    require(head >= 0, "cannot mirror a table with no commits")
    val dest = Paths.get(destDir)
    val logDir = dest.resolve("_delta_log")
    Files.createDirectories(logDir)
    val jsonVers = listJsonVersions(logDir)
    val ckptVer = lastCheckpointVersion(logDir)
    // partitioned mirrors: the live SPLIT file names (relative action
    // paths) — removals map through the source bucket each name encodes
    val liveNames = scala.collection.mutable.Set.empty[String]
    val (lastMirrored, nextDeltaVersion) =
      if (jsonVers.isEmpty && ckptVer.isEmpty) (-1L, 0L)
      else {
        // checkpoint-aware: after checkpoint + cleanupLog the JSONs at or
        // below the checkpoint are gone, so the resume point is whichever
        // of (last JSON, checkpoint) is newest
        val s = readLog(spark, destDir)
        s.files.foreach(p => liveNames += dest.toAbsolutePath
          .relativize(Paths.get(p).toAbsolutePath).toString)
        (s.txns.getOrElse(MirrorAppId,
          throw new IllegalStateException(
            s"$destDir has a _delta_log but no $MirrorAppId txn — it is not a mirror")),
          math.max(jsonVers.lastOption.getOrElse(-1L), ckptVer.getOrElse(-1L)) + 1)
      }
    if (lastMirrored >= head) return 0

    var written = 0
    var deltaV = nextDeltaVersion
    var prev = if (lastMirrored < 0) None else Some(table.snapshot(Some(lastMirrored)))
    var prevSchema = prev.flatMap(_.meta).map(_.schema.struct)
    var mirrorPartitionKeys: Option[Seq[String]] = None
    ((lastMirrored + 1) to head).foreach { v =>
      val cur = table.snapshot(Some(v))
      val curMeta = cur.meta.getOrElse(
        throw new IllegalStateException("table has no meta action (not created)"))
      require(cur.deleteFiles.isEmpty,
        s"lakehouse version $v carries MERGE-ON-READ delete files: Delta has no " +
          "equality deletes — compact() before mirroring past this version")
      val partitionKeys = curMeta.schema.partitionKeys
      mirrorPartitionKeys match {
        case None => mirrorPartitionKeys = Some(partitionKeys)
        case Some(pk) => require(pk == partitionKeys,
          s"partition keys cannot evolve mid-mirror ($pk -> $partitionKeys) " +
            "— the Hive layout is fixed at table creation; refusing")
      }
      val partitioned = partitionKeys.nonEmpty
      if (partitioned) {
        validatePartitionCols(curMeta.schema.struct, partitionKeys)
        // pk-less tables (append-only fact streams — the classic time-
        // partitioned shape) mirror too: appends never remove, so the
        // pk-bucket removal mapping is not needed; single-partition
        // commits take the metadata-only copy path. A commit that DOES
        // remove on a pk-less partitioned mirror refuses below.
      }
      val prevFiles = prev.map(_.files.map(f => f.path -> f).toMap).getOrElse(Map.empty)
      val curFiles = cur.files.map(f => f.path -> f).toMap
      val adds = cur.files.filterNot(f => prevFiles.contains(f.path)).sortBy(_.path)
      val removes = prev.map(_.files.filterNot(f => curFiles.contains(f.path)))
        .getOrElse(Seq.empty).sortBy(_.path)
      val schemaChanged = !prevSchema.contains(curMeta.schema.struct)
      // the table's OWN txn actions forward too (export already does):
      // exactly-once bookkeeping must survive continuous interchange, so a
      // sink resuming from the Delta mirror skips replayed batches
      val prevTxns = prev.map(_.txns).getOrElse(Map.empty)
      val newTxns = cur.txns.toSeq
        .filter { case (a, ver) => !prevTxns.get(a).contains(ver) }.sortBy(_._1)
      // changelog tables forward their row-level change files as Delta CDF
      // `cdc` actions in the SAME commit — the change-data files already
      // carry Delta's `_change_type` vocabulary (insert / update_preimage /
      // update_postimage / delete), so downstream CDF readers consume the
      // pipeline's changes directly
      val changeFiles = if (curMeta.changelog) table.changeFilesOf(v) else Seq.empty
      if (adds.nonEmpty || removes.nonEmpty || schemaChanged || newTxns.nonEmpty ||
          changeFiles.nonEmpty) {
        val actions = scala.collection.mutable.Buffer.empty[String]
        if (deltaV == 0L)
          actions += protocolJson(curMeta.changelog)
        if (schemaChanged) actions += metaActionJson(curMeta.schema, curMeta.changelog)
        newTxns.foreach { case (appId, ver) =>
          val n = mapper.createObjectNode()
          val x = n.putObject("txn")
          x.put("appId", appId); x.put("version", ver)
          actions += mapper.writeValueAsString(n)
        }
        val t = mapper.createObjectNode()
        val tx = t.putObject("txn")
        tx.put("appId", MirrorAppId); tx.put("version", v)
        actions += mapper.writeValueAsString(t)
        if (!partitioned) {
          val rowCounts = resolveRowCounts(spark, table, adds)
          adds.foreach { f =>
            val srcPath = Paths.get(table.dir, f.path)
            val flat = f.path.replace('/', '-')
            Files.copy(srcPath, dest.resolve(flat), StandardCopyOption.REPLACE_EXISTING)
            actions += addActionJson(curMeta.schema, f, rowCounts(f.path), flat,
              Files.size(srcPath))
          }
          removes.foreach { f =>
            val n = mapper.createObjectNode()
            val r = n.putObject("remove")
            r.put("path", f.path.replace('/', '-'))
            r.put("deletionTimestamp", 0L)
            r.put("dataChange", true)
            actions += mapper.writeValueAsString(n)
          }
        } else {
          // removals FIRST state-wise: whole-bucket COW rewrites kill every
          // live split file whose name encodes a removed source bucket
          if (removes.nonEmpty) {
            require(curMeta.schema.primaryKeys.nonEmpty,
              s"version $v removes files from a PK-LESS partitioned Delta " +
                "mirror: removals map through the pk-hash bucket in split-" +
                "file names, which pk-less tables do not have — only " +
                "append-only commits mirror for them (compaction/overwrite/" +
                "delete are unsupported); refusing")
            val rb = PartitionedMirror.wholeBucketRemovalSet(v, removes, prev)
            val dead = liveNames.filter(n => PartitionedMirror.srcBucketOf(
              Paths.get(n).getFileName.toString).exists(rb.contains)).toSeq.sorted
            dead.foreach { n =>
              val node = mapper.createObjectNode()
              val r = node.putObject("remove")
              r.put("path", n)
              r.put("deletionTimestamp", 0L)
              r.put("dataChange", true)
              actions += mapper.writeValueAsString(node)
              liveNames -= n
            }
          }
          if (adds.nonEmpty) {
            // metadata-only when the footers prove every add single-
            // partition (hard-copy, no Spark job); else ONE partitionBy
            // job splits the commit's adds by (partition tuple, source
            // lakehouse bucket); partition columns come back on import
            // from add.partitionValues either way
            val (moved, rows) = PartitionedMirror.splitOrCopyAdds(
              spark, table.dir, adds, curMeta.schema.struct,
              curMeta.schema.primaryKeys, curMeta.buckets, destDir, partitionKeys,
              (n, _, srcb) => f"part-v$v-b${srcb.get}-$n%05d.parquet")
            moved.foreach { case (out, part, _) =>
              val rel = s"data/${out.getFileName}"
              actions += splitAddActionJson(rel, Files.size(out),
                rows(out.toAbsolutePath.toString), part, partitionKeys)
              liveNames += rel
            }
          }
        }
        if (!partitioned) {
          changeFiles.sorted.foreach { p =>
            val srcPath = Paths.get(table.dir, p)
            val flat = "_change_data/" + p.replace('/', '-')
            Files.createDirectories(dest.resolve("_change_data"))
            Files.copy(srcPath, dest.resolve(flat), StandardCopyOption.REPLACE_EXISTING)
            val n = mapper.createObjectNode()
            val c = n.putObject("cdc")
            c.put("path", flat)
            c.putObject("partitionValues")
            c.put("size", Files.size(srcPath))
            c.put("dataChange", false)
            actions += mapper.writeValueAsString(n)
          }
        } else if (changeFiles.nonEmpty) {
          // PARTITIONED changelog: one partitionBy job splits the commit's
          // change rows per partition tuple — cdc files never store the
          // partition columns; the cdc action's partitionValues restore
          // them in readChangeFeed (the same projection rule as adds).
          // `_change_type` stays a DATA column of the cdc files.
          val ctSchema = StructType(curMeta.schema.struct.fields :+
            StructField("_change_type", StringType, nullable = false))
          val cdcDf = spark.read.schema(ctSchema)
            .parquet(changeFiles.sorted.map(p =>
              Paths.get(table.dir, p).toString): _*)
          val moved = IcebergInterchange.writeSplitDataFiles(cdcDf, destDir,
            partitionKeys, ctSchema, None,
            (n, _, _) => f"cdc-v$v-$n%05d.parquet", subDir = "_change_data")
          moved.foreach { case (out, part, _) =>
            val n = mapper.createObjectNode()
            val c = n.putObject("cdc")
            c.put("path", s"_change_data/${out.getFileName}")
            val pv = c.putObject("partitionValues")
            partitionKeys.foreach { col =>
              part.get(col).flatMap(Option(_)) match {
                case Some(value) => pv.put(col, value.toString)
                case None => pv.putNull(col)
              }
            }
            c.put("size", Files.size(out))
            c.put("dataChange", false)
            actions += mapper.writeValueAsString(n)
          }
        }
        Files.write(logDir.resolve(f"$deltaV%020d.json"),
          actions.mkString("", "\n", "\n").getBytes(UTF_8))
        deltaV += 1
        written += 1
      }
      prev = Some(cur)
      prevSchema = Some(curMeta.schema.struct)
    }
    // nothing changed across all new versions (e.g. txn-only commits):
    // still record progress so the next call skips them — but only if a
    // log exists to append to (a first-ever no-op mirror writes version 0
    // with protocol + metaData + progress, making the dest a valid table)
    if (written == 0) {
      val actions = scala.collection.mutable.Buffer.empty[String]
      if (deltaV == 0L) {
        val changelog = table.snapshot().meta.exists(_.changelog)
        actions += protocolJson(changelog)
        actions += metaActionJson(table.snapshot().schema, changelog)
      }
      val t = mapper.createObjectNode()
      val tx = t.putObject("txn")
      tx.put("appId", MirrorAppId); tx.put("version", head)
      actions += mapper.writeValueAsString(t)
      Files.write(logDir.resolve(f"$deltaV%020d.json"),
        actions.mkString("", "\n", "\n").getBytes(UTF_8))
      written += 1
    }
    written
  }

  private def protocolJson(cdf: Boolean): String =
    if (cdf)
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":4}}"""
    else """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}"""

  private def metaActionJson(schema: TableSchema, cdf: Boolean = false): String = {
    val metaNode = mapper.createObjectNode()
    val m = metaNode.putObject("metaData")
    m.put("id", java.util.UUID.nameUUIDFromBytes(
      schema.struct.json.getBytes(UTF_8)).toString)
    val fmt = m.putObject("format")
    fmt.put("provider", "parquet"); fmt.putObject("options")
    m.put("schemaString", schema.struct.json)
    val pc = m.putArray("partitionColumns")
    schema.partitionKeys.foreach(pc.add)
    val conf = m.putObject("configuration")
    if (cdf) conf.put("delta.enableChangeDataFeed", "true")
    m.put("createdTime", 0L)
    mapper.writeValueAsString(metaNode)
  }

  private def addActionJson(schema: TableSchema, f: LakehouseFormat.AddFile,
      rows: Long, flatPath: String, size: Long): String = {
    val n = mapper.createObjectNode()
    val a = n.putObject("add")
    a.put("path", flatPath)
    a.putObject("partitionValues")
    a.put("size", size)
    a.put("modificationTime", 0L)
    a.put("dataChange", true)
    a.put("stats", statsJson(schema, f.copy(rows = rows)))
    mapper.writeValueAsString(n)
  }

  /** rows for each add, resolving the merge path's `-1` sentinels with one
    * footer-only parquet count pass. */
  private def resolveRowCounts(spark: SparkSession, table: LakehouseTable,
      files: Seq[LakehouseFormat.AddFile]): Map[String, Long] = {
    val unknown = files.filter(_.rows < 0)
    val counted: Map[String, Long] =
      if (unknown.isEmpty) Map.empty
      else {
        import org.apache.spark.sql.functions.input_file_name
        spark.read
          .parquet(unknown.map(f => Paths.get(table.dir, f.path).toString): _*)
          .groupBy(input_file_name().as("f")).count()
          .collect()
          .map(r => (new java.net.URI(r.getString(0)).getPath, r.getLong(1)))
          .toMap
      }
    files.map { f =>
      f.path -> (if (f.rows >= 0) f.rows
                 else counted.getOrElse(Paths.get(table.dir, f.path).toAbsolutePath.toString,
                   throw new IllegalStateException(s"no footer count for ${f.path}")))
    }.toMap
  }

  final case class DeltaSnapshot(
      schema: StructType,
      files: Seq[String], // absolute paths of live data files
      txns: Map[String, Long],
      numRecords: Long,
      // Hive-layout partitioning: files do NOT store these columns; the
      // values ride in add.partitionValues and project back per file
      partitionColumns: Seq[String] = Nil,
      filePartitions: Map[String, Map[String, String]] = Map.empty,
      // reader features (PROTOCOL.md table features): files store PHYSICAL
      // column names when mapping is on; a deletion vector masks row
      // indexes of its file
      columnMappingMode: String = "none",
      fileDvs: Map[String, DeltaReaderFeatures.DvDescriptor] = Map.empty)

  // ----------------------------------------------------------- checkpoints

  /** Columns of a classic single-file Delta checkpoint (PROTOCOL.md:
    * one row per action, nullable struct per action type). */
  private val checkpointSchema = StructType(Seq(
    StructField("txn", StructType(Seq(
      StructField("appId", StringType), StructField("version", LongType)))),
    StructField("add", StructType(Seq(
      StructField("path", StringType),
      StructField("partitionValues", MapType(StringType, StringType)),
      StructField("size", LongType),
      StructField("modificationTime", LongType),
      StructField("dataChange", BooleanType),
      StructField("stats", StringType)))),
    StructField("remove", StructType(Seq(
      StructField("path", StringType),
      StructField("deletionTimestamp", LongType),
      StructField("dataChange", BooleanType)))),
    StructField("metaData", StructType(Seq(
      StructField("id", StringType),
      StructField("format", StructType(Seq(
        StructField("provider", StringType),
        StructField("options", MapType(StringType, StringType))))),
      StructField("schemaString", StringType),
      StructField("partitionColumns", ArrayType(StringType)),
      StructField("configuration", MapType(StringType, StringType)),
      StructField("createdTime", LongType)))),
    StructField("protocol", StructType(Seq(
      StructField("minReaderVersion", IntegerType),
      StructField("minWriterVersion", IntegerType))))))

  /** Write a classic checkpoint at the log's latest version — the
    * consolidated replay state (protocol, latest metaData, txns, live
    * add actions with their stats) as ONE parquet file named
    * `<v>.checkpoint.parquet`, plus the `_last_checkpoint` pointer.
    * Replay-from-zero cost grows with commit count; a mirror running one
    * commit per lakehouse commit needs this to keep reader startup
    * O(live files), not O(history). Returns the checkpointed version. */
  def checkpoint(spark: SparkSession, destDir: String): Long = {
    import org.apache.spark.sql.Row
    val logDir = Paths.get(destDir, "_delta_log")
    val prevCkpt = lastCheckpointVersion(logDir)
    val versions = listJsonVersions(logDir).filter(v => prevCkpt.forall(v > _))
    require(versions.nonEmpty,
      s"no commits newer than the last checkpoint under $destDir")
    prevCkpt.foreach(c => require(versions.head == c + 1,
      s"commit gap after checkpoint $c (next JSON is ${versions.head})"))
    val v = versions.last
    // full-fidelity state: seed from the previous checkpoint when one
    // exists (after cleanupLog the older JSONs are gone), then replay the
    // newer commits, keeping raw add rows so stats survive
    var protocolRow: Row = null
    var metaRow: Row = null
    val adds = scala.collection.mutable.LinkedHashMap.empty[String, Row]
    val txns = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    prevCkpt.foreach { c =>
      spark.read.schema(checkpointSchema)
        .parquet(logDir.resolve(f"$c%020d.checkpoint.parquet").toString)
        .collect().foreach { r =>
          if (!r.isNullAt(4)) protocolRow = r.getStruct(4)
          if (!r.isNullAt(3)) metaRow = r.getStruct(3)
          if (!r.isNullAt(1)) adds(r.getStruct(1).getString(0)) = r.getStruct(1)
          if (!r.isNullAt(0)) txns(r.getStruct(0).getString(0)) = r.getStruct(0).getLong(1)
        }
    }
    replayRawActions(logDir, versions) { node =>
      if (node.has("protocol")) {
        val p = node.get("protocol")
        // the classic checkpoint row schema drops deletionVector and
        // readerFeatures — checkpointing a reader-feature table would
        // silently resurrect DV-masked rows on the next read
        require(p.get("minReaderVersion").asInt() <= 1,
          s"minReaderVersion ${p.get("minReaderVersion").asInt()}: " +
            "checkpointing reader-feature tables (column mapping / deletion " +
            "vectors) is not supported — the checkpoint would drop their " +
            "add-action fields; refusing")
        protocolRow = Row(p.get("minReaderVersion").asInt(),
          p.get("minWriterVersion").asInt())
      } else if (node.has("add") && node.get("add").has("deletionVector")) {
        throw new IllegalArgumentException(
          "add action carries a deletionVector — checkpointing deletion-" +
            "vector tables is not supported (the classic checkpoint row " +
            "schema here would drop the descriptor); refusing")
      } else if (node.has("metaData")) {
        val m = node.get("metaData")
        // configuration survives checkpointing (delta.enableChangeDataFeed
        // must remain visible once the JSON commits are cleaned up)
        val conf = Option(m.get("configuration"))
          .map(_.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap)
          .getOrElse(Map.empty[String, String])
        // partitionColumns survive checkpointing: a Hive-layout partitioned
        // table whose JSONs were cleaned up must still project per-file
        // partitionValues — dropping them here would silently read the
        // table as unpartitioned (partition columns all null)
        val partCols = Option(m.get("partitionColumns"))
          .map(_.elements().asScala.map(_.asText()).toSeq)
          .getOrElse(Seq.empty[String])
        metaRow = Row(m.get("id").asText(),
          Row(m.get("format").get("provider").asText(), Map.empty[String, String]),
          m.get("schemaString").asText(),
          partCols, conf,
          m.get("createdTime").asLong())
      } else if (node.has("add")) {
        val a = node.get("add")
        // null partition values must survive as NULLS: NullNode.asText()
        // is the string "null", which importDelta would project as
        // lit("null") — a silently wrong value for string partitions
        val partVals = Option(a.get("partitionValues"))
          .map(_.properties().asScala.map(e => e.getKey ->
            (if (e.getValue.isNull) null else e.getValue.asText())).toMap)
          .getOrElse(Map.empty[String, String])
        adds(a.get("path").asText()) = Row(a.get("path").asText(),
          partVals, a.get("size").asLong(),
          a.get("modificationTime").asLong(), a.get("dataChange").asBoolean(),
          Option(a.get("stats")).map(_.asText()).orNull)
      } else if (node.has("remove")) {
        adds.remove(node.get("remove").get("path").asText())
      } else if (node.has("txn")) {
        val t = node.get("txn")
        txns(t.get("appId").asText()) = t.get("version").asLong()
      }
    }
    require(protocolRow != null && metaRow != null, "log has no protocol/metaData")
    val rows: Seq[Row] =
      Seq(Row(null, null, null, null, protocolRow),
        Row(null, null, null, metaRow, null)) ++
        txns.toSeq.sortBy(_._1).map { case (a, ver) =>
          Row(Row(a, ver), null, null, null, null) } ++
        adds.values.toSeq.map(a => Row(null, a, null, null, null))
    val tmp = Files.createTempDirectory("graft_delta_ckpt").toString
    spark.createDataFrame(rows.asJava, checkpointSchema)
      .coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = Files.list(Paths.get(tmp)).iterator.asScala
      .find(_.getFileName.toString.endsWith(".parquet"))
      .getOrElse(throw new IllegalStateException("checkpoint write produced no parquet"))
    Files.move(part, logDir.resolve(f"$v%020d.checkpoint.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    Files.write(logDir.resolve("_last_checkpoint"),
      s"""{"version":$v,"size":${rows.size}}""".getBytes(UTF_8))
    v
  }

  /** Delete commit JSONs at or below the checkpointed version — the log
    * cleanup the checkpoint makes safe (readers seed from the checkpoint
    * and replay only newer commits). Returns the number removed. */
  def cleanupLog(destDir: String): Int = {
    val logDir = Paths.get(destDir, "_delta_log")
    val ckpt = lastCheckpointVersion(logDir).getOrElse(
      throw new IllegalStateException(
        s"no _last_checkpoint under $destDir — cleanup without a checkpoint " +
          "would destroy the only copy of the state"))
    val old = listJsonVersions(logDir).filter(_ <= ckpt)
    old.foreach(v => Files.delete(logDir.resolve(f"$v%020d.json")))
    old.size
  }

  /** Checkpoint + clean up when `every` or more commit JSONs have
    * accumulated past the last checkpoint — the inline maintenance loop a
    * standing mirror needs. Returns true when a checkpoint was written. */
  def maintainCheckpoint(spark: SparkSession, destDir: String, every: Int): Boolean = {
    require(every >= 1, "checkpoint interval must be >= 1")
    val logDir = Paths.get(destDir, "_delta_log")
    val ckpt = lastCheckpointVersion(logDir).getOrElse(-1L)
    if (listJsonVersions(logDir).count(_ > ckpt) < every) false
    else {
      checkpoint(spark, destDir)
      cleanupLog(destDir)
      true
    }
  }

  private def listJsonVersions(logDir: Path): Seq[Long] =
    if (!Files.isDirectory(logDir)) Seq.empty
    else Files.list(logDir).iterator.asScala
      .map(_.getFileName.toString)
      .collect { case s if s.matches("\\d{20}\\.json") =>
        s.stripSuffix(".json").toLong }
      .toSeq.sorted

  private def lastCheckpointVersion(logDir: Path): Option[Long] = {
    val p = logDir.resolve("_last_checkpoint")
    if (!Files.exists(p)) None
    else Some(mapper.readTree(Files.readAllBytes(p)).get("version").asLong())
  }

  private def replayRawActions(logDir: Path, versions: Seq[Long])(
      f: com.fasterxml.jackson.databind.JsonNode => Unit): Unit =
    versions.foreach { v =>
      Files.readAllLines(logDir.resolve(f"$v%020d.json")).asScala
        .filter(_.trim.nonEmpty).foreach(line => f(mapper.readTree(line)))
    }

  /** Checkpoint-aware replay: seed from the last checkpoint when one
    * exists, then replay only the newer JSON commits. Falls back to the
    * plain from-zero [[readLog]] otherwise. */
  def readLog(spark: SparkSession, srcDir: String): DeltaSnapshot =
    readLog(spark, srcDir, None)

  /** Checkpoint-aware replay with optional time travel: `asOfVersion`
    * must be AT or AFTER the checkpointed version — the commits below it
    * were cleaned up, so older states are gone (Delta's own
    * `versionAsOf` retention behavior). */
  def readLog(spark: SparkSession, srcDir: String,
      asOfVersion: Option[Long]): DeltaSnapshot = {
    val logDir = Paths.get(srcDir, "_delta_log")
    require(Files.isDirectory(logDir), s"no _delta_log under $srcDir")
    lastCheckpointVersion(logDir) match {
      case None => readLog(srcDir, asOfVersion)
      case Some(ckptV) =>
        val ckptFile = logDir.resolve(f"$ckptV%020d.checkpoint.parquet")
        require(Files.exists(ckptFile),
          s"_last_checkpoint points at version $ckptV but ${ckptFile.getFileName} " +
            "is missing — refusing rather than replaying a truncated log")
        var schema: Option[StructType] = None
        var partitionCols: Seq[String] = Nil
        val fileParts = scala.collection.mutable.Map.empty[String, Map[String, String]]
        val live = scala.collection.mutable.LinkedHashMap.empty[String, Long]
        val txns = scala.collection.mutable.Map.empty[String, Long]
        spark.read.schema(checkpointSchema).parquet(ckptFile.toString)
          .collect().foreach { r =>
            if (!r.isNullAt(4)) {
              val reader = r.getStruct(4).getInt(0)
              // the classic checkpoint schema here has no deletionVector /
              // readerFeatures columns, so a checkpoint-SEEDED read of a
              // reader-feature table could silently resurrect DV-masked
              // rows — those tables must retain their full JSON log
              require(reader <= 1,
                s"minReaderVersion $reader: checkpoint-seeded reads support " +
                  "base tables only; reader-feature tables (column mapping / " +
                  "deletion vectors) must keep their JSON commits")
            }
            if (!r.isNullAt(3)) {
              val md = r.getStruct(3)
              schema = Some(DataType.fromJson(md.getString(2))
                .asInstanceOf[StructType])
              partitionCols =
                if (md.isNullAt(3)) Nil else md.getSeq[String](3)
            }
            if (!r.isNullAt(1)) {
              val a = r.getStruct(1)
              val rows = Option(a.getString(5))
                .map(s => mapper.readTree(s).get("numRecords").asLong()).getOrElse(0L)
              live(a.getString(0)) = rows
              fileParts(a.getString(0)) =
                if (a.isNullAt(1)) Map.empty
                else a.getMap[String, String](1).toMap
            }
            if (!r.isNullAt(0)) {
              val t = r.getStruct(0)
              txns(t.getString(0)) = t.getLong(1)
            }
          }
        asOfVersion.foreach { v =>
          require(v >= ckptV,
            s"versionAsOf $v is below the checkpoint at $ckptV — those " +
              "commits were cleaned up, the state is gone")
          require(v <= listJsonVersions(logDir).maxOption.getOrElse(ckptV),
            s"versionAsOf $v is beyond the latest commit — nothing was " +
              "committed there")
        }
        val newer = listJsonVersions(logDir)
          .filter(v => v > ckptV && asOfVersion.forall(v <= _))
        newer.headOption.foreach(first => require(first == ckptV + 1,
          s"commit gap after checkpoint $ckptV (next JSON is $first) — " +
            "refusing rather than skipping commits"))
        newer.zipWithIndex.foreach { case (v, i) =>
          require(v == ckptV + 1 + i, s"commit gap at version $v") }
        replayRawActions(logDir, newer) { node =>
          if (node.has("metaData"))
            schema = Some(DataType.fromJson(
              node.get("metaData").get("schemaString").asText())
              .asInstanceOf[StructType])
          else if (node.has("add")) {
            val a = node.get("add")
            val rows = Option(a.get("stats"))
              .map(s => mapper.readTree(s.asText()).get("numRecords").asLong())
              .getOrElse(0L)
            live(a.get("path").asText()) = rows
            fileParts(a.get("path").asText()) = Option(a.get("partitionValues"))
              .map(_.properties().asScala.map(e =>
                e.getKey -> (if (e.getValue.isNull) null else e.getValue.asText()))
                .toMap).getOrElse(Map.empty)
          } else if (node.has("remove"))
            live.remove(node.get("remove").get("path").asText())
          else if (node.has("txn")) {
            val t = node.get("txn")
            txns(t.get("appId").asText()) = t.get("version").asLong()
          }
        }
        DeltaSnapshot(
          schema.getOrElse(throw new IllegalStateException("no metaData in log")),
          live.keys.toSeq.map(p => Paths.get(srcDir, p).toString),
          txns.toMap, live.values.sum, partitionCols,
          live.keys.toSeq.map(p =>
            Paths.get(srcDir, p).toString -> fileParts.getOrElse(p, Map.empty)).toMap)
    }
  }

  /** Replay a `_delta_log` into the live state at the latest version. */
  def readLog(srcDir: String): DeltaSnapshot = readLog(srcDir, None)

  /** Replay a `_delta_log`, optionally stopping AT `asOfVersion` — Delta
    * time travel (`versionAsOf`): the state is exactly what a reader at
    * that commit saw. A version beyond the head refuses loudly. */
  def readLog(srcDir: String, asOfVersion: Option[Long]): DeltaSnapshot = {
    val logDir = Paths.get(srcDir, "_delta_log")
    require(Files.isDirectory(logDir), s"no _delta_log under $srcDir")
    require(!Files.exists(logDir.resolve("_last_checkpoint")),
      "checkpointed Delta logs are not supported (parquet checkpoint reader " +
        "not implemented) — refusing rather than replaying a partial log")
    val allVersions = Files.list(logDir).iterator.asScala
      .map(_.getFileName.toString)
      .filter(_.matches("\\d{20}\\.json"))
      .toSeq.sorted
    require(allVersions.nonEmpty, s"empty _delta_log under $srcDir")
    require(allVersions.head == f"${0L}%020d.json",
      s"log does not start at version 0 (earliest: ${allVersions.head}) — a " +
        "truncated log cannot be replayed without a checkpoint")
    asOfVersion.foreach { v =>
      require(v >= 0 && allVersions.contains(f"$v%020d.json"),
        s"versionAsOf $v is not in the log (head: " +
          s"${allVersions.last.stripSuffix(".json").toLong}) — nothing was " +
          "committed there")
    }
    val versions = asOfVersion match {
      case None => allVersions
      case Some(v) => allVersions.filter(_ <= f"$v%020d.json")
    }

    var schema: Option[StructType] = None
    var partitionCols: Seq[String] = Nil
    var mappingMode = "none"
    val fileParts = scala.collection.mutable.Map.empty[String, Map[String, String]]
    val fileDvs =
      scala.collection.mutable.Map.empty[String, DeltaReaderFeatures.DvDescriptor]
    val live = scala.collection.mutable.LinkedHashSet.empty[String]
    val txns = scala.collection.mutable.Map.empty[String, Long]
    var numRecords = 0L
    val fileRecords = scala.collection.mutable.Map.empty[String, Long]
    versions.foreach { v =>
      Files.readAllLines(logDir.resolve(v)).asScala.filter(_.trim.nonEmpty).foreach { line =>
        val node = mapper.readTree(line)
        if (node.has("protocol")) {
          checkReaderSupport(node.get("protocol"))
        } else if (node.has("metaData")) {
          val md = node.get("metaData")
          val parts = md.get("partitionColumns")
          partitionCols =
            if (parts == null) Nil
            else parts.elements().asScala.map(_.asText()).toSeq
          mappingMode = Option(md.get("configuration"))
            .flatMap(c => Option(c.get("delta.columnMapping.mode")))
            .map(_.asText()).getOrElse("none")
          require(Seq("none", "name", "id").contains(mappingMode),
            s"delta.columnMapping.mode '$mappingMode' is not in the " +
              "protocol (none / name / id) — refusing")
          schema = Some(DataType.fromJson(md.get("schemaString").asText())
            .asInstanceOf[StructType])
        } else if (node.has("add")) {
          val a = node.get("add")
          val p = a.get("path").asText()
          live += p
          // a DV update re-adds the same path with a new descriptor — the
          // latest add wins, and an add WITHOUT one clears it
          Option(a.get("deletionVector")) match {
            case Some(dv) =>
              fileDvs(p) = DeltaReaderFeatures.parseDescriptor(dv, srcDir)
            case None => fileDvs.remove(p)
          }
          fileParts(p) = Option(a.get("partitionValues"))
            .map(_.properties().asScala.map(e =>
              e.getKey -> (if (e.getValue.isNull) null else e.getValue.asText()))
              .toMap).getOrElse(Map.empty)
          val rows = Option(a.get("stats"))
            .map(s => mapper.readTree(s.asText()).get("numRecords").asLong()).getOrElse(0L)
          fileRecords(p) = rows
        } else if (node.has("remove")) {
          val p = node.get("remove").get("path").asText()
          live -= p
          fileDvs.remove(p)
        } else if (node.has("txn")) {
          val t = node.get("txn")
          txns(t.get("appId").asText()) = t.get("version").asLong()
        } // commitInfo / cdc / domainMetadata: informational, skipped
      }
    }
    // numRecords is the LOGICAL row count: physical stats minus the rows
    // each live deletion vector masks
    numRecords = live.iterator.map(p => fileRecords.getOrElse(p, 0L)).sum -
      live.iterator.flatMap(fileDvs.get).map(_.cardinality).sum
    DeltaSnapshot(
      schema.getOrElse(throw new IllegalStateException("log has no metaData action")),
      live.toSeq.map(p => Paths.get(srcDir, p).toString),
      txns.toMap, numRecords, partitionCols,
      live.toSeq.map(p =>
        Paths.get(srcDir, p).toString -> fileParts.getOrElse(p, Map.empty)).toMap,
      mappingMode,
      live.toSeq.flatMap(p => fileDvs.get(p).map(d =>
        Paths.get(srcDir, p).toString -> d)).toMap)
  }

  /** Reader-version gate: base tables (1), column mapping (2), and
    * version-3 tables whose `readerFeatures` this importer implements —
    * `columnMapping`, `deletionVectors`, plus the read-neutral
    * `timestampNtz` (a type the schema already expresses) and
    * `vacuumProtocolCheck` (constrains VACUUM, not reads). Anything else
    * refuses loudly rather than reading wrong data. */
  private def checkReaderSupport(p: com.fasterxml.jackson.databind.JsonNode): Unit = {
    val reader = p.get("minReaderVersion").asInt()
    require(reader <= 3,
      s"minReaderVersion $reader is newer than the table-features protocol " +
        "(3) this importer implements — refusing")
    if (reader == 3) {
      val supported = Set("columnMapping", "deletionVectors", "timestampNtz",
        "vacuumProtocolCheck")
      val features = Option(p.get("readerFeatures"))
        .map(_.elements().asScala.map(_.asText()).toSeq).getOrElse(Nil)
      val unknown = features.filterNot(supported)
      require(unknown.isEmpty,
        s"reader features ${unknown.mkString(", ")} are not implemented " +
          "by this importer — refusing rather than reading wrong data")
    }
  }

  /** Delta Change Data Feed read: the row-level changes of commits in
    * `(fromVersion, toVersion]` — the `cdc` actions' files, whose rows
    * carry `_change_type` (insert / update_preimage / update_postimage /
    * delete), plus a `_commit_version` column. Requires the table
    * property `delta.enableChangeDataFeed` (refuses otherwise — a window
    * read on a non-CDF table would silently return nothing). Commits
    * removed by [[cleanupLog]] are gone with their cdc actions, so a
    * window reaching below the earliest retained commit refuses loudly —
    * expire only past consumed cursors, the lakehouse changelog's own
    * retention rule. */
  def readChangeFeed(spark: SparkSession, srcDir: String,
      fromVersion: Long, toVersion: Long): DataFrame = {
    val logDir = Paths.get(srcDir, "_delta_log")
    val snap = readLog(spark, srcDir)
    // PARTITIONED tables: cdc files do not store partition columns — the
    // per-action partitionValues project back exactly like data files
    // (bounded to the same unambiguous serializations as importDelta)
    snap.partitionColumns.foreach { c =>
      val dt = snap.schema(c).dataType
      require(!Seq(TimestampType, TimestampNTZType, BinaryType).contains(dt),
        s"partition column '$c': $dt partition-value serialization is " +
          "not supported by this reader — refusing")
    }
    require(snap.columnMappingMode == "none",
      "change-feed reads of COLUMN-MAPPED Delta tables are not supported: " +
        "cdc files store physical column names and this reader resolves " +
        "cdc rows by logical name — refusing rather than feeding silent " +
        "nulls")
    // CDF flag: newest metaData wins — checkpoint first (older), then the
    // JSON commits (configuration survives checkpointing)
    var cdfOn = false
    lastCheckpointVersion(logDir).foreach { c =>
      spark.read.schema(checkpointSchema)
        .parquet(logDir.resolve(f"$c%020d.checkpoint.parquet").toString)
        .collect().foreach { r =>
          if (!r.isNullAt(3))
            cdfOn = r.getStruct(3).getMap[String, String](4)
              .get("delta.enableChangeDataFeed").contains("true")
        }
    }
    replayRawActions(logDir, listJsonVersions(logDir)) { node =>
      if (node.has("metaData"))
        cdfOn = Option(node.get("metaData").get("configuration"))
          .exists(c => Option(c.get("delta.enableChangeDataFeed"))
            .exists(_.asText() == "true"))
    }
    require(cdfOn, "delta.enableChangeDataFeed is not set on this table — " +
      "a window read would silently return nothing")
    val retained = listJsonVersions(logDir)
    val latest = retained.maxOption.getOrElse(-1L)
    require(toVersion <= latest,
      s"toVersion $toVersion is beyond the latest commit $latest — " +
        "nothing has been written there yet")
    val versions = retained.filter(v => v > fromVersion && v <= toVersion)
    require(versions.size == (toVersion - fromVersion),
      s"change-feed window ($fromVersion, $toVersion] reaches below the " +
        "earliest retained commit (cleaned up past a checkpoint) — those " +
        "changes are undeliverable")
    val perCommit = versions.flatMap { v =>
      val paths = scala.collection.mutable.ArrayBuffer
        .empty[(String, Map[String, String])]
      replayRawActions(logDir, Seq(v)) { node =>
        if (node.has("cdc")) {
          val c = node.get("cdc")
          paths += ((Paths.get(srcDir, c.get("path").asText()).toString,
            Option(c.get("partitionValues"))
              .map(_.properties().asScala.map(e =>
                e.getKey -> (if (e.getValue.isNull) null else e.getValue.asText()))
                .toMap).getOrElse(Map.empty)))
        }
      }
      if (paths.isEmpty) None
      else {
        import org.apache.spark.sql.functions.{col, lit}
        val withCt = StructType(snap.schema.fields :+
          StructField("_change_type", StringType, nullable = false))
        val df =
          if (snap.partitionColumns.isEmpty)
            spark.read.schema(withCt).parquet(paths.map(_._1).toSeq: _*)
          else
            // per-partition file groups: the cdc files do not store the
            // partition columns; the action's partitionValues project
            // back as constants, exactly the importDelta rule
            paths.groupBy(_._2).toSeq
              .sortBy(_._1.toSeq.sortBy(_._1).mkString(","))
              .map { case (vals, fs) =>
                var d = spark.read.schema(withCt).parquet(fs.map(_._1).toSeq: _*)
                snap.partitionColumns.foreach { c =>
                  d = d.withColumn(c,
                    lit(vals.getOrElse(c, null)).cast(snap.schema(c).dataType))
                }
                d.select(withCt.fieldNames.map(col).toSeq: _*)
              }.reduce(_ unionAll _)
        Some(df.withColumn("_commit_version", lit(v)))
      }
    }
    if (perCommit.isEmpty) {
      val schema = StructType(snap.schema.fields ++ Seq(
        StructField("_change_type", StringType, nullable = false),
        StructField("_commit_version", LongType, nullable = false)))
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    } else perCommit.reduce(_ unionAll _)
  }

  /** Read the live table state as a DataFrame under the log's schema
    * (checkpoint-aware: seeds from `_last_checkpoint` when present). */
  def importDelta(spark: SparkSession, srcDir: String): DataFrame =
    importDelta(spark, srcDir, None)

  /** Import, optionally AS OF a retained commit version (time travel). */
  def importDelta(spark: SparkSession, srcDir: String,
      versionAsOf: Option[Long]): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit, udf}
    val snap = readLog(spark, srcDir, versionAsOf)
    // column mapping: files store PHYSICAL names; read under the physical
    // schema, surface logical names via a positional struct cast (free —
    // a rename, not a conversion). id mode resolves by parquet field id:
    // the session flag stays on (it only affects read schemas that CARRY
    // field-id metadata, i.e. exactly these reads). Validated before the
    // empty-table shortcut so an unsupported layout refuses consistently.
    val mapped = snap.columnMappingMode != "none"
    if (mapped) {
      require(snap.partitionColumns.isEmpty,
        "column-mapped PARTITIONED tables are not supported: the protocol " +
          "keys add.partitionValues by physical name and this importer " +
          "does not resolve that indirection — refusing rather than " +
          "reading wrong columns")
      if (snap.columnMappingMode == "id")
        spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
    }
    if (snap.files.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], snap.schema)
    val readSchema =
      if (mapped)
        DeltaReaderFeatures.physicalSchema(snap.schema,
          idMode = snap.columnMappingMode == "id")
      else snap.schema

    // deletion vectors: broadcast the O(files) descriptors; executors open
    // the sidecars and the row filter runs map-side inside the one scan —
    // no extra shuffle, bitmap bytes never funnel through the driver
    val dvs = snap.fileDvs.map { case (p, d) =>
      Paths.get(p).toAbsolutePath.toString -> d }
    val dvB =
      if (dvs.isEmpty) null else spark.sparkContext.broadcast(dvs)
    lazy val keep = udf((fp: String, idx: Long) =>
      !DeltaReaderFeatures.isDeleted(dvB.value, fp, idx))
    def scan(files: Seq[String]): DataFrame = {
      var df = spark.read.schema(readSchema).parquet(files: _*)
      if (dvB != null)
        df = df.where(keep(col("_metadata.file_path"), col("_metadata.row_index")))
      df
    }
    def toLogical(df: DataFrame): DataFrame =
      if (!mapped) df
      else df.select(snap.schema.fields.zip(readSchema.fields).map {
        case (lf, pf) => df.col(pf.name).cast(lf.dataType).as(lf.name)
      }.toSeq: _*)

    if (snap.partitionColumns.isEmpty)
      return toLogical(scan(snap.files))
    // Hive-layout partitioning: the files do NOT store partition columns;
    // the per-file string values from add.partitionValues project back as
    // constants per file group (the Delta analog of Iceberg's Column
    // Projection). Bounded to types whose partition-value strings cast
    // unambiguously; timestamp/binary partition columns refuse.
    snap.partitionColumns.foreach { c =>
      val dt = snap.schema(c).dataType
      require(!Seq(TimestampType, TimestampNTZType, BinaryType).contains(dt),
        s"partition column '$c': $dt partition-value serialization is " +
          "not supported by this importer — refusing")
    }
    snap.files.groupBy(f => snap.partitionColumns.map(c =>
        snap.filePartitions.getOrElse(f, Map.empty).getOrElse(c, null)))
      .toSeq.sortBy(_._1.mkString(","))
      .map { case (vals, fs) =>
        var df = scan(fs)
        snap.partitionColumns.zip(vals).foreach { case (c, v) =>
          df = df.withColumn(c, lit(v).cast(snap.schema(c).dataType))
        }
        df
      }.reduce(_ unionAll _)
      .select(snap.schema.fieldNames.map(col).toSeq: _*)
  }
}
