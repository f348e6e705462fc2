package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot chunk splitting: port of the reference's
  * `flink-cdc-base/.../assigner/splitter/JdbcSourceChunkSplitter.java`
  * (`generateSplits:109`, even path `:327-480`, uneven path `:482-530`).
  *
  * A table is split into PK ranges `[start, end)` (None = unbounded) that
  * become the `InputPartition`s of the DSv2 snapshot phase. The even path
  * computes a dynamic chunk size from the distribution factor
  * `(max - min + 1) / rowCount` when it is within
  * [`distributionFactorLower`, `distributionFactorUpper`] (defaults 0.05 and
  * 1000.0 per `MySqlDataSourceOptions.java:193-208`); the uneven path probes
  * per-chunk maxima.
  */
object ChunkSplitter {

  /** `[start, end)`; `None` = unbounded on that side (`ChunkRange.all()` = both None). */
  final case class ChunkRange(start: Option[Long], end: Option[Long]) {
    def predicate(keyCol: String): Column = (start, end) match {
      case (None, None) => lit(true)
      case (Some(s), None) => col(keyCol) >= s
      case (None, Some(e)) => col(keyCol) < e
      case (Some(s), Some(e)) => col(keyCol) >= s && col(keyCol) < e
    }
  }

  final case class Config(
      chunkSize: Int = 8096, // scan.incremental.snapshot.chunk.size default
      distributionFactorUpper: Double = 1000.0,
      distributionFactorLower: Double = 0.05)

  /** Probe interface for the uneven path — in the JDBC source this issues
    * `SELECT MAX(pk) FROM (SELECT pk ... WHERE pk >= ? ORDER BY pk LIMIT n)`;
    * tests back it with a sorted parquet read.
    */
  trait Probe {
    /** max key among the next `chunkSize` keys strictly greater than `from`. */
    def nextChunkMax(from: Long, chunkSize: Int): Option[Long]
    /** smallest key strictly greater than `v`. */
    def minAfter(v: Long): Option[Long]
  }

  /** `calculateDistributionFactor` (reference :443-466). */
  def distributionFactor(min: Long, max: Long, rowCount: Long): Double =
    if (rowCount == 0) Double.MaxValue
    else (max.toDouble - min.toDouble + 1.0) / rowCount.toDouble

  /** `splitEvenlySizedChunks` (reference :447-480): tumble from min in
    * dynamic-chunk-size steps.
    */
  def splitEvenlySizedChunks(
      min: Long,
      max: Long,
      approximateRowCnt: Long,
      chunkSize: Int,
      dynamicChunkSize: Int): Seq[ChunkRange] = {
    if (approximateRowCnt <= chunkSize) return Seq(ChunkRange(None, None))
    val splits = scala.collection.mutable.ArrayBuffer.empty[ChunkRange]
    var chunkStart: Option[Long] = None
    var chunkEnd: Long = min + dynamicChunkSize
    var overflowed = false
    while (!overflowed && chunkEnd <= max) {
      splits += ChunkRange(chunkStart, Some(chunkEnd))
      chunkStart = Some(chunkEnd)
      val next = chunkEnd + dynamicChunkSize
      if (next < chunkEnd) overflowed = true else chunkEnd = next
    }
    splits += ChunkRange(chunkStart, None)
    splits.toSeq
  }

  /** `splitUnevenlySizedChunks` (reference :482-510). */
  def splitUnevenlySizedChunks(
      probe: Probe,
      min: Long,
      max: Long,
      chunkSize: Int): Seq[ChunkRange] = {
    val splits = scala.collection.mutable.ArrayBuffer.empty[ChunkRange]
    var chunkStart: Option[Long] = None
    var chunkEnd: Option[Long] = nextChunkEnd(probe, min, max, chunkSize)
    while (chunkEnd.isDefined && chunkEnd.get <= max) {
      splits += ChunkRange(chunkStart, chunkEnd)
      chunkStart = chunkEnd
      chunkEnd = nextChunkEnd(probe, chunkEnd.get, max, chunkSize)
    }
    splits += ChunkRange(chunkStart, None)
    splits.toSeq
  }

  /** `nextChunkEnd` (reference :512-530): never returns a value equal to the
    * previous end (falls forward to the next distinct key), and returns None
    * once past max.
    */
  private def nextChunkEnd(probe: Probe, previous: Long, max: Long, chunkSize: Int): Option[Long] = {
    var end = probe.nextChunkMax(previous, chunkSize)
    if (end.contains(previous)) end = probe.minAfter(previous)
    end.filter(_ < max)
  }

  /** `trySplitAllEvenlySizedChunks` + `getDynamicChunkSize` (reference :333-445):
    * the full decision — empty/single-row table → one full chunk; evenly
    * distributed → arithmetic split; otherwise → uneven probing.
    */
  def generateSplits(
      min: Option[Long],
      max: Option[Long],
      approximateRowCnt: Long,
      config: Config,
      probe: Probe): Seq[ChunkRange] = (min, max) match {
    case (None, _) | (_, None) => Seq(ChunkRange(None, None))
    case (Some(mn), Some(mx)) if mn == mx => Seq(ChunkRange(None, None))
    case (Some(mn), Some(mx)) =>
      val factor = distributionFactor(mn, mx, approximateRowCnt)
      val even =
        factor >= config.distributionFactorLower && factor <= config.distributionFactorUpper
      if (even) {
        val dynamicChunkSize = math.max((factor * config.chunkSize).toInt, 1)
        splitEvenlySizedChunks(mn, mx, approximateRowCnt, config.chunkSize, dynamicChunkSize)
      } else {
        splitUnevenlySizedChunks(probe, mn, mx, config.chunkSize)
      }
  }

  /** Stats + probe backed by a DataFrame (parquet snapshot analog of
    * `analyzeTable`). Each chunk read pushes its range predicate to the scan.
    */
  def analyze(df: DataFrame, keyCol: String): (Option[Long], Option[Long], Long) = {
    val row = df.agg(
      min(col(keyCol)).cast("long"),
      max(col(keyCol)).cast("long"),
      count(lit(1))).head()
    (
      if (row.isNullAt(0)) None else Some(row.getLong(0)),
      if (row.isNullAt(1)) None else Some(row.getLong(1)),
      row.getLong(2))
  }

  def dataFrameProbe(df: DataFrame, keyCol: String): Probe = new Probe {
    def nextChunkMax(from: Long, chunkSize: Int): Option[Long] = {
      val rows = df
        .filter(col(keyCol) > from)
        .select(col(keyCol).cast("long"))
        .orderBy(col(keyCol))
        .limit(chunkSize)
        .agg(max(col(keyCol)))
        .head()
      if (rows.isNullAt(0)) None else Some(rows.getLong(0))
    }
    def minAfter(v: Long): Option[Long] = {
      val row = df.filter(col(keyCol) > v).agg(min(col(keyCol)).cast("long")).head()
      if (row.isNullAt(0)) None else Some(row.getLong(0))
    }
  }

  /** Coalesce adjacent chunk ranges into at most `maxGroups` coarse ranges.
    * Splitter output is contiguous (each chunk starts where the previous
    * ended), so a group of adjacent chunks IS a range: (first.start,
    * last.end). This is the batch analog of the streaming source's
    * `chunksPerBatch` batching — chunk granularity is the unit of assignment
    * and recovery, not of plan branching.
    */
  def coalesceRanges(chunks: Seq[ChunkRange], maxGroups: Int): Seq[ChunkRange] =
    if (chunks.size <= maxGroups) chunks
    else {
      // coalescing [a,b) + [b,c) -> [a,c) is lossless ONLY for contiguous
      // input; a filtered subset (e.g. retrying failed ranges) must pass
      // through untouched rather than silently absorb the gaps
      val contiguous = chunks.sliding(2).forall {
        case Seq(a, b) => a.end.isDefined && a.end == b.start
        case _ => true
      }
      if (!contiguous) chunks
      else {
        val perGroup = math.ceil(chunks.size.toDouble / maxGroups).toInt
        chunks.grouped(perGroup).map(g => ChunkRange(g.head.start, g.last.end)).toSeq
      }
    }

  /** Read a table as the union of its chunks — the batch-snapshot form of the
    * DSv2 source's phase 1. Chunk predicates reach the parquet scan as
    * `PushedFilters`, so each chunk reads only its row-group range.
    *
    * The union is capped at `maxBranches` plan branches (adjacent ranges
    * coalesce losslessly): a 100 TB table splits into millions of chunks, and
    * a million-branch `Union` is a driver-side planning death — the branch
    * count must be O(parallelism), never O(table size).
    */
  def unionOfChunks(
      df: DataFrame,
      keyCol: String,
      chunks: Seq[ChunkRange],
      maxBranches: Int = 32): DataFrame =
    coalesceRanges(chunks, maxBranches)
      .map(c => df.filter(c.predicate(keyCol)))
      .reduce(_ union _)
}
