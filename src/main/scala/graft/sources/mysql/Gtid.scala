package graft.sources.mysql

/** GTID-set algebra and binlog-position ordering — the session-management
  * half of a live MySQL deployment (the other half is the socket itself,
  * absent in this environment). A GTID set is `uuid:i1-j1:i2-j2,...`:
  * per-source-UUID transaction-interval sets. Semantics mirror the
  * reference's `GtidUtils.java` (restored-offset reconciliation, no-overwrite
  * merge) and `BinlogOffset.java:171-257` (GTID-first comparison with
  * file/position fallback), re-derived from the public MySQL GTID model.
  */
object Gtid {

  /** Closed transaction interval `[start, end]`. */
  final case class Interval(start: Long, end: Long) {
    require(start >= 1 && end >= start, s"invalid GTID interval $start-$end")
    def render: String = if (start == end) s"$start" else s"$start-$end"
  }

  /** Intervals of one source UUID, kept normalized: sorted, non-overlapping,
    * non-adjacent (MySQL renders `1-3:4-5` as `1-5`). */
  final case class UuidSet(uuid: String, intervals: List[Interval]) {
    def contains(tx: Long): Boolean =
      intervals.exists(i => i.start <= tx && tx <= i.end)

    def isContainedWithin(other: UuidSet): Boolean =
      intervals.forall(i =>
        other.intervals.exists(o => o.start <= i.start && i.end <= o.end))

    def render: String = s"$uuid:${intervals.map(_.render).mkString(":")}"
  }

  object UuidSet {
    /** Normalize: sort by start, coalesce overlapping AND adjacent. */
    def normalized(uuid: String, raw: Seq[Interval]): UuidSet = {
      val sorted = raw.sortBy(_.start)
      val out = scala.collection.mutable.ListBuffer.empty[Interval]
      sorted.foreach { i =>
        out.lastOption match {
          case Some(last) if i.start <= last.end + 1 =>
            out.update(out.size - 1, Interval(last.start, math.max(last.end, i.end)))
          case _ => out += i
        }
      }
      UuidSet(uuid, out.toList)
    }
  }

  /** An immutable GTID set. UUIDs are case-insensitive (MySQL renders lower). */
  final case class GtidSet(sets: Map[String, UuidSet]) {

    def contains(uuid: String, tx: Long): Boolean =
      sets.get(uuid.toLowerCase).exists(_.contains(tx))

    /** Every transaction of this set is in `other` — the reference's
      * subset test that drives offset comparison. */
    def isContainedWithin(other: GtidSet): Boolean =
      sets.values.forall(u =>
        other.sets.get(u.uuid).exists(u.isContainedWithin))

    /** Add one executed transaction (the per-event position advance). */
    def advance(uuid: String, tx: Long): GtidSet = {
      val key = uuid.toLowerCase
      val prev = sets.get(key).map(_.intervals).getOrElse(Nil)
      GtidSet(sets + (key -> UuidSet.normalized(key, prev :+ Interval(tx, tx))))
    }

    /** Set union (interval-level). */
    def union(other: GtidSet): GtidSet =
      GtidSet((sets.keySet ++ other.sets.keySet).map { k =>
        k -> UuidSet.normalized(k,
          sets.get(k).map(_.intervals).getOrElse(Nil) ++
            other.sets.get(k).map(_.intervals).getOrElse(Nil))
      }.toMap)

    def isEmpty: Boolean = sets.isEmpty

    /** Canonical render: UUIDs sorted for determinism. */
    def render: String =
      sets.values.toSeq.sortBy(_.uuid).map(_.render).mkString(",")
  }

  object GtidSet {
    val empty: GtidSet = GtidSet(Map.empty[String, UuidSet])

    /** Parse `uuid:1-5:7,uuid2:1-3` (whitespace-tolerant; empty → empty set). */
    def parse(s: String): GtidSet = {
      val trimmed = Option(s).getOrElse("").trim
      if (trimmed.isEmpty) return empty
      val sets = trimmed.split(",").map(_.trim).filter(_.nonEmpty).map { part =>
        val pieces = part.split(":")
        require(pieces.length >= 2, s"malformed GTID set element: $part")
        val uuid = pieces.head.toLowerCase
        val intervals = pieces.tail.toSeq.map { iv =>
          iv.split("-") match {
            case Array(a) => Interval(a.trim.toLong, a.trim.toLong)
            case Array(a, b) => Interval(a.trim.toLong, b.trim.toLong)
            case _ => throw new IllegalArgumentException(s"malformed interval: $iv")
          }
        }
        uuid -> UuidSet.normalized(uuid, intervals)
      }
      GtidSet(sets.toMap)
    }

    /** `GtidUtils.fixRestoredGtidSet` (`GtidUtils.java:38-91`): reconcile a
      * checkpoint-restored set against the server's executed set so the
      * restart position never claims transactions the server does not have.
      * Per restored UUID known to the server, the result is
      *   (server ∩ restored) ∪ (server-parts strictly before the earliest
      *   restored transaction)
      * — server history from before our subscription counts as consumed,
      * server transactions beyond what we restored do NOT (they must
      * replay). Restored UUIDs unknown to the server pass through; server
      * UUIDs we never saw stay as the server reports them.
      */
    def fixRestored(server: GtidSet, restored: GtidSet): GtidSet = {
      val out = scala.collection.mutable.Map.empty[String, UuidSet]
      server.sets.values.foreach(u => out(u.uuid) = u)
      restored.sets.values.foreach { r =>
        out.get(r.uuid) match {
          case None => out(r.uuid) = r
          case Some(sv) =>
            val earliest = r.intervals.map(_.start).min
            val merged = scala.collection.mutable.ListBuffer.empty[Interval]
            sv.intervals.foreach { si =>
              if (si.start < earliest)
                merged += Interval(si.start, math.min(si.end, earliest - 1))
              r.intervals.foreach { ri =>
                val lo = math.max(si.start, ri.start)
                val hi = math.min(si.end, ri.end)
                if (lo <= hi) merged += Interval(lo, hi)
              }
            }
            out(r.uuid) = UuidSet.normalized(r.uuid, merged.toSeq)
        }
      }
      GtidSet(out.toMap)
    }

    /** `GtidUtils.mergeGtidSetInto` (`GtidUtils.java:100-112`): add `toMerge`'s
      * UUIDs to `base` WITHOUT overwriting UUIDs base already has (used to
      * carry purged-but-relevant history into a freshly fetched set). */
    def mergeInto(base: GtidSet, toMerge: GtidSet): GtidSet =
      GtidSet(toMerge.sets.filterNot { case (k, _) => base.sets.contains(k) } ++
        base.sets)
  }

  /** A binlog position with the reference's comparison semantics
    * (`BinlogOffset.java:171-257`): GTID sets compare first when present
    * (subset ⇒ earlier; equal sets tie-break on events-to-skip); a
    * GTID-less side is earlier than a GTID-bearing one; with no GTIDs,
    * positions from different server ids fall back to timestamps, same
    * server id compares (file, position). `nonStopping` is the +∞ sentinel
    * (`BinlogOffsetKind.NON_STOPPING`). */
  final case class BinlogPosition(
      file: String = "",
      position: Long = 0L,
      gtidSet: GtidSet = GtidSet.empty,
      serverId: Long = 0L,
      timestampSec: Long = 0L,
      skipEvents: Long = 0L,
      nonStopping: Boolean = false)

  object BinlogPosition {
    val nonStoppingPosition: BinlogPosition = BinlogPosition(nonStopping = true)

    implicit val ordering: Ordering[BinlogPosition] = (a: BinlogPosition, b: BinlogPosition) => {
      if (a.nonStopping && b.nonStopping) 0
      else if (a.nonStopping) 1
      else if (b.nonStopping) -1
      else if (!b.gtidSet.isEmpty) {
        if (!a.gtidSet.isEmpty) {
          if (a.gtidSet == b.gtidSet) java.lang.Long.compare(a.skipEvents, b.skipEvents)
          else if (a.gtidSet.isContainedWithin(b.gtidSet)) -1
          else 1
        } else -1 // no GTID vs GTID: treat as earlier (Debezium semantics)
      } else if (!a.gtidSet.isEmpty) 1
      else if (a.serverId != b.serverId) {
        // binlog coordinates of different servers are incomparable; degrade
        // to event timestamps when both are known
        if (a.timestampSec != 0 && b.timestampSec != 0)
          java.lang.Long.compare(a.timestampSec, b.timestampSec)
        else 0
      } else {
        val byFile = a.file.compareToIgnoreCase(b.file)
        if (byFile != 0) byFile else java.lang.Long.compare(a.position, b.position)
      }
    }
  }

  /** `server-id` option parsing (`MySqlSourceOptions` `server-id`): a single
    * id or an inclusive range `5400-5404`; a parallel source needs one id
    * per reader, so the range must cover the parallelism. */
  final case class ServerIdRange(start: Long, end: Long) {
    require(start >= 1 && end >= start, s"invalid server-id range $start-$end")
    def size: Long = end - start + 1
    def forSubtask(index: Int): Long = {
      require(index >= 0 && index < size,
        s"subtask $index needs a server id but range $start-$end has only $size; " +
          "the server-id range must be at least as large as the source parallelism")
      start + index
    }
  }

  object ServerIdRange {
    def parse(s: String): ServerIdRange = s.trim.split("-") match {
      case Array(one) => ServerIdRange(one.trim.toLong, one.trim.toLong)
      case Array(a, b) => ServerIdRange(a.trim.toLong, b.trim.toLong)
      case _ => throw new IllegalArgumentException(s"malformed server-id: $s")
    }
  }
}
