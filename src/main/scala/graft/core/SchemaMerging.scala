package graft.core

import org.apache.spark.sql.types.StructType

/** Schema merging / widening, a faithful port of the reference's
  * `flink-cdc-common/.../utils/SchemaMergingUtils.java` (lattice at :974-1051,
  * `getLeastCommonType:471`, `mergeDecimalType:555`, `mergeTimestampType:505`,
  * `getLeastCommonSchema:125`, `getSchemaDifference:195`).
  *
  * These rules intentionally differ from Spark's own `TypeCoercion`
  * (e.g. INT + VARCHAR → STRING here) and are kept as pure Scala functions so
  * they are exhaustively unit-testable.
  */
object SchemaMerging {
  import CdcTypes._

  /** TYPE_MERGING_TREE (reference :977-1051): the chain of types each type may
    * widen into, in preference order. STRING is the universal final resort.
    */
  private val string: CdcType = StringT()
  private val maxDecimal: CdcType = DecimalT(CdcType.MaxDecimalPrecision, 0)

  private def tree(t: CdcType): List[CdcType] = t match {
    case _: VarCharT            => List(string)
    case _: CharT               => List(string)
    case _: BooleanT            => List(string)
    case _: BinaryT             => List(string)
    case _: VarBinaryT          => List(string)
    case _: DoubleT             => List(DoubleT(), string)
    case _: FloatT              => List(FloatT(), DoubleT(), string)
    case _: DecimalT            => List(string)
    case _: BigIntT             => List(BigIntT(), maxDecimal, DoubleT(), string)
    case _: IntT                => List(IntT(), BigIntT(), maxDecimal, DoubleT(), string)
    case _: SmallIntT =>
      List(SmallIntT(), IntT(), BigIntT(), maxDecimal, FloatT(), DoubleT(), string)
    case _: TinyIntT =>
      List(TinyIntT(), SmallIntT(), IntT(), BigIntT(), maxDecimal, FloatT(), DoubleT(), string)
    case _: ZonedTimestampT     => List(ZonedTimestampT(9), string)
    case _: LocalZonedTimestampT => List(LocalZonedTimestampT(9), ZonedTimestampT(9), string)
    case _: TimestampT =>
      List(TimestampT(9), LocalZonedTimestampT(9), ZonedTimestampT(9), string)
    case _: DateT =>
      List(DateT(), TimestampT(9), LocalZonedTimestampT(9), ZonedTimestampT(9), string)
    case _: TimeT               => List(string)
    case _: RowT                => List(string)
    case _: ArrayT              => List(string)
    case _: MapT                => List(string)
  }

  private def sameIgnoringNullability(a: CdcType, b: CdcType): Boolean =
    a.withNullable(true) == b.withNullable(true)

  private def isTimestampFamily(t: CdcType): Boolean = t match {
    case _: TimestampT | _: LocalZonedTimestampT | _: ZonedTimestampT => true
    case _ => false
  }

  /** `getNumericPrecision` (reference :675-695). */
  def numericPrecision(t: CdcType): Int = t match {
    case _: TinyIntT   => 3
    case _: SmallIntT  => 5
    case _: IntT       => 10
    case _: BigIntT    => 19
    case d: DecimalT   => d.precision
    case other => throw new IllegalArgumentException(s"not an exact numeric: $other")
  }

  /** `mergeTimestampType` (reference :505-553): max precision, max "zone level"
    * (TIMESTAMP < TIMESTAMP_LTZ < TIMESTAMP_TZ).
    */
  private[core] def mergeTimestamp(l: CdcType, r: CdcType): CdcType = {
    def level(t: CdcType): (Int, Int) = t match {
      case TimestampT(p, _)            => (0, p)
      case LocalZonedTimestampT(p, _)  => (1, p)
      case ZonedTimestampT(p, _)       => (2, p)
      case other => throw new IllegalArgumentException(s"not a timestamp: $other")
    }
    val (ll, lp) = level(l); val (rl, rp) = level(r)
    val p = math.max(lp, rp)
    math.max(ll, rl) match {
      case 0 => TimestampT(p)
      case 1 => LocalZonedTimestampT(p)
      case 2 => ZonedTimestampT(p)
    }
  }

  /** `mergeDecimalType` + `mergeExactNumericsIntoDecimal` (reference :555-608). */
  private[core] def mergeDecimal(l: CdcType, r: CdcType): CdcType = (l, r) match {
    case (a: DecimalT, b: DecimalT) =>
      val intDigits = math.max(a.precision - a.scale, b.precision - b.scale)
      val scale = math.max(a.scale, b.scale)
      require(
        intDigits + scale <= CdcType.MaxDecimalPrecision,
        s"decimal merge of $l and $r overflows precision ${CdcType.MaxDecimalPrecision}")
      DecimalT(intDigits + scale, scale)
    case (a: DecimalT, b) if isExactNumeric(b) => mergeExactIntoDecimal(a, b)
    case (a, b: DecimalT) if isExactNumeric(a) => mergeExactIntoDecimal(b, a)
    case _ => string
  }

  private def isExactNumeric(t: CdcType): Boolean = t match {
    case _: TinyIntT | _: SmallIntT | _: IntT | _: BigIntT | _: DecimalT => true
    case _ => false
  }

  private def mergeExactIntoDecimal(d: DecimalT, other: CdcType): CdcType = {
    val p = math.max(d.precision, d.scale + numericPrecision(other))
    if (p <= CdcType.MaxDecimalPrecision) DecimalT(p, d.scale) else string
  }

  /** `getLeastCommonType` (reference :471-503). Nullability is OR-ed and restored. */
  def leastCommonType(current: CdcType, target: CdcType): CdcType = {
    val nullable = current.nullable || target.nullable
    val c = current.withNullable(false)
    val t = target.withNullable(false)
    val merged: CdcType =
      if (sameIgnoringNullability(c, t)) c
      else if (isTimestampFamily(c) && isTimestampFamily(t)) mergeTimestamp(c, t)
      else if (c.isInstanceOf[DecimalT] || t.isInstanceOf[DecimalT]) mergeDecimal(c, t)
      else {
        val ct = tree(c); val tt = tree(t)
        ct.find(x => tt.exists(sameIgnoringNullability(_, x))).getOrElse(string)
      }
    merged.withNullable(nullable)
  }

  /** `isDataTypeCompatible` (reference :455-468): upcoming fits current without change. */
  def isCompatible(current: Option[CdcType], upcoming: CdcType): Boolean = current match {
    case None => false
    case Some(c) =>
      sameIgnoringNullability(c, upcoming) ||
        tree(upcoming).exists(sameIgnoringNullability(_, c))
  }

  /** `getLeastCommonSchema` (reference :125-193): widen `current` so `upcoming`
    * rows fit — append upcoming-only columns as nullable, widen type conflicts
    * via [[leastCommonType]]. Column order: current's order, then new columns.
    */
  def leastCommonSchema(
      current: Seq[(String, CdcType)],
      upcoming: Seq[(String, CdcType)]): Seq[(String, CdcType)] = {
    val curMap = current.toMap
    val upMap = upcoming.toMap
    val widened = current.map { case (name, t) =>
      upMap.get(name) match {
        // ALWAYS merge through leastCommonType (reference getLeastCommonSchema
        // :147-156 has no same-type shortcut): nullability ORs even when the
        // base types agree — keeping a NOT NULL declaration while upcoming
        // rows carry nulls would violate the declared schema downstream
        case Some(u) => name -> leastCommonType(t, u)
        // a column missing from the upcoming schema keeps its declared type
        // UNCHANGED — the reference's getLeastCommonSchema (:163-170) copies
        // current-only columns as-is (even NOT NULL ones whose future rows
        // null them; `distributed/SchemaEvolveTest.testLenientSchemaEvolution`
        // expects NO nullability alter after a rename strands the old name)
        case None => name -> t
      }
    }
    // upcoming-only columns append with THEIR OWN declared type (reference
    // :158-159 appends upcomingColumn unchanged)
    val appended = upcoming.collect {
      case (name, t) if !curMap.contains(name) => name -> t
    }
    widened ++ appended
  }

  /** `getSchemaDifference` (reference :195-257): events that evolve `before` into
    * `after` — AlterColumnType for widened columns, AddColumn (LAST) for new ones.
    */
  def schemaDifference(
      tableId: TableId,
      before: Seq[(String, CdcType)],
      after: Seq[(String, CdcType)]): Seq[SchemaChangeEvent] = {
    val beforeMap = before.toMap
    // EXACT type comparison (reference getSchemaDifference:214 uses
    // Objects.equals): a nullability-only widening must still emit
    // AlterColumnType, or the sink keeps a NOT NULL column the merged
    // schema already relaxed
    val altered = after.collect {
      case (name, t) if beforeMap.get(name).exists(b => b != t) =>
        name -> t
    }.toMap
    // Added columns carry an EXPLICIT anchor — AFTER the preceding
    // after-schema column (FIRST when leading), exactly
    // `getSchemaDifference:209-234`; and the AddColumnEvent precedes the
    // AlterColumnTypeEvent (:237-244) — the derived-event order the
    // composer ITCases assert (`FlinkPipelineComposerITCase.java:838-839`).
    val added = after.zipWithIndex.collect {
      case ((name, t), i) if !beforeMap.contains(name) =>
        val pos =
          if (i == 0) AddColumnEvent.First
          else AddColumnEvent.After(after(i - 1)._1)
        AddColumnEvent.ColumnWithPosition(name, t, pos)
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[SchemaChangeEvent]
    if (added.nonEmpty) out += AddColumnEvent(tableId, added)
    if (altered.nonEmpty) out += AlterColumnTypeEvent(tableId, altered)
    out.toSeq
  }

  /** Merge many schemas (for many-to-one routed tables —
    * `SchemaDerivator.deduceMergedCreateTableEvent:347`).
    */
  def mergeAll(schemas: Seq[Seq[(String, CdcType)]]): Seq[(String, CdcType)] =
    schemas.reduceLeft(leastCommonSchema)

  // ---- Spark-facing helpers -------------------------------------------------

  def toStruct(cols: Seq[(String, CdcType)]): StructType =
    StructType(cols.map { case (n, t) =>
      org.apache.spark.sql.types.StructField(n, t.toSpark, t.nullable)
    })

  def fromStruct(s: StructType): Seq[(String, CdcType)] =
    // width-aware: a VARCHAR(n) tag in field metadata reconstructs the
    // bounded type, so merged-route diffs see VARCHAR(17) vs VARCHAR(19)
    // (→ STRING alter), not string vs string (→ nothing)
    s.fields.toSeq.map(f => f.name -> CdcTypes.fromSparkField(f))
}
