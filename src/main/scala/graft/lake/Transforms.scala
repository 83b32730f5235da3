package graft.lake

import java.time.{Instant, LocalDate, ZoneOffset}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{
  Attribute, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In,
  IsNotNull, IsNull, LessThan, LessThanOrEqual, Literal, Murmur3Hash, Not,
  And => CAnd, Or => COr}
import org.apache.spark.sql.types._

/** Hidden-partition transforms (`iceberg_trino_sqldemo.sql:13,21,193`) and
  * the manifest-level file pruner that makes them useful: predicates on
  * the *source* column prune partitions of the *transformed* value, plus
  * min/max skipping from per-file column stats — all before Spark ever
  * sees a file list (SURVEY §4, EP1).
  *
  * Pruning is strictly best-effort: the scan re-applies the full
  * predicate as a row filter, so an unanalyzable expression costs
  * efficiency, never correctness.
  */
object Transforms {
  import Meta._

  private val Bucket = """bucket\[(\d+)\]""".r
  private val Truncate = """truncate\[(\d+)\]""".r

  /** The write-side Column computing a partition value from its source. */
  def transformColumn(tf: String, src: Column, srcType: DataType): Column =
    tf match {
      case "identity" => src
      case "year"  => year(src)
      case "month" => date_format(src, "yyyy-MM")
      case "day"   => date_format(src, "yyyy-MM-dd")
      case "hour"  => date_format(src, "yyyy-MM-dd-HH")
      case Bucket(n) => pmod(hash(src), lit(n.toInt))
      case Truncate(w) => srcType match {
        case StringType => substring(src, 1, w.toInt)
        case LongType | IntegerType | ShortType | ByteType =>
          (src - pmod(src, lit(w.toLong))).cast(LongType)
        case other => throw new IllegalArgumentException(
          s"truncate[$w] unsupported for $other")
      }
      case other => throw new IllegalArgumentException(s"unknown transform $other")
    }

  // ---- predicate model ------------------------------------------------

  sealed trait Pred
  case class Cmp(op: String, col: String, value: Any) extends Pred // = < <= > >=
  case class InSet(col: String, values: Seq[Any]) extends Pred
  case class NullCheck(col: String, isNull: Boolean) extends Pred
  case class AndP(a: Pred, b: Pred) extends Pred
  case class OrP(a: Pred, b: Pred) extends Pred
  case object Opaque extends Pred // unanalyzable → never prunes

  import org.apache.spark.sql.graftshim._

  /** Column → Pred via the ColumnNode bridge (Spark 4 Columns carry
    * node trees, not catalyst expressions). Conservatively Opaque on
    * anything unrecognized.
    */
  def analyzeColumn(c: Column): Pred = analyzeNode(columnNode(c))

  private val flip = Map(">" -> "<", "<" -> ">", ">=" -> "<=", "<=" -> ">=",
    "=" -> "=")

  def analyzeNode(n: GNode): Pred = n match {
    case GFn("and", Seq(a, b)) => AndP(analyzeNode(a), analyzeNode(b))
    case GFn("or", Seq(a, b)) => OrP(analyzeNode(a), analyzeNode(b))
    case GFn("not", Seq(a)) => analyzeNode(a) match {
      case NullCheck(c, b) => NullCheck(c, !b)
      case _ => Opaque
    }
    case GFn("isnull", Seq(a)) =>
      nodeAttr(a).map(NullCheck(_, isNull = true)).getOrElse(Opaque)
    case GFn("isnotnull", Seq(a)) =>
      nodeAttr(a).map(NullCheck(_, isNull = false)).getOrElse(Opaque)
    case GFn(op @ ("=" | "==" | ">" | ">=" | "<" | "<="), Seq(a, b)) =>
      val norm = if (op == "==") "=" else op
      (for { c <- nodeAttr(a); v <- nodeLit(b) } yield Cmp(norm, c, v))
        .orElse(for { c <- nodeAttr(b); v <- nodeLit(a) }
          yield Cmp(flip(norm), c, v))
        .getOrElse(Opaque)
    case GFn("in", a +: vs) if vs.nonEmpty =>
      (nodeAttr(a), vs.map(nodeLit)) match {
        case (Some(c), lits) if lits.forall(_.isDefined) =>
          InSet(c, lits.map(_.get))
        case _ => Opaque
      }
    case GExpr(e) => analyzeExpr(e)
    case _ => Opaque
  }

  private def nodeAttr(n: GNode): Option[String] = n match {
    case GAttr(name) => Some(name)
    case GExpr(e) => attrName(e)
    case _ => None
  }

  private def nodeLit(n: GNode): Option[Any] = n match {
    case GLit(v, _) if v != null => Some(v)
    case GExpr(e) => litValue(e)
    case _ => None
  }

  private def attrName(e: Expression): Option[String] = e match {
    case a: UnresolvedAttribute => Some(a.name)
    case a: Attribute => Some(a.name)
    case _ => None
  }

  private def litValue(e: Expression): Option[Any] = e match {
    case l: Literal =>
      Some(CatalystTypeConverters.convertToScala(l.value, l.dataType))
    case _ => None
  }

  /** Catalyst fallback (expressions reaching us via ExpressionColumnNode). */
  def analyzeExpr(e: Expression): Pred = e match {
    case CAnd(a, b) => AndP(analyzeExpr(a), analyzeExpr(b))
    case COr(a, b) => OrP(analyzeExpr(a), analyzeExpr(b))
    case EqualTo(a, v) => cmp("=", a, v).orElse(cmp("=", v, a)).getOrElse(Opaque)
    case GreaterThan(a, v) => cmp(">", a, v).orElse(cmp("<", v, a)).getOrElse(Opaque)
    case GreaterThanOrEqual(a, v) => cmp(">=", a, v).orElse(cmp("<=", v, a)).getOrElse(Opaque)
    case LessThan(a, v) => cmp("<", a, v).orElse(cmp(">", v, a)).getOrElse(Opaque)
    case LessThanOrEqual(a, v) => cmp("<=", a, v).orElse(cmp(">=", v, a)).getOrElse(Opaque)
    case In(a, vs) =>
      (attrName(a), vs.map(litValue)) match {
        case (Some(c), lits) if lits.forall(_.isDefined) =>
          InSet(c, lits.map(_.get))
        case _ => Opaque
      }
    case IsNull(a) => attrName(a).map(NullCheck(_, isNull = true)).getOrElse(Opaque)
    case IsNotNull(a) => attrName(a).map(NullCheck(_, isNull = false)).getOrElse(Opaque)
    case Not(inner) => analyzeExpr(inner) match {
      case NullCheck(c, b) => NullCheck(c, !b)
      case _ => Opaque
    }
    case _ => Opaque
  }

  private def cmp(op: String, a: Expression, v: Expression): Option[Pred] =
    for { c <- attrName(a); lv <- litValue(v) } yield Cmp(op, c, lv)

  // ---- schema-version remapping --------------------------------------

  /** Rewrite a predicate's column names from `names`-schema naming into
    * a specific file schema's naming via stable field ids — the same
    * resolution the read path uses. A leaf whose column has no
    * same-id counterpart in the file schema becomes Opaque (no prune):
    * after drop-then-re-add of a name, the old file's stats describe the
    * DROPPED field, and consulting them for the new field would prune
    * files whose projected rows (default-filled) can match. Stats and
    * partition tuples are keyed by write-time names, so the remapped name
    * is the correct key for both.
    */
  def remapPred(p: Pred, names: StructType, fileSchema: StructType): Pred = {
    val curId: Map[String, Int] = names.fields.iterator
      .map(f => f.name -> SchemaEvolution.fieldId(f)).toMap
    val fileById: Map[Int, String] = fileSchema.fields.iterator
      .map(f => SchemaEvolution.fieldId(f) -> f.name).toMap
    def resolve(c: String): Option[String] =
      curId.get(c).filter(_ >= 0).flatMap(fileById.get)
    def walk(p: Pred): Pred = p match {
      case Cmp(op, c, v) => resolve(c).map(Cmp(op, _, v)).getOrElse(Opaque)
      case InSet(c, vs) => resolve(c).map(InSet(_, vs)).getOrElse(Opaque)
      case NullCheck(c, b) =>
        resolve(c).map(NullCheck(_, b)).getOrElse(Opaque)
      case AndP(a, b) => AndP(walk(a), walk(b))
      case OrP(a, b) => OrP(walk(a), walk(b))
      case Opaque => Opaque
    }
    walk(p)
  }

  // ---- value canonicalization ----------------------------------------

  /** Canonical comparable for a Scala-side value of a given column type:
    * BigDecimal for numerics/date/timestamp (date → epoch day,
    * timestamp → epoch micros), String for strings, Boolean for bools.
    */
  def canonical(value: Any, dt: DataType): Option[Any] = (value, dt) match {
    case (null, _) => None
    // catalyst-internal representations (ColumnNode literals may carry them)
    case (v: Long, TimestampType | TimestampNTZType) => Some(BigDecimal(v))
    case (v: Int, DateType) => Some(BigDecimal(v))
    case (v: org.apache.spark.unsafe.types.UTF8String, StringType) =>
      Some(v.toString)
    // Non-finite floats have no BigDecimal form — treat as "can't
    // canonicalize" (no pruning) instead of throwing: merge/DML now
    // synthesize literals from DATA (source key min/max), so NaN keys
    // must degrade to a full scan, not abort the operation.
    case (v: java.lang.Double, _: NumericType)
        if v.isNaN || v.isInfinite => None
    case (v: java.lang.Float, _: NumericType)
        if v.isNaN || v.isInfinite => None
    case (v: Number, _: NumericType) => Some(BigDecimal(v.toString))
    case (v: java.math.BigDecimal, _) => Some(BigDecimal(v))
    case (v: String, StringType) => Some(v)
    case (v: java.sql.Date, DateType) => Some(BigDecimal(v.toLocalDate.toEpochDay))
    case (v: LocalDate, DateType) => Some(BigDecimal(v.toEpochDay))
    case (v: java.sql.Timestamp, TimestampType | TimestampNTZType) =>
      Some(BigDecimal(v.getTime / 1000L * 1000000L + v.getNanos / 1000L))
    case (v: Instant, TimestampType | TimestampNTZType) =>
      Some(BigDecimal(v.getEpochSecond * 1000000L + v.getNano / 1000L))
    case (v: java.time.LocalDateTime, TimestampType | TimestampNTZType) =>
      val i = v.toInstant(ZoneOffset.UTC)
      Some(BigDecimal(i.getEpochSecond * 1000000L + i.getNano / 1000L))
    case (v: Boolean, BooleanType) => Some(v)
    case _ => None
  }

  /** Parse a canonical stats/partition string back to a comparable. */
  def parseCanonical(s: String, dt: DataType): Option[Any] = dt match {
    case _: NumericType | DateType | TimestampType | TimestampNTZType =>
      try Some(BigDecimal(s)) catch { case _: NumberFormatException => None }
    case StringType => Some(s)
    case BooleanType => Some(s.toBoolean)
    case _ => None
  }

  @annotation.nowarn("cat=other-match-analysis")
  private def lessThan(a: Any, b: Any): Boolean = (a, b) match {
    case (x: BigDecimal, y: BigDecimal) => x < y
    case (x: String, y: String) => x < y
    case (x: Boolean, y: Boolean) => !x && y
  }

  // ---- transform-aware value mapping ---------------------------------

  private def toLocalDate(canon: BigDecimal, dt: DataType): Option[LocalDate] =
    toUtcDateTime(canon, dt).map(_.toLocalDate)

  private val monthFmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM")
  private val dayFmt = java.time.format.DateTimeFormatter.ISO_LOCAL_DATE
  private val hourFmt =
    java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd-HH")

  private def toUtcDateTime(canon: BigDecimal, dt: DataType)
      : Option[java.time.LocalDateTime] = dt match {
    case TimestampType | TimestampNTZType =>
      Some(Instant.ofEpochSecond(
        Math.floorDiv(canon.toLong, 1000000L),
        Math.floorMod(canon.toLong, 1000000L) * 1000L)
        .atZone(ZoneOffset.UTC).toLocalDateTime)
    case DateType =>
      Some(LocalDate.ofEpochDay(canon.toLong).atStartOfDay)
    case _ => None
  }

  /** Map a canonical source value through a transform into the partition
    * value domain (as a comparable), preserving order for time-based
    * transforms so range predicates prune.
    */
  def applyTransform(tf: String, canon: Any, srcType: DataType,
      rawValue: Any): Option[Any] = tf match {
    case "identity" => Some(canon)
    case "year" => canon match {
      case d: BigDecimal => toLocalDate(d, srcType).map(ld => BigDecimal(ld.getYear))
      case _ => None
    }
    case "month" => canon match {
      case d: BigDecimal => toLocalDate(d, srcType).map(_.format(monthFmt))
      case _ => None
    }
    case "day" => canon match {
      case d: BigDecimal => toLocalDate(d, srcType).map(_.format(dayFmt))
      case _ => None
    }
    case "hour" => canon match {
      case d: BigDecimal => toUtcDateTime(d, srcType).map(_.format(hourFmt))
      case _ => None
    }
    case Bucket(n) =>
      // Exact parity with the write side: evaluate Spark's own
      // Murmur3Hash on the literal.
      try {
        val lit = Literal.create(
          CatalystTypeConverters.convertToCatalyst(rawValue), srcType)
        val h = new Murmur3Hash(Seq(lit)).eval(null).asInstanceOf[Int]
        Some(BigDecimal(Math.floorMod(h, n.toInt)))
      } catch { case _: Exception => None }
    case Truncate(w) => canon match {
      case s: String => Some(s.take(w.toInt))
      case d: BigDecimal =>
        Some(d - BigDecimal(Math.floorMod(d.toLong, w.toLong)))
      case _ => None
    }
    case _ => None
  }

  /** Parse the partition value string recorded in the manifest into the
    * partition-domain comparable for `tf` over `srcType`.
    */
  def parsePartitionValue(tf: String, s: String, srcType: DataType): Option[Any] =
    tf match {
      case "identity" => srcType match {
        case StringType => Some(s)
        case DateType =>
          try Some(BigDecimal(LocalDate.parse(s).toEpochDay))
          catch { case _: Exception => parseCanonical(s, DateType) }
        case TimestampType | TimestampNTZType =>
          // Partition strings are rendered in the UTC session zone with
          // up to µs precision; Timestamp.valueOf would reinterpret them
          // in the JVM-default zone and truncate to ms.
          try {
            val ldt = java.time.LocalDateTime.parse(s.replace(" ", "T"))
            val inst = ldt.toInstant(ZoneOffset.UTC)
            Some(BigDecimal(inst.getEpochSecond * 1000000L + inst.getNano / 1000L))
          } catch { case _: Exception => parseCanonical(s, srcType) }
        case dt => parseCanonical(s, dt)
      }
      case "month" | "day" | "hour" => Some(s)
      case Truncate(_) if srcType == StringType => Some(s)
      case _ => // year, bucket, numeric truncate → numeric domain
        try Some(BigDecimal(s)) catch { case _: Exception => None }
    }

  // ---- file-level evaluation -----------------------------------------

  /** Could any row of `file` satisfy `pred`? Conservative (true on any
    * doubt). Uses (a) the file's partition tuple through its own spec —
    * evolved specs prune per-file with per-file semantics (`sql:193-209`)
    * — and (b) per-column min/max stats.
    */
  def mightMatch(pred: Pred, file: DataFileEntry, schema: StructType,
      spec: PartitionSpec): Boolean = pred match {
    case Opaque => true
    case AndP(a, b) =>
      mightMatch(a, file, schema, spec) && mightMatch(b, file, schema, spec)
    case OrP(a, b) =>
      mightMatch(a, file, schema, spec) || mightMatch(b, file, schema, spec)
    case NullCheck(c, wantNull) =>
      file.stats.get(c) match {
        case Some(st) if wantNull => st.nullCount > 0 || file.recordCount == 0
        case Some(st) if !wantNull => st.nullCount < file.recordCount
        case _ => true
      }
    case InSet(c, vs) =>
      vs.exists(v => mightMatch(Cmp("=", c, v), file, schema, spec))
    case Cmp(op, c, raw) =>
      val dt = schema.fields.find(_.name == c).map(_.dataType)
      if (dt.isEmpty) return true
      val canon = canonical(raw, dt.get)
      if (canon.isEmpty) return true
      partitionAllows(op, c, canon.get, raw, dt.get, file, spec) &&
        statsAllow(op, c, canon.get, dt.get, file)
  }

  private def partitionAllows(op: String, c: String, canon: Any, raw: Any,
      dt: DataType, file: DataFileEntry, spec: PartitionSpec): Boolean = {
    spec.fields.filter(_.source == c).forall { pf =>
      val partStr = file.partition.get(pf.name)
      if (partStr.isEmpty || partStr.contains("__HIVE_DEFAULT_PARTITION__"))
        return true
      (applyTransform(pf.transform, canon, dt, raw),
       parsePartitionValue(pf.transform, partStr.get, dt)) match {
        case (Some(pv), Some(fv)) =>
          val rangeCapable = pf.transform match {
            case Bucket(_) => false
            case _ => true
          }
          op match {
            case "=" => pv == fv
            // For order ops the partition value is the *floor* of the
            // source range, so: col > v possible iff floor(file) >= floor(v).
            case ">" | ">=" if rangeCapable => !lessThan(fv, pv) || fv == pv
            case "<" if rangeCapable => lessThan(fv, pv) || fv == pv
            case "<=" if rangeCapable => lessThan(fv, pv) || fv == pv
            case _ => true
          }
        case _ => true
      }
    }
  }

  private def statsAllow(op: String, c: String, canon: Any, dt: DataType,
      file: DataFileEntry): Boolean = {
    file.stats.get(c) match {
      case None => true
      case Some(st) =>
        val mn = st.min.flatMap(parseCanonical(_, dt))
        val mx = st.max.flatMap(parseCanonical(_, dt))
        op match {
          case "=" =>
            mn.forall(m => !lessThan(canon, m)) &&
              mx.forall(m => !lessThan(m, canon))
          case ">" => mx.forall(m => lessThan(canon, m))
          case ">=" => mx.forall(m => !lessThan(m, canon))
          case "<" => mn.forall(m => lessThan(m, canon))
          case "<=" => mn.forall(m => !lessThan(canon, m))
          case _ => true
        }
    }
  }
}
