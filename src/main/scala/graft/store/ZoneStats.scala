package graft.store

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.net.{URLDecoder, URLEncoder}

/** One column's zone map in a file manifest entry: [min,max] as stored
  * strings plus whether the file holds ANY null in the column —
  * `hasNulls=false` lets prune-carry skip a file entirely (no hidden
  * placeholder rows) and lets `IsNull` predicates skip it at scan
  * time. Entries parsed from logs written before the flag existed
  * default to `true` (conservative: maybe-nulls). */
final case class ColStat(min: String, max: String, hasNulls: Boolean = true)

/** Per-file column zone maps (Delta "data skipping" stats analog).
  *
  * A commit manifest already records each file's key-hash [min,max];
  * this module adds [min,max] for a configurable prefix of the table's
  * data columns, read from the same parquet footer the key-hash stats
  * come from — zero extra I/O per commit. Readers evaluate pushed-down
  * `dataFilters` against the per-file ranges driver-side and skip files
  * a predicate provably cannot match, which is what makes a filtered
  * snapshot of a 100 TB table with ingest-time-correlated predicates
  * (date ranges, monotonic ids) read a handful of files instead of a
  * bucket's full history.
  *
  * Stats are stored as strings in the commit JSON; [[parse]] rebuilds
  * the Catalyst-internal value from the column's Spark type. Any
  * mismatch (evolved type, exotic physical encoding like INT96
  * timestamps) parses to None and the file is simply not skippable —
  * pruning is always a pure optimization, never load-bearing.
  */
private[graft] object ZoneStats {

  /** Columns eligible for zone maps: atomic orderable types whose
    * parquet physical stats we can decode confidently. */
  def eligible(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | FloatType |
         DoubleType | StringType | DateType | TimestampType => true
    case _ => false
  }

  /** Longest string min/max kept. Parquet footers hold full values for
    * our file sizes; the cap bounds manifest growth on text columns. A
    * value above the cap drops the column's stat for that file (a
    * TRUNCATED max would be an unsound upper bound). */
  val MaxStringLen = 64

  // --- footer extraction ----------------------------------------------------

  /** Decoded (min, max) of one parquet column chunk, None when the
    * footer carries no usable stats or the physical type surprises.
    * `logical` is the column's parquet logical-type annotation: for
    * timestamps the stored LONG is only comparable to Catalyst micros
    * when the unit IS micros — a TIMESTAMP_MILLIS file's stats would
    * otherwise silently mis-prune by 1000×. */
  def fromChunk(dt: DataType,
      st: org.apache.parquet.column.statistics.Statistics[_],
      logical: org.apache.parquet.schema.LogicalTypeAnnotation = null): Option[(Any, Any)] = {
    if (st == null || !st.hasNonNullValue) return None
    dt match {
      case TimestampType =>
        logical match {
          case t: org.apache.parquet.schema.LogicalTypeAnnotation.TimestampLogicalTypeAnnotation
            if t.getUnit == org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit.MICROS => // ok
          case _ => return None // INT96 or non-micros units: not comparable
        }
      case _ =>
    }
    try {
      def asLong(v: Any): Long = v match {
        case l: java.lang.Long => l.longValue()
        case i: java.lang.Integer => i.longValue()
        case _ => throw new IllegalArgumentException
      }
      dt match {
        case ByteType =>
          Some((st.genericGetMin.asInstanceOf[java.lang.Integer].byteValue(),
            st.genericGetMax.asInstanceOf[java.lang.Integer].byteValue()))
        case ShortType =>
          Some((st.genericGetMin.asInstanceOf[java.lang.Integer].shortValue(),
            st.genericGetMax.asInstanceOf[java.lang.Integer].shortValue()))
        case IntegerType | DateType =>
          Some((st.genericGetMin.asInstanceOf[java.lang.Integer].intValue(),
            st.genericGetMax.asInstanceOf[java.lang.Integer].intValue()))
        case LongType | TimestampType =>
          Some((asLong(st.genericGetMin), asLong(st.genericGetMax)))
        case FloatType =>
          fpRange(st.genericGetMin.asInstanceOf[java.lang.Float].floatValue().toDouble,
            st.genericGetMax.asInstanceOf[java.lang.Float].floatValue().toDouble)
            .map { case (mn, mx) => (mn.toFloat, mx.toFloat) }
        case DoubleType =>
          fpRange(st.genericGetMin.asInstanceOf[java.lang.Double].doubleValue(),
            st.genericGetMax.asInstanceOf[java.lang.Double].doubleValue())
        case StringType =>
          val mn = st.genericGetMin.asInstanceOf[org.apache.parquet.io.api.Binary]
            .toStringUsingUTF8
          val mx = st.genericGetMax.asInstanceOf[org.apache.parquet.io.api.Binary]
            .toStringUsingUTF8
          if (mn.length > MaxStringLen || mx.length > MaxStringLen) None
          else Some((UTF8String.fromString(mn), UTF8String.fromString(mx)))
        case _ => None
      }
    } catch { case _: Exception => None }
  }

  /** Floating-point zone bounds need two guards before they are safe to
    * prune with: NaN-poisoned min/max (older parquet writers fold NaN
    * into stats) make the range meaningless — treat as no stats; and
    * the interpreted ordering ranks -0.0 < 0.0 while SQL comparison
    * treats them equal, so a min=max=-0.0 file would be pruned for
    * `col = 0.0` even though the row matches — widen a zero min to
    * -0.0 and a zero max to +0.0 so both representations stay inside
    * the range (mirrors Delta's handling). */
  private def fpRange(mn: Double, mx: Double): Option[(Double, Double)] =
    if (mn.isNaN || mx.isNaN) None
    else Some((if (mn == 0.0d) -0.0d else mn, if (mx == 0.0d) 0.0d else mx))

  /** Stored string min/max back to a typed range, with the float/double
    * guards applied — ALL pruning paths must come through here rather
    * than pairing [[parse]] calls, or NaN/±0.0 edge cases over-prune. */
  def parseRange(dt: DataType, min: String, max: String): Option[(Any, Any)] =
    for {
      lo <- parse(dt, min)
      hi <- parse(dt, max)
      r <- dt match {
        case FloatType =>
          fpRange(lo.asInstanceOf[Float].toDouble, hi.asInstanceOf[Float].toDouble)
            .map { case (a, b) => (a.toFloat: Any, b.toFloat: Any) }
        case DoubleType =>
          fpRange(lo.asInstanceOf[Double], hi.asInstanceOf[Double])
            .map { case (a, b) => (a: Any, b: Any) }
        case _ => Some((lo, hi))
      }
    } yield r

  /** Catalyst ordering for a stat type (stats hold Catalyst-internal
    * values: Int for dates, Long for timestamp micros, UTF8String). */
  def ordering(dt: DataType): Ordering[Any] =
    org.apache.spark.sql.catalyst.util.TypeUtils.getInterpretedOrdering(dt)

  /** Merge two chunk ranges (across a file's row groups). */
  def merge(dt: DataType, a: (Any, Any), b: (Any, Any)): (Any, Any) = {
    val ord = ordering(dt)
    (ord.min(a._1, b._1), ord.max(a._2, b._2))
  }

  // --- string encode/decode for the commit JSON -----------------------------

  private def enc(s: String): String = URLEncoder.encode(s, "UTF-8")
  private def dec(s: String): String = URLDecoder.decode(s, "UTF-8")

  /** Catalyst-internal stat value to its stored string form. */
  def stringify(v: Any): String = v match {
    case u: UTF8String => u.toString
    case other => other.toString
  }

  /** `col=min~max~n;col=min~max~n` (n: 0 = provably no nulls, 1 =
    * has/maybe nulls) with URL-encoded names/values. The raw separators
    * stay out of the encoded parts (URLEncoder escapes `~`, `;`, `=`)
    * and out of the commit log's own delimiters — entries are
    * pipe-split and the files array is comma-split, so the blob must
    * never contain `|`, `,` or `"`. */
  def encode(stats: Map[String, ColStat]): String =
    stats.toSeq.sortBy(_._1).map { case (c, st) =>
      s"${enc(c)}=${enc(st.min)}~${enc(st.max)}~${if (st.hasNulls) "1" else "0"}"
    }.mkString(";")

  def decode(s: String): Map[String, ColStat] =
    if (s == null || s.isEmpty) Map.empty
    else s.split(';').iterator.flatMap { kv =>
      val eq = kv.indexOf('=')
      if (eq < 0) None
      else {
        val c = dec(kv.substring(0, eq))
        val parts = kv.substring(eq + 1).split('~')
        if (parts.length == 3)
          Some(c -> ColStat(dec(parts(0)), dec(parts(1)), parts(2) == "1"))
        else if (parts.length == 2) // pre-null-flag log entries
          Some(c -> ColStat(dec(parts(0)), dec(parts(1))))
        else None
      }
    }.toMap

  /** External (collect()-shaped) value to the Catalyst-internal form
    * [[parse]] produces — so staged pruned-column values compare
    * directly against decoded file ranges. */
  def toInternal(dt: DataType, v: Any): Option[Any] = (dt, v) match {
    case (_, null) => None
    case (StringType, s: String) => Some(UTF8String.fromString(s))
    case (DateType, d: java.sql.Date) => Some(d.toLocalDate.toEpochDay.toInt)
    case (DateType, d: java.time.LocalDate) => Some(d.toEpochDay.toInt)
    case (TimestampType, t: java.sql.Timestamp) =>
      Some(t.getTime * 1000L + (t.getNanos % 1000000L) / 1000L)
    case (TimestampType, t: java.time.Instant) =>
      Some(t.getEpochSecond * 1000000L + t.getNano / 1000L)
    case (ByteType, x: java.lang.Byte) => Some(x.byteValue)
    case (ShortType, x: java.lang.Short) => Some(x.shortValue)
    case (IntegerType, x: java.lang.Integer) => Some(x.intValue)
    case (LongType, x: java.lang.Long) => Some(x.longValue)
    case (FloatType, x: java.lang.Float) => Some(x.floatValue)
    case (DoubleType, x: java.lang.Double) => Some(x.doubleValue)
    case _ => None
  }

  /** Stored string back to the Catalyst-internal value for `dt`; None
    * when the string no longer parses under an evolved type. */
  def parse(dt: DataType, s: String): Option[Any] =
    try dt match {
      case ByteType => Some(s.toByte)
      case ShortType => Some(s.toShort)
      case IntegerType | DateType => Some(s.toInt)
      case LongType | TimestampType => Some(s.toLong)
      case FloatType => Some(s.toFloat)
      case DoubleType => Some(s.toDouble)
      case StringType => Some(UTF8String.fromString(s))
      case _ => None
    } catch { case _: Exception => None }

  // --- pruning --------------------------------------------------------------

  /** True when a file whose column ranges are `statsOf(col)` may hold a
    * row matching `pred`. Conservative: anything not understood keeps
    * the file. `statsOf` returns typed (min, max) for columns with
    * stats in THIS file; names resolve case-insensitively (Spark's
    * default resolver). Null semantics: parquet min/max describe
    * non-null values only, and every supported comparison is
    * null-rejecting, so range-based exclusion is sound even for files
    * that also hold nulls. */
  def mayMatch(pred: Expression, dataTypeOf: String => Option[DataType],
      statsOf: String => Option[(Any, Any)],
      nullsOf: String => Option[Boolean] = _ => None): Boolean =
    try mayMatch0(pred, dataTypeOf, statsOf, nullsOf)
    catch { case _: Exception => true } // a comparison surprise keeps the file

  private def mayMatch0(pred: Expression, dataTypeOf: String => Option[DataType],
      statsOf: String => Option[(Any, Any)],
      nullsOf: String => Option[Boolean]): Boolean = {
    def mayMatch(p: Expression, d: String => Option[DataType],
        s: String => Option[(Any, Any)]): Boolean = mayMatch0(p, d, s, nullsOf)

    def attrName(e: Expression): Option[String] = e match {
      case a: Attribute => Some(a.name)
      case _ => None
    }

    // (name, dt, literal value in dt's internal form) for
    // `attr <op> constant` shapes, either operand order. Catalyst's
    // dataFilters arrive constant-folded to Literal; un-analyzed
    // predicates (deleteWhere) may carry foldable trees like
    // Cast(Literal) — evaluate those here, conservatively bailing on
    // anything that doesn't resolve to the column's exact type.
    def constVal(e: Expression): Option[(Any, DataType)] = e match {
      case Literal(v, dt) => if (v != null) Some((v, dt)) else None
      case _ if e.resolved && e.foldable =>
        try Option(e.eval(null)).map(v => (v, e.dataType))
        catch { case _: Exception => None }
      case _ => None
    }
    def colLit(l: Expression, r: Expression): Option[(String, DataType, Any)] =
      (attrName(l), constVal(r)) match {
        case (Some(n), Some((v, ldt))) =>
          dataTypeOf(n).collect { case dt if dt == ldt => (n, dt, v) }
        case _ => None
      }

    def range(n: String): Option[(Any, Any)] = statsOf(n)

    pred match {
      case And(l, r) => mayMatch(l, dataTypeOf, statsOf) && mayMatch(r, dataTypeOf, statsOf)
      case Or(l, r) => mayMatch(l, dataTypeOf, statsOf) || mayMatch(r, dataTypeOf, statsOf)
      case EqualTo(l, r) =>
        colLit(l, r).orElse(colLit(r, l)).flatMap { case (n, dt, v) =>
          range(n).map { case (mn, mx) =>
            val ord = ordering(dt); ord.lteq(mn, v) && ord.lteq(v, mx) }
        }.getOrElse(true)
      case EqualNullSafe(l, r) =>
        colLit(l, r).orElse(colLit(r, l)).flatMap { case (n, dt, v) =>
          range(n).map { case (mn, mx) =>
            val ord = ordering(dt); ord.lteq(mn, v) && ord.lteq(v, mx) }
        }.getOrElse(true)
      case LessThan(l, r) =>
        colLit(l, r).flatMap { case (n, dt, v) =>                // attr < lit
          range(n).map { case (mn, _) => ordering(dt).lt(mn, v) }
        }.orElse(colLit(r, l).flatMap { case (n, dt, v) =>       // lit < attr
          range(n).map { case (_, mx) => ordering(dt).lt(v, mx) }
        }).getOrElse(true)
      case LessThanOrEqual(l, r) =>
        colLit(l, r).flatMap { case (n, dt, v) =>
          range(n).map { case (mn, _) => ordering(dt).lteq(mn, v) }
        }.orElse(colLit(r, l).flatMap { case (n, dt, v) =>
          range(n).map { case (_, mx) => ordering(dt).lteq(v, mx) }
        }).getOrElse(true)
      case GreaterThan(l, r) =>
        colLit(l, r).flatMap { case (n, dt, v) =>                // attr > lit
          range(n).map { case (_, mx) => ordering(dt).gt(mx, v) }
        }.orElse(colLit(r, l).flatMap { case (n, dt, v) =>       // lit > attr
          range(n).map { case (mn, _) => ordering(dt).gt(v, mn) }
        }).getOrElse(true)
      case GreaterThanOrEqual(l, r) =>
        colLit(l, r).flatMap { case (n, dt, v) =>
          range(n).map { case (_, mx) => ordering(dt).gteq(mx, v) }
        }.orElse(colLit(r, l).flatMap { case (n, dt, v) =>
          range(n).map { case (mn, _) => ordering(dt).gteq(v, mn) }
        }).getOrElse(true)
      case In(a, list) if list.nonEmpty && list.forall(_.isInstanceOf[Literal]) =>
        attrName(a).flatMap { n =>
          dataTypeOf(n).flatMap { dt =>
            range(n).map { case (mn, mx) =>
              val ord = ordering(dt)
              list.exists {
                case Literal(v, ldt) if ldt == dt && v != null =>
                  ord.lteq(mn, v) && ord.lteq(v, mx)
                case _ => true // un-comparable member: can't exclude
              }
            }
          }
        }.getOrElse(true)
      case InSet(a, vs) if vs.nonEmpty =>
        attrName(a).flatMap { n =>
          dataTypeOf(n).flatMap { dt =>
            range(n).map { case (mn, mx) =>
              val ord = ordering(dt)
              vs.exists(v => v != null && ord.lteq(mn, v) && ord.lteq(v, mx))
            }
          }
        }.getOrElse(true)
      case StartsWith(a, Literal(p: UTF8String, StringType)) if p != null =>
        attrName(a).flatMap(range).map { case (mn, mx) =>
          val ord = ordering(StringType)
          // overlap of [mn,mx] with [p, p∞): some value ≥ p exists and
          // the low end doesn't already exceed every p-prefixed string
          ord.gteq(mx, p) &&
            (ord.lteq(mn, p) || mn.asInstanceOf[UTF8String].startsWith(p) ||
              ord.lt(mn, p))
        }.getOrElse(true)
      case IsNull(a) => // a file with provably no nulls can't satisfy IS NULL
        attrName(a).flatMap(nullsOf).getOrElse(true)
      case IsNotNull(_) => true
      case Not(EqualTo(l, r)) =>
        // skip only a constant file: min == max == v
        colLit(l, r).orElse(colLit(r, l)).flatMap { case (n, dt, v) =>
          range(n).map { case (mn, mx) =>
            val ord = ordering(dt)
            !(ord.equiv(mn, mx) && ord.equiv(mn, v)) }
        }.getOrElse(true)
      case _ => true
    }
  }
}
