package graft.store

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for the zone-map codec and range evaluator — the
  * pieces every skipping decision rests on. */
class ZoneStatsSpec extends AnyFunSuite {

  test("encode/decode round-trips delimiter-laden names and values") {
    val stats = Map(
      "a|b" -> ColStat("x~y", "z;w", hasNulls = false),
      "c,d" -> ColStat("\"q\"", "=%~", hasNulls = true),
      "날짜" -> ColStat("-12", "34", hasNulls = false))
    val enc = ZoneStats.encode(stats)
    assert(!enc.exists(ch => ch == '|' || ch == ',' || ch == '"'),
      s"log-breaking delimiter leaked into: $enc")
    assert(ZoneStats.decode(enc) == stats)
    assert(ZoneStats.decode("") == Map.empty[String, ColStat])
  }

  test("legacy 2-field entries decode as maybe-nulls (conservative)") {
    // a round-5-era log entry without the null flag
    val legacy = "day=1~5"
    val got = ZoneStats.decode(legacy)
    assert(got == Map("day" -> ColStat("1", "5", hasNulls = true)))
  }

  test("parse produces exact internal types per Spark type") {
    assert(ZoneStats.parse(ByteType, "7").get.isInstanceOf[Byte])
    assert(ZoneStats.parse(ShortType, "7").get.isInstanceOf[Short])
    assert(ZoneStats.parse(IntegerType, "7").get.isInstanceOf[Int])
    assert(ZoneStats.parse(DateType, "19000").get.isInstanceOf[Int])
    assert(ZoneStats.parse(LongType, "7").get.isInstanceOf[Long])
    assert(ZoneStats.parse(TimestampType, "7").get.isInstanceOf[Long])
    assert(ZoneStats.parse(FloatType, "1.5").get.isInstanceOf[Float])
    assert(ZoneStats.parse(DoubleType, "1.5").get.isInstanceOf[Double])
    assert(ZoneStats.parse(StringType, "s").get.isInstanceOf[UTF8String])
    assert(ZoneStats.parse(IntegerType, "oops").isEmpty)
    assert(ZoneStats.parse(BinaryType, "x").isEmpty)
  }

  test("mayMatch range logic: inclusion, exclusion, conservatism") {
    val attr = AttributeReference("x", IntegerType)()
    def run(pred: Expression, lo: Int, hi: Int): Boolean =
      ZoneStats.mayMatch(pred,
        n => if (n == "x") Some(IntegerType) else None,
        n => if (n == "x") Some((lo, hi)) else None)
    assert(run(EqualTo(attr, Literal(5)), 1, 10))
    assert(!run(EqualTo(attr, Literal(11)), 1, 10))
    assert(!run(LessThan(attr, Literal(1)), 1, 10))
    assert(run(LessThanOrEqual(attr, Literal(1)), 1, 10))
    assert(!run(GreaterThan(attr, Literal(10)), 1, 10))
    assert(run(GreaterThanOrEqual(attr, Literal(10)), 1, 10))
    assert(run(In(attr, Seq(Literal(0), Literal(3))), 1, 10))
    assert(!run(In(attr, Seq(Literal(0), Literal(11))), 1, 10))
    assert(!run(And(EqualTo(attr, Literal(5)), EqualTo(attr, Literal(11))), 1, 10))
    assert(run(Or(EqualTo(attr, Literal(11)), EqualTo(attr, Literal(5))), 1, 10))
    // constant file: x != c prunable only when min == max == c
    assert(!run(Not(EqualTo(attr, Literal(4))), 4, 4))
    assert(run(Not(EqualTo(attr, Literal(9))), 4, 4))
    // unknown column / unsupported shape: conservative keep
    val other = AttributeReference("y", IntegerType)()
    assert(run(EqualTo(other, Literal(999)), 1, 10))
    assert(run(EqualTo(Add(attr, Literal(1)), Literal(999)), 1, 10))
    // type mismatch between literal and column: keep
    assert(run(EqualTo(attr, Literal(999L)), 1, 10))
  }

  test("mayMatch IsNull uses the null flag; foldable casts evaluate") {
    val attr = AttributeReference("x", IntegerType)()
    def run(pred: Expression, nulls: Option[Boolean]): Boolean =
      ZoneStats.mayMatch(pred,
        n => Some(IntegerType), n => Some((1, 10)), _ => nulls)
    assert(!run(IsNull(attr), Some(false)))
    assert(run(IsNull(attr), Some(true)))
    assert(run(IsNull(attr), None))
    // Cast(Literal) — the deleteWhere shape — folds to a comparable value
    val castPred = EqualTo(attr, Cast(Literal("11"), IntegerType))
    assert(!ZoneStats.mayMatch(castPred,
      n => Some(IntegerType), n => Some((1, 10))))
  }

  test("parseRange guards float edge cases: NaN poisons, ±0.0 widens") {
    // NaN-poisoned bounds (older parquet writers fold NaN into stats)
    // are meaningless for range pruning: no stats at all
    assert(ZoneStats.parseRange(DoubleType, "NaN", "5.0").isEmpty)
    assert(ZoneStats.parseRange(DoubleType, "1.0", "NaN").isEmpty)
    assert(ZoneStats.parseRange(FloatType, "NaN", "NaN").isEmpty)
    // ±0.0: interpreted ordering ranks -0.0 < 0.0 but SQL comparison
    // treats them equal — a min=max=-0.0 file must NOT be pruned for
    // `col = 0.0` (and vice versa), so zero bounds widen to [-0.0, 0.0]
    val attr = AttributeReference("x", DoubleType)()
    def keeps(statMin: String, statMax: String, v: Double): Boolean =
      ZoneStats.mayMatch(EqualTo(attr, Literal(v)),
        n => Some(DoubleType),
        n => ZoneStats.parseRange(DoubleType, statMin, statMax))
    assert(keeps("-0.0", "-0.0", 0.0), "min=max=-0.0 must keep col = 0.0")
    assert(keeps("0.0", "0.0", -0.0), "min=max=0.0 must keep col = -0.0")
    assert(!keeps("1.0", "2.0", 3.0), "real exclusion still prunes")
    // ordinary ranges pass through untouched
    assert(ZoneStats.parseRange(DoubleType, "1.5", "2.5").contains((1.5d, 2.5d)))
    assert(ZoneStats.parseRange(IntegerType, "1", "9").contains((1, 9)))
  }

  test("toInternal matches parse's internal forms") {
    assert(ZoneStats.toInternal(DateType,
      java.sql.Date.valueOf("2024-01-01")).get ==
      java.time.LocalDate.of(2024, 1, 1).toEpochDay.toInt)
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00.123456")
    assert(ZoneStats.toInternal(TimestampType, ts).get ==
      ts.getTime * 1000L + (ts.getNanos % 1000000L) / 1000L)
    assert(ZoneStats.toInternal(StringType, "s").get == UTF8String.fromString("s"))
    assert(ZoneStats.toInternal(IntegerType, null).isEmpty)
    assert(ZoneStats.toInternal(IntegerType, Int.box(3)).get == 3)
  }
}
