package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Testdata schema-drift canary.
  *
  * The driver regenerates /root/testdata between rounds and has changed
  * physical types before (events.ts went INT64-nanos → timestamp[us],
  * silently erroring 10 correctness gates). This spec pins the LOGICAL
  * schema every query assumes after `Tables` normalization, plus the
  * set of physical `ts` encodings `Tables.events`/`EventOps` can
  * dispatch on — so the next regen fails ONE NAMED TEST loudly instead
  * of dropping gates from the correctness record.
  */
class TestdataSchemaSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  // normalized (post-Tables) logical schema each gate depends on
  private val expected: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Seq("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Seq("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Seq("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> Seq("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType),
    "lineitem" -> Seq("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType),
    "events" -> Seq("event_id" -> LongType, "ts" -> TimestampNTZType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "documents" -> Seq("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Seq("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType), "label" -> IntegerType))

  test("Tables.names covers exactly the pinned tables") {
    assert(Tables.names.toSet == expected.keySet)
  }

  for (name <- Tables.names) {
    test(s"testdata canary: $name normalized schema is unchanged") {
      val got = Tables(spark, sf, name).schema
        .map(f => f.name -> f.dataType)
      assert(got == expected(name),
        s"""SCHEMA DRIFT in $name.parquet — the driver regenerated testdata
           |with different types. Got:      $got
           |Expected:                       ${expected(name)}
           |Update Tables normalization (Tables.scala) and this canary
           |together; check every gate that reads $name.""".stripMargin)
    }
  }

  test("testdata canary: raw events.ts encoding is dispatchable") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sf/events.parquet").schema("ts").dataType
    assert(Seq(LongType, TimestampNTZType, TimestampType).contains(raw),
      s"events.ts physical type $raw has no dispatch arm in Tables.eventsDf/" +
        "EventOps.eventStream — add one before any gate can run.")
  }

  test("testdata canary: all scale factors share the events encoding") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val types = Seq("sf0.001", "sf0.01", "sf0.1").map { s =>
      s -> spark.read.parquet(s"/root/testdata/$s/events.parquet")
        .schema("ts").dataType
    }
    assert(types.map(_._2).distinct.size == 1,
      s"events.ts diverges across scale factors: $types")
  }
}
