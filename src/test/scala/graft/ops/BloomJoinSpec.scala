package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class BloomJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("bloom-pruned join equals the plain join exactly") {
    val fact = graft.Tables.lineitem(spark, sf).select("l_partkey", "l_quantity")
    val dim = graft.Tables.part(spark, sf).where(col("p_size") === 15)
      .select("p_partkey", "p_brand")
    val pruned = BloomJoin.join(fact, dim, "l_partkey", "p_partkey")
      .groupBy("p_brand").agg(count(lit(1)).alias("cnt"))
    val plain = fact.join(dim, col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand").agg(count(lit(1)).alias("cnt"))
    assert(pruned.exceptAll(plain).count() == 0 &&
      plain.exceptAll(pruned).count() == 0)
  }

  test("no false negatives: every dim key passes its own filter") {
    val dim = (1L to 5000L).toDF("k")
    val f = BloomJoin.build(dim, "k", bitsPerKey = 16, k = 7)
    assert(BloomJoin.prefilter(dim, "k", f).count() == 5000)
  }

  test("prefilter prunes most non-matching fact rows (fpp-bounded)") {
    val dim = (1L to 1000L).toDF("k")
    val fact = (100001L to 200000L).toDF("k") // zero true matches
    val f = BloomJoin.build(dim, "k", bitsPerKey = 16, k = 7)
    val survivors = BloomJoin.prefilter(fact, "k", f).count()
    // fpp at 16 bits/key, k=7 is ~1%; allow generous slack
    assert(survivors < 5000, s"bloom pruned too little: $survivors of 100000")
  }

  test("int fact key probes a bigint-built filter without false negatives") {
    val dim = (1L to 3000L).toDF("k") // bigint build side
    val factInt = (1 to 3000).toDF("k") // int probe side
    val f = BloomJoin.build(dim, "k", bitsPerKey = 16, k = 7)
    assert(BloomJoin.prefilter(factInt, "k", f).count() == 3000)
  }

  test("non-normalizable type mismatch is rejected, not silently empty") {
    val dim = (1L to 100L).toDF("k")
    val factStr = (1 to 100).map(_.toString).toDF("k")
    val f = BloomJoin.build(dim, "k")
    assertThrows[IllegalArgumentException] {
      BloomJoin.prefilter(factStr, "k", f).count()
    }
  }

  test("broadcast probe path selects the same rows as the literal path") {
    val dim = (1L to 2000L).toDF("k")
    val fact = (1L to 50000L).toDF("k")
    val f = BloomJoin.build(dim, "k", bitsPerKey = 16, k = 7)
    val lit = BloomJoin.prefilter(fact, "k", f).collect().map(_.getLong(0)).sorted
    val bc = BloomJoin.prefilter(fact, "k", f, literalBitsMax = 0)
      .collect().map(_.getLong(0)).sorted
    assert(lit.sameElements(bc), "broadcast and literal probes disagree")
  }

  test("repeated large-filter probes reuse one broadcast; destroy releases it") {
    val dim = (1L to 2000L).toDF("k")
    val fact = (1L to 10000L).toDF("k")
    val f = BloomJoin.build(dim, "k", bitsPerKey = 16, k = 7)
    val n1 = BloomJoin.prefilter(fact, "k", f, literalBitsMax = 0).count()
    val first = f.bcVar
    assert(first != null, "large-filter probe did not create a broadcast")
    val n2 = BloomJoin.prefilter(fact, "k", f, literalBitsMax = 0).count()
    assert(n1 == n2)
    assert(f.bcVar eq first, "second probe created a fresh broadcast instead of reusing")
    f.destroy()
    assert(f.bcVar == null)
  }
}
