package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.store.{CommitLog, KeyedTable}

import java.nio.file.Files

/** Randomly GENERATED (deterministically seeded — never flaky) op waves
  * against an incremental join pipeline and an incremental agg pipeline
  * sharing a source: after every sequence of upserts, key-moves, and
  * deletes on both sides, the drained outputs must equal the batch
  * recompute over the final table snapshots. Broadens the crafted
  * StreamingSpec/IncrementalDrainSpec cases to arbitrary interleavings:
  * join-key churn, delete-then-reinsert, right-side deletes, stale
  * sequence numbers, multi-commit drains.
  */
class RandomizedEquivalenceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("geq").toString

  private def assertSameRows(got: DataFrame, want: DataFrame, ctx: String): Unit = {
    val cols = want.columns.sorted.toSeq
    val g = got.select(cols.map(col): _*)
    val w = want.select(cols.map(col): _*)
    val onlyGot = g.exceptAll(w).count()
    val onlyWant = w.exceptAll(g).count()
    assert(onlyGot == 0 && onlyWant == 0,
      s"$ctx: $onlyGot rows only incremental, $onlyWant only in batch recompute")
  }

  Seq(7, 23).foreach { seed =>
    test(s"random op waves through a CHAINED join->agg (seed $seed)") {
      val rnd = new scala.util.Random(seed)
      val root = tmp()
      val lSchema = Seq((1L, 1L, 1L, 0L)).toDF("id", "lkey", "cents", "seq").schema
      val rSchema = Seq((1L, "x", 0L)).toDF("rkey", "name", "rseq").schema
      val lT = KeyedTable.create(spark, s"$root/l", lSchema, Seq("id"),
        seqCols = Seq("seq"), numBuckets = 4)
      val rT = KeyedTable.create(spark, s"$root/r", rSchema, Seq("rkey"),
        seqCols = Seq("rseq"), numBuckets = 4)
      // stage 1 emits migration/delete retractions into the staged
      // table; stage 2's agg must retract them AND drop emptied groups
      val pipe = Stream.fromKeyedTable(lT).handleDeletes()
        .join(Stream.fromKeyedTable(rT).handleDeletes(), "inner")
        .on((l, r) => l("lkey") === r("rkey"))
        .groupByStaged(s"$root/stage", "name")
        .agg(sum(col("cents")).as("scents"), count(lit(1)).as("n"))
        .writeToPath(s"$root/chained")
      (1 to 6).foreach { wave =>
        val lRows = (1 to 20).map(_ => rnd.nextInt(30).toLong).distinct.map { i =>
          (i, rnd.nextInt(8).toLong, rnd.nextInt(10000).toLong, wave.toLong)
        }
        lT.upsert(lRows.toDF("id", "lkey", "cents", "seq"), uniqueKeys = true)
        // name churn makes GROUPS move too (the agg's group key is a
        // right-side attribute)
        val rRows = (1 to 5).map(_ => rnd.nextInt(8).toLong).distinct
          .map(k => (k, s"n${rnd.nextInt(4)}", wave.toLong))
        rT.upsert(rRows.toDF("rkey", "name", "rseq"), uniqueKeys = true)
        if (wave % 2 == 0)
          lT.delete((1 to 5).map(_ => rnd.nextInt(30).toLong).distinct.toDF("id"))
        if (wave % 3 == 0)
          rT.delete((1 to 2).map(_ => rnd.nextInt(8).toLong).distinct.toDF("rkey"))
        if (wave % 2 == 0 || wave == 6) pipe.runIncremental()
      }
      pipe.runIncremental()
      val want = lT.snapshot().join(rT.snapshot(),
          col("lkey") === col("rkey"), "inner")
        .groupBy("name")
        .agg(sum(col("cents")).as("scents"), count(lit(1)).as("n"))
      val got = KeyedTable.forPath(spark, s"$root/chained").snapshot()
        .select(want.columns.map(col).toSeq: _*)
      assertSameRows(got, want, s"seed $seed chained")
    }
  }

  Seq(3, 99).foreach { seed =>
    test(s"random op waves through a LEFT join with key moves (seed $seed)") {
      val rnd = new scala.util.Random(seed)
      val root = tmp()
      val lSchema = Seq((1L, 1L, 1L, 0L)).toDF("id", "lkey", "cents", "seq").schema
      val rSchema = Seq((1L, "x", 0L)).toDF("rkey", "name", "rseq").schema
      val lT = KeyedTable.create(spark, s"$root/l", lSchema, Seq("id"),
        seqCols = Seq("seq"), numBuckets = 4)
      val rT = KeyedTable.create(spark, s"$root/r", rSchema, Seq("rkey"),
        seqCols = Seq("rseq"), numBuckets = 4)
      val pipe = Stream.fromKeyedTable(lT)
        .join(Stream.fromKeyedTable(rT), "left")
        .on((l, r) => l("lkey") === r("rkey"))
        .writeToPath(s"$root/ljoined")
      rT.upsert((0L until 8L).map(k => (k, s"n$k", 0L)).toDF("rkey", "name", "rseq"),
        uniqueKeys = true)
      (1 to 6).foreach { wave =>
        // lkey ranges over [0,12): keys 8-11 never match — placeholder
        // rows — and moves cross the matched/unmatched boundary
        val lRows = (1 to 20).map(_ => rnd.nextInt(30).toLong).distinct.map { i =>
          (i, rnd.nextInt(12).toLong, rnd.nextInt(10000).toLong, wave.toLong)
        }
        lT.upsert(lRows.toDF("id", "lkey", "cents", "seq"), uniqueKeys = true)
        rT.upsert((1 to 4).map(_ => rnd.nextInt(8).toLong).distinct
          .map(k => (k, s"n$k-$wave", wave.toLong)).toDF("rkey", "name", "rseq"),
          uniqueKeys = true)
        if (wave % 2 == 0 || wave == 6) pipe.runIncremental()
      }
      pipe.runIncremental()
      val joined = KeyedTable.forPath(spark, s"$root/ljoined").snapshot()
      val want = lT.snapshot().join(rT.snapshot(),
          col("lkey") === col("rkey"), "left")
        .select(joined.columns.map(col).toSeq: _*)
      assertSameRows(joined, want, s"seed $seed left join")
    }
  }

  Seq(29).foreach { seed =>
    test(s"random op waves through a SUM-ONLY chained join->agg (hidden count, seed $seed)") {
      val rnd = new scala.util.Random(seed)
      val root = tmp()
      val lSchema = Seq((1L, 1L, 1L, 0L)).toDF("id", "lkey", "cents", "seq").schema
      val rSchema = Seq((1L, "x", 0L)).toDF("rkey", "name", "rseq").schema
      val lT = KeyedTable.create(spark, s"$root/l", lSchema, Seq("id"),
        seqCols = Seq("seq"), numBuckets = 4)
      val rT = KeyedTable.create(spark, s"$root/r", rSchema, Seq("rkey"),
        seqCols = Seq("rseq"), numBuckets = 4)
      // NO count column: emptied groups rely on the hidden internal one
      val pipe = Stream.fromKeyedTable(lT).handleDeletes()
        .join(Stream.fromKeyedTable(rT).handleDeletes(), "inner")
        .on((l, r) => l("lkey") === r("rkey"))
        .groupByStaged(s"$root/stage", "name")
        .agg(sum(col("cents")).as("scents"))
        .writeToPath(s"$root/chained")
      (1 to 6).foreach { wave =>
        val lRows = (1 to 20).map(_ => rnd.nextInt(30).toLong).distinct.map { i =>
          (i, rnd.nextInt(8).toLong, rnd.nextInt(10000).toLong, wave.toLong)
        }
        lT.upsert(lRows.toDF("id", "lkey", "cents", "seq"), uniqueKeys = true)
        val rRows = (1 to 5).map(_ => rnd.nextInt(8).toLong).distinct
          .map(k => (k, s"n${rnd.nextInt(4)}", wave.toLong))
        rT.upsert(rRows.toDF("rkey", "name", "rseq"), uniqueKeys = true)
        if (wave % 2 == 0)
          lT.delete((1 to 5).map(_ => rnd.nextInt(30).toLong).distinct.toDF("id"))
        if (wave % 3 == 0)
          rT.delete((1 to 2).map(_ => rnd.nextInt(8).toLong).distinct.toDF("rkey"))
        if (wave % 2 == 0 || wave == 6) pipe.runIncremental()
      }
      pipe.runIncremental()
      val want = lT.snapshot().join(rT.snapshot(),
          col("lkey") === col("rkey"), "inner")
        .groupBy("name")
        .agg(sum(col("cents")).as("scents"))
      val got = KeyedTable.forPath(spark, s"$root/chained").snapshot()
        .select(want.columns.map(col).toSeq: _*)
      assertSameRows(got, want, s"seed $seed sum-only chained")
    }
  }

  // seed 71 additionally runs with a tiny drain byte budget (multi
  // sub-batch windows: the downgrade pass must stay correct per
  // sub-batch) and ~20% stale right-side sequence numbers
  Seq(17, 71).foreach { seed =>
    test(s"random op waves through a LEFT join with NON-OWNING moves+deletes (seed $seed)") {
      val rnd = new scala.util.Random(seed)
      val root = tmp()
      if (seed == 71) spark.conf.set("spark.graft.drain.maxBytes", "20000")
      try {
        // the right side's join key is NOT its pk: right-side updates can
        // MOVE pairings, exercising the non-owning downgrade pass (old
        // pairings must re-pair or fall back to placeholders)
        val lSchema = Seq((1L, 1L, 1L, 0L)).toDF("id", "lkey", "cents", "seq").schema
        val rSchema = Seq((1L, 1L, "x", 0L)).toDF("rid", "rkey", "name", "rseq").schema
        val lT = KeyedTable.create(spark, s"$root/l", lSchema, Seq("id"),
          seqCols = Seq("seq"), numBuckets = 4)
        val rT = KeyedTable.create(spark, s"$root/r", rSchema, Seq("rid"),
          seqCols = Seq("rseq"), numBuckets = 4)
        val pipe = Stream.fromKeyedTable(lT).handleDeletes()
          .join(Stream.fromKeyedTable(rT).handleDeletes(), "left")
          .on((l, r) => l("lkey") === r("rkey"))
          .writeToPath(s"$root/out")
        (1 to 6).foreach { wave =>
          // left keys in [0,10); right join keys in [0,14): some left rows
          // never match, and right moves cross the boundary both ways
          val lRows = (1 to 15).map(_ => rnd.nextInt(25).toLong).distinct.map { i =>
            (i, rnd.nextInt(10).toLong, rnd.nextInt(10000).toLong, wave.toLong)
          }
          lT.upsert(lRows.toDF("id", "lkey", "cents", "seq"), uniqueKeys = true)
          val rRows = (1 to 6).map(_ => rnd.nextInt(12).toLong).distinct.map { k =>
            val sq = if (seed == 71 && rnd.nextInt(5) == 0)
              math.max(0, wave - 2).toLong else wave.toLong
            (k, rnd.nextInt(14).toLong, s"n$k-$wave", sq)
          }
          rT.upsert(rRows.toDF("rid", "rkey", "name", "rseq"), uniqueKeys = true)
          if (wave % 2 == 0)
            lT.delete((1 to 4).map(_ => rnd.nextInt(25).toLong).distinct.toDF("id"))
          if (wave % 2 == 1)
            rT.delete((1 to 3).map(_ => rnd.nextInt(12).toLong).distinct.toDF("rid"))
          if (wave % 2 == 0 || wave == 5) pipe.runIncremental()
        }
        pipe.runIncremental()
        val joined = KeyedTable.forPath(spark, s"$root/out").snapshot()
        val want = lT.snapshot().join(rT.snapshot(),
            col("lkey") === col("rkey"), "left")
          .select(joined.columns.map(col).toSeq: _*)
        assertSameRows(joined, want, s"seed $seed non-owning left join")
      } finally if (seed == 71) spark.conf.unset("spark.graft.drain.maxBytes")
    }
  }

  Seq(5).foreach { seed =>
    test(s"random waves interleaved with source MAINTENANCE ops (seed $seed)") {
      val rnd = new scala.util.Random(seed)
      val root = tmp()
      val lSchema = Seq((1L, 1L, 1L, 0L)).toDF("id", "lkey", "cents", "seq").schema
      val rSchema = Seq((1L, "x", 0L)).toDF("rkey", "name", "rseq").schema
      val lT = KeyedTable.create(spark, s"$root/l", lSchema, Seq("id"),
        seqCols = Seq("seq"), numBuckets = 4)
      val rT = KeyedTable.create(spark, s"$root/r", rSchema, Seq("rkey"),
        seqCols = Seq("rseq"), numBuckets = 4)
      val pipe = Stream.fromKeyedTable(lT).handleDeletes()
        .join(Stream.fromKeyedTable(rT).handleDeletes(), "inner")
        .on((l, r) => l("lkey") === r("rkey"))
        .writeToPath(s"$root/joined")
      (1 to 6).foreach { wave =>
        val lRows = (1 to 20).map(_ => rnd.nextInt(30).toLong).distinct.map { i =>
          (i, rnd.nextInt(8).toLong, rnd.nextInt(10000).toLong, wave.toLong)
        }
        lT.upsert(lRows.toDF("id", "lkey", "cents", "seq"), uniqueKeys = true)
        rT.upsert((0L until 8L).map(k => (k, s"n$k-$wave", wave.toLong))
          .toDF("rkey", "name", "rseq"), uniqueKeys = true)
        if (wave % 2 == 0)
          lT.delete((1 to 4).map(_ => rnd.nextInt(30).toLong).distinct.toDF("id"))
        // maintenance mid-pipeline: layout-only commits (no cdf rows)
        // land between data commits — drains must step over them, a
        // rebucket must replay racing merges, truncation must stay
        // above the drain watermark (retention 8 >> 3 commits/wave)
        rnd.nextInt(4) match {
          case 0 => lT.compact(minFileBytes = 1L << 20)
          case 1 => lT.optimize(Seq("lkey"))
          case 2 => lT.rebucket(if (lT.meta.numBuckets == 4) 8 else 4)
          case 3 => lT.vacuum(retainVersions = 8); lT.truncateLog(retainVersions = 8)
        }
        pipe.runIncremental()
      }
      val joined = KeyedTable.forPath(spark, s"$root/joined").snapshot()
      val want = lT.snapshot().join(rT.snapshot(),
          col("lkey") === col("rkey"), "inner")
        .select(joined.columns.map(col).toSeq: _*)
      assertSameRows(joined, want, s"seed $seed maintenance")
    }
  }

  // delete-then-REINSERT churn inside one drain window (the r10
  // MigrationReinsertSpec shape, randomized): a random subset of each
  // wave's deleted keys re-insert AFTER the delete with a fresh —
  // often MOVED — join key, on BOTH sides, through a left join whose
  // right join key is not its pk plus a chained agg downstream
  Seq(13, 57).foreach { seed =>
    test(s"random delete-then-reinsert waves through left join + chained agg (seed $seed)") {
      val rnd = new scala.util.Random(seed)
      val root = tmp()
      val lSchema = Seq((1L, 1L, 1L, 0L)).toDF("id", "lkey", "cents", "seq").schema
      val rSchema = Seq((1L, 1L, "x", 0L)).toDF("rid", "rkey", "name", "rseq").schema
      val lT = KeyedTable.create(spark, s"$root/l", lSchema, Seq("id"),
        seqCols = Seq("seq"), numBuckets = 4)
      val rT = KeyedTable.create(spark, s"$root/r", rSchema, Seq("rid"),
        seqCols = Seq("rseq"), numBuckets = 4)
      val joinPipe = Stream.fromKeyedTable(lT).handleDeletes()
        .join(Stream.fromKeyedTable(rT).handleDeletes(), "left")
        .on((l, r) => l("lkey") === r("rkey"))
        .writeToPath(s"$root/out")
      // chained: the reinsert retractions must also propagate through a
      // staged inner-join agg keyed on a right-side attribute
      val aggPipe = Stream.fromKeyedTable(lT).handleDeletes()
        .join(Stream.fromKeyedTable(rT).handleDeletes(), "inner")
        .on((l, r) => l("lkey") === r("rkey"))
        .groupByStaged(s"$root/stage", "name")
        .agg(sum(col("cents")).as("scents"), count(lit(1)).as("n"))
        .writeToPath(s"$root/agged")
      (1 to 6).foreach { wave =>
        val lRows = (1 to 15).map(_ => rnd.nextInt(25).toLong).distinct.map { i =>
          (i, rnd.nextInt(10).toLong, rnd.nextInt(10000).toLong, (10 * wave).toLong)
        }
        lT.upsert(lRows.toDF("id", "lkey", "cents", "seq"), uniqueKeys = true)
        val rRows = (1 to 6).map(_ => rnd.nextInt(12).toLong).distinct.map { k =>
          (k, rnd.nextInt(14).toLong, s"n${rnd.nextInt(5)}", (10 * wave).toLong)
        }
        rT.upsert(rRows.toDF("rid", "rkey", "name", "rseq"), uniqueKeys = true)
        // delete, then re-insert ~half the deleted keys with fresh join
        // keys IN THE SAME WINDOW (no drain in between)
        val lDel = (1 to 5).map(_ => rnd.nextInt(25).toLong).distinct
        lT.delete(lDel.toDF("id"))
        val lRe = lDel.filter(_ => rnd.nextBoolean()).map { i =>
          (i, rnd.nextInt(10).toLong, rnd.nextInt(10000).toLong, (10 * wave + 1).toLong)
        }
        if (lRe.nonEmpty)
          lT.upsert(lRe.toDF("id", "lkey", "cents", "seq"), uniqueKeys = true)
        if (wave % 2 == 1) {
          val rDel = (1 to 3).map(_ => rnd.nextInt(12).toLong).distinct
          rT.delete(rDel.toDF("rid"))
          val rRe = rDel.filter(_ => rnd.nextBoolean()).map { k =>
            (k, rnd.nextInt(14).toLong, s"n${rnd.nextInt(5)}", (10 * wave + 1).toLong)
          }
          if (rRe.nonEmpty)
            rT.upsert(rRe.toDF("rid", "rkey", "name", "rseq"), uniqueKeys = true)
        }
        if (wave % 2 == 0 || wave == 5) { joinPipe.runIncremental(); aggPipe.runIncremental() }
      }
      joinPipe.runIncremental()
      aggPipe.runIncremental()
      val joined = KeyedTable.forPath(spark, s"$root/out").snapshot()
      val wantJoin = lT.snapshot().join(rT.snapshot(),
          col("lkey") === col("rkey"), "left")
        .select(joined.columns.map(col).toSeq: _*)
      assertSameRows(joined, wantJoin, s"seed $seed reinsert left join")
      val agged = KeyedTable.forPath(spark, s"$root/agged").snapshot()
      val wantAgg = lT.snapshot().join(rT.snapshot(),
          col("lkey") === col("rkey"), "inner")
        .groupBy("name")
        .agg(sum(col("cents")).as("scents"), count(lit(1)).as("n"))
        .select(agged.columns.map(col).toSeq: _*)
      assertSameRows(agged, wantAgg, s"seed $seed reinsert chained agg")
    }
  }

  Seq(11, 42, 1337).foreach { seed =>
    test(s"random op waves: incremental join+agg == batch recompute (seed $seed)") {
      val rnd = new scala.util.Random(seed)
      val root = tmp()
      // v is integer cents so incremental plus/minus delta sums are
      // exact — double sums would drift by addition order
      val lSchema = Seq((1L, 1L, 1L, 0L)).toDF("id", "lkey", "cents", "seq").schema
      val rSchema = Seq((1L, "x", 0L)).toDF("rkey", "name", "rseq").schema
      val lT = KeyedTable.create(spark, s"$root/l", lSchema, Seq("id"),
        seqCols = Seq("seq"), numBuckets = 4)
      val rT = KeyedTable.create(spark, s"$root/r", rSchema, Seq("rkey"),
        seqCols = Seq("rseq"), numBuckets = 4)
      val joinPipe = Stream.fromKeyedTable(lT).handleDeletes()
        .join(Stream.fromKeyedTable(rT).handleDeletes(), "inner")
        .on((l, r) => l("lkey") === r("rkey"))
        .writeToPath(s"$root/joined")
      val aggPipe = Stream.fromKeyedTable(lT).handleDeletes()
        .groupBy("lkey")
        .agg(sum(col("cents")).as("scents"), count(lit(1)).as("n"))
        .writeToPath(s"$root/agged")
      (1 to 6).foreach { wave =>
        // upserts: random ids, random (possibly MOVED) join keys, a
        // deliberately stale sequence number ~20% of the time
        val lRows = (1 to 25).map(_ => rnd.nextInt(40).toLong).distinct.map { i =>
          val sq = if (rnd.nextInt(5) == 0) math.max(0, wave - 2).toLong else wave.toLong
          (i, rnd.nextInt(10).toLong, rnd.nextInt(10000).toLong, sq)
        }
        lT.upsert(lRows.toDF("id", "lkey", "cents", "seq"), uniqueKeys = true)
        val rRows = (1 to 6).map(_ => rnd.nextInt(10).toLong).distinct
          .map(k => (k, s"n$k-$wave", wave.toLong))
        rT.upsert(rRows.toDF("rkey", "name", "rseq"), uniqueKeys = true)
        if (wave % 2 == 0) {
          val del = (1 to 6).map(_ => rnd.nextInt(40).toLong).distinct
          lT.delete(del.toDF("id"))
        }
        if (wave % 3 == 0) {
          val del = (1 to 2).map(_ => rnd.nextInt(10).toLong).distinct
          rT.delete(del.toDF("rkey"))
        }
        // drain every other wave → multi-commit backlogs exercise the
        // windowed (non-1-commit) drain paths too
        if (wave % 2 == 0 || wave == 6) {
          joinPipe.runIncremental()
          aggPipe.runIncremental()
        }
      }
      joinPipe.runIncremental()
      aggPipe.runIncremental()

      val l = lT.snapshot()
      val r = rT.snapshot()
      val joined = KeyedTable.forPath(spark, s"$root/joined").snapshot()
      val wantJoin = l.join(r, col("lkey") === col("rkey"), "inner")
        .select(joined.columns.map(col).toSeq: _*)
      assertSameRows(joined, wantJoin, s"seed $seed join")
      val agged = KeyedTable.forPath(spark, s"$root/agged").snapshot()
      val wantAgg = l.groupBy("lkey")
        .agg(sum(col("cents")).as("scents"), count(lit(1)).as("n"))
        .select(agged.columns.map(col).toSeq: _*)
      assertSameRows(agged, wantAgg, s"seed $seed agg")
    }
  }

  // MAINTENANCE interleaved into the churn — the one interleaving
  // class the families above never touch: rebucket (bucket-epoch
  // change mid-stream), compact, optimize, vacuum, and log truncation
  // run between waves on sources AND outputs. Maintenance fires right
  // after a drain (the production maintenance-window shape), so
  // truncation never cuts an undrained feed; equivalence must survive
  // every layout rewrite the store supports.
  Seq(31, 67).foreach { seed =>
    test(s"random op waves with MAINTENANCE interleaved (seed $seed)") {
      val rnd = new scala.util.Random(seed)
      val root = tmp()
      val lSchema = Seq((1L, 1L, 1L, 0L)).toDF("id", "lkey", "cents", "seq").schema
      val rSchema = Seq((1L, "x", 0L)).toDF("rkey", "name", "rseq").schema
      val lT = KeyedTable.create(spark, s"$root/l", lSchema, Seq("id"),
        seqCols = Seq("seq"), numBuckets = 4)
      val rT = KeyedTable.create(spark, s"$root/r", rSchema, Seq("rkey"),
        seqCols = Seq("rseq"), numBuckets = 4)
      val pipe = Stream.fromKeyedTable(lT).handleDeletes()
        .join(Stream.fromKeyedTable(rT).handleDeletes(), "left")
        .on((l, r) => l("lkey") === r("rkey"))
        .groupByStaged(s"$root/stage", "name")
        .agg(sum(col("cents")).as("scents"), count(lit(1)).as("n"))
        .writeToPath(s"$root/chained")
      rT.upsert((0L until 8L).map(k => (k, s"n${k % 3}", 0L))
        .toDF("rkey", "name", "rseq"), uniqueKeys = true)
      (1 to 8).foreach { wave =>
        val lRows = (1 to 20).map(_ => rnd.nextInt(30).toLong).distinct.map { i =>
          (i, rnd.nextInt(12).toLong, rnd.nextInt(10000).toLong, wave.toLong)
        }
        lT.upsert(lRows.toDF("id", "lkey", "cents", "seq"), uniqueKeys = true)
        val rRows = (1 to 4).map(_ => rnd.nextInt(8).toLong).distinct
          .map(k => (k, s"n${rnd.nextInt(4)}", wave.toLong))
        rT.upsert(rRows.toDF("rkey", "name", "rseq"), uniqueKeys = true)
        if (wave % 3 == 0)
          lT.delete((1 to 5).map(_ => rnd.nextInt(30).toLong).distinct.toDF("id"))
        if (wave % 4 == 0)
          rT.delete((1 to 2).map(_ => rnd.nextInt(8).toLong).distinct.toDF("rkey"))
        if (wave % 2 == 0) {
          pipe.runIncremental()
          // maintenance window: backlog drained, layout mutation safe
          rnd.nextInt(5) match {
            case 0 =>
              lT.rebucket(if (lT.meta.numBuckets == 4) 8 else 4); ()
            case 1 =>
              lT.compact(); rT.compact(); ()
            case 2 =>
              lT.truncateLog(retainVersions = 2)
              rT.truncateLog(retainVersions = 2)
            case 3 =>
              lT.optimize(Seq("lkey"))
              KeyedTable.forPath(spark, s"$root/chained").compact(); ()
            case 4 =>
              lT.vacuum(retainVersions = 1)
              KeyedTable.forPath(spark, s"$root/stage").compact(); ()
          }
        }
      }
      pipe.runIncremental()
      val want = lT.snapshot().join(rT.snapshot(),
          col("lkey") === col("rkey"), "left")
        .groupBy("name")
        .agg(sum(col("cents")).as("scents"), count(lit(1)).as("n"))
      val got = KeyedTable.forPath(spark, s"$root/chained").snapshot()
        .select(want.columns.map(col).toSeq: _*)
      assertSameRows(got, want, s"seed $seed maintenance-interleaved")
    }
  }

  // CONCURRENT WRITERS racing churn — the one interleaving class the
  // families above never touch (maintenance covered layout mutation;
  // EpochDrainSpec covers crafted drainer races): every wave lands via
  // TWO writer threads upserting disjoint key halves of the same
  // source (overlapping buckets → real OCC claim losses and replays),
  // with a randomly-injected pre-commit rival commit forcing
  // additional claim losses (including the disjoint-bucket re-stamp
  // path), and every drain runs as TWO racing drainer threads through
  // the A35 arbitration. Final chained output must still equal the
  // batch fixpoint over the final snapshots.
  Seq(13, 41).foreach { seed =>
    test(s"random op waves with RACING writers and drainers (seed $seed)") {
      val rnd = new scala.util.Random(seed)
      val root = tmp()
      val lSchema = Seq((1L, 1L, 1L, 0L)).toDF("id", "lkey", "cents", "seq").schema
      val rSchema = Seq((1L, "x", 0L)).toDF("rkey", "name", "rseq").schema
      val lT = KeyedTable.create(spark, s"$root/l", lSchema, Seq("id"),
        seqCols = Seq("seq"), numBuckets = 4)
      val rT = KeyedTable.create(spark, s"$root/r", rSchema, Seq("rkey"),
        seqCols = Seq("rseq"), numBuckets = 4)
      def mkPipe() = Stream.fromKeyedTable(KeyedTable.forPath(spark, s"$root/l"))
        .handleDeletes()
        .join(Stream.fromKeyedTable(KeyedTable.forPath(spark, s"$root/r"))
          .handleDeletes(), "inner")
        .on((l, r) => l("lkey") === r("rkey"))
        .groupByStaged(s"$root/stage", "name")
        .agg(sum(col("cents")).as("scents"), count(lit(1)).as("n"))
        .writeToPath(s"$root/chained")
      rT.upsert((0L until 8L).map(k => (k, s"n${k % 3}", 0L))
        .toDF("rkey", "name", "rseq"), uniqueKeys = true)
      (1 to 6).foreach { wave =>
        val rows = (1 to 24).map(_ => rnd.nextInt(40).toLong).distinct.map { i =>
          (i, rnd.nextInt(10).toLong, rnd.nextInt(10000).toLong, wave.toLong)
        }
        // DISJOINT halves → the final table state is deterministic no
        // matter which writer's claim lands first
        val (h1, h2) = rows.partition(_._1 % 2 == 0)
        val w1 = KeyedTable.forPath(spark, s"$root/l")
        val w2 = KeyedTable.forPath(spark, s"$root/l")
        if (rnd.nextBoolean()) {
          // claim-loss injection: w1's pre-commit window lets a rival
          // sentinel commit land first, guaranteeing w1 loses its
          // first claim and replays (or re-stamps when disjoint)
          var fired = false
          w1.preCommitHook = () => if (!fired) {
            fired = true
            KeyedTable.forPath(spark, s"$root/l").upsert(
              Seq((999L, 9L, 9999L, wave.toLong))
                .toDF("id", "lkey", "cents", "seq"), uniqueKeys = true)
          }
        }
        val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
        val ts = Seq(h1, h2).zip(Seq(w1, w2)).map { case (half, w) =>
          new Thread { override def run(): Unit =
            try { if (half.nonEmpty)
              w.upsert(half.toDF("id", "lkey", "cents", "seq"), uniqueKeys = true) }
            catch { case e: Throwable => errs.add(e) } }
        }
        ts.foreach(_.start()); ts.foreach(_.join())
        assert(errs.isEmpty, s"wave $wave: racing writer threw: ${errs.peek()}")
        rT.upsert((1 to 4).map(_ => rnd.nextInt(8).toLong).distinct
          .map(k => (k, s"n${rnd.nextInt(4)}", wave.toLong))
          .toDF("rkey", "name", "rseq"), uniqueKeys = true)
        if (wave % 3 == 0)
          lT.delete((1 to 5).map(_ => rnd.nextInt(40).toLong).distinct.toDF("id"))
        if (wave % 2 == 0 || wave == 6) {
          val derrs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
          val ds = (1 to 2).map { _ =>
            new Thread { override def run(): Unit =
              try mkPipe().runIncremental()
              catch { case e: Throwable => derrs.add(e) } }
          }
          ds.foreach(_.start()); ds.foreach(_.join())
          assert(derrs.isEmpty, s"wave $wave: racing drainer threw: ${derrs.peek()}")
        }
      }
      mkPipe().runIncremental()
      val want = lT.snapshot().join(rT.snapshot(),
          col("lkey") === col("rkey"), "inner")
        .groupBy("name")
        .agg(sum(col("cents")).as("scents"), count(lit(1)).as("n"))
      val got = KeyedTable.forPath(spark, s"$root/chained").snapshot()
        .select(want.columns.map(col).toSeq: _*)
      assertSameRows(got, want, s"seed $seed racing writers")
    }
  }

  // CONCURRENT MAINTENANCE racing writers and drainers — the
  // maintenance family above (seeds 31/67) mutates layout only in SAFE
  // windows (backlog drained, no concurrent writer), and EpochDrainSpec
  // crafts exactly one merge-vs-rebucket race. Here every wave runs a
  // random maintenance op (compact / optimize / optimizeIncremental /
  // rebucket 4<->8 / stepped rebucketIncremental growth) on its OWN
  // handle in a THREAD racing the wave's
  // writer upsert, and on drain waves a second maintenance op races the
  // drainer — certifying the OCC claim/epoch machinery under arbitrary
  // interleavings: a rewrite that loses its claim replays against the
  // new latest; a merge planned under the old modulus detects the epoch
  // flip and replays; an optimize step overlapped by a merge merely
  // loses clustering, never rows. All maintenance here is LAYOUT-only,
  // so the final table state is writer-determined no matter which
  // interleaving the scheduler picks — the equality check stays
  // deterministic. truncateLog/vacuum are excluded on purpose:
  // retention versus in-flight readers is a POLICY contract
  // (retainVersions must cover reader lag), not a race the engine
  // arbitrates; seeds 31/67 cover them in safe windows.
  Seq(19, 83).foreach { seed =>
    test(s"random op waves with CONCURRENT maintenance racing writers and drainers (seed $seed)") {
      val rnd = new scala.util.Random(seed)
      val root = tmp()
      val lSchema = Seq((1L, 1L, 1L, 0L)).toDF("id", "lkey", "cents", "seq").schema
      val rSchema = Seq((1L, "x", 0L)).toDF("rkey", "name", "rseq").schema
      val lT = KeyedTable.create(spark, s"$root/l", lSchema, Seq("id"),
        seqCols = Seq("seq"), numBuckets = 4)
      val rT = KeyedTable.create(spark, s"$root/r", rSchema, Seq("rkey"),
        seqCols = Seq("rseq"), numBuckets = 4)
      def mkPipe() = Stream.fromKeyedTable(KeyedTable.forPath(spark, s"$root/l"))
        .handleDeletes()
        .join(Stream.fromKeyedTable(KeyedTable.forPath(spark, s"$root/r"))
          .handleDeletes(), "left")
        .on((l, r) => l("lkey") === r("rkey"))
        .groupByStaged(s"$root/stage", "name")
        .agg(sum(col("cents")).as("scents"), count(lit(1)).as("n"))
        .writeToPath(s"$root/chained")
      rT.upsert((0L until 8L).map(k => (k, s"n${k % 3}", 0L))
        .toDF("rkey", "name", "rseq"), uniqueKeys = true)
      def maintOp(h: KeyedTable, pick: Int): Unit = pick match {
        case 0 => h.compact(); ()
        case 1 => h.optimize(Seq("lkey")); ()
        case 2 => h.optimizeIncremental(Seq("lkey"), bucketsPerStep = 2); ()
        case 3 => h.rebucket(if (h.meta.numBuckets == 4) 8 else 4); ()
        // stepped growth under writer fire (cutover dirty-diff + claim
        // machinery); shrink back monolithically to keep the toggle cycle
        case 4 => if (h.meta.numBuckets == 4)
            h.rebucketIncremental(8, maxStepBytes = 1)
          else h.rebucket(4); ()
      }
      var contended = 0 // OCC claim losses observed across every race
      // 6 base waves; if the scheduler happened to serialize every pair
      // (possible on a slow/loaded box), keep racing extra waves — up
      // to 12 total — until at least one claim is actually contended,
      // so the final pin can't fail spuriously on a correct engine
      var wave = 0
      while (wave < 6 || (contended == 0 && wave < 12)) {
        wave += 1
        val lRows = (1 to 20).map(_ => rnd.nextInt(30).toLong).distinct.map { i =>
          (i, rnd.nextInt(12).toLong, rnd.nextInt(10000).toLong, wave.toLong)
        }
        // separate handles = separate `synchronized` monitors and
        // separate replay caches — a faithful two-process model
        val writer = KeyedTable.forPath(spark, s"$root/l")
        val maint = KeyedTable.forPath(spark, s"$root/l")
        // all randomness drawn on the test thread BEFORE the race
        val pick = rnd.nextInt(5)
        val maintFirst = rnd.nextBoolean()
        val stagger = rnd.nextInt(40).toLong
        val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
        val wT = new Thread { override def run(): Unit =
          try writer.upsert(lRows.toDF("id", "lkey", "cents", "seq"),
            uniqueKeys = true)
          catch { case e: Throwable => errs.add(e) } }
        val mT = new Thread { override def run(): Unit =
          try maintOp(maint, pick)
          catch { case e: Throwable => errs.add(e) } }
        val order = if (maintFirst) Seq(mT, wT) else Seq(wT, mT)
        order.head.start(); Thread.sleep(stagger); order.last.start()
        order.foreach(_.join())
        assert(errs.isEmpty,
          s"wave $wave: racing maintenance/writer threw: ${errs.peek()}")
        contended += writer.occRetries + maint.occRetries
        rT.upsert((1 to 4).map(_ => rnd.nextInt(8).toLong).distinct
          .map(k => (k, s"n${rnd.nextInt(4)}", wave.toLong))
          .toDF("rkey", "name", "rseq"), uniqueKeys = true)
        if (wave % 3 == 0)
          lT.delete((1 to 5).map(_ => rnd.nextInt(30).toLong).distinct.toDF("id"))
        if (wave % 2 == 0 || wave == 6) {
          val pick2 = rnd.nextInt(3) // no rebucket-vs-rebucket pileup
          val m2 = KeyedTable.forPath(spark, s"$root/l")
          val derrs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
          val ds = Seq(
            new Thread { override def run(): Unit =
              try mkPipe().runIncremental()
              catch { case e: Throwable => derrs.add(e) } },
            new Thread { override def run(): Unit =
              try maintOp(m2, pick2)
              catch { case e: Throwable => derrs.add(e) } })
          ds.foreach(_.start()); ds.foreach(_.join())
          assert(derrs.isEmpty,
            s"wave $wave: racing maintenance/drainer threw: ${derrs.peek()}")
          contended += m2.occRetries
        }
      }
      mkPipe().runIncremental()
      val want = lT.snapshot().join(rT.snapshot(),
          col("lkey") === col("rkey"), "left")
        .groupBy("name")
        .agg(sum(col("cents")).as("scents"), count(lit(1)).as("n"))
      val got = KeyedTable.forPath(spark, s"$root/chained").snapshot()
        .select(want.columns.map(col).toSeq: _*)
      assertSameRows(got, want, s"seed $seed concurrent maintenance")
      // the family must actually RACE, not serialize: across 6 waves ×
      // 2 concurrent commit attempts each, at least one claim must be
      // lost and replayed (both seeds measure well above the floor;
      // epoch-flip replays land in the same counter). A zero here means
      // the scheduler serialized every wave and the test proved nothing.
      assert(contended >= 1, s"no OCC contention observed in any wave")
    }
  }

  // RANDOMIZED CRASH INJECTION — the crash seams are spec-tested at
  // CRAFTED points (CrashRecoverySpec, IncrementalDrainSpec, OccSpec,
  // RebucketSpec); this family kills a drainer at a RANDOM commit
  // boundary each drain wave and recovers it, covering both recovery
  // classes: a PRE-merge kill (globalPreCommitHook throwing on the
  // stage or output table's commit publish) leaves a claimed intent
  // the next drainer must adopt VERBATIM once the claim goes stale;
  // a POST-merge kill (preStateCommitHook throwing on intent→state
  // promotion) leaves a landed merge that loadRecovering must promote
  // and whose post-merge passes it must replay. Final chained output
  // must equal the batch fixpoint over the final snapshots.
  private class CrashSignal extends RuntimeException("injected drainer kill")

  Seq(17, 73).foreach { seed =>
    test(s"random op waves with CRASH-INJECTED drainer kills (seed $seed)") {
      val rnd = new scala.util.Random(seed)
      val root = tmp()
      val lSchema = Seq((1L, 1L, 1L, 0L)).toDF("id", "lkey", "cents", "seq").schema
      val rSchema = Seq((1L, "x", 0L)).toDF("rkey", "name", "rseq").schema
      val lT = KeyedTable.create(spark, s"$root/l", lSchema, Seq("id"),
        seqCols = Seq("seq"), numBuckets = 4)
      val rT = KeyedTable.create(spark, s"$root/r", rSchema, Seq("rkey"),
        seqCols = Seq("rseq"), numBuckets = 4)
      def mkPipe() = Stream.fromKeyedTable(KeyedTable.forPath(spark, s"$root/l"))
        .handleDeletes()
        .join(Stream.fromKeyedTable(KeyedTable.forPath(spark, s"$root/r"))
          .handleDeletes(), "left")
        .on((l, r) => l("lkey") === r("rkey"))
        .groupByStaged(s"$root/stage", "name")
        .agg(sum(col("cents")).as("scents"), count(lit(1)).as("n"))
        .writeToPath(s"$root/chained")
      rT.upsert((0L until 8L).map(k => (k, s"n${k % 3}", 0L))
        .toDF("rkey", "name", "rseq"), uniqueKeys = true)
      // short grace so a killed drainer's stale claim is adopted fast;
      // the recovery drainer polls staleClaim every 50ms until then
      spark.conf.set("spark.graft.drain.claimGraceMs", "300")
      val armed = new java.util.concurrent.atomic.AtomicReference[String](null)
      val kills = new java.util.concurrent.atomic.AtomicInteger(0)
      // one-shot kill at the armed boundary (self-disarms on fire)
      KeyedTable.globalPreCommitHook = p =>
        if (p == armed.get) { armed.set(null); kills.incrementAndGet(); throw new CrashSignal }
      DrainState.preStateCommitHook = d =>
        if (d == armed.get) { armed.set(null); kills.incrementAndGet(); throw new CrashSignal }
      try {
        (1 to 6).foreach { wave =>
          val lRows = (1 to 20).map(_ => rnd.nextInt(30).toLong).distinct.map { i =>
            (i, rnd.nextInt(12).toLong, rnd.nextInt(10000).toLong, wave.toLong)
          }
          lT.upsert(lRows.toDF("id", "lkey", "cents", "seq"), uniqueKeys = true)
          rT.upsert((1 to 4).map(_ => rnd.nextInt(8).toLong).distinct
            .map(k => (k, s"n${rnd.nextInt(4)}", wave.toLong))
            .toDF("rkey", "name", "rseq"), uniqueKeys = true)
          if (wave % 2 == 0)
            lT.delete((1 to 5).map(_ => rnd.nextInt(30).toLong).distinct.toDF("id"))
          if (wave % 3 == 0)
            rT.delete((1 to 2).map(_ => rnd.nextInt(8).toLong).distinct.toDF("rkey"))
          // kill the drainer at a random boundary: PRE-merge on the
          // staged table, PRE-merge on the output table, or POST-merge
          // before either stage's state promotion (one-shot arm)
          val target = rnd.nextInt(4) match {
            case 0 => s"$root/stage"          // stage-1 merge publish
            case 1 => s"$root/chained"        // stage-2 merge publish
            case 2 => s"$root/stage/_drain"   // stage-1 state promotion
            case 3 => s"$root/chained/_drain" // stage-2 state promotion
          }
          armed.set(target)
          try mkPipe().runIncremental()
          catch { case _: CrashSignal => () } // the injected kill
          // a layout-only wave may never reach the armed boundary —
          // disarm regardless, then recover: the next drain must adopt
          // the dead drainer's claim (pre-merge kill) or promote-and-
          // replay the landed step (post-merge kill)
          armed.set(null)
          mkPipe().runIncremental()
        }
        mkPipe().runIncremental()
        val want = lT.snapshot().join(rT.snapshot(),
            col("lkey") === col("rkey"), "left")
          .groupBy("name")
          .agg(sum(col("cents")).as("scents"), count(lit(1)).as("n"))
        val got = KeyedTable.forPath(spark, s"$root/chained").snapshot()
          .select(want.columns.map(col).toSeq: _*)
        assertSameRows(got, want, s"seed $seed crash-injected drains")
        // the family must actually kill drainers, not just drain: every
        // wave arms a boundary the churn reliably reaches (both seeds
        // measured 6/6 fires; floor at 4 leaves headroom for a future
        // layout-only wave)
        assert(kills.get >= 4, s"only ${kills.get} injected kills fired")
      } finally {
        spark.conf.unset("spark.graft.drain.claimGraceMs")
        KeyedTable.globalPreCommitHook = _ => ()
        DrainState.preStateCommitHook = _ => ()
      }
    }
  }

  // RANDOMIZED MAINTENANCE CRASH INJECTION (r13 verdict #5, stepped
  // rebucket added r15): the families above race maintenance or kill
  // drainers, but never kill a compact/optimize/optimizeIncremental/
  // rebucket/rebucketIncremental MID-FLIGHT while a writer races —
  // exactly the seam of the r13 reclamation race. Each wave kills the
  // maintenance op at its commit publish (or, for rebucket, in the
  // marker-written-no-content window; for the stepped form, between
  // staged range writes) with a writer in flight, then proves the
  // table keeps serving writers, a clean re-run of the SAME op
  // succeeds (recovery/replay contract — the stepped form must RESUME
  // from its progress record), and the chained output still equals the
  // batch fixpoint. Orphaned markers must be reclaimed once provably
  // dead.
  Seq(29, 59).foreach { seed =>
    test(s"random op waves with CRASH-INJECTED maintenance kills (seed $seed)") {
      val rnd = new scala.util.Random(seed)
      val root = tmp()
      val lSchema = Seq((1L, 1L, 1L, 0L)).toDF("id", "lkey", "cents", "seq").schema
      val rSchema = Seq((1L, "x", 0L)).toDF("rkey", "name", "rseq").schema
      val lT = KeyedTable.create(spark, s"$root/l", lSchema, Seq("id"),
        seqCols = Seq("seq"), numBuckets = 4)
      val rT = KeyedTable.create(spark, s"$root/r", rSchema, Seq("rkey"),
        seqCols = Seq("rseq"), numBuckets = 4)
      def mkPipe() = Stream.fromKeyedTable(KeyedTable.forPath(spark, s"$root/l"))
        .handleDeletes()
        .join(Stream.fromKeyedTable(KeyedTable.forPath(spark, s"$root/r"))
          .handleDeletes(), "left")
        .on((l, r) => l("lkey") === r("rkey"))
        .groupByStaged(s"$root/stage", "name")
        .agg(sum(col("cents")).as("scents"), count(lit(1)).as("n"))
        .writeToPath(s"$root/chained")
      rT.upsert((0L until 8L).map(k => (k, s"n${k % 3}", 0L))
        .toDF("rkey", "name", "rseq"), uniqueKeys = true)
      // pre-seed the fact table: an EMPTY table makes every layout op
      // an early-return no-op (no commit, no marker → no kill to fire)
      lT.upsert(Seq((1000L, 1L, 1L, 0L), (1001L, 2L, 2L, 0L))
        .toDF("id", "lkey", "cents", "seq"), uniqueKeys = true)
      def maintOp(h: KeyedTable, pick: Int): Unit = pick match {
        case 0 => h.compact(); ()
        case 1 => h.optimize(Seq("lkey")); ()
        case 2 => h.optimizeIncremental(Seq("lkey"), bucketsPerStep = 2); ()
        case 3 => h.rebucket(if (h.meta.numBuckets == 4) 8 else 4); ()
        // stepped growth; shrink back monolithically (toggle cycle). The
        // step kill below exercises the progress-record resume path.
        case 4 => if (h.meta.numBuckets == 4)
            h.rebucketIncremental(8, maxStepBytes = 1)
          else h.rebucket(4); ()
      }
      // one-shot kill of exactly the armed MAINTENANCE thread (the
      // racing writer commits on the same path and must not die)
      val armCommit = new java.util.concurrent.atomic.AtomicReference[Thread](null)
      val armMarker = new java.util.concurrent.atomic.AtomicReference[Thread](null)
      val armStep = new java.util.concurrent.atomic.AtomicReference[Thread](null)
      val kills = new java.util.concurrent.atomic.AtomicInteger(0)
      KeyedTable.globalPreCommitHook = p =>
        if (p == s"$root/l" &&
            armCommit.compareAndSet(Thread.currentThread(), null)) {
          kills.incrementAndGet(); throw new CrashSignal
        }
      KeyedTable.globalPreRebucketWriteHook = p =>
        if (p == s"$root/l" &&
            armMarker.compareAndSet(Thread.currentThread(), null)) {
          kills.incrementAndGet(); throw new CrashSignal
        }
      // stepped-rebucket mid-sequence kill: fire on a LATER range so at
      // least one completed step is on record — the re-run must RESUME
      // from it, not restart (the lo>0 guard is best-effort: bucket 0
      // may not be live, in which case the resume starts from zero)
      KeyedTable.globalRebucketStepHook = (p, lo) =>
        if (p == s"$root/l" && lo > 0 &&
            armStep.compareAndSet(Thread.currentThread(), null)) {
          kills.incrementAndGet(); throw new CrashSignal
        }
      try {
        // 6 base waves; a wave's op can legitimately no-op without a
        // commit (compact on 1-file buckets), so extend — bounded at
        // 12 — until the kill floor is met, like the contention pin
        var wave = 0
        while (wave < 6 || (kills.get < 4 && wave < 12)) {
          wave += 1
          val lRows = (1 to 20).map(_ => rnd.nextInt(30).toLong).distinct.map { i =>
            (i, rnd.nextInt(12).toLong, rnd.nextInt(10000).toLong, wave.toLong)
          }
          val writer = KeyedTable.forPath(spark, s"$root/l")
          val maint = KeyedTable.forPath(spark, s"$root/l")
          val pick = rnd.nextInt(5)
          // rebucket waves alternate which seam dies: the commit, or the
          // op-specific mid-flight window (monolithic: marker written,
          // no content; stepped: between staged range writes)
          val altSeam = rnd.nextBoolean()
          val atMarker = pick == 3 && altSeam
          val atStep = pick == 4 && altSeam
          val stagger = rnd.nextInt(40).toLong
          val wErrs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
          val mErrs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
          val wT = new Thread { override def run(): Unit =
            try writer.upsert(lRows.toDF("id", "lkey", "cents", "seq"),
              uniqueKeys = true)
            catch { case e: Throwable => wErrs.add(e) } }
          val mT = new Thread { override def run(): Unit =
            try maintOp(maint, pick)
            catch {
              case _: CrashSignal => () // the injected kill
              case e: Throwable => mErrs.add(e)
            } }
          if (atMarker) armMarker.set(mT)
          else if (atStep) armStep.set(mT)
          else armCommit.set(mT)
          wT.start(); Thread.sleep(stagger); mT.start()
          wT.join(); mT.join()
          // op may not have committed / stepped
          armCommit.set(null); armMarker.set(null); armStep.set(null)
          assert(wErrs.isEmpty,
            s"wave $wave: writer died alongside the killed maintenance: ${wErrs.peek()}")
          assert(mErrs.isEmpty,
            s"wave $wave: maintenance threw a non-injected error: ${mErrs.peek()}")
          // the recovery contract: a clean re-run of the SAME op on a
          // fresh handle must succeed over the crash leftovers. Grace is
          // waived: the killed writer is provably dead here, and a
          // killed STEPPED rebucket's progress record must be adoptable
          // by the re-run (production waits out the liveness window)
          spark.conf.set("spark.graft.pendingGraceMs", "-1")
          try maintOp(KeyedTable.forPath(spark, s"$root/l"), pick)
          finally spark.conf.unset("spark.graft.pendingGraceMs")
          rT.upsert((1 to 4).map(_ => rnd.nextInt(8).toLong).distinct
            .map(k => (k, s"n${rnd.nextInt(4)}", wave.toLong))
            .toDF("rkey", "name", "rseq"), uniqueKeys = true)
          if (wave % 3 == 0)
            lT.delete((1 to 5).map(_ => rnd.nextInt(30).toLong).distinct.toDF("id"))
          if (wave % 2 == 0) mkPipe().runIncremental()
        }
        mkPipe().runIncremental()
        val want = lT.snapshot().join(rT.snapshot(),
            col("lkey") === col("rkey"), "left")
          .groupBy("name")
          .agg(sum(col("cents")).as("scents"), count(lit(1)).as("n"))
        val got = KeyedTable.forPath(spark, s"$root/chained").snapshot()
          .select(want.columns.map(col).toSeq: _*)
        assertSameRows(got, want, s"seed $seed crash-injected maintenance")
        // the family must actually kill: every wave arms a seam the op
        // reliably reaches (compact may no-op on a 1-file-per-bucket
        // early wave — floor at 4 leaves that headroom)
        assert(kills.get >= 4, s"only ${kills.get} injected kills fired")
        // any marker a killed rebucket left behind must reclaim once
        // provably dead — and the reclamation must not disturb state
        spark.conf.set("spark.graft.pendingGraceMs", "-1")
        try lT.upsert(Seq((999L, 0L, 0L, 99L)).toDF("id", "lkey", "cents", "seq"),
          uniqueKeys = true)
        finally spark.conf.unset("spark.graft.pendingGraceMs")
        val log = new CommitLog(s"$root/l", spark.sessionState.newHadoopConf())
        assert(log.readRebucketMarker().isEmpty,
          "a dead rebucket marker survived grace-based reclamation")
        assert(log.readRebucketProgress().isEmpty,
          "a completed stepped rebucket left its progress record behind")
      } finally {
        KeyedTable.globalPreCommitHook = _ => ()
        KeyedTable.globalPreRebucketWriteHook = _ => ()
        KeyedTable.globalRebucketStepHook = (_, _) => ()
      }
    }
  }
}
