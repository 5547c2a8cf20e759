package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

import graft.store.KeyedTable

/** Shuffle-FREE equi-join of two identically-bucketed KeyedTables.
  *
  * Both tables hash their bucket keys with the same function
  * (`pmod(xxhash64(keys), numBuckets)`), so bucket `i` of the left can
  * only match bucket `i` of the right — the join is embarrassingly
  * parallel per bucket pair with ZERO network exchange of either
  * table. Vanilla Spark can only exploit this for catalog tables
  * written with `bucketBy`; for KeyedTable's own layout we zip the
  * per-bucket scans and hash-join each pair in place (the documented
  * last-resort tier: a whole-operator semantic Catalyst can't express
  * over this storage).
  *
  * At 100 TB this is the repeated fact-fact join shape: two large
  * tables co-bucketed on the join key (e.g. orders ⋈ lineitem on
  * orderkey, both bucketed by it at write time) join at disk bandwidth
  * instead of shuffling both through the network. The per-bucket hash
  * map holds ONE bucket of the smaller table (buckets are sized a few
  * GB at write time; pick the build side accordingly) — the same
  * memory contract as a shuffled hash join's per-partition build.
  *
  * Trade-off, stated honestly: rows leave Tungsten for the per-bucket
  * zip (no whole-stage codegen over the join itself). The exchange
  * saved dominates when the network is the bottleneck; for
  * CPU-bound small joins, use a plain `DataFrame.join` instead.
  */
object CoBucketJoin {

  /** Inner or left equi-join on the (shared) bucket key columns.
    *
    * @param keys  join columns = both tables' bucket keys, same order
    * @param build which side's buckets to hash ("right" default — pick
    *              the smaller table)
    */
  def join(left: KeyedTable, right: KeyedTable, keys: Seq[String],
      joinType: String = "inner", build: String = "right"): DataFrame = {
    require(left.meta.numBuckets == right.meta.numBuckets,
      s"co-bucket join needs equal bucket counts " +
        s"(${left.meta.numBuckets} vs ${right.meta.numBuckets})")
    require(left.meta.bucketKeys == keys && right.meta.bucketKeys == keys,
      s"co-bucket join keys must equal BOTH tables' bucket keys " +
        s"(${left.meta.bucketKeys} / ${right.meta.bucketKeys} vs $keys)")
    require(joinType == "inner" || joinType == "left",
      s"unsupported join type $joinType")
    require(build == "right" || (build == "left" && joinType == "inner"),
      "left join must build the right side")
    val spark = left.spark
    val n = left.meta.numBuckets

    // one RDD partition per bucket, in bucket order; a missing bucket
    // contributes an empty partition so the two sides stay aligned
    def sideRdd(t: KeyedTable) = {
      val bv = t.bucketVersionsAt(t.latestVersion)
      val cols = t.dataCols
      val rdds = (0 until n).map { b =>
        // resolve through the commit manifest: a pruned merge may have
        // carried some of the bucket's files forward under OLDER dirs
        bv.get(b).map(v => t.bucketFilePaths(b, v)).filter(_.nonEmpty) match {
          case Some(paths) =>
            spark.read.schema(t.schema)
              .parquet(paths: _*)
              .select(cols.map(org.apache.spark.sql.functions.col): _*)
              .coalesce(1).rdd // narrow: no shuffle
          // 1 explicit partition: emptyRDD has ZERO and would shift
          // the bucket alignment of the union
          case None => spark.sparkContext.parallelize(Seq.empty[Row], 1)
        }
      }
      spark.sparkContext.union(rdds)
    }

    val lSchema = left.schema
    val rSchema = right.schema
    // right columns that collide with left names get the _r suffix,
    // mirroring what a DataFrame join + select would produce
    val lNames = lSchema.fieldNames.toSeq
    val rKeep = rSchema.fieldNames.toSeq.filterNot(keys.contains)
    val rOut = rKeep.map(c => if (lNames.contains(c)) s"${c}_r" else c)
    val outSchema = StructType(lSchema.fields ++
      rKeep.zip(rOut).map { case (c, o) =>
        // a left join pads unmatched rows with nulls on the right
        rSchema(c).copy(name = o,
          nullable = rSchema(c).nullable || joinType == "left")
      })

    val lKeyIdx = keys.map(lSchema.fieldIndex)
    val rKeyIdx = keys.map(rSchema.fieldIndex)
    val rKeepIdx = rKeep.map(rSchema.fieldIndex)
    val nullTail = Seq.fill(rKeepIdx.size)(null)
    val isLeft = joinType == "left"
    val buildLeft = build == "left"

    val joined = sideRdd(left).zipPartitions(sideRdd(right)) { (lIt, rIt) =>
      def key(row: Row, idx: Seq[Int]): Seq[Any] = idx.map(row.get)
      if (buildLeft) {
        val table = lIt.toSeq.groupBy(r => key(r, lKeyIdx))
        rIt.flatMap { r =>
          table.getOrElse(key(r, rKeyIdx), Nil).map { l =>
            Row.fromSeq(l.toSeq ++ rKeepIdx.map(r.get))
          }
        }
      } else {
        val table = rIt.toSeq.groupBy(r => key(r, rKeyIdx))
        lIt.flatMap { l =>
          table.get(key(l, lKeyIdx)) match {
            case Some(ms) => ms.iterator.map(r =>
              Row.fromSeq(l.toSeq ++ rKeepIdx.map(r.get)))
            case None =>
              if (isLeft) Iterator.single(Row.fromSeq(l.toSeq ++ nullTail))
              else Iterator.empty
          }
        }
      }
    }
    spark.createDataFrame(joined, outSchema)
  }
}
