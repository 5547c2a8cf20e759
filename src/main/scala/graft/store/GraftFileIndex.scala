package graft.store

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types.StructType

/** Manifest-backed [[FileIndex]] for [[KeyedTable]] snapshot reads.
  *
  * The live file list (paths + lengths) comes entirely from commit
  * manifests — no filesystem listing at plan time, which at 100 TB is
  * the difference between one cached log read and a recursive list of
  * tens of thousands of objects. Because the scan goes through Spark's
  * normal V1 file-source path, Catalyst pushes the query's `dataFilters`
  * into [[listFiles]], where the per-file zone maps recorded by the
  * commit ([[FileEntry.stats]], plus the key-hash range) skip files the
  * predicate cannot match — Delta-style data skipping, driver-side,
  * before a single task launches. Pruning is conservative: a file
  * without stats for a referenced column is always read.
  */
private[graft] final class GraftFileIndex(
    spark: SparkSession,
    tableRoot: String,
    dataSchema: StructType,
    entries: Seq[FileEntry]) extends FileIndex {

  private val root = new Path(tableRoot)

  // resolve by the session's resolver (case-insensitive by default)
  private def fieldOf(name: String) =
    dataSchema.fields.find(f => spark.sessionState.conf.resolver(f.name, name))

  private val statuses: Seq[(FileEntry, FileStatus)] = entries.map { e =>
    // modification time is irrelevant for a manifest-owned immutable
    // file; block size only seeds split arithmetic
    e -> new FileStatus(e.bytes, false, 1, 128L << 20, 0L,
      new Path(s"$tableRoot/${e.path}"))
  }

  override def rootPaths: Seq[Path] = Seq(root)

  override def partitionSchema: StructType = new StructType()

  override def sizeInBytes: Long = entries.map(_.bytes).sum

  override def inputFiles: Array[String] =
    statuses.map(_._2.getPath.toString).toArray

  override def refresh(): Unit = ()

  /** Files skipped by zone maps in the most recent [[listFiles]] —
    * observability for specs and plan audits. */
  @volatile private[graft] var lastSkipped: Int = 0

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val survivors =
      if (dataFilters.isEmpty) statuses
      else statuses.filter { case (e, _) =>
        def statsOf(name: String): Option[(Any, Any)] =
          fieldOf(name).flatMap { f =>
            e.stats.get(f.name)
              .flatMap(st => ZoneStats.parseRange(f.dataType, st.min, st.max))
          }
        def nullsOf(name: String): Option[Boolean] =
          fieldOf(name).flatMap(f => e.stats.get(f.name).map(_.hasNulls))
        dataFilters.forall(p =>
          ZoneStats.mayMatch(p, n => fieldOf(n).map(_.dataType), statsOf, nullsOf))
      }
    lastSkipped = statuses.size - survivors.size
    Seq(PartitionDirectory(InternalRow.empty, survivors.map(_._2).toArray))
  }
}
