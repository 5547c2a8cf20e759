package graft.store

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType

/** Name → KeyedTable binding rooted at a warehouse directory — the
  * reference's `writeToTable` / `fromTable` surface (joins.py:639-671,
  * streams.py:96-124) re-expressed without a metastore dependency.
  *
  * Each named table lives at `<warehouse>/<name>` with its own commit
  * log; `registerView` additionally binds the current snapshot into the
  * session so `spark.sql("SELECT … FROM name")` works. On a production
  * cluster the same layout is exposed to external engines as plain
  * parquet paths (the snapshot IS parquet) — a custom DSv2 reader would
  * reimplement Spark's vectorized parquet scan for no semantic gain,
  * which is why the catalog binds names, not bytes.
  */
final class TableCatalog(val spark: SparkSession, val warehouse: String) {

  def path(name: String): String = {
    require(name.matches("[A-Za-z0-9_]+"), s"invalid table name: $name")
    s"$warehouse/$name"
  }

  def exists(name: String): Boolean =
    new CommitLog(path(name), spark.sessionState.newHadoopConf()).exists

  def create(
      name: String,
      schema: StructType,
      keys: Seq[String],
      seqCols: Seq[String] = Nil,
      numBuckets: Int = 32,
      partitionCols: Seq[String] = Nil,
      prunedCols: Seq[String] = Nil): KeyedTable =
    KeyedTable.create(spark, path(name), schema, keys, seqCols,
      numBuckets = numBuckets, partitionCols = partitionCols, prunedCols = prunedCols)

  def table(name: String): KeyedTable = KeyedTable.forPath(spark, path(name))

  /** Binds `name` to its current snapshot as a session view so plain
    * `spark.sql` can query it (re-register after new commits to see
    * them — views capture the snapshot's version pin). */
  def registerView(name: String): Unit =
    table(name).snapshot().createOrReplaceTempView(name)

  def listTables(): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(warehouse)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq.filter(_.isDirectory).map(_.getPath.getName)
      .filter(exists)
  }

  def drop(name: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path(name))
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(p, true)
    spark.catalog.dropTempView(name)
  }
}
