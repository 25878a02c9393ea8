package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.SparkSession

/** Parquet metadata reader: exact row counts from file footers, no data
  * scan. COUNT(*) over parquet is answerable from row-group metadata alone
  * — the optimization DuckDB applies natively and Spark's v1 source does
  * not. A count over a 100 TB table becomes O(files) footer reads
  * (distributed below — a million-file table is a million ~8-byte metadata
  * fetches spread over the cluster, zero column I/O).
  */
object ParquetMeta {

  /** Exact row count of one parquet file, from its footer. */
  def fileRowCount(hconf: org.apache.hadoop.conf.Configuration, file: String): Long = {
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(file), hconf))
    try reader.getRecordCount finally reader.close()
  }

  /** Exact row count of a parquet table (file or directory), summed over
    * data files. Footer reads are distributed across the cluster — the
    * driver only lists paths. */
  def rowCount(spark: SparkSession, path: String): Long = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val p = new Path(path)
    val fs = p.getFileSystem(hconf)
    val files: Seq[String] = {
      val it = fs.listFiles(p, true)
      val buf = scala.collection.mutable.ArrayBuffer[String]()
      while (it.hasNext) {
        val f = it.next()
        val name = f.getPath.getName
        if (f.isFile && name.endsWith(".parquet") && !name.startsWith("_") && !name.startsWith("."))
          buf += f.getPath.toString
      }
      buf.toSeq
    }
    if (files.isEmpty) 0L
    else {
      // serializable snapshot of the hadoop conf for the executors
      val confBc = spark.sparkContext.broadcast(
        new org.apache.spark.util.SerializableConfiguration(hconf))
      spark.sparkContext.parallelize(files, math.min(files.size, 64))
        .map(f => fileRowCount(confBc.value.value, f))
        .reduce(_ + _)
    }
  }
}
