package graft

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

/** The DataSourceV2 pagination source: partition planning, completeness,
  * determinism, and column-pruning pushdown. */
class PagedSourceSpec extends SparkSuite {

  private def read(total: Long = 1000, pageSize: Int = 25, pagesPerSplit: Int = 4) =
    spark.read.format("graft-pages")
      .option("total", total).option("pageSize", pageSize)
      .option("pagesPerSplit", pagesPerSplit).load()

  test("plans one input partition per page range") {
    // 1000 items / 25 per page = 40 pages; 4 pages per split = 10 splits
    assert(read().rdd.getNumPartitions == 10)
    // ragged tail: 990 items = 40 pages (last short), still 10 splits
    assert(read(total = 990).rdd.getNumPartitions == 10)
  }

  test("pages are complete, disjoint, and deterministic") {
    val df = read()
    assert(df.count() == 1000)
    assert(df.select("item_id").distinct().count() == 1000)
    assert(df.agg(min("item_id"), max("item_id")).head() ==
      org.apache.spark.sql.Row(0L, 999L))
    val a = df.orderBy("item_id").collect()
    val b = read().orderBy("item_id").collect()
    assert(a.toSeq == b.toSeq)
  }

  test("page assignment matches the limit/offset cursor semantics") {
    val rows = read(total = 103, pageSize = 10, pagesPerSplit = 3)
      .select("item_id", "page").collect()
    assert(rows.length == 103)
    assert(rows.forall(r => r.getInt(1) == (r.getLong(0) / 10).toInt))
  }

  test("column pruning is pushed into the reader") {
    val pruned = read().select("item_id", "page")
    val scans = pruned.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan.readSchema().fieldNames.toSeq
    }
    assert(scans == Seq(Seq("item_id", "page")))
  }

  test("release_date carries the reference's variable precision") {
    val lens = read().select(length(col("release_date")).as("l"))
      .distinct().collect().map(_.getInt(0)).toSet
    assert(lens == Set(4, 7, 10)) // YYYY / YYYY-MM / YYYY-MM-DD
    // and the variable-precision parser (q_date_parse's padded single-pass
    // try_to_date) parses every generated date
    val parsed = read().withColumn("p",
      graft.operators.Ops.parsePartialDate(col("release_date")))
    assert(parsed.where(col("p").isNull).count() == 0)
  }
}
