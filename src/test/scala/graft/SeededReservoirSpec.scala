package graft

import org.apache.spark.sql.functions._

import graft.functions.SeededReservoir
import graft.operators.Ops

class SeededReservoirSpec extends SparkSuite {
  import spark.implicits._

  test("aggregator sample equals the hash-order top-N formulation") {
    val keys = Tables.customer(spark, SF).select("c_custkey").as[Long]
    val agg = new SeededReservoir(20, 0L).toColumn
    val viaAgg = keys.select(agg).head()
    val viaTopN = Ops.seededTopN(keys.toDF("c_custkey"), "c_custkey", 20)
      .select("c_custkey").as[Long].collect().toSeq
    assert(viaAgg == viaTopN)
  }

  test("partitioning-invariant: same sample regardless of input layout") {
    val keys = (1L to 5000L).toDF("k").as[Long]
    val agg = new SeededReservoir(10, 42L).toColumn
    val a = keys.repartition(1).select(agg).head()
    val b = keys.repartition(17).select(agg).head()
    assert(a == b)
  }

  test("one sample per group in a single aggregation pass") {
    val df = Tables.orders(spark, SF)
      .select(col("o_orderstatus"), col("o_orderkey"))
      .as[(String, Long)]
    val agg = new SeededReservoir(5, 7L).toColumn
    val perGroup = df.groupByKey(_._1).mapValues(_._2).agg(agg).collect().toMap
    assert(perGroup.keySet == Set("F", "O", "P"))
    perGroup.values.foreach(sample => assert(sample.size == 5))
    // deterministic across runs
    val again = df.groupByKey(_._1).mapValues(_._2).agg(agg).collect().toMap
    assert(perGroup == again)
  }
}
