package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Queries

/** Driver-contract guards: registry consistency and the t1 smoke. */
class RegistrySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("registry: unique names, oracle coverage is exactly the declared set") {
    val all = Queries.all
    assert(all.map(_.name).distinct.size == all.size, "duplicate query names")
    // LSH/sketch/mapPartitions results are probabilistic or engine-specific
    // — everything else MUST carry a DuckDB oracle twin
    val expectedNoOracle = Set("q34_ann_lsh", "q35_ann_ivf")
    val noOracle = all.filter(_.oracle.isEmpty).map(_.name).toSet
    assert(noOracle == expectedNoOracle,
      s"oracle-less drift: ${noOracle diff expectedNoOracle} / ${expectedNoOracle diff noOracle}")
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    assert(SparkEntry.queries.size == all.size)
  }

  test("entry() smoke: flagship query yields rows on sf0.001 (driver t1)") {
    assume(new java.io.File("/root/testdata/sf0.001").isDirectory)
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
