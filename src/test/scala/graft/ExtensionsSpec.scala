package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions: native expressions reachable from SQL on a session
  * configured with the extensions hook. Extensions apply at session
  * construction, so this builds a fresh SparkSession (sharing the JVM's
  * SparkContext) and restores the shared one afterwards. */
class ExtensionsSpec extends AnyFunSuite {

  test("py_title and vec_dot callable from SQL via extensions") {
    val shared = SparkTestSession.spark
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val spark = SparkSession.builder()
        .master("local[2]")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val r = spark.sql(
        "SELECT py_title(\"o'brien x2y\") AS t, " +
          "vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d").head()
      assert(r.getString(0) == "O'Brien X2Y")
      assert(r.getDouble(1) == 11.0)
    } finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }
}
