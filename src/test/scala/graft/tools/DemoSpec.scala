package graft.tools

import graft.SparkSpec

/** The library-API demo (ARCHITECTURE.md "Library API" section) must stay
  * runnable: Demo.run chains the reference's whole lifecycle — CSV/XLSX/
  * JSONL feeds → Pipeline.run → parquet + Derby-JDBC load with PK assert →
  * Quality profile — with a `require` at every stage, so invoking it IS
  * the assertion. A user following the docs gets exactly this path. */
class DemoSpec extends SparkSpec {
  test("the end-to-end library demo round-trips every lifecycle stage") {
    Demo.run(spark, "/root/testdata/sf0.001")
  }
}
