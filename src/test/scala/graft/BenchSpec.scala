package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class BenchSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("an always-throwing query produces no timing number (None, not fast-fail time)") {
    val (best, rows, phases) = Bench.timeQuery(spark, "boom",
      (_, _) => throw new RuntimeException("injected"), "unused", reps = 2)
    assert(best.isEmpty)
    assert(rows == -1L)
    assert(phases.isEmpty)
  }

  test("a succeeding query reports min-of-reps and its row count") {
    import spark.implicits._
    val (best, rows, _) = Bench.timeQuery(spark, "ok",
      (s, _) => { import s.implicits._; Seq(1, 2, 3).toDF("x") }, "unused", reps = 2)
    assert(best.exists(_ > 0.0))
    assert(rows == 3L)
  }

  test("phase breakdown comes from the rep that won the min and sums per rep") {
    val (best, _, phases) = Bench.timeQuery(spark, "phased",
      (s, _) => {
        import s.implicits._
        // two timed calls per rep must ACCUMULATE, not min
        BenchPhases.timed("phased", "build")(Thread.sleep(5))
        BenchPhases.timed("phased", "build")(Thread.sleep(5))
        Seq(1).toDF("x")
      }, "unused", reps = 2)
    assert(best.nonEmpty)
    assert(phases.keySet == Set("build"))
    assert(phases("build") >= 0.010, s"two 5ms sleeps must sum: ${phases("build")}")
    assert(phases("build") < best.get)
  }
  test("every contract query has an oracle and vice versa (driver-gate sync)") {
    val qs = graft.SparkEntry.queries.keySet
    val os = graft.SparkEntry.oracleSql.keySet
    assert((qs -- os).isEmpty, s"queries without an oracle: ${(qs -- os).toSeq.sorted}")
    assert((os -- qs).isEmpty, s"oracles without a query: ${(os -- qs).toSeq.sorted}")
  }
}
