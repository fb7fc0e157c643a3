package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.mutable

/** Pins the round-6 postmortem contract of the bench harness: a failed
  * query pass is an ERROR, never a measurement. When the driver's timeout
  * shut the SparkContext down mid-pass, every remaining query "ran" in
  * ~5 ms as an instant failure and min-of-N preferred that over the real
  * pass-1 time — 177/299 recorded large entries were garbage. These specs
  * make that class of artifact impossible to re-record. */
class BenchSpec extends SparkSpec {

  private val good: (SparkSession, String) => DataFrame =
    (s, _) => s.range(10).toDF("v")
  private val bad: (SparkSession, String) => DataFrame =
    (_, _) => throw new RuntimeException("boom: injected failure")
  // fails only while the flag is set — models a query that dies in pass 1
  // (context shutting down) but would succeed in a later healthy pass
  private object Flaky {
    @volatile var failing = true
  }
  private val flaky: (SparkSession, String) => DataFrame =
    (s, _) =>
      if (Flaky.failing) throw new RuntimeException("boom: transient")
      else s.range(5).toDF("v")

  test("a failed pass records NO per-query min — only an errors entry") {
    val acc = mutable.Map[String, Double]()
    val errors = mutable.Map[String, String]()
    val completed = Bench.runSuite(spark, "/unused", Seq("ok", "fail"),
      Map("ok" -> good, "fail" -> bad), nRuns = 2, acc, errors)
    assert(completed, "a query failure must not abort the suite")
    assert(acc.contains("ok") && acc("ok") > 0.0)
    assert(!acc.contains("fail"),
      "failure wall-clock must never enter the min — the round-6 poison")
    assert(errors("fail").contains("boom"))
  }

  test("a pass that fails then succeeds records only the SUCCESSFUL time") {
    val acc = mutable.Map[String, Double]()
    val errors = mutable.Map[String, String]()
    Flaky.failing = true
    // pass 1: flaky throws (instant — the poison candidate); flip the
    // flag via the observer query that runs after it in the same pass
    val flip: (SparkSession, String) => DataFrame =
      (s, _) => { Flaky.failing = false; s.range(1).toDF("v") }
    Bench.runSuite(spark, "/unused", Seq("aflaky", "zflip"),
      Map("aflaky" -> flaky, "zflip" -> flip), nRuns = 2, acc, errors)
    // pass-2 success is the ONLY recorded time; the instant pass-1
    // failure must not have seeded a ~0 ms min
    assert(acc.contains("aflaky"))
    val healthy = {
      val t0 = System.nanoTime(); good(spark, "").count()
      (System.nanoTime() - t0) / 1e9
    }
    assert(acc("aflaky") > healthy / 50.0,
      s"min ${acc("aflaky")} looks like a recorded failure time")
    assert(errors.contains("aflaky")) // the pass-1 failure stays visible
  }

  test("an expired deadline aborts between queries, keeping prior entries") {
    val acc = mutable.Map[String, Double]()
    val errors = mutable.Map[String, String]()
    val completed = Bench.runSuite(spark, "/unused", Seq("a", "b"),
      Map("a" -> good, "b" -> good), nRuns = 1, acc, errors,
      deadlineNanos = System.nanoTime() - 1L)
    assert(!completed && acc.isEmpty,
      "nothing may be timed after the budget deadline")
    // entries recorded BEFORE the deadline survive an abort
    val acc2 = mutable.Map[String, Double]("a" -> 1.23)
    val c2 = Bench.runSuite(spark, "/unused", Seq("b"),
      Map("b" -> good), nRuns = 1, acc2, errors,
      deadlineNanos = System.nanoTime() - 1L)
    assert(!c2 && acc2 == mutable.Map("a" -> 1.23))
  }

  test("min-of-N folds successful passes only") {
    val acc = mutable.Map[String, Double]()
    val errors = mutable.Map[String, String]()
    Bench.runSuite(spark, "/unused", Seq("ok"), Map("ok" -> good),
      nRuns = 3, acc, errors)
    assert(acc("ok") > 0.0 && errors.isEmpty)
  }
}
