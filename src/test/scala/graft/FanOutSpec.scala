package graft

import org.apache.spark.sql.functions._

/** Round-13 optimization pins.
  *
  * 1. [[operators.FanOut]] — the unsplittable-input remedy must (a) widen
  *    an under-partitioned frame to the cluster's defaultParallelism, (b)
  *    leave an already-wide frame structurally UNTOUCHED (the production
  *    no-op guarantee: at scale the scan has enough splits and the
  *    exchange must not exist), and (c) never change row content.
  *
  * 2. [[SparkEntry.copurchasePairCounts]] — the basket-explode rewrite of
  *    the co-purchase edge build must produce the IDENTICAL (pa, pb, cm)
  *    multiset as the orderkey self-join it replaced, including the two
  *    tricky cases: a part appearing twice in one order (contributes no
  *    self-pair, but doubles its pairs with every other part in the
  *    order) and support counting across orders.
  */
class FanOutSpec extends SparkSpec {

  import spark.implicits._

  test("FanOut widens an under-partitioned frame to defaultParallelism") {
    val df = (1 to 100).toDF("x").coalesce(1)
    assert(df.rdd.getNumPartitions == 1)
    val out = operators.FanOut(df)
    assert(out.rdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism)
    assert(out.select(sum($"x")).as[Long].head() == 5050L)
  }

  test("FanOut is a structural no-op on an already-wide frame") {
    val p = spark.sparkContext.defaultParallelism
    val df = (1 to 100).toDF("x").repartition(p + 2)
    val out = operators.FanOut(df)
    // same object: no repartition node was added at all
    assert(out eq df)
  }

  test("basket-explode pair counts == orderkey self-join pair counts") {
    // order 1: parts 10,20,30; order 2: parts 10,20 (pair support 2);
    // order 3: part 40 twice + 50 (duplicate part: no (40,40) pair,
    // but (40,50) counted TWICE); order 4: singleton (no pairs);
    // order 5: parts 20,10 (reversed arrival order, canonical pa<pb)
    val li = Seq(
      (1L, 10L), (1L, 20L), (1L, 30L),
      (2L, 10L), (2L, 20L),
      (3L, 40L), (3L, 40L), (3L, 50L),
      (4L, 60L),
      (5L, 20L), (5L, 10L)
    ).toDF("l_orderkey", "l_partkey")
    val basket = SparkEntry.copurchasePairCounts(li)
      .orderBy($"pa", $"pb")
      .as[(Long, Long, Long)].collect().toSeq
    // reference: the replaced self-join formulation, verbatim
    val a = li.select($"l_orderkey".as("ok"), $"l_partkey".as("pa"))
    val b = li.select($"l_orderkey".as("ok"), $"l_partkey".as("pb"))
    val ref = a.join(b, Seq("ok")).filter($"pa" < $"pb")
      .groupBy($"pa", $"pb").agg(count(lit(1)).as("cm"))
      .orderBy($"pa", $"pb")
      .as[(Long, Long, Long)].collect().toSeq
    assert(basket == ref)
    assert(basket.contains((40L, 50L, 2L)))   // duplicate-part doubling
    assert(basket.contains((10L, 20L, 3L)))   // support across orders
    assert(!basket.exists(t => t._1 == t._2)) // no self-pairs
  }

  test("copurchaseEdges keeps only support>=2 pairs, src < dst") {
    val li = Seq(
      (1L, 10L), (1L, 20L),
      (2L, 10L), (2L, 20L),
      (3L, 10L), (3L, 30L)
    ).toDF("l_orderkey", "l_partkey")
    val edges = SparkEntry.copurchaseEdges(li)
      .as[(Long, Long)].collect().toSet
    assert(edges == Set((10L, 20L)))
  }
}
