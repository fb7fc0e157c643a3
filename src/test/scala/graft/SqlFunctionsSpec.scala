package graft

/** The native expressions must be usable from plain SQL, both via
  * GraftFunctions.register and via the GraftExtensions session hook. */
class SqlFunctionsSpec extends SparkSpec {

  test("native functions callable from SQL") {
    graft.functions.GraftFunctions.register(spark)
    val sim = spark.sql(
      "SELECT cosine_sim(array(1.0f, 0.0f), array(1.0f, 0.0f)) AS s")
      .collect()(0).getDouble(0)
    assert(sim == 1.0)
    val sh = spark.sql(
      "SELECT word_shingles(array('a','b','c'), 2) AS s")
      .collect()(0).getSeq[String](0)
    assert(sh == Seq("a b", "b c"))
    val mh = spark.sql(
      "SELECT minhash_sig(array('a','b','c','d'), 4, 2, true, 0) AS s")
      .collect()(0).getSeq[String](0)
    assert(mh.length == 4 && mh.forall(_.length == 32))
    val bucket = spark.sql(
      "SELECT hyperplane_lsh(array(1.0f, -1.0f, 0.5f), 8) AS b")
      .collect()(0).getLong(0)
    assert(bucket >= 0 && bucket < 256)
  }

  test("GraftExtensions registers all four function descriptions cleanly") {
    // builder-level injection applies on session instantiation (the shared
    // test session already exists); assert the injection itself is sound
    val exts = new org.apache.spark.sql.SparkSessionExtensions
    new graft.functions.GraftExtensions()(exts) // must not throw
    // and the injected builders construct valid expressions
    import org.apache.spark.sql.catalyst.expressions.Literal
    val expr = graft.functions.CosineSimilarity(
      Literal.create(Array(1f, 0f)), Literal.create(Array(1f, 0f)))
    assert(expr.checkInputDataTypes().isSuccess)
    assert(expr.eval(null) == 1.0)
  }
}
