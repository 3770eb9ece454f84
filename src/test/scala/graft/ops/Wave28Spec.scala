package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Wave 28: stationary distribution (q220), Simpson's-paradox audit
  * (q221). */
class Wave28Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q220 math: a symmetric two-state chain lands on (0.5, 0.5) exactly") {
    import spark.implicits._
    // one user alternates a,b,a,b,... — transitions a→b and b→a only;
    // damping preserves the symmetric fixed point exactly
    val ev = (0 until 40).map(i =>
        (i.toLong, i.toLong * 1000000L, 1L, if (i % 2 == 0) "a" else "b"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = TimeSeries.stationaryDist(ev).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(got("a") == 0.5 && got("b") == 0.5, s"$got")
    // the declared query: a probability vector (sums to ~1, positive)
    val corpus = TimeSeries.q220StationaryDist(spark, dir).collect()
    val mass = corpus.map(_.getDouble(3)).sum
    assert(math.abs(mass - 1.0) < 1e-4, s"mass $mass")
    assert(corpus.forall(_.getDouble(3) > 0.0))
  }

  test("q221 math: a planted reversal flags simpson_flip on every stratum") {
    import spark.implicits._
    // within each source y falls as x rises; pooled, the big-x source
    // also has big y, so the pooled association is POSITIVE
    val xy = Seq(
      ("A", 1L, 10.0), ("A", 2L, 9.0),
      ("B", 10L, 20.0), ("B", 11L, 19.0))
      .toDF("source", "x", "y")
    val got = Correlation.simpsonOf(xy).collect()
      .map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    assert(got("A") == ((-1L, 1L, true)), s"${got("A")}")
    assert(got("B") == ((-1L, 1L, true)), s"${got("B")}")
    // the declared query runs; signs are in {-1, 0, 1} and consistent
    val corpus = Correlation.q221SimpsonAudit(spark, dir).collect()
    assert(corpus.nonEmpty)
    corpus.foreach { r =>
      assert(math.abs(r.getLong(2)) <= 1L && math.abs(r.getLong(3)) <= 1L)
      if (r.getBoolean(4))
        assert(r.getLong(2) != r.getLong(3) && r.getLong(2) != 0L)
    }
  }
}
