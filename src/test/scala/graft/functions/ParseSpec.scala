package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.{Fixtures, SparkSpec}
import graft.etl.Enrich

class ParseSpec extends SparkSpec {

  /** Run a ScalaCheck property and fail the suite on falsification
    * (scalatestplus bridge isn't on the offline classpath). */
  private def check(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(r.passed, r.status.toString)
  }

  private def toks(line: String): Seq[String] =
    S3LogParse.tokenize(UTF8String.fromString(line)).toSeq[UTF8String](
      org.apache.spark.sql.types.StringType).map(_.toString)

  test("tokenizer: happy-path line yields 24 fields, quotes/brackets stripped") {
    val t = toks(Fixtures.happyLine)
    assert(t.length == 24)
    assert(t(2) == "18/Jul/2021:05:00:01 +0000")     // brackets stripped
    assert(t(8) == "GET /awsexamplebucket1/photos/2021/puppy.jpg?x-foo=bar HTTP/1.1")
    assert(t(16) == "curl/7.68.0")
    assert(t(23) == "TLSv1.2")
  }

  test("tokenizer: quoted fields with spaces stay one token") {
    val t = toks("""a "two words" [18/Jul/2021:05:00:01 +0000] b""")
    assert(t == Seq("a", "two words", "18/Jul/2021:05:00:01 +0000", "b"))
  }

  test("ipv4ToLong: known values and invalid inputs") {
    def ip(s: String) = S3LogParse.ipv4ToLong(UTF8String.fromString(s))
    assert(ip("192.0.2.3") == 3221225987L)           // FIXTURES.md §1.1
    assert(ip("0.0.0.0") == 0L)
    assert(ip("255.255.255.255") == 4294967295L)
    assert(ip("2001:db8::1") == -1L)
    assert(ip("1.2.3") == -1L)
    assert(ip("1.2.3.4.5") == -1L)
    assert(ip("1.2.3.256") == -1L)
    assert(ip("") == -1L)
    assert(ip("a.b.c.d") == -1L)
  }

  test("ipv4ToLong property: (a<<24)+(b<<16)+(c<<8)+d for all octets") {
    val octet = Gen.choose(0, 255)
    check(Prop.forAll(octet, octet, octet, octet) { (a: Int, b: Int, c: Int, d: Int) =>
      S3LogParse.ipv4ToLong(UTF8String.fromString(s"$a.$b.$c.$d")) ==
        (a.toLong << 24) + (b.toLong << 16) + (c.toLong << 8) + d
    })
  }

  test("tokenizer property: never splits inside quotes or brackets") {
    val word = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
    check(Prop.forAll(word, word) { (w1: String, w2: String) =>
      toks(s"""x "$w1 $w2" [$w1 $w2] y""") ==
        Seq("x", s"$w1 $w2", s"$w1 $w2", "y")
    })
  }

  test("enrichment: derived columns match FIXTURES.md expected values") {
    import spark.implicits._
    val df = Enrich.parseLines(
      Seq(Fixtures.happyLine, Fixtures.dashLine, Fixtures.roleLine).toDF("value"))
    assert(df.schema == graft.etl.LogSchema.schema)
    val rows = df.orderBy("requestdatetime").collect()

    val happy = rows(0)
    assert(happy.getAs[Long]("ts") == 1626584401L)
    assert(happy.getAs[Long]("year") == 2021L)
    assert(happy.getAs[Int]("month") == 7)
    assert(happy.getAs[Int]("day") == 18)
    assert(happy.getAs[Int]("hour") == 5)
    assert(happy.getAs[Int]("minute") == 0)
    assert(happy.getAs[Int]("second") == 1)
    assert(happy.getAs[String]("datetime") == "2021-07-18T05:00:01+00:00")
    assert(happy.getAs[Long]("remoteip_int") == 3221225987L)
    assert(!happy.getAs[Boolean]("is_assumed_role"))
    assert(happy.getAs[Boolean]("is_user"))
    assert(happy.getAs[Long]("bytessent") == 2662992L)
    assert(happy.getAs[Long]("objectsize") == 3462992L)
    assert(happy.getAs[Long]("totaltime") == 70L)
    assert(happy.getAs[Long]("turnaroundtime") == 10L)

    val dash = rows(1)
    assert(dash.getAs[Long]("bytessent") == 242L)
    assert(dash.getAs[Long]("objectsize") == 0L)     // dash → 0, not NULL
    assert(dash.getAs[Long]("totaltime") == 0L)
    assert(dash.getAs[Long]("turnaroundtime") == 0L)
    assert(!dash.getAs[Boolean]("is_assumed_role"))
    assert(!dash.getAs[Boolean]("is_user"))
    assert(dash.getAs[String]("httpstatus") == "200") // stays string

    val role = rows(2)
    assert(role.getAs[Boolean]("is_assumed_role"))
    assert(!role.getAs[Boolean]("is_user"))           // plain substring semantics
    assert(role.getAs[String]("operation") == "REST.PUT.OBJECT")
  }

  test("rolling_hash64: deterministic, sensitive to every byte, codegen == interpreted") {
    import spark.implicits._
    def ref(s: String): Long =
      s.getBytes("UTF-8").foldLeft(1469598103934665603L)((h, b) => h * 1000003L + (b & 0xffL))
    val texts = Seq("", "a", "ab", "ba", "hello world", "hello worle")
    val got = texts.toDF("t").select(exprs.rolling_hash64($"t")).collect().map(_.getLong(0))
    assert(got.toSeq == texts.map(ref))
    assert(got.distinct.length == texts.length) // all inputs hash differently
  }

  test("native cosine expression is bit-identical to the HOF formulation") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = emb.filter(org.apache.spark.sql.functions.col("vec_id") < 3)
      .select(org.apache.spark.sql.functions.col("embedding").as("qe"),
        org.apache.spark.sql.functions.col("vec_id").as("qid"))
    val pairs = emb.crossJoin(q)
    val diffs = pairs.select(
        graft.ops.Similarity.cosine(
          org.apache.spark.sql.functions.col("qe"),
          org.apache.spark.sql.functions.col("embedding")).as("native"),
        graft.ops.Similarity.cosineHof(
          org.apache.spark.sql.functions.col("qe"),
          org.apache.spark.sql.functions.col("embedding")).as("hof"))
      .filter("native <> hof").count()
    assert(diffs == 0L)
  }

  test("malformed lines degrade to nulls instead of killing the job") {
    import spark.implicits._
    val rows = Enrich.parseLines(Seq(
      "too short",                       // 2 tokens
      "",                                // empty line
      "a b [not-a-timestamp] 1.2.3.4 r") // bad timestamp, 5 tokens
      .toDF("value")).collect()
    assert(rows.length == 3)
    // no exception; missing positions and unparseable derivations are null
    val short = rows.find(_.getAs[String]("bucketowner") == "too").get
    assert(short.getAs[String]("bucket_name") == "short")
    assert(short.isNullAt(short.fieldIndex("requestdatetime")))
    assert(short.isNullAt(short.fieldIndex("ts")))
    val bad = rows.find(_.getAs[String]("bucketowner") == "a").get
    assert(bad.getAs[String]("requestdatetime") == "not-a-timestamp")
    assert(bad.isNullAt(bad.fieldIndex("ts")))          // unparseable → null
    assert(bad.getAs[Long]("remoteip_int") == 16909060L) // valid IP still derived
  }

  test("ipv4 strict mode fails the job, lenient yields NULL (SURVEY §1.4#5)") {
    import spark.implicits._
    val df = Seq("2001:db8::1").toDF("ip")
    assert(df.select(exprs.ipv4_to_long($"ip")).collect()(0).isNullAt(0))
    intercept[Exception] {
      df.select(exprs.ipv4_to_long_strict($"ip")).collect()
    }
  }
}
