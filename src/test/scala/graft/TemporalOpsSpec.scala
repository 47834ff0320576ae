package graft

import org.apache.spark.sql.functions._
import graft.operators.{AsOfJoin, Sessionize, TextAnalysis}

/** Sessionize + AsOfJoin semantics on hand-built edge cases, plus a
  * differential test of the union-sort-carry as-of plan against a naive
  * per-probe argmax over seeded random data.
  */
class TemporalOpsSpec extends SparkSpec {
  import testImplicits._

  private lazy val testImplicits = spark.implicits

  test("sessionize splits on strict gap and numbers sessions per key") {
    // key 1: gaps 5,10(=gap→same),11(>gap→new) ; key 2: single event
    val df = Seq(
      (1L, 0L, 100L), (1L, 5L, 101L), (1L, 15L, 102L),
      (1L, 26L, 103L), (2L, 7L, 200L)
    ).toDF("k", "t", "id")
    val out = Sessionize.sessionize(df, "k", "t", "id", gap = 10L)
      .select("k", "id", "session_idx").as[(Long, Long, Long)].collect().toSet
    assert(out === Set(
      (1L, 100L, 1L), (1L, 101L, 1L), (1L, 102L, 1L),
      (1L, 103L, 2L), (2L, 200L, 1L)))
  }

  test("sessionize breaks equal-time ties by ord deterministically") {
    val df = Seq((1L, 0L, 2L), (1L, 0L, 1L), (1L, 100L, 3L)).toDF("k", "t", "id")
    val out = Sessionize.sessionize(df, "k", "t", "id", gap = 10L)
      .select("id", "session_idx").as[(Long, Long)].collect().toSet
    assert(out === Set((1L, 1L), (2L, 1L), (3L, 2L)))
  }

  test("asOf matches most recent build row, includes equal-ts, left-outer") {
    val probe = Seq((1L, 10L, 100L), (1L, 20L, 101L), (1L, 5L, 102L),
      (2L, 50L, 103L)).toDF("k", "t", "id")
    val build = Seq((1L, 10L, 900L, "a"), (1L, 15L, 901L, "b"))
      .toDF("k", "t", "id", "payload").withColumn("bid", col("id"))
    val out = AsOfJoin.asOf(probe, build, "k", "t", "id")
      .select("id", "bid", "payload")
      .as[(Long, Option[Long], Option[String])].collect().toSet
    assert(out === Set(
      (100L, Some(900L), Some("a")), // equal ts: build visible
      (101L, Some(901L), Some("b")), // most recent, not first
      (102L, None, None),            // before any build row
      (103L, None, None)))           // key with no build rows
  }

  test("asOf equal-ts build rows tie-break to greatest ord") {
    val probe = Seq((1L, 10L, 100L)).toDF("k", "t", "id")
    val build = Seq((1L, 10L, 900L, "lo"), (1L, 10L, 901L, "hi"))
      .toDF("k", "t", "id", "payload").withColumn("bid", col("id"))
    val out = AsOfJoin.asOf(probe, build, "k", "t", "id")
      .select("bid", "payload").as[(Long, String)].collect().toSeq
    assert(out === Seq((901L, "hi")))
  }

  test("asOf differential: union-sort-carry equals naive per-probe argmax") {
    val rnd = new scala.util.Random(42)
    val probe = (0 until 300).map(i =>
      (rnd.nextInt(8).toLong, rnd.nextInt(1000).toLong, i.toLong))
    val build = (0 until 200).map(i =>
      (rnd.nextInt(8).toLong, rnd.nextInt(1000).toLong, (1000 + i).toLong))
    val probeDf = probe.toDF("k", "t", "id")
    val buildDf = build.toDF("k", "t", "id")
      .withColumn("bid", col("id")).withColumn("bval", col("id") * 7)
    val got = AsOfJoin.asOf(probeDf, buildDf, "k", "t", "id")
      .select("id", "bid", "bval")
      .as[(Long, Option[Long], Option[Long])].collect().toMap2
    val naive = probe.map { case (k, t, id) =>
      val cands = build.filter(b => b._1 == k && b._2 <= t)
      val best = if (cands.isEmpty) None
      else Some(cands.maxBy(b => (b._2, b._3))._3)
      id -> ((best, best.map(_ * 7)))
    }.toMap
    assert(got === naive)
  }

  test("rangeJoin differential: bucketed two-probe equals naive range scan") {
    val rnd = new scala.util.Random(7)
    val w = 100L
    val probe = (0 until 250).map(i =>
      (rnd.nextInt(6).toLong, rnd.nextInt(2000).toLong, i.toLong))
    val build = (0 until 400).map(i =>
      (rnd.nextInt(6).toLong, rnd.nextInt(2000).toLong, (5000 + i).toLong))
    val probeDf = probe.toDF("k", "t", "id")
    val buildDf = build.toDF("k", "bt", "bid")
      .withColumnRenamed("k", "k") // build key column name must match
    val got = graft.operators.RangeJoin
      .joinPreceding(probeDf, buildDf, "k", "t", "bt", w)
      .select("id", "bid").as[(Long, Long)].collect().toSet
    val naive = (for {
      (pk, pt, pid) <- probe
      (bk, bt, bid) <- build
      if pk == bk && bt >= pt - w && bt <= pt
    } yield (pid, bid)).toSet
    assert(got === naive)
    // no duplicate pairs from the two-bucket probe replication
    val gotSeq = graft.operators.RangeJoin
      .joinPreceding(probeDf, buildDf, "k", "t", "bt", w)
      .select("id", "bid").as[(Long, Long)].collect().toSeq
    assert(gotSeq.size === gotSeq.distinct.size)
  }

  test("temporal ops are invariant under input repartitioning") {
    // the determinism contract behind the EVAL scale runs: arbitrary
    // input partitioning must not change a single output row
    val rnd = new scala.util.Random(13)
    val ev = (0 until 500).map(i =>
      (rnd.nextInt(10).toLong, rnd.nextInt(5000).toLong, i.toLong, rnd.nextInt(100) / 10.0))
    val df1 = ev.toDF("k", "t", "id", "v")
    val df2 = df1.repartition(17, col("v")) // partition by a NON-key column
    def sess(df: org.apache.spark.sql.DataFrame) =
      Sessionize.sessionize(df, "k", "t", "id", gap = 50L)
        .select("k", "id", "session_idx").as[(Long, Long, Long)].collect().toSet
    assert(sess(df1) === sess(df2))
    val probe = df1.filter(col("id") % 2 === 0).select("k", "t", "id")
    val build = df1.filter(col("id") % 2 === 1)
      .select(col("k"), col("t"), col("id"), col("id").as("bid"))
    def asof(p: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame) =
      AsOfJoin.asOf(p, b, "k", "t", "id")
        .select("id", "bid").as[(Long, Option[Long])].collect().toSet
    assert(asof(probe, build) ===
      asof(probe.repartition(7), build.repartition(11)))
  }

  test("scoring kernel is BIT-EXACT vs the column formulation on the corpus") {
    // the kernel serves the oracle rows AND the topk ordering, so it must
    // match the HOF/SQL arithmetic exactly (raw doubles, not rounded),
    // on the real sf table plus adversarial edge strings
    val docs = sf("sf0.01", "documents").select(col("doc_id"), col("text"))
      .unionByName(Seq(
        (100001L, ""), (100002L, "   "), (100003L, "\tthe a\n"),
        (100004L, "der die das der die das"), (100005L, "el y the a 的 了"),
        (100006L, "x!@#$%^&*()"), (100007L, "le les et the a and of to")
      ).toDF("doc_id", "text"))
    val toks = TextAnalysis.tokens(col("text"))
    val (pred, best) = TextAnalysis.langId(toks)
    val hof = docs.select(col("doc_id"),
      TextAnalysis.qualityScore(col("text")).as("q"), pred.as("l"), best.as("s"))
    val kern = docs.select(col("doc_id"),
      TextAnalysis.docScores(col("text")).as("sc"))
      .select(col("doc_id"), col("sc.quality").as("q"),
        col("sc.lang").as("l"), col("sc.lang_score").as("s"))
    val a = hof.as[(Long, Double, String, Double)].collect().sortBy(_._1)
    val b = kern.as[(Long, Double, String, Double)].collect().sortBy(_._1)
    assert(a.length === b.length)
    a.zip(b).foreach { case (x, y) => assert(x === y, s"mismatch: $x vs $y") }
  }

  test("boilerplateGrams equals SQL-side distinct-gram doc frequency") {
    val docs = Seq(
      (0L, "a b c d e f g"), (1L, "a b c d e x y"),
      (2L, "a b c d e"), (3L, "z z z z z z z z")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.boilerplateGrams(docs, "text", w = 5, minDf = 2)
      .as[(String, Long)].collect().toMap
    // "a b c d e" appears (distinct per doc) in docs 0,1,2; "z z z z z"
    // appears in doc 3 only once after distinct → below minDf
    assert(out === Map("a b c d e" -> 3L))
  }

  test("jsonProps parses the typed field with from_json") {
    val df = Seq(("click", """{"k": 3}"""), ("click", """{"k": 4}"""),
      ("view", "not json")).toDF("event_type", "props")
      .select(col("event_type"),
        from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k LONG"))
          .getField("k").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("cnt"), count(col("k")).as("parsed"),
        sum(col("k")).as("sum_k"))
      .as[(String, Long, Long, Option[Long])].collect().toSet
    assert(df === Set(("click", 2L, 2L, Some(7L)), ("view", 1L, 0L, None)))
  }

  test("rangeJoin handles negative (pre-epoch) timestamps — floor bucketing") {
    // `div` truncates toward zero; the bucket expression must FLOOR, or a
    // build row at a negative ts lands in a bucket neither probe replica
    // covers and the match silently disappears (round-7 ADVICE).
    val rnd = new scala.util.Random(21)
    val w = 100L
    val probe = (0 until 200).map(i =>
      (rnd.nextInt(4).toLong, (rnd.nextInt(2000) - 1000).toLong, i.toLong))
    val build = (0 until 300).map(i =>
      (rnd.nextInt(4).toLong, (rnd.nextInt(2000) - 1000).toLong, (9000 + i).toLong))
    val got = graft.operators.RangeJoin
      .joinPreceding(probe.toDF("k", "t", "id"), build.toDF("k", "bt", "bid"),
        "k", "t", "bt", w)
      .select("id", "bid").as[(Long, Long)].collect().toSet
    val naive = (for {
      (pk, pt, pid) <- probe
      (bk, bt, bid) <- build
      if pk == bk && bt >= pt - w && bt <= pt
    } yield (pid, bid)).toSet
    assert(got === naive)
    // the specific failure shape: probe at t=0 must see build at bt=-1
    val one = graft.operators.RangeJoin
      .joinPreceding(Seq((1L, 0L, 1L)).toDF("k", "t", "id"),
        Seq((1L, -1L, 2L)).toDF("k", "bt", "bid"), "k", "t", "bt", w)
      .select("id", "bid").as[(Long, Long)].collect().toSet
    assert(one === Set((1L, 2L)))
  }

  private implicit class SeqToMap2[A, B, C](s: Array[(A, B, C)]) {
    def toMap2: Map[A, (B, C)] = s.map(x => x._1 -> ((x._2, x._3))).toMap
  }

  test("funnel: strict ordering — steps only count after the previous step's min time") {
    val dir = tmpDir("graft-funnel")
    def ts(us: Long) = new java.sql.Timestamp(us / 1000)
    Seq(
      (1L, "view", ts(10000000L)), (1L, "click", ts(20000000L)), (1L, "purchase", ts(30000000L)),
      (2L, "click", ts(5000000L)), (2L, "view", ts(10000000L)),      // click BEFORE view: no conversion
      (3L, "view", ts(10000000L)), (3L, "purchase", ts(15000000L)),  // purchase before click: not counted
      (3L, "click", ts(20000000L)),
      (4L, "error", ts(10000000L)),                                  // never enters the funnel
      (5L, "view", ts(10000000L)), (5L, "click", ts(10000000L))      // same instant: strict > excludes
    ).toDF("user_id", "event_type", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = graft.queries.Queries.funnelSteps(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getInt(4),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(out(1L) == ((3, 10000000L, 20000000L, 30000000L)))
    assert(out(2L) == ((1, 10000000L, -1L, -1L)), "pre-view click must not convert")
    assert(out(3L) == ((2, 10000000L, 20000000L, -1L)), "pre-click purchase must not convert")
    assert(out(4L) == ((0, -1L, -1L, -1L)))
    assert(out(5L) == ((1, 10000000L, -1L, -1L)), "same-instant step is not strictly after")
  }
}
