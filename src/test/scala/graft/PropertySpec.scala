package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.forAll
import graft.operators.Dedup

/** Property-based checks (SURVEY.md §5: BE-unit-test analogue) for the
  * expression kernels where hand-picked examples are weakest:
  * null-safety, boundary sizes, format translation. Driver-side data
  * generation + one collect per property batch keeps these fast. */
class PropertySpec extends SparkSuite {

  /** Run a ScalaCheck property under scalatest (no bridge artifact in
    * the offline cache): fewer, bigger cases — each case batches many
    * rows through one Spark job. */
  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), p)
    assert(res.passed, res.status.toString)
  }
  import spark.implicits._

  private val word = Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar)).map(_.mkString)
  private def sentenceOf(minWords: Int, maxWords: Int = 12): Gen[String] =
    Gen.chooseNum(minWords, maxWords).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
  private val sentence = sentenceOf(0)

  test("wordShingles: count = max(words - n + 1, 0) distinct-capped; all length n") {
    check(forAll(Gen.listOfN(40, sentence), Gen.chooseNum(1, 4)) { (texts, n) =>
      val rows = texts.toDF("text")
        .select(Dedup.wordShingles($"text", n).as("sh"), $"text").collect()
      Prop.all(rows.map { r =>
        val sh = r.getSeq[String](0)
        val words = r.getString(1).split("\\s+").filter(_.nonEmpty)
        val expected = words.sliding(n).filter(_.length == n).map(_.mkString(" ")).toSet
        Prop(sh.toSet == expected) :| s"text='${r.getString(1)}' n=$n got=$sh want=$expected"
      }: _*)
    })
  }

  test("minhash signature: identical texts agree, signature is order-stable") {
    check(forAll(Gen.listOfN(20, sentenceOf(3))) { texts =>
      val df = texts.toDF("text")
        .select($"text", Dedup.wordShingles($"text", 3).as("sh"))
        .select($"text", Dedup.minhashSignature($"sh", 8).as("sig"))
      val bySig = df.collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
      Prop.all(texts.map { t =>
        Prop(bySig(t).length == 8) :| "sig width"
      }: _*)
    })
  }

  test("jaccard is symmetric and bounded in [0,1]") {
    val shingleArr = Gen.listOf(word).map(_.distinct)
    check(forAll(Gen.listOfN(25, Gen.zip(shingleArr, shingleArr))) { pairs =>
      val rows = pairs.toDF("a", "b")
        .select(Dedup.jaccard($"a", $"b").as("ab"), Dedup.jaccard($"b", $"a").as("ba")).collect()
      Prop.all(rows.map { r =>
        val (ab, ba) = (r.getDouble(0), r.getDouble(1))
        Prop(ab == ba && ab >= 0.0 && ab <= 1.0) :| s"ab=$ab ba=$ba"
      }: _*)
    })
  }

  test("mysqlToJavaFormat: translated formats parse what Spark formatted") {
    // round-trip: date_format with translated pattern, then str_to_date
    // (same translation) must recover the original date
    val day = Gen.chooseNum(0, 3650)
    check(forAll(Gen.listOfN(30, day)) { days =>
      val rows = days.toDF("d")
        .select(date_add(lit("2000-01-01").cast("date"), $"d").cast("timestamp").as("ts"))
        .select($"ts", expr("str_to_date(date_format(ts, 'yyyy-MM-dd HH:mm:ss'), '%Y-%m-%d %H:%i:%s')").as("rt"))
        .collect()
      Prop.all(rows.map(r => Prop(r.get(0) == r.get(1)) :| s"${r.get(0)} != ${r.get(1)}"): _*)
    })
  }

  test("truncate matches MySQL toward-zero semantics") {
    check(forAll(Gen.chooseNum(-1000.0, 1000.0), Gen.chooseNum(0, 4)) { (x, d) =>
      val r = List(x).toDF("x").select(expr(s"truncate(x, $d)")).head.getDouble(0)
      val scale = math.pow(10, d)
      val expected = (if (x >= 0) math.floor(x * scale) else math.ceil(x * scale)) / scale
      Prop(math.abs(r - expected) < 1e-9) :| s"truncate($x,$d)=$r want $expected"
    })
  }

  test("simhash: identical texts get identical signatures; hamming to a 1-word change is small") {
    check(forAll(Gen.listOfN(10, sentenceOf(8))) { texts =>
      val df = texts.toDF("text").select(Dedup.simhash64($"text").as("s1"),
        Dedup.simhash64(concat($"text", lit(" extraword"))).as("s2"))
      val rows = df.collect()
      Prop.all(rows.map { r =>
        val ham = java.lang.Long.bitCount(r.getLong(0) ^ r.getLong(1))
        Prop(ham <= 24) :| s"1-word change moved $ham bits"
      }: _*)
    })
  }

  test("min_n/max_n equal sort-and-take on arbitrary grouped data") {
    check(forAll(Gen.listOfN(200, Gen.zip(Gen.choose(0, 5), Gen.choose(-1000, 1000))),
        Gen.choose(1, 7)) { (pairs, n) =>
      if (pairs.isEmpty) Prop.passed
      else {
        val rows = pairs.toDF("g", "v").repartition(4)
          .groupBy($"g")
          .agg(expr(s"min_n(v, $n)").as("lo"), expr(s"max_n(v, $n)").as("hi"))
          .collect().map(r => r.getInt(0) -> ((r.getSeq[Int](1), r.getSeq[Int](2)))).toMap
        Prop.all(pairs.groupBy(_._1).map { case (g, vs) =>
          val sorted = vs.map(_._2).sorted
          Prop(rows(g)._1 == sorted.take(n) && rows(g)._2 == sorted.reverse.take(n)) :|
            s"g=$g n=$n got=${rows(g)} want=(${sorted.take(n)}, ${sorted.reverse.take(n)})"
        }.toSeq: _*)
      }
    })
  }

  test("array_contains_seq equals naive sliding-window search") {
    check(forAll(Gen.listOf(Gen.choose(0, 4)), Gen.listOf(Gen.choose(0, 4))) { (hay, needle) =>
      val naive = needle.isEmpty ||
        (needle.length <= hay.length && hay.sliding(needle.length).contains(needle))
      val got = Seq((hay, needle)).toDF("h", "n")
        .selectExpr("array_contains_seq(h, n)").head.getBoolean(0)
      Prop(got == naive) :| s"hay=$hay needle=$needle got=$got want=$naive"
    })
  }

  test("weightedQuantiles equals naive weighted inverse-CDF on arbitrary data") {
    check(forAll(Gen.nonEmptyListOf(
        Gen.zip(Gen.choose(0, 2), Gen.choose(-100, 100), Gen.choose(1, 9)))) { triples =>
      val df = triples.toDF("g", "v", "w").repartition(3)
      val got = graft.operators.ExactPercentile.weightedQuantiles(
        df, Seq("g"), "v", "w", Seq("q25" -> 0.25, "q75" -> 0.75), buckets = 8)
        .collect().map(r => r.getInt(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
      def naive(vs: Seq[(Int, Int)], p: Double): Double = {
        val sorted = vs.sortBy(_._1)
        val total = sorted.map(_._2).sum.toDouble
        var cum = 0.0
        sorted.find { case (_, w) => cum += w; cum >= p * total }.get._1.toDouble
      }
      Prop.all(triples.groupBy(_._1).map { case (g, ts) =>
        val vs = ts.map(t => (t._2, t._3))
        val want = (naive(vs, 0.25), naive(vs, 0.75))
        Prop(got(g) == want) :| s"g=$g got=${got(g)} want=$want"
      }.toSeq: _*)
    })
  }

  test("ExactPercentile equals builtin percentile on arbitrary grouped data") {
    check(forAll(Gen.listOfN(300, Gen.zip(Gen.choose(0, 3), Gen.choose(-10000, 10000)))) { pairs =>
      if (pairs.isEmpty) Prop.passed
      else {
        val df = pairs.toDF("g", "v").repartition(4)
        // duplicates, tiny groups, and a degenerate all-equal group
        // are all covered by the generator over a small int domain
        val ours = graft.operators.ExactPercentile.percentiles(
          df, Seq("g"), "v", Seq("p25" -> 0.25, "p50" -> 0.5, "p99" -> 0.99),
          buckets = 16) // tiny bucket count stresses the refinement path
          .collect().map(r => r.getInt(0) -> ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
        val ref = df.groupBy($"g")
          .agg(expr("percentile(v, array(0.25d, 0.5d, 0.99d))").as("ps"))
          .collect().map(r => r.getInt(0) ->
            ((r.getSeq[Double](1)(0), r.getSeq[Double](1)(1), r.getSeq[Double](1)(2)))).toMap
        Prop.all(ref.map { case (g, want) =>
          val got = ours(g)
          def eq(a: Double, b: Double) = math.abs(a - b) <= 1e-9 * math.max(1.0, math.abs(b))
          Prop(eq(got._1, want._1) && eq(got._2, want._2) && eq(got._3, want._3)) :|
            s"g=$g got=$got want=$want"
        }.toSeq: _*)
      }
    })
  }

  test("theta count-distinct is exact on arbitrary small sets; union ≡ distinct of concat") {
    check(forAll(Gen.listOf(Gen.choose(0L, 500L)), Gen.listOf(Gen.choose(0L, 500L))) { (a, b) =>
      if (a.isEmpty || b.isEmpty) Prop.passed
      else {
        val r = a.toDF("v").agg(expr("ds_theta_sketch_agg(v)").as("sa"))
          .crossJoin(b.toDF("v").agg(expr("ds_theta_sketch_agg(v)").as("sb")))
          .select(
            expr("ds_theta_estimate(sa)"),
            expr("ds_theta_estimate(ds_theta_union(sa, sb))")).head
        Prop(r.getLong(0) == a.distinct.size.toLong &&
          r.getLong(1) == (a ++ b).distinct.size.toLong) :|
          s"got (${r.getLong(0)}, ${r.getLong(1)}), want (${a.distinct.size}, ${(a ++ b).distinct.size})"
      }
    })
  }

  test("tdigest quantiles are monotone in rank and bounded by min/max") {
    check(forAll(Gen.listOfN(300, Gen.choose(-1e6, 1e6))) { xs =>
      if (xs.isEmpty) Prop.passed
      else {
        val qs = xs.toDF("v").repartition(3)
          .agg(expr("percentile_agg(v)").as("st"))
          .select(
            expr("percentile_approx_raw(st, 0.0d)"),
            expr("percentile_approx_raw(st, 0.25d)"),
            expr("percentile_approx_raw(st, 0.5d)"),
            expr("percentile_approx_raw(st, 0.75d)"),
            expr("percentile_approx_raw(st, 1.0d)")).head
        val v = (0 until 5).map(qs.getDouble)
        Prop(v.zip(v.tail).forall { case (x, y) => x <= y } &&
          v.head == xs.min && v.last == xs.max) :| s"quantiles $v for n=${xs.size}"
      }
    })
  }

  test("count-min estimates upper-bound true counts; exact when width is ample") {
    import spark.implicits._
    import graft.operators.CountMin
    val keys = (0 until 500).map(i => s"k${i % 37}").toDF("k")
    val exact = keys.groupBy("k").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // a FORCED-collision sketch (width 8) must still never under-count
    val tight = CountMin.build(keys, "k", depth = 3, width = 8)
    CountMin.estimate(tight, keys.distinct(), "k", depth = 3, width = 8)
      .collect().foreach(r => assert(r.getLong(1) >= exact(r.getString(0))))
    // an ample sketch (37 keys in 1024 buckets x 4 rows) is exact
    val ample = CountMin.build(keys, "k", depth = 4, width = 1024)
    CountMin.estimate(ample, keys.distinct(), "k", depth = 4, width = 1024)
      .collect().foreach(r => assert(r.getLong(1) == exact(r.getString(0))))
  }

  test("count-min merge is additive; inner product never underestimates") {
    import spark.implicits._
    import graft.operators.CountMin
    val a = (0 until 300).map(i => s"k${i % 23}").toDF("k")
    val b = (0 until 200).map(i => s"k${i % 31}").toDF("k")
    // merged sketch ≡ sketch of the concatenation
    val merged = CountMin.merge(
      CountMin.build(a, "k", 4, 512), CountMin.build(b, "k", 4, 512))
    val direct = CountMin.build(a.unionByName(b), "k", 4, 512)
    val m = merged.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val d = direct.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(m === d)
    // inner product upper-bounds the true join size, even under forced collisions
    val trueSize = a.join(b, "k").count()
    val est = CountMin.innerProduct(
        CountMin.build(a, "k", 3, 8), CountMin.build(b, "k", 3, 8))
      .head.getLong(0)
    assert(est >= trueSize)
  }

  test("intervalOverlap emits each overlapping pair exactly once across bins") {
    import spark.implicits._
    import graft.operators.RangeJoin
    // spans crossing many bins (binSize 10), touching endpoints, nested,
    // disjoint, and an empty interval that must drop out
    val a = Seq((1L, 0.0, 35.0), (2L, 40.0, 41.0), (3L, 90.0, 80.0))
      .toDF("id_a", "lo_a", "hi_a")
    val b = Seq((10L, 30.0, 50.0), (11L, 35.0, 35.0), (12L, 60.0, 70.0),
      (13L, 1.0, 2.0)).toDF("id_b", "lo_b", "hi_b")
    val got = RangeJoin.intervalOverlap(a, "lo_a", "hi_a", b, "lo_b", "hi_b", 10.0)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    // 1x10 (overlap 30-35), 1x11 (touching at 35), 1x13 (nested),
    // 2x10 (nested) — each exactly once; empty interval 3 matches nothing
    assert(got.sorted.toSeq === Seq((1L, 10L), (1L, 11L), (1L, 13L), (2L, 10L)))
  }
}
