package graft

import org.apache.spark.sql.functions._
import graft.operators.{InvertedIndex, TextAnalysis}

class TextAnalysisSpec extends SparkSuite {
  import spark.implicits._

  test("piiScrub redacts emails, phones and IPv4 with typed placeholders") {
    val rows = Seq(
      (1L, "write to alice.smith+tag@sub.example.co.uk today"),
      (2L, "host 10.0.0.1 and 255.255.255.255 respond"),
      (3L, "dial 555-867-5309 or 555-000-1111"),
      (4L, "mixed bob@x.io at 192.168.1.1 call 123-456-7890"),
      (5L, "clean text with no secrets"),
      (6L, "not-an-ip 1.2.3 and version 1.2.3.4.5 edge")
    ).toDF("id", "t")
    val out = rows.select($"id", TextAnalysis.piiScrub($"t").as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === "write to [EMAIL] today")
    assert(out(2L) === "host [IP] and [IP] respond")
    assert(out(3L) === "dial [PHONE] or [PHONE]")
    assert(out(4L) === "mixed [EMAIL] at [IP] call [PHONE]")
    assert(out(5L) === "clean text with no secrets")
    // 1.2.3 is not an IPv4; 1.2.3.4.5 contains a 4-octet window that the
    // word-boundary pattern matches up to the 4th octet — documented
    // greedy behavior, never leaks a full address
    assert(!out(6L).contains("1.2.3.4"))
  }

  test("repetitionMetrics counts bigrams and duplicated-bigram fraction") {
    val rows = Seq(
      (1L, "a b a b a b"),   // bigrams: ab ba ab ba ab → 5 total, 2 distinct
      (2L, "x y z"),         // 2 distinct of 2
      (3L, "solo"),          // no bigrams → absent
      (4L, "")               // no words → absent
    ).toDF("id", "t")
    val m = TextAnalysis.repetitionMetrics(rows, "id", "t")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(m(1L)._1 === 5L)
    assert(m(1L)._2 === 3L) // "a b" appears 3 times
    assert(math.abs(m(1L)._3 - (1.0 - 2.0 / 5.0)) < 1e-12)
    assert(m(2L) === ((2L, 1L, 0.0)))
    assert(!m.contains(3L) && !m.contains(4L))
  }

  test("gopherQuality keep flag reflects thresholds; degenerate docs kept out") {
    val good = (1 to 60).map(i => s"w$i the of and").mkString(" ") // stopwords present, varied
    val repetitive = Seq.fill(100)("spam eggs").mkString(" ")      // dup_bigram_frac ≈ 1
    val tiny = "too short"
    val rows = Seq((1L, good), (2L, repetitive), (3L, tiny)).toDF("id", "t")
    val out = TextAnalysis.gopherQuality(rows, "id", "t")
      .select($"id", $"keep").collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(out(1L), "varied doc with stopwords must be kept")
    assert(!out(2L), "high bigram repetition must be filtered")
    assert(!out(3L), "sub-minimum word count must be filtered")
  }

  test("stripBoilerplate drops high-doc-frequency lines, keeps order, keeps empty docs") {
    val docs = (1L to 20L).map { i =>
      val body = s"unique body $i"
      // 'header' in all docs; 'footer' in half; doc 20 is ALL boilerplate
      val t = if (i == 20L) "header ||| footer"
      else if (i % 2 == 0) s"header ||| $body ||| footer"
      else s"header ||| $body"
      (i, t)
    }.toDF("id", "t")
    val out = TextAnalysis.stripBoilerplate(docs, "id", "t",
        sepRegex = " \\|\\|\\| ", sepOut = " ||| ", maxDocFrac = 0.3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.size === 20, "every doc must survive, even if emptied")
    assert(out(20L) === "", "all-boilerplate doc becomes empty, not dropped")
    assert(out(3L) === "unique body 3")
    assert(out(4L) === "unique body 4", "footer and header both exceed 30% doc frequency")
    // below-threshold lines stay, in original order (2 docs so each
    // distinct line's doc-frequency 1 is under the 0.99×2 threshold)
    val rare = Seq((100L, "alpha ||| beta ||| gamma"), (101L, "delta"))
      .toDF("id", "t")
    val keepAll = TextAnalysis.stripBoilerplate(rare, "id", "t",
        " \\|\\|\\| ", " ||| ", maxDocFrac = 0.99)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(keepAll(100L) === "alpha ||| beta ||| gamma")
  }

  test("stratifiedSample: deterministic, per-stratum rates, stable under reorder") {
    val docs = table("documents").select($"doc_id", $"source")
    val rates = Map("src0" -> 1.0, "src1" -> 0.0)
    val out = TextAnalysis.stratifiedSample(docs, "source", "doc_id", rates, defaultRate = 0.5)
    val bySource = out.groupBy($"source")
      .agg(count(lit(1)).as("n"), sum(when($"sampled", 1L).otherwise(0L)).as("k"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val m = bySource.map { case (s, n, k) => s -> ((n, k)) }.toMap
    assert(m("src0")._1 === m("src0")._2, "rate 1.0 keeps everything")
    assert(m("src1")._2 === 0L, "rate 0.0 keeps nothing")
    // default-rate strata land near 50% (stable hash, not exact)
    val (dn, dk) = m.collect { case (s, (n, k)) if s != "src0" && s != "src1" => (n, k) }
      .foldLeft((0L, 0L)) { case ((an, ak), (n, k)) => (an + n, ak + k) }
    assert(dk > dn * 0.3 && dk < dn * 0.7, s"default-rate kept $dk of $dn")
    // determinism: same input (reordered) → identical sampled ids
    val again = TextAnalysis.stratifiedSample(
      docs.orderBy($"doc_id".desc), "source", "doc_id", rates, defaultRate = 0.5)
    val a = out.filter($"sampled").select($"doc_id").collect().map(_.getLong(0)).toSet
    val b = again.filter($"sampled").select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(a === b)
  }

  test("temperatureMix: T=1 keeps natural shares, T<1 flattens toward uniform, targets sum ~budget") {
    val docs = table("documents").select($"doc_id", $"lang")
    val natural = TextAnalysis.temperatureMix(docs, "lang", 1.0, 1000000L)
      .collect().map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3), r.getLong(4))).toMap
    natural.values.foreach { case (raw, temp, _) =>
      assert(math.abs(raw - temp) < 1e-9, "T=1 must keep natural proportions") }
    val flat = TextAnalysis.temperatureMix(docs, "lang", 0.5, 1000000L)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    val rawShares = natural.view.mapValues(_._1).toMap
    val maxLang = rawShares.maxBy(_._2)._1
    val minLang = rawShares.minBy(_._2)._1
    assert(flat(maxLang) < rawShares(maxLang), "dominant stratum is downweighted")
    assert(flat(minLang) > rawShares(minLang), "rare stratum is upweighted")
    val targetSum = TextAnalysis.temperatureMix(docs, "lang", 0.7, 1000000L)
      .agg(sum($"target_docs")).head().getLong(0)
    assert(math.abs(targetSum - 1000000L) <= 5L, s"targets sum to ~budget, got $targetSum")
  }

  test("frequencyCap: per-stratum cap with deterministic prefer/tie order") {
    val docs = table("documents").select($"doc_id", $"lang", $"n_chars")
    val out = TextAnalysis.frequencyCap(docs, "lang", "doc_id", $"n_chars", 10)
    val kept = out.filter($"kept")
    val perLang = kept.groupBy($"lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perLang.values.forall(_ <= 10), "no stratum exceeds the cap")
    // kept set = top-10 by (n_chars desc, doc_id asc) recomputed independently
    val en = docs.filter($"lang" === "en")
      .orderBy($"n_chars".desc, $"doc_id").limit(10)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    val enKept = kept.filter($"lang" === "en")
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(enKept === en)
    // a cap above the stratum size keeps everything
    val loose = TextAnalysis.frequencyCap(docs, "lang", "doc_id", $"n_chars", 1000000)
    assert(loose.filter(!$"kept").count() === 0L)
  }

  test("shuffleKey: deterministic per seed, different across seeds, order-independent") {
    val docs = table("documents").select($"doc_id")
    def order(seed: String, d: org.apache.spark.sql.DataFrame): Seq[Long] =
      d.select($"doc_id", TextAnalysis.shuffleKey($"doc_id", seed).as("k"))
        .orderBy($"k").collect().map(_.getLong(0)).toSeq
    val a = order("s1", docs)
    val b = order("s1", docs.orderBy($"doc_id".desc))
    assert(a === b, "same seed → same global order regardless of input layout")
    val c = order("s2", docs)
    assert(a !== c, "different seed → different order")
    assert(a.sorted === c.sorted, "a permutation, not a filter")
  }

  test("inverted-index MATCH equals the unindexed fallback predicate") {
    import graft.operators.InvertedIndex
    val docs = table("documents")
    val postings = InvertedIndex.build(docs, "doc_id", "text")
    val terms = Seq("window", "scan")
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select($"doc_id").collect().map(_.getLong(0)).toSet

    val anyIdx = ids(InvertedIndex.matchAny(docs, postings, "doc_id", terms))
    val anyFb = ids(docs.filter(InvertedIndex.matchAnyPredicate($"text", terms)))
    assert(anyIdx === anyFb, "match_any: index path != fallback predicate")
    assert(anyIdx.nonEmpty)

    val allIdx = ids(InvertedIndex.matchAll(docs, postings, "doc_id", terms))
    val allFb = ids(docs.filter(InvertedIndex.matchAllPredicate($"text", terms)))
    assert(allIdx === allFb, "match_all: index path != fallback predicate")
    assert(allIdx.subsetOf(anyIdx) && allIdx.nonEmpty)
  }

  test("matchTopK ranks by total tf with doc_id tie-break and respects match_all") {
    import graft.operators.InvertedIndex
    val docs = table("documents")
    val postings = InvertedIndex.build(docs, "doc_id", "text")
    val top = InvertedIndex.matchTopK(postings, Seq("window", "scan"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(top.length === 10)
    assert(top.map(_._3).toSeq === (1L to 10L), "rk must be dense 1..k")
    // scores non-increasing; ties ordered by doc_id
    top.sliding(2).foreach { case Array((d1, s1, _), (d2, s2, _)) =>
      assert(s1 > s2 || (s1 === s2 && d1 < d2), s"order violated: ($d1,$s1) before ($d2,$s2)")
    }
    // every returned doc really contains both terms at the claimed count
    val byId = docs.filter($"doc_id".isin(top.map(_._1): _*))
      .select($"doc_id", InvertedIndex.tokens($"text").as("ts")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    top.foreach { case (d, s, _) =>
      val ts = byId(d)
      assert(ts.contains("window") && ts.contains("scan"))
      assert(ts.count(t => t == "window" || t == "scan").toLong === s)
    }
  }

  test("wordGrams: normalized distinct n-grams; short and empty docs yield none") {
    val rows = Seq(
      (1L, "The quick, brown FOX jumps over the quick brown fox"),
      (2L, "a b"),          // 2 words < n=3 → empty
      (3L, ""),             // empty → empty
      (4L, "one two three") // exactly n words → one gram
    ).toDF("id", "t")
    val g = rows.select($"id", TextAnalysis.wordGrams($"t", 3).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    // 10 words → 8 windows; "the quick brown" and "quick brown fox"
    // each appear twice → 6 distinct
    assert(g(1L).length === 6)
    assert(g(1L).contains("the quick brown"))
    assert(g(2L) === Seq.empty)
    assert(g(3L) === Seq.empty)
    assert(g(4L) === Seq("one two three"))
  }

  test("phraseHits: consecutive in-order anchors, duplicate terms, overlaps") {
    val docs = Seq(
      (1L, "the quick brown fox"),              // 1 hit of "quick brown"
      (2L, "quick brown quick brown fox"),      // 2 hits
      (3L, "brown quick"),                      // reversed → no hit
      (4L, "quick x brown"),                    // gap → no hit
      (5L, "buffalo buffalo buffalo"),          // dup-term phrase: 2 overlapping hits
      (6L, "Quick, BROWN!")                     // case/punct normalize → 1 hit
    ).toDF("doc_id", "text")
    val pos = InvertedIndex.buildPositional(docs, "doc_id", "text")
    val qb = InvertedIndex.phraseHits(pos, Seq("quick", "brown"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(qb === Map(1L -> 1L, 2L -> 2L, 6L -> 1L))
    val buf = InvertedIndex.phraseHits(pos, Seq("buffalo", "buffalo"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(buf === Map(5L -> 2L))
    val m = InvertedIndex.matchPhrase(docs, pos, "doc_id", Seq("quick", "brown"))
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(m === Set(1L, 2L, 6L))
  }

  test("importanceWeights ranks target-like docs above off-domain docs") {
    val corpus = Seq(
      (1L, "physics energy quantum field physics energy"),
      (2L, "physics energy market stock"),
      (3L, "market stock price trade market stock price")
    ).toDF("doc_id", "text")
    val target = Seq((10L, "physics energy quantum field theory")).toDF("doc_id", "text")
    val out = TextAnalysis.importanceWeights(corpus, target, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out.keySet === Set(1L, 2L, 3L))
    assert(out(1L)._1 === 6L) // token count includes duplicates
    // pure-physics doc > mixed doc > pure-market doc
    assert(out(1L)._2 > out(2L)._2 && out(2L)._2 > out(3L)._2)
  }

  test("decontaminate flags corpus docs by eval n-gram overlap, broadcasts eval side") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),     // full overlap with eval doc
      (2L, "alpha beta gamma nine ten eleven twelve"), // partial: 1 of 5 grams
      (3L, "totally different words here now")         // no overlap → absent
    ).toDF("doc_id", "text")
    val eval = Seq((100L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val out = TextAnalysis.decontaminate(corpus, eval, "doc_id", "text", n = 3, flagFrac = 0.5)
    val rows = out.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(4)))).toMap
    assert(rows.keySet === Set(1L, 2L))
    assert(rows(1L) === ((4L, 4L, true)))  // all 4 grams collide → flagged
    assert(rows(2L) === ((1L, 5L, false))) // 1 of 5 < 50% → reported, not flagged
    // the eval-gram side must broadcast: corpus rows never shuffle for the probe
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast probe:\n$plan")
  }

  /** Independent local reference BPE (Sennrich 2016): word-freq dict,
    * count adjacent pairs, merge the most frequent (lexicographic
    * tie-break) greedily left-to-right. Mirrors NOTHING of the Spark
    * implementation — symbol lists, not regex rewrites. */
  private def refBpe(wordFreq: Map[String, Long], merges: Int,
      minFreq: Long): Seq[(Int, String, String, String, Long)] = {
    def mergeSeq(xs: List[String], l: String, r: String): List[String] = xs match {
      case a :: b :: rest if a == l && b == r => (l + r) :: mergeSeq(rest, l, r)
      case a :: rest => a :: mergeSeq(rest, l, r)
      case Nil => Nil
    }
    var vocab: Seq[(List[String], Long)] =
      wordFreq.toSeq.map { case (w, f) => (w.map(_.toString).toList :+ "</w>", f) }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    var rank = 0
    var done = false
    while (rank < merges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, f) =>
        syms.zip(syms.tail).foreach(p => counts(p) = counts.getOrElse(p, 0L) + f)
      }
      val best = counts.toSeq
        .sortBy { case ((l, r), n) => (-n, l + " " + r) }.headOption
      best match {
        case Some(((l, r), n)) if n >= minFreq =>
          vocab = vocab.map { case (syms, f) => (mergeSeq(syms, l, r), f) }
          out += ((rank, l, r, l + r, n))
          rank += 1
        case _ => done = true
      }
    }
    out.toSeq
  }

  test("bm25TopK: coverage beats tf-stuffing, rare terms outweigh common ones") {
    val docs = Seq(
      (1L, "alpha beta gamma pad pad pad"),          // all 3 query terms once
      (2L, "alpha alpha alpha alpha alpha pad"),     // one term stuffed
      (3L, "beta pad pad pad pad pad"),              // one term once
      (4L, "pad pad pad pad pad pad")                // no terms
    ).toDF("doc_id", "text")
    val postings = InvertedIndex.build(docs, "doc_id", "text")
    val r = InvertedIndex.bm25TopK(postings, Seq("alpha", "beta", "gamma"), k = 10)
      .collect().map(row => row.getLong(0) -> row.getLong(2)).toMap
    assert(!r.contains(4L), "doc without query terms must not score")
    assert(r(1L) === 1L, "covering all terms must outrank tf-stuffing one term")
    // gamma is rarest (df=1) — doc 1 holds it; stuffed alpha (df=2) saturates
    assert(r(2L) > r(1L))
  }

  test("bpeTrain equals an independent reference implementation on the fixture corpus") {
    val docs = graft.queries.Pipeline.bpeFixtureDocs(spark)
    val learned = TextAnalysis.bpeTrain(docs, "text", merges = 12)
    val wordFreq = docs
      .select(explode(TextAnalysis.normWords($"text")).as("w"))
      .groupBy($"w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = refBpe(wordFreq, merges = 12, minFreq = 2L)
    assert(learned === expected)
  }

  test("bpeSegmentWord: tokens reconstruct the word; unseen chars fall back to chars") {
    val docs = graft.queries.Pipeline.bpeFixtureDocs(spark)
    val merges = TextAnalysis.bpeTrain(docs, "text", merges = 12).map(m => (m._2, m._3))
    val words = Seq("the", "theme", "catalog", "dogma", "unseen", "x")
    val segs = words.toDF("word")
      .select($"word", TextAnalysis.bpeSegmentWord($"word", merges).as("toks"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    words.foreach { w =>
      val joined = segs(w).mkString("").replace("</w>", "")
      assert(joined === w, s"tokens of '$w' must reconstruct it: ${segs(w)}")
      assert(segs(w).last.endsWith("</w>"))
    }
  }

  test("weightedSample: huge weight wins its stratum; sample is deterministic and capped") {
    val rows = (0L until 300L).map(i => (i, i % 2, if (i == 42L) 1e6 else 1.0))
    val df = rows.toDF("id", "stratum", "wt")
    val s1 = TextAnalysis.weightedSample(df, "stratum", "id", "wt", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
    // capped per stratum
    assert(s1.count(_._1 == 0L) === 5 && s1.count(_._1 == 1L) === 5)
    // w=1e6 → key = u^(1/1e6) ≈ 1 → rank 1 in stratum 0
    val top0 = s1.find(t => t._1 == 0L && t._3 == 1L).get
    assert(top0._2 === 42L, s"heavy-weight doc must rank first: $top0")
    val s2 = TextAnalysis.weightedSample(df, "stratum", "id", "wt", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
    assert(s1.toSet === s2.toSet, "sample must be reproducible")
  }

  test("similarDocsTopK: identical docs get cosine 1; stopword cut removes ubiquitous terms") {
    val docs = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha beta gamma"),   // exact dup of 1 → sim 1.0
      (3L, "alpha delta epsilon"),
      (4L, "zeta eta theta")      // no shared informative terms
    ).toDF("doc_id", "text")
    val postings = InvertedIndex.build(docs, "doc_id", "text")
    val r = InvertedIndex.similarDocsTopK(postings, k = 3, maxDfRatio = 0.6)
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> x.getDouble(2)).toMap
    assert(r((1L, 2L)) === 1.0 && r((2L, 1L)) === 1.0)
    // alpha appears in 3/4 docs (df ratio 0.75 > 0.6) → pruned, so doc 3
    // shares NO surviving term with 1/2 and pairs (1,3)/(3,1) must not exist
    assert(!r.contains((1L, 3L)) && !r.contains((3L, 1L)),
      s"stopword-pruned term still produced pairs: ${r.keys}")
    // doc 4 shares nothing → absent entirely
    assert(!r.keys.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("tfidfVectors are L2-normalized after the df cut") {
    val docs = Seq((1L, "a b c"), (2L, "a d e"), (3L, "f g h")).toDF("doc_id", "text")
    val v = InvertedIndex.tfidfVectors(
        InvertedIndex.build(docs, "doc_id", "text"), maxDfRatio = 1.0)
      .groupBy($"doc_id").agg(sum($"w" * $"w").as("n2"))
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    // docs 1 and 2: 'a' has idf ln(3/2)>0, others ln(3)>0 → norm 1
    assert(v.keySet === Set(1L, 2L, 3L))
    v.values.foreach(n2 => assert(math.abs(n2 - 1.0) < 1e-12))
  }

  test("rrfFuse: multi-list docs outrank single-list docs; scores exact") {
    // list A ranks 1,2,3 = docs 10,20,30; list B ranks 1,2,3 = 20,30,40
    val a = Seq((10L, 1L), (20L, 2L), (30L, 3L)).toDF("doc_id", "rk")
    val b = Seq((20L, 1L), (30L, 2L), (40L, 3L)).toDF("doc_id", "rk")
    val r = InvertedIndex.rrfFuse(Seq(a, b), "doc_id", k0 = 60, topK = 4)
      .collect().map(x => (x.getLong(0), x.getDouble(1), x.getLong(2), x.getLong(3)))
    def s(rs: Long*) = math.rint(rs.map(k => 1.0 / (60 + k)).sum * 1e6) / 1e6
    // doc 20: ranks 2+1; doc 30: ranks 3+2; then 10 (rank 1) vs 40 (rank 3)
    assert(r.toSeq === Seq(
      (20L, s(2, 1), 2L, 1L), (30L, s(3, 2), 2L, 2L),
      (10L, s(1), 1L, 3L), (40L, s(3), 1L, 4L)))
  }

  test("dedupLines keeps first occurrences in order with exact stats") {
    val docs = Seq(
      (1L, "alpha\nbeta\nalpha\ngamma\nbeta"),
      (2L, "solo"),
      (3L, "x\nx\nx")).toDF("doc_id", "text")
    val r = TextAnalysis.dedupLines(docs, "doc_id", "text")
      .orderBy("doc_id")
      .collect().map(x => (x.getLong(0), x.getString(1), x.getLong(2),
        x.getLong(3), x.getDouble(4)))
    assert(r.toSeq === Seq(
      (1L, "alpha\nbeta\ngamma", 5L, 3L, 1.0 - 3.0 / 5.0),
      (2L, "solo", 1L, 1L, 0.0),
      (3L, "x", 3L, 1L, 1.0 - 1.0 / 3.0)))
  }

  test("normalize_text folds NFKC, strips accents, casefolds, collapses space") {
    val out = Seq("Héllò  Wörld", "ﬁne ﬂow", "№5 …done\tnow", "straße CAFÉ")
      .toDF("raw").selectExpr("normalize_text(raw) AS n")
      .collect().map(_.getString(0))
    assert(out.toSeq === Seq("hello world", "fine flow", "no5 ...done now",
      "straße cafe"))
    // null propagates
    val n = Seq(Option.empty[String]).toDF("raw")
      .selectExpr("normalize_text(raw) AS n").collect().head
    assert(n.isNullAt(0))
  }
}
