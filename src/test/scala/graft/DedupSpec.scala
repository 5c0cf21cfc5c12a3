package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}

class DedupSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = table("documents").select($"doc_id", $"text")
  private lazy val planted = {
    val exact = docs.filter($"doc_id" % 10 === 1)
      .select(($"doc_id" + 200000).as("doc_id"), $"text")
    val near = docs.filter($"doc_id" % 10 === 0)
      .select(($"doc_id" + 100000).as("doc_id"), concat(lit("zzz "), $"text").as("text"))
    docs.unionByName(exact).unionByName(near)
  }

  test("exact dedup keeps lowest id per text") {
    val out = Dedup.exact(planted, Seq("text"), "doc_id")
    assert(out.count() === docs.count() + planted.filter($"doc_id" >= 100000 && $"doc_id" < 200000).count())
    // no planted exact copy survives
    assert(out.filter($"doc_id" >= 200000).count() === 0)
  }

  test("incrementalDedup: corpus dups drop, batch-internal dups keep first id, novel texts survive") {
    val corpus = Seq((1L, "alpha beta"), (2L, "gamma delta")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "ALPHA   beta"),   // normalizes to a corpus text → dropped
      (11L, "epsilon zeta"),   // novel → kept
      (12L, "epsilon  ZETA"),  // batch-internal dup of 11 → dropped
      (13L, "eta theta")       // novel → kept
    ).toDF("doc_id", "text")
    val out = Dedup.incrementalDedup(batch, corpus, "doc_id", "text")
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(out === Set(11L, 13L))
    // idempotent: re-ingesting the surviving batch against corpus+batch yields nothing
    val merged = corpus.unionByName(batch.filter($"doc_id".isin(11L, 13L)))
    assert(Dedup.incrementalDedup(batch, merged, "doc_id", "text").count() === 0L)
  }

  test("minhash dedup removes planted exact and near duplicates") {
    val out = Dedup.minhashDedup(planted, "doc_id", "text", threshold = 0.7)
    // all exact copies gone
    assert(out.filter($"doc_id" >= 200000).count() === 0)
    // most near copies gone (prepended word keeps jaccard high)
    val nearTotal = planted.filter($"doc_id".between(100000, 199999)).count()
    val nearLeft = out.filter($"doc_id".between(100000, 199999)).count()
    assert(nearLeft < nearTotal * 0.3, s"minhash missed too many near-dups: $nearLeft of $nearTotal")
    // originals may only disappear if the corpus GENUINELY contains a
    // near-duplicate with a smaller id (the synthetic docs table has ~24
    // such rows at j>=0.7) — compute ground truth by exact all-pairs
    // jaccard (fine at test scale) and check dropped ⊆ genuine.
    val sh = docs.select($"doc_id", Dedup.wordShingles($"text", 3).as("s"))
    val genuineLosers = sh.as("a").crossJoin(sh.as("b"))
      .filter($"a.doc_id" < $"b.doc_id")
      .filter(Dedup.jaccard($"a.s", $"b.s") >= 0.7)
      .select($"b.doc_id").distinct().collect().map(_.getLong(0)).toSet
    val surviving = out.filter($"doc_id" < 100000).select($"doc_id")
      .collect().map(_.getLong(0)).toSet
    val dropped = docs.select($"doc_id").collect().map(_.getLong(0)).toSet -- surviving
    assert(dropped.subsetOf(genuineLosers),
      s"originals dropped without a genuine near-dup partner: ${dropped -- genuineLosers}")
    assert(dropped.size >= (genuineLosers.size * 0.8).toInt,
      s"minhash recall on genuine original near-dups too low: ${dropped.size}/${genuineLosers.size}")
  }

  test("simhash pairs detect planted near duplicates") {
    val pairs = Dedup.simhashPairs(planted, "doc_id", "text", maxHamming = 3)
      .filter($"id_b" === $"id_a" + 100000 || $"id_b" === $"id_a" + 200000)
    val planted_n = planted.filter($"doc_id" >= 100000).count()
    assert(pairs.count() > planted_n * 0.5, "simhash found too few planted pairs")
  }

  test("simhash DataFrame path equals the Column formulation") {
    val byCol = docs.select($"doc_id", Dedup.simhash64($"text").as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byDf = Dedup.simhashSignatures(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byCol === byDf)
  }

  test("jaccard of identical shingle sets is 1, disjoint is 0") {
    val df = Seq(
      (Seq("a b c", "b c d"), Seq("a b c", "b c d")),
      (Seq("a b c"), Seq("x y z"))
    ).toDF("a", "b").select(Dedup.jaccard($"a", $"b").as("j"))
    val r = df.collect().map(_.getDouble(0))
    assert(r(0) === 1.0 && r(1) === 0.0)
  }

  test("embedding dup pairs finds planted identical vectors") {
    val emb = table("embeddings").select($"vec_id", $"embedding")
    val copies = emb.filter($"vec_id" < 20)
      .select(($"vec_id" + 10000).as("vec_id"), $"embedding")
    val pairs = Dedup.embeddingDupPairs(emb.unionByName(copies), "vec_id", "embedding",
      threshold = 0.999)
    val found = pairs.filter($"id_b" === $"id_a" + 10000).count()
    assert(found === 20, s"expected all 20 planted vector dups, found $found")
  }

  test("minhashSignatures (explode+agg) equals the Column formulation, empty docs included") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),
      (3L, ""), (4L, "   "), (5L, "one two")).toDF("id", "text")
    val viaColumn = docs
      .select($"id", Dedup.wordShingles($"text", 3).as("sh"))
      .select($"id", Dedup.minhashSignature($"sh", 8).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[java.lang.Long](1)).toMap
    val viaAgg = Dedup.minhashSignatures(docs, "id", "text", 3, 8)
      .collect().map(r => r.getLong(0) -> r.getSeq[java.lang.Long](1)).toMap
    assert(viaAgg === viaColumn)
  }

  test("connectedComponents matches local union-find on random graphs") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val n = 40 + trial * 20
      val edges = Seq.fill(n)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      // local union-find reference
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = parent.keys.map(x => x -> find(x)).toMap
      // min-id canonicalization: map each root to the min member id
      val minOfRoot = want.groupBy(_._2).map { case (r, m) => r -> m.keys.min }
      val canonical = want.map { case (x, r) => x -> minOfRoot(r) }

      val got = Dedup.connectedComponents(
        edges.toDF("src", "dst"), "src", "dst")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === canonical, s"trial $trial")
    }
  }

  test("connectedComponents converges on a 300-long chain within default maxIter") {
    // diameter 299 ≫ maxIter 20: plain min-label propagation would exit
    // unconverged (and now throws); pointer doubling must close it in
    // O(log n) rounds with every node labeled 0
    val edges = (0L until 299L).map(i => (i, i + 1)).toDF("src", "dst")
    val got = Dedup.connectedComponents(edges, "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size === 300)
    assert(got.values.forall(_ === 0L), "chain must collapse to one component rooted at 0")
  }

  test("chunk: overlap reconstruction, short and empty documents") {
    import graft.operators.TextAnalysis
    val docs = Seq(
      (1L, (1 to 100).map(i => s"w$i").mkString(" ")), // 100 tokens
      (2L, "only three words"),                        // < chunk size
      (3L, ""), (4L, "   ")                            // no chunks
    ).toDF("doc_id", "text")
    val out = TextAnalysis.chunk(docs, "doc_id", "text", chunkTokens = 40, overlapTokens = 8)
      .orderBy($"doc_id", $"chunk_idx").collect()
    val d1 = out.filter(_.getLong(0) == 1L)
    // stride 32: chunks start at 0,32,64 (64+40 ≥ 100) → 3 chunks
    assert(d1.length === 3)
    assert(d1.map(_.getLong(3)).toSeq === Seq(40L, 40L, 36L))
    // consecutive chunks overlap by exactly 8 tokens
    val c0 = d1(0).getString(2).split(" ")
    val c1 = d1(1).getString(2).split(" ")
    assert(c0.takeRight(8).toSeq === c1.take(8).toSeq)
    // every token of the doc appears in some chunk (coverage)
    assert(d1.flatMap(_.getString(2).split(" ")).distinct.length === 100)
    assert(out.count(_.getLong(0) == 2L) === 1)
    assert(!out.exists(r => r.getLong(0) == 3L || r.getLong(0) == 4L))
  }

  test("assignSplit: deterministic, exhaustive, roughly proportional") {
    import graft.operators.TextAnalysis
    val ids = (1L to 10000L).toDF("id")
    val splits = Seq("train" -> 90.0, "val" -> 5.0, "test" -> 5.0)
    val a = TextAnalysis.assignSplit(ids, "id", splits)
      .groupBy($"split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = TextAnalysis.assignSplit(ids.orderBy($"id".desc), "id", splits)
      .groupBy($"split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a === b) // order-independent determinism
    assert(a.values.sum === 10000L) // every row gets exactly one split
    assert(a("train") > 8500 && a("train") < 9500) // hash-proportional
    assert(a("val") > 250 && a("val") < 750)
    // an id keeps its split when the corpus grows
    val before = TextAnalysis.assignSplit(ids.filter($"id" <= 100), "id", splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val after = TextAnalysis.assignSplit(ids, "id", splits)
      .filter($"id" <= 100).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(before === after)
  }

  test("packSequences: bins respect capacity quantization per partition") {
    import graft.operators.TextAnalysis
    val chunks = Seq(
      ("en", 1L, 0, 300L), ("en", 1L, 1, 300L), ("en", 2L, 0, 300L),
      ("de", 3L, 0, 600L), ("de", 4L, 0, 100L)
    ).toDF("lang", "doc_id", "chunk_idx", "n_tokens")
    val packed = TextAnalysis.packSequences(
      chunks, Seq("lang"), Seq("doc_id", "chunk_idx"), "n_tokens", 512)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getLong(4))).toSet
    // en: cum-before 0,300,600 → seqs 0,0,1 ; de: 0,600 → seqs 0,1
    assert(packed === Set(
      ("en", 1L, 0, 0L), ("en", 1L, 1, 0L), ("en", 2L, 0, 1L),
      ("de", 3L, 0, 0L), ("de", 4L, 0, 1L)))
  }

  test("dedupByPairs keeps exactly one representative per cluster plus unpaired rows") {
    val docs = (0L to 9L).map(i => (i, s"text$i")).toDF("doc_id", "text")
    // clusters {0,1,2} and {5,6}; 3,4,7,8,9 unpaired
    val pairs = Seq((0L, 1L), (1L, 2L), (5L, 6L)).toDF("a", "b")
    val kept = Dedup.dedupByPairs(docs, "doc_id", pairs, "a", "b")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(kept === Array(0L, 3L, 4L, 5L, 7L, 8L, 9L))
  }

  test("duplicateSpans: shared token run yields one maximal span per doc, hand-traced") {
    val docs = Seq(
      (1L, "a b c d e f g h i j unique1 unique2"),
      (2L, "x y a b c d e f g h i j z"),
      (3L, "totally different words with no overlap at all here")
    ).toDF("doc_id", "text")
    val spans = Dedup.duplicateSpans(docs, "doc_id", "text", width = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // shared run "a b c d e f g h i j" (10 tokens): width-4 windows
    // fully inside it start at 1..7 in doc 1 (span 1-10) and 3..9 in
    // doc 2 (span 3-12); doc 3 contributes nothing
    assert(spans === Set((1L, 1L, 10L, 7L), (2L, 3L, 12L, 7L)))
  }

  test("semanticDedup drops planted scaled copies and keeps everything else") {
    val emb = table("embeddings").select($"vec_id", $"embedding").limit(200)
    val planted = emb.filter($"vec_id" % 10 === 0)
      .select(($"vec_id" + 5000).as("vec_id"),
        transform($"embedding", x => x * lit(3.0f)).as("embedding"))
    val kept = Dedup.semanticDedup(emb.unionByName(planted), "vec_id", "embedding",
        k = 8, threshold = 0.95, iters = 2)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val originals = emb.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept === originals)
  }

  test("super-spreader buckets: star pairing bounds pairs and preserves keep-lowest dedup") {
    import spark.implicits._
    // a 40-member mutual near-duplicate cluster (identical text ⇒ one
    // bucket per band) + unrelated docs: the all-pairs join would emit
    // 40·39/2 pairs per band; the capped path must emit O(cluster)
    // star pairs yet dedup to the same survivors
    val cluster = (0L until 40L).map(i =>
      (100L + i, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
    val solo = Seq(
      (1L, "completely different words about economic policy review"),
      (2L, "unrelated second text on maritime navigation techniques"))
    val docs = (cluster ++ solo).toDF("doc_id", "text")
    val uncapped = Dedup.minhashDedup(docs, "doc_id", "text",
        bucketCap = Int.MaxValue)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val capped = Dedup.minhashDedup(docs, "doc_id", "text", bucketCap = 8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(capped === uncapped, "star pairing changed the dedup result")
    assert(capped === Set(1L, 2L, 100L), "cluster must collapse to its min id")
    // pair volume is linear in the over-cap bucket, not quadratic
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text", bucketCap = 8)
    assert(pairs.count() === 39L,
      s"expected 39 star pairs, got ${pairs.count()}")
    val pairsUncapped = Dedup.minhashLshPairs(docs, "doc_id", "text",
      bucketCap = Int.MaxValue)
    assert(pairsUncapped.count() === (40L * 39) / 2)
    // below the cap the exact all-pairs path is untouched
    val small = Dedup.minhashLshPairs(docs.filter($"doc_id" < 110), "doc_id",
      "text", bucketCap = 256)
    assert(small.count() === (10L * 9) / 2)
  }

  test("super-cells: star pairing bounds a skew-collapsed k-means cell and preserves keep-lowest dedup") {
    import spark.implicits._
    // one FAT mutual near-duplicate cluster (scaled copies of one
    // vector — k-means must co-cluster them) + a few spread vectors:
    // the within-cell self-join would emit 30·29/2 pairs; the capped
    // path must emit O(cell) star pairs yet dedup to the same rows
    val base = Seq(1.0f, 0.0f, 2.0f, -1.0f)
    val fat = (0L until 30L).map(i =>
      (100L + i, base.map(x => x * (1.0f + i * 0.001f))))
    val spread = Seq(
      (1L, Seq(-5.0f, 4.0f, 0.0f, 3.0f)),
      (2L, Seq(0.0f, -7.0f, 1.0f, -2.0f)))
    val df = (fat ++ spread).toDF("vec_id", "embedding")
    val uncapped = Dedup.semanticDedup(df, "vec_id", "embedding",
        k = 3, iters = 2, cellCap = Int.MaxValue)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val capped = Dedup.semanticDedup(df, "vec_id", "embedding",
        k = 3, iters = 2, cellCap = 8)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(capped === uncapped, "star pairing changed the dedup result")
    assert(capped === Set(1L, 2L, 100L), "fat cell must collapse to its min id")
    // pair volume is linear in the over-cap cell, not quadratic
    val pairs = Dedup.semanticDupPairs(df, "vec_id", "embedding",
      k = 3, iters = 2, cellCap = 8)
    assert(pairs.count() === 29L,
      s"expected 29 star pairs, got ${pairs.count()}")
    val pairsUncapped = Dedup.semanticDupPairs(df, "vec_id", "embedding",
      k = 3, iters = 2, cellCap = Int.MaxValue)
    assert(pairsUncapped.count() === (30L * 29) / 2)
    // below the cap the exact all-pairs path is untouched
    assert(Dedup.semanticDupPairs(df, "vec_id", "embedding",
      k = 3, iters = 2, cellCap = 64).count() === (30L * 29) / 2)
  }
}
