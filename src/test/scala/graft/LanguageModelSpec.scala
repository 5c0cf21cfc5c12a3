package graft

import org.apache.spark.sql.functions._
import graft.operators.LanguageModel

class LanguageModelSpec extends SparkSuite {
  import spark.implicits._

  test("bigram LM perplexity matches a hand-computed add-k value") {
    // train: "a b a b a b" → bigrams ab ba ab ba ab:
    //   c12(a,b)=3, c12(b,a)=2, c1(a)=3, c1(b)=2, V=2, k=0.5
    val train = Seq((0L, "a b a b a b")).toDF("doc_id", "text")
    val lm = LanguageModel.train(train, "text")
    // score "a b a b": bigrams ab ba ab
    //   p(b|a) = (3+0.5)/(3+0.5*2) = 0.875; p(a|b) = (2+0.5)/(2+1) = 0.8333…
    val score = Seq((1L, "a b a b")).toDF("doc_id", "text")
    val r = LanguageModel.perplexity(score, "doc_id", "text", lm, k = 0.5)
      .collect().head
    val pAB = 3.5 / 4.0; val pBA = 2.5 / 3.0
    val expected = math.exp(-(2 * math.log(pAB) + math.log(pBA)) / 3)
    assert(r.getLong(1) === 3L)
    assert(math.abs(r.getDouble(2) - expected) < 5e-5,
      s"ppl ${r.getDouble(2)} vs expected $expected")
  }

  test("unseen bigrams raise perplexity; docs with <2 tokens are absent") {
    val train = Seq((0L, "the quick brown fox jumps over the lazy dog the quick fox"))
      .toDF("doc_id", "text")
    val lm = LanguageModel.train(train, "text")
    val score = Seq(
      (1L, "the quick brown fox"),   // all bigrams seen in train
      (2L, "dog zebra quark lepton"), // unseen tokens/bigrams
      (3L, "single")                  // no bigrams → absent
    ).toDF("doc_id", "text")
    val out = LanguageModel.perplexity(score, "doc_id", "text", lm)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out.keySet === Set(1L, 2L))
    assert(out(2L) > out(1L),
      s"unseen-bigram doc should score higher ppl: $out")
  }

  test("distributionDivergence: zero on identical slices, positive and symmetric-js on disjoint ones") {
    val a = Seq((0L, "alpha beta gamma alpha")).toDF("doc_id", "text")
    val same = LanguageModel.distributionDivergence(a, a, "text").collect().head
    assert(same.getDouble(0) === 0.0 && same.getDouble(1) === 0.0 && same.getDouble(2) === 0.0)
    val b = Seq((1L, "delta epsilon zeta delta")).toDF("doc_id", "text")
    val r = LanguageModel.distributionDivergence(a, b, "text").collect().head
    assert(r.getDouble(0) > 0 && r.getDouble(1) > 0)
    assert(r.getDouble(2) > 0 && r.getDouble(2) < math.log(2) + 1e-9,
      s"JS must be in (0, ln 2]: ${r.getDouble(2)}")
    // swapping the slices swaps the KLs and keeps JS
    val s = LanguageModel.distributionDivergence(b, a, "text").collect().head
    assert(s.getDouble(0) === r.getDouble(1) && s.getDouble(1) === r.getDouble(0))
    assert(s.getDouble(2) === r.getDouble(2))
  }

  test("minCount pruning only changes pruned pairs, toward unseen prob") {
    val train = Seq(
      (0L, "x y x y x y x y"), // c12(x,y) high
      (1L, "p q")              // c12(p,q) = 1 → pruned at minCount=2
    ).toDF("doc_id", "text")
    val full = LanguageModel.train(train, "text", minCount = 1)
    val pruned = LanguageModel.train(train, "text", minCount = 2)
    val score = Seq((9L, "x y x y"), (10L, "p q")).toDF("doc_id", "text")
    def ppl(lm: LanguageModel.BigramLm) =
      LanguageModel.perplexity(score, "doc_id", "text", lm)
        .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val (f, p) = (ppl(full), ppl(pruned))
    assert(f(9L) === p(9L), "frequent pair unaffected by pruning")
    assert(p(10L) > f(10L), "pruned pair falls back to unseen probability")
  }
}
