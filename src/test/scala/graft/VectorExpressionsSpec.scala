package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

class VectorExpressionsSpec extends SparkSuite {
  import spark.implicits._

  private def row(a: Seq[Float], b: Seq[Float]) =
    Seq((a, b)).toDF("a", "b")

  test("cosine_similarity of identical vectors is 1") {
    val r = row(Seq(1f, 2f, 3f), Seq(1f, 2f, 3f))
      .select(cosine_similarity($"a", $"b")).head.getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
  }

  test("cosine_similarity of orthogonal vectors is 0") {
    val r = row(Seq(1f, 0f), Seq(0f, 1f))
      .select(cosine_similarity($"a", $"b")).head.getDouble(0)
    assert(math.abs(r) < 1e-12)
  }

  test("l2_distance matches hand computation") {
    val r = row(Seq(1f, 2f), Seq(4f, 6f))
      .select(l2_distance($"a", $"b")).head.getDouble(0)
    assert(math.abs(r - 5.0) < 1e-12)
  }

  test("dot_product") {
    val r = row(Seq(1f, 2f, 3f), Seq(4f, 5f, 6f))
      .select(dot_product($"a", $"b")).head.getDouble(0)
    assert(r === 32.0)
  }

  test("dimension mismatch yields null") {
    val r = Seq((Seq(1f, 2f), Seq(1f))).toDF("a", "b")
      .select(cosine_similarity($"a", $"b")).head
    assert(r.isNullAt(0))
  }

  test("null input yields null") {
    val r = Seq((Some(Seq(1f, 2f)), Option.empty[Seq[Float]])).toDF("a", "b")
      .select(cosine_similarity($"a", $"b")).head
    assert(r.isNullAt(0))
  }

  test("zero vector yields null (NaN guarded)") {
    val r = row(Seq(0f, 0f), Seq(1f, 2f))
      .select(cosine_similarity($"a", $"b")).head
    assert(r.isNullAt(0))
  }

  test("SQL registration works (cosine_similarity via spark.sql)") {
    row(Seq(1f, 2f), Seq(1f, 2f)).createOrReplaceTempView("vecs")
    val r = spark.sql("SELECT cosine_similarity(a, b) FROM vecs").head.getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
  }

  test("interpreted eval matches codegen") {
    // deterministic row choice: the test materializes df twice (codegen
    // job + driver-side recompute), and a bare limit() may pick
    // different rows per job
    val df = table("embeddings").orderBy($"vec_id").limit(50).select($"embedding".as("a"))
      .crossJoin(table("embeddings").orderBy($"vec_id").limit(3).select($"embedding".as("b")))
    val viaCodegen = df.select(cosine_similarity($"a", $"b").as("c")).collect().map(r => if (r.isNullAt(0)) null else r.getDouble(0))
    val viaInterp = df.collect().map { r =>
      val a = r.getSeq[Float](0); val b = r.getSeq[Float](1)
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = a.map(x => x.toDouble * x.toDouble).sum
      val nb = b.map(x => x.toDouble * x.toDouble).sum
      dot / math.sqrt(na * nb)
    }
    viaCodegen.zip(viaInterp).foreach { case (c, i) =>
      assert(c != null && math.abs(c.asInstanceOf[Double] - i) < 1e-9)
    }
  }
}
