package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** `ai_query`-style batched model inference over a text column.
  *
  * Reference: `be/src/exprs/ai_functions.h:24` (`ai_query(model,
  * prompt)` — per-row LLM calls batched engine-side). The Spark-native
  * shape: mapPartitions with explicit micro-batching, so one model
  * call serves `batchSize` rows and the network round-trip amortizes;
  * partition-parallel, no shuffle, no driver involvement — the layout
  * a 100 TB inference sweep needs.
  *
  * The model call itself is STUBBED deterministically (no model
  * endpoint in this container): `label_<len*31 mod 5>` from the prompt
  * length. Swap `inferBatch` for a real HTTP/gRPC client; the batching
  * shape, schema handling, and failure surface stay identical.
  */
object AiQuery {

  /** STUB batch inference: deterministic label per prompt. A real
    * implementation POSTs the whole batch to a model endpoint. */
  def inferBatch(model: String, prompts: Seq[String]): Seq[String] =
    prompts.map { p =>
      val n = if (p == null) 0L else p.length.toLong
      s"label_${(n * 31) % 5}"
    }

  /** Append `responseCol` with the model output for `promptCol`.
    * Batches `batchSize` rows per model call within each partition. */
  def aiQuery(df: DataFrame, promptCol: String, responseCol: String = "ai_response",
      model: String = "stub", batchSize: Int = 32): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField(responseCol, StringType, nullable = true))
    val idx = df.schema.fieldIndex(promptCol)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        val out = inferBatch(model, batch.map(_.getString(idx)))
        batch.lazyZip(out).map((r, resp) => Row.fromSeq(r.toSeq :+ resp))
      }
    }(enc)
  }
}
