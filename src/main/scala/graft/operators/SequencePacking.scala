package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Fixed-length training-sequence packing: lay the corpus's token
  * stream (documents in deterministic `idCol` order) end-to-end and cut
  * it into sequences of exactly `seqLen` tokens — the step that turns a
  * cleaned corpus into model-ready samples. A document longer than the
  * remaining room in its sequence SPLITS across sequences; the output
  * is one row per (document, sequence) SPAN:
  *
  *   (id, seq_id, tok_start, tok_len)
  *
  * where `tok_start` is the span's offset inside the document and
  * sequences are filled with no padding except the final one.
  *
  * Scale shape: token counting is per-row codegen'd; the global layout
  * needs ONE exclusive prefix sum over token counts, computed with the
  * distributed pattern in [[ShardPacking.withStartOffsets]] (partition-
  * local running sums + a partition-count-sized offset broadcast —
  * never a whole-corpus single-task window). Span explosion is per-row:
  * a document emits `⌈(start mod L + n) / L⌉` rows, bounded by its own
  * length, never by the corpus. */
object SequencePacking {

  def pack(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", seqLen: Long = 2048,
      numRangePartitions: Int = 0): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    val counted = docs.select(col(idCol),
        size(TextFunctions.tokens(col(textCol))).cast("long")
          .as("__n_tokens"))
      .where(col("__n_tokens") > 0)
    val L = lit(seqLen)
    ShardPacking.withStartOffsets(counted, "__n_tokens", idCol,
        "__start", numRangePartitions)
      .withColumn("__end", col("__start") + col("__n_tokens"))
      // integer division (`div`), NOT `/`: `/` routes longs through
      // DoubleType and silently loses exactness past 2^53 token offsets
      .withColumn("seq_id", explode(sequence(
        expr(s"__start div $seqLen"),
        expr(s"(__end - 1) div $seqLen"))))
      .withColumn("__span_start",
        greatest(col("__start"), col("seq_id") * L))
      .select(col(idCol),
        col("seq_id"),
        (col("__span_start") - col("__start")).as("tok_start"),
        (least(col("__end"), (col("seq_id") + 1) * L) -
          col("__span_start")).as("tok_len"))
  }
}
