package graft.extensions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the concat-and-chunk batching LLM pretraining
  * uses: documents are laid end-to-end into a per-shard token stream and
  * the stream is cut into fixed-`budget` training chunks. Each document
  * is assigned its token span and the chunk range it overlaps, from
  * which a loader materializes chunk contents.
  *
  * Plan shape: one narrow token count + ONE windowed cumulative sum
  * partitioned by the shard column — the shard is the parallel unit, so
  * packing 100 TB costs a single shuffle on the shard key and each
  * shard's running sum stays inside one task stream. A global (single-
  * partition) pack would serialize; shard-wise is how packing is done in
  * practice (shards = data-parallel workers). Order within a shard is
  * pinned by doc_id for determinism. */
object Packing {

  def packChunks(
      documents: DataFrame,
      budget: Int,
      shardCol: String = "lang"): DataFrame = {
    val nTok = size(split(coalesce(col("text"), lit("")), " ")).cast("long")
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    documents
      .select(col("doc_id"), col(shardCol).as("shard"), nTok.as("n_tok"))
      .withColumn("end_tok", sum("n_tok").over(w))
      .withColumn("start_tok", col("end_tok") - col("n_tok"))
      .withColumn("chunk_first", floor(col("start_tok") / budget).cast("long"))
      .withColumn("chunk_last",
        floor((col("end_tok") - 1) / budget).cast("long"))
  }

  /** Sliding-window chunking — the long-document splitter for context-
    * bounded training and RAG indexing: each document's token stream is
    * cut into windows of `win` tokens starting every `stride` tokens
    * (stride < win ⇒ overlapping chunks, the usual boundary-context
    * trick). Emits one row per chunk with its index, start offset, token
    * count, and text.
    *
    * Scale shape: pure narrow generate — split, an arithmetic sequence of
    * window starts, slice + posexplode. No shuffle, no window function,
    * no state; a 100 TB corpus chunks at scan speed. Chunk starts are
    * 0, stride, 2·stride, … while start < n_tok, so every token lands in
    * ≥1 chunk and the last chunk may be short. */
  def slidingChunks(documents: DataFrame, win: Int, stride: Int): DataFrame = {
    require(win > 0 && stride > 0, s"win/stride must be positive: $win/$stride")
    val arr = split(coalesce(col("text"), lit("")), " ")
    // n_tok >= 1 always: split("") = [""]; sequence stop stays >= 0. The
    // token array is let-bound (transform over a 1-element wrapper) so the
    // split runs once per row, not once per chunk slice.
    val chunks = flatten(transform(array(arr), a =>
      transform(
        sequence(lit(0), floor((size(a) - 1) / stride).cast("int")),
        k => slice(a, k * stride + 1, lit(win)))))
    documents
      .select(col("doc_id"), posexplode(chunks).as(Seq("chunk_idx", "chunk")))
      .select(col("doc_id"), col("chunk_idx"),
        (col("chunk_idx") * stride).cast("long").as("start_tok"),
        size(col("chunk")).cast("long").as("n_tok"),
        concat_ws(" ", col("chunk")).as("chunk_text"))
  }
}
