package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Text

/** Sequence packing (SURVEY.md §2.10): concat-and-chunk — documents are
  * laid end-to-end in a deterministic order and cut into fixed-capacity
  * context windows, the packing LLM training pipelines actually use
  * (greedy bin packing is inherently sequential; concatenate-then-chunk
  * is order-deterministic, wastes zero tokens, and is pure integer
  * window arithmetic — so it distributes AND carries an exact oracle).
  *
  * Scale shape: the cumulative token sum is windowed PER SHARD
  * (`shardCol`), not globally — a global total order would serialize on
  * one partition at 100 TB; sharding is also what production packing
  * does (each shard becomes an independent stream of training
  * sequences). One shuffle on the shard key, then narrow arithmetic and
  * a bounded explode (a doc spans ⌈n/capacity⌉+1 chunks at most).
  */
object Pack {

  /** Per-shard running token totals — (source, doc_id, n, cum) in
    * deterministic id order. The shared prologue of [[concatChunk]] and
    * [[graft.pipelines.Corpus.budgetMix]]: both exact oracles assume
    * identical tokenization and window framing, so the cumsum lives in
    * exactly one place. */
  def tokenCumsumByShard(docs: DataFrame, shardCol: String, idCol: String,
                         textCol: String): DataFrame =
    docs.select(col(shardCol).as("source"), col(idCol).as("doc_id"),
      Text.tokenCountWs(col(textCol)).cast("long").as("n"))
      .withColumn("cum", sum(col("n"))
        .over(Window.partitionBy("source").orderBy("doc_id")))

  /** Map each doc to the context chunks it occupies: (shard, doc_id,
    * chunk_id, tokens_in_chunk). Token mass is exactly preserved; every
    * chunk but a shard's last holds exactly `capacity` tokens. Empty
    * docs (0 tokens) occupy no chunk. */
  def concatChunk(docs: DataFrame, shardCol: String, idCol: String,
                  textCol: String, capacity: Int): DataFrame = {
    tokenCumsumByShard(docs, shardCol, idCol, textCol)
      .filter(col("n") > 0)
      .withColumn("a", expr(s"(cum - n) div $capacity"))
      .withColumn("b", expr(s"(cum - 1) div $capacity"))
      .select(col("source"), col("doc_id"), col("cum"), col("n"),
        explode(sequence(col("a"), col("b"))).as("chunk_id"))
      .select(col("source"), col("doc_id"), col("chunk_id"),
        (least(col("cum"), (col("chunk_id") + 1) * capacity) -
          greatest(col("cum") - col("n"), col("chunk_id") * capacity))
          .as("tokens_in_chunk"))
  }

  /** Overlapping sliding-window chunks — the RAG/embedding-input shape
    * (window of `width` words every `stride` words, so context straddling
    * a boundary survives in the next window). Per doc: window w starts at
    * word w·stride+1; windows exist while their start is in range, the
    * last one may be short. Narrow explode (one generator per doc, no
    * shuffle at all); chunk count per doc = ⌈len/stride⌉, total output
    * ≈ width/stride × corpus — the standard storage/recall trade. */
  def overlapChunks(docs: DataFrame, idCol: String, textCol: String,
                    width: Int, stride: Int): DataFrame = {
    require(stride > 0 && width >= stride,
      s"overlapChunks: need width >= stride > 0, got ($width, $stride)")
    val words = graft.functions.Text.tokens(col(textCol))
    docs.select(col(idCol).as("doc_id"), words.as("ws"))
      .select(col("doc_id"),
        explode(sequence(lit(0),
          expr(s"(size(ws) - 1) div $stride").cast("int"))).as("chunk_idx"),
        col("ws"))
      .select(col("doc_id"), col("chunk_idx").cast("int").as("chunk_idx"),
        concat_ws(" ", slice(col("ws"), col("chunk_idx") * stride + 1, lit(width)))
          .as("chunk_text"),
        least(size(col("ws")) - col("chunk_idx") * stride, lit(width))
          .as("n_words"))
  }
}
