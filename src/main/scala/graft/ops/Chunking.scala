package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document chunking for training/RAG prep: split each document into
  * fixed-size overlapping windows. Entirely narrow — one codegen'd
  * projection computes the chunk count, one generator explodes the
  * chunk index, one `substr` slices; zero shuffle, so throughput is
  * scan-bound and scales linearly with input splits. (Chunk on the
  * CHARACTER budget here; [[Packing]] owns the complementary
  * token-budget concat-and-chunk.)
  */
object Chunking {

  /** Fixed-size character chunks with `overlap` characters shared
    * between consecutive chunks (stride = `size - overlap`). Chunk
    * starts are `0, stride, 2·stride, …`; the last chunk is the first
    * one whose window reaches the end of the text, so every character
    * lands in ≥ 1 chunk and no start begins past the end. A document of
    * `len ≤ size` (including empty) yields exactly one chunk.
    *
    * Returns (`idCol`, `chunk_id`, `chunk_text`, `chunk_len`).
    */
  def chunkFixed(
      docs: DataFrame, idCol: String, textCol: String,
      size: Int, overlap: Int = 0): DataFrame = {
    require(size > 0, "size must be positive")
    require(overlap >= 0 && overlap < size, "need 0 <= overlap < size")
    val stride = size - overlap
    val len = length(col(textCol))
    val nChunks = when(len <= size, lit(1L)).otherwise(
      lit(1L) + ceil((len - size).cast("double") / stride).cast("long"))
    docs
      .select(col(idCol), col(textCol),
        explode(sequence(lit(0L), nChunks - 1)).as("chunk_id"))
      .select(col(idCol), col("chunk_id"),
        col(textCol).substr(
          (col("chunk_id") * stride + 1).cast("int"), lit(size))
          .as("chunk_text"))
      .withColumn("chunk_len", length(col("chunk_text")))
  }
}
