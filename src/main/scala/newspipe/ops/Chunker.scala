package newspipe.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-size token chunking with overlap — the "cut every document into
  * model-window-sized pieces" step that feeds training sequence packing and
  * retrieval indexing. The reference has no chunking surface; this is the
  * standalone form of the stride idiom [[Dedup.spanDedup]] uses internally.
  *
  * Chunk starts are 1, 1+stride, 1+2·stride, … up to max(m − overlap, 1)
  * (stride = size − overlap), so consecutive chunks share exactly `overlap`
  * tokens and the final chunk keeps the tail (possibly shorter than
  * `size`, never empty). A doc shorter than `size` yields itself as one
  * chunk.
  *
  * Scale shape: tokenization is the native codegen'd kernel; chunk
  * construction is a per-row generate — no shuffle anywhere. Chunk text
  * re-joins normalized tokens (tokenization is not reversible), matching
  * spanDedup's contract.
  */
object Chunker {

  /** (idCol, chunk_idx 0-based, chunk_text). Null-id / null-text /
    * token-free rows are excluded.
    */
  def chunk(df: DataFrame, idCol: String, textCol: String, size: Int,
      overlap: Int = 0): DataFrame = {
    require(size >= 1, s"size must be >= 1, got $size")
    require(overlap >= 0 && overlap < size,
      s"overlap must be in [0, size), got $overlap for size $size")
    val stride = size - overlap
    val toks = df.filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).as("__id"), Dedup.tokens(col(textCol)).as("__toks"))
      .filter(size_(col("__toks")) > 0)
    toks.select(col("__id").as(idCol),
        posexplode(transform(
          sequence(lit(1), greatest(size_(col("__toks")) - overlap, lit(1)),
            lit(stride)),
          i => array_join(slice(col("__toks"), i, lit(size)), " ")))
          .as(Seq("chunk_idx", "chunk_text")))
      .withColumn("chunk_idx", col("chunk_idx").cast("long"))
  }

  // sql.functions.size, locally renamed: this object's `size` parameter
  // would otherwise shadow it
  private def size_(c: org.apache.spark.sql.Column) =
    org.apache.spark.sql.functions.size(c)
}
