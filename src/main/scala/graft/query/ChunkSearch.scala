package graft.query

import graft.query.QueryEngine.SearchOpts
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's ACTUAL search unit: searches run against a CHUNK-level
  * index and every hit is merged with its parent document's metadata, chunk
  * fields winning on shared names
  * (ai_search/backend/core/opensearch_service.py:145-171 — merged_source =
  * {**document_data, **chunk_source}, `_id` = document_id, chunk_score
  * preserved; indexer/indexer.py:330-340 chunk mapping).
  *
  * Scale shape: the chunk index is an ordinary [[SearchIndex]] (chunk docIds
  * are synthetic longs `parentNum * maxChunksPerDoc + chunk_index`), the hit
  * page is <= k rows, and both joins below broadcast THE PAGE into the big
  * tables — a chunk search costs one index search plus two broadcast-page
  * joins, never a shuffle of the chunk or document tables.
  */
object ChunkSearch {

  /** Synthetic long docId for a chunk row: parent numeric id packed with the
    * chunk index. Dense parent ids stay dense (append-stable docGroups).
    *
    * HARD guards (raise_error, job fails loudly): a chunk_index at or above
    * the pack width would alias into the NEXT parent's id space — a silent
    * wrong-parent merge no downstream check can catch (distinct docIds, so
    * the builder's collision check never fires); and a parent id above
    * Long.MaxValue / maxChunksPerDoc would overflow the multiply. Long
    * documents need a wider `maxChunksPerDoc`, hash-derived parent ids a
    * narrower one — the caller picks the split. */
  def chunkDocId(parentNum: org.apache.spark.sql.Column,
      chunkIndex: org.apache.spark.sql.Column, maxChunksPerDoc: Int = 64): org.apache.spark.sql.Column =
    when(chunkIndex >= maxChunksPerDoc || chunkIndex < 0,
        raise_error(concat(lit(s"chunk_index out of [0, $maxChunksPerDoc) for parent "),
          parentNum.cast("string"), lit(": "), chunkIndex.cast("string"))))
      .when(parentNum >= Long.MaxValue / maxChunksPerDoc || parentNum < 0,
        raise_error(concat(lit(s"parent id overflows Long at maxChunksPerDoc=$maxChunksPerDoc: "),
          parentNum.cast("string"))))
      .otherwise(parentNum * maxChunksPerDoc + chunkIndex)

  /** merge_chunk_and_document_data (opensearch_service.py:145-171): one
    * output row per chunk hit (a document hit twice appears twice, same
    * `_id`), INNER join (hits whose parent document is missing are dropped,
    * the `if document_data:` guard), document columns first and chunk
    * columns second — a column present on BOTH sides takes the CHUNK value
    * unconditionally (dict-merge semantics). If the chunk side carries a
    * `score` column, it is preserved additionally as `chunk_score`. */
  def mergeChunkDoc(chunkHits: DataFrame, documents: DataFrame,
      docIdCol: String = "document_id"): DataFrame = {
    val h = chunkHits.alias("h")
    val d = documents.alias("d")
    val hitCols = chunkHits.columns.filterNot(_ == docIdCol)
    val docOnly = documents.columns
      .filterNot(c => c == docIdCol || chunkHits.columns.contains(c))
    val outCols = Seq(col(s"h.$docIdCol").as("_id")) ++
      docOnly.map(c => col(s"d.$c")) ++ hitCols.map(c => col(s"h.$c")) ++
      (if (chunkHits.columns.contains("score"))
        Seq(col("h.score").as("chunk_score")) else Seq.empty)
    d.join(broadcast(h), col(s"d.$docIdCol") === col(s"h.$docIdCol"))
      .select(outCols.toSeq: _*)
  }

  /** Full chunk-level search (opensearch_service.py:173-196 flow): primary
    * chunk search with over-fetch + domain diversity (the chunk corpus sets
    * `repo` = parent domain, so R9's repo diversity IS the reference's
    * domain diversity), then the hit page is joined back to the chunk
    * table's fields and merged with parent documents, chunk precedence.
    *
    * `chunkMeta` must carry `docId` (the synthetic chunk docId of the index)
    * plus whatever chunk fields the result should expose (document_id,
    * chunk_index, text_chunk, word_count, ...); `documents` is keyed by
    * `docIdCol`. Result keeps the page's `rank` ordering column. */
  def search(index: SearchIndex, chunkMeta: DataFrame, documents: DataFrame,
      query: String, opts: SearchOpts = SearchOpts(),
      docIdCol: String = "document_id"): DataFrame = {
    val page = QueryEngine.search(index, query, opts)
      .select(col("rank"), col("docId"), col("score"))
    val chunkHits = chunkMeta.join(broadcast(page), Seq("docId")).drop("docId")
    mergeChunkDoc(chunkHits, documents, docIdCol)
  }
}
