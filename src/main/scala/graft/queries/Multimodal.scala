package graft.queries

import graft.{QueryDef, QueryModule, Tables}
import graft.functions.{VectorFunctions => VF}
import org.apache.spark.sql.functions._

/** Multimodal columns (SURVEY.md §2.10): text + vector + scalar
  * joined into one relation, and opaque-binary plumbing (byte length,
  * content hash, head-bytes hex) over a binary column derived from
  * text. The richer decode/feature-extract stubs (which need non-SQL
  * batch processing) live in graft.multimodal.BinaryPipeline with
  * their own ScalaTest coverage — these two queries are the
  * oracle-gradeable relational surface.
  */
object Multimodal extends QueryModule {

  /** documents ⋈ embeddings on shared id: one row per doc carrying
    * text metadata AND its vector's norm/dim — the canonical
    * multimodal relation.
    */
  val multimodalJoin = QueryDef(
    "q_multimodal_join",
    (s, d) =>
      Tables.documents(s, d)
        .join(Tables.embeddings(s, d),
          col("doc_id") === col("vec_id"))
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
          col("label"),
          size(col("embedding")).cast("long").as("dim"),
          round(VF.norm(col("embedding")), 4).as("vec_norm"))
        .orderBy(col("doc_id")),
    Some("""
      SELECT doc_id, lang, source, n_chars, label,
             CAST(len(embedding) AS BIGINT) AS dim,
             round(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                         CAST(embedding AS DOUBLE[]))), 4) AS vec_norm
      FROM documents JOIN embeddings ON doc_id = vec_id
      ORDER BY doc_id
    """))

  /** Opaque-binary plumbing: treat the payload as bytes — byte length,
    * sha256 content fingerprint, first-8-bytes hex preview. The same
    * schema shape an image/audio column would use (binary + typed
    * metadata).
    */
  val multimodalBinary = QueryDef(
    "q_multimodal_binary",
    (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          octet_length(col("text")).cast("long").as("n_bytes"),
          sha2(col("text").cast("binary"), 256).as("content_sha256"),
          lower(hex(substring(col("text").cast("binary"), 1, 8))).as("head_hex"))
        .orderBy(col("doc_id")),
    Some("""
      SELECT doc_id,
             CAST(strlen(text) AS BIGINT) AS n_bytes,
             sha256(text) AS content_sha256,
             lower(hex(substr(text, 1, 8))) AS head_hex
      FROM documents
      ORDER BY doc_id
    """))

  def defs: Seq[QueryDef] = Seq(multimodalJoin, multimodalBinary)
}
