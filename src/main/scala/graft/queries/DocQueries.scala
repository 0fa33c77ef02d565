package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.dedup.Dedup
import graft.similarity.Ann
import graft.text.TextQueries

/** Training-data-pipeline queries over `documents` / `embeddings` plus
  * their DuckDB oracles (where SQL-expressible; LSH/SimHash/fingerprint
  * are hash-dependent and validated by ScalaTest instead). */
object DocQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dd_exact" -> ((s, d) => Dedup.exact(s, d)),
    "dd_token_jaccard" -> ((s, d) => Dedup.tokenJaccard(s, d)),
    "dd_minhash" -> ((s, d) => Dedup.minhashLsh(s, d)),
    "dd_simhash" -> ((s, d) => Dedup.simhashPairs(s, d)),
    "dd_embed_cosine" -> ((s, d) => Ann.cosinePairs(s, d)),
    "ann_topk" -> ((s, d) => Ann.bruteTopK(s, d)),
    "ann_lsh" -> ((s, d) => Ann.lshTopK(s, d)),
    "ann_ivf" -> ((s, d) => Ann.ivfTopK(s, d)),
    "ta_tokens" -> ((s, d) => TextQueries.tokens(s, d)),
    "ta_quality" -> ((s, d) => TextQueries.quality(s, d)),
    "ta_langid" -> ((s, d) => TextQueries.langId(s, d)),
    "ta_fingerprint" -> ((s, d) => TextQueries.fingerprints(s, d))
  )

  val oracles: Map[String, String] = TextQueries.oracles ++ Map(
    "dd_exact" ->
      """SELECT cast(min(doc_id) AS BIGINT) AS first_doc_id, count(*) AS n_docs, text
        |FROM documents GROUP BY text HAVING count(*) > 1""".stripMargin,
    "dd_token_jaccard" ->
      """WITH dtoks AS (
        |  SELECT DISTINCT doc_id, lang, n_chars,
        |    unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        |  FROM documents
        |), sizes AS (SELECT doc_id, count(*) AS sz FROM dtoks GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
        |  FROM dtoks a JOIN dtoks b
        |    ON a.tok = b.tok AND a.lang = b.lang AND a.n_chars = b.n_chars
        |   AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |)
        |SELECT id_a, id_b, round(i * 1.0 / (sa.sz + sb.sz - i), 4) AS jaccard
        |FROM inter
        |JOIN sizes sa ON sa.doc_id = id_a
        |JOIN sizes sb ON sb.doc_id = id_b
        |WHERE i * 1.0 / (sa.sz + sb.sz - i) >= 0.8""".stripMargin,
    "dd_embed_cosine" ->
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |p AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |    list_inner_product(a.v, b.v)
        |      / (sqrt(list_inner_product(a.v, a.v)) * sqrt(list_inner_product(b.v, b.v))) AS cos
        |  FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
        |  WHERE a.vec_id % 20 = 0
        |)
        |SELECT id_a, id_b, round(cos, 4) AS cos FROM p WHERE cos >= 0.4""".stripMargin,
    "ann_topk" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |s AS (
        |  SELECT q.vec_id AS q_id, c.vec_id AS neighbor,
        |    list_inner_product(q.v, c.v)
        |      / (sqrt(list_inner_product(q.v, q.v)) * sqrt(list_inner_product(c.v, c.v))) AS cos
        |  FROM e q, e c WHERE q.vec_id < 16 AND c.vec_id <> q.vec_id
        |),
        |r AS (SELECT q_id, neighbor, cos,
        |        row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor) AS rank
        |      FROM s)
        |SELECT q_id, rank, neighbor, round(cos, 4) AS cos FROM r WHERE rank <= 5""".stripMargin
  )
}
