package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.dedup.Dedup
import graft.similarity.Ann
import graft.text.TextQueries

/** Training-data-pipeline queries over `documents` / `embeddings` plus
  * their DuckDB oracles — ALL of them, including the hash-dependent ones
  * (SimHash, MinHash, LSH, fingerprint), whose custom arithmetic is
  * replayed exactly in SQL via HUGEINT mod-2^64 folds. */
object DocQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dd_exact" -> ((s, d) => Dedup.exact(s, d)),
    "dd_token_jaccard" -> ((s, d) => Dedup.tokenJaccard(s, d)),
    "dd_ngram" -> ((s, d) => Dedup.ngramJaccard(s, d)),
    "dd_minhash" -> ((s, d) => Dedup.verifiedPairsShared(s, d)),
    "dd_simhash" -> ((s, d) => Dedup.simhashPairs(s, d)),
    "dd_embed_cosine" -> ((s, d) => Ann.cosinePairs(s, d)),
    "ann_topk" -> ((s, d) => Ann.bruteTopK(s, d)),
    "ann_lsh" -> ((s, d) => Ann.lshTopK(s, d)),
    "ann_lsh_recall" -> ((s, d) => Ann.lshRecall(s, d)),
    "ann_ivf" -> ((s, d) => Ann.ivfTopK(s, d)),
    "dd_cluster" -> ((s, d) => Dedup.minhashClusters(s, d)),
    "dd_keep" -> ((s, d) => Dedup.keepTable(s, d)),
    "dd_contaminate" -> ((s, d) => Dedup.contamination(s, d)),
    "ta_split" -> ((s, d) => TextQueries.splitAssign(s, d)),
    "dd_embed_cluster" -> ((s, d) => Ann.cosineClusters(s, d)),
    "ta_tokens" -> ((s, d) => TextQueries.tokens(s, d)),
    "ta_quality" -> ((s, d) => TextQueries.quality(s, d)),
    "ta_langid" -> ((s, d) => TextQueries.langId(s, d)),
    "ta_fingerprint" -> ((s, d) => TextQueries.fingerprints(s, d)),
    "ta_bpe" -> ((s, d) => TextQueries.bpeTokens(s, d)),
    "ta_filter" -> ((s, d) => TextQueries.qualityFilter(s, d))
  )

  /** Shared CTE block: exact 3-word-shingle Jaccard pairs at J >= 0.7 —
    * the ground truth both dd_minhash and dd_cluster build on. */
  private val MinhashPairCtes: String =
    """words AS (
      |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws FROM documents
      |), sh AS (
      |  SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
      |  FROM words, LATERAL (SELECT unnest(range(1, len(ws) - 1)) AS i) t
      |), sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
      |inter AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
      |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2
      |),
      |pairs AS (
      |  SELECT id_a, id_b, i * 1.0 / (sa.sz + sb.sz - i) AS jac
      |  FROM inter
      |  JOIN sizes sa ON sa.doc_id = id_a
      |  JOIN sizes sb ON sb.doc_id = id_b
      |  WHERE i * 1.0 / (sa.sz + sb.sz - i) >= 0.7
      |)""".stripMargin

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
    // character-5-gram replay: DuckDB range(a,b) is [a,b) — positions
    // 1..len-4 = range(1, len-3); greatest(...,2) mirrors the Spark side's
    // whole-short-text single gram (substr past len clamps identically).
    // Blocking is lang only (NOT n_chars): the missing-space near-dups the
    // query targets differ in length
    "dd_ngram" ->
      """WITH g AS (
        |  SELECT DISTINCT doc_id, lang, substr(text, i, 5) AS tok
        |  FROM documents, LATERAL (SELECT unnest(range(1, greatest(len(text) - 3, 2))) AS i) t
        |), sizes AS (SELECT doc_id, count(*) AS sz FROM g GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
        |  FROM g a JOIN g b
        |    ON a.tok = b.tok AND a.lang = b.lang
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
    // MinHash-LSH emits LSH-surfaced candidate pairs verified by exact
    // shingle Jaccard; on this corpus LSH recall is 1 (16 bands x 4 rows:
    // per-pair miss is 1-(1-J^4)^16 — ~1.2e-2 AT J=0.7 exactly, ~2e-4 by
    // J=0.8, measured against seeded threshold-adjacent pairs in
    // DedupSpec's recall property — and the corpus identity is verified
    // empirically at sf0.01 and sf0.1), so the oracle is the full
    // true-Jaccard pair set computed from 3-word shingles in plain SQL.
    "dd_minhash" ->
      s"""WITH $MinhashPairCtes
         |SELECT id_a, id_b, round(jac, 4) AS jaccard FROM pairs""".stripMargin,
    // near-dup pairs straddling the id-based test boundary (doc_id%10=0):
    // the train/test leakage an id split admits — same verified pair
    // ground truth as dd_minhash
    "dd_contaminate" ->
      s"""WITH $MinhashPairCtes
         |SELECT id_a, id_b, round(jac, 4) AS jaccard,
         |  CASE WHEN id_a % 10 = 0 THEN id_a ELSE id_b END AS test_doc
         |FROM pairs WHERE (id_a % 10 = 0) <> (id_b % 10 = 0)""".stripMargin,
    // connected components over the same verified pair graph: the oracle
    // replays the clustering as a recursive transitive closure and labels
    // each doc with the minimum reachable doc_id
    "dd_cluster" ->
      s"""WITH RECURSIVE $MinhashPairCtes,
         |edges AS (
         |  SELECT id_a AS src, id_b AS dst FROM pairs
         |  UNION SELECT id_b, id_a FROM pairs
         |),
         |reach AS (
         |  SELECT src AS doc_id, dst AS r FROM edges
         |  UNION
         |  SELECT e.src, r.r FROM edges e JOIN reach r ON r.doc_id = e.dst
         |)
         |SELECT doc_id, cast(least(doc_id, min(r)) AS BIGINT) AS cluster_id
         |FROM reach GROUP BY doc_id""".stripMargin,
    // the keep table: documents minus non-canonical members of the same
    // recursive-closure clusters dd_cluster replays (read back through the
    // snapshot seam on the Spark side — the oracle checks the lifecycle
    // output row-for-row)
    "dd_keep" ->
      s"""WITH RECURSIVE $MinhashPairCtes,
         |edges AS (
         |  SELECT id_a AS src, id_b AS dst FROM pairs
         |  UNION SELECT id_b, id_a FROM pairs
         |),
         |reach AS (
         |  SELECT src AS doc_id, dst AS r FROM edges
         |  UNION
         |  SELECT e.src, r.r FROM edges e JOIN reach r ON r.doc_id = e.dst
         |),
         |labels AS (
         |  SELECT doc_id, least(doc_id, min(r)) AS cluster_id
         |  FROM reach GROUP BY doc_id
         |)
         |SELECT doc_id, lang, n_chars FROM documents
         |WHERE doc_id NOT IN (SELECT doc_id FROM labels WHERE cluster_id <> doc_id)""".stripMargin,
    // SimHash pigeonhole candidates are EXACT for hamming<=3 (4 blocks), so
    // the oracle recomputes the 64-bit fingerprints from scratch: FNV-1a per
    // word occurrence via a HUGEINT mod-2^64 fold, per-bit majority votes,
    // then the O(n^2) hamming pair join (fine at oracle scale).
    "dd_simhash" ->
      """WITH words AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS w FROM documents
        |), wh AS (
        |  SELECT doc_id, CAST(list_reduce(
        |    list_prepend(CAST(14695981039346656037 AS HUGEINT),
        |      [CAST(unicode(x) AS HUGEINT) for x in regexp_split_to_array(w, '')]),
        |    (h, c) -> (xor(CAST(h AS UBIGINT), CAST(c AS UBIGINT)) * CAST(1099511628211 AS HUGEINT))
        |              % 18446744073709551616) AS UBIGINT) AS h
        |  FROM words
        |), bits AS (
        |  SELECT doc_id, bit,
        |    sum(CASE WHEN (h >> bit) & 1 = 1 THEN 1 ELSE -1 END) AS acc
        |  FROM wh, (SELECT unnest(range(64)) AS bit) b
        |  GROUP BY doc_id, bit
        |), sig AS (
        |  SELECT doc_id,
        |    CAST(sum(CASE WHEN acc > 0 THEN CAST(CAST(1 AS UBIGINT) << bit AS HUGEINT) ELSE 0 END)
        |      % 18446744073709551616 AS UBIGINT) AS s
        |  FROM bits GROUP BY doc_id
        |)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(bit_count(xor(a.s, b.s)) AS INTEGER) AS hamming
        |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.s, b.s)) <= 3""".stripMargin,
    // connected components over the same cosine pair graph dd_embed_cosine
    // verifies, replayed as a recursive transitive closure (the dd_cluster
    // oracle pattern)
    "dd_embed_cluster" ->
      """WITH RECURSIVE e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |p AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
        |  WHERE a.vec_id % 20 = 0
        |    AND list_inner_product(a.v, b.v)
        |      / (sqrt(list_inner_product(a.v, a.v)) * sqrt(list_inner_product(b.v, b.v))) >= 0.4
        |),
        |edges AS (
        |  SELECT id_a AS src, id_b AS dst FROM p
        |  UNION SELECT id_b, id_a FROM p
        |),
        |reach AS (
        |  SELECT src AS vec_id, dst AS r FROM edges
        |  UNION
        |  SELECT e2.src, r.r FROM edges e2 JOIN reach r ON r.vec_id = e2.dst
        |)
        |SELECT vec_id, cast(least(vec_id, min(r)) AS BIGINT) AS cluster_id
        |FROM reach GROUP BY vec_id""".stripMargin,
    // full arithmetic replay of the banded random-hyperplane LSH (row
    // identity, not just the recall gate): the splitmix64-style planeCoef
    // mix (Ann.scala planeCoef) is recomputed via HUGEINT mod-2^64 folds —
    // the 64x64-bit multiply split into 32-bit halves so INT128 never
    // overflows, and the final signed value routed through BIGINT because
    // DuckDB's HUGEINT->DOUBLE cast truncates while BIGINT->DOUBLE rounds
    // to nearest like the JVM — then the 12-bit signature, the 4x3-bit
    // bands, the query-side Hamming-1 multi-probe, and the cosine ranking
    // are replayed verbatim (list_inner_product = the sequential zip_with/
    // aggregate dot product, precedent: ann_topk/ann_ivf hash-match).
    "ann_lsh" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |h0 AS (
        |  SELECT p, d,
        |    CAST((CAST(11400714819323198485 AS HUGEINT) * (p * 131 + d + 1))
        |      % 18446744073709551616 AS UBIGINT) AS h
        |  FROM (SELECT unnest(range(12)) AS p), (SELECT unnest(range(64)) AS d)
        |), h1 AS (SELECT p, d, xor(h, h >> 33) AS h FROM h0),
        |h2 AS (
        |  SELECT p, d, CAST((
        |      (CAST(h AS HUGEINT) % 4294967296) * CAST(18397679294719823053 AS HUGEINT)
        |      + ((CAST(h AS HUGEINT) // 4294967296) * CAST(18397679294719823053 AS HUGEINT)
        |         % 4294967296) * 4294967296
        |    ) % 18446744073709551616 AS UBIGINT) AS h
        |  FROM h1
        |), h3 AS (SELECT p, d, xor(h, h >> 33) AS h FROM h2),
        |coef AS (
        |  SELECT p, d,
        |    CAST(CAST(CASE WHEN CAST(h AS HUGEINT) >= 9223372036854775808
        |         THEN CAST(h AS HUGEINT) - 18446744073709551616
        |         ELSE CAST(h AS HUGEINT) END AS BIGINT) AS DOUBLE)
        |      / CAST(9223372036854775807 AS DOUBLE) AS c
        |  FROM h3
        |), planes AS (SELECT p, list(c ORDER BY d) AS pv FROM coef GROUP BY p),
        |sigs AS (
        |  SELECT e.vec_id,
        |    CAST(sum(CASE WHEN list_inner_product(pl.pv, e.v) >= 0
        |             THEN 1 << pl.p ELSE 0 END) AS INTEGER) AS sig
        |  FROM e, planes pl GROUP BY e.vec_id
        |), banded AS (
        |  SELECT vec_id, band, (sig >> (band * 3)) & 7 AS bb
        |  FROM sigs, (SELECT unnest(range(4)) AS band) b
        |), probes AS (
        |  SELECT b.vec_id AS q_id, b.band, xor(b.bb, f.flip) AS bb
        |  FROM banded b, (SELECT unnest([0, 1, 2, 4]) AS flip) f
        |  WHERE b.vec_id < 16
        |), cand AS (
        |  SELECT DISTINCT p.q_id, c.vec_id AS neighbor
        |  FROM probes p JOIN banded c ON c.band = p.band AND c.bb = p.bb
        |  WHERE c.vec_id <> p.q_id
        |), scored AS (
        |  SELECT cand.q_id, cand.neighbor,
        |    list_inner_product(qe.v, ce.v)
        |      / (sqrt(list_inner_product(qe.v, qe.v)) * sqrt(list_inner_product(ce.v, ce.v))) AS cos
        |  FROM cand
        |  JOIN e qe ON qe.vec_id = cand.q_id
        |  JOIN e ce ON ce.vec_id = cand.neighbor
        |), r AS (
        |  SELECT q_id, neighbor, cos,
        |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor) AS rank
        |  FROM scored
        |)
        |SELECT q_id, rank, neighbor, round(cos, 4) AS cos FROM r WHERE rank <= 5""".stripMargin,
    // every query must recover >=4 of its true top-5 through the banded LSH
    "ann_lsh_recall" ->
      """SELECT vec_id AS q_id, TRUE AS recall_ok FROM embeddings
        |WHERE vec_id < 16""".stripMargin,
    // faithful IVF replay: same deterministic codebook (vec_id < 16), same
    // argmax cell assignment and nProbe=4 probe order (ties -> lowest cid,
    // matching the stable sort in Ann.ivfTopK), same sequential-order dot
    // products (list_inner_product reproduces zip_with/aggregate exactly —
    // precedent: dd_embed_cosine hash-matches).
    "ann_ivf" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |cent AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 16),
        |asg AS (
        |  SELECT vec_id, v, cell FROM (
        |    SELECT e.vec_id, e.v, c.cid AS cell,
        |      row_number() OVER (PARTITION BY e.vec_id
        |        ORDER BY list_inner_product(c.cv, e.v) DESC, c.cid) AS rn
        |    FROM e, cent c) WHERE rn = 1
        |), probes AS (
        |  SELECT q_id, qv, cell FROM (
        |    SELECT e.vec_id AS q_id, e.v AS qv, c.cid AS cell,
        |      row_number() OVER (PARTITION BY e.vec_id
        |        ORDER BY list_inner_product(c.cv, e.v) DESC, c.cid) AS rn
        |    FROM e, cent c WHERE e.vec_id < 16) WHERE rn <= 4
        |), scored AS (
        |  SELECT p.q_id, a.vec_id AS neighbor,
        |    list_inner_product(p.qv, a.v)
        |      / (sqrt(list_inner_product(p.qv, p.qv)) * sqrt(list_inner_product(a.v, a.v))) AS cos
        |  FROM probes p JOIN asg a ON a.cell = p.cell AND a.vec_id <> p.q_id
        |), r AS (
        |  SELECT q_id, neighbor, cos,
        |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor) AS rank
        |  FROM scored
        |)
        |SELECT q_id, rank, neighbor, round(cos, 4) AS cos FROM r WHERE rank <= 5""".stripMargin,
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
