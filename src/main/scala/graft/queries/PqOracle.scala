package graft.queries

/** Oracle support for q_ann_pq: the run records the ADC shortlist (the
  * approximate stage, bounded at queries×k×rerank rows) and the dynamic
  * oracle embeds it as a VALUES list so DuckDB recomputes the
  * DETERMINISTIC exact-refine stage — exact L2 over the shortlisted
  * pairs, per-query top-k — and hash-matches the engine's result. The
  * shortlist itself stays verified by PqAnnSpec's recall bound (it is
  * approximate by design; FAISS IVFPQ+refine shape). */
object PqOracle {
  @volatile var shortlist: Seq[(Long, Long)] = Nil

  def oracleSql: Option[String] = {
    if (shortlist.isEmpty) None
    else {
      val values = shortlist
        .map { case (q, n) => s"($q, $n)" }.mkString(", ")
      Some(
        s"""WITH shortlist(sq, sn) AS (VALUES $values),
           |refined AS (
           |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           |         round(sqrt(list_sum(list_transform(range(1, 65),
           |           i -> (CAST(q.embedding[i] AS DOUBLE) -
           |                 CAST(c.embedding[i] AS DOUBLE)) *
           |                (CAST(q.embedding[i] AS DOUBLE) -
           |                 CAST(c.embedding[i] AS DOUBLE))))), 6)
           |           AS l2_dist
           |  FROM shortlist s
           |  JOIN embeddings q ON q.vec_id = s.sq
           |  JOIN embeddings c ON c.vec_id = s.sn),
           |ranked AS (
           |  SELECT query_id, neighbor_id, l2_dist,
           |         row_number() OVER (PARTITION BY query_id
           |             ORDER BY l2_dist, neighbor_id) AS rank
           |  FROM refined)
           |SELECT query_id, neighbor_id, l2_dist, rank
           |FROM ranked WHERE rank <= 3
           |ORDER BY query_id, rank""".stripMargin)
    }
  }
}
