package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Product quantization (PQ) ANN: code shape, encode determinism, and
  * top-k recall of the asymmetric-distance scan against the float
  * brute force (L2 ranking ≈ cosine ranking on these unit-ish synthetic
  * embeddings, so the shared brute-force oracle applies). */
class PqAnnSpec extends SparkSpec {

  private lazy val emb =
    graft.Tables.load(spark, SparkSpec.tiny, "embeddings")

  private lazy val books =
    Similarity.pqTrain(emb, "embedding", m = 16, ksub = 32)

  test("codebooks: m subspaces x ksub centroids of dim/m length") {
    assert(books.length == 16)
    assert(books.forall(_.length == 32))
    val dim = emb.select(size(col("embedding"))).first().getInt(0)
    assert(books.forall(_.forall(_.length == dim / 16)))
  }

  test("encode emits one in-range code per subspace, deterministically") {
    val codes = Similarity.pqEncode(emb.limit(50), "embedding", books)
      .select(col("pq_code")).collect().map(_.getSeq[Int](0))
    assert(codes.forall(_.length == 16))
    assert(codes.forall(_.forall(c => c >= 0 && c < 32)))
    val again = Similarity.pqEncode(emb.limit(50), "embedding", books)
      .select(col("pq_code")).collect().map(_.getSeq[Int](0))
    assert(codes.toSeq == again.toSeq)
  }

  test("ADC top-k recall@10 >= 0.9 vs exact L2 brute force (ADC shortlist + refine)") {
    val queries = emb.filter(col("vec_id") < 5)
    // exact L2 ranking (the metric PQ approximates)
    val l2w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("d").asc, col("neighbor_id"))
    val exact = queries.select(col("vec_id").as("query_id"),
        col("embedding").as("__q"))
      .crossJoin(emb.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("__c")))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("d", Similarity.l2Distance(col("__q"), col("__c")))
      .withColumn("rk", row_number().over(l2w))
      .filter(col("rk") <= 10)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.pqTopK(queries, emb, "vec_id", "vec_id",
        "embedding", 10, books, rerank = 8)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall")
  }

  test("ADC scan broadcasts the query LUT side") {
    val plan = Similarity.pqTopK(emb.filter(col("vec_id") < 3), emb,
      "vec_id", "vec_id", "embedding", 5, books)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"))
  }
}
