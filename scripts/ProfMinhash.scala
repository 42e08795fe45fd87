package graft

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Scratch stage-profiler for the minhash pipeline (not part of the API). */
object ProfMinhash {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = Tables.load(spark, dir, "documents")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    println(s"[prof] docs=${docs.count()}")

    val hashed = docs.select(col("doc_id").as("id"),
      graft.functions.ShingleHashes(col("text"), 3).as("base"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    time("hash+persist")(hashed.count())
    time("avg shingles")(println("  avg=" +
      hashed.agg(avg(size(col("base")))).first().getDouble(0)))

    val banded = hashed.select(col("id"),
      posexplode(graft.functions.MinHashBands(col("base"), 64, 16))
        .as(Seq("band", "bucket")))
    time("minhash+bands")(banded.count())

    val l = banded.select(col("band"), col("bucket"), col("id").as("id_a"))
    val r = banded.select(col("band"), col("bucket"), col("id").as("id_b"))
    val candidates = l.join(r, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")
      .persist(StorageLevel.MEMORY_AND_DISK)
    time("candidate join")(println("  cands=" + candidates.count()))

    val verified = candidates
      .join(hashed.select(col("id").as("id_a"), col("base").as("sh_a")), Seq("id_a"))
      .join(hashed.select(col("id").as("id_b"), col("base").as("sh_b")), Seq("id_b"))
      .withColumn("jaccard", graft.operators.Dedup.jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= 0.7)
    time("verify join")(println("  pairs=" + verified.count()))

    time("full minhashPairs")(println("  pairs=" +
      graft.operators.Dedup.minhashPairs(docs, "doc_id", "text").count()))
    spark.stop()
  }
}
