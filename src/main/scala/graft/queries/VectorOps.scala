package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables

/** Embedding similarity pack over the `embeddings` table (64-dim float vecs).
  *
  * Float parity with the DuckDB oracle: every dot/norm is a sequential
  * left-fold over doubles (`aggregate` in Spark ≙ `list_reduce` in DuckDB),
  * so results are bit-identical — no group-ordering nondeterminism.
  *
  * Scale design: brute-force top-k is the correctness baseline (broadcast the
  * query set, never the corpus); the bucketed variant (q32) is the 100 TB
  * path — candidates are co-partitioned by bucket so the big side shuffles
  * once on a short key instead of cross-joining.
  */
object VectorOps {
  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  /** Left-fold sum of an array<double> column (parity with list_reduce). */
  private def foldSum(arr: Column): Column =
    aggregate(arr, lit(0.0), (acc, x) => acc + x)

  private def dot(a: Column, b: Column): Column =
    foldSum(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")))

  private def norm(a: Column): Column = sqrt(dot(a, a))

  private def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Same cosine, as a native codegen'd Catalyst expression for the hot
    * ANN path: higher-order functions evaluate interpreted, and a Scala
    * UDF pays boxing + a serialization boundary; the native expression
    * reads floats straight out of Tungsten ArrayData inside whole-stage
    * codegen. Identical left-to-right double accumulation → bit-identical
    * to [[cosine]] and the DuckDB list_reduce oracle
    * (graft.functions.CosineSimilarity, ExpressionsSpec). */
  private val cosineNative = graft.functions.Expressions.cosineSim _

  /** Sign-bucket LSH: signs of the first 4 coordinates (deterministic,
    * portable; random hyperplanes would need engine-specific RNG). */
  private def bucket(a: Column): Column =
    concat((1 to 4).map(i => (element_at(a, i) > 0.0f).cast("int").cast("string")): _*)

  val defs: Map[String, Q] = Map(
    // Pairwise cosine over adjacent vec ids — the scalar primitive.
    // One bucketed-window pass (graft.operators.AdjacentPairs), no
    // self-join: the corpus shuffles once on a dense bucket key.
    "q30_cosine_pairs" -> ((s, dir) => {
      val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      graft.operators.AdjacentPairs.pairs(e, "vec_id")
        .select(col("vec_id_a"), col("vec_id_b"),
          round(cosine(col("embedding_a"), col("embedding_b")), 6).as("cos_sim"))
    }),

    // Brute-force ANN: top-5 cosine neighbors for a fixed query set.
    // Query side broadcast; corpus streamed once; output ids+rank only
    // (floats stay internal so ranking ties are the only hash risk).
    "q31_ann_topk" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val queries = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      // repartition: the corpus arrives as one parquet split; spread the
      // per-row cosine work across cores (at cluster scale: across executors)
      val cand = e.repartition(col("vec_id"))
        .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
      val w = Window.partitionBy("q_id")
        .orderBy(col("cos_sim").desc, col("c_id"))
      cand.crossJoin(broadcast(queries))
        .filter(col("c_id") =!= col("q_id"))
        .withColumn("cos_sim", cosineNative(col("q_emb"), col("c_emb")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select("q_id", "c_id", "rank")
    }),

    // Bucketed (LSH) ANN: search only within the query's sign-bucket.
    "q32_ann_bucketed" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
        .withColumn("bucket", bucket(col("embedding")))
      val queries = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
          col("bucket"))
      val cand = e.select(col("vec_id").as("c_id"),
        col("embedding").as("c_emb"), col("bucket"))
      val w = Window.partitionBy("q_id")
        .orderBy(col("cos_sim").desc, col("c_id"))
      cand.join(broadcast(queries), Seq("bucket"))
        .filter(col("c_id") =!= col("q_id"))
        .withColumn("cos_sim", cosineNative(col("q_emb"), col("c_emb")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select("q_id", "c_id", "rank")
    }),

    // IVF ANN: coarse-quantize the corpus to cells (centroids = first 8
    // vectors, deterministic ≙ a trained codebook slot), then search only
    // the query's cell. The 100 TB shape: assignment is one broadcast pass
    // over the corpus (cells persist as a column / partition key), search
    // shuffles on the short cell key — never the full corpus.
    "q43_ann_ivf" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val cents = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cent_id"), col("embedding").as("cent_emb"))
      val wAssign = Window.partitionBy("vec_id")
        .orderBy(col("cos_c").desc, col("cent_id"))
      val assigned = e.repartition(col("vec_id"))
        .crossJoin(broadcast(cents))
        .withColumn("cos_c", cosineNative(col("embedding"), col("cent_emb")))
        .withColumn("r", row_number().over(wAssign))
        .filter(col("r") === 1)
        .select(col("vec_id"), col("embedding"), col("cent_id").as("cell"))
      val queries = assigned.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
          col("cell"))
      val wTop = Window.partitionBy("q_id")
        .orderBy(col("cos_sim").desc, col("c_id"))
      assigned
        .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"),
          col("cell"))
        .join(broadcast(queries), Seq("cell"))
        .filter(col("c_id") =!= col("q_id"))
        .withColumn("cos_sim", cosineNative(col("q_emb"), col("c_emb")))
        .withColumn("rank", row_number().over(wTop))
        .filter(col("rank") <= 3)
        .select("q_id", "c_id", "rank")
    }),

    // Embedding-cosine near-duplicate detection (adjacent-id candidate
    // set) — same one-pass AdjacentPairs shape as q30.
    "q34_embed_neardup" -> ((s, dir) => {
      val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      graft.operators.AdjacentPairs.pairs(e, "vec_id")
        .withColumn("cos_sim", cosine(col("embedding_a"), col("embedding_b")))
        .filter(col("cos_sim") > 0.2)
        .select(col("vec_id_a"), col("vec_id_b"),
          round(col("cos_sim"), 6).as("cos_sim"))
    })
  )

  // DuckDB mirror of dot/cosine: sequential left-fold in double.
  private def sqlDot(a: String, b: String) =
    s"""list_reduce(
       |  list_transform(list_zip($a, $b),
       |    p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)),
       |  (x, y) -> x + y)""".stripMargin
  private def sqlCos(a: String, b: String) =
    s"(${sqlDot(a, b)}) / (sqrt(${sqlDot(a, a)}) * sqrt(${sqlDot(b, b)}))"

  private val sqlBucket =
    (1 to 4).map(i =>
      "CAST(CAST(embedding[" + i + "] > 0.0 AS INT) AS VARCHAR)")
      .mkString(" || ")

  val oracles: Map[String, String] = Map(
    "q30_cosine_pairs" ->
      s"""SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
         |  round(${sqlCos("a.embedding", "b.embedding")}, 6) AS cos_sim
         |FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1""".stripMargin,

    "q31_ann_topk" ->
      s"""SELECT q_id, c_id, rank FROM (
         |  SELECT q.vec_id AS q_id, c.vec_id AS c_id,
         |    row_number() OVER (PARTITION BY q.vec_id
         |      ORDER BY ${sqlCos("q.embedding", "c.embedding")} DESC, c.vec_id) AS rank
         |  FROM embeddings q CROSS JOIN embeddings c
         |  WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id)
         |WHERE rank <= 5""".stripMargin,

    "q32_ann_bucketed" ->
      s"""WITH bucketed AS (
         |  SELECT vec_id, embedding, $sqlBucket AS bucket FROM embeddings)
         |SELECT q_id, c_id, rank FROM (
         |  SELECT q.vec_id AS q_id, c.vec_id AS c_id,
         |    row_number() OVER (PARTITION BY q.vec_id
         |      ORDER BY ${sqlCos("q.embedding", "c.embedding")} DESC, c.vec_id) AS rank
         |  FROM bucketed q JOIN bucketed c USING (bucket)
         |  WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id)
         |WHERE rank <= 3""".stripMargin,

    "q43_ann_ivf" ->
      s"""WITH assigned AS (
         |  SELECT vec_id, embedding, cent_id AS cell FROM (
         |    SELECT v.vec_id, v.embedding, c.vec_id AS cent_id,
         |      row_number() OVER (PARTITION BY v.vec_id
         |        ORDER BY ${sqlCos("v.embedding", "c.embedding")} DESC,
         |                 c.vec_id) AS r
         |    FROM embeddings v CROSS JOIN embeddings c WHERE c.vec_id < 8)
         |  WHERE r = 1)
         |SELECT q_id, c_id, rank FROM (
         |  SELECT q.vec_id AS q_id, x.vec_id AS c_id,
         |    row_number() OVER (PARTITION BY q.vec_id
         |      ORDER BY ${sqlCos("q.embedding", "x.embedding")} DESC,
         |               x.vec_id) AS rank
         |  FROM assigned q JOIN assigned x USING (cell)
         |  WHERE q.vec_id < 10 AND x.vec_id <> q.vec_id)
         |WHERE rank <= 3""".stripMargin,

    "q34_embed_neardup" ->
      s"""SELECT vec_id_a, vec_id_b, round(cos_sim, 6) AS cos_sim FROM (
         |  SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
         |    ${sqlCos("a.embedding", "b.embedding")} AS cos_sim
         |  FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1)
         |WHERE cos_sim > 0.2""".stripMargin
  )
}
