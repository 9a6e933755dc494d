package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vector-similarity operators over an embedding column (Array[Float]).
  *
  * Baseline: brute-force cosine top-k — broadcast the (small) query set so
  * the corpus scans once with no shuffle; per-query top-k is a window over
  * the query key. Scale path: random-hyperplane LSH bucketing (cosine LSH)
  * so a 100 TB corpus probes only matching buckets.
  *
  * All arithmetic uses `zip_with`/`aggregate` higher-order expressions in
  * double precision — codegen-friendly, no UDF.
  */
object Vectors {

  private def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(asDouble(a), x => x * x), lit(0.0), (acc, v) => acc + v))

  /** Interpreted composition form (kept for reference); `cosine` below is
    * the fused native expression used on hot paths. */
  def cosineHof(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Fused single-loop cosine (custom Catalyst expression with codegen —
    * one traversal, no per-element lambda dispatch). Same accumulation
    * order as the composition form, so results are bit-identical. */
  def cosine(a: Column, b: Column): Column =
    graft.expressions.VectorExpressions.cosine_sim(a, b)

  /** Brute-force cosine top-k: for each row of `queries`, the `k` nearest
    * corpus rows. Queries are broadcast (must be driver-small); the corpus
    * is scanned exactly once. Ties break on ascending corpus id for
    * determinism. Self-matches (same id) are excluded. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")))
    val scored = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .join(q, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
              round(cosine(col("qv"), col("cv")), 6).as("cos_sim"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos_sim"))
  }

  /** Deterministic random hyperplanes: `nPlanes` × `dim`, components from a
    * fixed-seed generator. Literal arrays — shipped in the plan, tiny. */
  private def planes(nPlanes: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nPlanes, dim)(rnd.nextGaussian())
  }

  /** Sign-bit LSH signature under `nPlanes` fixed hyperplanes: an Int whose
    * bit i is (v · plane_i) >= 0. Cosine-similar vectors collide with high
    * probability (random hyperplane LSH, Charikar 2002). */
  def lshSignature(v: Column, dim: Int, nPlanes: Int, seed: Long): Column = {
    val ps = planes(nPlanes, dim, seed)
    val vd = asDouble(v)
    val bits = ps.zipWithIndex.map { case (p, i) =>
      val proj = (0 until dim).map(j => element_at(vd, j + 1) * lit(p(j))).reduce(_ + _)
      when(proj >= 0, lit(1 << i)).otherwise(lit(0))
    }
    bits.reduce(_.bitwiseOR(_))
  }

  /** Bucketed ANN top-k: a query scores only corpus rows it collides with in
    * at least one of `nTables` LSH tables (standard (b,L) scheme: L tables
    * drive recall up, b bits keep buckets small) — recall traded for probing
    * |bucket|-sized slices instead of a full scan. The bucket join shuffles
    * on (table, signature), so work distributes by bucket; at 100 TB the
    * corpus signatures would be precomputed and bucket-partitioned on write.
    *
    * Signature computation is staged through named columns (cast vector →
    * all-plane projections → per-table signatures): each stage references the
    * previous by attribute, so the 64-element cast runs once per row instead
    * of being inlined into every one of the b×L dot products. */
  /** Candidate pairs scored by exact cosine: corpus×queries rows colliding
    * in ≥1 LSH table, deduped. No ranking — consumers that need top-k add
    * the window; threshold consumers (near-dup) filter directly. */
  def lshScoredPairs(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, dim: Int,
                     bitsPerTable: Int = 8, nTables: Int = 4): DataFrame = {
    val ps = planes(bitsPerTable * nTables, dim, seed = 42L)
    val planesLit = typedLit(ps.map(_.toSeq).toSeq)
    def signed(df: DataFrame, idAs: String, vecAs: String) = df
      .select(col(idCol).as(idAs), col(vecCol).as(vecAs),
              asDouble(col(vecCol)).as("vd"))
      .select(col(idAs), col(vecAs),
        transform(planesLit,
          p => aggregate(zip_with(col("vd"), p, (x, w) => x * w),
                         lit(0.0), (acc, v) => acc + v)).as("projs"))
      .select(col(idAs), col(vecAs),
        posexplode(array((0 until nTables).map { t =>
          (0 until bitsPerTable).map { i =>
            when(element_at(col("projs"), t * bitsPerTable + i + 1) >= 0,
              lit(1 << i)).otherwise(lit(0))
          }.reduce(_ + _)
        }: _*)).as(Seq("tbl", "sig")))
    // candidate id-pairs first (16 B rows through the dedup shuffle), vectors
    // joined back afterwards — carrying both 64-float vectors through the
    // dedup shuffle made the stage spill-sensitive (measured 3.8-19 s at
    // sf0.1 depending on memory pressure; id-only dedup is stable)
    val sigC = signed(corpus, "neighbor_id", "cv").select("tbl", "sig", "neighbor_id")
    val sigQ = signed(queries, "query_id", "qv").select("tbl", "sig", "query_id")
    val pairs = sigC.join(sigQ, Seq("tbl", "sig"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"))
      .dropDuplicates("query_id", "neighbor_id")
    pairs
      .join(corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv")),
            Seq("neighbor_id"))
      .join(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")),
            Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
              round(cosine(col("qv"), col("cv")), 6).as("cos_sim"))
  }

  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, dim: Int, k: Int,
              bitsPerTable: Int = 8, nTables: Int = 4): DataFrame = {
    val scored = lshScoredPairs(corpus, queries, idCol, vecCol, dim,
      bitsPerTable, nTables)
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos_sim"))
  }
}
