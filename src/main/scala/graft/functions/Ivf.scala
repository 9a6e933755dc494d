package graft.functions

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor — the second scale path
  * the pipeline brief names alongside hyperplane LSH: a k-means coarse
  * quantizer splits the corpus into `nlist` cells; each query probes only
  * its `nprobe` nearest cells, so scan cost is ≈ corpus/nlist·nprobe
  * instead of the full corpus.
  *
  * Everything is declarative DataFrame ops + the fused cosine expression —
  * no MLlib, no UDFs: assignment is a broadcast join of the (tiny) centroid
  * table against the corpus with `max_by(cid, cos)` aggregation; Lloyd
  * updates are per-dimension `avg` aggregates. At 100 TB the assignment pass
  * runs ONCE at ingest (cells become the partition/bucket key of the stored
  * table) and training uses a driver-bounded sample; only the nprobe
  * cell-probe join runs per query batch.
  *
  * Deterministic end-to-end: seeded sample, md5-ranked init, fixed
  * iteration count — `nprobe == nlist` provably degenerates to exact
  * brute-force top-k (asserted in FunctionsSpec).
  */
object Ivf {

  final case class Model(centroids: Seq[(Int, Seq[Double])]) {
    def df(spark: SparkSession): DataFrame = {
      import org.apache.spark.sql.types._
      val schema = StructType(Seq(StructField("cid", IntegerType, false),
        StructField("cvec", ArrayType(DoubleType, false), false)))
      spark.createDataFrame(
        spark.sparkContext.parallelize(
          centroids.map { case (c, v) => Row(c, v) }.toList, 1), schema)
    }
  }

  /** Nearest-centroid assignment: broadcast the centroid table, score every
    * (row, centroid) pair with the fused cosine, keep the argmax. One
    * codegen'd broadcast-nested-loop pass, n×nlist work. max(struct) plans
    * as SortAggregate (struct buffers aren't hash-aggregable) but still
    * partial-combines map-side, so the shuffle carries one row per id — the
    * per-partition sort of n×nlist rows is the only extra cost, paid once
    * at ingest time at scale. */
  private def assign(df: DataFrame, cents: DataFrame, idCol: String,
                     vecCol: String): DataFrame =
    df.select(col(idCol).as("__id"), col(vecCol).as("__v"))
      .join(broadcast(cents))
      .groupBy("__id")
      .agg(max(struct(Vectors.cosine(col("__v"), col("cvec")).as("cos"),
                      col("cid"))).as("best"))
      .select(col("__id").as(idCol), col("best.cid").as("cid"))

  /** Train `nlist` centroids with `iters` Lloyd iterations over a
    * DRIVER-BOUNDED deterministic sample (≤ `maxSample` rows, selected by
    * hash-mod on the id — partition-layout-independent, so the same corpus
    * always trains the same model). Init: the nlist lowest-md5 sample rows,
    * planned as TakeOrdered (per-partition top-K + driver merge — never a
    * global sort, never a single-partition window).
    *
    * Centroids live on the DRIVER between iterations (nlist × dim doubles):
    * each Lloyd step collects the per-cell means and rebroadcasts them, so
    * training pins exactly one storage block set (the sample), released
    * before returning — a train call leaks nothing. */
  def train(df: DataFrame, idCol: String, vecCol: String, dim: Int,
            nlist: Int, iters: Int = 3,
            maxSample: Int = 100000): Model = {
    val spark = df.sparkSession
    // hash-mod sampling: keep every m-th id by 64-bit hash. m is derived
    // from one count() (metadata-cheap on parquet); at test SF m == 1 and
    // the full corpus trains — at 100 TB the sample stays ≤ maxSample-ish.
    val n = df.count()
    val target = math.max(nlist.toLong, math.min(n, maxSample.toLong))
    val m = math.max(1L, n / math.max(1L, target))
    // iterated over → materialize once, SCOPED (training is pure driver
    // output — a Model of nlist×dim doubles — so nothing escapes the scope)
    graft.core.Mat.withMaterialized(df
      .filter(pmod(xxhash64(col(idCol).cast("string")), lit(m)) === 0)
      .select(col(idCol).as("__id"),
        org.apache.spark.sql.functions.transform(col(vecCol),
          x => x.cast("double")).as("__v"))
    ) { sample =>
      val init = sample
        .select(md5(col("__id").cast("string")).as("__k"), col("__v"))
        .orderBy(col("__k")).limit(nlist) // TakeOrderedAndProject
        .collect()
      var cents: Seq[(Int, Seq[Double])] =
        init.sortBy(_.getString(0)).zipWithIndex
          .map { case (r, i) => i -> r.getSeq[Double](1) }.toSeq
      (1 to iters).foreach { _ =>
        val assigned = assign(sample, Model(cents).df(spark), "__id", "__v")
          .join(sample, "__id")
        // per-dimension means as plain aggregates (codegen'd, one shuffle)
        val avgCols = (0 until dim).map(i => avg(col("__v")(i)).as(s"d$i"))
        cents = assigned.groupBy("cid")
          .agg(avgCols.head, avgCols.tail: _*)
          .select(col("cid"), array((0 until dim).map(i => col(s"d$i")): _*).as("cvec"))
          .collect().toSeq // nlist × dim doubles — driver-tiny
          .map(r => r.getInt(0) -> r.getSeq[Double](1))
      }
      Model(cents)
    }
  }

  /** Probe-and-rescore over an existing cell layout: per-query nprobe
    * nearest centroids (broadcast centroid table), scan ONLY the probed
    * cells, exact-rescore with the fused cosine, per-query top-k. The
    * probes side is broadcast into the cell join, so the (big) cell table
    * never shuffles here. */
  private def probeCells(cells: DataFrame, cents: DataFrame,
                         queries: DataFrame, idCol: String, vecCol: String,
                         k: Int, nprobe: Int): DataFrame = {
    val probes = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .join(broadcast(cents))
      .withColumn("__rk", row_number().over(Window.partitionBy("query_id")
        .orderBy(Vectors.cosine(col("qv"), col("cvec")).desc, col("cid").asc)))
      .filter(col("__rk") <= nprobe)
      .select(col("query_id"), col("qv"), col("cid"))
    val scored = cells.join(broadcast(probes), Seq("cid"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
              round(Vectors.cosine(col("qv"), col("cv")), 6).as("cos_sim"))
      .dropDuplicates("query_id", "neighbor_id") // cells are disjoint, but stay safe
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("int").as("rank"),
              col("neighbor_id"), col("cos_sim"))
  }

  /** IVF top-k search. `nprobe == nlist` ⇒ exact brute force (every cell
    * scanned); smaller nprobe trades recall for a corpus/nlist·nprobe scan.
    * Output schema matches `Vectors.bruteForceTopK`. */
  def topK(corpus: DataFrame, queries: DataFrame, idCol: String,
           vecCol: String, dim: Int, k: Int, model: Model,
           nprobe: Int): DataFrame = {
    val spark = corpus.sparkSession
    val cents = model.df(spark)
    // one assignment pass over the corpus (at scale: done at write time,
    // cells = storage partitions — see [[writeCellTable]])
    val cells = assign(corpus, cents, idCol, vecCol)
      .join(corpus.select(col(idCol), col(vecCol)), Seq(idCol))
      .select(col("cid"), col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    probeCells(cells, cents, queries, idCol, vecCol, k, nprobe)
  }

  /** Deterministic SEED quantizer: centroids are the `nlist` lowest-id
    * vectors verbatim (cid = 0-based rank in id order), no Lloyd
    * iterations. Unlike [[train]], this layout is exactly reproducible by
    * plain SQL over the source table (row_number-limited seeds + one
    * argmax-cosine assignment), which is what lets the partial-probe
    * contract query (q152) carry a FULLY recomputed DuckDB oracle — the
    * probe machinery ([[topKFromTable]]) is identical either way; only
    * the cell layout differs. Driver cost: one TakeOrdered collect of
    * nlist rows. */
  def seedModel(df: DataFrame, idCol: String, vecCol: String,
                nlist: Int): Model = {
    val rows = df
      .select(col(idCol),
        org.apache.spark.sql.functions.transform(col(vecCol),
          x => x.cast("double")).as("__v"))
      .orderBy(col(idCol)).limit(nlist) // TakeOrderedAndProject
      .collect()
    Model(rows.zipWithIndex.map { case (r, i) => i -> r.getSeq[Double](1) })
  }

  /** INGEST-TIME cell layout (mirror of Dedup.writeSignatureTable): train
    * the quantizer (or use the caller's `model` — e.g. [[seedModel]]),
    * assign every row ONCE, and store `(cid, id, v)`
    * bucketed by cid — plus the centroid table as `<table>_centroids` —
    * so every later [[topKFromTable]] / semantic-dedup call reads
    * pre-partitioned cells with NO assignment pass in its query path.
    * Returns the trained model. */
  def writeCellTable(df: DataFrame, idCol: String, vecCol: String, dim: Int,
                     nlist: Int, table: String, nBuckets: Int = 32,
                     model: Option[Model] = None): Model = {
    val spark = df.sparkSession
    val model0 = model.getOrElse(train(df, idCol, vecCol, dim, nlist))
    assignCells(df, idCol, vecCol, model0)
      .join(df.select(col(idCol), col(vecCol)), Seq(idCol))
      .select(col("cid"), col(idCol).as("id"), col(vecCol).as("v"))
      // align write tasks with the bucket hash (both are Murmur3 pmod
      // nBuckets): every task holds exactly one bucket → ONE file per
      // bucket, instead of each of the shuffle partitions fanning out a
      // file per bucket it touches (≤ p×n tiny files — slow to commit on
      // a local FS, slow to read forever after). The extra exchange is
      // ingest-time work by definition.
      .repartition(nBuckets, col("cid"))
      .write.mode("overwrite").bucketBy(nBuckets, "cid").sortBy("cid")
      .saveAsTable(table)
    model0.df(spark).write.mode("overwrite").saveAsTable(table + "_centroids")
    model0
  }

  /** Idempotent form of [[writeCellTable]]: run ingest only when no valid
    * stored layout exists for this (corpus, config) — a prior session's
    * artifact is re-attached via an external bucketed table (zero Spark
    * jobs). This is the call sites' production semantics: ingest once,
    * query forever; re-invoking a query must not re-pay its ingest. */
  def ensureCellTable(
      // BY-NAME df: even CONSTRUCTING the corpus DataFrame costs a file
      // listing + footer schema job — at 100 TB a non-trivial scan of
      // object-store metadata — and a warm re-attach never touches the
      // data. Same for `model`: callers pass `Some(seedModel(...))`, whose
      // TakeOrdered collect must run only on a REBUILD (a strict argument
      // charged that job to every warm call, twice per index-task tick).
      df: => DataFrame, idCol: String, vecCol: String, dim: Int,
      nlist: Int, table: String, nBuckets: Int = 32,
      tag: String = "",
      model: => Option[Model] = None): Unit = {
    val spark = org.apache.spark.sql.SparkSession.active
    // `tag` carries any INPUT-shaping parameter beyond the quantizer
    // config (e.g. q62's planted-key offset) — a tag change is a
    // different artifact and must rebuild, not reuse
    val meta = s"ivf-cells dim=$dim nlist=$nlist nBuckets=$nBuckets $tag".trim
    graft.core.Warehouse.withTableLock(spark, table) {
      val reused =
        graft.core.Warehouse.ensureRegistered(spark, table, meta, "cid", nBuckets) &&
        graft.core.Warehouse.ensureRegistered(spark, table + "_centroids", meta,
          null, 0)
      if (!reused) {
        graft.core.Warehouse.clear(spark, table)
        graft.core.Warehouse.clear(spark, table + "_centroids")
        writeCellTable(df, idCol, vecCol, dim, nlist, table, nBuckets, model)
        graft.core.Warehouse.writeMeta(spark, table, meta)
        graft.core.Warehouse.writeMeta(spark, table + "_centroids", meta)
      }
    }
  }

  /** (cid, id, v) cells of a stored layout ([[writeCellTable]]). */
  def cellsFromTable(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** IVF top-k against a STORED cell layout: the corpus is never
    * re-assigned — its cells stream out of the bucketed table straight
    * into the probe join (the 100 TB query path; the n×nlist assignment
    * aggregate exists only at ingest). */
  def topKFromTable(spark: SparkSession, table: String, queries: DataFrame,
                    idCol: String, vecCol: String, k: Int,
                    nprobe: Int): DataFrame = {
    val cells = cellsFromTable(spark, table)
      .select(col("cid"), col("id").as("neighbor_id"), col("v").as("cv"))
    probeCells(cells, spark.table(table + "_centroids"), queries,
      idCol, vecCol, k, nprobe)
  }

  /** Public nearest-centroid assignment: (idCol, cid) for every row — the
    * ingest-time cell map. Semantic dedup (Dedup.semanticDedup) and any
    * other cluster-scoped pass reuse this instead of re-deriving their own
    * quantizer. Identical vectors always land in the same cell (argmax with
    * the max-struct tie-break is deterministic). */
  def assignCells(df: DataFrame, idCol: String, vecCol: String,
                  model: Model): DataFrame =
    assign(df, model.df(df.sparkSession), idCol, vecCol)

  /** INCREMENTAL index maintenance: route an increment to a STORED
    * layout's centroids — no retraining, no touch of the stored cells.
    * This is how a 100 TB ANN index absorbs a day's new vectors: the
    * coarse quantizer stays fixed between scheduled rebuilds, new rows
    * are assigned to their nearest existing cell (one broadcast pass over
    * the increment only) and appended to the cell storage. Returns
    * (cid, id, v) rows in the stored cell schema. */
  def incrementCells(spark: SparkSession, table: String, increment: DataFrame,
                     idCol: String, vecCol: String): DataFrame =
    assign(increment, spark.table(table + "_centroids"), idCol, vecCol)
      .join(increment.select(col(idCol), col(vecCol)), Seq(idCol))
      .select(col("cid"), col(idCol).as("id"), col(vecCol).as("v"))

  /** Top-k over a stored layout PLUS an un-persisted increment — the
    * query path between an increment's arrival and its append commit.
    * The stored cells stream out of the bucketed table; only the (small)
    * increment is assigned at query time. */
  def topKWithIncrement(spark: SparkSession, table: String,
                        increment: DataFrame, queries: DataFrame,
                        idCol: String, vecCol: String,
                        k: Int, nprobe: Int): DataFrame = {
    val cells = cellsFromTable(spark, table)
      .unionByName(incrementCells(spark, table, increment, idCol, vecCol))
      .select(col("cid"), col("id").as("neighbor_id"), col("v").as("cv"))
    probeCells(cells, spark.table(table + "_centroids"), queries,
      idCol, vecCol, k, nprobe)
  }
}
