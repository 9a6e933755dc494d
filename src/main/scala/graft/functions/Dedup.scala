package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact, MinHash+LSH,
  * SimHash, and n-gram Jaccard.
  *
  * Scale design: every stage is a narrow map or a key-partitioned shuffle.
  * MinHash-LSH turns the O(n²) all-pairs problem into |bands| shuffles keyed
  * by (band, bandHash) — at 100 TB the candidate set is bounded by bucket
  * collisions, never the cross product. Signatures (k longs) shuffle instead
  * of document bodies.
  */
object Dedup {

  /** Word w-shingles of the token array (w consecutive tokens joined). */
  def shingles(toks: Column, w: Int = 3): Column =
    when(size(toks) < w, array(concat_ws(" ", toks)))
      .otherwise(transform(
        sequence(lit(0), size(toks) - w),
        i => concat_ws(" ", slice(toks, i + 1, lit(w)))))

  /** (id, gh) rows of the DISTINCT w-gram shingle HASHES of each document —
    * pure long arithmetic behind Generate barriers: token hashes once per
    * doc, then each w-gram hash is xxhash64 over w token-hash longs. No
    * shingle STRING is ever built (the [[shingles]]+hash composition
    * constructs |toks| w-token strings per doc — measured ~10× this form
    * at sf0.1, the q23 lesson). Token hashes are injective stand-ins for
    * the joined shingle strings (\s+-split tokens cannot contain the join
    * space), so hash-set membership and counts match a string-shingle
    * oracle exactly, modulo 64-bit collisions (~|sh|²/2⁶⁵). Documents
    * shorter than w tokens yield ONE whole-doc shingle (fold), matching
    * [[shingles]]. */
  def shingleHashRows(df: DataFrame, idCol: String, textCol: String,
                      w: Int): DataFrame = {
    val th = df.select(col(idCol).as("id"),
      explode(array(transform(Text.tokens(col(textCol)), t => xxhash64(t))))
        .as("th"))
    val grams = when(size(col("th")) < w,
        array(aggregate(col("th"), lit(42L), (a, h) => xxhash64(a, h))))
      .otherwise(transform(sequence(lit(0), size(col("th")) - w),
        i => xxhash64((1 to w).map(j => element_at(col("th"), i + j)): _*)))
    th.select(col("id"), explode(array_distinct(grams)).as("gh"))
  }

  /** MinHash signature: k independent hash families h_i(s) = murmur3(s, i);
    * signature[i] = min over shingles. One pass, no shuffle. */
  def minhashSignature(shingleSet: Column, k: Int = 32): Column =
    transform(sequence(lit(0), lit(k - 1)),
      i => array_min(transform(shingleSet, s => hash(s, i))))

  /** Estimated Jaccard from two MinHash signatures: fraction of agreeing
    * components. */
  def minhashJaccard(sigA: Column, sigB: Column): Column =
    size(filter(zip_with(sigA, sigB, (a, b) => a === b), x => x)).cast("double") /
      size(sigA).cast("double")

  /** LSH banding: candidate near-duplicate pairs. Signature split into
    * `bands` bands of k/bands rows; docs sharing any band hash become
    * candidates; candidates are scored by full-signature agreement and
    * filtered by `threshold`.
    *
    * @param df        input with `idCol` (unique long) and `textCol`
    * @return (id_a, id_b, est_jaccard) with id_a < id_b, deduplicated
    */
  /** (id, sig) MinHash signatures for every row, via the fused native
    * ShingleMinHash expression: tokenization aside, the whole
    * shingle → k-family-minima computation is one codegen loop with NO
    * intermediate shingle strings and ZERO shuffle. (The round-1
    * explode → k×min-aggregate form paid per-shingle string construction
    * plus a |docs|×|shingles|-row shuffle used purely as an optimizer
    * barrier.)
    *
    * The `explode(array(...))` wrapper is the one-evaluation barrier: a
    * Generate's output is a concrete attribute, so CollapseProject cannot
    * inline the signature expression into its downstream references (band
    * slicing + signature carry) — the staged-projection trap from round 1. */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
                        k: Int = 32, w: Int = 3): DataFrame =
    df.select(col(idCol).as("id"),
      explode(array(graft.expressions.TextExpressions.shingle_minhash(
        Text.tokens(col(textCol)), w, k))).as("sig"))

  /** Loud config guard shared by every band-join entry point: bands > k
    * makes r = 0, so every row hashes an EMPTY signature slice into ONE
    * global bucket and the search silently collapses to the cap's lowest
    * ids; a non-dividing k silently drops the trailing signature
    * components from every band. Both are corpus-wide-wrong-results
    * states, never valid configs. */
  private def requireBanding(k: Int, bands: Int): Unit =
    require(bands >= 1 && bands <= k && k % bands == 0,
      s"invalid MinHash banding: k=$k must be a positive multiple of bands=$bands")

  /** Banded form of an (id, sig) signature frame: one row per (band,
    * bandHash), bucket-CAPPED at `bucketCap` rows per (band, bh)
    * (deterministic: lowest ids survive), mirroring Vectors.bucketRows: a
    * duplicate-heavy corpus — the NORMAL input to a dedup pass — collides
    * in every band, and an uncapped bucket's pair count is quadratic in
    * the duplicate family's size. The cap bounds the worst bucket at
    * cap²/2 pairs; recall on capped buckets is best-effort by design
    * (exact-dup by fingerprint belongs before MinHash in a composed
    * pipeline and removes the mass). */
  private def bandedSignatures(sig: DataFrame, bands: Int, r: Int,
                               bucketCap: Int): DataFrame = {
    val w = Window.partitionBy("band", "bh").orderBy(col("id").asc)
    sig.select(col("id"), col("sig"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => hash(slice(col("sig"), b * r + 1, lit(r))))).as(Seq("band", "bh")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= bucketCap).drop("rn")
  }

  def minhashCandidates(df: DataFrame, idCol: String, textCol: String,
                        k: Int = 32, bands: Int = 8,
                        threshold: Double = 0.5,
                        bucketCap: Int = 256): DataFrame = {
    requireBanding(k, bands)
    val r = k / bands
    val sig = minhashSignatures(df, idCol, textCol, k)
    // Materialize the banded signatures before the self-join: a self-join
    // plans BOTH sides as the full upstream subtree, re-tokenizing and
    // re-hashing every document twice. The checkpoint is SCOPED — the
    // (small) filtered pair result is eagerly materialized inside the scope
    // and the banded blocks are released on exit, so a long-lived session
    // holds nothing but the result until the owner's Mat.releaseAll (at
    // warehouse scale this is "write signatures to a table at ingest").
    graft.core.Mat.withMaterialized(
      bandedSignatures(sig, bands, r, bucketCap)
    ) { banded =>
      val pairs = banded.as("l").join(banded.as("r"),
          col("l.band") === col("r.band") && col("l.bh") === col("r.bh") &&
          col("l.id") < col("r.id"))
        .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
                col("l.sig").as("sig_a"), col("r.sig").as("sig_b"))
        .dropDuplicates("id_a", "id_b")
      graft.core.Mat.tracked(
        pairs.select(col("id_a"), col("id_b"),
            round(minhashJaccard(col("sig_a"), col("sig_b")), 4).as("est_jaccard"))
          .filter(col("est_jaccard") >= threshold))
    }
  }

  /** Incremental near-dup: MinHash-LSH candidate pairs BETWEEN an
    * increment and an existing corpus — the production dedup shape at
    * 100 TB: a daily increment is deduped against the standing corpus,
    * never the whole corpus against itself. Both sides band with the same
    * hash families, join on (band, bandHash), and score by
    * full-signature agreement; only (inc_id, corpus_id) pairs whose
    * estimated Jaccard clears `threshold` survive.
    *
    * Scale shape: the corpus side of this join is a SIGNATURE TABLE
    * written once at ingest (bucketed by (band, bandHash), so the
    * increment's banded rows shuffle against co-located corpus buckets);
    * re-banding it per call here stands in for reading that table. Both
    * sides bucket-cap. Returns (inc_id, corpus_id, est_jaccard). */
  /** Band-join an increment's banded signatures against a corpus's and
    * score survivors by full-signature agreement. */
  private def scoreBandPairs(ib: DataFrame, cb: DataFrame,
                             threshold: Double): DataFrame =
    ib.as("l").join(cb.as("r"),
        col("l.band") === col("r.band") && col("l.bh") === col("r.bh"))
      .select(col("l.id").as("inc_id"), col("r.id").as("corpus_id"),
              col("l.sig").as("sig_a"), col("r.sig").as("sig_b"))
      .dropDuplicates("inc_id", "corpus_id")
      .select(col("inc_id"), col("corpus_id"),
          round(minhashJaccard(col("sig_a"), col("sig_b")), 4).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)

  def minhashCandidatesAgainst(corpus: DataFrame, increment: DataFrame,
                               idCol: String, textCol: String,
                               k: Int = 32, bands: Int = 8,
                               threshold: Double = 0.5,
                               bucketCap: Int = 256): DataFrame = {
    requireBanding(k, bands)
    val r = k / bands
    graft.core.Mat.withMaterialized(
      bandedSignatures(minhashSignatures(corpus, idCol, textCol, k),
        bands, r, bucketCap)
    ) { cb =>
      graft.core.Mat.withMaterialized(
        bandedSignatures(minhashSignatures(increment, idCol, textCol, k),
          bands, r, bucketCap)
      ) { ib =>
        graft.core.Mat.tracked(scoreBandPairs(ib, cb, threshold))
      }
    }
  }

  /** Write the banded signature TABLE for a corpus — the ingest-time
    * artifact every later incremental dedup joins against, bucketed (and
    * bucket-sorted) by the band hash so the corpus side of the band join
    * is read PRE-PARTITIONED: no exchange ever touches the corpus
    * signatures again. HashPartitioning(bh) satisfies the join's
    * ClusteredDistribution((band, bh)) — equal bh implies co-located —
    * so only the (small) increment shuffles to align. */
  def writeSignatureTable(df: DataFrame, idCol: String, textCol: String,
                          table: String, k: Int = 32, bands: Int = 8,
                          bucketCap: Int = 256, nBuckets: Int = 32): Unit = {
    requireBanding(k, bands)
    bandedSignatures(minhashSignatures(df, idCol, textCol, k),
        bands, k / bands, bucketCap)
      // one file per bucket (write tasks aligned with the bucket hash) —
      // see Ivf.writeCellTable; unaligned, this table committed 256 tiny
      // files and every later read paid for them
      .repartition(nBuckets, col("bh"))
      .write.mode("overwrite").bucketBy(nBuckets, "bh").sortBy("bh")
      .saveAsTable(table)
  }

  /** Idempotent form of [[writeSignatureTable]] (mirror of
    * Ivf.ensureCellTable): ingest only when no valid stored artifact for
    * this (corpus, config) exists; otherwise re-attach — possibly across
    * JVM sessions — with zero Spark jobs. */
  def ensureSignatureTable(
      // by-name df: a warm re-attach must not pay the corpus DataFrame's
      // construction (file listing + schema job) — see Ivf.ensureCellTable
      df: => DataFrame, idCol: String, textCol: String,
      table: String, k: Int = 32, bands: Int = 8,
      bucketCap: Int = 256, nBuckets: Int = 32,
      tag: String = ""): Unit = {
    val spark = org.apache.spark.sql.SparkSession.active
    // `tag` carries input identity beyond the config (e.g. the source
    // stamp) — a tag change is a different artifact and must rebuild
    val meta = (s"minhash-sig k=$k bands=$bands bucketCap=$bucketCap " +
      s"nBuckets=$nBuckets $tag").trim
    graft.core.Warehouse.withTableLock(spark, table) {
      if (!graft.core.Warehouse.ensureRegistered(spark, table, meta, "bh", nBuckets)) {
        writeSignatureTable(df, idCol, textCol, table, k, bands, bucketCap, nBuckets)
        graft.core.Warehouse.writeMeta(spark, table, meta)
      }
    }
  }

  /** Incremental candidates against a STORED signature table
    * ([[writeSignatureTable]]): the production shape at 100 TB — the
    * corpus is never re-tokenized, re-hashed, or re-shuffled; its banded
    * rows stream out of the bucketed table straight into the join. */
  def minhashCandidatesAgainstTable(spark: org.apache.spark.sql.SparkSession,
                                    table: String, increment: DataFrame,
                                    idCol: String, textCol: String,
                                    k: Int = 32, bands: Int = 8,
                                    threshold: Double = 0.5,
                                    bucketCap: Int = 256): DataFrame = {
    requireBanding(k, bands)
    // config-drift guard: a stored table written with different k/bands
    // would band-join over different signature slices and score nulls —
    // silently meaningless candidates. A limit-1 scan checks k; the band
    // check is an agg over one bucketed int column (parquet column
    // pruning keeps it cheap relative to the join it protects).
    val cb = spark.table(table)
    // drift-guard values derive purely from table content → memoized by
    // the table's content stamp (r17 opt: each probe call paid these two
    // guard jobs before its actual band join)
    val (storedK, storedBands) =
      graft.core.Warehouse.cachedByStamp(spark, "sigcfg", Seq(table)) {
        val kOpt = cb.select(size(col("sig")).as("k")).limit(1).collect()
          .headOption.map(_.getInt(0))
        val bRow = cb.agg(max("band")).head()
        (kOpt, if (bRow.isNullAt(0)) None else Some(bRow.getInt(0)))
      }
    storedK.foreach { sk =>
      require(sk == k,
        s"signature table '$table' stores k=$sk, caller expects k=$k")
    }
    storedBands.foreach { sb =>
      require(sb == bands - 1,
        s"signature table '$table' stores ${sb + 1} bands, " +
        s"caller expects $bands")
    }
    graft.core.Mat.withMaterialized(
      bandedSignatures(minhashSignatures(increment, idCol, textCol, k),
        bands, k / bands, bucketCap)
    ) { ib =>
      graft.core.Mat.tracked(scoreBandPairs(ib, cb, threshold))
    }
  }

  /** SELF near-dup candidates from a STORED signature table
    * ([[writeSignatureTable]]): the whole-corpus twin of
    * [[minhashCandidatesAgainstTable]] (r17 opt). The stored banded rows
    * ARE [[bandedSignatures]]'s output (same cap, same hash families), so
    * the self band join emits exactly [[minhashCandidates]]'s pair set —
    * but the corpus is never re-tokenized or re-hashed at query time, and
    * both join sides stream PRE-PARTITIONED out of the bh-bucketed table
    * (HashPartitioning(bh) satisfies the join's (band, bh) clustering on
    * both sides: zero exchanges feed the join). Returns
    * (id_a, id_b, est_jaccard) with id_a < id_b, deduplicated. */
  def minhashSelfCandidatesFromTable(spark: org.apache.spark.sql.SparkSession,
                                     table: String, k: Int, bands: Int,
                                     threshold: Double): DataFrame = {
    requireBanding(k, bands)
    val cb = spark.table(table)
    // same stamp-memoized drift guard as the incremental probe
    val (storedK, storedBands) =
      graft.core.Warehouse.cachedByStamp(spark, "sigcfg", Seq(table)) {
        val kOpt = cb.select(size(col("sig")).as("k")).limit(1).collect()
          .headOption.map(_.getInt(0))
        val bRow = cb.agg(max("band")).head()
        (kOpt, if (bRow.isNullAt(0)) None else Some(bRow.getInt(0)))
      }
    storedK.foreach { sk =>
      require(sk == k,
        s"signature table '$table' stores k=$sk, caller expects k=$k")
    }
    storedBands.foreach { sb =>
      require(sb == bands - 1,
        s"signature table '$table' stores ${sb + 1} bands, " +
        s"caller expects $bands")
    }
    cb.as("l").join(cb.as("r"),
        col("l.band") === col("r.band") && col("l.bh") === col("r.bh") &&
        col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
              col("l.sig").as("sig_a"), col("r.sig").as("sig_b"))
      .dropDuplicates("id_a", "id_b")
      .select(col("id_a"), col("id_b"),
          round(minhashJaccard(col("sig_a"), col("sig_b")), 4).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
  }

  /** Band-join candidates between TWO stored signature tables
    * ([[writeSignatureTable]] layout on both sides — r18 opt, q169's
    * serve): the increment side's banded rows were themselves persisted at
    * fold time, so NEITHER side tokenizes, hashes, or shuffles at query
    * time — both stream pre-partitioned out of their bh-bucketed tables
    * straight into the join. Emits (inc_id, corpus_id, est_jaccard),
    * identical to [[minhashCandidatesAgainstTable]] over the same rows. */
  def minhashCandidatesTableVsTable(spark: org.apache.spark.sql.SparkSession,
                                    incTable: String, corpusTable: String,
                                    k: Int, bands: Int,
                                    threshold: Double): DataFrame = {
    requireBanding(k, bands)
    def guarded(table: String): DataFrame = {
      val t = spark.table(table)
      val (storedK, storedBands) =
        graft.core.Warehouse.cachedByStamp(spark, "sigcfg", Seq(table)) {
          val kOpt = t.select(size(col("sig")).as("k")).limit(1).collect()
            .headOption.map(_.getInt(0))
          val bRow = t.agg(max("band")).head()
          (kOpt, if (bRow.isNullAt(0)) None else Some(bRow.getInt(0)))
        }
      storedK.foreach { sk =>
        require(sk == k,
          s"signature table '$table' stores k=$sk, caller expects k=$k")
      }
      storedBands.foreach { sb =>
        require(sb == bands - 1,
          s"signature table '$table' stores ${sb + 1} bands, " +
          s"caller expects $bands")
      }
      t
    }
    scoreBandPairs(guarded(incTable), guarded(corpusTable), threshold)
  }

  /** 64-bit SimHash over token hashes: per-bit majority vote of xxhash64
    * of each token. Returns one long per document; near-duplicates are
    * documents within small Hamming distance. Fused codegen expression —
    * ONE traversal of the token array with all 64 counters in registers
    * (the composed form below re-traversed per bit: 64 aggregate() lambdas,
    * ×4 evaluations in the invariance probe = 256 walks per row). */
  def simhash(toks: Column): Column =
    graft.expressions.TextExpressions.simhash64(toks)

  /** Ensure the GROWABLE banded-signature table for a self-growing
    * admission loop exists and is session-registered
    * ([[graft.core.Warehouse.ensureGrowableTable]] semantics: mutable
    * state, fail-loud on config drift, DDL re-attach for the empty case).
    * [[appendSignatureRows]] appends each tick's admitted signatures. */
  def ensureGrowableSignatureTable(spark: org.apache.spark.sql.SparkSession,
                                   table: String, k: Int = 32, bands: Int = 8,
                                   nBuckets: Int = 32): Unit = {
    requireBanding(k, bands)
    import org.apache.spark.sql.types._
    graft.core.Warehouse.ensureGrowableTable(spark, table,
      s"minhash-grow k=$k bands=$bands nBuckets=$nBuckets",
      StructType(Seq(
        StructField("id", LongType), StructField("sig",
          ArrayType(IntegerType, containsNull = false)),
        StructField("band", IntegerType), StructField("bh", IntegerType))),
      "bh", nBuckets)
  }

  /** Append `df`'s banded signature rows to a growable signature table
    * ([[ensureGrowableSignatureTable]]), PRESERVING the bucket spec so the
    * standing table stays pre-partitioned for the band join. Idempotent
    * under at-least-once replay: rows whose id already exists in the
    * table are anti-joined away before the append, so a foreachBatch
    * retry after a crash-between-append-and-offset-commit cannot
    * double-insert a batch's signatures.
    *
    * Bucket-cap note: the per-append `bucketCap` bounds THIS batch's
    * contribution per (band, bh); the standing table's buckets grow
    * across appends — bounded in practice because only verified
    * NON-duplicates are ever appended, so the collision mass is the
    * corpus's natural banding-collision rate, not duplicate families. */
  def appendSignatureRows(spark: org.apache.spark.sql.SparkSession,
                          df: DataFrame, idCol: String, textCol: String,
                          table: String, k: Int = 32, bands: Int = 8,
                          bucketCap: Int = 256, nBuckets: Int = 32): Unit = {
    requireBanding(k, bands)
    graft.core.Warehouse.withTableLock(spark, table) {
      // readGrowableTable: prior appends may have come from another
      // session over the same catalog (a stream's cloned session) — the
      // replay anti-join must see every row already written
      val existing = graft.core.Warehouse.readGrowableTable(spark, table)
        .select(col("id")).distinct()
      bandedSignatures(minhashSignatures(df.select(
            col(idCol).as("doc_id"), col(textCol).as("text")),
          "doc_id", "text", k), bands, k / bands, bucketCap)
        .join(existing, Seq("id"), "left_anti")
        .repartition(nBuckets, col("bh"))
        .write.mode("append").format("parquet")
        .bucketBy(nBuckets, "bh").sortBy("bh").saveAsTable(table)
    }
  }

  /** Reference composition of [[simhash]] from Spark built-ins — kept as
    * the independent implementation the fused expression is asserted
    * bit-identical against (FunctionsSpec). */
  def simhashComposed(toks: Column): Column = {
    val hashes = transform(toks, t => xxhash64(t))
    val bits = (0 until 64).map { i =>
      val vote = aggregate(hashes, lit(0L),
        (acc, h) => acc + when(shiftright(h, i).bitwiseAND(1) === 1, 1L).otherwise(-1L))
      when(vote > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }
    bits.reduce(_.bitwiseOR(_))
  }

  /** Hamming distance between two 64-bit SimHashes. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash candidate near-dup pairs via 16-bit banding: the 64-bit
    * fingerprint splits into 4 bands; a pair within Hamming distance
    * `maxHamming` ≤ 3 differs in ≤ 3 bits, so by pigeonhole at least ONE
    * band matches EXACTLY — banding on band equality has GUARANTEED recall
    * for the distance bound (unlike MinHash banding's probabilistic
    * recall), then the fused `hamming` filter rejects the band-collision
    * false positives.
    *
    * Scale shape: one codegen pass computes the fingerprint; 4 rows per
    * doc shuffle (8-byte band key + 8-byte hash); buckets cap like every
    * LSH path here (identical docs collide in all 4 bands).
    *
    * VALIDITY BOUND of the recall guarantee: 2^16 band keys × the
    * `bucketCap` (256 default) id-ordered retention cap ≈ 16.8M rows per
    * band before AVERAGE buckets start truncating — past that, high-id
    * docs fall out of over-full buckets and the pigeonhole guarantee
    * quietly stops holding for them (recall degrades to best-effort, the
    * same posture every capped LSH path here takes on SKEWED buckets).
    * For corpora beyond ~10^7 rows, shard the banding by a corpus
    * partition key (the guarantee is per-shard) or raise `bucketCap`
    * with the executor-memory budget; widening the band keys themselves
    * would change the fingerprint layout this operator's stored-artifact
    * consumers pin. */
  def simhashCandidates(df: DataFrame, idCol: String, textCol: String,
                        maxHamming: Int = 3,
                        bucketCap: Int = 256): DataFrame =
    simhashCandidatesFromHashes(
      df.select(col(idCol).as("id"),
        simhash(Text.tokens(col(textCol))).as("sh")),
      maxHamming, bucketCap)

  /** [[simhashCandidates]] over a precomputed (id, sh) fingerprint frame —
    * for callers that ALSO need the per-doc fingerprints (q66 joins them
    * back onto verified pairs): one simhash pass feeds both consumers
    * instead of this function re-tokenizing and re-hashing the corpus
    * internally (r18 opt — the banding, caps, and emitted pair set are
    * exactly [[simhashCandidates]]'s). */
  def simhashCandidatesFromHashes(fp: DataFrame, maxHamming: Int = 3,
                                  bucketCap: Int = 256): DataFrame = {
    require(maxHamming <= 3, "4x16-bit banding only guarantees recall to Hamming 3")
    val w = Window.partitionBy("band", "bh").orderBy(col("id").asc)
    graft.core.Mat.withMaterialized(
      fp.select(col("id"), col("sh"),
          posexplode(array((0 until 4).map(b =>
            shiftright(col("sh"), b * 16).bitwiseAND(0xFFFFL)): _*))
            .as(Seq("band", "bh")))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= bucketCap).drop("rn")
    ) { banded =>
      graft.core.Mat.tracked(
        banded.as("l").join(banded.as("r"),
            col("l.band") === col("r.band") && col("l.bh") === col("r.bh") &&
            col("l.id") < col("r.id"))
          .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
                  hamming(col("l.sh"), col("r.sh")).as("hamming_dist"))
          .dropDuplicates("id_a", "id_b")
          .filter(col("hamming_dist") <= maxHamming))
    }
  }

  /** Exact n-gram Jaccard similarity between two texts (distinct word
    * w-shingle sets). */
  def ngramJaccard(textA: Column, textB: Column, w: Int = 3): Column = {
    val sa = array_distinct(shingles(Text.tokens(textA), w))
    val sb = array_distinct(shingles(Text.tokens(textB), w))
    val inter = size(array_intersect(sa, sb)).cast("double")
    inter / (size(sa) + size(sb) - inter).cast("double")
  }

  /** Embedding-cosine near-duplicate pairs: LSH-bucketed candidate
    * generation (collide in ≥1 hyperplane table) refined by exact fused
    * cosine ≥ threshold. The bucket join bounds candidates far below the
    * cross product; at 100 TB the signatures are precomputed at write time. */
  def embeddingNearDups(df: DataFrame, idCol: String, vecCol: String,
                        dim: Int, threshold: Double,
                        bitsPerTable: Int = 0, nTables: Int = 6): DataFrame =
    // threshold pushed INTO the bucket self-join (minCos): the collision
    // mass is scored and filtered in the join projection, so only true
    // near-dups ever reach a pair-level shuffle
    Vectors.lshSelfPairs(df, idCol, vecCol, dim, bitsPerTable, nTables,
        minCos = threshold)
      .select(col("query_id").as("id_a"), col("neighbor_id").as("id_b"),
              col("cos_sim"))

  /** Exact duplicate groups by content fingerprint: one canonical (min id)
    * survivor per normalized text. GroupBy on the 16-byte digest — the only
    * shuffled payload is (fingerprint, id). */
  def exactDuplicates(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(Text.fingerprint(col(textCol)).as("fp"), col(idCol).as("id"))
      .groupBy("fp")
      .agg(min("id").as("keep_id"), count(lit(1)).as("n_copies"))

  /** Semantic (embedding-space) dedup, SemDeDup-shaped (Abbas et al. 2023,
    * arXiv:2303.09540): a k-means coarse quantizer partitions the corpus
    * into `nlist` cells; only WITHIN a cell are pairs scored, and a row is
    * dropped when any lower-id cell-mate sits at cosine ≥ `threshold`.
    * Returns every row with its cell and the keep/drop verdict.
    *
    * Scale shape: the all-pairs problem is reduced to Σ|cell|² with
    * |cell| ≈ n/nlist (nlist tracks n at ingest — cells are the stored
    * partition key, the same [[Ivf]] layout the ANN path uses), and
    * `clusterCap` bounds a degenerate cell the same way the LSH bucket caps
    * do: deterministic lowest-id survivors, everything past the cap is kept
    * un-scored rather than scanned quadratically. Identical vectors always
    * co-locate (deterministic argmax assignment), so exact embedding
    * duplicates are always caught. Only (id, cid) pairs and the in-cell
    * vectors shuffle; the pair scoring is the fused codegen cosine. */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String, dim: Int,
                    nlist: Int, threshold: Double,
                    clusterCap: Int = 4096): DataFrame = {
    val model = Ivf.train(df, idCol, vecCol, dim, nlist)
    // ONE assignment pass, materialized and scoped: the capped self-join
    // sides AND the final verdict join all read the checkpointed frame —
    // referencing the raw assignment twice would re-run the n×nlist
    // broadcast-cosine argmax (the most expensive narrow op here) per use
    graft.core.Mat.withMaterialized(
      Ivf.assignCells(df, idCol, vecCol, model)
        .join(df.select(col(idCol), col(vecCol)), Seq(idCol))
        .select(col(idCol).as("id"), col("cid"), col(vecCol).as("v"))
    ) { cells =>
      graft.core.Mat.tracked(
        semanticDedupCore(cells, threshold, clusterCap)
          .withColumnRenamed("id", idCol))
    }
  }

  /** The in-cell scoring core over an (id, cid, v) cell frame: capped
    * self-join within each cell, drop any row with a lower-id cell-mate at
    * cosine ≥ threshold. Shared by [[semanticDedup]] (on-the-fly cells)
    * and [[semanticDedupFromCells]] (stored layout). */
  private def semanticDedupCore(cells: DataFrame, threshold: Double,
                                clusterCap: Int): DataFrame = {
    val w = Window.partitionBy("cid").orderBy(col("id").asc)
    val c = cells.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= clusterCap).drop("rn")
    val dominated = c.as("l").join(c.as("r"),
        col("l.cid") === col("r.cid") && col("l.id") < col("r.id"))
      .filter(Vectors.cosine(col("l.v"), col("r.v")) >= threshold)
      .select(col("r.id").as("id")).distinct()
      .withColumn("dom", lit(true))
    cells.select(col("id"), col("cid"))
      .join(dominated, Seq("id"), "left")
      .select(col("id"), col("cid"),
              (!coalesce(col("dom"), lit(false))).as("keep"))
  }

  /** Semantic dedup against a STORED cell layout ([[Ivf.writeCellTable]]):
    * the production loop — cells were assigned ONCE at ingest and live
    * bucketed by cid, so the in-cell self-join reads both sides
    * pre-partitioned (no exchange on cid) and no assignment aggregate
    * appears anywhere in the query path. */
  def semanticDedupFromCells(spark: org.apache.spark.sql.SparkSession,
                             table: String, idCol: String,
                             threshold: Double,
                             clusterCap: Int = 4096): DataFrame =
    semanticDedupCore(Ivf.cellsFromTable(spark, table), threshold, clusterCap)
      .withColumnRenamed("id", idCol)
}
