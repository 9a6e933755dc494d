package graft.functions

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Byte-pair-encoding tokenizer (Sennrich et al. 2016, arXiv:1508.07909)
  * with a real merges table — the tokenizer-aware counting behind q70's
  * packing/mixing/data-card numbers.
  *
  * Encoding is STAGED RANK-ORDERED application: each merge in rank order is
  * folded over the symbol list once, left-to-right, non-overlapping. This
  * equals classic best-pair-loop BPE whenever merge products are unambiguous
  * strings (a pair's components are products of strictly earlier merges, and
  * a merge never creates an adjacency of two pre-existing symbols), and —
  * unlike the loop — it is expressible as a FIXED pipeline of string
  * replaces, which is what lets the DuckDB oracle reproduce the count
  * independently (nested `replace` over a `|`-delimited symbol string).
  *
  * Scale shape: merges are a broadcast-sized constant (tiny vocab); encoding
  * runs in mapPartitions with per-partition word memoization — the corpus
  * vocabulary is Zipf-bounded, so each partition encodes each distinct word
  * once, and only (doc_id, count) rows come back. No shuffle anywhere.
  */
object Bpe {

  /** Per-partition memo cap: the Zipf assumption bounds a NATURAL
    * vocabulary, but a code/base64/UUID-heavy partition at 100 TB has
    * near-unbounded distinct "words" and an uncapped memo OOMs the
    * executor. Clear-on-threshold keeps the memoization win (the hot head
    * of the distribution re-fills instantly) with a hard memory bound. */
  private val MemoCap = 1 << 20
  private def memoGet[V](memo: scala.collection.mutable.Map[String, V],
                         k: String, compute: => V): V = {
    if (memo.size >= MemoCap) memo.clear()
    memo.getOrElseUpdate(k, compute)
  }


  /** Offline-trained merges table (tools/train_bpe.py over the sf0.01
    * documents corpus, 24 merges; classic highest-pair-frequency training,
    * ties to the lexicographically smallest pair). Rank = position. */
  val merges: Seq[(String, String)] = Seq(
    ("e", "r"),
    ("i", "n"),
    ("o", "w"),
    ("o", "r"),
    ("s", "t"),
    ("m", "er"),
    ("a", "t"),
    ("l", "u"),
    ("a", "r"),
    ("p", "ar"),
    ("j", "o"),
    ("jo", "in"),
    ("a", "s"),
    ("as", "h"),
    ("h", "ash"),
    ("r", "ow"),
    ("at", "c"),
    ("atc", "h"),
    ("b", "atch"),
    ("a", "n"),
    ("c", "an"),
    ("s", "can"),
    ("c", "o"),
    ("c", "u"),
  )

  /** The q70 pre-tokenizer: letter runs, single digits, single symbols —
    * identical to the regex the SQL expressions and the DuckDB oracle use. */
  private val preTok = java.util.regex.Pattern.compile(
    "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]")
  private val alpha = java.util.regex.Pattern.compile("[a-z]+")

  /** One merge folded over a symbol list: left-to-right, non-overlapping —
    * the exact semantics of a string `replace` on the `|`-delimited form. */
  private[functions] def applyMerge(syms: List[String], a: String,
                                    b: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toList
  }

  /** Encode one (lowercase) word: chars → staged merges in rank order. */
  def encode(word: String,
             table: Seq[(String, String)] = merges): List[String] =
    table.foldLeft(word.map(_.toString).toList) {
      case (s, (a, b)) => applyMerge(s, a, b)
    }

  /** Classic BPE training over word frequencies — the Scala twin of
    * tools/train_bpe.py (same deterministic tie-break), kept so a corpus
    * owner can retrain without leaving the library. */
  def train(wordFreqs: Map[String, Long], nMerges: Int): Seq[(String, String)] = {
    var vocab: Map[List[String], Long] =
      wordFreqs.map { case (w, f) => w.map(_.toString).toList -> f }
    val out = scala.collection.mutable.ListBuffer.empty[(String, String)]
    var continue = true
    while (continue && out.length < nMerges) {
      val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, f) =>
        syms.zip(syms.drop(1)).foreach { p =>
          pairs(p) = pairs.getOrElse(p, 0L) + f
        }
      }
      if (pairs.isEmpty) continue = false
      else {
        val best = pairs.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        out += best
        vocab = vocab.groupMapReduce {
          case (syms, _) => applyMerge(syms, best._1, best._2)
        } (_._2)(_ + _)
      }
    }
    out.toList
  }

  /** Distributed BPE training over a document corpus: the word-frequency
    * DICTIONARY is a Spark aggregate (map-side-combined count over the
    * alphabetic pre-tokens — the only corpus-scale pass), the merge loop
    * runs driver-local over that dictionary, exactly [[train]]. This is
    * the standard tokenizer-training shape (HF/SentencePiece train from a
    * word-frequency dict, not raw text): the dictionary is Zipf-bounded,
    * and `maxVocab` caps the driver transfer deterministically (count
    * DESC, word ASC — a frequency cutoff, standard in BPE training) so
    * 100 TB of text still ships only the top-K word rows to the driver.
    * Training is inherently iterative (each merge depends on the last) —
    * not SQL-expressible, so the contract check is BpeSpec: distributed
    * == [[train]] over locally-recomputed frequencies, fixture + corpus. */
  def trainOnCorpus(df: DataFrame, textCol: String, nMerges: Int,
                    maxVocab: Int = 1 << 16): Seq[(String, String)] = {
    import org.apache.spark.sql.functions._
    val wf = df
      .select(explode(regexp_extract_all(lower(col(textCol)),
        lit("[a-z]+"), lit(0))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w").asc)
      .limit(maxVocab)
      .collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    train(wf, nMerges)
  }

  /** (idCol, n_bpe_merged) for every document: Σ |encode(word)| over
    * lowercased alphabetic pre-tokens, +1 per non-alphabetic pre-token.
    * mapPartitions + broadcast merges + per-partition word memoization. */
  def mergedTokenCounts(df: DataFrame, idCol: String,
                        textCol: String): DataFrame = {
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(merges)
    val input = df.select(idCol, textCol)
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("n_bpe_merged", LongType, nullable = true)))
    val rdd = input.rdd.mapPartitions { rows =>
      val table = bc.value
      val memo = scala.collection.mutable.Map.empty[String, Int]
      rows.map { r =>
        val id = r.getLong(0)
        if (r.isNullAt(1)) Row(id, null) // mirror SQL: null text → null count
        else {
          val text = r.getString(1)
          var n = 0L
          val m = preTok.matcher(text)
          while (m.find()) {
            val t = m.group()
            // Locale.ROOT: the default locale's folding (e.g. Turkish
            // dotless ı) would diverge from the oracle's ASCII lower()
            val w = t.toLowerCase(java.util.Locale.ROOT)
            if (alpha.matcher(w).matches())
              n += memoGet(memo, w, encode(w, table).length)
            else n += 1
          }
          Row(id, n)
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Full encode-to-sequence per document: every pre-token in order —
    * alphabetic runs BPE-encoded (lowercased), digits/symbols passed
    * through — joined by single spaces; emitted as (idCol, n_symbols,
    * seq_md5). The md5 pins the ENTIRE ordered token sequence, so the
    * oracle checks content and order, not just counts (q70's contract is
    * the count; this is tokenization-at-scale's real output). Same scale
    * shape as [[mergedTokenCounts]]: mapPartitions, broadcast merges,
    * per-partition word memoization, no shuffle; only the 32-char digest
    * leaves the executor. */
  def encodedSequences(df: DataFrame, idCol: String,
                       textCol: String): DataFrame = {
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(merges)
    val input = df.select(idCol, textCol)
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("n_symbols", LongType, nullable = true),
      StructField("seq_md5", org.apache.spark.sql.types.StringType,
        nullable = true)))
    val rdd = input.rdd.mapPartitions { rows =>
      val table = bc.value
      val memo = scala.collection.mutable.Map.empty[String, String]
      val digest = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        val id = r.getLong(0)
        if (r.isNullAt(1)) Row(id, null, null)
        else {
          val sb = new java.lang.StringBuilder
          var n = 0L
          val m = preTok.matcher(r.getString(1))
          while (m.find()) {
            val t = m.group()
            val w = t.toLowerCase(java.util.Locale.ROOT)
            val enc =
              if (alpha.matcher(w).matches())
                memoGet(memo, w, encode(w, table).mkString(" "))
              else t
            if (sb.length > 0) sb.append(' ')
            sb.append(enc)
            n += enc.count(_ == ' ') + 1
          }
          digest.reset()
          val h = digest.digest(sb.toString
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
          Row(id, n, h.map("%02x".format(_)).mkString)
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Tokenization-integrity audit (the check HF tokenizers run as
    * `decode(encode(x)) == x`): BPE is a reversible SEGMENTATION — a
    * word's symbols concatenated must reproduce the word exactly, for
    * every word, or the merges table is corrupting text (a lossy merge,
    * a dropped character, an overlapping application). Per doc: the
    * pre-token count, how many tokens survive the roundtrip, the
    * all-clear flag, AND the md5 of the per-doc DECODED token stream
    * (each alpha token re-assembled from its actual encode() output,
    * digits/symbols passed through, space-joined). The digest is what
    * de-self-certifies the row (r8 verdict): the oracle rebuilds the
    * same stream through ITS independent nested-replace encoder and the
    * md5s must agree byte-exactly — a lossy merge, dropped character or
    * overlapping application on EITHER side breaks the match, instead of
    * both sides just asserting their own all-clear. Same scale shape as
    * [[encodedSequences]]: mapPartitions + broadcast merges,
    * per-partition memoization, no shuffle; only counts + one 32-char
    * digest leave the executor. */
  def roundtripAudit(df: DataFrame, idCol: String,
                     textCol: String): DataFrame = {
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(merges)
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("n_tokens", LongType, nullable = false),
      StructField("n_ok", LongType, nullable = false),
      StructField("lossless", org.apache.spark.sql.types.BooleanType,
        nullable = false),
      StructField("decoded_md5", org.apache.spark.sql.types.StringType,
        nullable = false)))
    val rdd = df.select(idCol, textCol).rdd.mapPartitions { rows =>
      val table = bc.value
      val memo = scala.collection.mutable.Map.empty[String, String]
      val digest = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        val id = r.getLong(0)
        var n = 0L; var ok = 0L
        val sb = new java.lang.StringBuilder
        if (!r.isNullAt(1)) {
          val m = preTok.matcher(r.getString(1))
          while (m.find()) {
            val t = m.group()
            val w = t.toLowerCase(java.util.Locale.ROOT)
            n += 1
            // the DECODE: concatenate the symbols encode() actually
            // produced — not a shortcut to w, or the audit couldn't see
            // a corrupting merge table
            val decoded =
              if (alpha.matcher(w).matches())
                memoGet(memo, w, encode(w, table).mkString(""))
              else t // digits/symbols pass through untouched
            if (decoded == w || !alpha.matcher(w).matches()) ok += 1
            if (sb.length > 0) sb.append(' ')
            sb.append(decoded)
          }
        }
        digest.reset()
        val h = digest.digest(sb.toString
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        Row(id, n, ok, n == ok, h.map("%02x".format(_)).mkString)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** The oracle-side encoding as generated SQL: the `|`-delimited symbol
    * string folded through one `replace` per merge, in rank order — the
    * independent DuckDB implementation of [[encode]] (symbols are
    * lowercase letters, so `|` can never occur inside one). `col` is the
    * word column name in scope. */
  def duckdbNestedReplace(col: String): String = {
    val init =
      s"'|' || array_to_string(regexp_extract_all($col, '.'), '||') || '|'"
    merges.foldLeft(init) { case (e, (a, b)) =>
      s"replace($e, '|$a||$b|', '|$a$b|')"
    }
  }
}
