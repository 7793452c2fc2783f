package graft.ops

import graft.core.Analyzer
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deduplication operators for large-scale training-data pipelines.
  *
  * Scale notes (the point of each design):
  *  - exact:     one hash-shuffle on the signature; first-occurrence-wins via
  *               min(id) per signature (equivalent to the reference's
  *               content_analysis.py:311-344 md5-signature dedup).
  *  - minhash:   signatures are per-row array ops (NO shuffle); LSH banding
  *               turns the quadratic pair search into an equi-join on
  *               (band, bucket) — the only shuffle — so candidate pairs are
  *               generated without comparing all N^2 rows.
  *  - simhash:   per-row 60-bit fingerprint; near-dup = hamming distance on
  *               a self-join restricted by band prefixes if needed.
  *  - ngram:     word-3-gram Jaccard via a shingle equi-join (pairs share a
  *               shingle) — never materializes non-overlapping pairs
  *               (reference A8 is a driver-side O(k^2) loop; this is the
  *               distributed form).
  *
  * All hashes are SQL-portable (see [[Hashing]]) so every operator has an
  * exact DuckDB oracle.
  */
object Dedup {

  /** Exact dedup: md5 signature of normalized text; keeps min(id) per
    * signature. Returns (id, sig, groupSize, isDup). */
  def exact(df: DataFrame, id: String, text: String): DataFrame = {
    val sig = md5(regexp_replace(lower(trim(col(text))), "\\s+", " "))
    val w = Window.partitionBy(col("sig"))
    df.withColumn("sig", sig)
      .withColumn("keep_id", min(col(id)).over(w))
      .withColumn("group_size", count(lit(1)).over(w))
      .withColumn("is_dup", (col(id) =!= col("keep_id")).cast("int"))
      .select(col(id), col("sig"), col("group_size"), col("is_dup"))
  }

  /** Distinct token array (the shingle/feature set for hashing ops). */
  private def tokenSet(text: String): Column =
    array_distinct(Analyzer.tokensCol(col(text)))

  /** MinHash signatures: numHashes per row, each min over the token set of
    * a universal hash — ONE native-expression pass over the tokens
    * (graft.functions.MinhashF: md5 once per token, all K minima together;
    * the K-fold `transform` column formulation is kept as [[minhashSignaturesHof]]
    * and differential-tested bitwise). Zero-token docs have no signature
    * (min over an empty set is undefined) and are excluded — matching the
    * SQL-oracle semantics, where such docs produce no token rows at all.
    * Returns input id + mh_0..mh_{n-1}. */
  def minhashSignatures(df: DataFrame, id: String, text: String,
      numHashes: Int = 8): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    val toks = tokenSet(text)
    val sig = ColumnBridge.column(graft.functions.MinhashF(
      ColumnBridge.expression(col("_toks")), numHashes))
    df.withColumn("_toks", toks).filter(size(col("_toks")) > 0)
      .withColumn("_sig", sig)
      .select(col(id) +:
        (0 until numHashes).map(i => element_at(col("_sig"), i + 1).as(s"mh_$i")): _*)
  }

  /** Column-expression (higher-order-function) form of
    * [[minhashSignatures]] — the differential baseline. */
  def minhashSignaturesHof(df: DataFrame, id: String, text: String,
      numHashes: Int = 8): DataFrame = {
    val toks = tokenSet(text)
    val base = df.withColumn("_toks", toks).filter(size(col("_toks")) > 0)
    val withSig = (0 until numHashes).foldLeft(base) {
      (acc, i) =>
        acc.withColumn(s"mh_$i",
          array_min(transform(col("_toks"), t => Hashing.uhash(Hashing.hp(t), i))))
    }
    withSig.select(col(id) +: (0 until numHashes).map(i => col(s"mh_$i")): _*)
  }

  /** LSH candidate pairs: band the signature (rowsPerBand hashes per band),
    * equi-join on (band, bucket). Returns (id_a, id_b, band) distinct pairs
    * with id_a < id_b. */
  def minhashLshPairs(df: DataFrame, id: String, text: String,
      numHashes: Int = 8, rowsPerBand: Int = 2): DataFrame = {
    val sigs = minhashSignatures(df, id, text, numHashes)
    val nBands = numHashes / rowsPerBand
    val banded = (0 until nBands).map { b =>
      val bucket = concat_ws("_",
        (0 until rowsPerBand).map(r => col(s"mh_${b * rowsPerBand + r}")): _*)
      sigs.select(col(id).as("doc"), lit(b).as("band"), bucket.as("bucket"))
    }.reduce(_ unionByName _)
    val a = banded.as("a")
    val b = banded.as("b")
    a.join(b, col("a.band") === col("b.band") &&
        col("a.bucket") === col("b.bucket") && col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("id_a"), col("b.doc").as("id_b"))
      .distinct()
  }

  /** SimHash: 60-bit fingerprint; bit j is the sign of the tf-weighted sum
    * of bit j of each token hash. Returns (id, simhash). */
  def simhash(df: DataFrame, id: String, text: String, bits: Int = 20): DataFrame = {
    // token frequencies per doc
    val toks = df.select(col(id), explode(Analyzer.tokensCol(col(text))).as("term"))
      .groupBy(col(id), col("term")).agg(count(lit(1)).as("w"))
      .withColumn("h", Hashing.h60(col("term")))
    // per-bit weighted sums -> sign bits -> integer fingerprint
    val bitCols = (0 until bits).map { j =>
      sum(col("w") * Hashing.bitSign(col("h"), j)).as(s"s_$j")
    }
    val sums = toks.groupBy(col(id)).agg(bitCols.head, bitCols.tail: _*)
    val fp = (0 until bits).map { j =>
      when(col(s"s_$j") > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    sums.select(col(id), fp.as("simhash"))
  }

  /** Near-dup pairs by simhash hamming distance <= maxDist.
    *
    * Scale shape: the fingerprint is split into (maxDist+1) contiguous bit
    * bands; by pigeonhole, any pair within hamming distance maxDist agrees
    * EXACTLY on at least one band, so candidates come from an equi-join on
    * (band, bandBits) — never an all-pairs cross join — and the exact
    * hamming filter keeps only true near-dups. Identical results to the
    * naive quadratic form (OpsSpec differential), shuffle-join plan. */
  def simhashPairs(fps: DataFrame, id: String, maxDist: Int,
      bits: Int = 20): DataFrame = {
    val nBands = maxDist + 1
    val banded = (0 until nBands).map { b =>
      val lo = b * bits / nBands
      val hi = (b + 1) * bits / nBands
      val mask = (1L << (hi - lo)) - 1L
      fps.select(col(id).as("doc"), col("simhash"), lit(b).as("band"),
        shiftright(col("simhash"), lo).bitwiseAND(lit(mask)).as("bandBits"))
    }.reduce(_ unionByName _)
    val a = banded.as("a")
    val b = banded.as("b")
    a.join(b, col("a.band") === col("b.band") &&
        col("a.bandBits") === col("b.bandBits") && col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("id_a"), col("b.doc").as("id_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("dist"))
      .filter(col("dist") <= maxDist)
      .distinct() // a pair may agree on several bands
  }

  /** Word n-gram shingles via window lead() (portable to SQL oracles).
    * Returns (id, shingle) distinct. */
  def shingles(df: DataFrame, id: String, text: String, n: Int = 3): DataFrame = {
    val exploded = df
      .select(col(id), posexplode(Analyzer.tokensCol(col(text))).as(Seq("pos", "term")))
    val w = Window.partitionBy(col(id)).orderBy(col("pos"))
    val withLeads = (0 until n).foldLeft(exploded) { (acc, i) =>
      acc.withColumn(s"_t$i", lead(col("term"), i).over(w))
    }
    withLeads
      .filter(col(s"_t${n - 1}").isNotNull) // materialized column, not a window expr
      .withColumn("shingle", concat_ws(" ", (0 until n).map(i => col(s"_t$i")): _*))
      .select(col(id), col("shingle")).distinct()
  }

  /** n-gram Jaccard near-dup pairs: candidates = docs sharing >=1 shingle
    * (equi-join on shingle), jaccard = |A ∩ B| / (|A| + |B| - |A ∩ B|).
    * Returns (id_a, id_b, jaccard) for jaccard >= threshold.
    *
    * `maxShingleDf` is the hot-shingle skew guard for web-scale corpora: a
    * stop-trigram shared by 10^6 docs would make the self-join group
    * quadratic. With a cap, shingles whose document frequency exceeds it
    * are dropped from the shingle space (both candidate generation AND the
    * jaccard computation — the measure becomes jaccard over sub-`cap`-df
    * shingles, which only differs for pairs whose sole overlap is
    * ubiquitous shingles, i.e. pairs far below any useful threshold). */
  def ngramJaccardPairs(df: DataFrame, id: String, text: String,
      n: Int = 3, threshold: Double = 0.6,
      maxShingleDf: Option[Int] = None): DataFrame = {
    val sh0 = shingles(df, id, text, n)
    val sh = maxShingleDf match {
      case Some(cap) =>
        // shingles are distinct per doc, so count(*) per shingle == its df
        val keep = sh0.groupBy(col("shingle")).agg(count(lit(1)).as("_df"))
          .filter(col("_df") <= cap).select(col("shingle"))
        sh0.join(keep, Seq("shingle"))
      case None => sh0
    }
    val sizes = sh.groupBy(col(id)).agg(count(lit(1)).as("sz"))
    val a = sh.select(col(id).as("id_a"), col("shingle"))
    val b = sh.select(col(id).as("id_b"), col("shingle"))
    val inter = a.join(b, Seq("shingle")).filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed(id, "id_a").withColumnRenamed("sz", "sz_a"), Seq("id_a"))
      .join(sizes.withColumnRenamed(id, "id_b").withColumnRenamed("sz", "sz_b"), Seq("id_b"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("sz_a") + col("sz_b") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }
}
