package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Corpus-TRAINED distributional embeddings: vocab-restricted PPMI
  * co-occurrence statistics projected to `dims` dimensions with a
  * deterministic hash-sign matrix.
  *
  * Why this counts as "learned": the vectors are a pure function of the
  * CORPUS (co-occurrence counts within a skip-gram window), not of the
  * token string alone -- Levy & Goldberg (NeurIPS 2014) showed word2vec
  * skip-gram-negative-sampling implicitly factorizes exactly this
  * shifted-PPMI matrix, and sign-random-projection of the PPMI rows is
  * the classic "random indexing" approximation of that factorization.
  * It replaces the former `withMediaFeatures`-style hash-only stub with
  * a model whose output moves when the data moves.
  *
  * Determinism across engines and partitionings (the gate contract):
  *  - co-occurrence counts, marginals, and totals are exact integers;
  *  - PPMI is floored to integer micros per (t,c) CELL (one double
  *    ratio + one ln, the same `ln -> floor-micro` protocol as the
  *    Naive-Bayes gate), BEFORE any cross-row sum;
  *  - the projection sums `ppmi_micro * (+/-1)` -- integer arithmetic,
  *    so reduction order cannot change a single bit.
  *
  * Scale shape: pair generation is a pure codegen'd column pipeline
  * (flatten/transform over the token array -- ~2*window rows per token,
  * no join); the only shuffles are the vocab count, the (t,c) count
  * (map-side combined), and the final (token,dim) integer sum whose
  * cardinality is bounded by vocabSize * dims. Vocab and marginals are
  * broadcast. At 100 TB the pair stream is the corpus scanned once.
  */
object LearnedEmbeddings {

  /** Skip-gram (center, context) pairs within a symmetric window:
    * for token position i, every j != i with |i-j| <= window emits
    * (toks[i], toks[j]). Pure narrow projection + explode.
    */
  // memoized (the UDF-identity plan-cache rule): one compiled pass
  // emits the pair multiset the interpreted nested-HOF expression
  // built per document — same (i, j) enumeration, same pairs
  private val skipGramUdfCache =
    new java.util.concurrent.ConcurrentHashMap[Int,
      org.apache.spark.sql.expressions.UserDefinedFunction]()

  private def skipGramUdf(window: Int)
      : org.apache.spark.sql.expressions.UserDefinedFunction =
    skipGramUdfCache.computeIfAbsent(window, { w =>
      udf((s: String) => {
        val toks =
          if (s == null) Array.empty[String]
          else TextAnalysis.alnumTokens(s)
        val out =
          scala.collection.mutable.ArrayBuffer.empty[(String, String)]
        var i = 0
        while (i < toks.length) {
          var j = math.max(0, i - w)
          val hi = math.min(toks.length - 1, i + w)
          while (j <= hi) {
            if (j != i) out += ((toks(i), toks(j)))
            j += 1
          }
          i += 1
        }
        out.toSeq
      })
    })

  def skipGramPairs(df: DataFrame, textCol: String,
      window: Int): DataFrame = {
    require(window > 0, "window must be positive")
    df.select(explode(skipGramUdf(window)(col(textCol))).as("p"))
      .select(col("p._1").as("t"), col("p._2").as("c"))
  }

  /** Top-`vocabSize` tokens by corpus count (ties break on the token,
    * so the cut is a total order and engines agree at the boundary).
    */
  def topVocab(df: DataFrame, textCol: String,
      vocabSize: Int): DataFrame = {
    require(vocabSize > 0, "vocabSize must be positive")
    df.select(explode(TextAnalysis.tokensUdf(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), col("token")).limit(vocabSize)
      .select("token")
  }

  /** Positive-PMI cells over the vocab-restricted skip-gram pair
    * distribution: (t, c, cnt, ppmi_micro) with ppmi_micro =
    * floor(ln(cnt*T / (m_t*m_c)) * 1e6) > 0 (non-positive cells are
    * dropped -- standard PPMI sparsification, and it keeps the matrix
    * O(observed pairs), never vocab^2).
    *
    * Marginals are computed AFTER the vocab restriction, i.e. PPMI of
    * the conditional pair distribution the model actually sees.
    */
  def ppmiCells(df: DataFrame, textCol: String, vocabSize: Int,
      window: Int): DataFrame = {
    val vocab = broadcast(topVocab(df, textCol, vocabSize))
    val vp = skipGramPairs(df, textCol, window)
      .join(vocab.select(col("token").as("t")), "t")
      .join(vocab.select(col("token").as("c")), "c")
    val cooc = vp.groupBy("t", "c").agg(count(lit(1)).as("cnt"))
    val marg = cooc.groupBy("t").agg(sum("cnt").cast("long").as("m"))
    val tot = cooc.agg(sum("cnt").cast("long").as("tt"))
    cooc
      .join(broadcast(marg.select(col("t"), col("m").as("mt"))), "t")
      .join(broadcast(marg.select(col("t").as("c"), col("m").as("mc"))),
        "c")
      .crossJoin(broadcast(tot))
      .withColumn("ppmi_micro",
        floor(log((col("cnt").cast("double") * col("tt")) /
          (col("mt").cast("double") * col("mc"))) * 1000000.0)
          .cast("long"))
      .where(col("ppmi_micro") > 0)
      .select("t", "c", "cnt", "ppmi_micro")
  }

  /** Sign of the (context, dim) projection cell: +1 when
    * md5(seed:c:dim)'s leading 8 hex digits are even, else -1.
    * (private[graft]: LearnedEmbeddingsSpec reproduces the join-based
    * model construction with it to pin the prefiltered fast path.)
    */
  private[graft] def projSign(c: Column, dim: Column, seed: String): Column =
    when(hex8(concat(lit(seed + ":"), c, lit(":"), dim.cast("string")))
      % 2 === 0, lit(1L)).otherwise(lit(-1L))

  /** Trained term embeddings: e(token, dim) = sum over context c of
    * ppmi_micro(token, c) * sign(c, dim). Rows (token, dim, e_micro);
    * exact integers, so any reduction order and any partitioning
    * produce the identical table.
    *
    * This is the SCALE path, so unlike the lazy [[ppmiCells]] it
    * materializes: without persisting, Catalyst re-executes the full
    * pair-generation subtree once per join branch (cooc three more
    * times for marginals/total) — extra corpus passes at 100 TB. The
    * vocab (<= vocabSize rows by construction) collects to the driver
    * and prefilters the pair stream map-side; cooc (observed-cell
    * rows) persists + materializes; train runs exactly TWO corpus
    * scans (vocab count, filtered pair stream); and the returned model
    * (<= vocabSize * dims rows) is a collected local relation — a true
    * lineage-truncated leaf with no persist to leak.
    */
  def termEmbeddings(df: DataFrame, textCol: String, vocabSize: Int,
      window: Int, dims: Int, seed: String = "emb"): DataFrame = {
    require(dims > 0, "dims must be positive")
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val spark = df.sparkSession
    // vocab is <= vocabSize rows BY CONSTRUCTION (a top-k limit), so it
    // collects to the driver like the model does in [[docEmbeddings]],
    // and the pair stream is prefiltered MAP-SIDE against the broadcast
    // set (r21, guide §2.3 "shuffle fewer bytes"): the former shape
    // exploded ~2*window rows PER TOKEN and dropped the non-vocab
    // majority in two broadcast hash joins AFTER materializing them —
    // the filtered UDF emits only in-vocab pairs, so the rows that
    // reach the (t,c) aggregate shrink by the out-of-vocab ratio and
    // the joins (plus the vocab persist/count and the two broadcast
    // builds of it) disappear from the plan. Pair enumeration is
    // UNCHANGED: window offsets index the FULL token sequence exactly
    // as before — membership filtering happens after enumeration, which
    // is precisely what the inner joins computed (vocab is distinct).
    val vocabSet = topVocab(df, textCol, vocabSize)
      .collect().map(_.getString(0)).toSet
    val bcVocab = spark.sparkContext.broadcast(vocabSet)
    val vocabPairUdf = udf((s: String) => {
      val v = bcVocab.value
      val toks = if (s == null) Array.empty[String]
        else TextAnalysis.alnumTokens(s)
      val out =
        scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      var i = 0
      while (i < toks.length) {
        if (v.contains(toks(i))) {
          var j = math.max(0, i - window)
          val hi = math.min(toks.length - 1, i + window)
          while (j <= hi) {
            if (j != i && v.contains(toks(j))) out += ((toks(i), toks(j)))
            j += 1
          }
        }
        i += 1
      }
      out.toSeq
    })
    val cooc = df.select(explode(vocabPairUdf(col(textCol))).as("p"))
      .select(col("p._1").as("t"), col("p._2").as("c"))
      .groupBy("t", "c").agg(count(lit(1)).as("cnt"))
      .persist(MEMORY_AND_DISK)
    cooc.count()
    val marg = cooc.groupBy("t").agg(sum("cnt").cast("long").as("m"))
    val tot = cooc.agg(sum("cnt").cast("long").as("tt"))
    val modelLazy = cooc
      .join(broadcast(marg.select(col("t"), col("m").as("mt"))), "t")
      .join(broadcast(marg.select(col("t").as("c"), col("m").as("mc"))),
        "c")
      .crossJoin(broadcast(tot))
      .withColumn("ppmi_micro",
        floor(log((col("cnt").cast("double") * col("tt")) /
          (col("mt").cast("double") * col("mc"))) * 1000000.0)
          .cast("long"))
      .where(col("ppmi_micro") > 0)
      .select(col("t").as("token"), col("c"), col("ppmi_micro"),
        explode(sequence(lit(0), lit(dims - 1))).as("dim"))
      .groupBy("token", "dim")
      .agg(sum(col("ppmi_micro") * projSign(col("c"), col("dim"), seed))
        .as("e_micro"))
    // the model is <= vocabSize * dims rows by construction (the same
    // bound [[docEmbeddings]] already relies on when it collects the
    // model to broadcast it): collect + local relation IS the
    // lineage-truncated leaf, without the former .rdd re-evaluation
    // job, the model persist, or its count action
    val modelRows = modelLazy.collect()
    val model = spark.createDataFrame(
      java.util.Arrays.asList(modelRows: _*), modelLazy.schema)
    cooc.unpersist()
    model
  }

  private val tokenRe = java.util.regex.Pattern.compile("[^a-z0-9]+")

  /** Document embeddings from trained term embeddings: the (exact,
    * integer) sum of the document's vocab-token vectors, as
    * `embedding: array<long>` ordered by dim. Documents with no vocab
    * token (or only tokens whose PPMI rows are empty) produce no row.
    * Cosine is scale-invariant, so the unnormalized integer sum is the
    * right at-rest form -- bit-exact, and any consumer can normalize.
    *
    * Executed as a broadcast-model batch kernel (the classifier-scoring
    * shape): the model is <= vocabSize*dims rows BY CONSTRUCTION, so it
    * collects into a token -> vector map, broadcasts once, and each
    * partition accumulates its documents' vectors in a tight integer
    * loop -- zero shuffle, one corpus pass. The declarative
    * explode-join-aggregate alternative pushes n_distinct(doc,token) x
    * dims ROWS through an aggregate to do what is really a
    * multiply-add: at 10M tokens / 10k vocab / 64 dims it shuffled
    * 2.9 GB in 177.6 s vs this kernel's zero-shuffle 51.8 s (the
    * remainder is the corpus scan + vector parquet write; the
    * arithmetic itself is seconds). Long sums are order-independent, so
    * the kernel is bit-identical to the relational form (the gate
    * oracle recomputes it relationally and hash-matches).
    */
  def docEmbeddings(df: DataFrame, idCol: String, textCol: String,
      termEmb: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val rows = termEmb.select(col("token"), col("dim").cast("int"),
      col("e_micro").cast("long")).collect()
    val dims = if (rows.isEmpty) 0 else rows.iterator.map(_.getInt(1)).max + 1
    val model = new java.util.HashMap[String, Array[Long]]()
    rows.foreach { r =>
      model.computeIfAbsent(r.getString(0), _ => new Array[Long](dims))(
        r.getInt(1)) = r.getLong(2)
    }
    val bc = spark.sparkContext.broadcast(model)
    val idIdx = 0
    val pre = df.select(col(idCol), col(textCol).cast("string"))
    import org.apache.spark.sql.types._
    val outSchema = StructType(Seq(pre.schema.fields(idIdx),
      StructField("embedding", ArrayType(LongType, containsNull = false))))
    val rowEnc = org.apache.spark.sql.Encoders.row(outSchema)
    pre.mapPartitions { it =>
      val m = bc.value
      it.flatMap { row =>
        val txt = if (row.isNullAt(1)) null else row.getString(1)
        if (txt == null) Iterator.empty
        else {
          val vec = new Array[Long](dims)
          var hit = false
          val toks = tokenRe.split(txt.toLowerCase(java.util.Locale.ROOT))
          var i = 0
          while (i < toks.length) {
            if (toks(i).nonEmpty) {
              val tv = m.get(toks(i))
              if (tv != null) {
                hit = true
                var d = 0
                while (d < dims) { vec(d) += tv(d); d += 1 }
              }
            }
            i += 1
          }
          if (hit)
            Iterator.single(org.apache.spark.sql.Row(row.get(idIdx),
              vec.toSeq))
          else Iterator.empty
        }
      }
    }(rowEnc).toDF()
  }
}
