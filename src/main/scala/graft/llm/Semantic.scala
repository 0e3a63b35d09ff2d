package graft.llm

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Semantic curation operators for training-data pipelines:
  *
  *  - l27 SemDeDup (Abbas et al. 2023): within-cluster embedding-cosine
  *    dedup — cluster the corpus with a coarse quantizer, compare pairs
  *    ONLY inside each cluster. Pairwise work falls from O(N²) to
  *    O(Σ|c|²); k grows with the corpus so cluster sizes stay bounded,
  *    and the one shuffle is a hash partition on cluster id (AQE skew
  *    split handles fat clusters).
  *  - l28 content-defined chunking: rolling-hash boundaries at token
  *    granularity (a boundary after word w iff hash(w) ≡ 0 mod 16).
  *    Unlike fixed windows (l23), chunk boundaries survive insertions —
  *    an edited document re-chunks only locally, so downstream exact
  *    dedup (l01) deduplicates unchanged chunks across versions.
  *    Map-only, shuffle-free, embarrassingly parallel.
  *  - l29 unigram-LM negative log-likelihood (the CCNet/perplexity
  *    quality signal): score each document by its cross-entropy under
  *    the corpus's own unigram distribution. Gibberish and boilerplate
  *    sit at the distribution's tails.
  *
  * All pure relational Spark with portable md5-derived hashes and exact
  * float-order pinning, so each has a bit-for-bit DuckDB oracle.
  */
object Semantic extends QueryModule {

  private val Tau = 0.4 // within-cluster cosine above this ⇒ semantic dup
  private val CdcMod = 16 // expected chunk length in words

  /** l27: SemDeDup. Assignment = l03c's map-side broadcast-centroid
    * argmax-cosine (16 fixed centroids as the deterministic stand-in for
    * trained k-means centers — the plumbing is identical). Within each
    * cluster, every pair with cosine ≥ τ marks the larger vec_id a
    * duplicate of its smallest qualifying neighbor (first-wins, same
    * keep rule as l02). Cosines are rounded to 6 dp before the
    * threshold so the float image matches the oracle bit-for-bit. */
  def l27(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    // 16 fixed centroids: the fixture literal the DuckDB oracle replays —
    // the corpus-scaled library path is semDedupScaled below
    val cents = emb.filter(col("vec_id").between(1, 16))
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    semDedup(emb, cents, Tau)
  }

  /** SemDeDup over any (vec_id, embedding) frame against an arbitrary
    * centroid table (cid, cvec) — the assignment is map-side (centroids
    * broadcast), the pair join shuffles once on cluster id. Pair work is
    * O(Σ|c|²), so k must GROW with the corpus for the bound to mean
    * anything: [[semDedupScaled]] derives k = n/targetCluster
    * (ScalePatternsSpec pins the resulting ~linear candidate growth);
    * production seeds kmeansFit(emb) — whose default k is the same
    * scaled law — and passes the fitted centroids here. */
  def semDedup(emb: DataFrame, cents: DataFrame, tau: Double): DataFrame = {
    graft.functions.VecMath.register(emb.sparkSession)
    val assigned = Dedup.kmeansAssign(emb, cents)
      .withColumn("nrm", expr("sqrt(vec_dot(embedding, embedding))"))
      .select(col("vec_id"), col("cid"), col("embedding"), col("nrm"))
      // scoped cache: referenced three times (both pair sides + the
      // verdict join); uncached, the scan+crossJoin+window assignment
      // subplan runs 3×. Released before returning — the per-vector
      // result is localCheckpoint-materialized below.
      .cache()
    // explicit renames (not aliases): a self-join of a window-derived
    // plan resolves unambiguously this way
    val x = assigned.select(col("vec_id").as("a_id"), col("cid").as("a_cid"),
      col("embedding").as("a_emb"), col("nrm").as("a_nrm"))
    val y = assigned.select(col("vec_id").as("b_id"), col("cid").as("b_cid"),
      col("embedding").as("b_emb"), col("nrm").as("b_nrm"))
    val dup = x.join(y, col("a_cid") === col("b_cid") && col("a_id") < col("b_id"))
      .withColumn("cosine",
        round(expr("vec_dot(a_emb, b_emb)") / (col("a_nrm") * col("b_nrm")), 6))
      .filter(col("cosine") >= tau)
      .groupBy(col("b_id").as("vec_id")).agg(min(col("a_id")).as("dup_of"))
    val out = assigned.join(dup, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cid"),
        when(col("dup_of").isNotNull, "dup").otherwise("keep").as("status"),
        col("dup_of"))
      .orderBy("vec_id")
      .localCheckpoint()
    assigned.unpersist(blocking = false)
    out
  }

  /** The scale path: k derived from corpus size (k = n/targetCluster,
    * floor 16) with deterministic seed centroids — the first k vectors,
    * the same seeding kmeansFit starts from; swap in kmeansFit(emb)'s
    * fitted centroids for quality at the same pair-work bound. */
  def semDedupScaled(emb: DataFrame, tau: Double = Tau,
      targetCluster: Long = 16L): DataFrame = {
    val k = Dedup.scaledK(CorpusStats.n(emb), targetCluster)
    val cents = emb.filter(col("vec_id").between(1, k))
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    semDedup(emb, cents, tau)
  }

  /** Σ |cluster|·(|cluster|−1)/2 under the argmax-cosine assignment —
    * the exact within-cluster pair count the SemDeDup join generates,
    * from cluster SIZES only (no pair join, embeddings dropped before
    * the assignment shuffle). ScalePatternsSpec pins the growth law. */
  def semDedupCandidateWork(emb: DataFrame, cents: DataFrame): Long = {
    graft.functions.VecMath.register(emb.sparkSession)
    emb.crossJoin(broadcast(cents))
      .withColumn("ccos", expr(
        """vec_dot(embedding, cvec)
          | / (sqrt(vec_dot(embedding, embedding)) * sqrt(vec_dot(cvec, cvec)))""".stripMargin))
      .select(col("vec_id"), col("cid"), col("ccos"))
      // argmax via max(struct): lexicographic max on (ccos, -cid) ==
      // highest cosine, smallest cid on ties — same tie-break as
      // kmeansAssign's window, without shuffling embedding arrays
      .groupBy("vec_id")
      .agg(max(struct(col("ccos"), (-col("cid")).as("ncid"))).as("m"))
      .select((-col("m.ncid")).as("cid"))
      .groupBy("cid").agg(count(lit(1)).as("c"))
      .agg(coalesce(sum(expr("(c * (c - 1)) div 2")), lit(0L)).as("w"))
      .head().getLong(0)
  }

  /** l28: content-defined chunking. Boundary after word k iff the word's
    * 60-bit md5-derived hash ≡ 0 (mod 16); chunks are the word ranges
    * between consecutive boundaries. All per-document array work — one
    * md5 per word, no shuffle anywhere; the chunk table is the input to
    * chunk-level exact dedup (l01 on chunk_md5). */
  def l28(spark: SparkSession, dir: String): DataFrame =
    // spread (§2.5): the per-word md5 boundary filter + zip transforms
    // are the heavy stage and ran on the single-split scan; at-scale
    // no-op
    chunkCdc(Tables.spread(Tables.documents(spark, dir), "doc_id"))

  /** The chunker over any (doc_id, text) frame — SemanticSpec drives it
    * on synthetic edits to prove boundary locality. */
  def chunkCdc(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), split(lower(col("text")), " ").as("w"))
      .withColumn("nw", size(col("w")))
      .withColumn("bounds", expr(
        s"""filter(sequence(1, nw),
           |  k -> pmod(CAST(conv(substr(md5(element_at(w, k)), 1, 15), 16, 10) AS BIGINT), $CdcMod) = 0)""".stripMargin))
      // starts/ends zip: (1, b1), (b1+1, b2), …, (bk+1, nw); the tail pair
      // is empty iff the last word is itself a boundary — filtered out
      .select(col("doc_id"), col("w"), posexplode(expr(
        """filter(zip_with(concat(array(1), transform(bounds, b -> b + 1)),
          |               concat(bounds, array(nw)),
          |               (s, e) -> struct(s AS s, e AS e)),
          |  p -> p.e >= p.s)""".stripMargin)).as(Seq("pos", "p")))
      .select(col("doc_id"),
        (col("pos") + 1).cast("long").as("chunk_idx"),
        col("p.s").cast("long").as("start_word"),
        (col("p.e") - col("p.s") + 1).cast("long").as("n_words"),
        md5(array_join(expr("slice(w, p.s, p.e - p.s + 1)"), " ")).as("chunk_md5"))
      .orderBy("doc_id", "chunk_idx")

  /** l29: unigram cross-entropy quality score. The corpus's own token
    * distribution is the LM; each doc scores avg(-ln p(token)). Per-doc
    * float summation order is pinned by folding over the numerically
    * SORTED term list (the a17 contract). At 100 TB the vocab join is a
    * plain shuffle equi-join on token — the vocabulary of a web corpus
    * is NOT broadcast material, and the doc-token table is already
    * token-partitioned from the count that built it. */
  def l29(spark: SparkSession, dir: String): DataFrame = {
    val tok = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("t"))
    val vocab = tok.groupBy("t").agg(count(lit(1)).as("c"))
    val total = vocab.agg(sum("c").as("total"))
    val nll = vocab.crossJoin(broadcast(total))
      .select(col("t"), (-log(col("c").cast("double") / col("total"))).as("nll"))
    tok.groupBy("doc_id", "t").agg(count(lit(1)).as("tf"))
      .join(nll, "t")
      .withColumn("term", col("tf").cast("double") * col("nll"))
      .groupBy("doc_id")
      .agg(sum("tf").as("n_tokens"),
        sort_array(collect_list(col("term"))).as("terms"))
      .select(col("doc_id"), col("n_tokens"),
        (floor(expr("aggregate(terms, 0D, (acc, x) -> acc + x)")
          / col("n_tokens") * 1000000.0 + 0.5) / 1000000.0).as("avg_nll"))
      .orderBy("doc_id")
  }

  private val ProjDims = 8 // target dimensionality of the l30 sketch

  /** l30: random-projection dimensionality reduction (Achlioptas 2003:
    * a ±1 sign matrix is a valid Johnson-Lindenstrauss projection) —
    * the embedding-sketch step that feeds cheap ANN/clustering when 64
    * (or 4096) dims are too wide to shuffle. y_k = Σ_d sign(d,k)·x_d
    * with the sign drawn from the portable md5 hash of (d,k), so the
    * "matrix" is derived, never materialized or broadcast — the whole
    * operator is MAP-ONLY (zero shuffle; the groupBy-free scale shape:
    * at 100 TB this runs at scan speed). Arithmetic is pinned in integer
    * micro-units: sign·round-to-micro(x) summed as BIGINT by the
    * sequence fold, one double division at the end — bit-exact in any
    * engine at any parallelism. One output row per (vec_id, k). */
  /** The ±1 sign for projection lane k, input dim d — the md5-derived
    * value both engines agree on (the oracle re-derives it in SQL). The
    * matrix is row-independent, so it is computed ONCE here and embedded
    * in the plan as a literal (the executor-side alternative — md5 inside
    * the fold lambda — re-hashed all dims×lanes per ROW: measured 2.2 s
    * vs 0.6 s at sf0.1). At real scale this is the "tiny broadcast side"
    * done as a constant: 64×8 longs inside the codegen'd expression. */
  private def projSign(d: Int, k: Int): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$d#$k".getBytes("UTF-8")).map("%02x".format(_)).mkString
    1L - 2L * (java.lang.Long.parseLong(hex.take(15), 16) % 2)
  }

  def l30(spark: SparkSession, dir: String): DataFrame = {
    val dims = 64 // embeddings table vector width
    val signRows = (0 until ProjDims).map(k =>
      s"array(${(0 until dims).map(d => s"${projSign(d, k)}L").mkString(",")})")
    val proj =
      s"""transform(sequence(0, ${ProjDims - 1}), k ->
         |  aggregate(
         |    zip_with(embedding, element_at(array(${signRows.mkString(",\n      ")}), k + 1),
         |      (x, s) -> s * CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)),
         |    0L, (acc, v) -> acc + v))""".stripMargin
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), posexplode(expr(proj)).as(Seq("k", "y_micro")))
      .select(col("vec_id"), col("k"),
        (col("y_micro").cast("double") / lit(1000000.0)).as("y"))
      .orderBy("vec_id", "k")
  }

  /** l46: DSIR-style importance resampling scores (Xie et al. 2023,
    * "Data Selection for Language Models via Importance Resampling").
    * Raw web-scale text is scored by how target-like it is under a
    * cheap hashed n-gram bag model: unigrams hash into 64 buckets,
    * p = add-one-smoothed bucket distribution of the TARGET slice
    * (lang='en' here), q = of the rest; a document's log importance
    * weight is Σ_b n_b·ln(p_b/q_b). Two shuffles total: the 64-row
    * distribution aggregate (broadcast back) and the per-doc score —
    * at 100 TB the distributions are still 64 rows, so the scoring
    * pass is effectively map-side + one doc-key combine. The per-doc
    * sum is computed over the SORTED per-bucket term array (l29's
    * trick) so double addition order can't diverge from the oracle. */
  def l46(spark: SparkSession, dir: String): DataFrame = {
    // ONE tokenize+hash pass: the per-doc bucket counts are the only
    // corpus-sized aggregate, and the 64-row distributions derive from
    // THEM (sum over docs) instead of re-scanning the token stream; the
    // scoped cache covers the two consumers, released after the
    // checkpointed result materializes
    val db = l46DocBuckets(spark, dir).cache()
    val out = l46Score(db).localCheckpoint()
    db.unpersist(blocking = false)
    out
  }

  /** Per-doc hashed-bucket counts — l46's single corpus-sized pass. */
  private[graft] def l46DocBuckets(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), (col("lang") === "en").as("tgt"),
        explode(split(lower(col("text")), " ")).as("t"))
      .withColumn("b",
        expr("CAST(conv(substr(md5(t), 1, 6), 16, 10) AS BIGINT)") % 64)
      .groupBy("doc_id", "b")
      .agg(count(lit(1)).as("n_b"), first("tgt").as("tgt"))

  /** Distribution build + per-doc scoring over the bucket-count frame. */
  private[graft] def l46Score(db: DataFrame): DataFrame = {
    val nb = 64
    val dist = db.groupBy("b").agg(
      sum(when(col("tgt"), col("n_b")).otherwise(0L)).as("ct"),
      sum(col("n_b")).as("ca"))
    val tot = dist.agg(sum("ct").as("tt"), sum("ca").as("ta"))
    val llr = dist.crossJoin(broadcast(tot))
      .select(col("b"),
        log(((col("ct") + 1) / (col("tt") + nb)) /
            ((col("ca") - col("ct") + 1) / (col("ta") - col("tt") + nb))).as("llr"))
    db.join(broadcast(llr), "b")
      .withColumn("term", col("n_b").cast("double") * col("llr"))
      .groupBy("doc_id")
      .agg(sum("n_b").as("n_tokens"),
        sort_array(collect_list(col("term"))).as("terms"))
      .select(col("doc_id"), col("n_tokens"),
        (floor(expr("aggregate(terms, 0D, (acc, x) -> acc + x)")
          * 1000000.0 + 0.5) / 1000000.0).as("log_weight"))
      .orderBy("doc_id")
  }

  /** l62: SOURCE CENTROID SIMILARITY — the embedding-space answer to
    * l59's lexical source-overlap matrix: per-source mean-embedding
    * DIRECTION and the pairwise cosine between sources. Two sources can
    * share almost no literal 8-grams yet sit on top of each other
    * semantically (a paraphrase mill, a translation pair) — this is the
    * dashboard that catches it, and the standard input to source-level
    * mixing/dedup decisions.
    *
    * Engine-exactness: components quantize to integer micro-units (the
    * l39 rule), the centroid NUMERATOR (per-dim component sum) stays a
    * BIGINT vector, and cosine is scale-invariant so the 1/n division
    * never happens — no float accumulation, no negative-floor-division
    * divergence; dot/norms accumulate DECIMAL(38,0) (HUGEINT in the
    * oracle), one double division + sqrt at the surface, floor-rounded.
    *
    * Scale shape: one pass over the embeddings (map-side-combinable
    * (source, dim) sums after the doc-key join); everything after runs
    * on the sources × 64 centroid frame — the pairwise join is
    * catalog-sized at any corpus size. */
  def l62(spark: SparkSession, dir: String): DataFrame = {
    val src = Tables.documents(spark, dir)
      .select(col("doc_id").as("vec_id"), col("source"))
    // n_docs counts EMBEDDED docs per source (the centroid's population —
    // the embeddings table can be a subset of the corpus)
    val sv = Tables.embeddings(spark, dir).join(src, Seq("vec_id"))
    val cent = sv
      .select(col("source"), posexplode(col("embedding")).as(Seq("dim", "x")))
      .withColumn("xu", expr("CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)"))
      .groupBy("source", "dim").agg(sum("xu").as("sx"))
    val nrm = cent.groupBy("source")
      .agg(sum(expr("CAST(sx AS DECIMAL(38,0)) * sx")).as("n2"))
    val docs = sv.groupBy("source").agg(count(lit(1)).as("n_docs"))
    cent.select(col("source").as("s1"), col("dim"), col("sx").as("sxa"))
      // sources × 64 rows by construction — hint it so the pair join can
      // never degrade to a sort-merge on the dim key (PlanSpec pins this)
      .join(broadcast(cent.select(col("source").as("s2"), col("dim"), col("sx").as("sxb"))),
        Seq("dim"))
      .filter(col("s1") < col("s2"))
      .groupBy("s1", "s2")
      .agg(sum(expr("CAST(sxa AS DECIMAL(38,0)) * sxb")).as("dot"))
      .join(broadcast(nrm.select(col("source").as("s1"), col("n2").as("n2a"))), Seq("s1"))
      .join(broadcast(nrm.select(col("source").as("s2"), col("n2").as("n2b"))), Seq("s2"))
      .join(broadcast(docs.select(col("source").as("s1"), col("n_docs").as("n1"))), Seq("s1"))
      .join(broadcast(docs.select(col("source").as("s2"), col("n_docs").as("n2"))), Seq("s2"))
      // Column-level doubles, NOT expr("... / 1000000.0"): the SQL-string
      // literal parses as DECIMAL(8,1) and drags cos_sim to DECIMAL(30,9);
      // the oracle (and every other ratio surface here) is DOUBLE.
      .withColumn("cos_sim",
        floor(expr("CAST(dot AS DOUBLE) / (sqrt(CAST(n2a AS DOUBLE)) * sqrt(CAST(n2b AS DOUBLE)))")
          * 1000000.0 + 0.5) / 1000000.0)
      .select("s1", "s2", "n1", "n2", "cos_sim")
      .orderBy("s1", "s2")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "l62_source_centroid_sim" -> l62,
    "l46_dsir" -> l46,
    "l27_semdedup" -> l27,
    "l28_chunk_cdc" -> l28,
    "l29_perplexity" -> l29,
    "l30_reduce_dim" -> l30)

  private def duckCos(v: String, c: String): String =
    s"""list_sum(list_transform(range(1, 65), i -> CAST($v[i] AS DOUBLE) * CAST($c[i] AS DOUBLE)))
       | / (sqrt(list_sum(list_transform($v, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
       |    * sqrt(list_sum(list_transform($c, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))""".stripMargin

  val oracles: Map[String, String] = Map(
    // l62: same micro-quantize, same BIGINT sums (HUGEINT mass), same
    // one-division floor-rounded cosine
    "l62_source_centroid_sim" ->
      """WITH sv AS (SELECT d.source, e.embedding
        |            FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id),
        |comp AS (SELECT source, unnest(embedding) AS x,
        |                generate_subscripts(embedding, 1) AS dim FROM sv),
        |cent AS (SELECT source, dim,
        |           CAST(SUM(CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5)
        |                         AS BIGINT)) AS BIGINT) AS sx
        |         FROM comp GROUP BY 1, 2),
        |nrm AS (SELECT source, SUM(CAST(sx AS HUGEINT) * sx) AS n2
        |        FROM cent GROUP BY 1),
        |dc AS (SELECT source, COUNT(*) AS n_docs FROM sv GROUP BY 1),
        |p AS (SELECT a.source AS s1, b.source AS s2,
        |             SUM(CAST(a.sx AS HUGEINT) * b.sx) AS dot
        |      FROM cent a JOIN cent b ON a.dim = b.dim AND a.source < b.source
        |      GROUP BY 1, 2)
        |SELECT s1, s2, da.n_docs AS n1, db.n_docs AS n2,
        |       floor(CAST(dot AS DOUBLE)
        |             / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE)))
        |             * 1000000.0 + 0.5) / 1000000.0 AS cos_sim
        |FROM p JOIN nrm na ON p.s1 = na.source JOIN nrm nb ON p.s2 = nb.source
        |     JOIN dc da ON p.s1 = da.source JOIN dc db ON p.s2 = db.source
        |ORDER BY s1, s2""".stripMargin,
    // l46: identical hashed-bucket distributions + sorted-term summation
    "l46_dsir" ->
      """WITH tok AS (
        |  SELECT doc_id, lang = 'en' AS tgt,
        |         unnest(string_split(lower(text), ' ')) AS t
        |  FROM documents),
        |tb AS (
        |  SELECT doc_id, tgt,
        |         CAST(('0x' || substr(md5(t), 1, 6)) AS BIGINT) % 64 AS b
        |  FROM tok),
        |dist AS (
        |  SELECT b, SUM(CASE WHEN tgt THEN 1 ELSE 0 END) AS ct, COUNT(*) AS ca
        |  FROM tb GROUP BY b),
        |tot AS (SELECT SUM(ct) AS tt, SUM(ca) AS ta FROM dist),
        |llr AS (
        |  SELECT b, ln(((ct + 1) / (tt + 64)) /
        |               ((ca - ct + 1) / (ta - tt + 64))) AS llr
        |  FROM dist CROSS JOIN tot),
        |db AS (
        |  SELECT doc_id, b, COUNT(*) AS n_b FROM tb GROUP BY doc_id, b),
        |d AS (
        |  SELECT db.doc_id, CAST(SUM(db.n_b) AS BIGINT) AS n_tokens,
        |         list_sort(list(CAST(db.n_b AS DOUBLE) * llr.llr)) AS terms
        |  FROM db JOIN llr ON db.b = llr.b GROUP BY db.doc_id)
        |SELECT doc_id, n_tokens,
        |       floor(list_sum(terms) * 1000000.0 + 0.5) / 1000000.0 AS log_weight
        |FROM d ORDER BY doc_id""".stripMargin,
    "l30_reduce_dim" ->
      s"""WITH e AS (
         |  SELECT vec_id,
         |         unnest(embedding) AS x,
         |         unnest(range(0, len(embedding))) AS d
         |  FROM embeddings),
         |ks AS (SELECT unnest(range(0, $ProjDims)) AS k),
         |t AS (
         |  SELECT vec_id, ks.k AS k,
         |         (1 - 2 * (CAST(('0x' || substr(md5(
         |              d::VARCHAR || '#' || ks.k::VARCHAR), 1, 15)) AS BIGINT) % 2))
         |         * CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) AS v
         |  FROM e CROSS JOIN ks)
         |SELECT vec_id, CAST(k AS INTEGER) AS k,
         |       CAST(CAST(SUM(v) AS BIGINT) AS DOUBLE) / 1000000.0 AS y
         |FROM t GROUP BY vec_id, k ORDER BY vec_id, k""".stripMargin,
    "l27_semdedup" ->
      s"""WITH cents AS (
         |  SELECT vec_id AS cid, embedding AS cvec FROM embeddings
         |  WHERE vec_id BETWEEN 1 AND 16),
         |scored AS (
         |  SELECT e.vec_id, e.embedding, c.cid,
         |         row_number() OVER (PARTITION BY e.vec_id
         |           ORDER BY ${duckCos("e.embedding", "c.cvec")} DESC, c.cid) AS rn
         |  FROM embeddings e CROSS JOIN cents c),
         |assigned AS (
         |  SELECT vec_id, cid, embedding,
         |         sqrt(list_sum(list_transform(embedding,
         |           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
         |  FROM scored WHERE rn = 1),
         |pairs AS (
         |  SELECT x.vec_id AS a, y.vec_id AS b,
         |         round(list_sum(list_transform(range(1, 65),
         |             i -> CAST(x.embedding[i] AS DOUBLE) * CAST(y.embedding[i] AS DOUBLE)))
         |           / (x.nrm * y.nrm), 6) AS cosine
         |  FROM assigned x JOIN assigned y
         |    ON x.cid = y.cid AND x.vec_id < y.vec_id),
         |dup AS (SELECT b AS vec_id, MIN(a) AS dup_of FROM pairs
         |        WHERE cosine >= $Tau GROUP BY b)
         |SELECT n.vec_id, n.cid,
         |       CASE WHEN d.dup_of IS NOT NULL THEN 'dup' ELSE 'keep' END AS status,
         |       d.dup_of
         |FROM assigned n LEFT JOIN dup d ON n.vec_id = d.vec_id
         |ORDER BY n.vec_id""".stripMargin,
    "l28_chunk_cdc" ->
      s"""WITH d AS (
         |  SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
         |b AS (
         |  SELECT doc_id, w, len(w) AS nw,
         |         list_filter(range(1, len(w) + 1),
         |           k -> CAST(('0x' || substr(md5(w[k]), 1, 15)) AS BIGINT) % $CdcMod = 0) AS bounds
         |  FROM d),
         |z AS (
         |  SELECT doc_id, w,
         |         [1] || list_transform(bounds, b -> b + 1) AS starts,
         |         bounds || [nw] AS ends
         |  FROM b),
         |c AS (
         |  SELECT doc_id, w,
         |         unnest(list_filter(list_transform(range(1, len(starts) + 1),
         |           i -> {'idx': i, 's': starts[i], 'e': ends[i]}),
         |           p -> p.e >= p.s), recursive := true)
         |  FROM z)
         |SELECT doc_id, CAST(idx AS BIGINT) AS chunk_idx,
         |       CAST(s AS BIGINT) AS start_word,
         |       CAST(e - s + 1 AS BIGINT) AS n_words,
         |       md5(array_to_string(list_slice(w, s, e), ' ')) AS chunk_md5
         |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,
    "l29_perplexity" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t FROM documents),
        |vocab AS (SELECT t, COUNT(*) AS c FROM tok GROUP BY t),
        |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS total FROM vocab),
        |nll AS (SELECT t, -ln(CAST(c AS DOUBLE) / total) AS nll
        |        FROM vocab CROSS JOIN tot),
        |tf AS (SELECT doc_id, t, COUNT(*) AS tf FROM tok GROUP BY doc_id, t),
        |d AS (
        |  SELECT tf.doc_id, CAST(SUM(tf.tf) AS BIGINT) AS n_tokens,
        |         list_sort(list(CAST(tf.tf AS DOUBLE) * nll.nll)) AS terms
        |  FROM tf JOIN nll ON tf.t = nll.t GROUP BY tf.doc_id)
        |SELECT doc_id, n_tokens,
        |       floor(list_sum(terms) / n_tokens * 1000000.0 + 0.5) / 1000000.0 AS avg_nll
        |FROM d ORDER BY doc_id""".stripMargin)
}
