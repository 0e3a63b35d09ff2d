package graft.llm

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** l39: scalar (int8-style) embedding quantization + quantized top-k
  * retrieval — the compression leg of the similarity stack. l03/l03b/l03c
  * search FLOAT vectors; at 100 TB the index itself is the cost driver
  * (64 float32 dims = 256 B/vector), so production ANN stores quantized
  * codes (4× smaller here; PQ pushes further) and ranks by an integer
  * approximate distance, re-scoring only a short candidate list in float.
  *
  * Quantizer: per-dimension min/max over the corpus (one aggregation —
  * 128 partial aggregates ride a single map-side-combined pass, NO
  * per-dimension explode), broadcast back as two 64-long arrays; code_d =
  * round((x_d - min_d) · 254 / (max_d - min_d)) ∈ [0, 254]. Degenerate
  * dims (max = min) code to 0.
  *
  * Retrieval: the probe vectors' (vec_id ≤ 4) codes broadcast against the coded
  * corpus (map-only scoring scan, the l03 posture); the score is the
  * INTEGER dot product of code arrays — exact, order-independent, and
  * engine-portable, unlike a dequantized float sum. Top-10 per probe via
  * row_number over (qdot, vec_id) — 4 probe partitions is fine for a
  * ranked-output query whose scored frame is already tiny compared to
  * the corpus scan; a many-probe batch would swap in the o06
  * TopKPerGroup two-phase-heap exec on the same scored frame.
  *
  * Float determinism: min/max of float are exact (no summation), the
  * affine rescale is ONE fixed-shape double expression both engines
  * parse identically ((x - mn) * 254.0 / (mx - mn), all operands exact
  * float→double widenings), and round() is half-up on both engines for
  * the non-negative domain. Everything downstream of the codes is
  * integer.
  */
object Quantize extends QueryModule {

  val Dims = 64
  val Probes = 4
  val TopK = 10

  /** One row, two array<float> columns (mn, mx): per-dimension corpus
    * bounds in a single aggregation pass. */
  private def bounds(emb: DataFrame): DataFrame = {
    val aggs = (1 to Dims).map(i => min(element_at(col("embedding"), i)).as(s"mn$i")) ++
      (1 to Dims).map(i => max(element_at(col("embedding"), i)).as(s"mx$i"))
    emb.agg(aggs.head, aggs.tail: _*)
      .select(
        array((1 to Dims).map(i => col(s"mn$i")): _*).as("mn"),
        array((1 to Dims).map(i => col(s"mx$i")): _*).as("mx"))
  }

  /** (vec_id, q: array<int>) — the quantized corpus. */
  private[graft] def coded(emb: DataFrame): DataFrame =
    emb.crossJoin(broadcast(bounds(emb)))
      .select(col("vec_id"), expr(
        s"""transform(sequence(1, $Dims), i ->
           |  CASE WHEN element_at(mx, i) = element_at(mn, i) THEN 0
           |       ELSE CAST(round(
           |         (CAST(element_at(embedding, i) AS DOUBLE)
           |            - CAST(element_at(mn, i) AS DOUBLE)) * 254.0D
           |         / (CAST(element_at(mx, i) AS DOUBLE)
           |            - CAST(element_at(mn, i) AS DOUBLE))) AS INT) END)""".stripMargin)
        .as("q"))

  def l39(spark: SparkSession, dir: String): DataFrame = {
    val c = coded(Tables.embeddings(spark, dir))
    val probes = c.filter(col("vec_id") <= Probes)
      .select(col("vec_id").as("probe_id"), col("q").as("qp"))
    val scored = c.crossJoin(broadcast(probes))
      .select(col("probe_id"), col("vec_id"), expr(
        """aggregate(zip_with(q, qp, (x, y) -> CAST(x AS BIGINT) * y),
          |          CAST(0 AS BIGINT), (acc, v) -> acc + v)""".stripMargin).as("qdot"))
    val w = Window.partitionBy("probe_id").orderBy(col("qdot").desc, col("vec_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= TopK)
      .select("probe_id", "vec_id", "qdot", "rk")
      .orderBy("probe_id", "rk")
  }

  // ---- l40: product quantization (PQ encode + ADC search) -------------

  /** Subspace count × per-subspace dims = 8 × 8 = the 64-dim embedding. */
  val SubSpaces = 8
  val SubDim = 8

  /** Centroids per subspace (4-bit codes). Seeded deterministically as
    * the subvectors of vec_id 1..16 — the l26 seeding rule, so the
    * oracle replays the codebook bit-for-bit; kmeansFit's fitted
    * centroids slot into the same encode path for quality. */
  val PqK = 16

  /** Probed coarse lists — mirrors l03c's nprobe (Dedup.NProbe is
    * module-private; the value is part of both oracles' contract). */
  val NProbe = 2

  /** Integer micro-unit L2² between subvector m of `v` and centroid `c`:
    * each squared-difference term is individually rounded to 1e-9 units
    * and the 8 terms sum as longs — order-independent and
    * engine-portable, the l26 determinism pattern (embedding values are
    * < 0.6 in magnitude, so a term is < 1.5e9 and the sum far inside
    * Long; in that range Math.round == Spark round() == DuckDB round(),
    * all half-up, since x+0.5 is exactly representable below 2^52). */
  private[graft] def subDistJvm(v: Array[Float], c: Array[Float], m: Int): Long = {
    var acc = 0L
    var d = 0
    while (d < SubDim) {
      val i = m * SubDim + d
      val diff = v(i).toDouble - c(i).toDouble
      acc += Math.round(diff * diff * 1e9)
      d += 1
    }
    acc
  }

  /** 1-based nearest-centroid code per subspace; strictly-less argmin
    * keeps the FIRST minimum — the same tie-break the oracle's
    * list_position(ds, list_min(ds)) lands on. */
  private def codesJvm(v: Array[Float], cb: Array[Array[Float]]): Array[Int] =
    Array.tabulate(SubSpaces) { m =>
      var best = 0
      var bestD = Long.MaxValue
      var c = 0
      while (c < PqK) {
        val dd = subDistJvm(v, cb(c), m)
        if (dd < bestD) { bestD = dd; best = c }
        c += 1
      }
      best + 1
    }

  /** The probe's 8×16 ADC lookup table, computed once on the driver. */
  private def adcTable(p: Array[Float], cb: Array[Array[Float]]): Array[Array[Long]] =
    Array.tabulate(SubSpaces, PqK)((m, c) => subDistJvm(p, cb(c), m))

  /** Encode one vector and score it against the probe's table — the
    * shared per-row kernel of l40 and l44 (one definition so the
    * IVF-PQ-equals-restricted-PQ invariant can't drift). */
  private def encodeAndScore(cb: Array[Array[Float]], lt: Array[Array[Long]])(
      v: Array[Float]): (Array[Int], Long) = {
    val codes = codesJvm(v, cb)
    var ad = 0L
    var m = 0
    while (m < SubSpaces) { ad += lt(m)(codes(m) - 1); m += 1 }
    (codes, ad)
  }

  /** Driver-fetched 16×64 codebook (vec_id 1..PqK, sorted) — a
    * parameter-sized fetch (4 KB), the l43 merge-fetch class, shipped to
    * executors inside the task closure. */
  private def codebookOf(emb: DataFrame): Array[Array[Float]] =
    emb.filter(col("vec_id").between(1, PqK))
      .select("vec_id", "embedding").collect()
      .sortBy(_.getLong(0)).map(_.getSeq[Float](1).toArray)

  /** l40: PQ-encode the embedding corpus and rank it by asymmetric
    * distance to the probe (vec_id 0).
    *
    * Encode: per subspace, code = 1-based index of the nearest centroid
    * (first-minimum tie-break; exact integer distance comparison, no
    * float argmin). 8 codes × 4 bits = a 64-dim float vector stored in
    * 8 bytes, the 32× compression that makes a 100 TB vector corpus
    * searchable from memory.
    *
    * Search (ADC): the probe's 8×16 table of subspace distances is
    * computed ONCE; each corpus vector's approximate distance is then 8
    * integer table lookups — no float math per candidate, which is
    * exactly why PQ scan throughput beats exact scan at scale. The
    * encode+score stage is a typed partition-local map (JVM arithmetic,
    * no expression-tree interpretation per term — this dropped the
    * sf0.1 sweep cost ~5×); codebook and table ride the task closure;
    * the only ordering is the final output sort. */
  def l40(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val cb = codebookOf(emb)
    val probe = emb.filter(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0).toArray
    val lt = adcTable(probe, cb)
    import spark.implicits._
    val score = encodeAndScore(cb, lt) _
    emb.select("vec_id", "embedding").as[(Long, Seq[Float])]
      .mapPartitions { it =>
        it.map { case (id, e) =>
          val (codes, ad) = score(e.toArray)
          (id, codes.mkString("-"), ad)
        }
      }
      .toDF("vec_id", "pq_code", "adist")
      .orderBy("vec_id")
  }

  /** l44: IVF-PQ — the production ANN index shape (FAISS IVFx,PQy with
    * by_residual=false): l03c's coarse routing composed with l40's PQ
    * ranking. Index side: every vector routes map-side to its best
    * coarse centroid (broadcast argmax-cosine, the kmeansAssign step)
    * and stores only (list id, 8 PQ codes). Query side: the probe picks
    * its NProbe nearest lists, computes its 8×16 ADC table once, and
    * ranks ONLY the probed lists' candidates by integer table lookups —
    * at 100 TB the scan touches nprobe/nlist of the corpus and reads
    * 8-byte codes instead of 256-byte vectors, which is the entire
    * point of the structure. (Residual encoding would PQ-encode
    * x − coarse_centroid with the same dataflow; FAISS's
    * by_residual=false variant keeps the codebook shared across lists,
    * which is what the seeded codebook here is.) Driver fetches are all
    * parameter-sized: the codebook, the probe vector, and the NProbe
    * probed list ids. */
  def l44(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.VecMath.register(spark)
    val emb = Tables.embeddings(spark, dir)
    val cb = codebookOf(emb)
    val coarse = emb.filter(col("vec_id").between(1, PqK))
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    val probedCids = emb.filter(col("vec_id") === 0)
      .crossJoin(broadcast(coarse))
      .withColumn("ccos", expr(
        """vec_dot(embedding, cvec)
          | / (sqrt(vec_dot(embedding, embedding)) * sqrt(vec_dot(cvec, cvec)))""".stripMargin))
      .orderBy(col("ccos").desc, col("cid"))
      .limit(NProbe)
      .select("cid").collect().map(_.getLong(0)).toSeq
    val probe = emb.filter(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0).toArray
    val lt = adcTable(probe, cb)
    val routed = Dedup.kmeansAssign(emb.filter(col("vec_id") =!= 0), coarse)
      .filter(col("cid").isin(probedCids: _*))
      .select("vec_id", "embedding", "cid")
    import spark.implicits._
    val score = encodeAndScore(cb, lt) _
    routed.as[(Long, Seq[Float], Long)]
      .mapPartitions { it =>
        it.map { case (id, e, cid) =>
          val (_, ad) = score(e.toArray)
          (id, cid, ad)
        }
      }
      .toDF("vec_id", "cid", "adist")
      .orderBy(col("adist").asc, col("vec_id"))
      .limit(10)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "l39_quantize_embed" -> l39,
    "l40_pq_encode" -> l40,
    "l44_ivfpq" -> l44)

  /** DuckDB image of subDistUnits (1-based list indexing; same term
    * shape, same per-term rounding, integer sum pinned to BIGINT). */
  private def duckSubDist(v: String, c: String, m: String): String =
    s"""CAST(list_sum(list_transform(range(1, ${SubDim + 1}), d ->
       |  CAST(round(
       |    (CAST($v[CAST($m * $SubDim + d AS BIGINT)] AS DOUBLE)
       |       - CAST($c[CAST($m * $SubDim + d AS BIGINT)] AS DOUBLE))
       |    * (CAST($v[CAST($m * $SubDim + d AS BIGINT)] AS DOUBLE)
       |       - CAST($c[CAST($m * $SubDim + d AS BIGINT)] AS DOUBLE))
       |    * 1000000000.0) AS BIGINT))) AS BIGINT)""".stripMargin

  /** DuckDB image of the Spark-side cosine (vec_dot shape) — identical
    * to the one l03c's oracle pairs with kmeansAssign. */
  private def duckCosQ(v: String, c: String): String =
    s"""list_sum(list_transform(range(1, 65), i -> CAST($v[i] AS DOUBLE) * CAST($c[i] AS DOUBLE)))
       | / (sqrt(list_sum(list_transform($v, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
       |    * sqrt(list_sum(list_transform($c, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))""".stripMargin

  val oracles: Map[String, String] = Map(
    "l44_ivfpq" ->
      s"""WITH cents AS (
         |  SELECT vec_id AS cid, embedding AS cvec FROM embeddings
         |  WHERE vec_id BETWEEN 1 AND $PqK),
         |scored AS (
         |  SELECT e.vec_id, e.embedding, c.cid,
         |         row_number() OVER (PARTITION BY e.vec_id
         |           ORDER BY ${duckCosQ("e.embedding", "c.cvec")} DESC, c.cid) AS rn
         |  FROM embeddings e CROSS JOIN cents c WHERE e.vec_id <> 0),
         |assigned AS (SELECT vec_id, embedding, cid FROM scored WHERE rn = 1),
         |probe AS (
         |  SELECT c.cid AS pcid
         |  FROM embeddings e CROSS JOIN cents c WHERE e.vec_id = 0
         |  ORDER BY ${duckCosQ("e.embedding", "c.cvec")} DESC, c.cid
         |  LIMIT $NProbe),
         |cb AS (SELECT list(embedding ORDER BY vec_id) AS cents
         |       FROM embeddings WHERE vec_id BETWEEN 1 AND $PqK),
         |enc AS (
         |  SELECT a.vec_id, a.cid,
         |         list_transform(range(0, $SubSpaces), m ->
         |           list_transform(cents, c -> ${duckSubDist("a.embedding", "c", "m")})) AS dists
         |  FROM assigned a CROSS JOIN cb),
         |coded AS (
         |  SELECT vec_id, cid,
         |         list_transform(dists, ds ->
         |           CAST(list_position(ds, list_min(ds)) AS INT)) AS codes
         |  FROM enc),
         |plt AS (
         |  SELECT list_transform(range(0, $SubSpaces), m ->
         |           list_transform(cents, c -> ${duckSubDist("e.embedding", "c", "m")})) AS lt
         |  FROM embeddings e CROSS JOIN cb WHERE e.vec_id = 0)
         |SELECT c.vec_id, c.cid,
         |       CAST(list_sum(list_transform(range(0, $SubSpaces), m ->
         |         lt[CAST(m + 1 AS BIGINT)][CAST(codes[CAST(m + 1 AS BIGINT)] AS BIGINT)]))
         |         AS BIGINT) AS adist
         |FROM coded c JOIN probe ON c.cid = probe.pcid CROSS JOIN plt
         |ORDER BY adist, c.vec_id LIMIT 10""".stripMargin,
    "l40_pq_encode" ->
      s"""WITH cb AS (SELECT list(embedding ORDER BY vec_id) AS cents
         |            FROM embeddings WHERE vec_id BETWEEN 1 AND $PqK),
         |enc AS (
         |  SELECT vec_id,
         |         list_transform(range(0, $SubSpaces), m ->
         |           list_transform(cents, c -> ${duckSubDist("embedding", "c", "m")})) AS dists
         |  FROM embeddings CROSS JOIN cb),
         |coded AS (
         |  SELECT vec_id, dists,
         |         list_transform(dists, ds ->
         |           CAST(list_position(ds, list_min(ds)) AS INT)) AS codes
         |  FROM enc),
         |plt AS (SELECT dists AS lt FROM enc WHERE vec_id = 0)
         |SELECT c.vec_id,
         |       array_to_string(list_transform(codes, x -> CAST(x AS VARCHAR)), '-') AS pq_code,
         |       CAST(list_sum(list_transform(range(0, $SubSpaces), m ->
         |         lt[CAST(m + 1 AS BIGINT)][CAST(codes[CAST(m + 1 AS BIGINT)] AS BIGINT)]))
         |         AS BIGINT) AS adist
         |FROM coded c CROSS JOIN plt
         |ORDER BY c.vec_id""".stripMargin,
    "l39_quantize_embed" ->
      s"""WITH b AS (
         |  SELECT i, min(CAST(embedding[i] AS DOUBLE)) AS mnd,
         |            max(CAST(embedding[i] AS DOUBLE)) AS mxd
         |  FROM embeddings, LATERAL (SELECT unnest(range(1, $Dims + 1)) AS i) t
         |  GROUP BY i),
         |bl AS (SELECT list(mnd ORDER BY i) AS mn, list(mxd ORDER BY i) AS mx FROM b),
         |c AS (
         |  SELECT vec_id,
         |         list_transform(range(1, $Dims + 1), i ->
         |           CASE WHEN mx[i] = mn[i] THEN 0
         |                ELSE CAST(round((CAST(embedding[i] AS DOUBLE) - mn[i]) * 254.0
         |                                / (mx[i] - mn[i])) AS INT) END) AS q
         |  FROM embeddings CROSS JOIN bl),
         |p AS (SELECT vec_id AS probe_id, q AS qp FROM c WHERE vec_id <= $Probes),
         |scored AS (
         |  SELECT probe_id, vec_id,
         |         CAST(list_sum(list_transform(range(1, $Dims + 1),
         |                i -> CAST(q[i] AS BIGINT) * qp[i])) AS BIGINT) AS qdot
         |  FROM c CROSS JOIN p),
         |ranked AS (
         |  SELECT probe_id, vec_id, qdot,
         |         CAST(row_number() OVER (PARTITION BY probe_id
         |                ORDER BY qdot DESC, vec_id) AS INT) AS rk
         |  FROM scored)
         |SELECT probe_id, vec_id, qdot, rk FROM ranked
         |WHERE rk <= $TopK ORDER BY probe_id, rk""".stripMargin)
}
