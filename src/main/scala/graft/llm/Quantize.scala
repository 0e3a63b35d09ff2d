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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "l39_quantize_embed" -> l39)

  val oracles: Map[String, String] = Map(
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
