package graft.llm

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** l38: sliding-window duplicated-span analysis — the token-level exact
  * substring dedup stage of a training-data pipeline (the "dedup
  * repeated 50-token spans" idea of Lee et al., Deduplicating Training
  * Data Makes Language Models Better, scaled to this corpus's 10-99
  * token documents). Complements l34: l34 removes block-ALIGNED
  * boilerplate segments (every 8-token block), l38 measures verbatim
  * overlap at EVERY token offset, which catches duplicated passages
  * that straddle block boundaries.
  *
  * Per document: how many of its k-token sliding windows also occur
  * verbatim in at least one OTHER document, and how many token
  * positions those duplicated windows cover (union of overlapping
  * [pos, pos+k) intervals — the number of tokens a span-dedup pass
  * would rewrite).
  *
  * Shape at 100 TB:
  *   - span stream is MAP-ONLY (transform over the token array; no
  *     explode-then-regroup), and what shuffles is the 32-hex md5 of
  *     each span, never the ~100-byte span text — the shuffle payload
  *     is fixed-width regardless of k;
  *   - document frequency is ONE span-key shuffle (partial counts
  *     map-side);
  *   - the flag-back join is an equi join on the same key, so it
  *     reuses the hash partitioning the aggregation just produced;
  *   - coverage union is computed INSIDE the per-doc aggregate
  *     (array_distinct over flattened [pos, pos+k) sequences, bounded
  *     by k · n_dup_spans per doc) — no second explode-shuffle, no
  *     window over a global sort.
  */
object Spans extends QueryModule {

  /** Span width in tokens. Production span dedup uses ~50; the
    * synthetic docs are 10-99 tokens, so 16 keeps multi-span overlap
    * structure (verified non-degenerate at all three SFs). */
  val SpanTokens = 16

  /** A span is "duplicated" when ≥ MinDocs distinct documents contain
    * it verbatim. */
  val MinDocs = 2

  /** The (doc_id, pos, h) sliding-span stream l38 shuffles — exposed so
    * specs measure the SAME frame the query uses. One row per k-token
    * window at every offset; h = md5 of the space-joined window. */
  private[graft] def spanStream(docs: DataFrame): DataFrame =
    Tables.spread(docs, "doc_id") // per-window md5 must not run single-split
      .select(col("doc_id"), split(col("text"), " ").as("a"))
      .filter(size(col("a")) >= SpanTokens)
      .select(col("doc_id"), posexplode(expr(
        s"""transform(sequence(0, size(a) - $SpanTokens),
           |          i -> md5(array_join(slice(a, i + 1, $SpanTokens), ' ')))""".stripMargin))
        .as(Seq("pos", "h")))

  def l38(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val spans = spanStream(docs)
    val dup = spans.groupBy("h")
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= MinDocs)
      .select(col("h"), lit(1).as("d"))
    val perDoc = spans.join(dup, Seq("h"), "left")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_spans"),
        sum(coalesce(col("d"), lit(0))).cast("long").as("n_dup_spans"),
        // union coverage of [pos, pos+k): dedupe the flattened position
        // sequences of the duplicated spans only (collect_list skips the
        // null branch of the `when`)
        size(array_distinct(flatten(collect_list(
          when(col("d") === 1, expr(s"sequence(pos, pos + ${SpanTokens - 1})"))))))
          .cast("long").as("n_dup_tokens"))
    docs
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_dup_spans"), lit(0L)).as("n_dup_spans"),
        coalesce(col("n_dup_tokens"), lit(0L)).as("n_dup_tokens"),
        (coalesce(col("n_dup_tokens"), lit(0L)).cast("double") / col("n_tokens"))
          .as("dup_ratio"))
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "l38_span_dedup" -> l38)

  val oracles: Map[String, String] = Map(
    "l38_span_dedup" ->
      s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS a FROM documents),
         |spans AS (
         |  SELECT doc_id, i AS pos,
         |         md5(array_to_string(list_transform(range(i + 1, i + 1 + $SpanTokens),
         |                                            j -> a[j]), ' ')) AS h
         |  FROM toks, LATERAL (SELECT unnest(range(0, len(a) - ${SpanTokens - 1})) AS i) t
         |  WHERE len(a) >= $SpanTokens),
         |dup AS (SELECT h FROM spans GROUP BY h
         |        HAVING COUNT(DISTINCT doc_id) >= $MinDocs),
         |flagged AS (
         |  SELECT s.doc_id, s.pos, CASE WHEN d.h IS NULL THEN 0 ELSE 1 END AS isdup
         |  FROM spans s LEFT JOIN dup d USING (h)),
         |perdoc AS (
         |  SELECT doc_id, COUNT(*) AS n_spans, SUM(isdup) AS n_dup_spans
         |  FROM flagged GROUP BY doc_id),
         |cov AS (
         |  SELECT doc_id, COUNT(DISTINCT tp) AS n_dup_tokens
         |  FROM (SELECT doc_id, unnest(range(pos, pos + $SpanTokens)) AS tp
         |        FROM flagged WHERE isdup = 1)
         |  GROUP BY doc_id)
         |SELECT d.doc_id,
         |       CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
         |       CAST(COALESCE(n_spans, 0) AS BIGINT) AS n_spans,
         |       CAST(COALESCE(n_dup_spans, 0) AS BIGINT) AS n_dup_spans,
         |       CAST(COALESCE(n_dup_tokens, 0) AS BIGINT) AS n_dup_tokens,
         |       CAST(COALESCE(n_dup_tokens, 0) AS DOUBLE)
         |         / len(string_split(d.text, ' ')) AS dup_ratio
         |FROM documents d
         |LEFT JOIN perdoc ON d.doc_id = perdoc.doc_id
         |LEFT JOIN cov ON d.doc_id = cov.doc_id
         |ORDER BY d.doc_id""".stripMargin)
}
