package graft.operators

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph analytics over the relational star schema. The part↔supplier
  * bipartite graph (distinct lineitem pairs) is the edge list; l21's
  * label propagation already covers connected components, this module
  * adds the power-iteration family.
  *
  * The float-determinism trick is l26's: a node's per-edge contribution
  * is an INTEGER number of micro-units (round(1e12 / degree)), so the
  * gather is an order-independent BIGINT sum — mergeable across any
  * partitioning — and the final rank is one fixed-shape double
  * expression both engines evaluate identically. A full PageRank is
  * this plan iterated with the driver checking convergence (the l21
  * fixpoint pattern).
  */
object Graph extends QueryModule {

  /** g01: one PageRank power-iteration (damping 0.85) from the uniform
    * start over the undirected bipartite part↔supplier graph. Two
    * shuffles: the distinct edge list, then the gather groupBy per node
    * side; degrees ride along via equi-joins on the edge key (at scale:
    * the canonical vertex-cut gather — no driver collect anywhere). */
  def g01(spark: SparkSession, dir: String): DataFrame = {
    // scoped cache (three consumers: two degree aggs + the gather join);
    // released before returning — the small per-node result is
    // localCheckpoint-materialized so the returned plan doesn't read the
    // unpersisted edge table
    val edges = Tables.lineitem(spark, dir)
      .select(col("l_partkey").as("p"), col("l_suppkey").as("s"))
      .distinct()
      .cache()
    val pdeg = edges.groupBy("p").agg(count(lit(1)).as("pdeg"))
    val sdeg = edges.groupBy("s").agg(count(lit(1)).as("sdeg"))
    val n = pdeg.select(count(lit(1)).as("np"))
      .crossJoin(sdeg.select(count(lit(1)).as("ns")))
      .select((col("np") + col("ns")).as("n"))
    // units(u) = round(1e12 / deg(u)) — the integer image of 1/deg
    val withDeg = edges
      .join(pdeg, "p").join(sdeg, "s")
      .withColumn("punits", expr("CAST(round(1000000000000.0 / pdeg) AS BIGINT)"))
      .withColumn("sunits", expr("CAST(round(1000000000000.0 / sdeg) AS BIGINT)"))
    val toParts = withDeg.groupBy("p")
      .agg(sum("sunits").as("units"), first("pdeg").as("deg"))
      .select(lit("part").as("node_type"), col("p").as("node_id"),
        col("deg"), col("units"))
    val toSupps = withDeg.groupBy("s")
      .agg(sum("punits").as("units"), first("sdeg").as("deg"))
      .select(lit("supplier").as("node_type"), col("s").as("node_id"),
        col("deg"), col("units"))
    val out = toParts.unionByName(toSupps)
      .crossJoin(broadcast(n))
      // r1 = 0.15/N + 0.85 · (Σ units)/1e12 / N — identical FP shape in
      // the oracle; the sum is integer, so nothing is order-dependent
      .select(col("node_type"), col("node_id"), col("deg"),
        (lit(0.15) / col("n")
          + lit(0.85) * (col("units").cast("double") / lit(1000000000000.0))
            / col("n")).as("rank"))
      .orderBy("node_type", "node_id")
      .localCheckpoint()
    edges.unpersist(blocking = false)
    out
  }

  /** Full PageRank to convergence — g01's step iterated through the
    * graft.Fixpoint loop (localCheckpoint-truncated lineage, superseded
    * iterates unpersisted eagerly, driver sees only the convergence
    * counter). Library-level operator, not an oracled query: float
    * iteration count depends on tolerance, so it's spec-covered
    * (GraphSpec asserts rank-mass ≈ 1, convergence within maxIter, and
    * that no superseded checkpoint blocks stay persisted). Edge/degree
    * tables are computed once and released at the end; per iteration the
    * only shuffles are the gather groupBy and the (broadcast-joined)
    * rank refresh — the same shape a 1000-executor run wants. */
  def pageRank(spark: SparkSession, dir: String,
      maxIter: Int = 30, tol: Double = 1e-9): DataFrame = {
    val edges = Tables.lineitem(spark, dir)
      .select(col("l_partkey").as("p"), col("l_suppkey").as("s"))
      .distinct()
    // directed both ways over one node-id space: node = type|id
    val dir2 = edges.select(
        concat(lit("part|"), col("p")).as("src"),
        concat(lit("supplier|"), col("s")).as("dst"))
      .union(edges.select(
        concat(lit("supplier|"), col("s")).as("src"),
        concat(lit("part|"), col("p")).as("dst")))
      .localCheckpoint()
    val deg = dir2.groupBy("src").agg(count(lit(1)).as("deg")).localCheckpoint()
    val nNodes = deg.count()
    val init = deg.select(col("src").as("node"),
      lit(1.0 / nNodes).as("rank"), lit(Double.MaxValue).as("delta"))
    val (fin, _) = graft.Fixpoint.loop(init, maxIter) { cur =>
      val contrib = dir2.join(deg, "src")
        .join(cur.select(col("node").as("src"), col("rank")), "src")
        .groupBy("dst").agg(sum(col("rank") / col("deg")).as("gathered"))
      cur.select(col("node"), col("rank").as("prev"))
        .join(contrib.select(col("dst").as("node"), col("gathered")), Seq("node"), "left")
        .select(col("node"),
          (lit(0.15) / lit(nNodes.toDouble)
            + lit(0.85) * coalesce(col("gathered"), lit(0.0))).as("rank"),
          col("prev"))
        .select(col("node"), col("rank"), abs(col("rank") - col("prev")).as("delta"))
    } { next => next.filter(col("delta") > tol).count() }
    val out = fin.select(
        split(col("node"), "\\|").getItem(0).as("node_type"),
        split(col("node"), "\\|").getItem(1).as("node_id"),
        col("rank"))
      .orderBy("node_type", "node_id")
      .localCheckpoint()
    Seq(fin, dir2, deg).foreach(graft.Fixpoint.release)
    out
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "g01_pagerank_step" -> g01)

  val oracles: Map[String, String] = Map(
    "g01_pagerank_step" ->
      """WITH edges AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem),
        |pdeg AS (SELECT p, COUNT(*) AS pdeg FROM edges GROUP BY p),
        |sdeg AS (SELECT s, COUNT(*) AS sdeg FROM edges GROUP BY s),
        |n AS (SELECT (SELECT COUNT(*) FROM pdeg) + (SELECT COUNT(*) FROM sdeg) AS n),
        |wd AS (
        |  SELECT e.p, e.s, pdeg.pdeg, sdeg.sdeg,
        |         CAST(round(1000000000000.0 / pdeg.pdeg) AS BIGINT) AS punits,
        |         CAST(round(1000000000000.0 / sdeg.sdeg) AS BIGINT) AS sunits
        |  FROM edges e JOIN pdeg ON e.p = pdeg.p JOIN sdeg ON e.s = sdeg.s),
        |gathered AS (
        |  SELECT 'part' AS node_type, p AS node_id,
        |         MIN(pdeg) AS deg, CAST(SUM(sunits) AS BIGINT) AS units
        |  FROM wd GROUP BY p
        |  UNION ALL
        |  SELECT 'supplier' AS node_type, s AS node_id,
        |         MIN(sdeg) AS deg, CAST(SUM(punits) AS BIGINT) AS units
        |  FROM wd GROUP BY s)
        |SELECT node_type, node_id, deg,
        |       0.15 / n.n + 0.85 * (CAST(units AS DOUBLE) / 1000000000000.0) / n.n
        |         AS rank
        |FROM gathered, n ORDER BY node_type, node_id""".stripMargin)
}
