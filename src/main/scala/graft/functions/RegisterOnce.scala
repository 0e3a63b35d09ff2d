package graft.functions

import org.apache.spark.sql.SparkSession

/** Per-session once-guard for SQL function registration. Query builders
  * call `X.register(spark)` defensively before constructing plans; without
  * a guard every re-registration logs `SimpleFunctionRegistry: function …
  * replaced`, which floods captured log tails on a 175-query sweep. Keyed
  * weakly by session so short-lived test sessions don't accumulate. */
private[graft] object RegisterOnce {
  private val done =
    new java.util.WeakHashMap[SparkSession, scala.collection.mutable.Set[String]]()

  def apply(spark: SparkSession, key: String)(body: => Unit): Unit =
    done.synchronized {
      val seen = done.computeIfAbsent(spark, _ => scala.collection.mutable.Set.empty)
      if (seen.add(key)) body
    }
}
