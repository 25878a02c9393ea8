package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier

/** Session extension registering the engine's native SQL functions.
  * Enable with `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`
  * or `.withExtensions(new GraftExtensions)`; after that
  * `SELECT cosine_sim(a.embedding, b.embedding)` works in plain SQL. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    Seq(CosineSim.registryEntry, Shingles.registryEntry, SimHash64.registryEntry,
        TextStats.registryEntry, JaroWinkler.registryEntry).foreach {
      case (name, info, builder) =>
        e.injectFunction((FunctionIdentifier(name), info, builder))
    }
  }
}
