package graft.core

import scala.collection.concurrent.TrieMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped memo for persisted derived artifacts (LSH band
  * indexes, IVF-PQ codes, phash tables): the persist-the-index-once
  * pattern SCALE.md prescribes, shared by every operator that probes a
  * corpus-scale index repeatedly.
  *
  * Keyed on the SparkSession OBJECT, not `System.identityHashCode` —
  * identity hashes can collide and, worse, an entry keyed by hash
  * outlives its stopped session and pins the session (via the cached
  * DataFrame) plus its persisted blocks for the JVM lifetime. Here a
  * session's entries die with it: a listener drops them on application
  * end, and every access additionally sweeps sessions whose
  * SparkContext is already stopped (covers a context that stopped
  * after the listener bus shut down). */
object SessionMemo {
  private val perSession =
    TrieMap[SparkSession, TrieMap[Any, DataFrame]]()

  private def sweepStopped(): Unit =
    perSession.keySet.foreach { k =>
      if (k.sparkContext.isStopped) perSession.remove(k)
    }

  /** Memoize `build` under (session, key); `key` should be a
    * namespaced tuple, e.g. `("dedup_band", dir, gram, k, bands)`. */
  def getOrElseUpdate(s: SparkSession, key: Any)(build: => DataFrame)
      : DataFrame = {
    sweepStopped()
    val m = perSession.getOrElseUpdate(s, {
      s.sparkContext.addSparkListener(new SparkListener {
        override def onApplicationEnd(
            e: SparkListenerApplicationEnd): Unit = {
          perSession.remove(s); ()
        }
      })
      TrieMap.empty[Any, DataFrame]
    })
    m.getOrElseUpdate(key, build)
  }

  // introspection hooks for specs (memoization/reuse assertions)
  private[graft] def remove(s: SparkSession, key: Any): Unit =
    perSession.get(s).foreach(_.remove(key))
  private[graft] def get(s: SparkSession, key: Any): Option[DataFrame] =
    perSession.get(s).flatMap(_.get(key))
  private[graft] def entryCount(s: SparkSession): Int =
    perSession.get(s).map(_.size).getOrElse(0)
  private[graft] def liveSessionCount: Int = {
    sweepStopped(); perSession.size
  }
}
