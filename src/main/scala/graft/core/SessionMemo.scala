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
    * namespaced tuple, e.g. `("dedup_band", dir, gram, k, bands)`.
    *
    * Race-safe under concurrent gate evaluation (a scenario the repo
    * supports via `Tables.invocationSuffix`): `TrieMap.getOrElseUpdate`
    * may run its by-name default in two threads at once, so both the
    * per-session map and the per-key entry are installed with
    * `putIfAbsent` — the eviction listener is registered only by the
    * thread whose map won, and a losing builder's `.persist()`ed frame
    * is unpersisted instead of leaking cached blocks for the session
    * lifetime. */
  def getOrElseUpdate(s: SparkSession, key: Any)(build: => DataFrame)
      : DataFrame = {
    sweepStopped()
    val m = perSession.get(s).getOrElse {
      val fresh = TrieMap.empty[Any, DataFrame]
      perSession.putIfAbsent(s, fresh) match {
        case None =>
          s.sparkContext.addSparkListener(new SparkListener {
            override def onApplicationEnd(
                e: SparkListenerApplicationEnd): Unit = {
              perSession.remove(s); ()
            }
          })
          fresh
        case Some(existing) => existing
      }
    }
    m.get(key).getOrElse {
      val built = build
      m.putIfAbsent(key, built) match {
        case None => built
        case Some(winner) =>
          try built.unpersist() catch { case _: Exception => () }
          winner
      }
    }
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
