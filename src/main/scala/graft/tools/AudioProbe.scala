package graft.tools

import graft.operators.MultimodalOps.{AudioCodec, ImageCodec}

/** Pure-JVM (no Spark) thread-scaling probe for the WAV codec stages.
  *
  * The sf1 audit showed `multimodal_audio_meta` gaining almost nothing
  * from a 32-way repartition; this probe times encode and decode
  * separately at 1 and N threads on identical workloads, so the stage
  * whose throughput refuses to scale — a hidden global lock — is
  * isolated from Spark scheduling noise entirely.
  *
  * Usage: runMain graft.tools.AudioProbe [nDocs] [threads]
  */
object AudioProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(200000)
    val threads = args.lift(1).map(_.toInt).getOrElse(32)

    def docs(lo: Int, hi: Int): Iterator[ImageCodec.Doc] =
      (lo until hi).iterator.map(i => ImageCodec.Doc(i.toLong, i % 191))

    def timed(label: String)(work: => Unit): Double = {
      val t0 = System.nanoTime()
      work
      val s = (System.nanoTime() - t0) / 1e9
      println(f"$label%-28s $s%8.3f s  (${n / s / 1000}%8.1f kdoc/s)")
      s
    }

    def inThreads(k: Int)(stage: (Int, Int) => Unit): Unit = {
      // last thread takes the n % k remainder so single- and
      // multi-thread runs process identical workloads (throughput is
      // computed against the full n)
      val per = n / k
      val ts = (0 until k).map { t =>
        new Thread(() => stage(t * per,
          if (t == k - 1) n else (t + 1) * per))
      }
      ts.foreach(_.start()); ts.foreach(_.join())
    }

    println(AudioCodec.spiStatus)
    // warmup both stages (JIT + provider caches)
    AudioCodec.decodeBatch(AudioCodec.encodeBatch(docs(0, 5000))).foreach(_ => ())

    val enc1 = timed("encode 1 thread") {
      AudioCodec.encodeBatch(docs(0, n)).foreach(_ => ())
    }
    val encN = timed(s"encode $threads threads") {
      inThreads(threads)((lo, hi) =>
        AudioCodec.encodeBatch(docs(lo, hi)).foreach(_ => ()))
    }
    // pre-encode once so the decode timing is decode-only
    val blobs = AudioCodec.encodeBatch(docs(0, n)).toArray
    val dec1 = timed("decode 1 thread") {
      AudioCodec.decodeBatch(blobs.iterator).foreach(_ => ())
    }
    val decN = timed(s"decode $threads threads") {
      inThreads(threads)((lo, hi) =>
        AudioCodec.decodeBatch(blobs.iterator.slice(lo, hi)).foreach(_ => ()))
    }
    println(f"encode speedup ${enc1 / encN}%.1fx, decode speedup ${dec1 / decN}%.1fx")
  }
}
