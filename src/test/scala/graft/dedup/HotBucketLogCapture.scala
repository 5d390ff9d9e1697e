package graft.dedup

/** Shared save/swap/restore harness for the [[Dedup.hotBucketLog]]
  * hook — the one place the capture pattern lives, so changes to the
  * hook's threading or scoping happen once. */
trait HotBucketLogCapture {

  /** Run `body` with the hot-bucket log captured; restores the previous
    * hook afterwards. Returns (result, captured lines). */
  def withLogCapture[A](body: => A): (A, Seq[String]) = {
    val logs = scala.collection.mutable.ArrayBuffer.empty[String]
    val old = Dedup.hotBucketLog
    Dedup.hotBucketLog = m => logs.synchronized { logs += m }
    try (body, logs.synchronized(logs.toSeq))
    finally Dedup.hotBucketLog = old
  }

  /** Run `body` with the hot-bucket log silenced (stress runs that
    * would otherwise spam stderr); restores the previous hook. */
  def withLogSilenced[A](body: => A): A = {
    val old = Dedup.hotBucketLog
    Dedup.hotBucketLog = _ => ()
    try body finally Dedup.hotBucketLog = old
  }
}
