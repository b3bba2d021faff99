package graft.functions

/** Misra-Gries frequent-items summary (the candidate generator behind
  * q196's two-phase exact heavy hitters). Classic guarantee: after one
  * pass with k counters over n items, every item with true count
  * > n/k is still present among the counters — each decrement round
  * removes k distinct item occurrences, so an item can be decremented
  * at most n/k times. The PropertySpec pins this superset property
  * under random data and random partition splits.
  */
object MisraGries {
  def candidates(it: Iterator[String], k: Int): Iterator[String] = {
    val m = scala.collection.mutable.HashMap.empty[String, Long]
    it.foreach { w =>
      if (m.contains(w)) m(w) += 1L
      else if (m.size < k) m(w) = 1L
      else {
        val dead = scala.collection.mutable.ArrayBuffer.empty[String]
        m.keysIterator.foreach { kw =>
          val c = m(kw) - 1L
          if (c == 0L) dead += kw else m(kw) = c
        }
        dead.foreach(m.remove)
      }
    }
    m.keysIterator
  }
}
