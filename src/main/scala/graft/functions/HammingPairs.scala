package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow

/** The d4 MIH bucket verifier (round-10 verdict item 3): given probe
  * rows `(bucket-index, probe-value, doc_id, h1..h4)` sorted by
  * (bucket-index, probe-value) within a partition, emit every unordered
  * pair of same-bucket occupants whose full 128-bit Hamming distance is
  * <= `radius`, as `(a_id, b_id, hamming)` rows with `a_id < b_id`.
  *
  * Why a sorted streaming pass over InternalRows and not the probe
  * self-join (or a groupBy+collect_list, or a typed mapPartitions): at
  * 500k docs the MIH equi-join's raw output is ~1.13e9 candidate rows of
  * which only ~25k pairs verify, so virtually all of the join's work is
  * constructing wide joined rows the Hamming filter drops (and the
  * self-join shuffles the 67.5M-row probe multiset twice); collect_list
  * devolves to sort-based aggregation building per-bucket object arrays
  * (measured 2x WORSE than the join); a Dataset[Tuple7] decode boxes 7
  * longs per probe row (~470M allocations). Here the exchange happens
  * once, the sort is Tungsten-native on two integer keys, fields read
  * straight out of reused UnsafeRows into primitive arrays, and the
  * 1.1e9 XOR+popcount pair probes cost a few ns each with zero
  * allocation for rejected pairs. The first two signature halves gate
  * the last two (`d12 > radius` skips the second pair of popcounts —
  * the cheap prefilter, free inside the loop).
  *
  * Per-bucket state is bounded by the largest bucket (measured max 188
  * occupants at 500k docs); the emit queue holds one bucket's verified
  * pairs at a time.
  */
object HammingPairs {

  /** mapPartitions body for InternalRows sorted by (bi, probe) with
    * schema (bi int, probe long, doc_id long, h1..h4 long).
    */
  def bucketPairs(it: Iterator[InternalRow], radius: Int)
      : Iterator[InternalRow] = new Iterator[InternalRow] {
    private var cap = 64
    private var ids = new Array[Long](cap)
    private var h1 = new Array[Long](cap); private var h2 = new Array[Long](cap)
    private var h3 = new Array[Long](cap); private var h4 = new Array[Long](cap)
    private var n = 0
    private var curBi = Int.MinValue
    private var curProbe = Long.MinValue
    private var started = false
    private val out = scala.collection.mutable.Queue.empty[InternalRow]

    private def grow(): Unit = {
      cap *= 2
      ids = java.util.Arrays.copyOf(ids, cap)
      h1 = java.util.Arrays.copyOf(h1, cap); h2 = java.util.Arrays.copyOf(h2, cap)
      h3 = java.util.Arrays.copyOf(h3, cap); h4 = java.util.Arrays.copyOf(h4, cap)
    }

    private def flush(): Unit = {
      var i = 0
      while (i < n) {
        var j = i + 1
        while (j < n) {
          val d12 = java.lang.Long.bitCount(h1(i) ^ h1(j)) +
            java.lang.Long.bitCount(h2(i) ^ h2(j))
          if (d12 <= radius) {
            val d = d12 + java.lang.Long.bitCount(h3(i) ^ h3(j)) +
              java.lang.Long.bitCount(h4(i) ^ h4(j))
            if (d <= radius && ids(i) != ids(j)) {
              val a = math.min(ids(i), ids(j))
              val b = math.max(ids(i), ids(j))
              out.enqueue(new GenericInternalRow(Array[Any](a, b, d.toLong)))
            }
          }
          j += 1
        }
        i += 1
      }
      n = 0
    }

    private def advance(): Unit =
      while (out.isEmpty && it.hasNext) {
        val r = it.next()
        val bi = r.getInt(0)
        val probe = r.getLong(1)
        if (!started || bi != curBi || probe != curProbe) {
          flush(); curBi = bi; curProbe = probe; started = true
        }
        if (n == cap) grow()
        ids(n) = r.getLong(2)
        h1(n) = r.getLong(3); h2(n) = r.getLong(4)
        h3(n) = r.getLong(5); h4(n) = r.getLong(6)
        n += 1
        if (!it.hasNext) flush()
      }

    override def hasNext: Boolean = { advance(); out.nonEmpty }
    override def next(): InternalRow = { advance(); out.dequeue() }
  }
}
