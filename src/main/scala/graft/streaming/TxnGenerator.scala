package graft.streaming

import graft.streaming.TxnEngine.{KeyValueOption, Txn}
import scala.util.Random

/** Deterministic transaction-workload generator — the analog of the
  * reference's TransactionGenerator (reference modules/core/.../
  * TransactionGenerator.scala:43-59: k random keys per txn, assert-absent,
  * update to `key + "_value"`), with a seed instead of a Kafka producer.
  */
object TxnGenerator {
  def generate(numTransactions: Int, keysPerTransaction: Int = 4,
      numKeys: Int = 1000000, seed: Long = 42L): Seq[Txn] = {
    val rnd = new Random(seed)
    (0 until numTransactions).map { i =>
      val keys = Seq.fill(keysPerTransaction)(
        f"key_${rnd.nextInt(numKeys)}%010d").distinct
      Txn(i.toLong,
        keys.map(k => KeyValueOption(k, None)),
        keys.map(k => KeyValueOption(k, Some(s"${k}_value"))))
    }
  }
}
