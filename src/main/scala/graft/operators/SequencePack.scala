package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Concat-and-chunk sequence packing — the layout step that turns a
  * curated corpus into fixed-length training sequences: documents are
  * concatenated in id order and cut every `seqLen` tokens, so every
  * sequence is exactly full and a document may span a cut (the standard
  * GPT-style pretraining packing; cf. the `packing` step in published
  * LM data pipelines). Emits, per document, the sequence it starts in,
  * its token offset inside that sequence, and how many sequences it
  * spans — everything a shard writer needs to place the tokens.
  *
  * The global running token count is a DISTRIBUTED prefix sum, not a
  * single-partition window: range-partition by id, per-partition token
  * totals (one tiny job, ≤ #partitions rows), exclusive prefix offsets
  * broadcast as a map literal, then a per-partition cumulative window.
  * Wall-clock ∝ corpus/partitions at any scale; the only global stage
  * is the P-row offset collect. The partitioned frame is persisted so
  * the offsets job and the output job see ONE materialization (same
  * contract as the engine's zipWithIndex id assignment — a re-executed
  * non-deterministic source could otherwise shift rows between
  * partitions); the returned frame references the persisted input, so
  * one-shot callers get Spark's LRU eviction and long-lived callers can
  * unpersist through the lineage.
  */
object SequencePack {

  /** `tokenCol`: per-row token count expression (long). Output:
    * (id, n_toks, seq_id, seq_offset, seqs_spanned), ordered however the
    * consumer sorts it — seq ids are assigned by ascending `idCol`.
    *
    * `idCol` must be UNIQUE: it is the total order the concatenation is
    * defined over, and two rows sharing an id would get an arbitrary
    * relative placement (the within-partition window breaks the tie
    * nondeterministically). The engine's id assignment guarantees this
    * for its own tables; external frames dedupe first.
    */
  def pack(docs: DataFrame, idCol: String, tokenCol: Column,
           seqLen: Long): DataFrame = {
    require(seqLen > 0, s"pack: seqLen must be positive, got $seqLen")
    val s = docs.sparkSession
    val p = s.sparkContext.defaultParallelism
    // localCheckpoint, not persist (r19): the returned lazy plan
    // references this frame, so a persist could never be safely
    // unpersisted (the session-lifetime leak ADVICE r18 flagged in the
    // LM operators) — checkpoint blocks are owned by the frame and
    // reclaimed when it is GC'd. Also pins spark_partition_id() at one
    // materialization, exactly as the persist did.
    val ranged = docs
      .select(col(idCol), coalesce(tokenCol.cast("long"), lit(0L)).as("n_toks"))
      .repartitionByRange(p, col(idCol))
      .withColumn("pid", spark_partition_id())
      .localCheckpoint(true)
    val totals = ranged.groupBy("pid").agg(sum("n_toks").as("t")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = totals.scanLeft(0 -> 0L) {
      case ((_, acc), (pid, t)) => pid -> (acc + t)
    }.init.zip(totals).map { case ((_, off), (pid, _)) => pid -> off }.toMap
    val w = Window.partitionBy("pid").orderBy(col(idCol))
    ranged
      .withColumn("cum",
        sum("n_toks").over(w) + element_at(typedLit(offsets), col("pid")))
      .withColumn("start", col("cum") - col("n_toks"))
      .select(col(idCol), col("n_toks"),
        expr(s"start div $seqLen").as("seq_id"),
        (col("start") % seqLen).as("seq_offset"),
        when(col("n_toks") === 0, 0L)
          .otherwise(expr(s"(cum - 1) div $seqLen") - expr(s"start div $seqLen") + 1)
          .as("seqs_spanned"))
  }
}
