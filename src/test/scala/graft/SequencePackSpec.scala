package graft

import org.apache.spark.sql.functions._

import graft.operators.SequencePack

class SequencePackSpec extends SparkSpec {
  import spark.implicits._

  private def packAll(rows: Seq[(Long, Long)], seqLen: Long) = {
    val df = rows.toDF("id", "nt").repartition(7) // scatter before the range stage
    SequencePack.pack(df, "id", col("nt"), seqLen).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
  }

  test("packing is the exact global prefix sum across many partitions") {
    // 1000 docs with varying sizes — partition-count independent result
    val rows = (0L until 1000L).map(i => i -> (i % 37 + 1))
    val got = packAll(rows, seqLen = 64)
    var cum = 0L
    rows.foreach { case (id, nt) =>
      val start = cum
      cum += nt
      val exp = (id, nt, start / 64, start % 64,
        if (nt == 0) 0L else (cum - 1) / 64 - start / 64 + 1)
      assert(got(id.toInt) == exp, s"doc $id")
    }
  }

  test("documents are contiguous: each start = previous start + previous n_toks") {
    val rows = Seq(0L -> 10L, 1L -> 100L, 2L -> 1L, 3L -> 0L, 4L -> 55L)
    val got = packAll(rows, seqLen = 32)
    val starts = got.map(r => r._3 * 32 + r._4)
    rows.indices.drop(1).foreach { i =>
      assert(starts(i) == starts(i - 1) + rows(i - 1)._2)
    }
  }

  test("a doc larger than seqLen spans ceil-many sequences; empty docs span zero") {
    val got = packAll(Seq(0L -> 130L, 1L -> 0L, 2L -> 126L), seqLen = 64)
    assert(got(0) == ((0L, 130L, 0L, 0L, 3L)))  // tokens 0..129 → seqs 0,1,2
    assert(got(1) == ((1L, 0L, 2L, 2L, 0L)))    // zero-width at offset 130
    assert(got(2) == ((2L, 126L, 2L, 2L, 2L)))  // 130..255 → seqs 2,3
  }
}
