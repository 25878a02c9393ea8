package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.apache.spark.sql.functions._

import graft.operators.Ops

/** ScalaCheck properties over the ops kernel (SURVEY.md §5.3). Kept to a
  * small number of successful cases per property — each case runs real
  * Spark jobs. */
object OpsProps extends Properties("Ops") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = Sessions.local("4")
  import spark.implicits._

  private val wsGen: Gen[String] =
    Gen.listOf(Gen.oneOf("a", "bc", " ", "  ", "\t", "\n", "é", "x y"))
      .map(_.mkString)

  property("normalizeWs is idempotent and never leaves runs of spaces") =
    Prop.forAll(Gen.listOfN(12, wsGen)) { strs =>
      val df = strs.toDF("s")
      val once = df.select(Ops.normalizeWs($"s").as("t")).as[String].collect()
      val twice = once.toSeq.toDF("t").select(Ops.normalizeWs($"t")).as[String].collect()
      once.toSeq == twice.toSeq && once.forall(!_.contains("  ")) &&
        once.forall(s => s == s.trim)
    }

  property("batchAssign partitions every row into exactly one 1-based batch") =
    Prop.forAll(Gen.choose(1, 40), Gen.choose(1, 120)) { (n, rows) =>
      val df = (1 to rows).map(_.toLong).toDF("id")
      val out = Ops.batchAssign(df, $"id", n).select("id", "batch_id")
        .as[(Long, Long)].collect()
      val sizes = out.groupBy(_._2).view.mapValues(_.length).toMap
      out.length == rows &&
        sizes.keySet == (1L to ((rows + n - 1) / n).toLong).toSet &&
        sizes.values.forall(_ <= n) &&
        sizes.filter(_._1 < sizes.keySet.max).values.forall(_ == n)
    }

  property("dedupFirstWins is idempotent and keeps one row per key") =
    Prop.forAll(Gen.listOfN(30, Gen.zip(Gen.choose(1, 5), Gen.choose(1, 100)))) { pairs =>
      val df = pairs.map { case (k, v) => (k.toLong, v.toLong) }.toDF("k", "v")
      val once = Ops.dedupFirstWins(df, Seq("k"), Seq($"v", $"k"))
      val twice = Ops.dedupFirstWins(once, Seq("k"), Seq($"v", $"k"))
      val keys = pairs.map(_._1).distinct.size
      once.count() == keys && twice.exceptAll(once).isEmpty &&
        once.exceptAll(twice).isEmpty
    }

  property("seededTopN returns the same set for the same seed, sized min(n, rows)") =
    Prop.forAll(Gen.choose(1, 50), Gen.choose(0L, 1000L)) { (rows, seed) =>
      val df = (1 to rows).map(_.toLong).toDF("id")
      val a = Ops.seededTopN(df, "id", 10, seed).select("id").as[Long].collect().toSeq
      val b = Ops.seededTopN(df, "id", 10, seed).select("id").as[Long].collect().toSeq
      a == b && a.size == math.min(10, rows)
    }

  property("sortedDistinct output is sorted, unique, null-free") =
    Prop.forAll(Gen.listOfN(25, Gen.option(Gen.choose(1L, 20L)))) { vals =>
      val df = vals.toDF("k")
      val out = Ops.sortedDistinct(df, "k").as[Long].collect().toSeq
      out == out.sorted && out.distinct == out &&
        out.toSet == vals.flatten.toSet
    }

  property("clampedRunningBalance closed form == sequential Lindley fold") =
    Prop.forAll(Gen.listOfN(40,
      Gen.zip(Gen.choose(1, 4), Gen.choose(-50L, 50L)))) { rows =>
      val indexed = rows.zipWithIndex.map { case ((k, x), i) =>
        (k.toLong, i.toLong, x)
      }
      val df = indexed.toDF("k", "ord", "delta")
      val out = Ops.clampedRunningBalance(df, "k", Seq($"ord"), "delta", "bal")
        .select("k", "ord", "bal").as[(Long, Long, Long)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      // reference: per-key sequential fold B := max(0, B + x)
      indexed.groupBy(_._1).forall { case (_, seq) =>
        seq.sortBy(_._2).foldLeft((0L, true)) { case ((bal, ok), (k, ord, x)) =>
          val nb = math.max(0L, bal + x)
          (nb, ok && out((k, ord)) == nb)
        }._2
      }
    }

  property("firEwma == direct convolution of the trailing taps") =
    Prop.forAll(Gen.choose(1, 10), Gen.listOfN(30,
      Gen.zip(Gen.choose(1, 3), Gen.choose(0L, 1000L)))) { (nTaps, rows) =>
      val indexed = rows.zipWithIndex.map { case ((k, v), i) =>
        (k.toLong, i.toLong, v)
      }
      val df = indexed.toDF("k", "ord", "v")
      val out = Ops.firEwma(df, "k", Seq($"ord"), "v", nTaps, "e")
        .select("k", "ord", "e").as[(Long, Long, Long)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      indexed.groupBy(_._1).forall { case (_, seq) =>
        val ordered = seq.sortBy(_._2)
        ordered.indices.forall { i =>
          val expect = (0 until nTaps).map { tap =>
            val v = if (i - tap >= 0) ordered(i - tap)._3 else 0L
            v * (1L << (nTaps - 1 - tap))
          }.sum
          out((ordered(i)._1, ordered(i)._2)) == expect
        }
      }
    }
}
