package graft

import graft.ops.{DedupOps, SimilarityOps}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Test.{check, Parameters}

/** Adversarial/property correctness for the hash-family operators.
  *
  * The minhash/simhash/LSH DuckDB oracles are necessarily LOCKSTEP mirrors
  * (both engines evaluate the same hash definitions), so a shared
  * conceptual bug — a sketch that doesn't actually estimate what it
  * claims — would be invisible to the hash compare. These properties
  * check the sketches against their MATHEMATICAL ground truth on
  * generated corpora instead: estimates near exact values, distances
  * monotone in edit distance, recall against brute force.
  */
class HashFamilyPropertySpec extends SparkSpec {
  import spark.implicits._

  private val params = Parameters.default.withMinSuccessfulTests(4)

  /** Exact 3-gram shingle set, same construction as DedupOps.withShingles. */
  private def shingleSet(tokens: Seq[String]): Set[String] =
    tokens.sliding(3).map(_.mkString(" ")).toSet

  test("minhash-estimated Jaccard within 4-sigma of exact Jaccard (property)") {
    val numPerm = 64
    // One corpus of doc pairs with controlled shingle overlap per trial;
    // a SINGLE signatures job covers every pair.
    val prop = Prop.forAll(Gen.chooseNum(0L, 1000000L)) { seed =>
      val rnd = new scala.util.Random(seed)
      val pool = (0 until 200).map(i => s"t$i")
      // overlap fractions from disjoint to identical
      val fracs = Seq(0.0, 0.2, 0.4, 0.6, 0.8, 1.0)
      val pairs = fracs.zipWithIndex.map { case (f, i) =>
        val core = Seq.fill(30)(pool(rnd.nextInt(pool.size)))
        val tailLen = math.max(1, math.round(30 * (1 - f)).toInt)
        def tail() = Seq.fill(tailLen)(pool(rnd.nextInt(pool.size)))
        // Shared core + distinct tails: shingle overlap grows with f.
        val a = core ++ tail(); val b = core ++ tail()
        (2L * i, a, 2L * i + 1, b)
      }
      val corpus = pairs.flatMap { case (ia, a, ib, b) =>
        Seq((ia, a.mkString(" ")), (ib, b.mkString(" "))) }
        .toDF("doc_id", "text")
      val sigs = DedupOps.minhashSignatures(corpus, numPerm)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      pairs.forall { case (ia, a, ib, b) =>
        val (sa, sb) = (shingleSet(a), shingleSet(b))
        val exact = (sa intersect sb).size.toDouble / (sa union sb).size
        val est = (0 until numPerm).count(p =>
          sigs((ia, p.toLong)) == sigs((ib, p.toLong))).toDouble / numPerm
        val bound = 4 * math.sqrt(exact * (1 - exact) / numPerm) + 2.0 / numPerm
        math.abs(est - exact) <= bound
      }
    }
    val r = check(params, prop); assert(r.passed, r.status.toString)
  }

  test("simhash hamming is monotone in token-edit distance (property)") {
    val editLevels = Seq(0, 2, 12, 40)
    val nDocs = 24
    val docLen = 60
    val prop = Prop.forAll(Gen.chooseNum(0L, 1000000L)) { seed =>
      val rnd = new scala.util.Random(seed)
      val pool = (0 until 500).map(i => s"w$i")
      // (doc index, edit level, text); edits replace tokens with fresh ones
      val rows = (0 until nDocs).flatMap { d =>
        val base = Seq.fill(docLen)(pool(rnd.nextInt(pool.size)))
        editLevels.zipWithIndex.map { case (e, li) =>
          val idx = rnd.shuffle(base.indices.toList).take(e).toSet
          val edited = base.zipWithIndex.map { case (w, i) =>
            if (idx(i)) s"x${rnd.nextInt(100000)}" else w }
          (d.toLong, li.toLong, edited.mkString(" "))
        }
      }
      val sigs = rows.toDF("doc", "lvl", "text")
        .select(col("doc"), col("lvl"),
          graft.functions.native.simhash60(split(col("text"), " ", -1)).as("sig"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
      val meanByLvl = editLevels.indices.map { li =>
        (0 until nDocs).map(d =>
          hamming(sigs((d.toLong, 0L)), sigs((d.toLong, li.toLong)))).sum.toDouble / nDocs
      }
      // zero edits => identical fingerprint; means strictly separated
      // levels may tie by luck, so allow equality but require the trend
      meanByLvl.head == 0.0 &&
        meanByLvl.sliding(2).forall { case Seq(lo, hi) => lo <= hi + 0.5 } &&
        meanByLvl.last > meanByLvl(1)
    }
    val r = check(params, prop); assert(r.passed, r.status.toString)
  }

  /** Seeded clustered corpus: 8 tight clusters, small perturbations. */
  private def randomClustered(seed: Long, n: Int): org.apache.spark.sql.DataFrame = {
    val rnd = new scala.util.Random(seed)
    val centers = Array.fill(8, 64)(rnd.nextGaussian())
    (0L until n.toLong).map { i =>
      val c = centers((i % 8).toInt)
      (i, Array.tabulate(64)(d => (c(d) + 0.02 * rnd.nextGaussian()).toFloat), (i % 8).toInt)
    }.toDF("vec_id", "embedding", "label")
  }

  test("LSH recall vs brute-force ground truth on randomized corpora (property)") {
    val prop = Prop.forAll(Gen.chooseNum(0L, 1000000L)) { seed =>
      val emb = randomClustered(seed, 160)
      val truth = SimilarityOps.cosineTopK(emb, nQueries = 5, k = 5)
        .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
      val multi = SimilarityOps.lshTopKMultiProbe(emb, nQueries = 5, k = 5)
        .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
      val recall = (truth intersect multi).size.toDouble / truth.size
      // top-5 neighbors sit inside a tight cluster (cos >> 0.99); multi-
      // probe LSH must find most of them on any seed
      recall >= 0.6
    }
    val r = check(params, prop); assert(r.passed, r.status.toString)
  }

  test("paragraph dedup: kept segments are exactly the corpus' distinct segments (property)") {
    val prop = Prop.forAll(Gen.chooseNum(0L, 1000000L)) { seed =>
      val rnd = new scala.util.Random(seed)
      val sentences = (0 until 30).map(i => s"s$i w${rnd.nextInt(50)} w${rnd.nextInt(50)}")
      // random docs of 1-6 sentences, heavy cross-doc repetition
      val docs = (0L until 20L).map { d =>
        (d, Seq.fill(1 + rnd.nextInt(6))(sentences(rnd.nextInt(sentences.size)))
          .mkString(". "))
      }.toDF("doc_id", "text")
      val out = graft.ops.DedupOps.paragraphDedup(docs)
        .select("text_dedup").as[String].collect()
      val keptSegs = out.flatMap(_.split("\\. ")).toSeq
      val corpusSegs = docs.select("text").as[String].collect()
        .flatMap(_.split("\\. ")).filter(_.nonEmpty).distinct.toSeq
      // every distinct corpus segment survives exactly once, nothing else
      keptSegs.sorted == corpusSegs.sorted
    }
    val r = check(params, prop); assert(r.passed, r.status.toString)
  }

  test("decontamination: no survivor shares an n-gram with the benchmark (property)") {
    val n = 8
    val prop = Prop.forAll(Gen.chooseNum(0L, 1000000L)) { seed =>
      val rnd = new scala.util.Random(seed)
      val pool = (0 until 40).map(i => s"t$i")
      def sentence(len: Int) = Seq.fill(len)(pool(rnd.nextInt(pool.size)))
      // ids multiple of 50 are the benchmark slice; others get a 50%
      // chance of embedding a benchmark span (guaranteed contamination)
      val benchDocs = Seq(0L, 50L).map(d => (d, sentence(12)))
      val trainDocs = (1L until 30L).map { d =>
        val base = sentence(10 + rnd.nextInt(10))
        val doc = if (rnd.nextBoolean()) {
          val span = benchDocs(rnd.nextInt(2))._2.slice(0, n)
          base.take(5) ++ span ++ base.drop(5)
        } else base
        (d, doc)
      }
      val all = (benchDocs ++ trainDocs)
        .map { case (d, toks) => (d, toks.mkString(" "), "en", "s") }
        .toDF("doc_id", "text", "lang", "source")
      val kept = graft.ops.DedupOps.decontaminate(all, n)
        .select("doc_id").as[Long].collect().toSet
      val benchGrams = benchDocs.flatMap(_._2.sliding(n).map(_.mkString(" "))).toSet
      trainDocs.forall { case (d, toks) =>
        val contaminated = toks.sliding(n).exists(g => benchGrams(g.mkString(" ")))
        kept(d) == !contaminated
      }
    }
    val r = check(params, prop); assert(r.passed, r.status.toString)
  }

  test("winnow fingerprint never increases when text is extended (property)") {
    val gen = for {
      s <- Gen.listOfN(64, Gen.alphaNumChar).map(_.mkString)
      t <- Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
    } yield (s, t)
    val prop = Prop.forAll(gen) { case (s, t) =>
      // every window of s is a window of s+t, so the min can only go down
      graft.functions.Winnow60.fingerprint((s + t).getBytes("UTF-8")) <=
        graft.functions.Winnow60.fingerprint(s.getBytes("UTF-8"))
    }
    val r = check(Parameters.default.withMinSuccessfulTests(50), prop)
    assert(r.passed, r.status.toString)
  }
}
