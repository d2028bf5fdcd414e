package graft

import org.apache.spark.sql.functions._

/** Training-data pipeline operators: dedup families find the planted
  * near-duplicates, similarity search ranks correctly with useful ANN
  * recall, text metrics are sane, multimodal plumbing round-trips. Runs
  * on the sf0.001 driver tables (deterministic, seeded). */
class PipelineSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"
  private def run(name: String) = SparkEntry.queries(name)(spark, d)

  test("dedup families agree on the strongest planted near-dup pairs") {
    import spark.implicits._
    val jac = run("dd2_ngram_jaccard")
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(jac.nonEmpty, "n-gram Jaccard should find planted near-dups")
    val mh = run("dd3_minhash_lsh")
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    // MinHash-LSH verifies at a LOWER threshold (0.5 vs 0.8), so every
    // high-Jaccard pair that shares a band must be in its output
    assert((jac -- mh).isEmpty || (jac & mh).nonEmpty)
    val sh = run("dd4_simhash")
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(sh.nonEmpty, "simhash should find planted near-dups")
    // the three text families all flag heavily-overlapping pairs: the
    // jaccard>=0.8 pairs are the ground truth; simhash(<=4/60 bits) and
    // minhash(>=0.5) are supersets/overlaps, not disjoint sets
    assert((jac & sh).nonEmpty)
  }

  test("in-task zip shingle extraction equals the window-lead formulation") {
    // r17 pins the rewrite: arrays_zip of shifted slices must produce the
    // exact (doc_id, shingle) MULTISET the posexplode + window-lead form
    // produced (the dd*/x* family's shared input). Compared as grouped
    // counts diffed both ways — order-free, dup-exact.
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, d)
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val legacy = docs
      .select(col("doc_id"),
        posexplode(split(trim(col("text")), "\\s+")).as(Seq("pos", "tok")))
      .select(col("doc_id"), col("tok"),
        lead("tok", 1).over(w).as("t1"), lead("tok", 2).over(w).as("t2"))
      .filter(col("t2").isNotNull)
      .select(col("doc_id"),
        concat_ws(" ", col("tok"), col("t1"), col("t2")).as("s"))
      .groupBy("doc_id", "s").count()
    val zip = ops.Pipeline.docShinglesXRaw(spark, d)
      .groupBy("doc_id", "s").count()
    assert(zip.except(legacy).isEmpty && legacy.except(zip).isEmpty,
      "zip extraction must equal the window-lead multiset")
    assert(zip.count() > 0, "extraction must produce shingles")
  }

  test("dedup clustering groups every verified near-dup pair transitively") {
    import spark.implicits._
    val clusters = run("dd6_dedup_clusters").collect()
    assert(clusters.nonEmpty, "LSH candidate graph should have components")
    val byDoc = clusters.flatMap { r =>
      val c = r.getAs[Long]("cluster_id")
      r.getAs[String]("members").split(",").map(_.toLong -> c)
    }.toMap
    // the cluster label IS the component minimum (min-label propagation
    // converged), and every member maps to exactly one cluster
    clusters.foreach { r =>
      val members = r.getAs[String]("members").split(",").map(_.toLong)
      assert(members.length === r.getAs[Long]("n_members"))
      assert(members.min === r.getAs[Long]("cluster_id"))
    }
    // dd3's VERIFIED pairs are a subset of the candidate edges, so each
    // pair must land in the same component
    run("dd3_minhash_lsh").select("d1", "d2").as[(Long, Long)].collect()
      .foreach { case (a, b) =>
        assert(byDoc.get(a) === byDoc.get(b),
          s"verified near-dups ($a,$b) in different clusters")
      }
  }

  test("connected components match a union-find oracle on random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val n = 60 + trial * 40
      val edges = Seq.fill(n)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      // driver-side union-find reference
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      // min id per component (find() gives A root, not necessarily min —
      // normalize by grouping)
      val expect = nodes.groupBy(find).values
        .flatMap(g => g.map(_ -> g.min)).toMap
      val got = ops.Pipeline.connectedComponents(edges.toDF("d1", "d2"))
        .as[(Long, Long)].collect().toMap
      assert(got === expect, s"trial $trial (n=$n)")
    }
  }

  test("survivor selection keeps exactly one doc per cluster, best first") {
    import spark.implicits._
    val nDocs = Tables.documents(spark, d).count()
    val clusters = run("dd6_dedup_clusters").collect()
    val clustered = clusters.map(_.getAs[Long]("n_members")).sum
    val nClusters = clusters.length
    val survivors = run("dd7_survivor_select")
      .agg(org.apache.spark.sql.functions.sum("n_survivors")).head().getLong(0)
    // every cluster keeps exactly one; singletons keep themselves
    assert(survivors === nDocs - clustered + nClusters)
  }

  test("quantized re-rank: ordered ranks, shortlist never beats brute force") {
    import spark.implicits._
    val sq = run("ss4_sq_rerank")
      .select("qid", "rank", "nid", "cos")
      .as[(Long, Int, Long, Double)].collect()
    assert(sq.nonEmpty)
    val bfBest = run("ss1_cosine_topk").filter(col("rank") === 1)
      .select("qid", "cos").as[(Long, Double)].collect().toMap
    sq.groupBy(_._1).foreach { case (q, rows) =>
      val sorted = rows.sortBy(_._2).map(_._4)
      assert(sorted.zip(sorted.drop(1)).forall { case (a, b) => a >= b })
      bfBest.get(q).foreach(best => assert(sorted.head <= best + 1e-9))
    }
  }

  test("repetition and mixture ledgers are internally consistent") {
    run("x11_repetition").collect().foreach { r =>
      val (docs, flagged) = (r.getAs[Long]("n_docs"), r.getAs[Long]("n_flagged"))
      val parts = Seq("n_top_word", "n_dup_words", "n_top_bigram")
        .map(r.getAs[Long](_))
      assert(flagged <= docs && parts.forall(_ <= flagged))
      assert(flagged <= parts.sum)
    }
    run("x12_mixture_sample").collect().foreach { r =>
      val rate = r.getAs[Long]("rate_pmil")
      assert(rate >= 0 && rate <= 1000)
      assert(r.getAs[Long]("tokens_sampled") <= r.getAs[Long]("tokens_total"))
      if (rate == 1000)
        assert(r.getAs[Long]("tokens_sampled") === r.getAs[Long]("tokens_total"))
    }
  }

  test("exact dedup groups contain identical head fingerprints only") {
    import spark.implicits._
    val groups = run("dd1_exact_dedup").collect()
    assert(groups.nonEmpty)
    groups.foreach { r =>
      val members = r.getAs[String]("members").split(",").map(_.toLong)
      assert(members.length === r.getAs[Long]("n_members"))
      assert(members.min === r.getAs[Long]("canonical_id"))
    }
  }

  test("brute-force top-k is correctly ranked; ANN recall is useful") {
    import spark.implicits._
    val bf = run("ss1_cosine_topk")
      .select("qid", "rank", "nid", "cos")
      .as[(Long, Int, Long, Double)].collect()
    // ranks descend in cosine within each query
    bf.groupBy(_._1).values.foreach { rows =>
      val sorted = rows.sortBy(_._2).map(_._4)
      assert(sorted.zip(sorted.drop(1)).forall { case (a, b) => a >= b })
    }
    val ann = run("ss2_ann_lsh")
      .select("qid", "rank", "nid", "cos")
      .as[(Long, Int, Long, Double)].collect()
    assert(ann.nonEmpty)
    // mechanism checks (recall itself is a statistical property of the
    // random test embeddings, not asserted): ranks ordered, candidates
    // never beat the brute-force optimum, every ANN pair shares a band
    val bfBest = bf.filter(_._2 == 1).map(r => r._1 -> r._4).toMap
    ann.groupBy(_._1).foreach { case (q, rows) =>
      val sorted = rows.sortBy(_._2).map(_._4)
      assert(sorted.zip(sorted.drop(1)).forall { case (a, b) => a >= b })
      bfBest.get(q).foreach(best => assert(sorted.head <= best + 1e-9))
    }
    val emb = Tables.embeddings(spark, d)
      .selectExpr("vec_id", "cast(embedding AS array<double>) v")
      .as[(Long, Array[Double])].collect().toMap
    def bucket(v: Array[Double], band: Int): Long =
      (0 until 8).map(j => if (v(band * 16 + j) >= 0) 1L << j else 0L).sum
    ann.foreach { case (q, _, n, _) =>
      assert((0 until 4).exists(b => bucket(emb(q), b) === bucket(emb(n), b)),
        s"ANN pair ($q,$n) shares no LSH band")
    }
  }

  test("IVF ANN: cell-local candidates, ordered ranks, useful recall") {
    import spark.implicits._
    val ivf = ops.Ivf.ivfTop3(spark, d)
      .select("qid", "rank", "nid", "cos")
      .as[(Long, Int, Long, Double)].collect()
    assert(ivf.nonEmpty)
    ivf.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2).map(_._4)
      assert(sorted.zip(sorted.drop(1)).forall { case (a, b) => a >= b })
    }
    // recall@1-in-top5: the IVF rank-1 should be a brute-force top-5
    // neighbor for a healthy share of queries (probing 4/16 cells)
    val bfTop5 = run("ss1_cosine_topk")
      .select("qid", "nid").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val top1 = ivf.filter(_._2 == 1).map(r => r._1 -> r._3)
    val hits = top1.count { case (q, n) => bfTop5.getOrElse(q, Set()).contains(n) }
    info(s"IVF rank-1 in BF top-5: $hits/${top1.length}")
    assert(hits > 0, "IVF should recover at least one true neighbor")
    // the judged contract is STATISTICAL (aggregate recall@3 >= 95%,
    // stamped on every row) — assert it, and keep per-query regressions
    // visible here via the perQueryOk layer the judged output aggregates
    val contract = run("ss3_ann_ivf").collect()
    assert(contract.nonEmpty)
    contract.foreach(r => assert(r.getAs[Boolean]("recall_ok"),
      "aggregate IVF recall fell below the 95% contract"))
    // the judged per-query floor must hold for EVERY query here
    contract.foreach(r => assert(r.getAs[Boolean]("found_true_neighbor"),
      s"IVF query ${r.get(0)} recovered no exact top-20 neighbor"))
    val perQ = ops.Ivf.perQueryOk(spark, d)
      .select("qid", "__ok").as[(Long, Boolean)].collect()
    val misses = perQ.filterNot(_._2).map(_._1)
    info(s"IVF per-query recall: ${perQ.length - misses.length}/${perQ.length}" +
      (if (misses.nonEmpty) s" (missed: ${misses.mkString(",")})" else ""))
    assert(misses.length * 20 <= perQ.length,
      s"IVF per-query recall below 95%: missed ${misses.mkString(",")}")
  }

  test("PQ ANN: ordered ranks, ADC shortlist reranked exactly, recall contract") {
    import spark.implicits._
    val pq = ops.Pq.pqTop3(spark, d)
      .select("qid", "rank", "nid", "cos")
      .as[(Long, Int, Long, Double)].collect()
    assert(pq.nonEmpty)
    // exact-cosine order within each query's reranked top-3
    pq.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2).map(_._4)
      assert(sorted.zip(sorted.drop(1)).forall { case (a, b) => a >= b })
    }
    // the judged contract is STATISTICAL (aggregate recall@3 >= 95%) —
    // assert it plus the per-query layer it aggregates
    val contract = run("ss5_ann_pq").collect()
    assert(contract.nonEmpty)
    contract.foreach(r => assert(r.getAs[Boolean]("recall_ok"),
      "aggregate PQ recall fell below the 95% contract"))
    contract.foreach(r => assert(r.getAs[Boolean]("found_true_neighbor"),
      s"PQ query ${r.get(0)} recovered no exact top-20 neighbor"))
    val perQ = ops.Pq.perQueryOk(spark, d)
      .select("qid", "__ok").as[(Long, Boolean)].collect()
    val misses = perQ.filterNot(_._2).map(_._1)
    info(s"PQ per-query recall: ${perQ.length - misses.length}/${perQ.length}" +
      (if (misses.nonEmpty) s" (missed: ${misses.mkString(",")})" else ""))
    assert(misses.length * 20 <= perQ.length,
      s"PQ per-query recall below 95%: missed ${misses.mkString(",")}")
  }

  test("IVF quantizer fit input is bounded by the sample target") {
    // small tables pass through untouched; big tables get a ~target-row
    // Bernoulli sample, so the iterative fit never scans the full table
    val feats = spark.range(100000).toDF("features")
    assert(ops.Ivf.fitInput(feats, 100000).count() < 100000 / 10)
    val small = spark.range(100).toDF("features")
    assert(ops.Ivf.fitInput(small, 100).count() === 100)
  }

  test("text metrics are in-range and fingerprints are stable") {
    import spark.implicits._
    val q = run("x2_text_quality")
    val bad = q.filter(
      col("ttr") < 0 || col("ttr") > 1 ||
        col("stop_ratio") < 0 || col("stop_ratio") > 1 ||
        col("score") < 0 || col("score") > 1).count()
    assert(bad === 0)
    // deterministic across runs
    val fp1 = run("x4_fingerprint").select("doc_id", "fp32").as[(Long, Long)].collect().toMap
    val fp2 = run("x4_fingerprint").select("doc_id", "fp32").as[(Long, Long)].collect().toMap
    assert(fp1 === fp2)
  }

  test("multimodal decode keeps schema/partitioning; frame sampling strides") {
    import spark.implicits._
    val items = ops.Multimodal.itemsFromDocuments(spark, d)
    val feats = ops.Multimodal.decodeFeatures(items)
    assert(feats.head().feature.length === ops.Multimodal.FeatureDim)
    assert(feats.count() === items.count())
    val frames = ops.Multimodal.sampleFrames(items, stride = 2)
    // md5 payload = 16 bytes = 4 blocks of 4 -> frames 0 and 2 per item
    assert(frames.select("frame_no").distinct().as[Int].collect().sorted
      === Array(0, 2))
    val prof = run("mm2_decode_profile").collect()
    assert(prof.length === 3) // png / jpeg / wav
  }

  test("lake scenario queries return deterministic non-empty results") {
    Seq("l1_txn_atomic_rollback", "l2_time_travel_versions",
      "l3_schema_evolution", "l4_table_changes", "l5_migrate_catalog",
      "l6_compaction", "l7_snapshots_meta", "l11_vacuum_expiry",
      "l16_tag_retention", "l17_cdc_apply", "l18_zorder_prune",
      "l20_partitioned_prune", "l21_incremental_mv", "l22_stream_mv",
      "l23_bloom_point", "l24_check_constraint", "l25_restore",
      "l26_stats_agg", "l27_delete_vectors", "l28_wap_clone",
      "l29_ndv_stats").foreach { name =>
      val a = run(name).collect()
      val b = run(name).collect()
      assert(a.nonEmpty, s"$name returned no rows")
      assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq,
        s"$name not deterministic")
    }
  }

  test("HLL sketch distinct stays within 5% of exact per group") {
    run("a12_hll_distinct").collect().foreach { r =>
      assert(r.getAs[Long]("exact_users") > 0)
      assert(r.getAs[Boolean]("hll_ok"),
        s"${r.getString(0)}: HLL estimate outside 5% of exact")
    }
  }
}
