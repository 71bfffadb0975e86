package newspipe

import newspipe.functions.Keys
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** §5.5 plan-shape tests: the physical plans Catalyst picks for our operators
  * must be the ones the 100 TB design depends on — broadcast joins for dims,
  * parquet filter pushdown + column pruning, partition pruning on the silver
  * COUNTRY layout, and whole-stage codegen over the hot paths.
  */
class PlanSpec extends SparkTestBase {
  import spark.implicits._

  private def executed(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // force AQE to finalize the real plan
    df.queryExecution.executedPlan.toString
  }

  private lazy val parquetDir = {
    val dir = Files.createTempDirectory("plans").toString
    val df = (1 to 10000).map(i => (i.toLong, s"name$i", i % 50, s"C${i % 7}"))
      .toDF("id", "name", "bucket", "country")
    df.write.partitionBy("country").parquet(s"$dir/part")
    df.write.parquet(s"$dir/flat")
    dir
  }

  test("dim join is a BroadcastHashJoin, not a sort-merge shuffle") {
    val fact = spark.read.parquet(s"$parquetDir/flat")
    val dim = Seq((0, "d0"), (1, "d1")).toDF("bucket", "label")
    val plan = executed(fact.join(broadcast(dim), Seq("bucket")))
    plan should include("BroadcastHashJoin")
    plan should not include "SortMergeJoin"
  }

  test("filters and projection reach the parquet scan (PushedFilters + ReadSchema)") {
    val df = spark.read.parquet(s"$parquetDir/flat")
      .filter($"bucket" === 3).select("id", "bucket")
    val plan = df.queryExecution.executedPlan.toString
    plan should include("PushedFilters: [IsNotNull(bucket), EqualTo(bucket,3)]")
    // projection pruned to the 2 referenced columns — a scan reading `name`
    // for this query would be wrong
    plan should include("ReadSchema: struct<id:bigint,bucket:int>")
    plan should not include "name"
  }

  test("partition pruning: a country filter scans one partition directory") {
    val df = spark.read.parquet(s"$parquetDir/part").filter($"country" === "C3")
    val plan = df.queryExecution.executedPlan.toString
    plan should include("PartitionFilters: [isnotnull(country")
    df.count() shouldBe (1 to 10000).count(i => i % 7 == 3)
  }

  test("filtered vector search: the validation leg is ONE column-pruned, " +
      "predicate-pushed id scan of qualifying files — never a full-row " +
      "corpus read") {
    val dir = Files.createTempDirectory("plan_vidx").toString
    val lake = new newspipe.io.Lake(spark,
      newspipe.io.LakeConfig(basePath = dir))
    lake.writeAtomic((0 until 300).map(i => (i.toLong, s"payload$i" * 10,
        (0 until 8).map(j => (i * 31 + j) % 97 / 97.0 - 0.5).toArray))
      .toDF("vec_id", "big_payload", "vec")
      .repartitionByRange(3, $"vec_id").sortWithinPartitions("vec_id"),
      "emb")
    lake.createVectorIndex("emb", "idx", "vec", "vec_id")
    val queries = lake.read("emb").filter($"vec_id" < 3)
      .select("vec_id", "vec")
    val out = lake.vectorSearch("emb", queries, k = 3,
      filter = Some($"vec_id" % 2 === 0))
    val plan = executed(out)
    // the only data-file scan is the validation leg: pushed predicate,
    // schema pruned to the id + filter columns — big_payload and the
    // vectors themselves are never read from the corpus
    plan should include("PushedFilters: [IsNotNull(vec_id)")
    plan should include("ReadSchema: struct<vec_id:bigint>")
    plan should not include "big_payload"
    plan should not include "vec:array"
  }

  test("aggregation pipeline stays inside whole-stage codegen") {
    val df = spark.read.parquet(s"$parquetDir/flat")
      .groupBy("bucket").agg(sum("id").as("s"), count(lit(1)).as("n"))
    // the plan tree renders WholeStageCodegenExec spans as "*(n)" prefixes
    executed(df) should include("*(1) HashAggregate")
  }

  test("sentiment enrichment plans with no ScalaUDF node (native expression, no codegen barrier)") {
    val df = spark.read.parquet(s"$parquetDir/flat").withColumn("s",
      newspipe.functions.SentimentAnalyzer.sentiment($"name"))
    val plan = executed(df)
    plan should not include "ScalaUDF"
    // still fused into a WholeStageCodegen span
    plan should include("*(1)")
  }

  test("stacked cleaning pipeline (cleanText + gopherRules + langId) " +
      "fuses into one codegen stage with no ScalaUDF barrier") {
    val df = spark.read.parquet(s"$parquetDir/flat")
      .withColumn("clean", newspipe.ops.TextStats.cleanText($"name"))
      .withColumn("gopher", newspipe.ops.TextStats.gopherRules($"clean"))
      .withColumn("lang", newspipe.ops.TextStats.langId($"clean"))
    val plan = executed(df)
    // langId was the last ScalaUDF in this hot path (round 18): a UDF
    // here split the cleaning stage at a codegen barrier
    plan should not include "ScalaUDF"
    plan should include("*(1)")
  }

  test("native DQ dup detection: key-only aggregate + broadcast join back, no full-row shuffle") {
    import newspipe.dq.{DqConfig, NativeDq}
    val df = spark.read.parquet(s"$parquetDir/flat")
    val tagged = NativeDq.tag(df, DqConfig("t", uniqueKeys = Seq("bucket")))
    val plan = executed(tagged)
    // the full rows must not be window-shuffled; the dup-key set (≤ distinct
    // keys) joins back as a broadcast at runtime via AQE
    plan should not include "Window"
    plan should include("BroadcastHashJoin")
  }

  test("md5 surrogate keys add NO exchange (shuffle-free, unlike legacy row_number)") {
    val df = spark.read.parquet(s"$parquetDir/flat")
    val md5Plan = executed(df.withColumn("k", Keys.md5Key($"name")))
    md5Plan should not include "Exchange"
    val legacyPlan = executed(
      df.limit(100).withColumn("k", Keys.legacyRowNumberKey("name")))
    legacyPlan should include("Window") // documented single-partition cost
  }

  test("bucketed tables co-locate the join: sort-merge with NO exchange") {
    val a = (1 to 5000).map(i => (i.toLong, s"a$i")).toDF("id", "av")
    val b = (1 to 5000).map(i => (i.toLong, s"b$i")).toDF("id", "bv")
    a.write.bucketBy(8, "id").sortBy("id").mode("overwrite").saveAsTable("bt_a")
    b.write.bucketBy(8, "id").sortBy("id").mode("overwrite").saveAsTable("bt_b")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = executed(spark.table("bt_a").join(spark.table("bt_b"), "id"))
      plan should include("SortMergeJoin")
      // bucket layout satisfies the join's distribution — no repartitioning
      plan should not include "Exchange hashpartitioning"
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS bt_a")
      spark.sql("DROP TABLE IF EXISTS bt_b")
    }
  }

  test("top-k-per-group rank filter triggers WindowGroupLimit (partial limit before shuffle)") {
    import org.apache.spark.sql.expressions.Window
    val df = spark.read.parquet(s"$parquetDir/flat")
    val w = Window.partitionBy("bucket").orderBy(desc("id"))
    val topk = df.withColumn("rn", row_number().over(w)).filter($"rn" <= 3)
    // Spark's InferWindowGroupLimit rewrites this to a per-partition limit —
    // the property our ANN re-rank (bruteForceTopK/lshTopK/ivfTopK) relies
    // on to avoid materializing every scored pair through the shuffle
    executed(topk) should include("WindowGroupLimit")
  }

  test("join-form candidate pairs: ONE bucket shuffle, reused by both join inputs") {
    val docs = (1 to 300)
      .map(i => (i.toLong, s"doc text number ${i % 30} lorem ipsum dolor sit"))
      .toDF("doc_id", "text")
    val out = newspipe.ops.Dedup.simhashCandidates(docs, "doc_id", "text")
    val plan = executed(out)
    // the bucket aggregate is the only signature-side exchange; the second
    // join input must reuse it, not recompute signatures + reshuffle
    plan should include("ReusedExchange")
    // pairs stream row-parallel through the join — the memory-quadratic
    // single-row pair-array form (flatten(transform(...))) must be gone
    plan should not include "flatten"
  }

  test("as-of join: one keyed shuffle, never a single-partition window") {
    val l = (1 to 2000).map(i => (i.toLong % 50, i.toLong, s"l$i")).toDF("k", "ts", "lv")
    val r = (1 to 500).map(i => (i.toLong % 50, i.toLong * 3, s"r$i")).toDF("k", "ts", "rv")
    // AQE plan strings append the pre-adaptive "Initial Plan" — count
    // exchanges in the final section only
    val plan = executed(newspipe.ops.AsOfJoin.asOf(l, r, "k", "ts"))
      .split("== Initial Plan ==").head
    // the union side-tag plan must shuffle ONCE on the key and sort within
    // partitions — a global (un-keyed) window would single-partition at scale
    plan should include("Window")
    plan should not include "Exchange SinglePartition"
    plan.split("Exchange hashpartitioning").length - 1 shouldBe 1
  }

  test("range join plans as an equi-join on the bucket, not a nested loop") {
    val points = (1 to 5000).map(i => (i.toLong, i)).toDF("x", "pid")
    val ivs = (1 to 50).map(i => (i * 90L, i * 90L + 30L, i)).toDF("s", "e", "iid")
    val plan = executed(
      newspipe.ops.RangeJoin.intervalJoin(points, ivs, "x", "s", "e", 64L))
    // the naive BETWEEN theta-join shape Spark would pick on its own
    plan should not include "BroadcastNestedLoopJoin"
    plan should not include "CartesianProduct"
    (plan.contains("SortMergeJoin") || plan.contains("BroadcastHashJoin")) shouldBe true
  }

  test("broadcast top-k similarity plan has no shuffle before the per-query rank") {
    val emb = (1 to 500).map(i => (i.toLong, Seq.fill(8)((i % 13).toFloat)))
      .toDF("vec_id", "embedding")
    val out = newspipe.ops.Similarity.bruteForceTopK(
      emb.filter($"vec_id" < 3), emb, "vec_id", "embedding", k = 3)
    val plan = executed(out)
    plan should include("BroadcastNestedLoopJoin")
  }

  test("ANN LSH: bucket probe is a broadcast equi-join + WindowGroupLimit rank") {
    val emb = (1 to 500).map(i =>
      (i.toLong, Seq.tabulate(8)(j => ((i * 31 + j * 17) % 13 - 6).toFloat)))
      .toDF("vec_id", "embedding")
    val out = newspipe.ops.Similarity.lshTopK(
      emb.filter($"vec_id" < 3), emb, "vec_id", "embedding",
      dim = 8, k = 3, nbits = 6, probes = 2)
    val plan = executed(out)
    // the corpus is probed in place: signatures are a projection, the tiny
    // query×probe side broadcasts — a sort-merge join here would shuffle
    // the whole corpus payload on the bucket
    plan should include("BroadcastHashJoin")
    plan should not include "SortMergeJoin"
    // per-query re-rank keeps only k survivors before the window shuffle
    plan should include("WindowGroupLimit")
  }

  test("ANN IVF: cell probe is a broadcast equi-join + WindowGroupLimit rank") {
    val emb = (1 to 500).map(i =>
      (i.toLong, Seq.tabulate(8)(j => ((i * 31 + j * 17) % 13 - 6).toFloat)))
      .toDF("vec_id", "embedding")
    val out = newspipe.ops.Similarity.ivfTopK(
      emb.filter($"vec_id" < 3), emb, "vec_id", "embedding",
      k = 3, nlist = 8, nprobe = 2, sampleSize = 256)
    val plan = executed(out)
    plan should include("BroadcastHashJoin")
    plan should not include "SortMergeJoin"
    plan should include("WindowGroupLimit")
  }

  test("PQ/ADC: code scan broadcasts queries, no shuffle, no ScalaUDF") {
    val emb = (1 to 500).map(i =>
      (i.toLong, Seq.tabulate(8)(j => ((i * 31 + j * 17) % 13 - 6).toFloat)))
      .toDF("vec_id", "embedding")
    val cb = newspipe.ops.Pq.train(emb, "embedding", dim = 8, m = 2, k = 16,
      iters = 3)
    val encoded = newspipe.ops.Pq.encodeCorpus(emb, "embedding", cb)
    val out = newspipe.ops.Pq.adcTopK(emb.filter($"vec_id" < 3), encoded,
      "vec_id", "embedding", "pq_code", cb, k = 3)
    val plan = executed(out)
    // encode/LUT/ADC are native expressions in the corpus scan — a UDF
    // here would break whole-stage codegen on every corpus row
    plan should include("BroadcastNestedLoopJoin")
    plan should not include "ScalaUDF"
    plan should include("WindowGroupLimit")
  }

  test("IVF-PQ: cell equi-join broadcasts query probes; corpus leg carries no vectors") {
    val emb = (1 to 500).map(i =>
      (i.toLong, Seq.tabulate(8)(j => ((i * 31 + j * 17) % 13 - 6).toFloat)))
      .toDF("vec_id", "embedding")
    val cb = newspipe.ops.Pq.train(emb, "embedding", dim = 8, m = 2, k = 16,
      iters = 3)
    val out = newspipe.ops.Pq.ivfPqTopK(emb.filter($"vec_id" < 3), emb,
      "vec_id", "embedding", cb, k = 3, nlist = 8, nprobe = 2)
    val plan = executed(out)
    plan should include("BroadcastHashJoin")
    plan should not include "SortMergeJoin"
    plan should not include "ScalaUDF"
    plan should include("WindowGroupLimit")
    // the join's streamed (corpus) side projects id + cell + CODE only —
    // the float vector column must not survive into the join. AQE hides
    // its subtrees (AdaptiveSparkPlanExec / QueryStageExec expose the real
    // plan as a field, not a child), so walk them explicitly.
    def deepCollectBhj(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.joins.BroadcastHashJoinExec] = {
      val here = p match {
        case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec =>
          Seq(j)
        case _ => Nil
      }
      val kids = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          Seq(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          Seq(q.plan)
        case other => other.children
      }
      here ++ kids.flatMap(deepCollectBhj)
    }
    val joined = deepCollectBhj(out.queryExecution.executedPlan)
    joined should not be empty
    val j = joined.head
    val streamed = j.buildSide match {
      case org.apache.spark.sql.catalyst.optimizer.BuildRight => j.left
      case _ => j.right
    }
    val streamedCols = streamed.output.map(_.name)
    streamedCols should contain("__code")
    streamedCols should not contain "embedding"
  }

  test("exact dedup: hash aggregate with map-side partial combine, no window sort") {
    val df = spark.read.parquet(s"$parquetDir/flat")
    val plan = executed(newspipe.ops.Dedup.exact(df, "id", Seq("bucket")))
    // duplicates must collapse BEFORE the exchange: a partial_min aggregate
    // on the map side, then the final aggregate after one digest shuffle —
    // never a per-digest window sort of every duplicate row. (min over a
    // struct buffer isn't hash-aggregable, so the physical form is
    // SortAggregate — the load-bearing property is the partial phase)
    plan should include("partial_min")
    plan should include("SortAggregate")
    plan should not include "Window"
  }

  test("spanDedup: one source pass (checkpointed tokens), agg not window for first-occurrence") {
    val docs = (1 to 300).map(i => (i.toLong,
      s"tok${i % 40} " * 25)).toDF("doc_id", "text")
    docs.write.mode("overwrite").parquet(s"$parquetDir/docs")
    val src = spark.read.parquet(s"$parquetDir/docs")
    val plan = executed(newspipe.ops.Dedup.spanDedup(src, "doc_id", "text", 5))
    // the token stream is cut at a checkpoint: every branch reads the
    // materialized RDD, so the parquet source appears in NO branch (a
    // regression re-introduces 3 scan+tokenize passes)
    plan should not include "FileScan"
    // global first-occurrence is a hash aggregate (map-side combine over
    // hot chunks), never a per-chunk window sort
    plan should include("HashAggregate")
    plan should not include "Window"
  }

  test("knnJoin: checkpointed signatures; no cartesian/nested-loop pair generation") {
    val emb = (1 to 400).map(i =>
      (i.toLong, Seq.tabulate(8)(j => ((i * 31 + j * 17) % 13 - 6).toFloat)))
      .toDF("vec_id", "embedding")
    emb.write.mode("overwrite").parquet(s"$parquetDir/emb")
    val src = spark.read.parquet(s"$parquetDir/emb")
    val plan = executed(newspipe.ops.Similarity.knnJoin(
      src, "vec_id", "embedding", dim = 8, k = 3, nbits = 4, probes = 2))
    // candidates come from the bucket equi-join — an all-pairs plan here is
    // the O(n²) scale-killer this operator exists to avoid
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
    // signature stage is checkpointed: only the vector join-backs read the
    // source (2 scans pre-AQE; AQE's broadcast replan can render one of
    // them twice ⇒ 3). Without the checkpoint the signature pipeline
    // re-runs per branch and this jumps to 5+
    "FileScan".r.findAllMatchIn(plan).size should be <= 3
  }

  test("packBins/topFractionByGroup: per-group windows, never a single-partition sort") {
    val df = spark.read.parquet(s"$parquetDir/flat")
    val packed = executed(newspipe.ops.Sampling.packBins(
      df, "id", "bucket", budget = 500L, partitionCols = Seq("country")))
    packed should include("Window")
    packed should not include "SinglePartition" // grouped ⇒ no global sort
    val gated = executed(newspipe.ops.Sampling.topFractionByGroup(
      df, "country", "bucket", 0.5, "id"))
    gated should include("Window")
    gated should not include "SinglePartition"
  }

  test("approx top-fraction: one aggregate + broadcast threshold join, no window sort") {
    val df = spark.read.parquet(s"$parquetDir/flat")
    val plan = executed(newspipe.ops.Sampling.topFractionByGroupApprox(
      df, "country", "bucket", 0.5))
    // the scale path must not rank rows: threshold via mergeable sketch
    // aggregate, joined back as a broadcast dimension
    plan should not include "Window"
    plan should include("BroadcastHashJoin")
    plan should not include "SortMergeJoin"
  }

  test("bloomScrub: corpus pays the Bloom probe in the scan stage, no exchange before it") {
    val corpus = spark.read.parquet(s"$parquetDir/flat")
      .select($"id", $"name".as("text"))
    val reference = Seq((1L, "name1"), (2L, "name2")).toDF("id", "text")
    val plan = executed(newspipe.ops.Dedup.bloomScrub(
      corpus, reference, "id", "text", expectedItems = 10L))
    // the probe is a per-row filter: the only joins are the fp-sliver exact
    // verify and the final anti-join — never a corpus-wide sort-merge
    plan should not include "SortMergeJoin"
    plan should not include "CartesianProduct"
    // and it is the native broadcast-sketch expression, not a ScalaUDF
    plan should not include "ScalaUDF"
    plan should include("bloom_might_contain")
  }

  test("vocab: tf aggregate does map-side partial combine") {
    val docs = spark.read.parquet(s"$parquetDir/flat")
      .select($"id", $"name".as("text"))
    val plan = executed(newspipe.ops.TextStats.vocab(docs, "id", "text"))
    // two-phase hash aggregate: partial_count before the exchange
    plan should include("partial_count")
    plan should not include "Window"
  }

  test("frequentNgramsSketch: CMS probe filters BEFORE the ngram exchange") {
    val docs = spark.read.parquet(s"$parquetDir/flat")
      .select($"id", $"name".as("text"))
    val df = newspipe.ops.Boilerplate.frequentNgramsSketch(
      docs, "id", "text", n = 2, minDf = 2L)
    val plan = executed(df)
    // the plausibility probe must sit below the partial aggregate so only
    // sketch-plausible candidates cross the exchange — a post-shuffle probe
    // would ship the whole Zipf tail. Top-down plan print: the probe filter
    // appears AFTER (deeper than) the exchange line
    plan should include("partial_count")
    val exchangeIdx = plan.indexOf("Exchange")
    val probeIdx = plan.indexOf("cms_at_least")
    exchangeIdx should be >= 0
    probeIdx should be > exchangeIdx
    // native broadcast-sketch probe, not a ScalaUDF
    plan should not include "ScalaUDF"
    plan should not include "Window"
  }

  test("resampleToBudget: broadcast totals join + per-row filter, no window, no sort-merge") {
    val df = spark.read.parquet(s"$parquetDir/flat")
    val plan = executed(newspipe.ops.Sampling.resampleToBudget(
      df, "id", "bucket", "country", budgets = Map("C1" -> 100L)))
    plan should include("BroadcastHashJoin")
    plan should not include "SortMergeJoin"
    plan should not include "Window"
  }

  test("packSequences: ONE window then hash aggregate with partial combine, never two windows") {
    val df = spark.read.parquet(s"$parquetDir/flat")
      .select($"id", $"name".as("text"), $"bucket", $"country")
    val plan = executed(newspipe.ops.Sampling.packSequences(
      df, "id", "text", "bucket", budget = 500L,
      partitionCols = Seq("country")))
    // the packBins running sum is the only window; bin materialization is
    // an aggregate (map-side partial collect), not an ordered window walk
    // AQE prints the final plan plus an "== Initial Plan ==" echo — count
    // window nodes in the final section only
    val finalPlan = plan.split("== Initial Plan ==").head
    "Window \\[".r.findAllIn(finalPlan).length shouldBe 1
    plan should include("partial_count")
    plan should not include "SinglePartition"
  }

  test("CorpusDiff: one outer join on the id, no cartesian, no window") {
    val a = spark.read.parquet(s"$parquetDir/flat").select($"id", $"name".as("text"))
    val b = spark.read.parquet(s"$parquetDir/flat").select($"id", $"name".as("text"))
    val plan = executed(newspipe.ops.CorpusDiff.diff(a, b, "id", Seq("text")))
    plan should include("FullOuter")
    plan should not include "CartesianProduct"
    plan should not include "Window"
  }


  test("rollup/cube: ONE Expand + one partial-combined aggregate, never a union of aggregates") {
    val df = spark.read.parquet(s"$parquetDir/flat")
    val plan = executed(df.rollup($"country", $"bucket")
      .agg(count(lit(1)).as("n"), grouping_id().as("gid")))
    val finalPlan = plan.split("== Initial Plan ==").head
    "Expand".r.findAllIn(finalPlan).length shouldBe 1
    plan should include("partial_count")
    plan should not include "Union"
  }

  test("tfIdf: per-doc window prunes at rank<=k; tf and df aggregates partial-combine") {
    val docs = spark.read.parquet(s"$parquetDir/flat")
      .select($"id", concat_ws(" ", $"name", $"country").as("text"))
    val plan = executed(newspipe.ops.Retrieval.tfIdf(docs, "id", "text", k = 2))
    plan should include("partial_count")
    plan should include("Window")
    // the only single-partition stage allowed is the 1-row corpus-count
    // broadcast; the top-k window itself must partition by doc
    plan should include("windowspecdefinition(id#")
  }

  test("DSIR scoring: the ratio model rides a BroadcastHashJoin onto the token stream") {
    val docs = spark.read.parquet(s"$parquetDir/flat")
      .select($"id", concat_ws(" ", $"name", $"country").as("text"))
    val target = docs.filter($"id" % 5 === 0)
    val ratios = newspipe.ops.Dsir.logRatios(target, docs, "text", buckets = 64)
    val plan = executed(newspipe.ops.Dsir.importanceWeights(
      docs, "id", "text", ratios, buckets = 64))
    plan should include("BroadcastHashJoin")
  }

  test("PageRank round: rank-edge equi-join + partial-combined sum, lineage truncated to checkpoints") {
    val edges = (1L to 2000L).map(i => (i, i * 13 % 501)).toDF("src", "dst")
    val out = newspipe.ops.PageRank.pageRank(edges, iterations = 2)
    // the RETURNED frame is the checkpointed final round: a scan, not a
    // 2-round join tower (retry cost is one round, not the whole history)
    out.queryExecution.optimizedPlan.toString should include("LogicalRDD")
  }

  test("lake metadata statistics drive join planning: a small lake table " +
      "auto-broadcasts with NO hint, a large one does not") {
    import newspipe.io.{Lake, LakeConfig}
    val dir = Files.createTempDirectory("planstats").toString
    val lake = new Lake(spark, LakeConfig(basePath = dir))
    lake.writeAtomic(Seq((0L, "d0"), (1L, "d1")).toDF("bucket", "label"),
      "smalldim")
    lake.writeAtomic((1L to 60000L).map(i => (i % 50, s"big$i"))
      .toDF("bucket", "label"), "bigdim")
    val fact = spark.read.parquet(s"$parquetDir/flat")
      .withColumn("bucket", $"bucket".cast("long"))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // threshold between the two tables' exact byte sizes: the planner
      // must measure, not guess
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "65536")
      val smallPlan = executed(fact.join(lake.read("smalldim"), "bucket"))
      smallPlan should include("BroadcastHashJoin")
      val bigPlan = executed(fact.join(lake.read("bigdim"), "bucket"))
      bigPlan should include("SortMergeJoin")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("ANALYZE TABLE gives a stats-less layer the same exact-size join " +
      "planning (SQL-driven stats refresh -> auto-broadcast)") {
    import newspipe.io.{Lake, LakeConfig, LakeSql}
    val dir = Files.createTempDirectory("planstats3").toString
    // collectStats = false: no sidecar lands — the foreign-writer shape
    val statless = new Lake(spark,
      LakeConfig(basePath = dir, collectStats = false))
    statless.writeAtomic(Seq((0L, "d0"), (1L, "d1")).toDF("bucket", "label"),
      "smalldim")
    val lake = new Lake(spark, LakeConfig(basePath = dir))
    val fact = spark.read.parquet(s"$parquetDir/flat")
      .withColumn("bucket", $"bucket".cast("long"))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "65536")
      LakeSql.sql(spark,
        s"ANALYZE TABLE lake.`$dir`.smalldim COMPUTE STATISTICS")
      // fresh instance: the refreshed stats come off DISK, not a warm cache
      val lake2 = new Lake(spark, LakeConfig(basePath = dir))
      val plan = executed(fact.join(lake2.read("smalldim"), "bucket"))
      plan should include("BroadcastHashJoin")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("lake reads carry the manifest row count as plan-time cardinality " +
      "(CatalogStatistics -> CBO)") {
    import newspipe.io.{Lake, LakeConfig}
    import org.apache.spark.sql.NewspipeSqlBridge
    val dir = Files.createTempDirectory("planstats2").toString
    val lake = new Lake(spark, LakeConfig(basePath = dir))
    lake.writeAtomic((1L to 1234L).map(i => (i, s"t$i")).toDF("id", "text"),
      "counted")
    val prev = spark.conf.getOption("spark.sql.cbo.enabled")
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      val (_, rows) = NewspipeSqlBridge.planStatistics(lake.read("counted"))
      rows shouldBe Some(BigInt(1234L))
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.cbo.enabled", v)
      case None => spark.conf.unset("spark.sql.cbo.enabled")
    }
  }
}
