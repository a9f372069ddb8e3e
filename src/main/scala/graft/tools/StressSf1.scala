package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sf1 STRESS EVIDENCE (VERDICT r11 #6): scale the driver's sf0.1
  * tables 10× and measure the heavy queries' wall + shuffle bytes, so
  * the "would it survive 100 TB" audits carry a measured scaling point
  * instead of argument alone. Results land under a `"sf1"` section in
  * `bench_full.json` (graft.Bench preserves it across its own rewrites).
  *
  * Scaling: 10 id-shifted copies of every FACT table (each copy's keys
  * shift by copy × ceilPow10(max+1), so referential integrity holds
  * copy-locally and entity counts scale 10×); the `region`/`nation`
  * dimensions stay as-is (10× customers across the same nations — the
  * realistic shape). `embeddings` copies land entirely on the corpus
  * side (vec_id ≥ base > 5), so ANN queries keep their 5 probes against
  * a 10× corpus.
  *
  * CONTENT perturbation (the duplication trap): naive copies give
  * every document 9 EXACT clones, so similarity joins see candidate
  * groups 10× deeper and go quadratic on an artifact of the scaler,
  * not a property of scale (first run measured l2q at 40× for 10×
  * rows). Real 10× corpora are 10× mostly-distinct content. So copy
  * i > 0 Caesar-shifts [a-z0-9] in `text` (length, token boundaries,
  * and INTRA-copy duplicate structure preserved exactly — each copy
  * still carries sf0.1's own near-dup pairs) and rotates `embedding`
  * dimensions (norms preserved, cross-copy cosine decorrelated). This
  * is a STRESS INPUT, clearly labeled — the correctness gate still
  * runs only on the driver's own parquet.
  *
  * Run: `SPARK_GRAFT_CPUS=16 scripts/run.sh graft.tools.StressSf1`. */
object StressSf1 {

  /** The measured set: the sf0.1 top of `bench_full.json` plus the
    * VERDICT-named Holt fold and a store capstone (its 10× ingest
    * pipeline is timed separately, like Bench's pipelines section). */
  val Heavy: Seq[String] = Seq(
    "er_fs_value_link", "l2q_setsim_join", "contrastive_manifest",
    "l2b_minhash_pairs", "corpus_refresh", "mix_dsir", "w10_gap_fill",
    "g9_kcore", "w15_holt", "capstone_ingest_store")

  private def ceilPow10(n: Long): Long = {
    var p = 1L
    while (p <= n) p *= 10L
    p
  }

  /** Fact-table id columns to shift per copy (FK columns shift by the
    * REFERENCED table's base so joins stay copy-local). */
  private def shiftPlan(spark: SparkSession, src: String)
      : Map[String, Seq[(String, Long)]] = {
    def base(table: String, col0: String): Long = {
      val m = spark.read.parquet(s"$src/$table.parquet")
        .agg(max(col(col0))).head().getLong(0)
      ceilPow10(m + 1)
    }
    val cust = base("customer", "c_custkey")
    val ord = base("orders", "o_orderkey")
    val part = base("part", "p_partkey")
    val supp = base("supplier", "s_suppkey")
    val evId = base("events", "event_id")
    val user = {
      val m = spark.read.parquet(s"$src/events.parquet")
        .agg(max(col("user_id"))).head().getLong(0)
      ceilPow10(m + 1)
    }
    val doc = base("documents", "doc_id")
    val vec = base("embeddings", "vec_id")
    Map(
      "customer" -> Seq("c_custkey" -> cust),
      "orders" -> Seq("o_orderkey" -> ord, "o_custkey" -> cust),
      "lineitem" -> Seq("l_orderkey" -> ord, "l_partkey" -> part,
        "l_suppkey" -> supp),
      "part" -> Seq("p_partkey" -> part),
      "supplier" -> Seq("s_suppkey" -> supp),
      "events" -> Seq("event_id" -> evId, "user_id" -> user),
      "documents" -> Seq("doc_id" -> doc),
      "embeddings" -> Seq("vec_id" -> vec))
  }

  def buildSf1(spark: SparkSession, src: String, dst: String,
      copies: Int = 10): Unit = {
    val done = java.nio.file.Paths.get(dst, "_SUCCESS_SF1")
    if (java.nio.file.Files.exists(done)) return
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dst))
    val plan = shiftPlan(spark, src)
    // dimensions copy through unscaled
    Seq("region", "nation").foreach { t =>
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$dst/$t.parquet")
    }
    val alpha = ('a' to 'z').mkString + ('0' to '9').mkString
    def shifted(i: Int): String = {
      val n = alpha.length
      alpha.indices.map(j => alpha((j + i) % n)).mkString
    }
    plan.foreach { case (t, shifts) =>
      val df = spark.read.parquet(s"$src/$t.parquet")
      (0 until copies).map { i =>
        val idShifted = shifts.foldLeft(df) { case (d, (c, b)) =>
          d.withColumn(c, col(c) + lit(i.toLong * b))
        }
        val contentShifted =
          if (i == 0) idShifted
          else if (t == "documents")
            idShifted.withColumn("text",
              translate(col("text"), alpha, shifted(i)))
          else if (t == "embeddings")
            idShifted.withColumn("embedding",
              concat(slice(col("embedding"), i + 1, 64 - i),
                slice(col("embedding"), 1, i)))
          else idShifted
        contentShifted
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$dst/$t.parquet")
    }
    java.nio.file.Files.write(done, Array.emptyByteArray)
  }

  def main(args: Array[String]): Unit = {
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val dst = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR", "/tmp/graft_sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tBuild0 = System.nanoTime()
    buildSf1(spark, src, dst)
    val buildSec = (System.nanoTime() - tBuild0) / 1e9
    val rows = Seq("lineitem", "events", "documents", "embeddings").map(t =>
      t -> spark.read.parquet(s"$dst/$t.parquet").count()).toMap
    // Bench's listener shape: per-query deltas of shuffle/spill/cpu
    val mShufRead = new java.util.concurrent.atomic.AtomicLong
    val mShufWrite = new java.util.concurrent.atomic.AtomicLong
    val mSpillDisk = new java.util.concurrent.atomic.AtomicLong
    val mCpuNs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          mShufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          mShufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          mSpillDisk.addAndGet(m.diskBytesSpilled)
          mCpuNs.addAndGet(m.executorCpuTime)
        }
      }
    })
    def snap(): Array[Long] = {
      try org.apache.spark.graft.ListenerBridge.drain(spark.sparkContext)
      catch { case _: Throwable => () }
      Array(mShufRead.get, mShufWrite.get, mSpillDisk.get, mCpuNs.get / 1000000L)
    }
    // two runs, keep the faster (Bench's own policy, same reason: this
    // host's vCPUs are overcommitted and a single measurement randomly
    // inflates several-fold under steal bursts — a one-shot sf1 number
    // can read as a fake 2× regression of unchanged code). Bytes come
    // from the kept run, so wall and shuffle accounting stay paired.
    val results = Heavy.map { name =>
      val fn = graft.SparkEntry.queries(name)
      def once(): (Option[Double], Array[Long]) = {
        val before = snap()
        val t0 = System.nanoTime()
        val wall = try {
          fn(spark, dst).write.format("noop").mode("overwrite").save()
          Some((System.nanoTime() - t0) / 1e9)
        } catch { case e: Throwable =>
          System.err.println(s"[sf1] $name failed: ${e.getMessage}")
          None
        }
        val after = snap()
        (wall, after.zip(before).map { case (a, b) => a - b })
      }
      // side-effectful pipelines (store builds) replay as no-ops —
      // a second run would measure the replay guard, not the work
      val rerunnable = name != "capstone_ingest_store"
      val first = once()
      val (wall, delta) = if (first._1.isEmpty || !rerunnable) first else {
        val second = once()
        if (second._1.exists(s => first._1.exists(s < _))) second else first
      }
      System.err.println(f"[sf1] $name%-24s ${wall.getOrElse(-1.0)}%8.2f s  " +
        f"shufR=${delta(0) / 1048576}%6d MiB  cpu=${delta(3) / 1000}%6d s*ms")
      (name, wall, delta)
    }
    def jq(s: String) = "\"" + s + "\""
    def fmt(d: Double) = f"$d%.2f"
    val qJson = results.map { case (n, w, _) =>
      s"${jq(n)}:${w.map(fmt).getOrElse("null")}" }.mkString("{", ",", "}")
    val bJson = results.map { case (n, _, d) =>
      s"${jq(n)}:[${d.mkString(",")}]" }.mkString("{", ",", "}")
    val rJson = rows.toSeq.sortBy(_._1)
      .map { case (t, n) => s"${jq(t)}:$n" }.mkString("{", ",", "}")
    val total = results.flatMap(_._2).sum
    val section =
      s"""{"total":${fmt(total)},"build_sec":${fmt(buildSec)},"rows":$rJson,""" +
        s""""queries":$qJson,"bytes":$bJson}"""
    // splice into bench_full.json under "sf1" (replace an existing one)
    val p = java.nio.file.Paths.get("bench_full.json")
    if (java.nio.file.Files.exists(p)) {
      val old = new String(java.nio.file.Files.readAllBytes(p), "UTF-8").trim
      val stripped = BenchJson.removeSection(old, "sf1")
      val merged = stripped.stripSuffix("}") + s""","sf1":$section}"""
      java.nio.file.Files.write(p, merged.getBytes("UTF-8"))
      System.err.println("[sf1] bench_full.json updated")
    }
    println(s"""{"metric":"sf1_total","value":${fmt(total)},"unit":"sec","queries":$qJson,"sf":"1.0-scaled"}""")
    spark.stop()
  }
}

/** Tiny brace-balanced JSON section surgery shared by Bench (preserve
  * the sf1 section across full-bench rewrites) and StressSf1 (replace
  * it) — the artifact is a handcrafted single line, not parsed JSON. */
object BenchJson {
  /** Extract `"name":{...}` (balanced) from a JSON object string. */
  def extractSection(json: String, name: String): Option[String] = {
    val key = s""""$name":"""
    val i = json.indexOf(key)
    if (i < 0) return None
    val start = i + key.length
    if (start >= json.length || json.charAt(start) != '{') return None
    var depth = 0
    var j = start
    var inStr = false
    while (j < json.length) {
      val c = json.charAt(j)
      if (inStr) { if (c == '\\') j += 1 else if (c == '"') inStr = false }
      else c match {
        case '"' => inStr = true
        case '{' => depth += 1
        case '}' =>
          depth -= 1
          if (depth == 0) return Some(json.substring(start, j + 1))
        case _ => ()
      }
      j += 1
    }
    None
  }

  /** Remove `,"name":{...}` / `"name":{...},` from a JSON object string. */
  def removeSection(json: String, name: String): String =
    extractSection(json, name) match {
      case None => json
      case Some(sec) =>
        val whole = s""""$name":$sec"""
        val i = json.indexOf(whole)
        val before = json.substring(0, i)
        val after = json.substring(i + whole.length)
        if (before.endsWith(",")) before.dropRight(1) + after
        else if (after.startsWith(",")) before + after.drop(1)
        else before + after
    }
}
