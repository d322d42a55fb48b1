package graft.tools

import org.apache.spark.sql.SparkSession
import graft.operators.Dedup

/** Scratch profiler for the dedup hot paths (not part of the API). */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    time("warm read")(docs.count())
    val sig = Dedup.minhashSignatures(docs, "text", "doc_id")
    time("minhash signatures")(sig.count())
    val pairs = Dedup.minhashPairs(docs, "text", "doc_id", threshold = 0.5)
    val n = time("minhash pairs total")(pairs.count())
    println(s"[profile] minhash pair count = $n")
    val sh = Dedup.simhash(docs, "text", "doc_id")
    time("simhash signatures")(sh.count())
    val shp = Dedup.simhashPairs(docs, "text", "doc_id", maxDistance = 3)
    println(s"[profile] simhash pair count = " + time("simhash pairs total")(shp.count()))

    // simhash stage isolation
    {
      import org.apache.spark.sql.functions._
      val toks = docs.select(col("doc_id").as("__id"), col("text").as("__text"))
        .repartition(col("__id"))
        .select(col("__id"), explode(split(regexp_replace(lower(trim(col("__text"))), "\\s+", " "), " ")).as("__tok"))
      time("sim: explode tokens")(println("[profile] tokens = " + toks.count()))
      time("sim: + xxhash64")(toks.select((xxhash64(col("__tok")) % 1000).as("h")).agg(sum("h")).collect())
      time("sim: + hash60")(toks.select((Dedup.hash60(col("__tok")) % 1000).as("h")).agg(sum("h")).collect())
      time("sim: + hash60 groupBy sum")(toks.select(col("__id"), (Dedup.hash60(col("__tok")) % 1000).as("h")).groupBy("__id").agg(sum("h")).count())
      time("sim: full simhash again")(Dedup.simhash(docs, "text", "doc_id").count())
      time("sim: full simhash 3rd")(Dedup.simhash(docs, "text", "doc_id").count())
    }

    val ng = Dedup.ngramJaccardPairs(docs, "text", "doc_id", threshold = 0.4, n = 3)
    val n2 = time("ngram jaccard total")(ng.count())
    println(s"[profile] ngram pair count = $n2")

    // ngram internals
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val threshold = 0.4
    val d2 = docs.select(col("doc_id").as("__id"), col("text").as("__text"))
      .repartition(col("__id"))
      .select(col("__id"),
        col("__text"))
      .select(col("__id"), Dedup.shingles(col("__text"), 3).as("__g"))
      .filter(size(col("__g")) > 0).cache()
    time("ngram: docs arrays")(d2.count())
    val grams = d2.select(col("__id"), size(col("__g")).as("__sz"),
      explode(col("__g")).as("__gram"))
    time("ngram: grams explode")(grams.count())
    val freq = grams.groupBy(col("__gram")).agg(count(lit(1)).as("__df"))
    val w = Window.partitionBy(col("__id")).orderBy(col("__df"), col("__gram"))
    val prefix = grams.join(freq, "__gram")
      .withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= col("__sz") - ceil(lit(threshold) * col("__sz")) + 1)
      .select(col("__id"), col("__gram"), col("__rank"), col("__sz")).cache()
    time("ngram: prefix rows")(println("[profile] prefix rows = " + prefix.count()))
    val reqOverlap = lit(threshold / (1 + threshold)) * (col("a.__sz") + col("b.__sz"))
    val cand = prefix.as("a")
      .join(prefix.as("b"),
        col("a.__gram") === col("b.__gram") && col("a.__id") < col("b.__id") &&
          col("b.__sz") >= lit(threshold) * col("a.__sz") &&
          col("a.__sz") >= lit(threshold) * col("b.__sz") &&
          (lit(1) + least(col("a.__sz") - col("a.__rank"),
            col("b.__sz") - col("b.__rank"))) >= reqOverlap)
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"))
    time("ngram: cand raw")(println("[profile] cand raw = " + cand.count()))
    val candD = cand.distinct()
    time("ngram: cand distinct")(println("[profile] cand distinct = " + candD.count()))
    val da = d2.select(col("__id").as("id_a"), col("__g").as("__ga"))
    val db = d2.select(col("__id").as("id_b"), col("__g").as("__gb"))
    val out = candD.join(da, "id_a").join(db, "id_b")
      .withColumn("__inter", size(array_intersect(col("__ga"), col("__gb"))).cast("long"))
      .withColumn("jaccard", col("__inter").cast("double") /
        (size(col("__ga")) + size(col("__gb")) - col("__inter")))
      .filter(col("jaccard") >= threshold)
    time("ngram: verify")(out.count())
    spark.stop()
  }
}
