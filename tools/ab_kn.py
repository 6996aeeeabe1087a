import os, sys, time, gc
sys.path.insert(0, "/root/repo")
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
from pyspark.sql import functions as F
from sparker_spark.session import get_spark
from sparker_spark.entry import load
from sparker_spark.llm import text as textmod
from sparker_spark.rounding import rnd

spark = get_spark(app_name="ab_kn", master="local[32]", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")

import inspect
src = inspect.getsource(textmod.LanguageModelScore.kneser_ney_logprob)

def kn(documents, pre_join, n=5):
    # replicate the function with the join shape toggled
    from sparker_spark.llm.text import LanguageModelScore
    doc_col, text_col, count_alias = "doc_id", "text", "n_grams"
    toks_arr = F.filter(F.split(F.lower(F.col(text_col)), "[^0-9a-z_]+"), lambda t: F.length(t) > 0)
    fields = ", ".join(f"'w{j}', IF(i > {j}, element_at(t, i - {j}), NULL)" for j in range(n))
    pos = (documents.select(F.col(doc_col).alias("doc_id"), toks_arr.alias("t"))
           .where(F.size("t") >= 1)
           .select("doc_id", F.explode(F.expr("transform(sequence(1, size(t)), " f"i -> named_struct({fields}))")).alias("p"))
           .select("doc_id", *[F.col(f"p.w{j}").alias(f"w{j}") for j in range(n)]))
    pos = pos.localCheckpoint(eager=True)
    g = {}
    for k in range(2, n + 1):
        cols = [f"w{j}" for j in range(k - 1, -1, -1)]
        g[k] = pos.where(F.col(f"w{k-1}").isNotNull()).groupBy(*cols).agg(F.count("*").cast("double").alias("cg"))
        if k == n: g[k].cache()
    adj = {}
    for k in range(1, n + 1):
        if k == n:
            adj[k] = g[n].select(*[f"w{j}" for j in range(n-1,-1,-1)], F.col("cg").alias("a"))
        else:
            cols = [f"w{j}" for j in range(k-1,-1,-1)]
            adj[k] = g[k+1].groupBy(*cols).agg(F.count("*").cast("double").alias("a"))
        adj[k].cache()
    legs = [pos.agg(F.countDistinct("w0").cast("double").alias("n1")).select(F.lit(0).alias("k"),"n1",F.lit(0.0).alias("n2"),F.lit(0.0).alias("tp"),F.lit(0.0).alias("n1t"))]
    for k in range(1, n + 1):
        legs.append(adj[k].agg(F.sum((F.col("a")==1.0).cast("long")).cast("double").alias("n1"),
                               F.sum((F.col("a")==2.0).cast("long")).cast("double").alias("n2"),
                               F.sum("a").alias("tp"), F.count("*").cast("double").alias("n1t"))
                    .select(F.lit(k).alias("k"),"n1","n2","tp","n1t"))
    u = legs[0]
    for leg in legs[1:]: u = u.unionByName(leg)
    stats = {r["k"]: r for r in u.collect()}
    vocab = stats[0]["n1"]
    D = {}
    for k in range(1, n + 1):
        n1 = float(stats[k]["n1"] or 0); n2 = float(stats[k]["n2"] or 0)
        D[k] = n1/(n1+2.0*n2) if (n1+2.0*n2) > 0 else 0.5
    t_prime = float(stats[1]["tp"] or 0); n1_types = float(stats[1]["n1t"] or 0)
    scored = pos.where(F.col(f"w{n-1}").isNotNull())
    for k in range(2, n + 1):
        cols = [f"w{j}" for j in range(k-1,-1,-1)]
        ctx_cols = cols[:-1]
        ctx = adj[k].groupBy(*ctx_cols).agg(F.sum("a").alias(f"den{k}"), F.count("*").cast("double").alias(f"nt{k}"))
        if pre_join:
            tab = adj[k].select(*cols, F.col("a").alias(f"a{k}")).join(ctx, ctx_cols)
            scored = scored.join(tab, cols)
        else:
            scored = scored.join(adj[k].select(*cols, F.col("a").alias(f"a{k}")), cols).join(ctx, ctx_cols)
    scored = scored.join(adj[1].select("w0", F.col("a").alias("a1")), "w0")
    p = (F.greatest(F.col("a1") - F.lit(D[1]), F.lit(0.0)) / F.lit(t_prime)
         + (F.lit(D[1]*n1_types)/F.lit(t_prime)) * (F.lit(1.0)/F.lit(float(vocab))))
    for k in range(2, n + 1):
        p = (F.greatest(F.col(f"a{k}")-F.lit(D[k]), F.lit(0.0))/F.col(f"den{k}")
             + (F.lit(D[k])*F.col(f"nt{k}")/F.col(f"den{k}")) * p)
    scored = scored.select("doc_id", rnd(F.log(p), 6).cast("decimal(18,6)").alias("lp"))
    return (scored.groupBy("doc_id")
            .agg(F.count("*").cast("long").alias(count_alias), F.sum("lp").alias("s"))
            .select("doc_id", count_alias, rnd(F.col("s").cast("double")/F.col(count_alias), 6).alias("avg_logprob")))

def one(tag, pre):
    spark.catalog.clearCache(); gc.collect()
    docs = load(spark, SF, "documents")
    t0 = time.time()
    nn = kn(docs, pre).count()
    dt = time.time() - t0
    print(f"{tag}: {dt:.2f}s rows={nn}", flush=True)
    return dt

one("warmup(new)", True)
a, b = [], []
for i in range(3):
    a.append(one(f"old2join[{i}]", False))
    b.append(one(f"prejoin[{i}]", True))
print("old:", sorted(a), "median", sorted(a)[1])
print("new:", sorted(b), "median", sorted(b)[1])
