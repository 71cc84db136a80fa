"""Experiment: lm_score variants (isolated timing, noop sink)."""
import os, sys, time
sys.path.insert(0, "/root/repo")
import __spark_entry__ as E
from whitebox_tools_spark.session import get_spark
from pyspark.sql import functions as F

variant = sys.argv[1] if len(sys.argv) > 1 else "base"
extra = {}
if variant in ("norule", "norule_ckpt"):
    extra["spark.sql.optimizer.excludedRules"] = (
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
spark = get_spark(app_name="exp-lm", cores=32, shuffle_partitions=64,
                  extra_conf=extra)
spark.sparkContext.setLogLevel("ERROR")
sf = "/root/testdata/sf0.1"
qs = E.queries()
qs["tile_assign"](spark, sf).count()  # warm

from whitebox_tools_spark.operators import curation as CU
from whitebox_tools_spark.functions import text as T

def lm_ckpt(docs):
    """Variant: checkpoint toks once, derive everything from it."""
    s_toks = T.tokens_expr("text")[0]
    toks = docs.selectExpr("doc_id", f"{s_toks} AS __t").localCheckpoint(eager=True)
    big = (
        toks.selectExpr(
            "doc_id",
            "TRANSFORM(SLICE(__t, 1, SIZE(__t) - 1), "
            "(w, i) -> STRUCT(w AS w1, ELEMENT_AT(__t, i + 2) AS w2)) AS __bs",
        )
        .select("doc_id", F.explode("__bs").alias("__b"))
        .groupBy("doc_id", "__b")
        .agg(F.count(F.lit(1)).alias("__dc"))
    )
    model = big.groupBy("__b").agg(F.sum("__dc").alias("__c12"))
    prefix = model.groupBy(F.col("__b.w1").alias("__w1")).agg(
        F.sum("__c12").alias("__c1"))
    vocab = toks.select(F.explode("__t").alias("__w")).agg(
        F.countDistinct("__w").cast("double").alias("__v"))
    scored = (
        big.join(model, "__b")
        .join(prefix, big["__b"].w1 == F.col("__w1"))
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.sum("__dc").cast("bigint").alias("n_bigrams"),
            (-F.sum(
                F.col("__dc")
                * F.log2((F.col("__c12") + F.lit(1.0))
                         / (F.col("__c1") + F.col("__v")))
            ) / F.sum("__dc")).alias("__h"),
        )
        .selectExpr("doc_id", "n_bigrams", "ROUND(__h, 4) AS h_bits")
    )
    return scored

for rep in range(4):
    t0 = time.time()
    if variant.endswith("ckpt"):
        df = lm_ckpt(E._docs(spark, sf))
    else:
        df = qs["lm_score"](spark, sf)
    df.write.format("noop").mode("overwrite").save()
    print(f"{variant} rep{rep}: {time.time()-t0:.3f}", flush=True)
