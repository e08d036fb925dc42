import os, sys, time, statistics
sys.path.insert(0, "/root/repo")
os.environ["ETL_GCP_SPARK_DISABLE_PINS"] = "1"
from pyspark.sql import functions as F
from etl_project_gcp_spark.operators import dedup as DD
from etl_project_gcp_spark.session import get_spark
spark = get_spark(app_name="intersect_dup_probe")
spark.range(1).count()
# synthetic: 2000 docs in 100 groups of 20 near-identical docs -> dense candidate pairs
import random
random.seed(7)
VOCAB = [f"w{i}" for i in range(500)]
rows = []
did = 0
for g in range(100):
    base = random.sample(VOCAB, 120)
    for j in range(20):
        toks = list(base)
        for _ in range(4):
            toks[random.randrange(len(toks))] = random.choice(VOCAB)
        rows.append((did, " ".join(toks))); did += 1
docs = spark.createDataFrame(rows, ["doc_id", "text"]).localCheckpoint()
sh_arrs = DD.shingle_arrays(docs, "doc_id", "text", 5).localCheckpoint()
sigs = DD.minhash_signatures(sh_arrs, "doc_id", 64)
cands = DD.lsh_candidate_pairs(sigs, "doc_id", 16, 4).localCheckpoint()
n = cands.count()
print("candidate pairs:", n)

def build(variant):
    if variant == "current":
        return DD.jaccard_verify_arrays(cands, sh_arrs, "doc_id", 0.7)
    # barrier variant: nondeterministic wrapper stops the filter merging
    # into the join -> intersect evaluated in a Filter above the join
    a_arr = sh_arrs.select(F.col("doc_id").alias("a"), F.col("sh_arr").alias("_sha"))
    b_arr = sh_arrs.select(F.col("doc_id").alias("b"), F.col("sh_arr").alias("_shb"))
    common = F.when(F.rand(42) >= -1.0, F.size(F.array_intersect(F.col("_sha"), F.col("_shb")))).otherwise(F.lit(0))
    return (cands.join(a_arr, "a").join(b_arr, "b")
        .withColumn("common", common)
        .withColumn("jaccard", F.col("common")/(F.size("_sha")+F.size("_shb")-F.col("common")))
        .filter((F.col("common") > 0) & (F.col("jaccard") >= 0.7))
        .select("a","b","jaccard"))

cur = {(r.a,r.b,round(r.jaccard,12)) for r in build("current").collect()}
bar = {(r.a,r.b,round(r.jaccard,12)) for r in build("barrier").collect()}
assert cur == bar, "outputs differ"
print("equality OK:", len(cur), "pairs survive")
times = {}
for rep in range(7):
    for v in (["current","barrier"] if rep%2==0 else ["barrier","current"]):
        t0=time.time(); build(v).write.format("noop").mode("overwrite").save()
        times.setdefault(v, []).append(time.time()-t0)
for v in ("current","barrier"):
    print(f"{v}: median {statistics.median(times[v]):.3f} runs={[round(x,2) for x in times[v]]}")
