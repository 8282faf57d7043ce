"""Idle-host session-position study (VERDICT-r11 item 7): are q443/q445's
late-suite walls inflated by session AGE (cumulative leak) or by ambient
contention? One session: warm -> q443/q445 x2 (early) -> 20 heavy
headliners (suite-age simulation) -> q443/q445 x2 (late)."""
import os, sys, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from gh_archive_data_pipeline_spark.session import get_spark
from bench import force_execute
from gh_archive_data_pipeline_spark.plans.metrics import executed_shuffle_summary
from gh_archive_data_pipeline_spark.plans.registry import all_queries
sf_dir = "/root/testdata/sf0.1"
spark = get_spark(app_name="position-study")
spark.range(100_000).selectExpr("id % 7 AS k", "id*1.5 AS v").groupBy("k").sum("v").count()
from gh_archive_data_pipeline_spark.streaming.stream_queries import prepare_stream_fixtures
prepare_stream_fixtures(spark, sf_dir)
qs = all_queries()
rt = spark.sparkContext._jvm.java.lang.Runtime.getRuntime()

def run(name):
    t0 = time.monotonic()
    df = qs[name].fn(spark, sf_dir)
    force_execute(df)
    w = time.monotonic() - t0
    m = executed_shuffle_summary(df)
    return w, m

out = {"early": {}, "late": {}, "mem": {}}
for tag in ("early",):
    for name in ("q443_pipeline_epoch_plan", "q445_epoch_plan_export"):
        walls = [run(name) for _ in range(2)]
        out[tag][name] = {"walls": [round(w,2) for w,_ in walls],
                          "counters": walls[-1][1]}
out["mem"]["after_early"] = rt.totalMemory() - rt.freeMemory()
HEAVY = ["q440_corpus_build_pipeline", "q374_corpus_curation",
         "q295_triangle_count", "q377_semantic_dedup", "q380_dsir_weights",
         "q376_incremental_near_dup", "q401_quality_probe",
         "q402_ivf_pq_search", "q167_market_basket", "q316_scaling_curve",
         "q441_chunk_disposition_reconcile", "q382_perplexity_filter",
         "q45_embedding_lsh_topk", "q315_kneser_ney", "q394_bpe_encode",
         "q404_unigram_lm_tokenizer", "q421_kcenter_coreset",
         "q87_reconcile_tables", "q393_span_dedup_clean", "q189_pagerank_event_graph"]
t0 = time.monotonic()
for name in HEAVY:
    run(name)
out["suite_sim_sec"] = round(time.monotonic() - t0, 1)
out["mem"]["after_suite"] = rt.totalMemory() - rt.freeMemory()
for tag in ("late",):
    for name in ("q443_pipeline_epoch_plan", "q445_epoch_plan_export"):
        walls = [run(name) for _ in range(2)]
        out[tag][name] = {"walls": [round(w,2) for w,_ in walls],
                          "counters": walls[-1][1]}
out["mem"]["after_late"] = rt.totalMemory() - rt.freeMemory()
print(json.dumps(out, indent=1))
