"""Item 6: sf1 octave evidence for the session SHJ default.

Runs the 15 join-heaviest queries (by SMJ+SHJ count in PLANS.md) at sf1
with the event log enabled, then parses per-query wall seconds and
memory/disk spill from the event log. Run once with the default config
(SHJ allowed) and once with SPARK_GRAFT_PREFER_SMJ=true (rollback knob).
"""
import gc
import glob
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from binance_data_ingestor_spark.session import get_spark
from binance_data_ingestor_spark.queries import registry

SF = "/root/repo/.benchdata/sf1"
NAMES = [
    "q226_hits",
    "q99_pagerank",
    "q233_containment_prefix",
    "q159_prefix_jaccard",
    "q266_rouge_pairs",
    "q119_incremental_agg",
    "q200_label_propagation",
    "q235_vocab_growth",
    "q223_frequent_triples",
    "q153_incremental_neardup",
    "q286_cross_corpus_ann",
    "q115_snapshot_diff",
    "q245_assortativity",
    "q215_link_prediction",
    "q105_triangle_count",
]


def main():
    tag = sys.argv[1]
    evt_dir = f"/tmp/sf1evt_{tag}"
    os.makedirs(evt_dir, exist_ok=True)
    spark = get_spark(
        f"sf1shj_{tag}",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{evt_dir}",
        },
    )
    qs, _ = registry()
    n = spark.sparkContext.defaultParallelism
    spark.range(n).repartition(n).mapInPandas(lambda it: it, "id long").write.format(
        "noop"
    ).mode("overwrite").save()
    walls = {}
    for name in NAMES:
        gc.collect()
        spark.sparkContext.setJobDescription(f"Q::{name}")
        t0 = time.perf_counter()
        try:
            qs[name](spark, SF).write.format("noop").mode("overwrite").save()
            walls[name] = round(time.perf_counter() - t0, 2)
        except Exception as e:  # noqa: BLE001
            walls[name] = f"ERROR: {type(e).__name__}: {e}"[:200]
        spark.sparkContext.setJobDescription(None)
        print(f"{name}: {walls[name]}", flush=True)
    app_id = spark.sparkContext.applicationId
    spark.stop()

    # parse event log: stage -> desc via JobStart; spill via TaskEnd
    logf = glob.glob(f"{evt_dir}/{app_id}*")[0]
    stage2desc = {}
    spill = {}
    peak_mem = {}
    with open(logf) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            if ev.get("Event") == "SparkListenerJobStart":
                desc = (ev.get("Properties") or {}).get("spark.job.description", "")
                if desc.startswith("Q::"):
                    for sid in ev.get("Stage IDs", []):
                        stage2desc[sid] = desc[3:]
            elif ev.get("Event") == "SparkListenerTaskEnd":
                d = stage2desc.get(ev.get("Stage ID"))
                if not d:
                    continue
                m = ev.get("Task Metrics") or {}
                s = spill.setdefault(d, [0, 0])
                s[0] += m.get("Memory Bytes Spilled", 0)
                s[1] += m.get("Disk Bytes Spilled", 0)
                peak_mem[d] = max(
                    peak_mem.get(d, 0), m.get("Peak Execution Memory", 0)
                )
    out = {
        n: {
            "wall_s": walls.get(n),
            "mem_spill_mb": round(spill.get(n, [0, 0])[0] / 1e6, 1),
            "disk_spill_mb": round(spill.get(n, [0, 0])[1] / 1e6, 1),
            "peak_exec_mem_mb": round(peak_mem.get(n, 0) / 1e6, 1),
        }
        for n in NAMES
    }
    with open(f"/tmp/sf1_shj_{tag}.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
