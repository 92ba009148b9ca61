import time, json
from universal_data_to_orc_converter_spark.registry import load_all_queries
from universal_data_to_orc_converter_spark.session import get_spark
spark = get_spark("op-census"); spark.sparkContext.setLogLevel("ERROR")
SF = "/root/testdata/sf0.1"
qs = load_all_queries()
walls = {}
for name, spec in qs.items():
    t0 = time.perf_counter()
    try:
        spec.fn(spark, SF).write.mode("overwrite").format("noop").save()
        walls[name] = round(time.perf_counter() - t0, 2)
    except Exception as e:
        walls[name] = f"ERR {type(e).__name__}: {str(e)[:80]}"
    print(f"{name:40s} {walls[name]}", flush=True)
ok = {k: v for k, v in walls.items() if isinstance(v, float)}
print("\n=== slowest 20 ===")
for k, v in sorted(ok.items(), key=lambda kv: -kv[1])[:20]:
    print(f"{k:40s} {v:8.2f}s")
print(json.dumps({"total_sec": round(sum(ok.values()),1), "n": len(ok)}))
spark.stop()
