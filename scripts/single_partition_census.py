"""Scan every registered query's physical plan for Exchange
SinglePartition feeding a Window — the single-reducer data-plane
pattern (1-row final aggregates also plan SinglePartition but carry
partial-agg metadata, which is fine)."""
from universal_data_to_orc_converter_spark.registry import load_all_queries
from universal_data_to_orc_converter_spark.session import get_spark
from universal_data_to_orc_converter_spark.plans.inspect import simple_plan
spark = get_spark("sp-census"); spark.sparkContext.setLogLevel("ERROR")
qs = load_all_queries()
SF = "/root/testdata/sf0.001"
hits, errs = [], []
for name, spec in qs.items():
    try:
        plan = simple_plan(spec.fn(spark, SF))
    except Exception as e:
        errs.append((name, f"{type(e).__name__}: {str(e)[:60]}"))
        continue
    n_sp = plan.count("Exchange SinglePartition")
    if not n_sp:
        continue
    # window fed by a single-partition exchange = data-plane reducer
    lines = plan.splitlines()
    windowed = any(
        "Window" in l2
        for i, l in enumerate(lines) if "Exchange SinglePartition" in l
        for l2 in lines[max(0, i - 6):i]
    )
    hits.append((name, n_sp, windowed))
for name, n_sp, windowed in sorted(hits, key=lambda h: (not h[2], h[0])):
    print(f"{'WINDOW' if windowed else 'agg   '} {name}: {n_sp} SinglePartition exchange(s)")
print(f"[summary] {len(hits)} queries with SinglePartition, "
      f"{sum(1 for h in hits if h[2])} feeding Windows, {len(errs)} plan errors")
for e in errs: print("[ERR]", e)
