import gzip, json, sys, glob, os
from collections import defaultdict
path = sorted(glob.glob(sys.argv[1] + "/**/*.trace.json.gz", recursive=True), key=os.path.getmtime)[-1]
data = json.load(gzip.open(path, "rt"))
ev = data["traceEvents"]
pid_name = {e["pid"]: e["args"].get("name","") for e in ev if e.get("ph")=="M" and e.get("name")=="process_name"}
tid_name = {(e["pid"], e["tid"]): e["args"].get("name","") for e in ev if e.get("ph")=="M" and e.get("name")=="thread_name"}
agg = defaultdict(float)
cnt = defaultdict(int)
shape = {}
for e in ev:
    if e.get("ph") != "X":
        continue
    if "TPU" not in pid_name.get(e["pid"], ""):
        continue
    if tid_name.get((e["pid"], e["tid"])) != "XLA Ops":
        continue
    name = e.get("name","?")
    agg[name] += e.get("dur",0)/1e3
    cnt[name] += 1
    ln = e.get("args", {}).get("long_name","")
    if name not in shape:
        shape[name] = str(ln)[:100]
top = sorted(agg.items(), key=lambda kv: -kv[1])[:25]
tot = sum(agg.values())
for name, ms in top:
    print(f"{ms:8.2f} ms {100*ms/tot:4.1f}% x{cnt[name]:<3} {name[:40]:40} {shape.get(name,'')[:90]}")
print("total XLA Ops:", round(tot,1), "ms over", sys.argv[1])
