import gzip, json, sys, glob, os, re
from collections import defaultdict
path = sorted(glob.glob(sys.argv[1] + "/**/*.trace.json.gz", recursive=True), key=os.path.getmtime)[-1]
data = json.load(gzip.open(path, "rt"))
ev = data["traceEvents"]
pid_name = {e["pid"]: e["args"].get("name","") for e in ev if e.get("ph")=="M" and e.get("name")=="process_name"}
tid_name = {(e["pid"], e["tid"]): e["args"].get("name","") for e in ev if e.get("ph")=="M" and e.get("name")=="thread_name"}
# find XLA op lanes: thread names like "XLA Ops" on TPU device pids
lanes = defaultdict(list)
for e in ev:
    if e.get("ph") != "X":
        continue
    lanes[(e["pid"], e["tid"])].append(e)
# pick lanes on TPU pids; report per-lane category totals using the DEEPEST events only:
# events within a lane can nest; compute self time by subtracting overlapped children
agg = defaultdict(float)
examples = {}
for key, evs in lanes.items():
    pname = pid_name.get(key[0], "")
    tname = tid_name.get(key, "")
    if "TPU" not in pname and "tpu" not in pname.lower():
        continue
    if "Steps" in tname or "step" in tname:
        continue
    evs.sort(key=lambda e: (e["ts"], -e.get("dur", 0)))
    # stack-based self-time
    stack = []
    for e in evs:
        ts, dur = e["ts"], e.get("dur", 0)
        while stack and stack[-1][0] + stack[-1][1] <= ts:
            stack.pop()
        if stack:
            stack[-1][2][0] -= dur  # subtract from parent's self time
        self_holder = [dur]
        e["_self"] = self_holder
        stack.append((ts, dur, self_holder))
    for e in evs:
        name = re.sub(r"[.\d]+$", "", e.get("name","?")) or "(unnamed)"
        s = max(0, e["_self"][0]) / 1e3
        agg[(tname, name)] += s
        if s > examples.get((tname, name), (0, ""))[0] if isinstance(examples.get((tname,name)), tuple) else True:
            ln = e.get("args", {}).get("long_name", "") or e.get("args", {}).get("hlo_op", "")
            examples[(tname, name)] = (s, str(ln)[:110])
top = sorted(agg.items(), key=lambda kv: -kv[1])[:30]
total = sum(agg.values())
for (tname, name), ms in top:
    ex = examples.get((tname, name), (0,""))[1]
    print(f"{ms:9.2f} ms {100*ms/total:5.1f}%  [{tname}] {name}  {ex}")
print("total(self):", round(total,1), "ms")
