import json, glob, sys
d = sys.argv[1]; W0 = float(sys.argv[2])*1000; W1 = float(sys.argv[3])*1000
f = sorted(glob.glob(f"{d}/*/events*"))[-1]
stages = []
for line in open(f, errors="replace"):
    try: e = json.loads(line)
    except Exception: continue
    if e.get("Event") == "SparkListenerStageCompleted":
        si = e["Stage Info"]
        sub, com = si.get("Submission Time"), si.get("Completion Time")
        if sub and com and com >= W0 and sub <= W1:
            stages.append((sub, com, si["Stage ID"], si.get("Number of Tasks"), (com-sub)/1000))
stages.sort()
for sub, com, sid, nt, dur in stages:
    if dur > 1.0:
        print(f"t+{(sub-W0)/1000:6.1f}→{(com-W0)/1000:6.1f} ({dur:6.1f}s) st{sid:3d} tasks={nt:4d}")
ivs = sorted((s, c) for s, c, *_ in stages); merged = []
for s, c in ivs:
    if merged and s <= merged[-1][1]: merged[-1][1] = max(merged[-1][1], c)
    else: merged.append([s, c])
cov = sum(c-s for s, c in merged)/1000
print(f"window {(W1-W0)/1000:.1f}s | covered {cov:.1f}s | driver-uncovered {((W1-W0)/1000-cov):.1f}s")
