"""Parse a jax.profiler trace dir: per-op durations from the XLA Ops lane
only (events duplicate across rows). Usage: python tools/parse_trace.py DIR"""
import glob, gzip, json, collections, sys
d = sys.argv[1]
ev = []
for fpath in glob.glob(d + "/plugins/profile/*/*.trace.json.gz"):
    with gzip.open(fpath) as fh:
        ev.extend(json.load(fh).get("traceEvents", []))
names = {}
pidnames = {}
for e in ev:
    if e.get("ph") == "M" and e.get("name") == "thread_name":
        names[(e.get("pid"), e.get("tid"))] = e["args"].get("name")
    if e.get("ph") == "M" and e.get("name") == "process_name":
        pidnames[e.get("pid")] = e["args"].get("name")
rows = collections.defaultdict(float)
for e in ev:
    if e.get("ph") == "X" and "dur" in e:
        rows[(e.get("pid"), e.get("tid"))] += e["dur"]
for (pid, tid), tot in sorted(rows.items(), key=lambda x: -x[1])[:8]:
    print(f"{tot/1e3:9.1f} ms  pid={pidnames.get(pid)!r} tid={names.get((pid,tid))!r}")
# pick the XLA op lane(s): thread names like "XLA Ops" or process TPU
want = [k for k in rows if (names.get(k) or "").startswith("XLA Ops")]
if not want:
    want = [k for k in rows if "TensorCore" in (pidnames.get(k[0]) or "") or "TPU" in (pidnames.get(k[0]) or "")]
print("op lanes:", [(pidnames.get(p), names.get((p,t))) for p,t in want])
dur = collections.Counter()
for e in ev:
    if e.get("ph") == "X" and "dur" in e and (e.get("pid"), e.get("tid")) in want:
        dur[e.get("name", "?")] += e["dur"]
tot = sum(dur.values())
print(f"total op time: {tot/5e3:.1f} ms/step")
for name, us in dur.most_common(18):
    print(f"{us/5:9.0f} us/step  {name[:90]}")
