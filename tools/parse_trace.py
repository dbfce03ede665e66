"""Parse a jax.profiler trace dir: per-op durations from the XLA Ops lane
only (events duplicate across rows AND within a lane — dedupe by
(name, ts) before summing, NOTES_r2.md).

CLI: python tools/parse_trace.py DIR [steps]
API: load_ops(DIR) -> [(op_name, dur_us)] deduped XLA-Ops-lane events.
"""
import collections
import glob
import gzip
import json
import sys


def _events(trace_dir):
    ev = []
    for fpath in glob.glob(
        trace_dir + "/plugins/profile/*/*.trace.json.gz"
    ) + glob.glob(trace_dir + "/**/*.trace.json.gz"):
        with gzip.open(fpath) as fh:
            ev.extend(json.load(fh).get("traceEvents", []))
    return ev


def _lanes(ev):
    names, pidnames = {}, {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            names[(e.get("pid"), e.get("tid"))] = e["args"].get("name")
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pidnames[e.get("pid")] = e["args"].get("name")
    return names, pidnames


def load_ops(trace_dir):
    """Deduped [(name, dur_us)] from the XLA Ops lane(s)."""
    ev = _events(trace_dir)
    names, pidnames = _lanes(ev)
    rows = collections.defaultdict(float)
    for e in ev:
        if e.get("ph") == "X" and "dur" in e:
            rows[(e.get("pid"), e.get("tid"))] += e["dur"]
    want = [k for k in rows if (names.get(k) or "").startswith("XLA Ops")]
    if not want:
        want = [
            k for k in rows
            if "TensorCore" in (pidnames.get(k[0]) or "")
            or "TPU" in (pidnames.get(k[0]) or "")
        ]
    seen = set()
    out = []
    for e in ev:
        if (
            e.get("ph") == "X" and "dur" in e
            and (e.get("pid"), e.get("tid")) in want
        ):
            key = (e.get("name"), e.get("ts"))
            if key in seen:
                continue
            seen.add(key)
            out.append((e.get("name", "?"), float(e["dur"])))
    return out


def main():
    d = sys.argv[1]
    steps = float(sys.argv[2]) if len(sys.argv) > 2 else 5.0
    ev = _events(d)
    names, pidnames = _lanes(ev)
    rows = collections.defaultdict(float)
    for e in ev:
        if e.get("ph") == "X" and "dur" in e:
            rows[(e.get("pid"), e.get("tid"))] += e["dur"]
    for (pid, tid), tot in sorted(rows.items(), key=lambda x: -x[1])[:8]:
        print(f"{tot/1e3:9.1f} ms  pid={pidnames.get(pid)!r} "
              f"tid={names.get((pid, tid))!r}")
    ops = load_ops(d)
    dur = collections.Counter()
    for name, us in ops:
        dur[name] += us
    tot = sum(dur.values())
    print(f"total op time: {tot/steps/1e3:.1f} ms/step")
    for name, us in dur.most_common(18):
        print(f"{us/steps:9.0f} us/step  {name[:90]}")


if __name__ == "__main__":
    main()
