#!/usr/bin/env python3
"""Aggregate a Spark event log into per-callsite hot-spot tables.

Usage: python3 tools/evlog_hotspots.py /tmp/evlog/<app-id> [topN]

Reads the JSON-lines event log and prints, per stage callsite (the first
user frame in the stage's Details stack, falling back to the callsite
one-liner), the summed task executor-run-time, summed stage wall time,
task count and stage count — the "which operator line is hot" table the
optimization guide's empirical loop starts from (guide §1.1/§7.2). Wall
time double-counts concurrent stages; executor-run-time is the fair
CPU-attribution column.
"""
import json
import sys
from collections import defaultdict


def main() -> None:
    path = sys.argv[1]
    top = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    # stage (id, attempt) -> callsite
    site = {}
    wall = defaultdict(float)
    run = defaultdict(float)
    tasks = defaultdict(int)
    stages = defaultdict(int)
    shuffle_w = defaultdict(int)

    def callsite_of(info):
        details = info.get("Details", "") or ""
        for line in details.splitlines():
            line = line.strip()
            if line.startswith("graft.") or "/graft/" in line:
                return line
        return info.get("Stage Name", "?")

    with open(path, encoding="utf-8") as f:
        for raw in f:
            try:
                ev = json.loads(raw)
            except json.JSONDecodeError:
                continue
            k = ev.get("Event")
            if k == "SparkListenerStageSubmitted":
                info = ev["Stage Info"]
                key = (info["Stage ID"], info["Stage Attempt ID"])
                site[key] = callsite_of(info)
            elif k == "SparkListenerStageCompleted":
                info = ev["Stage Info"]
                key = (info["Stage ID"], info["Stage Attempt ID"])
                cs = site.get(key) or callsite_of(info)
                site[key] = cs
                sub = info.get("Submission Time")
                com = info.get("Completion Time")
                if sub and com:
                    wall[cs] += (com - sub) / 1e3
                stages[cs] += 1
            elif k == "SparkListenerTaskEnd":
                key = (ev["Stage ID"], ev["Stage Attempt ID"])
                cs = site.get(key)
                m = ev.get("Task Metrics") or {}
                if cs is None:
                    # task ends before its StageCompleted event: stash under id
                    cs = f"stage-{key[0]}"
                run[cs] += m.get("Executor Run Time", 0) / 1e3
                tasks[cs] += 1
                sw = (m.get("Shuffle Write Metrics") or {}).get(
                    "Shuffle Bytes Written", 0)
                shuffle_w[cs] += sw

    rows = sorted(run.items(), key=lambda kv: -kv[1])[:top]
    print(f"{'exec-run-s':>10} {'wall-s':>8} {'stages':>6} {'tasks':>6} "
          f"{'shufW-MB':>8}  callsite")
    for cs, r in rows:
        print(f"{r:10.1f} {wall[cs]:8.1f} {stages[cs]:6d} {tasks[cs]:6d} "
              f"{shuffle_w[cs] / 1e6:8.1f}  {cs}")

    # second pass: per-job-description (query label) job counts and wall
    jobs = {}       # job id -> (desc, submit)
    jwall = defaultdict(float)
    jcount = defaultdict(int)
    jspan = {}      # desc -> [first submit, last complete]
    with open(path, encoding="utf-8") as f:
        for raw in f:
            try:
                ev = json.loads(raw)
            except json.JSONDecodeError:
                continue
            k = ev.get("Event")
            if k == "SparkListenerJobStart":
                desc = (ev.get("Properties") or {}).get(
                    "spark.job.description", "?")
                jobs[ev["Job ID"]] = (desc, ev.get("Submission Time", 0))
            elif k == "SparkListenerJobEnd":
                desc, sub = jobs.get(ev["Job ID"], ("?", 0))
                com = ev.get("Completion Time", 0)
                if sub and com:
                    jwall[desc] += (com - sub) / 1e3
                    s0, c0 = jspan.get(desc, (sub, com))
                    jspan[desc] = (min(s0, sub), max(c0, com))
                jcount[desc] += 1
    if jcount:
        print()
        print(f"{'jobs':>5} {'job-wall-s':>10} {'span-s':>8} {'gap-s':>7}  "
              f"description")
        for desc in sorted(jwall, key=lambda d: -jwall[d])[:top]:
            span = (jspan[desc][1] - jspan[desc][0]) / 1e3
            gap = span - jwall[desc]
            print(f"{jcount[desc]:5d} {jwall[desc]:10.1f} {span:8.1f} "
                  f"{gap:7.1f}  {desc}")


if __name__ == "__main__":
    main()
