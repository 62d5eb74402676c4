#!/usr/bin/env python3
"""Assemble round-5 calm-harvested scaling cells into efficiency tables.

Reads the JSONL cell files written by tools/calm_harvest_r5e.sh (one line
per ClusterBench invocation, each with its own per-pass /proc/stat steal
delta and pre/post standard-candle times), classifies each draw as
clean/stormy/aborted, and prints per-pair-shape MIN and MEDIAN efficiency
(T_small / (4 x T_big)) over the clean draws only.

Clean = measured-pass steal below STEAL_J and the post-candle within
CANDLE_TOL of the pre-candle (the candle catches delivered-CPU-speed
drift that steal jiffies alone can miss).

Usage: tools/assemble_r5_cells.py CELLS.jsonl... [--steal-j 1000] [--candle-tol 1.6]
"""
import json, sys, statistics

def main(argv):
    steal_j, candle_tol = 1000.0, 1.6
    files, i = [], 1
    while i < len(argv):
        if argv[i] == "--steal-j":
            steal_j = float(argv[i + 1]); i += 2
        elif argv[i] == "--candle-tol":
            candle_tol = float(argv[i + 1]); i += 2
        else:
            files.append(argv[i]); i += 1
    draws = {}  # (n, workers, cores) -> list of (t, tag)
    for f in files:
        for line in open(f):
            line = line.strip()
            if not line:
                continue
            r = json.loads(line)
            key = (r["n"], r["workers"], r.get("cores", 1))
            if r.get("aborted"):
                draws.setdefault(key, []).append((None, "aborted(%s, warmup_steal_j=%s)" % (
                    r["aborted"], r.get("warmup_steal_j"))))
                continue
            ps = r["pass_stats"][-1]
            t = ps["t"]
            tags = []
            if ps.get("steal_j", 0) > steal_j:
                tags.append("steal=%dj" % ps["steal_j"])
            cpre, cpost = ps.get("candle_pre_s"), ps.get("candle_post_s")
            if cpre and cpost and max(cpre, cpost) / min(cpre, cpost) > candle_tol:
                tags.append("candle %.2f->%.2f" % (cpre, cpost))
            draws.setdefault(key, []).append((t, ",".join(tags) if tags else "clean"))
    for key in sorted(draws):
        n, w, c = key
        print("cell n=%d W=%d cores=%d:" % key)
        for t, tag in draws[key]:
            print("  %s  %s" % ("%.1fs" % t if t else "-", tag))
    # pair shapes: (small, big) with big = 4 x small workers
    for (small, big) in [(1, 4), (2, 8)]:
        for key_s in [k for k in draws if k[1] == small]:
            key_b = (key_s[0], big, key_s[2])
            if key_b not in draws:
                continue
            cs = [t for t, tag in draws[key_s] if t and tag == "clean"]
            cb = [t for t, tag in draws[key_b] if t and tag == "clean"]
            if not cs or not cb:
                print("pair W%d->W%d n=%d cores=%d: no clean draws on both sides "
                      "(%d vs %d)" % (small, big, key_s[0], key_s[2], len(cs), len(cb)))
                continue
            emin = min(cs) / (4 * min(cb))
            emed = statistics.median(cs) / (4 * statistics.median(cb))
            cores = key_s[2]
            print("pair W%d->W%d n=%d cores=%d: T_N min %.1f med %.1f | "
                  "T_4N min %.1f med %.1f | eff min %.3f med %.3f | "
                  "clips/s@4N %.0f" % (
                      small, big, key_s[0], cores, min(cs), statistics.median(cs),
                      min(cb), statistics.median(cb), emin, emed,
                      key_s[0] / min(cb)))

if __name__ == "__main__":
    main(sys.argv)
