#!/usr/bin/env python3
"""Join two `graft.Verify` timing logs (sf0.1 vs sf1) into a per-key
ratio table. A key whose sf1/sf0.1 wall ratio exceeds the data ratio
(10x) by a margin gets flagged for a plan note (round-7 VERDICT item 3).
Usage: ratio.py <sf01_times.txt> <sf1_times.txt> [flag_ratio=10]"""
import sys, re

def parse(path):
    out = {}
    for line in open(path):
        m = re.match(r"\[verify\] (\S+) ok in ([0-9.]+) s", line)
        if m:
            out[m.group(1)] = float(m.group(2))
    return out

a, b = parse(sys.argv[1]), parse(sys.argv[2])
flag = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
rows = []
for k in sorted(set(a) | set(b)):
    t0, t1 = a.get(k), b.get(k)
    r = (t1 / t0) if t0 and t1 else None
    rows.append((k, t0, t1, r))
flagged = [r for r in rows if r[3] and r[3] > flag and (r[2] or 0) > 2.0]
print(f"{'key':36s} {'sf0.1':>8s} {'sf1':>8s} {'ratio':>7s}")
for k, t0, t1, r in sorted(rows, key=lambda x: -(x[3] or 0)):
    print(f"{k:36s} {t0 or 0:8.2f} {t1 or 0:8.2f} "
          f"{('%7.1f' % r) if r else '      -'}"
          + ("  <== FLAG" if (k, t0, t1, r) in [tuple(f) for f in flagged] else ""))
print(f"\ntotal sf0.1 {sum(v for v in a.values()):.1f} s, "
      f"sf1 {sum(v for v in b.values()):.1f} s; "
      f"{len(flagged)} keys over {flag}x (and >2 s at sf1)")
