#!/usr/bin/env python3
"""Offline candidate-volume exponents between two CandVol artifacts.

Usage: python3 tools/candvol_exponents.py <small.json> <small_dir_key> <big.json> <big_dir_key>

Volumes are deterministic counts (zero weather), so cross-artifact
comparison is protocol-legal — unlike wall floors, which must come from
same-session pairs (README measurement protocol). Base ratio is n_docs
for text ops, n_vecs for q113/q115, read from the artifacts themselves.
"""
import json
import math
import sys

VEC_KEYS = ("q113", "q115")


def load(path, dir_key):
    d = json.load(open(path))
    dirs = d["dirs"]
    if dir_key not in dirs:
        raise SystemExit(f"{path}: no dir {dir_key!r}; has {list(dirs)}")
    return dirs[dir_key]


def main():
    small = load(sys.argv[1], sys.argv[2])
    big = load(sys.argv[3], sys.argv[4])
    rows = []
    for k, a in sorted(small.items()):
        if k in ("n_docs", "n_vecs") or not k.startswith("q"):
            continue
        b = big.get(k)
        base = "n_vecs" if k.startswith(VEC_KEYS) else "n_docs"
        ratio = big[base] / small[base]
        if b is None or a <= 0 or b <= 0 or ratio <= 1:
            continue
        rows.append((k, a, b, base, ratio, math.log(b / a) / math.log(ratio)))
    print(f"{'key':26} {'small':>16} {'big':>16} {'base':>7} {'ratio':>6} {'exp':>6}")
    for k, a, b, base, ratio, e in rows:
        print(f"{k:26} {a:16.0f} {b:16.0f} {base:>7} {ratio:6.3f} {e:6.3f}")


if __name__ == "__main__":
    main()
