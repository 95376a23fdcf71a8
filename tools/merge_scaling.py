#!/usr/bin/env python3
"""Fold a restricted BenchScaling re-run into the committed BENCH_SCALING.json.

After a targeted fix (or a corpus regeneration) only the affected queries
need re-measuring: run

    SPARK_GRAFT_SF_XL=... SPARK_GRAFT_SCALING_OUT=/tmp/scaling_patch.json \
      sbt "runMain graft.BenchScaling q1 q2 ..."

then `python3 tools/merge_scaling.py /tmp/scaling_patch.json` to replace
those queries' entries and recompute the flagged list from the merged data
(same thresholds the Scala side applies).
"""
import json
import sys

BASE = "/root/repo/BENCH_SCALING.json"


def main(patch_path, base_path=BASE):
    base = json.load(open(base_path))
    patch = json.load(open(patch_path))
    for name, entry in patch["queries"].items():
        base["queries"][name] = entry
    # errors: drop re-measured queries' stale errors, add fresh ones
    errs = {k: v for k, v in base.get("errors", {}).items()
            if k not in patch["queries"] and k not in patch.get("errors", {})}
    errs.update(patch.get("errors", {}))
    base["errors"] = errs
    flag_ratio = base["flag_ratio"]
    floor = base["noise_floor_sec"]
    flagged = {}
    for name, e in base["queries"].items():
        segs = [(e["small"], e["large"], e["ratio"])]
        if "xl" in e:
            segs.append((e["large"], e["xl"], e["ratio2"]))
        for i, (_, b, r) in enumerate(segs):
            if b >= floor and r > flag_ratio:
                flagged[name] = {"segment": i + 1, "ratio": round(r, 3)}
                break
    base["flagged"] = flagged
    json.dump(base, open(base_path, "w"))
    print(f"merged {len(patch['queries'])} queries; flagged now: {sorted(flagged)} "
          f"({len(flagged)}); errors: {sorted(errs)}")


if __name__ == "__main__":
    main(sys.argv[1], *(sys.argv[2:] or []))
