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
    # a patch measured against different corpora or thresholds is not
    # mergeable: silently folding it would let (e.g.) a run without
    # SPARK_GRAFT_SF_XL drop a query's xl/ratio2 points while the merged
    # file still advertises an xl_sf (r10 ADVICE)
    for key in ("small_sf", "large_sf", "xl_sf", "flag_ratio", "noise_floor_sec"):
        b, p = base.get(key), patch.get(key)
        assert p == b, (
            f"patch {key!r} = {p!r} does not match base {b!r}; "
            "re-measure with the base file's corpora/thresholds")
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
