#!/usr/bin/env python3
"""Compare two graft bench captures (BENCH_FULL.json shape) per key.

Usage: tools/bench_diff.py OLD.json NEW.json [--threshold 1.4] [--raw]

Rules (README "Bench contention sentinel" + drift-model section, made
mechanical):
- Default mode NORMALIZES each key by its capture's own `_drift_<key>`
  factor before comparing. That is only meaningful WITHIN one
  `_drift_model` version: the round-15 model change moved mean per-key
  factors 1.68 -> 1.34 on identical hardware, and naive cross-version
  normalization read a flat suite as 1.26x "slower". So differing (or
  missing) `_drift_model` stamps are an ERROR in normalized mode —
  re-run with --raw, which compares raw seconds and is valid across
  versions on quiet captures.
- Keys present in only one capture are listed, not compared.
- Sentinel gates of both captures are printed first; a capture failing
  its gates should not be adjudicated at all (the bench itself now
  refuses to write such a capture to BENCH_FULL.json).
"""
import argparse
import json
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    q = d.get("queries", {})
    # _drift_model is a version stamp living among the _drift_* factors —
    # consumers globbing factors must exclude it (README rule)
    model = q.get("_drift_model")
    factors = {k[len("_drift_"):]: v for k, v in q.items()
               if k.startswith("_drift_") and k != "_drift_model"}
    keys = {k: v for k, v in q.items() if not k.startswith("_")}
    sentinels = {k: v for k, v in q.items()
                 if k.startswith("_sentinel") or k == "_external_cpu_frac"}
    return {"total": d.get("value"), "keys": keys, "factors": factors,
            "model": model, "sentinels": sentinels, "path": path}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.4,
                    help="report keys whose ratio moved past this")
    ap.add_argument("--raw", action="store_true",
                    help="compare raw seconds (valid across _drift_model "
                         "versions on quiet captures)")
    args = ap.parse_args()

    old, new = load(args.old), load(args.new)

    for cap in (old, new):
        s = cap["sentinels"]
        print(f"{cap['path']}: total {cap['total']:.1f}s, "
              f"_drift_model {cap['model']}, "
              f"sentinels {{{', '.join(f'{k}={v:.2f}' for k, v in sorted(s.items()))}}}")

    if not args.raw:
        # HARD GUARD: normalizing across drift-model versions is the
        # round-15 archaeology trap — refuse instead of mis-reading
        if old["model"] is None or new["model"] is None:
            sys.exit("ERROR: a capture carries no _drift_model stamp "
                     "(pre-versioning = model 1, implicitly). Normalized "
                     "comparison is only valid within one model version — "
                     "re-run with --raw to compare raw seconds.")
        if old["model"] != new["model"]:
            sys.exit(f"ERROR: _drift_model differs ({old['model']} vs "
                     f"{new['model']}) — the factor-producing aging model "
                     "changed between these captures, so normalized "
                     "comparison is invalid (the round-15 model change "
                     "shifted mean factors 1.68 -> 1.34 on identical "
                     "hardware). Re-run with --raw.")

    def val(cap, k):
        v = cap["keys"][k]
        if args.raw:
            return v
        return v / cap["factors"].get(k, 1.0)

    common = sorted(set(old["keys"]) & set(new["keys"]))
    only_old = sorted(set(old["keys"]) - set(new["keys"]))
    only_new = sorted(set(new["keys"]) - set(old["keys"]))

    movers = []
    for k in common:
        a, b = val(old, k), val(new, k)
        if a <= 0:
            continue
        r = b / a
        if r > args.threshold or r < 1 / args.threshold:
            movers.append((r, k, a, b))

    mode = "raw" if args.raw else f"normalized (model {new['model']})"
    tot_a = sum(val(old, k) for k in common)
    tot_b = sum(val(new, k) for k in common)
    print(f"\n{len(common)} common keys, {mode}: "
          f"{tot_a:.1f}s -> {tot_b:.1f}s ({tot_b / tot_a:.2f}x)")
    if only_old:
        print(f"only in old: {', '.join(only_old)}")
    if only_new:
        print(f"only in new: {', '.join(only_new)}")
    if movers:
        print(f"\nmovers past {args.threshold}x:")
        for r, k, a, b in sorted(movers, reverse=True):
            print(f"  {k}: {a:.2f}s -> {b:.2f}s ({r:.2f}x)")
    else:
        print(f"no movers past {args.threshold}x")


if __name__ == "__main__":
    main()
