"""Summarize tools/battery_logs/*.log into one consolidated JSON.

Run after tools/run_battery.sh completes (it is armed on the
/tmp/tpu_up.sentinel watcher).  Parses every JSON line each probe
printed, groups them by probe, and recommends the bench.py --agg
config: the highest-RTF config from the probe_int4_agg matrix that
still holds the per-stream >=1.1x guarantee — flip bench.py main()'s
default and docs/STATUS.md from this output.

Usage: python tools/summarize_battery.py [--logs DIR]
"""
import argparse
import glob
import json
import os
import sys


def parse_log(path):
    rows = []
    with open(path, errors="replace") as f:
        for line in f:
            line = line.strip()
            if not (line.startswith("{") and line.endswith("}")):
                continue
            try:
                rows.append(json.loads(line))
            except json.JSONDecodeError:
                continue
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logs", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "battery_logs"))
    args = ap.parse_args()

    out = {}
    for path in sorted(glob.glob(os.path.join(args.logs, "*.log"))):
        name = os.path.splitext(os.path.basename(path))[0]
        rows = parse_log(path)
        if rows:
            out[name] = rows

    summary = {"probes": out}

    # --- bench headline -------------------------------------------------
    bench = out.get("bench", [])
    for r in reversed(bench):
        if "metric" in r and "value" in r:
            summary["bench_headline"] = {
                "metric": r["metric"], "value": r["value"],
                "error": r.get("error"),
            }
            if isinstance(r.get("extra"), dict):
                summary["bench_extras"] = r["extra"]
            break

    # --- aggregate config recommendation --------------------------------
    matrix = [r for r in out.get("int4agg", [])
              if "agg_rtf" in r and "config" in r]
    ok = [r for r in matrix if r.get("per_stream_rtf", 0) >= 1.1]
    if ok:
        best = max(ok, key=lambda r: r["agg_rtf"])
        summary["recommended_agg"] = {
            "config": best["config"], "B": best.get("B"),
            "agg_rtf": best["agg_rtf"],
            "per_stream_rtf": best.get("per_stream_rtf"),
            "action": (f"set bench.py main(agg=...) default to "
                       f"'{best['config']}'"
                       + (f" and B={best['B']}" if best.get("B", 88) != 88
                          else "")),
        }

    # --- numerics gate: int4 only defensible if GPTQ holds the line -----
    for r in out.get("int4numerics", []):
        if any(k.startswith("gptq") or k == "configs" for k in r):
            summary["int4_numerics"] = r
            break

    print(json.dumps(summary, indent=2))
    if not out:
        print("no battery logs found — has the endpoint recovered and the "
              "battery run?", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
