#!/usr/bin/env python3
"""Mirror of the driver's bench-line capture: take the LAST 2000 chars of a
bench run's stdout, find the JSON line, parse it, and validate the contract
fields. Usage:

    sbt -batch "runMain graft.Bench" | tee /tmp/bench_out.txt
    python3 tools/bench_line_check.py /tmp/bench_out.txt

Exits non-zero (with a reason) if the driver-side parse would have failed.
"""
import json
import sys


def check(text: str) -> dict:
    tail = text[-2000:]
    # the driver parses the tail capture; the line must be fully inside it
    start = tail.rfind('{"metric"')
    if start < 0:
        raise SystemExit("FAIL: no '{\"metric\"' line inside the last 2000 chars "
                         "(line truncated or missing)")
    line = tail[start:].splitlines()[0].strip()
    try:
        obj = json.loads(line)
    except json.JSONDecodeError as e:
        raise SystemExit(f"FAIL: bench line is not valid JSON: {e}\n{line}")
    for field in ("metric", "value", "unit", "queries", "sf",
                  "throughput_mbps", "windows", "win_used", "win_src", "n"):
        if field not in obj:
            raise SystemExit(f"FAIL: bench line missing field '{field}'")
    if obj["unit"] != "sec" or obj["metric"] != "total":
        raise SystemExit(f"FAIL: unexpected metric/unit: {obj['metric']}/{obj['unit']}")
    if not isinstance(obj["queries"], dict) or len(obj["queries"]) > 7:
        raise SystemExit("FAIL: 'queries' must be the <=7 per-family rollup map "
                         f"(got {len(obj['queries'])} keys)")
    fam_total = sum(obj["queries"].values())
    if abs(fam_total - obj["value"]) > 0.05 * max(1.0, obj["value"]):
        raise SystemExit(f"FAIL: family rollup {fam_total:.2f} disagrees with "
                         f"total {obj['value']:.2f}")
    if len(line) > 1700:
        raise SystemExit(f"FAIL: line is {len(line)} chars (budget 1700)")
    return obj


if __name__ == "__main__":
    path = sys.argv[1] if len(sys.argv) > 1 else None
    text = open(path, encoding="utf-8", errors="replace").read() if path else sys.stdin.read()
    obj = check(text)
    print(f"OK: line parses ({len(json.dumps(obj))} chars), "
          f"{obj['n']} queries in {len(obj['queries'])} families, "
          f"total {obj['value']:.2f}s, win_src={obj['win_src']}, "
          f"canary {obj.get('io_canary_mbps')} MB/s")
