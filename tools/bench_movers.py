"""Per-query bench history + automatic top-movers report (round-16 verdict #7).

Category rollups (the driver's BENCH_r{N}.json "queries" map) hide
single-query regressions; the per-leg walls exist in BENCH_PARSED.json but
were prose-only across rounds. This tool archives each bench run's full
per-query map to BENCH_QUERIES.jsonl and names the top movers vs the
previous archived entry, so the closing battery's round-over-round compare
is mechanical:

    python3 tools/bench_movers.py [BENCH_PARSED.json] [BENCH_QUERIES.jsonl]

Prints the common-subset total ratio (the honest round compare — new
queries inflate raw totals) and the top-5 movers by |log wall ratio|,
ignoring legs under 0.15 s on both sides (scheduling noise dominates
there). Exit code is always 0 — this is attribution, not a gate; the
bench's own window gate owns pass/fail.
"""
import json, math, os, sys, time

parsed_path = sys.argv[1] if len(sys.argv) > 1 else 'BENCH_PARSED.json'
hist_path = sys.argv[2] if len(sys.argv) > 2 else 'BENCH_QUERIES.jsonl'

parsed = json.load(open(parsed_path))
q = parsed['queries_full']
line = parsed.get('line', {})
entry = {'at': int(time.time() * 1000), 'sf': line.get('sf'),
         'io_canary_mbps': line.get('io_canary_mbps'),
         'total': line.get('value'), 'n': len(q), 'queries': q}

prev = None
if os.path.exists(hist_path):
    entries = [json.loads(l) for l in open(hist_path) if l.strip()]
    # compare like with like: the previous entry at the same scale factor
    same_sf = [e for e in entries if e.get('sf') == entry['sf']]
    if same_sf:
        prev = same_sf[-1]

with open(hist_path, 'a') as f:
    f.write(json.dumps(entry) + '\n')

if prev is None:
    print(f'archived {len(q)} query walls (sf={entry["sf"]}); '
          'no previous same-sf entry to compare against')
    sys.exit(0)

pq = prev['queries']
common = sorted(set(q) & set(pq))
new = sorted(set(q) - set(pq))
gone = sorted(set(pq) - set(q))
tot_now = sum(q[k] for k in common)
tot_prev = sum(pq[k] for k in common)
print(f'common subset: {len(common)} queries, '
      f'{tot_now:.1f}s now vs {tot_prev:.1f}s previous '
      f'({tot_now / tot_prev:.3f}x)'
      + (f'; io canary {entry.get("io_canary_mbps")} vs '
         f'{prev.get("io_canary_mbps")} MB/s' if entry.get('io_canary_mbps') else ''))
if new:
    print(f'new queries ({len(new)}): {", ".join(new)} '
          f'— {sum(q[k] for k in new):.1f}s combined')
if gone:
    print(f'removed queries ({len(gone)}): {", ".join(gone)}')

FLOOR = 0.15  # ignore legs where both walls are scheduling-noise-sized
movers = []
for k in common:
    a, b = pq[k], q[k]
    if a < FLOOR and b < FLOOR:
        continue
    # symmetric magnitude: |log ratio| ranks a 2x slowdown and a 2x
    # speedup equally; the sign in the report says which way it moved
    movers.append((abs(math.log(max(b, 1e-4) / max(a, 1e-4))), k, a, b))
movers.sort(reverse=True)
print('top movers (prev -> now):')
for _, k, a, b in movers[:5]:
    arrow = 'slower' if b > a else 'faster'
    print(f'  {k:32s} {a:7.2f}s -> {b:7.2f}s  ({b / max(a, 1e-4):.2f}x {arrow})')
