"""Compose a per-entry-min scale record from N same-day back-to-back
bench legs (driver-side tooling, never imported by engine code).

Scale-soak protocol (r19): single-pass legs at sf1+ carry EPISODIC
per-entry excursions even on a settled box (an entry can read 2-16x
its neighbor-leg value with the load guard clean and zero ZGC
allocation stalls in -Xlog:gc; different entries each leg), and the
first leg after any box transition reads up to 2.2x high across the
board. So: run >=3 legs back-to-back via run_bench.sh sf10, DISCARD
the first (commit it as BENCH_sf*_settle_*.json), and compose the
record as the per-entry MIN over the settled legs — convergence is
checked by how little the last leg moves the min-sum (r19 sf1:
B,D=500.7 -> B,C,D=498.3, i.e. +leg C moved it 2.4 s).

Usage: python3 tools/compose_min.py <out.json> <legB.json> <legC.json> ...
"""
import json, sys
out, legs = sys.argv[1], sys.argv[2:]
ds = [json.load(open(p)) for p in legs]
base = ds[0]
keys = base['queries'].keys()
q = {k: min(d['queries'][k] for d in ds) for k in keys}
rec = {
  'metric': base['metric'], 'value': round(sum(q.values()), 4),
  'unit': base['unit'], 'queries': q, 'sf': base['sf'],
  'stat': f'per-entry min over {len(ds)} settled legs',
  'gc': base['gc'], 'pretouch': base.get('pretouch'),
  'legs': [{'file': p.split('/')[-1], 'total': round(sum(d['queries'].values()), 2),
            'load': d.get('load')} for p, d in zip(legs, ds)],
  'failures': {},
}
assert all(not d['failures'] for d in ds), 'leg had failures'
assert len({frozenset(d['queries']) for d in ds}) == 1
json.dump(rec, open(out, 'w'))
print(out, rec['value'])
