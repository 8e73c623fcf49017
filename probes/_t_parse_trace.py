import gzip, json, collections, re, sys
path = sys.argv[1]
with gzip.open(path, 'rt') as f:
    data = json.load(f)
events = data.get('traceEvents', [])
# find TPU op events: pid/tid with 'XLA Ops' style track names
names = {}
for e in events:
    if e.get('ph') == 'M' and e.get('name') == 'thread_name':
        names[(e['pid'], e.get('tid'))] = e['args'].get('name', '')
    if e.get('ph') == 'M' and e.get('name') == 'process_name':
        names[(e['pid'], None)] = e['args'].get('name', '')
tracks = collections.Counter()
for e in events:
    if e.get('ph') == 'X':
        t = names.get((e['pid'], e.get('tid')), '') or names.get((e['pid'], None), '')
        tracks[t] += 1
print('tracks:', tracks.most_common(10))
# aggregate durations on XLA op tracks
agg = collections.Counter()
cnt = collections.Counter()
total = 0.0
for e in events:
    if e.get('ph') != 'X':
        continue
    t = names.get((e['pid'], e.get('tid')), '') or names.get((e['pid'], None), '')
    if 'XLA Op' not in t and 'Steps' not in t and 'TensorFlow Op' not in t:
        continue
    if 'XLA Op' not in t:
        continue
    name = e.get('name', '')
    dur = e.get('dur', 0) / 1e3  # ms
    total += dur
    base = re.sub(r'\.\d+$', '', name)
    base = re.sub(r'\d+$', '', base)
    agg[base] += dur
    cnt[base] += 1
print(f'total XLA op time: {total:.2f} ms (3 iters)')
for k, v in agg.most_common(40):
    print(f'{v:8.3f} ms  x{cnt[k]:4d}  {k[:110]}')
