import gzip, json, collections, sys
path = sys.argv[1]
with gzip.open(path, 'rt') as f:
    data = json.load(f)
events = data.get('traceEvents', [])
names = {}
for e in events:
    if e.get('ph') == 'M' and e.get('name') == 'thread_name':
        names[(e['pid'], e.get('tid'))] = e['args'].get('name', '')
agg = collections.defaultdict(float)
cnt = collections.Counter()
info = {}
for e in events:
    if e.get('ph') != 'X':
        continue
    t = names.get((e['pid'], e.get('tid')), '')
    if 'XLA Op' not in t:
        continue
    name = e.get('name', '')
    args = e.get('args', {})
    key = name
    agg[key] += e.get('dur', 0) / 1e3
    cnt[key] += 1
    if key not in info:
        info[key] = str(args)[:220]
rows = sorted(agg.items(), key=lambda kv: -kv[1])[:35]
for k, v in rows:
    print(f'{v/3:7.3f} ms/iter x{cnt[k]//3:3d}  {k[:60]}')
    print(f'          {info[k][:200]}')
