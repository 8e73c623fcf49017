import gzip, json, sys
path = sys.argv[1]
with gzip.open(path, 'rt') as f:
    data = json.load(f)
events = data.get('traceEvents', [])
names = {}
for e in events:
    if e.get('ph') == 'M' and e.get('name') == 'thread_name':
        names[(e['pid'], e.get('tid'))] = e['args'].get('name', '')
want = {'fusion.6', 'fusion.83', 'fusion.42', 'fusion.43', 'fusion.99',
        'fusion.393', 'fusion.1308', 'copy.2725', 'copy.3845', 'fusion.2617',
        'fusion.1301', 'fusion.585'}
seen = set()
for e in events:
    if e.get('ph') != 'X':
        continue
    t = names.get((e['pid'], e.get('tid')), '')
    if 'XLA Op' not in t:
        continue
    n = e.get('name', '')
    if n in want and n not in seen:
        seen.add(n)
        ln = e.get('args', {}).get('long_name', '')
        print(f'== {n}: {ln[:600]}')
        print()
