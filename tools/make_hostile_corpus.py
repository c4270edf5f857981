import pyarrow as pa, pyarrow.parquet as pq, os

import sys
src = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
dst = sys.argv[2] if len(sys.argv) > 2 else '/tmp/sfhostile'
t = pq.read_table(os.path.join(src, 'documents.parquet'))
base = t.to_pydict()
maxid = max(base['doc_id'])
hostile = [
    # exotic whitespace that is NOT RE2 \s: VT, FS/GS/RS/US, LS, PS, NBSP, thin space
    "alpha\u000Bbeta gamma\tdelta",
    "one\u001Ctwo\u001Dthree\u001Efour\u001Ffive six",
    "para\u2028break\u2029here\u00A0nbsp and\u2009thin space",
    # pure RE2 whitespace mixes
    "a\f\rb\n\nc  \t d",
    # empty / whitespace-only / null
    "", "   ", "\t\n\f\r ", None,
    # unicode: CJK (no spaces), emoji, accents, RTL scripts
    "你好世界这是一个测试文档没有空格",
    "emoji \U0001F600 test \U0001F389 done",
    "café résumé naïve",
    "שלום hello مرحبا world",
    # quotes/commas/newlines/backslashes
    'he said "quote, with, commas"\nand a\\backslash',
    # repeated tokens, single long token
    "dup dup dup dup dup dup dup dup dup dup",
    "x" * 300,
    # exactly at d10 window boundaries (64-char window, 32 stride)
    "y" * 64, "z" * 63, "w" * 96,
    # planted near-dup pair among the new docs
    "key agg row scan slow fast table value part hash join order window",
    "agg row scan slow fast table value part hash join order window end",
    # stopword-heavy and digit/symbol-heavy
    "the a an and or of to in is it the a an and",
    "123 456 789 !!! ### $$$ 0.5 -3 1e9",
    # Unicode normalization hostility (t14): DECOMPOSED forms (e+U+0301,
    # i+U+0308) that NFC must recompose identically on both engines, a
    # mixed composed/decomposed pair, and Hangul in decomposed jamo
    "cafe\u0301 re\u0301sume\u0301 nai\u0308ve decomposed forms",
    "caf\u00e9 cafe\u0301 mixed composed and decomposed in one doc",
    "\u1112\u1161\u11ab\u1100\u1173\u11af jamo to syllables",
    # Locale-dependent case folding (t* tokenizer/langid/lower() parity):
    # Turkish dotted/dotless I \u2014 lower('I') is 'i' in the root locale both
    # engines must use, never Turkish dotless '\u0131'; upper('i') likewise
    "Istanbul I\u0131k \u0130stanbul TITLE title dotted and dotless",
    # Greek final sigma: lower('\u03a3') is context-sensitive in full Unicode
    # case mapping (\u03c2 word-final, \u03c3 elsewhere) \u2014 pins whichever rule the
    # engines apply to agree
    "\u03a3\u03af\u03c3\u03c5\u03c6\u03bf\u03c2 \u03a3\u0395\u03a1\u0399\u03a6 sigma \u03c3 \u03c2 endings",
    # Full-width Latin + digits (U+FF21.., U+FF10..): not ASCII, so ASCII
    # tokenizers/punct counters must treat them as non-ASCII symbols, and
    # lower() maps them within the full-width block
    "\uff28\uff25\uff2c\uff2c\uff2f \uff37\uff4f\uff52\uff4c\uff44 \uff11\uff12\uff13 fullwidth",
    # German sharp s: upper('\u00df') expands to 'SS' under full case mapping \u2014
    # a length-changing case op both engines must agree on
    "stra\u00dfe STRASSE Ma\u00df MASS sharp s",
    # --- astral-plane (SMP) rows: every codepoint here is a SURROGATE PAIR
    # in UTF-16, so any code that walks chars instead of codepoints, or
    # counts len() in UTF-16 units vs codepoints, diverges. t18 documents
    # astral chars as deliberately uncounted (BMP-only regex agreement);
    # these rows prove that behavior cross-engine instead of assuming it.
    # ZWJ sequence (rainbow flag = flag + VS16 + ZWJ + rainbow), skin-tone
    # modifier, family (4 people + 3 ZWJ), keycap sequence
    "\U0001F3F3\ufe0f\u200d\U0001F308 flag \U0001F44B\U0001F3FD wave "
    "\U0001F468\u200d\U0001F469\u200d\U0001F467\u200d\U0001F466 family 1\ufe0f\u20e3 keycap",
    # CJK Extension B (U+20000..): surrogate-pair Han ideographs mixed with
    # BMP CJK \u2014 script-mix accounting must not split a pair
    "\U00020000\U00020001\U0002A6D6 ext-b han \u4e2d\u6587 bmp mixed",
    # mathematical alphanumerics (U+1D400..): astral LETTERS \u2014 tokenizers
    # that class them as word chars vs symbols must agree
    "\U0001D400\U0001D401\U0001D402 math bold \U0001D7CE\U0001D7CF astral digits",
    # astral-only document (no BMP text at all except spaces)
    "\U0001F600 \U0001F601 \U0001F602 \U0001F923 \U0001F60A",
    # lone-surrogate-adjacent hazard: astral at string BOUNDARIES (first and
    # last codepoint) where substring/window code clips most easily, plus an
    # astral char straddling the d10 64-char window boundary position
    "\U0001F680" + "b" * 62 + "\U0001F680",
    # combining marks ON astral bases + variation selectors supplementary
    "\U0001F1E9\U0001F1EA flags de \U0001F1EF\U0001F1F5 jp regional pairs",
    # --- size-stress rows: a LONG multi-line document (500 distinct lines
    # — line-based ops like boilerplate detection walk real line volume,
    # window ops get ~1000 stride windows) and a document whose text is one
    # huge unbroken token (32 KB — token-length accumulators, BPE runs, and
    # fixed-width window hashing must not choke on a single token)
    "\n".join(f"line {i} of the long stress document body text" for i in range(500)),
    "t" + "ok" * 16000,
]
# HOT-KEY SKEW (round 17): one lang carries ~90% of documents — the
# dominant-language regime every real web corpus has, and the first
# thing that breaks lang-partitioned windows (t09/t27 packing, t22/t33
# mixtures) at scale. Applied to the BASE rows deterministically
# (doc_id % 10 != 0 -> 'en') before the planted hostile rows, whose
# cycling langs carry their own per-row intent. The DuckDB oracle
# recomputes on the same parquet, so this is a pure execution-skew
# probe, not an oracle change.
base['lang'] = ['en' if (d is not None and d % 10 != 0) else l
                for d, l in zip(base['doc_id'], base['lang'])]

langs = ['en', 'es', 'de', 'fr', 'zh']
for i, txt in enumerate(hostile):
    base['doc_id'].append(maxid + 1 + i)
    base['text'].append(txt)
    base['lang'].append(langs[i % 5])
    base['source'].append('hostile')
    base['n_chars'].append(len(txt) if txt is not None else None)

# LONG-CHAIN pair graph (round 17): 101 docs over a sliding 10-token
# window with stride 2 — adjacent docs share 8 tokens (6 of 10 trigram
# shingles, Jaccard 0.6 >= the 0.5 pair threshold) while docs two apart
# share only 6 tokens (4 of 12 shingles, 0.33 < threshold), so the
# near-dup graph contains a PATH of diameter 100. Plain min-label
# propagation would exhaust the closure's 25-round budget on this
# component; the pointer-jumping path closes it in ~10 rounds and the
# oracle's recursive reach computes the same 101-member cluster — the
# at-scale chain regime exercised on the driver-gated corpus itself.
chain_tokens = [f"chainseq{n}" for n in range(212)]
for i in range(101):
    txt = " ".join(chain_tokens[2 * i:2 * i + 10])
    base['doc_id'].append(maxid + 100 + i)
    base['text'].append(txt)
    base['lang'].append(langs[i % 5])
    base['source'].append('chain')
    base['n_chars'].append(len(txt))

# hostile SOURCE values (round 15): source feeds URL synthesis (d22 — '?'
# placement, '#' fragments, '&' params, case, NULL hosts vs blocklists),
# try_cast parsing (t22), and null accounting (t19/t21). A '?'-bearing
# source diverged the d22 engines before the after-FIRST-'?' alignment;
# these rows keep that class of bug out permanently.
hostile_sources = [
    None,              # NULL host: anti-join vs NOT IN must agree
    'a?b?c',           # query-string split: after FIRST '?' on both engines
    'SRC9',            # host lowering
    'src&x=1#y',       # param separator + fragment inside the host label
    'src 3',           # embedded space (never matches the blocklist)
    'src3',            # collides with a BLOCKLISTED host -> row must drop
]
for j, s in enumerate(hostile_sources):
    txt = f"hostile source row {j} the quick brown fox"
    base['doc_id'].append(maxid + 1 + len(hostile) + j)
    base['text'].append(txt)
    base['lang'].append(langs[j % 5])
    base['source'].append(s)
    base['n_chars'].append(len(txt))

schema = pa.schema([('doc_id', pa.int64()), ('text', pa.string()),
                    ('lang', pa.string()), ('source', pa.string()),
                    ('n_chars', pa.int64())])
pq.write_table(pa.table(base, schema=schema), os.path.join(dst, 'documents.parquet'))
print('wrote', len(base['doc_id']), 'docs')

# hostile EMBEDDINGS (round 15): extreme norms and exact direction copies.
# Cosine is scale-invariant but L2 cells/means are not — these rows caught
# two real bugs on first contact: s09's DECIMAL(18,6) mean overflowed (ANSI
# kill) on the 1e15 component, and s16's un-normalized cell assignment let
# re-scaled near-duplicates escape their twin's cell. No NaN/Inf/zero
# vectors: those make cosine undefined, which both engines treat as
# "never similar" but order differently — a separate contract.
et = pq.read_table(os.path.join(src, 'embeddings.parquet'))
e = et.to_pydict()
dim = len(e['embedding'][0])
emaxid = max(e['vec_id'])
v0 = list(e['embedding'][0])
hostile_vecs = [
    [x * 1e-20 for x in v0],                        # tiny norm, same direction
    [x * 1e18 for x in v0],                         # huge norm, same direction
    list(v0),                                       # exact duplicate, new id
    [-x for x in v0],                               # exact negation (cos -1)
    [1e15 if i == 0 else 1e-3 for i in range(dim)], # one dominant component
]
for j, v in enumerate(hostile_vecs):
    e['vec_id'].append(emaxid + 1 + j)
    e['embedding'].append([float(x) for x in v])
    e['label'].append(j % 4)
pq.write_table(pa.table(e, schema=et.schema), os.path.join(dst, 'embeddings.parquet'))
print('wrote', len(e['vec_id']), 'vectors')

# hostile EVENTS (round 15): NULL keys/values/types/props, malformed JSON,
# boundary timestamps, negative and large-but-in-domain values. Found on
# first contact: NULL user_id killed st02/st07 outright (typed Long key
# asserts non-null — both now route null-keyed events to the documented
# dead-letter rule), and q16's oracle threw on non-JSON props where Spark
# returns NULL (json_valid guard added). Timestamps stay INSIDE the
# corpus's existing range: a far-future ts legitimately advances
# watermarks and drops the rest of the corpus as late — that is the
# watermark CONTRACT (st06 proves it on purpose), not an oracle-parity
# target, so the skew budget is respected here.
ev = pq.read_table(os.path.join(src, 'events.parquet'))
g = ev.to_pydict()
gmax = max(g['event_id'])
umax = max(u for u in g['user_id'] if u is not None)
# HOT-KEY SKEW (round 17): one user carries ~30% of events — the viral-
# user regime that makes user-partitioned windows (q20/q55/q56) and
# per-user streaming state (st19's sort-the-group processor) meet a
# mega-partition. Deterministic reassignment of BASE rows (event_id %
# 10 < 3) before the planted hostile rows, whose special users carry
# their own intent; NULL users stay NULL (the dead-letter contract).
hot_user = umax + 100
g['user_id'] = [hot_user if (u is not None and e % 10 < 3) else u
                for e, u in zip(g['event_id'], g['user_id'])]
ts_min, ts_max = min(g['ts']), max(g['ts'])
ts_mid = g['ts'][0]
hostile_events = [
    dict(event_id=gmax+1, ts=ts_mid, user_id=None, event_type='click', value=1.5, props='{}'),
    dict(event_id=gmax+2, ts=ts_mid, user_id=umax+1, event_type=None, value=2.5, props=None),
    dict(event_id=gmax+3, ts=ts_mid, user_id=umax+1, event_type='view', value=None, props='{"k":1}'),
    dict(event_id=gmax+4, ts=ts_min, user_id=umax+2, event_type='click', value=0.25, props='{}'),
    dict(event_id=gmax+5, ts=ts_max, user_id=umax+2, event_type='view', value=0.75, props='{}'),
    dict(event_id=gmax+6, ts=ts_mid, user_id=umax+3, event_type='click', value=999999.999999, props='{}'),
    dict(event_id=gmax+7, ts=ts_mid, user_id=umax+3, event_type='a b\nc', value=-42.5, props='not json'),
]
for r in hostile_events:
    for k in g: g[k].append(r[k])
pq.write_table(pa.table(g, schema=ev.schema), os.path.join(dst, 'events.parquet'))
print('wrote', len(g['event_id']), 'events')

# hostile RELATIONAL rows (round 16): the q-family's joins, group keys,
# measures, and orderings have only ever met the clean TPC-H-ish fixture.
# New input class: NULL join keys (inner joins drop them, outer joins keep
# them, null-safe joins match them — three different contracts), NULL
# group keys (their own rollup/cube group), NULL measures (sum skips,
# COUNT(*) does not), NULL dates (window orders + range joins), empty
# strings (NOT null — a distinct group), negative and zero measures, and
# FULL-ROW duplicates (fan out joins; safe for LIMIT/window queries only
# because every column ties, so any rank assignment yields the same row
# set). Values stay inside dsum's DECIMAL(18,6) domain — beyond-contract
# magnitudes are the embeddings probe's territory (davg), not this one's.
ot = pq.read_table(os.path.join(src, 'orders.parquet'))
o = ot.to_pydict()
omax = max(o['o_orderkey'])
od_mid = o['o_orderdate'][0]
od_min = min(d for d in o['o_orderdate'] if d is not None)
some_cust = o['o_custkey'][0]
hostile_orders = [
    # NULL custkey: drops from inner joins, survives outer, q44's <=> matches
    dict(o_orderkey=omax+1, o_custkey=None, o_orderstatus='O',
         o_totalprice=1234.5, o_orderdate=od_mid, o_orderpriority='1-URGENT'),
    # NULL group keys: rollup/cube/count-distinct must bucket them
    dict(o_orderkey=omax+2, o_custkey=some_cust, o_orderstatus=None,
         o_totalprice=2345.6, o_orderdate=od_mid, o_orderpriority=None),
    # NULL measure: sums skip it, COUNT(*) does not
    dict(o_orderkey=omax+3, o_custkey=some_cust, o_orderstatus='F',
         o_totalprice=None, o_orderdate=od_mid, o_orderpriority='2-HIGH'),
    # NULL date: window orders and as-of joins must place it per NULLS rule
    dict(o_orderkey=omax+4, o_custkey=some_cust, o_orderstatus='O',
         o_totalprice=999999999.999999, o_orderdate=None, o_orderpriority='3-MEDIUM'),
    # empty strings are NOT null: distinct group, distinct pivot label
    dict(o_orderkey=omax+5, o_custkey=some_cust, o_orderstatus='',
         o_totalprice=0.0, o_orderdate=od_min, o_orderpriority=''),
    # a group whose EVERY measure is NULL: percentile/aggregate queries
    # must EMIT it (with NULL stats), not drop it — the round-16 review
    # found rankedForPct silently losing exactly this group
    dict(o_orderkey=omax+6, o_custkey=some_cust, o_orderstatus='X',
         o_totalprice=None, o_orderdate=od_mid, o_orderpriority='4-LOW'),
]
# full-row duplicate of an existing mid-table row: joins fan out, ties are
# total so ordering queries stay deterministic
dup_i = len(o['o_orderkey']) // 2
hostile_orders.append({k: o[k][dup_i] for k in o})
for r in hostile_orders:
    for k in o: o[k].append(r[k])
pq.write_table(pa.table(o, schema=ot.schema), os.path.join(dst, 'orders.parquet'))
print('wrote', len(o['o_orderkey']), 'orders')

lt = pq.read_table(os.path.join(src, 'lineitem.parquet'))
l = lt.to_pydict()
ls_mid = l['l_shipdate'][0]
hostile_lineitems = [
    # NULL part/supp join keys on a REAL order: multi-join revenue paths
    dict(l_orderkey=omax+1, l_partkey=None, l_suppkey=None, l_linenumber=1,
         l_quantity=3.0, l_extendedprice=100.0, l_discount=0.05, l_tax=0.01,
         l_returnflag='N', l_linestatus='O', l_shipdate=ls_mid),
    # NULL measures under real group keys
    dict(l_orderkey=omax+2, l_partkey=l['l_partkey'][0], l_suppkey=l['l_suppkey'][0],
         l_linenumber=1, l_quantity=None, l_extendedprice=None, l_discount=None,
         l_tax=None, l_returnflag='R', l_linestatus='F', l_shipdate=ls_mid),
    # NULL group keys under real measures
    dict(l_orderkey=omax+3, l_partkey=l['l_partkey'][1], l_suppkey=l['l_suppkey'][1],
         l_linenumber=1, l_quantity=7.0, l_extendedprice=250.5, l_discount=0.0,
         l_tax=0.02, l_returnflag=None, l_linestatus=None, l_shipdate=ls_mid),
    # NULL ship date: range joins / date functions / frame orders
    dict(l_orderkey=omax+4, l_partkey=l['l_partkey'][2], l_suppkey=l['l_suppkey'][2],
         l_linenumber=1, l_quantity=1.0, l_extendedprice=901.82, l_discount=0.1,
         l_tax=0.0, l_returnflag='A', l_linestatus='F', l_shipdate=None),
    # negative and zero measures: sums/means/percentiles must carry sign
    dict(l_orderkey=omax+5, l_partkey=l['l_partkey'][3], l_suppkey=l['l_suppkey'][3],
         l_linenumber=1, l_quantity=-5.0, l_extendedprice=-100.0, l_discount=0.5,
         l_tax=0.08, l_returnflag='R', l_linestatus='O', l_shipdate=ls_mid),
    dict(l_orderkey=omax+5, l_partkey=l['l_partkey'][4], l_suppkey=l['l_suppkey'][4],
         l_linenumber=2, l_quantity=0.0, l_extendedprice=0.0, l_discount=0.0,
         l_tax=0.0, l_returnflag='N', l_linestatus='O', l_shipdate=ls_mid),
]
ldup_i = len(l['l_orderkey']) // 2
hostile_lineitems.append({k: l[k][ldup_i] for k in l})
for r in hostile_lineitems:
    for k in l: l[k].append(r[k])
pq.write_table(pa.table(l, schema=lt.schema), os.path.join(dst, 'lineitem.parquet'))
print('wrote', len(l['l_orderkey']), 'lineitems')

# hostile DIMENSION rows (round 16, second relational wave): customer/
# supplier/part feed the join/string/pivot queries that orders/lineitem
# don't cover — NULL dimension join keys (outer joins must keep the row,
# inner must drop it), NULL names through the string-function battery
# (upper/length/regexp on NULL stay NULL on both engines), empty-string
# segments (their own group, not null), and a full-row duplicate
# (deterministic join fan-out). Keys above the existing max so no real
# key's join cardinality changes.
def _augment(table, rows):
    t2 = pq.read_table(os.path.join(src, f'{table}.parquet'))
    d2 = t2.to_pydict()
    for r in rows:
        for k in d2: d2[k].append(r[k])
    dup = {k: d2[k][len(d2[k]) // 2] for k in d2}
    for k in d2: d2[k].append(dup[k])
    pq.write_table(pa.table(d2, schema=t2.schema), os.path.join(dst, f'{table}.parquet'))
    print('wrote', len(d2[list(d2)[0]]), table)

cmax = max(pq.read_table(os.path.join(src, 'customer.parquet'))['c_custkey'].to_pylist())
_augment('customer', [
    dict(c_custkey=cmax+1, c_name=None, c_nationkey=None, c_acctbal=None, c_mktsegment=None),
    dict(c_custkey=cmax+2, c_name='', c_nationkey=0, c_acctbal=-10.5, c_mktsegment=''),
    dict(c_custkey=cmax+3, c_name='he said "q,u\note"', c_nationkey=1, c_acctbal=0.0,
         c_mktsegment='BUILDING'),
])
smax = max(pq.read_table(os.path.join(src, 'supplier.parquet'))['s_suppkey'].to_pylist())
_augment('supplier', [
    dict(s_suppkey=smax+1, s_name=None, s_nationkey=None, s_acctbal=None),
    dict(s_suppkey=smax+2, s_name='', s_nationkey=0, s_acctbal=-1.25),
])
pmax = max(pq.read_table(os.path.join(src, 'part.parquet'))['p_partkey'].to_pylist())
_augment('part', [
    dict(p_partkey=pmax+1, p_name=None, p_brand=None, p_type=None, p_size=None,
         p_retailprice=None),
    dict(p_partkey=pmax+2, p_name='', p_brand='', p_type='', p_size=0,
         p_retailprice=0.0),
])
