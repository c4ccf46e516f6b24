# Brute-force hunt for the .hyper object-arena slot hash (HYPER_FORMAT.md
# §3 item 4). Evidence: 16 (type, ordinal, tableIndex) -> slot pairs from
# /root/reference/complaints_by_bank.hyper, catalog relation oids
# 10004/10005 for tables 0/1. Round-7 additions over the earlier sweep:
# oid-based key material, PostgreSQL hash_any (Jenkins lookup3) and other
# classic byte hashes, and open-addressing displacement tolerance (a key
# may sit at hash+j if slots hash..hash+j-1 are occupied by other keys).
#
# All hash implementations below are from public specifications
# (FNV, CRC32/C Castagnoli, xxHash64, MurmurHash2/3, Jenkins lookup3 as
# used by PostgreSQL hash_any, DJB2, SDBM, one-at-a-time, SplitMix64).
import struct, zlib, itertools, sys

M64 = (1 << 64) - 1
M32 = (1 << 32) - 1

# ---------------- evidence ----------------
# slot <- (type, ordinal, tableIndex)
EVID = [
    (175, 1, 0, 0), (95, 2, 0, 0),
    (139, 3, 0, 0), (10, 3, 0, 1),
    (191, 4, 0, 0), (51, 4, 0, 1),
    (98, 4, 1, 0), (28, 4, 1, 1),
    (21, 4, 2, 0), (75, 4, 2, 1),
    (199, 4, 3, 0), (246, 4, 3, 1),
    (130, 4, 4, 0), (136, 4, 4, 1),
    (87, 5, 0, 0), (127, 5, 0, 1),
]
OIDS = {0: 10004, 1: 10005}   # relation oids by tableIndex
NS_OID = 10001                # namespace oid
# genesis arena: same keys (type 1 -> 175, type 2 -> 95) with exponent 8

# ---------------- hashes ----------------
def fnv1a64(b):
    h = 0xcbf29ce484222325
    for c in b: h = ((h ^ c) * 0x100000001b3) & M64
    return h
def fnv164(b):
    h = 0xcbf29ce484222325
    for c in b: h = ((h * 0x100000001b3) & M64) ^ c
    return h
def fnv1a32(b):
    h = 0x811c9dc5
    for c in b: h = ((h ^ c) * 0x01000193) & M32
    return h
def djb2(b):
    h = 5381
    for c in b: h = ((h * 33) + c) & M64
    return h
def djb2x(b):
    h = 5381
    for c in b: h = ((h * 33) ^ c) & M64
    return h
def sdbm(b):
    h = 0
    for c in b: h = (c + (h << 6) + (h << 16) - h) & M64
    return h
def oaat(b):  # Jenkins one-at-a-time
    h = 0
    for c in b:
        h = (h + c) & M32; h = (h + (h << 10)) & M32; h ^= h >> 6
    h = (h + (h << 3)) & M32; h ^= h >> 11; h = (h + (h << 15)) & M32
    return h
def javahash(b):
    h = 0
    for c in b: h = (h * 31 + c) & M32
    return h
def crc32(b):  return zlib.crc32(b) & M32

_CRC32C_TABLE = []
def _crc32c_init():
    poly = 0x82F63B78
    for n in range(256):
        c = n
        for _ in range(8):
            c = (c >> 1) ^ poly if c & 1 else c >> 1
        _CRC32C_TABLE.append(c)
_crc32c_init()
def crc32c_raw(b, init=0):
    c = init & M32
    for x in b: c = _CRC32C_TABLE[(c ^ x) & 0xff] ^ (c >> 8)
    return c & M32
def crc32c(b):   return crc32c_raw(b, 0xFFFFFFFF) ^ 0xFFFFFFFF
def crc32c0(b):  return crc32c_raw(b, 0)

def rot64(x, r): return ((x << r) | (x >> (64 - r))) & M64
def xxh64(b, seed=0):
    P1,P2,P3,P4,P5 = (11400714785074694791, 14029467366897019727,
                      1609587929392839161, 9650029242287828579,
                      2870177450012600261)
    n = len(b); i = 0
    if n >= 32:
        v1 = (seed + P1 + P2) & M64; v2 = (seed + P2) & M64
        v3 = seed & M64; v4 = (seed - P1) & M64
        while i <= n - 32:
            for vi, off in ((0,0),(1,8),(2,16),(3,24)):
                pass
            v1 = (rot64((v1 + struct.unpack_from('<Q', b, i)[0] * P2) & M64, 31) * P1) & M64
            v2 = (rot64((v2 + struct.unpack_from('<Q', b, i+8)[0] * P2) & M64, 31) * P1) & M64
            v3 = (rot64((v3 + struct.unpack_from('<Q', b, i+16)[0] * P2) & M64, 31) * P1) & M64
            v4 = (rot64((v4 + struct.unpack_from('<Q', b, i+24)[0] * P2) & M64, 31) * P1) & M64
            i += 32
        h = (rot64(v1,1) + rot64(v2,7) + rot64(v3,12) + rot64(v4,18)) & M64
        for v in (v1,v2,v3,v4):
            h = ((h ^ (rot64((v * P2) & M64, 31) * P1) & M64) * P1 + P4) & M64
    else:
        h = (seed + P5) & M64
    h = (h + n) & M64
    while i <= n - 8:
        h = ((rot64(h ^ (rot64((struct.unpack_from('<Q', b, i)[0] * P2) & M64, 31) * P1) & M64, 27) * P1) + P4) & M64
        i += 8
    if i <= n - 4:
        h = ((rot64(h ^ (struct.unpack_from('<I', b, i)[0] * P1) & M64, 23) * P2) + P3) & M64
        i += 4
    while i < n:
        h = (rot64(h ^ (b[i] * P5) & M64, 11) * P1) & M64
        i += 1
    h ^= h >> 33; h = (h * P2) & M64; h ^= h >> 29
    h = (h * P3) & M64; h ^= h >> 32
    return h

def murmur2_64a(b, seed=0):
    m = 0xc6a4a7935bd1e995; r = 47
    h = (seed ^ (len(b) * m)) & M64
    n8 = len(b) // 8
    for i in range(n8):
        k = struct.unpack_from('<Q', b, i*8)[0]
        k = (k * m) & M64; k ^= k >> r; k = (k * m) & M64
        h = ((h ^ k) * m) & M64
    tail = b[n8*8:]
    if tail:
        h ^= int.from_bytes(tail, 'little')
        h = (h * m) & M64
    h ^= h >> r; h = (h * m) & M64; h ^= h >> r
    return h

def rot32(x, r): return ((x << r) | (x >> (32 - r))) & M32
def murmur3_32(b, seed=0):
    c1, c2 = 0xcc9e2d51, 0x1b873593
    h = seed & M32
    n4 = len(b) // 4
    for i in range(n4):
        k = struct.unpack_from('<I', b, i*4)[0]
        k = (k * c1) & M32; k = rot32(k, 15); k = (k * c2) & M32
        h ^= k; h = rot32(h, 13); h = (h * 5 + 0xe6546b64) & M32
    k = 0
    tail = b[n4*4:]
    for i, c in enumerate(tail): k |= c << (8 * i)
    if tail:
        k = (k * c1) & M32; k = rot32(k, 15); k = (k * c2) & M32; h ^= k
    h ^= len(b)
    h ^= h >> 16; h = (h * 0x85ebca6b) & M32
    h ^= h >> 13; h = (h * 0xc2b2ae35) & M32
    h ^= h >> 16
    return h

def lookup3(b, initval=0):
    # Bob Jenkins lookup3 hashlittle, as PostgreSQL hash_any uses
    def mix(a, bb, c):
        a = (a - c) & M32; a ^= rot32(c, 4);  c = (c + bb) & M32
        bb = (bb - a) & M32; bb ^= rot32(a, 6);  a = (a + c) & M32
        c = (c - bb) & M32; c ^= rot32(bb, 8);  bb = (bb + a) & M32
        a = (a - c) & M32; a ^= rot32(c, 16); c = (c + bb) & M32
        bb = (bb - a) & M32; bb ^= rot32(a, 19); a = (a + c) & M32
        c = (c - bb) & M32; c ^= rot32(bb, 4);  bb = (bb + a) & M32
        return a, bb, c
    def final(a, bb, c):
        c ^= bb; c = (c - rot32(bb, 14)) & M32
        a ^= c;  a = (a - rot32(c, 11)) & M32
        bb ^= a; bb = (bb - rot32(a, 25)) & M32
        c ^= bb; c = (c - rot32(bb, 16)) & M32
        a ^= c;  a = (a - rot32(c, 4)) & M32
        bb ^= a; bb = (bb - rot32(a, 14)) & M32
        c ^= bb; c = (c - rot32(bb, 24)) & M32
        return c
    ln = len(b)
    a = bb = c = (0xdeadbeef + ln + initval) & M32
    i = 0
    while ln - i > 12:
        a = (a + struct.unpack_from('<I', b, i)[0]) & M32
        bb = (bb + struct.unpack_from('<I', b, i+4)[0]) & M32
        c = (c + struct.unpack_from('<I', b, i+8)[0]) & M32
        a, bb, c = mix(a, bb, c)
        i += 12
    tail = b[i:] + b'\x00' * (12 - (ln - i))
    if ln - i > 0:
        a = (a + struct.unpack_from('<I', tail, 0)[0]) & M32
        bb = (bb + struct.unpack_from('<I', tail, 4)[0]) & M32
        c = (c + struct.unpack_from('<I', tail, 8)[0]) & M32
        c = final(a, bb, c)
    return c

def splitmix64(x):
    x = (x + 0x9E3779B97F4A7C15) & M64
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & M64
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & M64
    return x ^ (x >> 31)
def fmix64(x):
    x ^= x >> 33; x = (x * 0xff51afd7ed558ccd) & M64
    x ^= x >> 33; x = (x * 0xc4ceb9fe1a85ec53) & M64
    return x ^ (x >> 33)

BYTE_HASHES = [
    ('fnv1a64', fnv1a64), ('fnv164', fnv164), ('fnv1a32', fnv1a32),
    ('djb2', djb2), ('djb2x', djb2x), ('sdbm', sdbm), ('oaat', oaat),
    ('javahash', javahash), ('crc32', crc32), ('crc32c', crc32c),
    ('crc32c0', crc32c0),
    ('xxh64', xxh64), ('xxh64s1', lambda b: xxh64(b, 1)),
    ('mur2', murmur2_64a), ('mur2s1', lambda b: murmur2_64a(b, 1)),
    ('mur3_32', murmur3_32),
    ('lookup3', lookup3), ('lookup3s', lambda b: lookup3(b, 3923095)),
]
INT_HASHES = [
    ('splitmix64', splitmix64), ('fmix64', fmix64),
    ('fib', lambda x: (x * 11400714819323198485) & M64),
    ('knuth32', lambda x: (x * 2654435761) & M64),
    ('identity', lambda x: x),
]

# ---------------- key serializations ----------------
def serializations(t, o, i):
    oid = OIDS[i]
    word = (t << 48) | o
    yield 'rec16', struct.pack('<QII', word, 0, i)          # stored record head
    yield 'rec16oid', struct.pack('<QII', word, 0, oid)
    yield 'w+i', struct.pack('<QQ', word, i)
    yield 'w+oid', struct.pack('<QQ', word, oid)
    yield 'w|i32', struct.pack('<Q', word | (i << 32))
    yield 'w|oid32', struct.pack('<Q', (word | (oid << 32)) & M64)
    yield 'tio', struct.pack('<III', t, i, o)
    yield 'toi', struct.pack('<III', t, o, i)
    yield 'oid_t_o', struct.pack('<III', oid, t, o)
    yield 't_oid_o', struct.pack('<III', t, oid, o)
    yield 'oid_o', struct.pack('<II', oid, o)
    yield 'o_oid', struct.pack('<II', o, oid)
    yield 'q_t_oid_o', struct.pack('<QQQ', t, oid, o)
    yield 'q_toi', struct.pack('<QQQ', t, o, i)
    yield 't8o8oid8', struct.pack('<QQQ', t, o, oid)
    yield 'u64pack', struct.pack('<Q', (t << 56) | (o << 32) | oid)
    yield 'u64pack2', struct.pack('<Q', (oid << 32) | (t << 16) | o)
    yield 'str', f'{t}/{o}/{i}'.encode()
    yield 'stroid', f'{t}/{o}/{oid}'.encode()

def int_keys(t, o, i):
    oid = OIDS[i]
    word = (t << 48) | o
    yield 'w|i32', word | (i << 32)
    yield 'w|oid32', (word | (oid << 32)) & M64
    yield 'w+i_x', word ^ (i * 0x9E3779B97F4A7C15 & M64)
    yield 'w+oid_x', word ^ (oid * 0x9E3779B97F4A7C15 & M64)
    yield 'pack', (t << 56) | (o << 32) | oid
    yield 'pack2', (oid << 32) | (t << 16) | o
    yield 'pack3', (t << 40) | (oid << 16) | o

# ---------------- scoring ----------------
def windows(h):
    # every aligned and unaligned 8-bit window of the hash value
    hv = h & M64
    for k in range(0, 57):
        yield k, (hv >> k) & 0xff
    yield 'mod251', hv % 251
    yield 'mod256hi32', (hv >> 32) % 256

def score(slots_by_key, derived):
    """exact matches + probe-tolerant matches (insertion-order unknown,
    so tolerate displacement: observed slot within [h, h+3] mod 256)."""
    exact = probe = 0
    for key, slot in slots_by_key:
        h = derived[key]
        if slot == h: exact += 1
        if ((slot - h) % 256) <= 3: probe += 1
    return exact, probe

def main():
    keys = [(t, o, i) for (_, t, o, i) in EVID]
    slots = [s for (s, _, _, _) in EVID]
    pairs = list(zip(keys, slots))
    best = []
    # byte-serialization x byte-hash
    ser_names = [n for n, _ in serializations(4, 0, 0)]
    for sname in ser_names:
        sermap = {}
        for (t, o, i) in keys:
            for n, b in serializations(t, o, i):
                if n == sname: sermap[(t, o, i)] = b
        for hname, fn in BYTE_HASHES:
            hv = {k: fn(sermap[k]) for k in keys}
            for wname0 in windows(0):
                pass
            # iterate windows by recomputing per key
            win_list = [w for w, _ in windows(0)]
            for w in win_list:
                derived = {}
                for k in keys:
                    for wn, val in windows(hv[k]):
                        if wn == w: derived[k] = val; break
                e, p = score(pairs, derived)
                if e >= 12 or p == 16:
                    best.append((e, p, sname, hname, w))
    # int-key x int-hash
    ik_names = [n for n, _ in int_keys(4, 0, 0)]
    for kname in ik_names:
        kmap = {}
        for (t, o, i) in keys:
            for n, v in int_keys(t, o, i):
                if n == kname: kmap[(t, o, i)] = v
        for hname, fn in INT_HASHES:
            hv = {k: fn(kmap[k]) for k in keys}
            win_list = [w for w, _ in windows(0)]
            for w in win_list:
                derived = {}
                for k in keys:
                    for wn, val in windows(hv[k]):
                        if wn == w: derived[k] = val; break
                e, p = score(pairs, derived)
                if e >= 12 or p == 16:
                    best.append((e, p, kname, hname, w))
    best.sort(reverse=True)
    if not best:
        print('no candidate >= 12/16 exact or 16/16 probe-tolerant')
    for e, p, sname, hname, w in best[:20]:
        print(f'exact={e}/16 probe={p}/16  ser={sname} hash={hname} window={w}')

if __name__ == '__main__':
    main()

# ---------------- round-7 extension: folds + sequential-oid attack ----
def folds(h):
    hv = h & M64
    yield 'xf8', (hv ^ (hv >> 8) ^ (hv >> 16) ^ (hv >> 24) ^ (hv >> 32)
                  ^ (hv >> 40) ^ (hv >> 48) ^ (hv >> 56)) & 0xff
    yield 'xf16_8', ((hv ^ (hv >> 32)) ^ ((hv ^ (hv >> 32)) >> 16)) >> 8 & 0xff
    s = 0
    for k in range(8): s += (hv >> (8*k)) & 0xff
    yield 'addf', s & 0xff
    yield 'x0_8', (hv ^ (hv >> 8)) & 0xff

def ext_main():
    keys = [(t, o, i) for (_, t, o, i) in EVID]
    pairs = [((t, o, i), s) for (s, t, o, i) in EVID]
    hits = []
    ser_names = [n for n, _ in serializations(4, 0, 0)]
    for sname in ser_names:
        sermap = {}
        for (t, o, i) in keys:
            for n, b in serializations(t, o, i):
                if n == sname: sermap[(t, o, i)] = b
        for hname, fn in BYTE_HASHES:
            hv = {k: fn(sermap[k]) for k in keys}
            fold_names = [w for w, _ in folds(0)]
            for w in fold_names:
                derived = {}
                for k in keys:
                    for wn, val in folds(hv[k]):
                        if wn == w: derived[k] = val; break
                e, p = score(pairs, derived)
                if e >= 12 or p == 16:
                    hits.append((e, p, sname, hname, w))
    for h in sorted(hits, reverse=True)[:10]:
        print('FOLD', h)
    if not hits: print('folds: no candidate')

    # sequential-oid attack: the 16 objects may be keyed by hidden
    # creation-order oids; test consecutive runs against canonical orders
    slot_of = {(t, o, i): s for (s, t, o, i) in EVID}
    orders = {
        'global_then_t0_t1': [(1,0,0),(2,0,0),
            (3,0,0),(4,0,0),(4,1,0),(4,2,0),(4,3,0),(4,4,0),(5,0,0),
            (3,0,1),(4,0,1),(4,1,1),(4,2,1),(4,3,1),(4,4,1),(5,0,1)],
        'global_then_interleaved': [(1,0,0),(2,0,0),
            (3,0,0),(3,0,1),(4,0,0),(4,0,1),(4,1,0),(4,1,1),(4,2,0),
            (4,2,1),(4,3,0),(4,3,1),(4,4,0),(4,4,1),(5,0,0),(5,0,1)],
        'tables_then_global': [
            (3,0,0),(4,0,0),(4,1,0),(4,2,0),(4,3,0),(4,4,0),(5,0,0),
            (3,0,1),(4,0,1),(4,1,1),(4,2,1),(4,3,1),(4,4,1),(5,0,1),
            (1,0,0),(2,0,0)],
    }
    found = False
    win_list = [w for w, _ in windows(0)][:57]  # bit windows only
    for oname, order in orders.items():
        want = [slot_of[k] for k in order]
        for hname, fn in INT_HASHES:
            if hname == 'identity': continue
            for x0 in range(0, 200000):
                h0 = fn(x0)
                # quick reject on window 0 before full check
                for w in (0, 8, 16, 24, 32, 56):
                    if (h0 >> w) & 0xff != want[0]: continue
                    ok = all(((fn(x0 + j) >> w) & 0xff) == want[j]
                             for j in range(1, 16))
                    if ok:
                        print(f'SEQ HIT order={oname} hash={hname} window={w} x0={x0}')
                        found = True
    if not found: print('sequential-oid: no candidate (consecutive runs, 6 windows, x0<200k)')

ext_main()
