#!/usr/bin/env python3
"""Frame-verified scan of a .hyper container (analysis tool, driver-side).

Finds every [u32 uncompressedLen][LZ4 block][u32 rawCRC32C] record in the
file by brute-force: at each offset, read the length word, attempt an LZ4
block decode, and accept only if the trailing u32 equals the raw CRC32C
of (length word + compressed stream). The CRC check makes false positives
essentially impossible (2^-32 per candidate).

Usage: python3 tools/hyper_scan.py /root/reference/complaints_by_bank.hyper
"""
import struct
import sys

POLY = 0x82F63B78
TABLE = []
for i in range(256):
    c = i
    for _ in range(8):
        c = (c >> 1) ^ POLY if c & 1 else c >> 1
    TABLE.append(c)


def crc32c_raw(data):
    c = 0
    for b in data:
        c = TABLE[(c ^ b) & 0xFF] ^ (c >> 8)
    return c


def lz4_decompress(src, pos, out_len):
    """Returns (payload, consumed) or raises."""
    out = bytearray()
    i = pos
    n = len(src)
    while len(out) < out_len:
        if i >= n:
            raise ValueError("eof")
        token = src[i]
        i += 1
        lit = token >> 4
        if lit == 15:
            while True:
                b = src[i]
                i += 1
                lit += b
                if b != 255:
                    break
        if i + lit > n:
            raise ValueError("lit eof")
        out += src[i:i + lit]
        i += lit
        if len(out) < out_len:
            if i + 2 > n:
                raise ValueError("off eof")
            off = src[i] | (src[i + 1] << 8)
            i += 2
            if off == 0 or off > len(out):
                raise ValueError("bad off")
            ml = token & 15
            if ml == 15:
                while True:
                    b = src[i]
                    i += 1
                    ml += b
                    if b != 255:
                        break
            ml += 4
            for _ in range(ml):
                out.append(out[-off])
    if len(out) != out_len:
        raise ValueError("overshoot")
    return bytes(out), i - pos


def scan(data, start=0, end=None):
    end = end if end is not None else len(data)
    hits = []
    p = start
    while p < end - 12:
        ulen = struct.unpack_from("<I", data, p)[0]
        if 0 < ulen <= 1 << 22:
            try:
                payload, consumed = lz4_decompress(data, p + 4, ulen)
                frame = struct.unpack_from("<I", data, p + 4 + consumed)[0]
                if frame == crc32c_raw(data[p:p + 4 + consumed]):
                    hits.append((p, ulen, consumed, payload))
                    p += 4 + consumed + 4
                    continue
            except (ValueError, IndexError, struct.error):
                pass
        p += 1
    return hits


def hexdump(b, limit=256, base=0):
    for o in range(0, min(len(b), limit), 16):
        row = b[o:o + 16]
        hx = " ".join(f"{x:02x}" for x in row)
        asc = "".join(chr(x) if 32 <= x < 127 else "." for x in row)
        print(f"  {base + o:06x}  {hx:<48}  {asc}")


if __name__ == "__main__":
    path = sys.argv[1]
    data = open(path, "rb").read()
    lo = int(sys.argv[2], 0) if len(sys.argv) > 2 else 0
    hi = int(sys.argv[3], 0) if len(sys.argv) > 3 else len(data)
    lim = int(sys.argv[4], 0) if len(sys.argv) > 4 else 160
    for p, ulen, consumed, payload in scan(data, lo, hi):
        print(f"== block @0x{p:05x}: {consumed}B compressed -> {ulen}B "
              f"(ends 0x{p + 4 + consumed + 4:05x})")
        hexdump(payload, lim)
