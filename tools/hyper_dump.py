#!/usr/bin/env python3
"""Full record dump of a .hyper container (analysis tool, driver-side).

Extends hyper_scan.py: finds BOTH [u32 len][LZ4][u32 rawCRC32C] records
and [u32 len][raw payload][u32 rawCRC32C] records (the engine stores a
block uncompressed when LZ4 doesn't shrink it), and hexdumps the full
decoded payload of each.

Usage: python3 tools/hyper_dump.py file.hyper [start_hex] [end_hex]
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
        raise ValueError("overrun")
    return bytes(out), i - pos


def hexdump(data, base=0, limit=None):
    n = len(data) if limit is None else min(len(data), limit)
    last_line = None
    skipping = False
    for o in range(0, n, 16):
        chunk = data[o:o + 16]
        if chunk == last_line and o + 16 < n:
            if not skipping:
                print("  *")
                skipping = True
            continue
        skipping = False
        last_line = chunk
        hx = " ".join(f"{b:02x}" for b in chunk).ljust(47)
        asc = "".join(chr(b) if 32 <= b < 127 else "." for b in chunk)
        print(f"  {base + o:06x}  {hx}  {asc}")
    if limit is not None and len(data) > limit:
        print(f"  ... ({len(data) - limit} more bytes)")


def main():
    path = sys.argv[1]
    data = open(path, "rb").read()
    start = int(sys.argv[2], 16) if len(sys.argv) > 2 else 0
    end = int(sys.argv[3], 16) if len(sys.argv) > 3 else len(data)
    pos = start
    while pos + 8 <= end:
        ln = struct.unpack_from("<I", data, pos)[0]
        found = False
        if 0 < ln <= 1 << 24:
            # raw record: [len][payload len bytes][crc over len+payload]
            if pos + 4 + ln + 4 <= len(data):
                crc = struct.unpack_from("<I", data, pos + 4 + ln)[0]
                if crc == crc32c_raw(data[pos:pos + 4 + ln]) and crc != 0:
                    print(f"== RAW  @0x{pos:05x}: {ln}B (ends 0x{pos + 4 + ln + 4:05x})")
                    hexdump(data[pos + 4:pos + 4 + ln], 0)
                    pos = pos + 4 + ln + 4
                    found = True
            # lz4 record: [uncompLen][lz4 stream][crc over len+stream]
            if not found:
                try:
                    payload, consumed = lz4_decompress(data, pos + 4, ln)
                    crc = struct.unpack_from("<I", data, pos + 4 + consumed)[0]
                    if crc == crc32c_raw(data[pos:pos + 4 + consumed]) and crc != 0:
                        print(f"== LZ4  @0x{pos:05x}: {consumed}B -> {ln}B "
                              f"(ends 0x{pos + 4 + consumed + 4:05x})")
                        hexdump(payload, 0)
                        pos = pos + 4 + consumed + 4
                        found = True
                except (ValueError, IndexError, struct.error):
                    pass
        if not found:
            pos += 1


main()
