"""Verify io/bc6h.py's per-mode bit layout against Pillow's BCn decoder.

Pillow (12.x) decodes BC6H only to 8-bit RGB (clamped), so bit-exact
float comparison is impossible; instead every payload bit of every mode
is exercised through AMPLIFIED contexts chosen to make that bit's effect
visible through the 8-bit bottleneck:

  - direct:  the bit alone (catches high base bits),
  - wrap:    the bit + an all-ones base, so transformed deltas wrap the
             endpoint from max to ~0 (catches every delta bit),
  - steep:   the bit + a base placed in the half-float range where one
             raw endpoint step moves the 8-bit output (catches low-bit
             significance swaps), scanned over nearby bases for the
             high-precision modes where one step is sub-u8.

For each constructed block the FULL 4x4 u8 image from our decoder
(+ Pillow's float->u8 conversion, calibrated below) must equal Pillow's.
Random fuzz blocks (both UF16 and SF16) complete the sweep.

Usage: python experiments/bc6h_layout_probe.py [--fuzz N]
"""
from __future__ import annotations

import argparse
import io
import struct
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, ".")
from crychic_renderer_tpu.io.bc6h import (  # noqa: E402
    _LAYOUTS, _MODE_INFO, decode_bc6h)

MODE_VALUES = list(_MODE_INFO)


def mode_len(mv):
    return 2 if mv in (0, 1) else 5


def encode_block(mv, fields=None, d=0, idx_bits=0):
    """Build one 16-byte block from hypothesis layout _LAYOUTS."""
    bits = np.zeros(128, dtype=np.uint8)
    ml = mode_len(mv)
    for k in range(ml):
        bits[k] = (mv >> k) & 1
    fields = fields or {}
    for pos, (field, sig) in enumerate(_LAYOUTS[mv], start=ml):
        bits[pos] = (fields.get(field, 0) >> sig) & 1
    _, _, _, two = _MODE_INFO[mv]
    if two:
        for k in range(5):
            bits[77 + k] = (d >> k) & 1
        istart = 82
    else:
        istart = 65
    if idx_bits:
        bits[istart:] = 1
    return np.packbits(bits, bitorder="little").tobytes()


def make_dds(blocks: bytes, w, h, dxgi):
    hdr = struct.pack("<I", 0x20534444)
    flags = 0x1 | 0x2 | 0x4 | 0x1000 | 0x80000
    hdr += struct.pack("<7I", 124, flags, h, w, len(blocks), 0, 1)
    hdr += b"\0" * 44
    hdr += struct.pack("<II4sIIIII", 32, 0x4, b"DX10", 0, 0, 0, 0, 0)
    hdr += struct.pack("<II", 0x1000, 0)
    hdr += b"\0" * 12
    hdr += struct.pack("<5I", dxgi, 3, 0, 1, 0)
    return hdr + blocks


def pillow_u8(blocks: bytes, nblocks: int, signed: bool) -> np.ndarray:
    """Decode a row of blocks via Pillow -> (nblocks,4,4,3) uint8."""
    w = nblocks * 4
    im = Image.open(io.BytesIO(make_dds(blocks, w, 4, 96 if signed else 95)))
    a = np.asarray(im)  # (4, w, 3)
    return a.reshape(4, nblocks, 4, 3).transpose(1, 0, 2, 3)


def ours_u8(blocks: bytes, nblocks: int, signed: bool) -> np.ndarray:
    img = decode_bc6h(blocks, nblocks * 4, 4, signed=signed,
                      pillow_emulation=True)  # (4,w,3) f32
    u8 = to_u8(img)
    return u8.reshape(4, nblocks, 4, 3).transpose(1, 0, 2, 3)


def to_u8(v: np.ndarray) -> np.ndarray:
    """Pillow's float->u8 conversion (calibrated by calibrate())."""
    return np.floor(np.clip(v, 0.0, 1.0) * 255.0).astype(np.uint8)


def calibrate():
    """Mode 11 (one-region, untransformed 10-bit) sweep: check our decode
    + to_u8 against Pillow over all 1024 raw values per channel."""
    blocks = b"".join(
        encode_block(3, {"rw": r, "gw": r, "bw": r,
                         "rx": r, "gx": r, "bx": r})
        for r in range(1024))
    ref = pillow_u8(blocks, 1024, False)
    got = ours_u8(blocks, 1024, False)
    bad = np.nonzero((ref != got).any(axis=(1, 2, 3)))[0]
    return bad, ref, got


def steep_base(epb):
    """Raw base near half 0.5..0.9 where one raw step is most visible."""
    # want unquantized ~ 30000 -> raw ~ 30000 >> (16 - epb)
    return (30000 >> (16 - epb)) if epb < 15 else 29000


def bit_contexts(mv):
    """Yield (desc, fields, idx_bits) contexts exercising each payload
    bit of mode mv."""
    epb, deltas, transformed, two = _MODE_INFO[mv]
    layout = _LAYOUTS[mv]
    basemask = (1 << epb) - 1
    sb = steep_base(epb)
    allbase = {c + "w": basemask for c in "rgb"}
    steep = {c + "w": sb for c in "rgb"}
    scan = range(16) if epb >= 11 else (0,)
    for bi, (field, sig) in enumerate(layout):
        single = {field: 1 << sig}
        for idx in (0, 1):
            yield (f"{field}[{sig}] direct", dict(single), idx)
            merged = dict(allbase)
            merged[field] = merged.get(field, 0) | (1 << sig)
            yield (f"{field}[{sig}] wrap", merged, idx)
            for t in scan:
                m2 = {k: v + t for k, v in steep.items()}
                m2[field] = m2.get(field, 0) | (1 << sig)
                yield (f"{field}[{sig}] steep+{t}", m2, idx)


def run_bit_probes(signed: bool) -> int:
    fails = 0
    for mv in MODE_VALUES:
        descs, blocks = [], []
        for desc, fields, idx in bit_contexts(mv):
            descs.append(desc)
            blocks.append(encode_block(mv, fields, d=0, idx_bits=idx))
        # partition sweep for two-region modes: endpoint spread over d
        if _MODE_INFO[mv][3]:
            epb = _MODE_INFO[mv][0]
            for d in range(32):
                descs.append(f"partition {d}")
                blocks.append(encode_block(
                    mv, {"rw": steep_base(epb)}, d=d, idx_bits=1))
        raw = b"".join(blocks)
        ref = pillow_u8(raw, len(blocks), signed)
        got = ours_u8(raw, len(blocks), signed)
        bad = np.nonzero((ref != got).any(axis=(1, 2, 3)))[0]
        tag = "SF16" if signed else "UF16"
        if bad.size:
            fails += bad.size
            print(f"mode value {mv} ({tag}): {bad.size}/{len(blocks)} "
                  f"probe blocks mismatch")
            for i in bad[:8]:
                print(f"  [{descs[i]}] ref={ref[i][0,0]} got={got[i][0,0]}")
        else:
            print(f"mode value {mv} ({tag}): {len(blocks)} probes ok")
    return fails


def run_fuzz(n, signed: bool, rng) -> int:
    fails = 0
    for mv in MODE_VALUES:
        epb = _MODE_INFO[mv][0]
        blocks = []
        for _ in range(n):
            fields = {}
            for f in set(f for f, _ in _LAYOUTS[mv]):
                width = 1 + max(s for g, s in _LAYOUTS[mv] if g == f)
                fields[f] = int(rng.integers(0, 1 << width))
            # bias the base into the visible range half the time
            if rng.random() < 0.5:
                for c in "rgb":
                    fields[c + "w"] = int(steep_base(epb)
                                          + rng.integers(-64, 64))
            blocks.append(encode_block(
                mv, fields, d=int(rng.integers(0, 32)),
                idx_bits=int(rng.integers(0, 2))))
        # plus fully random 16-byte blocks forced to this mode
        raw = b"".join(blocks)
        ref = pillow_u8(raw, len(blocks), signed)
        got = ours_u8(raw, len(blocks), signed)
        bad = np.nonzero((ref != got).any(axis=(1, 2, 3)))[0]
        if bad.size:
            fails += bad.size
            tag = "SF16" if signed else "UF16"
            print(f"mode value {mv} ({tag}) fuzz: {bad.size}/{n} mismatch")
    return fails


def run_random_blocks(n, rng) -> int:
    """Fully random 16-byte blocks (random modes incl. reserved)."""
    fails = 0
    for signed in (False, True):
        raw = rng.integers(0, 256, size=(n, 16), dtype=np.uint8).tobytes()
        ref = pillow_u8(raw, n, signed)
        got = ours_u8(raw, n, signed)
        bad = np.nonzero((ref != got).any(axis=(1, 2, 3)))[0]
        if bad.size:
            fails += bad.size
            print(f"random blocks ({'SF16' if signed else 'UF16'}): "
                  f"{bad.size}/{n} mismatch")
            i = bad[0]
            print(f"  block={raw[i*16:(i+1)*16].hex()}")
            print(f"  ref={ref[i][0]} got={got[i][0]}")
    return fails


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fuzz", type=int, default=512)
    args = ap.parse_args()
    bad, ref, got = calibrate()
    if bad.size:
        print(f"CALIBRATION: {bad.size}/1024 mode-11 sweep values mismatch")
        for r in bad[:10]:
            print(f"  raw={r} ref={ref[r][0,0]} got={got[r][0,0]}")
        return 1
    print("calibration (mode-11 sweep, 1024 values): ok")
    fails = 0
    for signed in (False, True):
        fails += run_bit_probes(signed)
    rng = np.random.default_rng(0)
    for signed in (False, True):
        fails += run_fuzz(args.fuzz, signed, rng)
    fails += run_random_blocks(4096, rng)
    print("FAILURES:", fails)
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
