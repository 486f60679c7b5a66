"""Recover the BC7 constant tables (2-/3-subset partition maps + anchor
index tables) empirically from Pillow's battle-tested BCn decoder, for
hardcoding into crychic_renderer_tpu/io/bc7.py.

The tables are public constants of the BC7 (BPTC) format spec; recovering
them from an independent decoder instead of transcribing them avoids
transcription errors. Method:

- P2 (64 x 16 subset ids): mode-1 blocks, one per partition, subset 0
  endpoint0 = black, subset 1 endpoint0 = white, all index bits zero
  (so anchors don't matter) -> texel color classifies its subset.
- P3 (64 x 16): mode-2 blocks, subsets colored R/G/B via endpoint0.
- Anchors: mode-1 (resp. mode-2) blocks with both endpoints 0..max per
  subset; setting exactly ONE index bit and diffing against the all-zero
  baseline reveals which texel owns that bit and its significance, giving
  each texel's index bit-width; the anchor texels are the ones with a
  truncated (ib-1 bit) index.

Run: python experiments/bc7_table_recovery.py
"""
import io
import struct

import numpy as np
from PIL import Image


def dds_dx10(dxgi, w, h, payload):
    hdr = struct.pack("<I", 0x20534444)
    hdr += struct.pack("<7I", 124, 0x1007, h, w, len(payload), 0, 0)
    hdr += b"\0" * 44
    hdr += struct.pack("<II4sIIIII", 32, 0x4, b"DX10", 0, 0, 0, 0, 0)
    hdr += struct.pack("<II", 0x1000, 0)
    hdr += b"\0" * 12
    hdr += struct.pack("<5I", dxgi, 3, 0, 1, 0)
    return hdr + payload


def decode_blocks(blocks):
    """blocks: list of 16-byte block bitstrings -> (N, 4, 4, 4) uint8."""
    n = len(blocks)
    img = Image.open(io.BytesIO(dds_dx10(98, 4, 4 * n, b"".join(blocks))))
    a = np.asarray(img.convert("RGBA"))
    return a.reshape(n, 4, 4, 4)


class BitWriter:
    def __init__(self):
        self.val = 0
        self.pos = 0

    def put(self, v, nbits):
        self.val |= (int(v) & ((1 << nbits) - 1)) << self.pos
        self.pos += nbits

    def bytes(self):
        assert self.pos <= 128
        return self.val.to_bytes(16, "little")


def mode1_block(partition, endpoints_r, index_bits=0):
    """endpoints_r: 4 values (sub0ep0, sub0ep1, sub1ep0, sub1ep1), 6-bit.
    G=B=R for grayscale. index_bits: 46-bit int."""
    w = BitWriter()
    w.put(0b10, 2)          # mode 1: one 0 then the 1
    w.put(partition, 6)
    for ch in range(3):
        for e in endpoints_r:
            w.put(e, 6)
    w.put(0, 2)             # shared P-bits
    w.put(index_bits, 46)
    return w.bytes()


def mode2_block(partition, ep0_rgb, index_bits=0):
    """ep0_rgb: per-subset endpoint0 (r, g, b) 5-bit; endpoint1 = same."""
    w = BitWriter()
    w.put(0b100, 3)         # mode 2
    w.put(partition, 6)
    for ch in range(3):
        for sub in range(3):
            for ep in range(2):
                w.put(ep0_rgb[sub][ch], 5)
    w.put(index_bits, 29)
    return w.bytes()


def recover_p2():
    blocks = [mode1_block(p, (0, 0, 63, 63)) for p in range(64)]
    out = decode_blocks(blocks)
    p2 = (out[..., 0].reshape(64, 16) > 127).astype(int)
    return p2


def recover_p3():
    eps = [(31, 0, 0), (0, 31, 0), (0, 0, 31)]
    blocks = [mode2_block(p, eps) for p in range(64)]
    out = decode_blocks(blocks)
    rgb = out.reshape(64, 16, 4)[..., :3]
    p3 = np.argmax(rgb, axis=-1)
    return p3


def recover_anchors2():
    """For each 2-subset partition: per-texel index bit width from
    single-bit probes; anchor of subset 1 = the non-zero texel with 2 bits."""
    anchors = []
    for p in range(64):
        base = decode_blocks([mode1_block(p, (0, 63, 0, 63))])[0, ..., 0]
        base = base.reshape(16).astype(int)
        owner = np.full(46, -1)
        for b in range(46):
            out = decode_blocks(
                [mode1_block(p, (0, 63, 0, 63), index_bits=1 << b)]
            )[0, ..., 0].reshape(16).astype(int)
            diff = np.nonzero(out != base)[0]
            assert len(diff) == 1, (p, b, diff)
            owner[b] = diff[0]
        counts = np.bincount(owner, minlength=16)
        two = np.nonzero(counts == 2)[0]
        assert len(two) == 2 and 0 in two, (p, counts)
        anchors.append(int(two[two != 0][0]))
    return anchors


def recover_anchors3():
    eps = [(31, 31, 31)] * 3
    eps1 = [(0, 0, 0)] * 3
    anchors2, anchors3 = [], []
    for p in range(64):
        def blk(ib):
            w = BitWriter()
            w.put(0b100, 3)
            w.put(p, 6)
            for ch in range(3):
                for sub in range(3):
                    w.put(0, 5)     # ep0 = 0
                    w.put(31, 5)    # ep1 = max
            w.put(ib, 29)
            return w.bytes()
        base = decode_blocks([blk(0)])[0, ..., 0].reshape(16).astype(int)
        owner = np.full(29, -1)
        for b in range(29):
            out = decode_blocks([blk(1 << b)])[0, ..., 0].reshape(16)
            diff = np.nonzero(out.astype(int) != base)[0]
            assert len(diff) == 1, (p, b, diff)
            owner[b] = diff[0]
        counts = np.bincount(owner, minlength=16)
        one = sorted(np.nonzero(counts == 1)[0])
        assert len(one) == 3 and one[0] == 0, (p, counts)
        # distinguish 2nd vs 3rd subset anchor via the P3 table
        anchors3_pair = one[1:]
        anchors2.append(anchors3_pair)
    return anchors2


def fmt_table(name, arr):
    arr = np.asarray(arr)
    if arr.ndim == 1:
        body = ", ".join(str(int(v)) for v in arr)
        return f"{name} = [{body}]"
    rows = [", ".join(str(int(v)) for v in row) for row in arr]
    body = "\n    ".join(f"({r})," for r in rows)
    return f"{name} = (\n    {body}\n)"


if __name__ == "__main__":
    p2 = recover_p2()
    print(fmt_table("P2", p2))
    p3 = recover_p3()
    print(fmt_table("P3", p3))
    a2 = recover_anchors2()
    print(fmt_table("ANCHOR2", a2))
    a3pairs = recover_anchors3()
    # assign pair members to subsets using P3
    a3_2nd, a3_3rd = [], []
    for p, pair in enumerate(a3pairs):
        subs = [p3[p][t] for t in pair]
        assert sorted(subs) == [1, 2], (p, pair, subs)
        if subs[0] == 1:
            a3_2nd.append(pair[0]); a3_3rd.append(pair[1])
        else:
            a3_2nd.append(pair[1]); a3_3rd.append(pair[0])
    print(fmt_table("ANCHOR3_2", a3_2nd))
    print(fmt_table("ANCHOR3_3", a3_3rd))
