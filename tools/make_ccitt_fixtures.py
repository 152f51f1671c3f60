#!/usr/bin/env python3
"""Independent CCITT fixture encoder for graft's CCITTFaxDecode path.

The Scala kernel decodes CCITT payloads by wrapping them in a minimal
TIFF for the JDK's ImageIO TIFF reader (Pdf.ccittToTiff). Its existing
tests encode with the JDK's TIFF *writer* — a separate codec class in
the imageio plugin, but still the same vendor tree. This tool encodes
the same deterministic checker pattern (white where (x//3 + y//2) % 2
== 0 — the SparkEntry.faxStrip pattern) in PURE PYTHON straight from
the published ITU-T T.4 / T.6 code tables (as reprinted in the public
TIFF 6.0 specification), sharing zero code with any JDK codec, and
writes the payloads to `src/test/resources/pdf/` for
PdfCcittExternalSpec:

  ccitt_mh_24x10.bin    1-D MH, rows byte-aligned, no EOLs
                        (PDF: /K 0 + /EncodedByteAlign true)
  ccitt_g3_1d_24x10.bin 1-D with an EOL before every row
                        (PDF: /K 0, detected by the leading EOL)
  ccitt_g3_2d_24x10.bin T.4 2-D stream: EOL + tag bit per row, all
                        rows 1-D coded (PDF: /K 1)
  ccitt_g4_24x10.bin    T.6 pure 2-D (PDF: /K -1)
  progressive.jpg       minimal multi-scan (SOF2) JPEG SKELETON — a
                        structural fixture for the marker-walk
                        delimiter (jpegScanLength), not a decodable
                        image

Run lengths in the 24x10 checker never exceed 3, so only the
terminating codes (0–63) are exercised; the tables are still
transcribed in full. Regenerate only if the pattern or sizes change —
the outputs are committed.
"""
import os

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "..", "src/test/resources/pdf")

W, H = 24, 10

# ITU-T T.4 terminating codes (run length -> bit string), white/black.
WHITE = {
    0: "00110101", 1: "000111", 2: "0111", 3: "1000", 4: "1011",
    5: "1100", 6: "1110", 7: "1111", 8: "10011", 9: "10100",
    10: "00111", 11: "01000", 12: "001000", 13: "000011", 14: "110100",
    15: "110101", 16: "101010", 17: "101011", 18: "0100111",
    19: "0001100", 20: "0001000", 21: "0010111", 22: "0000011",
    23: "0000100", 24: "0101000", 25: "0101011", 26: "0010011",
    27: "0100100", 28: "0011000", 29: "00000010", 30: "00000011",
    31: "00011010", 32: "00011011", 33: "00010010", 34: "00010011",
    35: "00010100", 36: "00010101", 37: "00010110", 38: "00010111",
    39: "00101000", 40: "00101001", 41: "00101010", 42: "00101011",
    43: "00101100", 44: "00101101", 45: "00000100", 46: "00000101",
    47: "00001010", 48: "00001011", 49: "01010010", 50: "01010011",
    51: "01010100", 52: "01010101", 53: "00100100", 54: "00100101",
    55: "01011000", 56: "01011001", 57: "01011010", 58: "01011011",
    59: "01001010", 60: "01001011", 61: "00110010", 62: "00110011",
    63: "00110100",
}
BLACK = {
    0: "0000110111", 1: "010", 2: "11", 3: "10", 4: "011",
    5: "0011", 6: "0010", 7: "00011", 8: "000101", 9: "000100",
    10: "0000100", 11: "0000101", 12: "0000111", 13: "00000100",
    14: "00000111", 15: "000011000", 16: "0000010111",
    17: "0000011000", 18: "0000001000", 19: "00001100111",
    20: "00001101000", 21: "00001101100", 22: "00000110111",
    23: "00000101000", 24: "00000010111", 25: "00000011000",
    26: "000011001010", 27: "000011001011", 28: "000011001100",
    29: "000011001101", 30: "000001101000", 31: "000001101001",
    32: "000001101010", 33: "000001101011", 34: "000011010010",
    35: "000011010011", 36: "000011010100", 37: "000011010101",
    38: "000011010110", 39: "000011010111", 40: "000001101100",
    41: "000001101101", 42: "000011011010", 43: "000011011011",
    44: "000001010100", 45: "000001010101", 46: "000001010110",
    47: "000001010111", 48: "000001100100", 49: "000001100101",
    50: "000001010010", 51: "000001010011", 52: "000000100100",
    53: "000000110111", 54: "000000111000", 55: "000000100111",
    56: "000000101000", 57: "000001011000", 58: "000001011001",
    59: "000000101011", 60: "000000101100", 61: "000001011010",
    62: "000001100110", 63: "000001100111",
}
EOL = "000000000001"
# T.4 §4.2.1.3.4 vertical mode codes, keyed by a1 - b1
VCODE = {0: "1", 1: "011", 2: "000011", 3: "0000011",
         -1: "010", -2: "000010", -3: "0000010"}


def pixel(x, y):
    """True = white."""
    return ((x // 3) + (y // 2)) % 2 == 0


def row_pixels(y):
    return [pixel(x, y) for x in range(W)]


def mh_code(color_white, run):
    assert run < 64, "fixture pattern keeps runs below makeup range"
    return (WHITE if color_white else BLACK)[run]


def row_1d(row):
    """1-D MH coding of one row: alternating runs, white first (a
    zero-length white run when the row starts black)."""
    bits = []
    runs = []
    cur, n = row[0], 1
    for p in row[1:]:
        if p == cur:
            n += 1
        else:
            runs.append((cur, n))
            cur, n = p, 1
    runs.append((cur, n))
    if not runs[0][0]:
        runs.insert(0, (True, 0))
    for color, n in runs:
        bits.append(mh_code(color, n))
    return "".join(bits)


def to_bytes(bits):
    pad = (-len(bits)) % 8
    bits += "0" * pad
    return bytes(int(bits[i:i + 8], 2) for i in range(0, len(bits), 8))


def encode_mh():
    """Compression-2 shape: each row 1-D coded and BYTE-ALIGNED, no
    EOLs (PDF /K 0 with /EncodedByteAlign)."""
    out = bytearray()
    for y in range(H):
        out += to_bytes(row_1d(row_pixels(y)))
    return bytes(out)


def encode_g3_1d():
    """T.4 1-D: EOL before every row, rows not aligned (PDF /K 0,
    leading-EOL detection)."""
    bits = "".join(EOL + row_1d(row_pixels(y)) for y in range(H))
    return to_bytes(bits)


def encode_g3_2d():
    """T.4 2-D stream shape: EOL + mode tag per row; every row coded
    1-D (tag bit 1), which is valid T.4 — the decoder must honor the
    tags (PDF /K 1)."""
    bits = "".join(EOL + "1" + row_1d(row_pixels(y)) for y in range(H))
    return to_bytes(bits)


def next_change(row, pos, color):
    """First index > pos whose pixel differs from `color`, scanning
    from max(pos, 0); len(row) as the imaginary end sentinel."""
    j = max(pos, 0)
    w = len(row)
    while j < w and (j <= pos or row[j] == color):
        j += 1
    return j


def ref_b1(ref, a0, a0color):
    """First CHANGING element of the reference line right of a0 with
    color opposite a0color (T.6 §2.2.4); imaginary white pixel before
    the row makes position 0 changing iff ref[0] is black."""
    w = len(ref)
    j = a0 + 1 if a0 >= 0 else 0
    while j < w:
        prev = ref[j - 1] if j > 0 else True
        if ref[j] != prev and ref[j] != a0color:
            return j
        j += 1
    return w


def ref_next(ref, pos):
    w = len(ref)
    j = pos + 1
    while j < w:
        if ref[j] != ref[j - 1]:
            return j
        j += 1
    return w


def encode_g4():
    """T.6 pure 2-D coding (PDF /K -1): pass / horizontal / vertical
    modes against the previous row, first reference line all-white."""
    bits = []
    ref = [True] * W
    for y in range(H):
        row = row_pixels(y)
        a0, a0color = -1, True
        while a0 < W:
            a1 = next_change(row, a0, a0color)
            b1 = ref_b1(ref, a0, a0color)
            b2 = ref_next(ref, b1) if b1 < W else W
            if b2 < a1:
                bits.append("0001")  # pass mode
                a0 = b2
            elif abs(a1 - b1) <= 3:
                bits.append(VCODE[a1 - b1])  # vertical mode
                a0, a0color = a1, not a0color
            else:
                a2 = next_change(row, a1, not a0color)
                bits.append("001")  # horizontal mode
                bits.append(mh_code(a0color, a1 - max(a0, 0)))
                bits.append(mh_code(not a0color, a2 - a1))
                a0 = a2
        ref = row
    return to_bytes("".join(bits))


def progressive_jpeg():
    """Minimal structural progressive JPEG: SOI, SOF2, DHT, two SOS
    scans with entropy bytes (including a stuffed FF00 and a restart
    marker), EOI. Exercises the multi-scan path of the marker-walk
    delimiter; NOT a decodable image."""
    def seg(marker, payload):
        ln = len(payload) + 2
        return bytes([0xFF, marker, ln >> 8, ln & 0xFF]) + payload

    sof2 = seg(0xC2, bytes([8, 0, 8, 0, 8, 1, 0x11, 0, 0]))
    dht = seg(0xC4, bytes([0x00] + [0] * 16 + []))
    sos1 = seg(0xDA, bytes([1, 0, 0x00, 0, 5, 0]))
    ent1 = bytes([0x12, 0xFF, 0x00, 0x34, 0xFF, 0xD0, 0x56])
    sos2 = seg(0xDA, bytes([1, 0, 0x10, 0, 5, 1]))
    ent2 = bytes([0x9A, 0xBC])
    return (bytes([0xFF, 0xD8]) + sof2 + dht + sos1 + ent1 +
            sos2 + ent2 + bytes([0xFF, 0xD9]))


def main():
    os.makedirs(OUT, exist_ok=True)
    files = {
        f"ccitt_mh_{W}x{H}.bin": encode_mh(),
        f"ccitt_g3_1d_{W}x{H}.bin": encode_g3_1d(),
        f"ccitt_g3_2d_{W}x{H}.bin": encode_g3_2d(),
        f"ccitt_g4_{W}x{H}.bin": encode_g4(),
        "progressive.jpg": progressive_jpeg(),
    }
    for name, data in files.items():
        path = os.path.join(OUT, name)
        with open(path, "wb") as f:
            f.write(data)
        print(f"wrote {path} ({len(data)} bytes)")


if __name__ == "__main__":
    main()
